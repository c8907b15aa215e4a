"""Property tests: the kernel never throws, span offsets stay in bounds, and
cleaning is idempotent on its own output (markdown path)."""

from hypothesis import given, settings
from hypothesis import strategies as st

from engine.core.cleaner import clean_markdown
from engine.core.extract import extract_turn
from engine.core.html_clean import clean_html

payloads = st.text(
    alphabet=st.characters(codec="utf-8", exclude_categories=("Cs",)),
    max_size=2000)
tools = st.sampled_from(["ocr.markdown", "ocr.grounded", "web.html",
                         "chat.plain", None, "unknown.tool"])

structured = st.sampled_from([
    "\n\n--- Page 1 ---\n\n", "<|ref|>text<|/ref|><|det|>[[1,2,3,4]]<|/det|>",
    "<|ref|>image<|/ref|><|det|>[", "| a | b |\n|---|---|\n| 1 | 2 |\n",
    "## Important Disclosures\n", "![f](images/0_0.jpg)", "$5.2B", "6.2%",
    "<div><a href='x'>l</a></div>", "<｜end of sentence｜>", "© Copyright 2025",
])
mixed = st.lists(st.one_of(payloads, structured), max_size=8).map("".join)


@settings(max_examples=150, deadline=None)
@given(mixed, tools)
def test_never_throws_and_spans_bounded(payload, tool):
    rec = extract_turn(payload, tool, "prop")
    assert isinstance(rec["cleaned_text"], str)
    for s in rec["spans"]:
        assert s["start"] == -1 or (0 <= s["start"] <= s["end"] <= len(payload))
    counted = rec["summary"]
    assert counted["passages_count"] == len(rec["passages"])
    assert counted["numerics_count"] == len(rec["numerics"])


@settings(max_examples=80, deadline=None)
@given(mixed)
def test_clean_markdown_idempotent(payload):
    once, _, _ = clean_markdown(payload)
    twice, _, _ = clean_markdown(once)
    assert twice == once


@settings(max_examples=80, deadline=None)
@given(mixed)
def test_clean_html_never_throws(payload):
    cleaned, stats, spans, tables = clean_html(payload)
    assert isinstance(cleaned, str)
    assert stats["final_length"] == len(cleaned)


def test_adversarial_large_payloads_complete_quickly():
    """Backtracking guard: payloads engineered to trigger quadratic regex
    scans must finish in bounded time (METADATA_SCAN_LIMIT deviation)."""
    import time

    from engine.core.extract import extract_turn
    for payload in ["Abc " * 250000, "A" + " & B" * 125000,
                    "John Smith " + "1 " * 400000]:
        t0 = time.monotonic()
        rec = extract_turn(payload, "chat.plain", "adv")
        assert time.monotonic() - t0 < 20
        assert isinstance(rec["cleaned_text"], str)


# -- fast-HTML-tokenizer differential property --------------------------------

_tag_names = st.sampled_from(
    ["p", "div", "a", "span", "h1", "h2", "li", "td", "tr", "table",
     "nav", "script", "style", "title", "br", "article"])
_texts = st.text(
    alphabet=st.sampled_from(list("abc &;#xAZ09.\n\t!—é<>/'\"")), max_size=40)
_attrs = st.sampled_from(
    ["", ' href="/x"', " class='c d'", " data-x=1", ' a="1" b="2"', " x"])


@st.composite
def _html_doc(draw):
    parts = []
    for _ in range(draw(st.integers(0, 12))):
        kind = draw(st.integers(0, 3))
        if kind == 0:
            parts.append(draw(_texts))
        elif kind == 1:
            t = draw(_tag_names)
            parts.append(f"<{t}{draw(_attrs)}>{draw(_texts)}</{t}>")
        elif kind == 2:
            parts.append(f"<br{draw(st.sampled_from(['', '/', ' /']))}>")
        else:
            t = draw(st.sampled_from(["script", "style"]))
            body = draw(_texts)
            parts.append(f"<{t}>{body}</{t}>")
    return "".join(parts)


@given(_html_doc())
@settings(max_examples=200, deadline=None)
def test_fast_html_tokenizer_differential(doc):
    """Whenever the gate approves a generated document, the fast tokenizer
    and stdlib HTMLParser must agree on every block, offset, title, and
    table — and clean_html must never throw either way."""
    from engine.core import html_clean as hc
    hc.clean_html(doc)  # total function on any input
    if not hc._is_simple_html(doc):
        return
    def run(fast):
        ext = hc._Extractor(doc, fast=fast)
        if fast:
            hc._fast_feed(ext, doc)
        else:
            ext.feed(doc)
            ext.close()
        ext._flush()
        return ([(b.tag, b.text, b.start, b.end, b.link_chars,
                  b.dropped_tree) for b in ext.blocks], ext.title, ext.tables)
    assert run(True) == run(False), repr(doc)
