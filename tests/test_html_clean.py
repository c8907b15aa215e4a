from engine.core.html_clean import clean_html

DOC = """<html><head><title>Page Title</title><style>p{}</style></head><body>
<nav><a href="/">Home</a> <a href="/n">News</a></nav>
<article><h1>Main headline here</h1>
<p>The first paragraph is long enough and has the usual function words in it, so the scorer keeps it around.</p>
<p>Another real paragraph of the piece which should also be kept by the density rules we have in place.</p>
<table><tr><th>k</th><th>v</th></tr><tr><td>1</td><td>one</td></tr></table>
</article>
<div class="farm"><a href="/a">aaa</a> <a href="/b">bbb</a> <a href="/c">ccc</a></div>
<footer>© 2025 whatever <a href="/t">Terms</a></footer>
<script>var s = "The first paragraph is long enough";</script>
</body></html>"""


def test_main_content_kept_boilerplate_dropped():
    cleaned, stats, spans, tables = clean_html(DOC)
    assert "The first paragraph is long enough" in cleaned
    assert "Another real paragraph" in cleaned
    assert "# Main headline here" in cleaned  # heading prefixed by level
    assert "Home" not in cleaned          # nav dropped
    assert "aaa" not in cleaned           # link farm dropped
    assert "© 2025" not in cleaned        # footer dropped
    assert "var s" not in cleaned         # script dropped
    assert stats["title"] == "Page Title"
    assert stats["blocks_kept"] >= 3


def test_table_capture():
    _, _, _, tables = clean_html(DOC)
    assert len(tables) == 1
    assert tables[0]["columns"] == ["k", "v"]
    assert tables[0]["rows"] == [{"k": "1", "v": "one"}]


def test_spans_cover_source_offsets():
    cleaned, _, spans, _ = clean_html(DOC)
    assert spans, "expected block spans"
    for s in spans:
        assert 0 <= s.start <= s.end <= len(DOC)
    kept = [s for s in spans if s.kind == "html_kept"]
    assert any(DOC[s.start:s.end].startswith("The first paragraph") for s in kept)


def test_never_throws_on_garbage():
    for junk in ["<div><p>unclosed", "<<<>>>", "", "<a href='x'>only link</a>",
                 "plain text without tags at all, but long enough to keep"]:
        cleaned, stats, spans, tables = clean_html(junk)
        assert isinstance(cleaned, str)


def test_link_density_drop():
    farm = "<div>" + " ".join(f'<a href="/{i}">link {i} text</a>' for i in range(10)) + "</div>"
    cleaned, _, _, _ = clean_html(farm)
    assert cleaned == ""


def test_boilerplate_subtree_tables_not_captured():
    doc = ("<body><article><p>Real prose that is long enough and has the "
           "usual words in it to be kept by the scorer.</p>"
           "<table><tr><th>k</th></tr><tr><td>1</td></tr></table></article>"
           "<footer><table><tr><th>Links</th></tr><tr><td>Privacy</td></tr>"
           "</table></footer></body>")
    _, _, _, tables = clean_html(doc)
    assert len(tables) == 1
    assert tables[0]["columns"] == ["k"]


# ---------------------------------------------------------------------------
# fast-tokenizer differential guarantees
# ---------------------------------------------------------------------------

def _blocks_via(src, fast):
    from engine.core import html_clean as hc
    ext = hc._Extractor(src, fast=fast)
    if fast:
        hc._fast_feed(ext, src)
    else:
        ext.feed(src)
        ext.close()
    ext._flush()
    return ([(b.tag, b.text, b.start, b.end, b.link_chars, b.dropped_tree)
             for b in ext.blocks], ext.title, ext.tables)


def test_fast_tokenizer_matches_stdlib_on_corpus():
    """Every gate-approved document must produce byte-identical blocks,
    offsets, title, and tables under both backends."""
    from engine.core import html_clean as hc
    from tools import synth
    html = [r["text"] for r in synth.build_rows(4000, seed=13)
            if r["tool"] == "web.html"]
    assert html
    checked = 0
    for src in html:
        if not hc._is_simple_html(src):
            continue
        checked += 1
        assert _blocks_via(src, True) == _blocks_via(src, False), src[:300]
    assert checked > len(html) * 0.9  # the corpus should take the fast path


def test_fast_tokenizer_matches_stdlib_on_edge_cases():
    from engine.core import html_clean as hc
    cases = [
        "", "no tags", "<p>a & b</p>", "<p>trailing &", "<p>&#65;&#x42;</p>",
        "<P>UP</P>", "<br/><br />", '<a href="/x">l</a>',
        "<style>a > b {}</style><p>x</p>", "<title>t &amp; t</title>",
        "<script>s='</script>'</script><p>after</p>", "<p >sp</p >",
        "<table><tr><th>h</th></tr><tr><td>1</td></tr></table>",
    ]
    for src in cases:
        if hc._is_simple_html(src):
            assert _blocks_via(src, True) == _blocks_via(src, False), src


def test_gate_rejects_constructs_the_fast_path_cannot_prove():
    from engine.core.html_clean import _is_simple_html
    for src in ["<!-- c --><p>x</p>", "<!DOCTYPE html><p>x</p>",
                "<?pi?><p>x</p>", "<p>a < b</p>",
                "<script>1 < 2</script>", '<a href=x/>slash-val</a>',
                "<p", "</p attr>x", '<a title="a>b">q</a>']:
        assert not _is_simple_html(src), src


def test_gate_scan_is_linear_on_pathological_input():
    """Possessive quantifiers: a near-miss giant tag must fail fast, not
    backtrack exponentially."""
    import time
    from engine.core.html_clean import _is_simple_html
    evil = "<a " + "x=1 " * 20000 + "\x00>"  # NUL breaks the attr grammar
    t0 = time.perf_counter()
    assert not _is_simple_html(evil)
    assert time.perf_counter() - t0 < 1.0


def test_unterminated_cdata_falls_back_to_stdlib():
    """HTMLParser silently DROPS script/style content that never sees its
    end tag; the fast path must defer to it, not invent a data block."""
    from engine.core import html_clean as hc
    src = "<p>kept prose long enough to survive with the and of to in it</p>" \
          "<script>var x = 1; // never closed"
    assert hc._is_simple_html(src)  # the gate alone cannot see this
    cleaned, stats, spans, tables = hc.clean_html(src)
    ext = hc._Extractor(src)
    ext.feed(src)
    ext.close()
    ext._flush()
    assert stats["blocks_total"] == len(ext.blocks)  # stdlib's reading won
    assert "var x" not in cleaned



def test_module_works_with_fast_gate_unavailable(monkeypatch):
    """On interpreters without possessive quantifiers (<=3.10) the gate
    compiles to None — everything must still work via the stdlib path."""
    from engine.core import html_clean
    monkeypatch.setattr(html_clean, "_FAST_GATE", None)
    monkeypatch.setattr(html_clean, "_FAST_TAG", None)
    src = "<div><p>Plain simple paragraph with enough words to keep it here today.</p></div>"
    assert html_clean._is_simple_html(src) is False
    text, stats, spans, tables = html_clean.clean_html(src)
    assert "Plain simple paragraph" in text
