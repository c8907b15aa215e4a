"""HTML main-content extraction — boilerplate strip via block scoring.

New surface required by the engine's north star (the reference pipeline has
no HTML path; its analogue is the markdown section/paragraph boilerplate
cleaner, md_cleaner.py:39-328). The heuristics here are the public-domain
Readability / jusText family: tokenize the DOM with the stdlib parser, group
text into block-level segments, and classify each block by

  * link density   (chars inside <a> / total chars — link farms score ~1.0)
  * stopword ratio (function-word density — real prose scores high)
  * length         (short fragments are navigation/chrome unless headings)

plus hard drops for non-content elements (script/style/nav/header/footer/
aside/form/template/noscript/iframe/svg/button).

This module is its own oracle: its behavior is frozen by golden vectors in
tests/golden/, and the Spark path runs this exact code inside Arrow UDFs.
"""

from __future__ import annotations

import re
from html.parser import HTMLParser
from typing import Dict, List, Optional, Tuple

from . import ids
from .spans import Span

_WS_RE = re.compile(r"\s+")
_WORD_RE = re.compile(r"[A-Za-z']+")

# Minimal English stopword list (public knowledge; enough for density scoring).
_STOPWORDS = frozenset("""
a about above after again all also am an and any are as at be because been
before being below between both but by can did do does doing down during each
few for from further had has have having he her here hers him his how i if in
into is it its just me more most my no nor not now of off on once only or
other our out over own same she should so some such than that the their them
then there these they this those through to too under until up very was we
were what when where which while who whom why will with you your
""".split())

_DROP_TAGS = frozenset({"script", "style", "nav", "header", "footer", "aside",
                        "form", "template", "noscript", "iframe", "svg",
                        "button", "select", "option"})
_BLOCK_TAGS = frozenset({"p", "div", "article", "section", "main", "li", "ul",
                         "ol", "h1", "h2", "h3", "h4", "h5", "h6", "td", "th",
                         "tr", "table", "blockquote", "pre", "figure",
                         "figcaption", "body", "html", "dd", "dt", "dl", "br"})
_HEADING_TAGS = frozenset({"h1", "h2", "h3", "h4", "h5", "h6"})
_VOID_TAGS = frozenset({"br", "hr", "img", "input", "meta", "link", "area",
                        "base", "col", "embed", "source", "track", "wbr"})

# classification thresholds (fixed constants = part of the frozen contract)
MAX_LINK_DENSITY = 0.33
MIN_GOOD_LEN = 40
MIN_STOPWORD_RATIO = 0.10
LONG_BLOCK_LEN = 200


class _Block:
    __slots__ = ("texts", "link_chars", "start", "end", "tag", "dropped_tree")

    def __init__(self, tag: str, dropped_tree: bool) -> None:
        self.texts: List[str] = []
        self.link_chars = 0
        self.start = -1
        self.end = -1
        self.tag = tag
        self.dropped_tree = dropped_tree

    @property
    def text(self) -> str:
        return _WS_RE.sub(" ", "".join(self.texts)).strip()


class _Extractor(HTMLParser):
    def __init__(self, source: str, fast: bool = False) -> None:
        super().__init__(convert_charrefs=True)
        self.source = source
        self._fast_pos: Optional[int] = None
        self._line_starts = [0]
        if not fast:  # the line index exists only for getpos()-based offsets
            pos = source.find("\n")
            while pos != -1:
                self._line_starts.append(pos + 1)
                pos = source.find("\n", pos + 1)
        self.blocks: List[_Block] = []
        self._drop_depth = 0
        self._link_depth = 0
        self._current: Optional[_Block] = None
        self.title: Optional[str] = None
        self._in_title = False
        # table capture
        self.tables: List[Dict] = []
        self._table_rows: Optional[List[List[str]]] = None
        self._row_cells: Optional[List[str]] = None
        self._cell_texts: Optional[List[str]] = None
        self._table_start = -1

    # -- offset helpers ----------------------------------------------------
    def _abs_pos(self) -> int:
        if self._fast_pos is not None:  # driven by _fast_feed
            return self._fast_pos
        line, col = self.getpos()
        return self._line_starts[line - 1] + col

    # -- block lifecycle ---------------------------------------------------
    def _open_block(self, tag: str) -> None:
        self._flush()
        self._current = _Block(tag, self._drop_depth > 0)

    def _flush(self) -> None:
        if self._current is not None and self._current.text:
            self.blocks.append(self._current)
        self._current = None

    # -- parser events -----------------------------------------------------
    def handle_starttag(self, tag: str, attrs) -> None:
        if tag == "title":
            self._in_title = True
        if tag in _DROP_TAGS:
            self._drop_depth += 1
        if tag == "a":
            self._link_depth += 1
        if tag in _BLOCK_TAGS:
            self._open_block(tag)
        # table capture — not inside dropped subtrees (a nav/footer table is
        # boilerplate exactly like its surrounding text)
        if tag == "table" and self._drop_depth == 0:
            self._table_rows = []
            self._table_start = self._abs_pos()
        elif tag == "tr" and self._table_rows is not None:
            self._row_cells = []
        elif tag in ("td", "th") and self._row_cells is not None:
            self._cell_texts = []

    def handle_endtag(self, tag: str) -> None:
        if tag == "title":
            self._in_title = False
        if tag in ("td", "th") and self._cell_texts is not None:
            self._row_cells.append(_WS_RE.sub(" ", "".join(self._cell_texts)).strip())
            self._cell_texts = None
        elif tag == "tr" and self._row_cells is not None:
            if self._row_cells:
                self._table_rows.append(self._row_cells)
            self._row_cells = None
        elif tag == "table" and self._table_rows is not None:
            self._emit_table()
        if tag in _BLOCK_TAGS:
            self._flush()
        if tag == "a" and self._link_depth > 0:
            self._link_depth -= 1
        if tag in _DROP_TAGS and self._drop_depth > 0:
            self._drop_depth -= 1

    def handle_data(self, data: str) -> None:
        if self._in_title and data.strip():
            self.title = (self.title or "") + data
        if self._cell_texts is not None:
            self._cell_texts.append(data)
        if not data.strip():
            return
        if self._current is None:
            self._open_block("body")
        blk = self._current
        if self._drop_depth > 0:
            blk.dropped_tree = True
        pos = self._abs_pos()
        if blk.start < 0:
            blk.start = pos
        blk.end = pos + len(data)
        blk.texts.append(data)
        if self._link_depth > 0:
            blk.link_chars += len(data.strip())

    def _emit_table(self) -> None:
        rows = self._table_rows or []
        self._table_rows = None
        if len(rows) < 2:
            return
        columns = rows[0]
        data_rows = [
            {columns[i]: r[i] for i in range(len(columns))}
            for r in rows[1:] if len(r) == len(columns)
        ]
        if not data_rows:
            return
        sig = "|".join(columns)
        self.tables.append({
            "table_id": ids.table_id(0, len(self.tables), sig),
            "title": f"Table on page {0}",
            "page": 0,
            "columns": columns,
            "rows": data_rows,
            "_start": self._table_start, "_end": self._table_start,
        })


# ---------------------------------------------------------------------------
# Fast tokenizer (gated). The stdlib HTMLParser dominates the HTML turn cost
# (~1.3 ms/turn: tolerant attr regexes, per-event bookkeeping). For the
# overwhelmingly common "simple" documents we drive the SAME _Extractor
# handlers from a regex tokenizer instead — but only when a strict grammar
# proves the simple tokenizer and HTMLParser read the document identically:
#   * every '<' opens a well-formed start tag (quoted values may not contain
#     < or >; unquoted values may not contain / — the one case where
#     HTMLParser's self-closing detection gets subtle) or a strict </name>
#     end tag;
#   * every `</script` / `</style` occurrence is a full `</script>` form
#     (inside CDATA content HTMLParser's partial-endtag recovery differs);
#   * comments, doctypes, PIs, bare '<' in text → not simple → stdlib.
# Possessive quantifiers (Python 3.11) keep the gate scan linear.
# Equality is enforced by differential tests over the full synthetic corpus
# plus adversarial cases (tests/test_html_clean.py) and the frozen goldens.
# ---------------------------------------------------------------------------
_ATTR = r"""\s++[a-zA-Z-][a-zA-Z0-9-]*+(?:=(?:"[^"<>]*+"|'[^'<>]*+'|[^\s<>"'/]++))?"""
# Start-tag variants keep HTMLParser's self-closing detection provable: a
# closing '/' is legal only right after the tag name (<br/>) or after
# whitespace (<br />). '/' straight after an unquoted or quoted value
# (<a href=x/>) is where HTMLParser folds it into the value — rejected.
# Possessive quantifiers need Python ≥3.11; on older interpreters the
# compile raises re.error at import — in that case only the fast tokenizer
# is disabled (gate always says "not simple") and the stdlib path keeps
# the module fully functional.
try:
    _FAST_GATE = re.compile(rf"""\A
(?:
    [^<]++
  | </[a-zA-Z][a-zA-Z0-9]*+\s*+>
  | <[a-zA-Z][a-zA-Z0-9]*+/?+>
  | <[a-zA-Z][a-zA-Z0-9]*+(?:{_ATTR})*+\s++/?+>
  | <[a-zA-Z][a-zA-Z0-9]*+(?:{_ATTR})++>
)*+\Z""", re.VERBOSE)
    _FAST_TAG = re.compile(
        r"""<(/?)([a-zA-Z][a-zA-Z0-9]*+)((?:"[^"<>]*+"|'[^'<>]*+'|[^<>"'])*+)>""")
except re.error:  # pragma: no cover — Python ≤3.10 executors
    _FAST_GATE = _FAST_TAG = None
_CDATA_PARTIAL = re.compile(r"</\s*(?:script|style)", re.IGNORECASE)
_CDATA_FULL = re.compile(r"</\s*(?:script|style)\s*>", re.IGNORECASE)
_CDATA_END = {t: re.compile(rf"</\s*{t}", re.IGNORECASE)
              for t in ("script", "style")}


def _is_simple_html(source: str) -> bool:
    if _FAST_GATE is None or _FAST_GATE.fullmatch(source) is None:
        return False
    for m in _CDATA_PARTIAL.finditer(source):
        if _CDATA_FULL.match(source, m.start()) is None:
            return False
    return True


def _fast_feed(ext: _Extractor, source: str) -> None:
    """Drive _Extractor's handlers with the same events, payloads, and
    positions HTMLParser would produce on a gate-approved document."""
    from html import unescape
    pos, n = 0, len(source)
    cdata: Optional[str] = None
    while pos < n:
        if cdata is not None:
            m = _CDATA_END[cdata].search(source, pos)
            if m is None:
                # unterminated script/style: HTMLParser DROPS cdata content
                # that never sees its end tag — punt to the stdlib backend
                # (clean_html catches this and re-parses) instead of
                # guessing its recovery behavior here
                raise ValueError("unterminated cdata element")
            if m.start() > pos:
                ext._fast_pos = pos
                ext.handle_data(source[pos:m.start()])  # raw — no charrefs
            ext._fast_pos = m.start()
            ext.handle_endtag(cdata)
            pos = source.index(">", m.start()) + 1  # gate: '</name \s* >'
            cdata = None
            continue
        lt = source.find("<", pos)
        if lt < 0:
            lt = n
        if lt > pos:
            ext._fast_pos = pos
            ext.handle_data(unescape(source[pos:lt]))
            pos = lt
        if pos >= n:
            return
        m = _FAST_TAG.match(source, pos)  # gate guarantees a match
        closing, name, interior = m.group(1), m.group(2).lower(), m.group(3)
        ext._fast_pos = pos
        if closing:
            ext.handle_endtag(name)
        elif interior.endswith("/"):  # '<br/>': starttag + endtag, no cdata
            ext.handle_starttag(name, [])
            ext.handle_endtag(name)
        else:
            ext.handle_starttag(name, [])
            if name in ("script", "style"):
                cdata = name
        pos = m.end()


def _classify(block: _Block) -> bool:
    if block.dropped_tree:
        return False
    text = block.text
    n = len(text)
    if n == 0:
        return False
    link_density = block.link_chars / n if n else 1.0
    if link_density > MAX_LINK_DENSITY:
        return False
    if block.tag in _HEADING_TAGS:
        return n >= 3
    words = _WORD_RE.findall(text.lower())
    stop_ratio = (sum(1 for w in words if w in _STOPWORDS) / len(words)) if words else 0.0
    if n >= LONG_BLOCK_LEN:
        return True
    return n >= MIN_GOOD_LEN and stop_ratio >= MIN_STOPWORD_RATIO


def clean_html(source: str) -> Tuple[str, Dict, List[Span], List[Dict]]:
    """Extract main content from an HTML fragment/document.

    Returns ``(cleaned_text, stats, spans, tables)``. ``cleaned_text`` is the
    kept blocks joined with blank lines (headings keep a ``#``-style prefix by
    level so downstream markdown operators see structure). Heading blocks
    with no following kept prose are themselves dropped (jusText edge rule).
    """
    fast = _is_simple_html(source)
    parser = _Extractor(source, fast=fast)
    try:
        if fast:
            try:
                _fast_feed(parser, source)
            except Exception:  # any fast-path surprise → stdlib, not degrade
                parser = _Extractor(source)
                parser.feed(source)
                parser.close()
        else:
            parser.feed(source)
            parser.close()
    except Exception:
        # never throw: fall back to tag-stripped text
        stripped = _WS_RE.sub(" ", re.sub(r"<[^>]+>", " ", source)).strip()
        return stripped, {"original_length": len(source),
                          "final_length": len(stripped),
                          "blocks_total": 0, "blocks_kept": 0,
                          "parse_fallback": True}, [], []
    parser._flush()

    verdicts = [(_classify(b), b) for b in parser.blocks]

    # heading demotion: drop a kept heading with no kept prose after it
    kept_flags = [v for v, _ in verdicts]
    for i, (v, b) in enumerate(verdicts):
        if v and b.tag in _HEADING_TAGS:
            if not any(kept_flags[j] and verdicts[j][1].tag not in _HEADING_TAGS
                       for j in range(i + 1, len(verdicts))):
                kept_flags[i] = False

    spans: List[Span] = []
    parts: List[str] = []
    kept_count = 0
    for flag, (v, b) in zip(kept_flags, verdicts):
        kind = "html_kept" if flag else "html_dropped"
        if b.start >= 0:
            spans.append(Span(kind, b.start, min(b.end, len(source)), b.tag))
        if flag:
            kept_count += 1
            if b.tag in _HEADING_TAGS:
                parts.append("#" * int(b.tag[1]) + " " + b.text)
            else:
                parts.append(b.text)

    cleaned = "\n\n".join(parts)
    stats = {
        "original_length": len(source),
        "final_length": len(cleaned),
        "blocks_total": len(verdicts),
        "blocks_kept": kept_count,
        "parse_fallback": False,
    }
    tables = parser.tables
    title = _WS_RE.sub(" ", parser.title).strip() if parser.title else None
    if title:
        stats["title"] = title
    return cleaned, stats, spans, tables
