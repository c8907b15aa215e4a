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
    def __init__(self, source: str) -> None:
        super().__init__(convert_charrefs=True)
        self.source = source
        self._line_starts = [0]
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
    parser = _Extractor(source)
    try:
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
