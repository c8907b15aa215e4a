"""Figure-reference filtering and context extraction (P6, P19).

P6 reproduces figure_filter.py:28-163: each markdown image reference gets a
±240-char whitespace-collapsed context; a figure drops if the context hits a
disclosure indicator (16 lowercase substrings, :117-137) or satisfies the
price-chart heuristic (PRICE ∧ INDEX ∧ TIME keyword regexes, :34-42,139-147).

P19 reproduces batch_figure_processor.py:565-612: for a figure filename,
find its ``![Figure …](images/<name>)`` reference and scan the following 500
chars for ``<center>FIGURE n. title</center>`` and ``<center>… Source: …</center>``.

In the transcript engine there are no image files; the unit of filtering is
the markdown figure *reference* itself, identified by its relative path. The
reference's (retained_paths, dropped_names) contract maps to
(kept_refs, dropped_names) where dropped names are ``sorted()`` exactly as
figure_filter.py:72 does.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .pages import split_pages
from .spans import Span

_FIGURE_RE = re.compile(r"!\[(?P<label>[^\]]*)\]\((?P<path>[^)]+)\)", re.IGNORECASE)
_WS_RE = re.compile(r"\s+")

_PRICE_RE = re.compile(
    r"(rating|price|target|history|performance|relative|total return|12[- ]?month)",
    re.IGNORECASE)
_INDEX_RE = re.compile(
    r"(s&p|msci|sox|nasdaq|dow|ftse|hang\s*seng|hsi|spx|ndx|tsx)", re.IGNORECASE)
_TIME_RE = re.compile(
    r"(jan|feb|mar|apr|may|jun|jul|aug|sep|oct|nov|dec|q[1-4]|20\d{2})", re.IGNORECASE)

_DISCLOSURE_INDICATORS = (
    "analyst(s) certification",
    "important disclosure",
    "availability of disclosure",
    "risk disclosure",
    "disclosure legend",
    "legal entities involved in producing",
    "united kingdom",
    "hong kong",
    "middle east",
    "australia",
    "singapore",
    "americas",
    "bloomberg® is a trademark",
    "barclays bank plc",
    "barclays capital inc",
)

_CTX_WINDOW = 240  # figure_filter.py:150

_FIG_TITLE_RE = re.compile(r"<center>\s*FIGURE\s+\d+\.\s*([^<]+?)\s*</center>", re.IGNORECASE)
_FIG_SOURCE_RE = re.compile(r"<center>\s*([^<]*?Source:\s*[^<]+?)\s*</center>", re.IGNORECASE)


def _context(text: str, start: int, end: int) -> str:
    lo = max(0, start - _CTX_WINDOW)
    hi = min(len(text), end + _CTX_WINDOW)
    return _WS_RE.sub(" ", text[lo:hi]).strip()


def _is_disclosure(blob: str) -> bool:
    lowered = blob.lower()
    return any(ind in lowered for ind in _DISCLOSURE_INDICATORS)


def _is_price_chart(blob: str) -> bool:
    return bool(_PRICE_RE.search(blob) and _INDEX_RE.search(blob) and _TIME_RE.search(blob))


def filter_figures(markdown: str) -> Tuple[List[Dict], List[str], List[Span]]:
    """Classify every figure reference in a page-split markdown payload.

    Returns ``(kept, dropped_names, spans)``:
      kept          — [{page, label, path, filename, context}] in document order
      dropped_names — sorted unique dropped filenames (figure_filter.py:72)
      spans         — figure_kept / figure_dropped spans into ``markdown``

    Note the reference drops by *filename* set membership, so two refs sharing
    a filename share a verdict; preserved here.
    """
    candidates = []
    for pg in split_pages(markdown):
        for m in _FIGURE_RE.finditer(pg.content):
            path = m.group("path").strip()
            filename = path.rsplit("/", 1)[-1]
            label = (m.group("label") or "").strip()
            context = _context(pg.content, m.start(), m.end())
            blob = f"{label}\n{context}"
            candidates.append({
                "page": pg.page,
                "label": label,
                "path": path,
                "filename": filename,
                "context": context,
                "_drop": _is_disclosure(blob) or _is_price_chart(blob),
                "_start": pg.start + m.start(),
                "_end": pg.start + m.end(),
            })

    drop_names = {c["filename"] for c in candidates if c["_drop"]}
    kept, spans = [], []
    for c in candidates:
        dropped = c["filename"] in drop_names
        spans.append(Span("figure_dropped" if dropped else "figure_kept",
                          c["_start"], c["_end"], c["filename"]))
        if not dropped:
            kept.append({k: v for k, v in c.items() if not k.startswith("_")})
    return kept, sorted(drop_names), spans


def figure_context(markdown: str, filename: str) -> Dict[str, str]:
    """P19 — batch_figure_processor.py:565-612. Title/source for one figure."""
    pattern = re.compile(r"!\[Figure[^\]]*\]\(images/" + re.escape(filename) + r"\)")
    m = pattern.search(markdown)
    out: Dict[str, str] = {"title": None, "source": None}
    if not m:
        return out
    window = markdown[m.end():m.end() + 500]
    tm = _FIG_TITLE_RE.search(window)
    if tm:
        out["title"] = tm.group(1).strip()
    sm = _FIG_SOURCE_RE.search(window)
    if sm:
        out["source"] = sm.group(1).strip()
    return out
