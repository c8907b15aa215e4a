"""Page segmentation of page-split markdown (P1, P20, P21).

The reference splits markdown on ``\\n\\n--- Page (\\d+) ---\\n\\n`` and treats
any leading un-numbered chunk as page 0 (the cover). That splitter is
duplicated four times in the reference (md_to_json_engine.py:29-47,
md_cleaner.py:236-253, figure_filter.py:78-88, batch_pdf_processor.py:1030-1046);
here it exists once, in an offset-preserving form so span records can point
back into the original payload.
"""

from __future__ import annotations

import re
from typing import List, NamedTuple

PAGE_SEP_RE = re.compile(r"\n\n--- Page (\d+) ---\n\n")
_PAGE_MARK_RE = re.compile(r"--- Page \d+ ---")
_WORD_RE = re.compile(r"\w+")


class Page(NamedTuple):
    page: int       # page number as declared by the separator (0 = cover)
    content: str    # stripped page content (what downstream operators see)
    start: int      # offset of `content` within the original string
    end: int        # start + len(content)


def split_pages(markdown: str) -> List[Page]:
    """Offset-aware equivalent of the reference's ``split_by_pages``.

    Semantics pinned to md_to_json_engine.py:31-47: the text before the first
    separator, if non-blank after strip, becomes page 0; each separator's
    captured number labels the chunk that follows it; chunk text is
    ``.strip()``-ed. A trailing separator therefore yields a final page whose
    content is '' — the reference keeps that pair and downstream loops see an
    empty page; we keep it too.
    """
    pages: List[Page] = []
    cursor = 0
    pending_num: int | None = None  # number from the previous separator

    for m in PAGE_SEP_RE.finditer(markdown):
        chunk = markdown[cursor:m.start()]
        _append(pages, pending_num, chunk, cursor)
        pending_num = int(m.group(1))
        cursor = m.end()

    _append(pages, pending_num, markdown[cursor:], cursor)
    return pages


def _append(pages: List[Page], num: int | None, chunk: str, chunk_start: int) -> None:
    stripped = chunk.strip()
    if num is None:
        # leading chunk → page 0, only if non-blank (md_to_json_engine.py:37-39)
        if not stripped:
            return
        num = 0
    # locate the stripped content inside the chunk for exact offsets
    lead = len(chunk) - len(chunk.lstrip())
    start = chunk_start + lead
    pages.append(Page(num, stripped, start, start + len(stripped)))


def count_page_markers(markdown: str) -> int:
    """P21 — reference: batch_pdf_processor.py:2458-2459."""
    return len(_PAGE_MARK_RE.findall(markdown))


def word_count(markdown: str) -> int:
    """P20 — reference: batch_pdf_processor.py:2019 (Python ``\\w+`` semantics,
    unicode classes included; deliberately not Spark's Java regex)."""
    return len(_WORD_RE.findall(markdown))


def merge_pages(pages: List[tuple]) -> str:
    """P4 page re-merge after cleaning — reference: md_cleaner.py:330-340.

    Page 0 is emitted bare; page n>0 as ``\\n\\n--- Page n ---\\n\\n{content}``;
    parts are concatenated with no extra separator (``''.join``).
    """
    parts = []
    for page_num, content in pages:
        if page_num == 0:
            parts.append(content)
        else:
            parts.append(f"\n\n--- Page {page_num} ---\n\n{content}")
    return "".join(parts)
