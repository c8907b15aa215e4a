"""Passage and heading extraction (P11, P12).

Reproduces md_to_json_engine.py:49-93: image refs, HTML tags, and the OCR EOS
marker are stripped; the page splits on blank lines; parts shorter than 20
chars or starting with '#' are dropped; the passage id hashes
``{page}_{idx}_{text[:50]}`` where ``idx`` is the index in the blank-line
split (including dropped parts).
"""

from __future__ import annotations

import re
from typing import Dict, List

from . import ids

_IMG_REF_RE = re.compile(r"!\[.*?\]\(.*?\)")
_HTML_TAG_RE = re.compile(r"<[^>]+>")
_EOS_WIDE_RE = re.compile(r"<｜end▁of▁sentence｜>")
_HEADING_RE = re.compile(r"^(#{1,6})\s+(.+)$", re.MULTILINE)

MIN_PASSAGE_LEN = 20  # md_to_json_engine.py:80


def extract_passages(page_text: str, page_num: int) -> List[Dict]:
    text = _IMG_REF_RE.sub("", page_text)
    text = _HTML_TAG_RE.sub("", text)
    text = _EOS_WIDE_RE.sub("", text)

    out: List[Dict] = []
    for idx, part in enumerate(text.split("\n\n")):
        part = part.strip()
        if len(part) < MIN_PASSAGE_LEN or part.startswith("#"):
            continue
        out.append({
            "passage_id": ids.passage_id(page_num, idx, part),
            "text": part,
            "page": page_num,
            "section": None,
        })
    return out


def extract_headings(text: str) -> List[Dict]:
    """P12 — md_to_json_engine.py:49-61."""
    return [
        {"level": len(m.group(1)), "title": m.group(2).strip()}
        for m in _HEADING_RE.finditer(text)
    ]
