"""Grounded-token OCR output processing (P7–P10).

A grounded payload is a sequence of blocks
``<|ref|>{label}<|/ref|><|det|>[[x1,y1,x2,y2], ...]<|/det|>`` followed by body
text, with pages separated by ``\\n<--- Page Split --->\\n`` (reference sample
test_det.md; producer run_dpsk_ocr_pdf.py:296-298). The reference converts
this to page-split markdown in batch_pdf_processor.py:354-407:

 * EOS marker ``<｜end of sentence｜>`` removed (:366-367)
 * image-labelled refs become ``![Figure {p}-{i}](images/{p}_{i}.jpg)\\n``
   with 0-based page index p and per-page running figure index i (:377-381)
 * all other refs are stripped and ``\\coloneqq``/``\\eqqcolon`` rewritten (:383-386)
 * each page is emitted as ``content + '\\n\\n--- Page {p+1} ---\\n\\n'`` — the
   separator *trails* the page (:388-391), which is why downstream page
   splitting sees the first page as "page 0": that quirk is part of the
   contract and is preserved.

Coordinate payloads: the reference ``eval()``s the det string
(batch_pdf_processor.py:488 — an arbitrary-code-execution bug). We accept the
same literal grammar via ``ast.literal_eval`` and skip unparseable payloads,
matching the reference's try/except skip (:482-491). Coordinates stay on the
0–999 grid (no pixel dims exist in the transcript world); the reference's
pixel scaling ``int(v/999*dim)`` (:465-468) is exposed as ``scale_box``.
"""

from __future__ import annotations

import ast
import re
from typing import Dict, List, Optional, Tuple

from .spans import Span

EOS_MARKER = "<｜end of sentence｜>"
EOS_MARKER_WIDE = "<｜end▁of▁sentence｜>"
PAGE_SPLIT_MARKER = "\n<--- Page Split --->\n"

REF_RE = re.compile(r"(<\|ref\|>(.*?)<\|/ref\|><\|det\|>(.*?)<\|/det\|>)", re.DOTALL)
_IMAGE_REF_TAG = "<|ref|>image<|/ref|>"


def strip_eos(text: str) -> str:
    """P10 — batch_pdf_processor.py:366-367 plus the wide variant
    (md_to_json_engine.py:72)."""
    return text.replace(EOS_MARKER, "").replace(EOS_MARKER_WIDE, "")


def parse_refs(text: str) -> List[Tuple[str, str, str]]:
    """P7 — batch_pdf_processor.py:393-407. Returns (full, label, det) tuples."""
    return REF_RE.findall(text)


# exact mirror of the literal grammar for the common integer case: no
# leading zeros (SyntaxError in literal_eval) and mandatory commas BETWEEN
# boxes (a missing comma is a malformed Subscript the reference rejects)
_DET_INT = r"-?(?:0|[1-9]\d*)"
_DET_BOX = rf"\[\s*{_DET_INT}\s*(?:,\s*{_DET_INT}\s*){{3}}\]"
_DET_FAST_RE = re.compile(rf"^\[\s*{_DET_BOX}(?:\s*,\s*{_DET_BOX})*\s*,?\s*\]$")
_INT_RE = re.compile(r"-?\d+")


def parse_det_boxes(det_payload: str) -> Optional[List[List[int]]]:
    """P8 — safe replacement for the reference's ``eval`` (:488).

    Accepts the same literal grammar (a list of 4-number lists); returns None
    on anything else, mirroring the reference's exception-swallowing path.
    The common integer form is parsed with a regex fast path (ast.literal_eval
    compiles a code object per call); anything else falls back to the full
    literal parser (floats, odd spacing).
    """
    payload = det_payload.strip()
    if _DET_FAST_RE.match(payload):
        nums = [int(x) for x in _INT_RE.findall(payload)]
        return [nums[i:i + 4] for i in range(0, len(nums), 4)]
    try:
        value = ast.literal_eval(payload)
    except (ValueError, SyntaxError, MemoryError, RecursionError):
        return None
    if not isinstance(value, (list, tuple)):
        return None
    boxes: List[List[int]] = []
    for item in value:
        if (isinstance(item, (list, tuple)) and len(item) == 4
                and all(isinstance(v, (int, float)) for v in item)):
            boxes.append([int(v) for v in item])
        else:
            return None
    return boxes or None


def scale_box(box: List[int], width: int, height: int) -> List[int]:
    """0–999 grid → pixels, reference rounding (batch_pdf_processor.py:465-468)."""
    x1, y1, x2, y2 = box
    return [int(x1 / 999 * width), int(y1 / 999 * height),
            int(x2 / 999 * width), int(y2 / 999 * height)]


def grounded_to_markdown(raw: str) -> Tuple[str, List[Dict], List[Span]]:
    """Convert a (possibly multi-page) grounded payload to page-split markdown.

    Returns ``(markdown, layout_blocks, spans)``. ``layout_blocks`` is the
    per-ref structured view (page, label, boxes, body preview) — the engine's
    equivalent of the reference's PDF layout regions. ``spans`` locate every
    ref token run in the original payload (kind='ref', label=ref label).
    """
    blocks: List[Dict] = []
    spans: List[Span] = []

    raw_pages = raw.split(PAGE_SPLIT_MARKER) if PAGE_SPLIT_MARKER in raw else [raw]

    page_base = 0
    out_parts: List[str] = []
    for page_idx, page_raw in enumerate(raw_pages):
        content = strip_eos(page_raw)

        img_idx = 0
        for m in REF_RE.finditer(page_raw):
            full, label, det = m.group(1), m.group(2), m.group(3)
            spans.append(Span("ref", page_base + m.start(), page_base + m.end(), label))
            boxes = parse_det_boxes(det)
            blocks.append({
                "page": page_idx,
                "label": label,
                "boxes": boxes or [],
                "parse_ok": boxes is not None,
            })
            if _IMAGE_REF_TAG in full:
                figure_path = f"images/{page_idx}_{img_idx}.jpg"
                content = content.replace(
                    full, f"![Figure {page_idx}-{img_idx}]({figure_path})\n")
                img_idx += 1
            else:
                content = content.replace(full, "")

        content = content.replace("\\coloneqq", ":=").replace("\\eqqcolon", "=:")
        out_parts.append(content + f"\n\n--- Page {page_idx + 1} ---\n\n")
        page_base += len(page_raw) + len(PAGE_SPLIT_MARKER)

    return "".join(out_parts), blocks, spans
