"""Figure-vision call shape (G4/G5) — deterministic stub.

The reference sends figure crops to an external vision model
(batch_pdf_processor.py:1223-1309 single, batch_figure_processor.py:88-358
batched 15/call) and parses a JSON figure record back. External model calls
are out of scope; we replicate the *orchestration shape*: an injectable
``extract_fn`` consuming a figure descriptor and returning a schema-shaped
figure record, batched, with the reference's fallback record on failure and
its type coercion / stock-price skip (batch_figure_processor.py:272-310).

The default ``deterministic_fake`` derives everything from the figure's
title/context hash, so tests are stable without any network or model.

Known reference bugs NOT replicated (documented deviation, SURVEY §7.4):
missing ``hashlib`` import (batch_figure_processor.py:320,499) and the
undefined ``figure_contexts`` name (:339) — this module implements the
intended behavior.
"""

from __future__ import annotations

import hashlib
from typing import Callable, Dict, List, Optional

BATCH_SIZE = 15  # batch_figure_processor.py:38-43

VALID_FIGURE_TYPES = {"bar", "line", "area", "pie", "scatter", "heatmap",
                      "waterfall", "combo", "other"}  # json schema.json:100-218


def figure_id(path: str, page: int) -> str:
    """reference: batch_pdf_processor.py:1289 — md5(f"{path}_{page}")[:16]."""
    return hashlib.md5(f"{path}_{page}".encode()).hexdigest()[:16]


def coerce_type(figure_type: Optional[str]) -> str:
    """Type coercion into the schema enum (batch_figure_processor.py:272-291)."""
    t = (figure_type or "other").strip().lower()
    return t if t in VALID_FIGURE_TYPES else "other"


def deterministic_fake(descriptor: Dict) -> Dict:
    """Stand-in for the vision model: a valid figure record derived from the
    descriptor hash — same input, same output, schema-conformant."""
    seed = hashlib.md5(
        f"{descriptor.get('path')}|{descriptor.get('title') or ''}".encode()).hexdigest()
    types = sorted(VALID_FIGURE_TYPES)
    ftype = types[int(seed[:2], 16) % len(types)]
    base = int(seed[2:6], 16) % 1000
    return {
        "type": ftype,
        "title": descriptor.get("title") or descriptor.get("label") or "Figure",
        "page": descriptor.get("page", 0),
        "axes": {"x": {"type": "category",
                       "labels_raw": ["A", "B", "C"],
                       "labels_norm": ["a", "b", "c"]},
                 "y_left": {"unit": "unitless", "log": False}},
        "series": [{"name": "series-1", "unit": "unitless",
                    "values": [float(base), float(base + 1), float(base + 2)]}],
    }


def fallback_record(descriptor: Dict) -> Dict:
    """Reference fallback on model failure (batch_figure_processor.py:326-358):
    a minimal valid record with type 'other' and empty series."""
    return {
        "figure_id": figure_id(descriptor.get("path", ""), descriptor.get("page", 0)),
        "type": "other",
        "title": descriptor.get("title") or "Figure",
        "page": _to_one_based(descriptor.get("page", 0)),
        "series": [],
        "provenance": {"page": _to_one_based(descriptor.get("page", 0))},
    }


def _to_one_based(page: int) -> int:
    """Stored figure pages are 0-based; output is 1-based
    (batch_pdf_processor.py:2449-2456)."""
    return max(1, int(page) + 1)


def extract_figures_batched(descriptors: List[Dict],
                            extract_fn: Callable[[Dict], Dict] = deterministic_fake,
                            batch_size: int = BATCH_SIZE) -> List[Dict]:
    """G5 — batch of ``batch_size`` descriptors per call; per-item fallback on
    failure; stock_price figures skipped (batch_figure_processor.py:292-300)."""
    out: List[Dict] = []
    for i in range(0, len(descriptors), batch_size):
        for d in descriptors[i:i + batch_size]:
            try:
                rec = extract_fn(d)
            except Exception:
                out.append(fallback_record(d))
                continue
            if (rec.get("type") or "").lower() == "stock_price":
                continue
            out.append({
                "figure_id": figure_id(d.get("path", ""), d.get("page", 0)),
                "type": coerce_type(rec.get("type")),
                "title": rec.get("title") or d.get("title") or "Figure",
                "page": _to_one_based(d.get("page", 0)),
                "axes": rec.get("axes"),
                "series": rec.get("series") or [],
                "provenance": {"page": _to_one_based(d.get("page", 0))},
            })
    return out
