"""Span records: character offsets into the original turn payload.

This is a new requirement of the Spark engine (the reference emits whole
files, not offsets). A span is ``(kind, start, end, label)``; offsets index
the *original* ``text`` column. ``start == end == -1`` marks a record whose
exact position could not be recovered (e.g. a paragraph whose bytes were
altered before matching); all other spans satisfy
``0 <= start <= end <= len(text)``.

Kinds used across the engine:
  page, removed_section, removed_paragraph, passage, table, numeric,
  figure_kept, figure_dropped, ref, html_kept, html_dropped
"""

from __future__ import annotations

from typing import List, NamedTuple


class Span(NamedTuple):
    kind: str
    start: int
    end: int
    label: str

    def as_dict(self) -> dict:
        return {"kind": self.kind, "start": self.start, "end": self.end, "label": self.label}


def spans_to_dicts(spans: List[Span]) -> List[dict]:
    return [s.as_dict() for s in spans]
