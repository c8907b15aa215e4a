"""Markdown pipe-table parsing (T1).

Reproduces md_to_json_engine.py:95-132: a table is header row + separator row
+ ≥1 data rows; cells come from ``split('|')[1:-1]``; data rows whose cell
count differs from the header are silently dropped; a table with zero
surviving rows is not emitted.
"""

from __future__ import annotations

import re
from typing import Dict, List

from . import ids

_TABLE_RE = re.compile(r"(\|.+\|[\r\n]+\|[-:\s|]+\|[\r\n]+(?:\|.+\|[\r\n]+)+)")


def extract_tables(page_text: str, page_num: int) -> List[Dict]:
    tables: List[Dict] = []
    for idx, m in enumerate(_TABLE_RE.finditer(page_text)):
        block = m.group(1)
        lines = [ln.strip() for ln in block.split("\n") if ln.strip()]
        if len(lines) < 3:
            continue
        columns = [c.strip() for c in lines[0].split("|")[1:-1]]
        rows = []
        for line in lines[2:]:
            cells = [c.strip() for c in line.split("|")[1:-1]]
            if len(cells) == len(columns):
                rows.append({columns[i]: cells[i] for i in range(len(columns))})
        if rows:
            tables.append({
                "table_id": ids.table_id(page_num, idx, block),
                "title": f"Table on page {page_num}",
                "page": page_num,
                "columns": columns,
                "rows": rows,
                "_start": m.start(), "_end": m.end(),
            })
    return tables
