"""Entity extraction and dedup/alias resolution (E1, A1, A2, A13, A14).

E1 reproduces md_to_json_engine.py:269-286 (company list → entity records).
The dedup/alias machinery reproduces batch_pdf_processor.py:1402-1451 (A1),
:1862-1900 (A2/A3 probes), :1828-1846 (A14 order-preserving case-insensitive
unique list), :1396-1399 (A13 ticker union).
"""

from __future__ import annotations

import hashlib
import re
from typing import Dict, List, Optional, Tuple

from . import ids

_WS_RE = re.compile(r"\s+")


def entities_from_companies(companies: List[str]) -> List[Dict]:
    """E1 — md_to_json_engine.py:272-286."""
    return [
        {"entity_id": ids.entity_id(name), "name": name, "type": "company", "aliases": []}
        for name in companies
    ]


def normalize_entity_name(name) -> Optional[str]:
    """A1 normalize — batch_pdf_processor.py:1823-1826 (whitespace collapse)."""
    if not isinstance(name, str):
        return None
    normalized = _WS_RE.sub(" ", name).strip()
    return normalized or None


def unique_list(values) -> List[str]:
    """A14 — batch_pdf_processor.py:1828-1846: order-preserving,
    case-insensitive dedup of string-able values."""
    if not values:
        return []
    if isinstance(values, str):
        values = [values]
    seen = set()
    out: List[str] = []
    for v in values:
        if v is None:
            continue
        s = str(v).strip()
        if not s:
            continue
        key = s.lower()
        if key not in seen:
            seen.add(key)
            out.append(s)
    return out


def ticker_union(*ticker_lists) -> List[str]:
    """A13 — batch_pdf_processor.py:1396-1399: sorted upper-cased set union."""
    out = set()
    for lst in ticker_lists:
        for t in lst or []:
            if isinstance(t, str) and t.strip():
                out.add(t.strip().upper())
    return sorted(out)


class EntityIndex:
    """A1/A2 — doc-local entity map + alias index
    (batch_pdf_processor.py:1402-1451, :1848-1884)."""

    def __init__(self, salt: str = "") -> None:
        self.salt = salt
        self.entity_map: Dict[str, Dict] = {}
        self.alias_index: Dict[str, str] = {}
        self.entities: List[Dict] = []

    def add(self, entity: Dict) -> Optional[Dict]:
        name = normalize_entity_name(entity.get("name"))
        if not name:
            return None
        key = name.lower()
        existing = self.entity_map.get(key)
        if existing is None:
            eid = entity.get("entity_id") or hashlib.md5(
                f"{name}|{self.salt}".encode()).hexdigest()[:16]
            obj: Dict = {"entity_id": eid, "name": name}
            for opt in ("type", "ticker", "isin", "lei", "country"):
                if entity.get(opt):
                    obj[opt] = entity[opt]
            aliases = unique_list(entity.get("aliases"))
            if aliases:
                obj["aliases"] = aliases
            self.entity_map[key] = obj
            self.entities.append(obj)
            self._register_aliases(obj)
            return obj
        # first-wins merge of optional fields (ref :1432-1443)
        for opt in ("type", "ticker", "isin", "lei", "country"):
            if opt not in existing and entity.get(opt):
                existing[opt] = entity[opt]
        for alias in unique_list(entity.get("aliases")):
            existing.setdefault("aliases", [])
            if alias not in existing["aliases"]:
                existing["aliases"].append(alias)
        self._register_aliases(existing)
        return existing

    def _register_aliases(self, obj: Dict) -> None:
        """batch_pdf_processor.py:1848-1860."""
        eid = obj["entity_id"]
        self.alias_index.setdefault(obj["name"].lower(), eid)
        ticker = obj.get("ticker")
        if isinstance(ticker, str) and ticker.strip():
            self.alias_index.setdefault(ticker.strip().lower(), eid)
        for alias in obj.get("aliases", []):
            self.alias_index.setdefault(alias.lower(), eid)

    def resolve(self, ref) -> Optional[str]:
        """A2 — batch_pdf_processor.py:1862-1884: probe by id, then name/alias."""
        if isinstance(ref, dict):
            if ref.get("entity_id"):
                return str(ref["entity_id"])
            ref = ref.get("name")
        if not isinstance(ref, str) or not ref.strip():
            return None
        lowered = normalize_entity_name(ref)
        if not lowered:
            return None
        lowered = lowered.lower()
        hit = self.entity_map.get(lowered)
        if hit:
            return hit["entity_id"]
        return self.alias_index.get(lowered)


def lookup_passage_id(index_map: Dict[int, Dict[int, str]], page: int,
                      idx: int) -> Optional[str]:
    """A3 — batch_pdf_processor.py:1886-1900: probe [idx, idx-1, idx+1]."""
    page_map = index_map.get(page)
    if not page_map:
        return None
    for candidate in (idx, idx - 1, idx + 1):
        if candidate in page_map:
            return page_map[candidate]
    return None
