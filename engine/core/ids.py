"""Stable-ID helpers.

The reference derives every stable identifier from md5 of an exact format
string (reference: md_to_json_engine.py:84,122,219,247,278,347). Per-turn
equality requires reproducing those format strings byte-for-byte, so they are
centralized here and nowhere else.
"""

from __future__ import annotations

import hashlib


def _md5_16(payload: str) -> str:
    return hashlib.md5(payload.encode()).hexdigest()[:16]


def passage_id(page: int, idx: int, text: str) -> str:
    """reference: md_to_json_engine.py:84 — md5(f"{page}_{idx}_{part[:50]}")[:16]"""
    return _md5_16(f"{page}_{idx}_{text[:50]}")


def table_id(page: int, idx: int, table_text: str) -> str:
    """reference: md_to_json_engine.py:122 — md5(f"{page}_{idx}_{tbl[:50]}")[:16]"""
    return _md5_16(f"{page}_{idx}_{table_text[:50]}")


def num_id(page: int, value, context: str) -> str:
    """reference: md_to_json_engine.py:219,247 — md5(f"{page}_{value}_{ctx[:30]}")[:16]

    Note the reference passes the *string* regex group for percentages
    (":219", ``value`` before float conversion) but the *float* for currency
    (":247", after multiplier scaling). Callers pass exactly what the
    reference would have interpolated.
    """
    return _md5_16(f"{page}_{value}_{context[:30]}")


def entity_id(name: str) -> str:
    """reference: md_to_json_engine.py:278 — md5(company)[:16]"""
    return _md5_16(name)


def doc_id(doc_name: str) -> str:
    """reference: md_to_json_engine.py:347 — full md5 hexdigest of the doc name."""
    return hashlib.md5(doc_name.encode()).hexdigest()
