"""Numeric extraction and coercion (N1–N5).

Percentage / currency extraction with context windows reproduces
md_to_json_engine.py:209-266; the value coercion / unit / metric-type
inference trio reproduces batch_pdf_processor.py:1902-1987 (used by the
reference's LLM-aggregation path; kept for shape parity and reused by our
table-cell typing).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from . import ids

_PCT_RE = re.compile(r"([+-]?\d+\.?\d*)\s*%")
_CCY_RE = re.compile(r"([$€£¥])\s*(\d+(?:,\d{3})*(?:\.\d+)?)\s*([BMK])?")
_WS_RE = re.compile(r"\s+")

_CCY_SYMBOLS = "$€£¥"


def _pct_iter(text: str):
    """Yield exactly ``_PCT_RE.finditer(text)``'s matches, but only attempt
    the regex near '%' occurrences (hint-windowed prescan — the same
    exact-semantics trick as the companies suffix scan, VERDICT r3 #6).

    Every match ends at a '%', so iterating '%' positions left-to-right
    with a non-overlap cursor visits candidate matches in finditer order.
    For each '%' the viable start region is found by scanning left over
    the \\s* gap, then the [\\d.] run, then one optional sign — str
    methods are exact here: ``isspace()`` ≡ ``\\s`` and ``isdecimal()`` ≡
    ``\\d`` on every codepoint (verified exhaustively; pinned by the
    differential fuzz test). The first start in the region where the full
    regex matches is finditer's match (earlier starts fail for exactly
    the reasons finditer rejects them)."""
    pos = 0  # finditer's resume cursor: end of the previous match
    find = text.find
    i = find("%")
    while i != -1:
        if i >= pos:
            j = i
            while j > pos and text[j - 1].isspace():
                j -= 1
            k = j
            while k > pos and (text[k - 1].isdecimal() or text[k - 1] == "."):
                k -= 1
            if k > pos and text[k - 1] in "+-":
                k -= 1
            m = None
            for p in range(k, j):
                m = _PCT_RE.match(text, p)
                if m:
                    break
                m = None
            if m is not None:
                yield m
                pos = m.end()
        i = find("%", i + 1)


def _ccy_iter(text: str):
    """Yield exactly ``_CCY_RE.finditer(text)``'s matches via a symbol
    prescan: the pattern STARTS at a currency symbol, and nothing a match
    consumes ([\\s\\d,.BMK]) contains a symbol, so attempting the regex at
    each symbol position ≥ the non-overlap cursor is exact."""
    positions = []
    for sym in _CCY_SYMBOLS:
        start = text.find(sym)
        while start != -1:
            positions.append(start)
            start = text.find(sym, start + 1)
    positions.sort()
    pos = 0
    for i in positions:
        if i < pos:
            continue
        m = _CCY_RE.match(text, i)
        if m is not None:
            yield m
            pos = m.end()

_CCY_SCALE = {"B": 1e9, "M": 1e6, "K": 1e3}

MAX_NUMERICS_PER_PAGE = 50  # md_to_json_engine.py:257 — cap applied in document order


def context_window(text: str, start: int, end: int, window: int = 100) -> str:
    """±window chars, whitespace collapsed, capped at 200
    (md_to_json_engine.py:259-266)."""
    lo = max(0, start - window)
    hi = min(len(text), end + window)
    return _WS_RE.sub(" ", text[lo:hi].strip())[:200]


def extract_numerics(page_text: str, page_num: int) -> List[Dict]:
    """N1+N2 over one page. Percentages first, then currencies, then the
    combined list is capped at 50 (order-sensitive — md_to_json_engine.py:257).

    Each record additionally carries ``_start``/``_end`` match offsets within
    ``page_text`` (engine-local, for span emission; stripped before export).
    """
    out: List[Dict] = []

    for m in _pct_iter(page_text):
        raw = m.group(1)
        ctx = context_window(page_text, m.start(), m.end())
        out.append({
            "num_id": ids.num_id(page_num, raw, ctx),  # string value interpolated (ref :219)
            "value": float(raw) / 100,
            "unit": "percentage",
            "metric_type": "percentage",
            "context": ctx,
            "page": page_num,
            "_start": m.start(), "_end": m.end(),
        })

    for m in _ccy_iter(page_text):
        symbol, digits, mult = m.group(1), m.group(2).replace(",", ""), m.group(3)
        value = float(digits) * _CCY_SCALE.get(mult, 1.0)
        ctx = context_window(page_text, m.start(), m.end())
        out.append({
            "num_id": ids.num_id(page_num, value, ctx),  # float value interpolated (ref :247)
            "value": value,
            "unit": symbol,
            "metric_type": "currency",
            "context": ctx,
            "page": page_num,
            "_start": m.start(), "_end": m.end(),
        })

    return out[:MAX_NUMERICS_PER_PAGE]


# ---------------------------------------------------------------------------
# N3–N5: coercion helpers (batch_pdf_processor.py:1902-1987)
# ---------------------------------------------------------------------------

_NON_NUMERIC_RE = re.compile(r"[^0-9\.\-]")


def coerce_to_number(value, value_text: Optional[str]) -> Tuple[Optional[float], Optional[str], bool]:
    """N3 — batch_pdf_processor.py:1902-1940. Returns (number, raw_text, is_pct)."""
    if isinstance(value, (int, float)) and not isinstance(value, bool):
        return float(value), value_text if value_text is not None else str(value), False

    candidate = None
    if isinstance(value, str) and value.strip():
        candidate = value.strip()
    elif isinstance(value_text, str) and value_text.strip():
        candidate = value_text.strip()
    elif value is not None:
        candidate = str(value)
    if not candidate:
        return None, value_text, False

    text = candidate.strip()
    negative = text.startswith("(") and text.endswith(")")
    if negative:
        text = text[1:-1]

    is_pct = "%" in text or "％" in text
    cleaned = _NON_NUMERIC_RE.sub("", text)
    if cleaned.count("-") > 1:
        cleaned = "-" + cleaned.replace("-", "")
    if not cleaned or cleaned in {"-", "."}:
        return None, candidate, is_pct
    try:
        number = float(cleaned)
    except ValueError:
        return None, candidate, is_pct
    if negative and number > 0:
        number = -number
    if is_pct and abs(number) > 1.5:
        number /= 100.0
    return number, candidate, is_pct


def infer_unit(value_text: Optional[str], is_percentage: bool) -> str:
    """N4 — batch_pdf_processor.py:1942-1958."""
    if is_percentage:
        return "%"
    if not value_text:
        return "unitless"
    lower = value_text.lower()
    if "$" in value_text or "usd" in lower:
        return "USD"
    if "eur" in lower or "€" in value_text:
        return "EUR"
    if "gbp" in lower or "£" in value_text:
        return "GBP"
    if "cny" in lower or "rmb" in lower or "¥" in value_text or "元" in value_text:
        return "CNY"
    if "jpy" in lower:
        return "JPY"
    return "unitless"


_METRIC_ALLOWED = {"currency", "percentage", "basis_points", "multiple",
                   "count", "ratio", "per_share", "duration", "other"}


def infer_metric_type(metric_type: Optional[str], unit: Optional[str],
                      context: str, value_text: Optional[str],
                      is_percentage: bool) -> str:
    """N5 — batch_pdf_processor.py:1960-1987 (keyword cascade, order matters)."""
    if metric_type in _METRIC_ALLOWED:
        return metric_type
    text = f"{unit or ''} {context or ''} {value_text or ''}".lower()
    if (is_percentage or "%" in (unit or "") or "percent" in text
            or "margin" in text or "growth" in text or "同比" in text or "环比" in text):
        return "percentage"
    if any(t in text for t in ["$", "usd", "eur", "¥", "cny", "rmb", "million", "billion", "千", "亿"]):
        return "currency"
    if "basis point" in text or "bp" in text:
        return "basis_points"
    if "per share" in text or "/share" in text or "每股" in text:
        return "per_share"
    if "ratio" in text or "multiple" in text or "倍" in text:
        return "ratio"
    if any(w in text for w in ["unit", "units", "shipments", "customers", "stores",
                               "employees", "people", "台", "辆", "份"]):
        return "count"
    if any(w in text for w in ["year", "quarter", "month", "week", "day", "hour",
                               "个月", "季度"]):
        return "duration"
    return "other"
