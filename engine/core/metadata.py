"""Document-level metadata extraction (P13–P18).

Title/date/company/author extraction reproduces md_to_json_engine.py:138-203;
language detection batch_pdf_processor.py:1999-2004; ticker extraction
batch_pdf_processor.py:2022-2036.
"""

from __future__ import annotations

import re
from typing import List, Optional

_H1_RE = re.compile(r"^#\s+(.+)$", re.MULTILINE)
_BOLD_RE = re.compile(r"\*\*(.+?)\*\*")
_TAG_RE = re.compile(r"<[^>]+>")

_DATE_PATTERNS = [
    re.compile(r"\b(\d{4}-\d{2}-\d{2})\b", re.IGNORECASE),
    re.compile(r"\b(\d{1,2}\s+(?:Jan|Feb|Mar|Apr|May|Jun|Jul|Aug|Sep|Oct|Nov|Dec)[a-z]*\s+\d{4})\b", re.IGNORECASE),
    re.compile(r"\b(\d{1,2}/\d{1,2}/\d{4})\b", re.IGNORECASE),
]

_COMPANY_PATTERNS = [
    re.compile(r"\b([A-Z][A-Za-z\s&]+(?:Inc|Corp|Corporation|Ltd|Limited|Group|Company|Co)\.?)\b"),
    re.compile(r"\b([A-Z][A-Za-z]+\s+[A-Z][A-Za-z]+)\b"),
]

_AUTHOR_RE = re.compile(r"([A-Z][a-z]+\s+[A-Z][a-z]+)\s+[+\d\s()-]+\s+[\w.]+@[\w.]+")

_CJK_RE = re.compile("[一-鿿]")
_LATIN_RE = re.compile(r"[A-Za-z]")

_TICKER_PATTERNS = [
    re.compile(r"Ticker[s]?:\s*([A-Z0-9\-\s,;]+)"),
    re.compile(r"股票代码[:：]\s*([A-Z0-9\-\s,;]+)"),
]
_TICKER_SPLIT_RE = re.compile(r"[,;\s]+")


_DOC_DATE_SUFFIX_RE = re.compile(r"_(\d{4}-\d{2}-\d{2})$")


def parse_doc_name(doc_name: str, parent: str = "") -> dict:
    """S2 — batch_pdf_processor.py:748-777: a trailing ``_YYYY-MM-DD`` in the
    document name becomes date_str (and is stripped from the clean name);
    the relative parent directory is the publication ('unknown' if none)."""
    m = _DOC_DATE_SUFFIX_RE.search(doc_name)
    if m:
        date_str = m.group(1)
        clean = doc_name[:m.start()]
    else:
        date_str, clean = None, doc_name
    return {"name_clean": clean, "date_str": date_str,
            "publication": parent if parent not in ("", ".") else "unknown"}


def extract_title(markdown: str) -> str:
    """P13 — md_to_json_engine.py:138-156."""
    m = _H1_RE.search(markdown)
    if m:
        return m.group(1).strip()
    for line in markdown.split("\n")[:10]:
        line = line.strip()
        if line and not line.startswith("#"):
            clean = _TAG_RE.sub("", _BOLD_RE.sub(r"\1", line))
            if len(clean) > 10:
                return clean[:200]
    return "Untitled Document"


# one-scan prefilter: the union regex misses iff every individual pattern
# misses, and most payloads carry no date at all — this turns the common
# case from three full-document scans into one
_DATE_ANY = re.compile("|".join(p.pattern for p in _DATE_PATTERNS),
                       re.IGNORECASE)


def extract_date(markdown: str) -> Optional[str]:
    """P14 — md_to_json_engine.py:158-172. Pattern PRIORITY (not first
    position) decides, exactly like the reference's sequential loop."""
    if not _DATE_ANY.search(markdown):
        return None
    for rx in _DATE_PATTERNS:
        m = rx.search(markdown)
        if m:
            return m.group(1)
    return None


# Safety deviation from the reference (SURVEY §7.4 policy): the company and
# author patterns backtrack quadratically (measured 28 s at 100 KB of
# capitalized words — a task-stalling DoS at corpus scale; the reference has
# the same exposure). Doc-level metadata is scanned over the first
# METADATA_SCAN_LIMIT chars only; results are identical for every input
# under the limit.
METADATA_SCAN_LIMIT = 20_000


# Suffix-form prescan (P15 cost): every match of _COMPANY_PATTERNS[0] is
# made of [A-Za-z\s&] chars plus at most one trailing dot, so it lies inside
# one maximal [A-Za-z\s&] run, and every suffix alternative contains one of
# the literals {Inc, Co, Ltd, Limited, Group} (Corp/Corporation/Company all
# contain "Co"). The scan therefore iterates HINT occurrences (few, C-speed)
# and expands each to its enclosing run — the left boundary via one search
# over the reversed text — instead of letting [A-Za-z\s&]+ backtrack from
# every capital letter of every hint-less run to the run end for nothing.
# One char of context before the window slice and two after (the optional
# trailing dot plus the char deciding its \b) keep every word-boundary
# decision identical to the full-text scan; the surrounding set() makes
# window overlap harmless, and a window always covers its whole run, so no
# match is lost (differential fuzz + parity are the gates).
_COMPANY_HINT_RE = re.compile(r"Inc|Co|Ltd|Limited|Group")
_COMPANY_NONRUN_RE = re.compile(r"[^A-Za-z\s&]")


def extract_companies(markdown: str) -> List[str]:
    """P15 — md_to_json_engine.py:174-192 (sorted, cap 20). Byte-identical
    hint-windowed scan for the suffix pattern (see _COMPANY_HINT_RE above);
    differential-tested against the direct findall in tests and parity."""
    markdown = markdown[:METADATA_SCAN_LIMIT]
    companies = set()
    suffix_rx, pair_rx = _COMPANY_PATTERNS
    n = len(markdown)
    rev = None
    done_until = 0
    for h in _COMPANY_HINT_RE.finditer(markdown):
        if h.start() < done_until:
            continue  # same run as the previous window — already scanned
        if rev is None:
            rev = markdown[::-1]
        m = _COMPANY_NONRUN_RE.search(rev, n - h.start())
        start = n - m.start() if m else 0
        m = _COMPANY_NONRUN_RE.search(markdown, h.end())
        end = m.start() if m else n
        done_until = end
        seg = markdown[max(start - 1, 0):end + 2]
        for raw in suffix_rx.findall(seg):
            name = raw.strip()
            if 3 < len(name) < 50 and not name.isupper():
                companies.add(name)
    for raw in pair_rx.findall(markdown):
        name = raw.strip()
        if 3 < len(name) < 50 and not name.isupper():
            companies.add(name)
    return sorted(companies)[:20]


def extract_authors(markdown: str) -> List[str]:
    """P16 — md_to_json_engine.py:194-203.

    The reference dedups via ``list(set(...))[:10]`` whose order is Python
    set-iteration order — not stable across processes. We pin the obvious
    deterministic reading (first-seen order, cap 10); the count and the
    membership match the reference, the ordering is documented as a
    deliberate determinism fix.
    """
    seen: List[str] = []
    for name in _AUTHOR_RE.findall(markdown[:METADATA_SCAN_LIMIT]):
        if name not in seen:
            seen.append(name)
    return seen[:10]


_NON_CJK_RE = re.compile("[^一-鿿]+")
_NON_LATIN_RE = re.compile(r"[^A-Za-z]+")


def detect_language(text: str) -> str:
    """P17 — batch_pdf_processor.py:1999-2004. Char counts via one C-level
    sub per class (len(text) − len(text without the class) == findall count).
    Zero CJK chars (the overwhelming case) ⇒ cjk=0 ⇒ 'en' without either
    count — one cheap search instead of two allocation-heavy subs."""
    if not text:
        return "en"
    if not _CJK_RE.search(text):
        return "en"
    cjk = len(_NON_CJK_RE.sub("", text))
    latin = len(_NON_LATIN_RE.sub("", text))
    return "zh" if cjk > latin else "en"


def extract_tickers(markdown: str) -> List[str]:
    """P18 — batch_pdf_processor.py:2022-2036 (sorted unique, 1–6 chars)."""
    found = set()
    for rx in _TICKER_PATTERNS:
        for m in rx.finditer(markdown):
            for part in _TICKER_SPLIT_RE.split(m.group(1)):
                t = part.strip().upper()
                if t and 1 <= len(t) <= 6:
                    found.add(t)
    return sorted(found)
