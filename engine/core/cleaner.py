"""Boilerplate removal for page-split markdown (P2–P5).

Reproduces the observable behavior of the reference's markdown cleaner
(reference: md_cleaner.py:39-193 for the rule set, :265-304 section scan,
:306-328 paragraph scan, :330-340 page merge, :207-231 statistics), extended
with character-offset span records into the original payload — a requirement
the reference does not have.

The rule *patterns* are part of the contract (they define which content is
boilerplate) and are therefore identical; the engine around them is a fresh
offset-tracking implementation.
"""

from __future__ import annotations

import re
from typing import Dict, List, Tuple

from .pages import split_pages, merge_pages
from .spans import Span

# ---------------------------------------------------------------------------
# Rule table. (name, pattern, section_level)
# section_level=True  → a markdown header matching this starts a block that is
#                       dropped until the next non-matching header
#                       (md_cleaner.py:265-304)
# section_level=False → any '\n\n'-paragraph matching this is dropped
#                       (md_cleaner.py:306-328)
# ---------------------------------------------------------------------------
_RULE_SPECS: List[Tuple[str, str, bool]] = [
    # compliance / disclosure sections (md_cleaner.py:43-102)
    ("analyst_certification", r"^#{1,3}\s*Analyst['\s]*(?:s)?\s*Certification[s]?", True),
    ("important_disclosures", r"^#{1,3}\s*Important\s+Disclosure[s]?", True),
    ("risk_disclosure", r"^#{1,3}\s*Risk\s+Disclosure[s]?", True),
    ("availability_disclosures", r"^#{1,3}\s*Availability\s+of\s+Disclosure[s]?", True),
    ("information_sources", r"^#{1,3}\s*(?:Disclosure[s]?\s+regarding\s+)?Information\s+Source[s]?", True),
    ("rating_system", r"^#{1,3}\s*(?:Guide\s+to\s+the\s+)?.*Rating\s+System", True),
    ("price_target", r"^#{1,3}\s*(?:Guide\s+to\s+the\s+)?.*Price\s+Target", True),
    ("distribution_ratings", r"^#{1,3}\s*Distribution\s+of\s+Rating[s]?", True),
    ("disclosure_legend", r"^#{1,3}\s*Disclosure\s+Legend", True),
    ("legal_entities", r"^#{1,3}\s*Legal\s+(?:entities|Entities)\s+(?:involved|Involved)\s+in\s+(?:producing|Producing)", True),
    # regional legal pages (md_cleaner.py:105-146)
    ("regional_legal_uk", r"^#{1,3}\s*(?:United\s+Kingdom|UK)\s*(?:/\s*EEA)?", True),
    ("regional_legal_americas", r"^#{1,3}\s*Americas?", True),
    ("regional_legal_japan", r"^#{1,3}\s*Japan", True),
    ("regional_legal_hongkong", r"^#{1,3}\s*Hong\s+Kong", True),
    ("regional_legal_middleeast", r"^#{1,3}\s*Middle\s+East", True),
    ("regional_legal_australia", r"^#{1,3}\s*Australia", True),
    ("regional_legal_singapore", r"^#{1,3}\s*Singapore", True),
    # trademark / copyright paragraphs (md_cleaner.py:149-166)
    ("trademark_bloomberg", r"Bloomberg®\s+is\s+a\s+trademark", False),
    ("copyright_barclays", r"(?:Barclays\s+Bank\s+PLC|Barclays\s+Capital\s+Inc\.|©\s+Copyright\s+Barclays)", False),
    ("copyright_generic", r"©\s+Copyright\s+\d{4}", False),
    # analyst contact paragraphs (md_cleaner.py:169-174)
    ("analyst_contact", r"(?:Tel|Phone|Email):\s*[+\d\s()-]+|[\w.]+@[\w.]+", False),
    # schedules & disclaimers (md_cleaner.py:177-190)
    ("conference_schedule", r"^#{1,3}\s*(?:Conference\s+)?(?:Schedule|Calendar|Agenda)", True),
    ("disclaimer", r"^#{1,3}\s*Disclaimer[s]?", True),
]

_SECTION_RULES = [
    (name, re.compile(pat, re.IGNORECASE | re.MULTILINE))
    for name, pat, is_sec in _RULE_SPECS if is_sec
]
_PARAGRAPH_RULES = [
    (name, re.compile(pat, re.IGNORECASE))
    for name, pat, is_sec in _RULE_SPECS if not is_sec
]

# Combined OR prefilters: one search decides "no rule matches" (the common
# case) before the per-rule loop identifies WHICH rule matched. A line/para
# matches the union regex iff it matches some individual rule, so semantics
# (including first-rule-wins naming) are unchanged.
_SECTION_ANY = re.compile(
    "|".join(f"(?:{pat})" for _, pat, is_sec in _RULE_SPECS if is_sec),
    re.IGNORECASE | re.MULTILINE)
_PARAGRAPH_ANY = re.compile(
    "|".join(f"(?:{pat})" for _, pat, is_sec in _RULE_SPECS if not is_sec),
    re.IGNORECASE)


def _paragraph_may_match(para: str) -> bool:
    """Literal prescan ahead of _PARAGRAPH_ANY: every paragraph rule needs at
    least one of these substrings (trademark→'bloomberg', barclays-copyright→
    'barclays'/'©', generic-copyright→'©', contact→'@' or '<kw>:'), so a
    paragraph containing none of them cannot match any rule. `in` is a
    memchr-speed scan vs ~44 µs for the union regex on a typical paragraph —
    and almost every paragraph is a miss."""
    if "@" in para or "©" in para:
        return True
    low = para.lower()
    return ("bloomberg" in low or "barclays" in low or "tel:" in low
            or "phone:" in low or "email:" in low)


def clean_markdown(markdown: str) -> Tuple[str, Dict, List[Span]]:
    """Clean a page-split markdown payload.

    Returns ``(cleaned_text, stats, spans)`` where ``cleaned_text`` and the
    stats counters equal the reference's ``MarkdownCleaner.clean`` output
    (md_cleaner.py:195-234) byte-for-byte, and ``spans`` locate each removed
    section header / removed paragraph / retained page in the *original*
    payload (best effort; a span the original text no longer pins down
    exactly is reported with start=end=-1).
    """
    original_length = len(markdown)
    removed_sections: List[str] = []
    removed_paragraphs = 0
    spans: List[Span] = []

    cleaned_pages: List[Tuple[int, str]] = []
    for pg in split_pages(markdown):
        spans.append(Span("page", pg.start, pg.end, str(pg.page)))

        after_sections = _drop_boilerplate_sections(
            pg.content, pg.start, removed_sections, spans)
        kept = _drop_boilerplate_paragraphs(
            after_sections, markdown, pg.start, spans)
        removed_paragraphs += kept[1]
        cleaned = kept[0]
        if cleaned.strip():
            cleaned_pages.append((pg.page, cleaned))

    result = merge_pages(cleaned_pages)
    final_length = len(result)
    stats = {
        "original_length": original_length,
        "removed_sections": len(removed_sections),
        "removed_section_names": removed_sections,
        "removed_paragraphs": removed_paragraphs,
        "final_length": final_length,
        "reduction_ratio": (1 - final_length / original_length) if original_length > 0 else 0,
    }
    return result, stats, spans


def _drop_boilerplate_sections(content: str, base: int,
                               removed: List[str], spans: List[Span]) -> str:
    """Line-scan state machine per md_cleaner.py:265-304.

    A header line matching a section rule flips the scanner into skip mode
    until the next header that matches no rule. Rules are tried against the
    *raw* line (so the ``^#`` anchors fail on indented headers, exactly as the
    reference's ``re.search(pattern, line)`` does), while header detection
    uses the stripped line.
    """
    kept_lines: List[str] = []
    skipping = False
    offset = 0
    for line in content.split("\n"):
        line_start = base + offset
        offset += len(line) + 1
        if line.strip().startswith("#"):
            hit = None
            if _SECTION_ANY.search(line):
                hit = next((n for n, rx in _SECTION_RULES if rx.search(line)), None)
            if hit is not None:
                skipping = True
                removed.append(hit)
                spans.append(Span("removed_section", line_start,
                                  line_start + len(line), hit))
                continue
            skipping = False
        if not skipping:
            kept_lines.append(line)
    return "\n".join(kept_lines)


def _drop_boilerplate_paragraphs(content: str, original: str, page_start: int,
                                 spans: List[Span]) -> Tuple[str, int]:
    """Paragraph filter per md_cleaner.py:306-328.

    Paragraphs are ``\\n\\n`` splits, stripped; blanks vanish; a paragraph
    matching any paragraph-level rule is dropped. Kept paragraphs re-join
    with ``\\n\\n``.
    """
    kept: List[str] = []
    n_removed = 0
    search_from = page_start
    for raw_para in content.split("\n\n"):
        para = raw_para.strip()
        if not para:
            continue
        hit = None
        if _paragraph_may_match(para) and _PARAGRAPH_ANY.search(para):
            hit = next((n for n, rx in _PARAGRAPH_RULES if rx.search(para)), None)
        if hit is not None:
            n_removed += 1
            loc = original.find(para, search_from)
            if loc >= 0:
                spans.append(Span("removed_paragraph", loc, loc + len(para), hit))
                search_from = loc + len(para)
            else:
                spans.append(Span("removed_paragraph", -1, -1, hit))
        else:
            kept.append(para)
    return "\n\n".join(kept), n_removed
