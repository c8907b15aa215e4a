"""Per-turn extraction kernel — the dispatcher the Arrow UDFs call.

One function, ``extract_turn(text, tool, doc_name)``, takes a turn payload and
returns a flat record mirroring FIXTURES.md §3.1. It reproduces the
reference's Stage-B order (batch_pdf_processor.py:833-925):

    1. figure filter on the RAW markdown        (:846, figure_filter.py)
    2. boilerplate clean                        (:839, md_cleaner.py)
    3. rule-engine extraction on the CLEANED md (:855-860, md_to_json_engine.py)

with payload-kind dispatch in front (grounded OCR output is first converted
to page-split markdown exactly as Stage A does, batch_pdf_processor.py:354-391;
HTML goes through the block-scoring cleaner; plain text is EOS-stripped and
treated as a single cover page).

The kernel NEVER raises: failures produce a record with ``error`` set and
empty collections (error isolation per batch_pdf_processor.py:2754-2759 —
one bad payload must not kill a 10^12-row job).
"""

from __future__ import annotations

import re
from typing import Dict, List, Optional, Tuple

from . import cleaner, figures, grounding, html_clean, metadata, numerics, pages, passages, tables
from .entities import entities_from_companies
from .spans import Span, spans_to_dicts
from . import ids

KIND_MD = "md_clean"
KIND_GROUNDED = "md_grounded"
KIND_HTML = "html_fragment"
KIND_PLAIN = "plain"
KIND_PDF = "pdf_bytes"

_TOOL_TO_KIND = {
    "ocr.markdown": KIND_MD,
    "ocr.grounded": KIND_GROUNDED,
    "web.html": KIND_HTML,
    "chat.plain": KIND_PLAIN,
    "doc.pdf": KIND_PDF,
}

_HTML_SNIFF_RE = re.compile(r"<(?:html|body|div|p|article|nav|table|a)\b", re.IGNORECASE)


def infer_kind(text: str, tool: Optional[str]) -> str:
    if tool in _TOOL_TO_KIND:
        return _TOOL_TO_KIND[tool]
    if text:
        if "<|ref|>" in text:
            return KIND_GROUNDED
        if _HTML_SNIFF_RE.search(text):
            return KIND_HTML
        if "--- Page " in text:
            return KIND_MD
    return KIND_PLAIN


_RETRY_BUDGET = 64  # unanchored rescans per turn (see _locate)


def _locate(original: str, snippet: str, from_: int = 0,
            retry_budget: Optional[List[int]] = None) -> Tuple[int, int]:
    """Best-effort span of `snippet` inside `original`; (-1,-1) if absent.

    A failed anchored find retries from 0 (repeated identical content whose
    cursor already passed the next copy), but each retry is a full O(n) scan
    — a pathological turn with thousands of repeated passages would go
    quadratic. ``retry_budget`` is a per-turn cap on those rescans (the same
    DoS posture as the 20k-char metadata scan caps); spans past the budget
    degrade to (-1,-1), never the wrong offset."""
    if not snippet:
        return -1, -1
    pos = original.find(snippet, from_)
    if pos < 0 and from_ > 0:  # from_ == 0 already WAS the unanchored scan
        if retry_budget is None:
            pos = original.find(snippet)
        elif retry_budget[0] > 0:
            retry_budget[0] -= 1
            pos = original.find(snippet)
    return (pos, pos + len(snippet)) if pos >= 0 else (-1, -1)


def empty_record(doc_name: str, payload_kind: str = KIND_PLAIN,
                 error: Optional[str] = None) -> Dict:
    return {
        "payload_kind": payload_kind,
        "cleaned_text": "",
        "title": None,
        "date": None,
        "language": "en",
        "word_count": 0,
        "page_count": 0,
        "doc_id": ids.doc_id(doc_name),
        "tickers": [],
        "authors": [],
        "passages": [],
        "tables": [],
        "numerics": [],
        "entities": [],
        "figures": [],
        "figures_kept": [],
        "figures_dropped": [],
        "clean_stats": {"original_length": 0, "final_length": 0,
                        "removed_sections": 0, "removed_paragraphs": 0,
                        "reduction_ratio": 0.0},
        "summary": {"passages_count": 0, "tables_count": 0,
                    "numerics_count": 0, "entities_count": 0,
                    "figures_count": 0},
        "spans": [],
        "error": error,
    }


def extract_turn(text: Optional[str], tool: Optional[str], doc_name: str) -> Dict:
    try:
        return _extract_turn(text or "", tool, doc_name)
    except Exception as exc:  # noqa: BLE001 — error isolation contract
        kind = KIND_PLAIN
        try:
            kind = infer_kind(text or "", tool)
        except Exception:
            pass
        return empty_record(doc_name, kind, f"{type(exc).__name__}: {exc}")


def _extract_turn(text: str, tool: Optional[str], doc_name: str) -> Dict:
    kind = infer_kind(text, tool)
    record = empty_record(doc_name, kind)
    spans: List[Span] = []
    html_tables: List[Dict] = []

    # ---- stage 1: payload → page-split markdown -------------------------
    if kind == KIND_GROUNDED:
        markdown, _blocks, ref_spans = grounding.grounded_to_markdown(text)
        spans.extend(ref_spans)
    elif kind == KIND_PDF:
        from . import pdftext
        markdown, pdf_err = pdftext.pdf_payload_to_markdown(text)
        if pdf_err:
            rec = empty_record(doc_name, kind, None)
            rec["error"] = pdf_err
            return rec
    elif kind == KIND_HTML:
        cleaned_html, html_stats, html_spans, html_tables = html_clean.clean_html(text)
        spans.extend(html_spans)
        markdown = cleaned_html
    elif kind == KIND_MD:
        markdown = text
    else:  # plain
        markdown = grounding.strip_eos(text)

    # ---- stage 2: figure filter on the raw markdown (ref :846) ----------
    direct = markdown == text  # offsets into markdown are offsets into payload
    fig_kept, fig_dropped, fig_spans = figures.filter_figures(markdown)
    if direct:
        spans.extend(fig_spans)
    else:
        for s in fig_spans:
            a, b = _locate(text, markdown[s.start:s.end]) if s.start >= 0 else (-1, -1)
            spans.append(Span(s.kind, a, b, s.label))

    # ---- stage 3: boilerplate clean (ref :839) ---------------------------
    if kind == KIND_HTML:
        cleaned, clean_stats_src = markdown, {
            "original_length": len(text), "final_length": len(markdown),
            "removed_sections": 0, "removed_paragraphs": 0,
            "reduction_ratio": (1 - len(markdown) / len(text)) if text else 0.0,
        }
    else:
        cleaned, cstats, clean_spans = cleaner.clean_markdown(markdown)
        clean_stats_src = cstats
        if direct:
            spans.extend(clean_spans)
        else:
            for s in clean_spans:
                if s.kind == "page":
                    continue
                a, b = _locate(text, markdown[s.start:s.end]) if s.start >= 0 else (-1, -1)
                spans.append(Span(s.kind, a, b, s.label))

    # ---- stage 4: rule-engine extraction on the cleaned markdown --------
    # (md_to_json_engine.py:298-392 — title/date/companies/authors doc-wide,
    # passages/tables/numerics per page)
    title = metadata.extract_title(cleaned)
    date = metadata.extract_date(cleaned)
    companies = metadata.extract_companies(cleaned)
    authors = metadata.extract_authors(cleaned)
    lang = metadata.detect_language(cleaned)
    tickers = metadata.extract_tickers(cleaned)

    page_list = pages.split_pages(cleaned)
    all_passages: List[Dict] = []
    all_tables: List[Dict] = list(html_tables)
    all_numerics: List[Dict] = []
    # per-collection cursors: repeated identical content (the same paragraph
    # on two pages) must map to successive occurrences, not all to the first
    cur_p = cur_t = cur_n = 0
    retry_budget = [_RETRY_BUDGET]
    for pg in page_list:
        for p in passages.extract_passages(pg.content, pg.page):
            a, b = _locate(text, p["text"], cur_p, retry_budget)
            if a >= 0:
                cur_p = max(cur_p, b)
            spans.append(Span("passage", a, b, p["passage_id"]))
            all_passages.append(p)
        for t in tables.extract_tables(pg.content, pg.page):
            raw = cleaned[pg.start + t.pop("_start"):pg.start + t.pop("_end")]
            a, b = _locate(text, raw.strip(), cur_t, retry_budget)
            if a >= 0:
                cur_t = max(cur_t, b)
            spans.append(Span("table", a, b, t["table_id"]))
            all_tables.append(t)
        for n in numerics.extract_numerics(pg.content, pg.page):
            raw = pg.content[n.pop("_start"):n.pop("_end")]
            a, b = _locate(text, raw, cur_n, retry_budget)
            if a >= 0:
                cur_n = max(cur_n, b)
            spans.append(Span("numeric", a, b, n["num_id"]))
            all_numerics.append(n)

    for t in html_tables:
        t.pop("_start", None)
        t.pop("_end", None)

    entity_list = entities_from_companies(companies)

    record.update({
        "cleaned_text": cleaned,
        "title": title,
        "date": date,
        "language": lang,
        "word_count": pages.word_count(cleaned),
        "page_count": pages.count_page_markers(cleaned),
        "tickers": tickers,
        "authors": authors,
        "passages": all_passages,
        "tables": all_tables,
        "numerics": all_numerics,
        "entities": entity_list,
        "figures": fig_kept,
        "figures_kept": [f["filename"] for f in fig_kept],
        "figures_dropped": fig_dropped,
        "clean_stats": {
            "original_length": clean_stats_src["original_length"],
            "final_length": clean_stats_src["final_length"],
            "removed_sections": clean_stats_src["removed_sections"],
            "removed_paragraphs": clean_stats_src["removed_paragraphs"],
            "reduction_ratio": float(clean_stats_src["reduction_ratio"]),
        },
        "summary": {
            "passages_count": len(all_passages),
            "tables_count": len(all_tables),
            "numerics_count": len(all_numerics),
            "entities_count": len(entity_list),
            "figures_count": len(fig_kept),
        },
        "spans": spans_to_dicts(spans),
        "error": None,
    })
    return record
