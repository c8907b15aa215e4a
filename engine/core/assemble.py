"""Document assembly, figure merge, and schema validation (A6–A12, V1–V4).

``build_document`` mirrors the rule engine's JSON assembly
(md_to_json_engine.py:346-392) with injectable timestamps (the reference
stamps ``datetime.now()`` at :357-358 — volatile fields are parameters here
so identical inputs give identical bytes).

``merge_figures`` mirrors json_merger.py:23-97 (figure injection, summary
recount, same-page passage linking capped at 3, pipeline-step append,
synthesis-model stamp).

``validate_document`` / ``repair_document`` mirror the strict checks and
auto-fix defaults of batch_pdf_processor.py:613-706 and the minimal-structure
fallback :1751-1804.
"""

from __future__ import annotations

from copy import deepcopy
from typing import Dict, List, Optional, Tuple

from . import ids

SCHEMA_VERSION = "1.3.1"
_TOP_LEVEL = ("schema_version", "doc", "passages", "entities", "data")

FIXED_TS = "2025-09-01T00:00:00"  # injectable default — determinism over wall clock


def build_document(record: Dict, doc_name: str,
                   date_str: Optional[str] = None,
                   publication: Optional[str] = None,
                   ingested_at: str = FIXED_TS,
                   extracted_at: str = FIXED_TS) -> Dict:
    """Assemble a per-turn extraction record into the schema-1.3.1 shape."""
    passages = [
        {"passage_id": p["passage_id"], "text": p["text"], "page": p["page"],
         "section": p.get("section")}
        for p in record.get("passages", [])
    ]
    tables = [
        {"table_id": t["table_id"], "title": t["title"], "page": t["page"],
         "columns": t["columns"], "rows": t["rows"],
         "provenance": {"page": t["page"]}}
        for t in record.get("tables", [])
    ]
    numerics = [
        {"num_id": n["num_id"], "value": n["value"], "unit": n["unit"],
         "metric_type": n["metric_type"], "context": n["context"],
         "provenance": {"page": n["page"]}}
        for n in record.get("numerics", [])
    ]
    return {
        "schema_version": SCHEMA_VERSION,
        "doc": {
            "doc_id": ids.doc_id(doc_name),
            "title": record.get("title") or "Untitled Document",
            "source_uri": f"{publication}/{doc_name}" if publication else doc_name,
            "language": record.get("language", "en"),
            "timestamps": {"ingested_at": ingested_at, "extracted_at": extracted_at},
            "extraction_run": {
                "vision_model": "none",
                "synthesis_model": "rule-based-engine",
                "pipeline_steps": ["payload_dispatch", "rule_extraction"],
                "processing_metadata": {
                    "pages_processed": record.get("page_count", 0),
                    "successful_pages": record.get("page_count", 0),
                    "date": date_str or record.get("date"),
                    "publication": publication,
                    "authors": record.get("authors", []),
                },
            },
        },
        "passages": passages,
        "entities": record.get("entities", []),
        "data": {
            "figures": [],
            "tables": tables,
            "numerical_data": numerics,
            "claims": [],
            "relations": [],
            "extraction_summary": {
                "figures_count": 0,
                "tables_count": len(tables),
                "numerical_data_count": len(numerics),
                "passages_count": len(passages),
                "entities_count": len(record.get("entities", [])),
            },
        },
    }


def merge_model_results(model_result: Optional[Dict],
                        aggregated_result: Optional[Dict]) -> Dict:
    """A10 — batch_pdf_processor.py:805-831: the aggregated result wins;
    model values fill only empty slots (None/[]/{}), one level deep for
    nested dicts; None/"" model values never overwrite."""
    if not aggregated_result and not model_result:
        return {}
    if not aggregated_result:
        return deepcopy(model_result or {})
    if not model_result:
        return deepcopy(aggregated_result)
    merged = deepcopy(aggregated_result)
    for key, value in model_result.items():
        if value in (None, ""):
            continue
        existing = merged.get(key)
        if existing in (None, [], {}):
            merged[key] = deepcopy(value)
            continue
        if isinstance(existing, dict) and isinstance(value, dict):
            for sub_key, sub_value in value.items():
                if sub_value in (None, ""):
                    continue
                if sub_key not in existing or existing[sub_key] in (None, [], {}):
                    existing[sub_key] = deepcopy(sub_value)
    return merged


def validate_claim_evidence(claims: List[Dict], figures: List[Dict],
                            tables: List[Dict], numerics: List[Dict]) -> List[Dict]:
    """A9 — batch_pdf_processor.py:1632-1642: keep only evidence ids that
    exist in the document's figure/table/numeric collections."""
    figure_ids = {f.get("figure_id") for f in figures if f.get("figure_id")}
    table_ids = {t.get("table_id") for t in tables if t.get("table_id")}
    num_ids = {n.get("num_id") for n in numerics if n.get("num_id")}
    out = []
    for claim in claims:
        c = dict(claim)
        ev = c.get("evidence")
        if isinstance(ev, dict):
            c["evidence"] = {
                "figure_ids": [i for i in ev.get("figure_ids", []) if i in figure_ids],
                "table_ids": [i for i in ev.get("table_ids", []) if i in table_ids],
                "num_ids": [i for i in ev.get("num_ids", []) if i in num_ids],
            }
        out.append(c)
    return out


def merge_figures(base: Dict, figures_data: List[Dict]) -> Dict:
    """A11 + A7 — json_merger.py:23-97."""
    result = deepcopy(base)
    data = result.setdefault("data", {})
    data["figures"] = figures_data

    summary = data.setdefault("extraction_summary", {})
    summary["figures_count"] = len(figures_data)
    summary["figures_with_data"] = sum(
        1 for f in figures_data if f.get("series"))

    # A7: same-page passage linking, cap 3 (json_merger.py:75-97).
    # NOTE (bug-compatible with the reference): figure pages are 1-based
    # (batch_pdf_processor.py:2449-2456, 0-based path +1) while rule-engine
    # passage pages use the 0-based-cover split convention, so a figure
    # physically on split-page p links to passages labeled p+1 — the
    # reference's json_merger has the identical shift and we preserve it.
    # Indexed by page up front: the reference rescans the full passage list
    # per figure (O(figures × passages) — 100k-turn conversation documents
    # turn that into minutes of CPU); one ordered pass builds the same
    # first-3-in-document-order answer the rescan produces.
    by_page: Dict = {}
    for p in result.get("passages", []):
        lst = by_page.setdefault(p.get("page"), [])
        if len(lst) < 3:
            lst.append(p["passage_id"])
    for fig in figures_data:
        related = by_page.get(fig.get("page", 0))
        if related:
            fig.setdefault("metadata", {})["related_passages"] = list(related)

    run = result.get("doc", {}).get("extraction_run")
    if isinstance(run, dict):
        steps = run.get("pipeline_steps", [])
        if "figure_vision" not in steps:
            steps.append("figure_vision")
        run["pipeline_steps"] = steps
        run["synthesis_model"] = "hybrid:rule-engine+figure-stub"
    return result


def fold_conversation_records(records: List[Dict]) -> Dict:
    """Pass-1 fold: turn records (in turn_idx order) → partial assembly
    state. Pure and JSON-serializable, so the salted two-pass Spark path
    can ship shard partials between stages; the single-pass path is
    ``finalize_conversation_document(conv_id, fold_conversation_records(r))``
    — ONE implementation of the accumulation loop, never forked.

    The partial carries: first-title candidate, zh flag, partial ticker
    union (sorted-set union is associative/commutative), passages with
    rebased pages, within-shard first-occurrence-deduped tables/numerics
    (the A4/A5 keys are derivable from the stored records, so the merge
    can continue the dedup across shards), RAW entity records (EntityIndex
    folding is order-dependent first-wins with alias merging — partial
    indexes would not compose exactly, so the index is built once at
    finalize over the concatenated stream), and figure descriptors (the
    batch-of-15 boundaries are global, so batching also waits for
    finalize)."""
    from .entities import ticker_union

    passages: List[Dict] = []
    tables: List[Dict] = []
    numerics: List[Dict] = []
    figure_descriptors: List[Dict] = []
    entities: List[Dict] = []
    tickers: List[List[str]] = []
    num_seen = set()
    table_seen = set()
    title = None
    language_zh = False

    for rec in records:
        t = rec.get("turn_idx", 0)
        if title is None and rec.get("payload_kind") != "plain" and rec.get("title"):
            title = rec["title"]
        if rec.get("language") == "zh":
            language_zh = True
        tickers.append(rec.get("tickers", []))
        for e in rec.get("entities", []):
            entities.append(e)

        def rebase(page: int) -> int:
            return t * 1000 + (page or 0)

        for p in rec.get("passages", []):
            passages.append({**p, "page": rebase(p["page"])})
        for tb in rec.get("tables", []):
            if tb["table_id"] in table_seen:   # A5 table dedup (:1514-1516)
                continue
            table_seen.add(tb["table_id"])
            tables.append({**tb, "page": rebase(tb["page"]),
                           "provenance": {"page": rebase(tb["page"])}})
        for n in rec.get("numerics", []):
            key = (n["context"], n["value"], n["unit"], rebase(n["page"]))
            if key in num_seen:                # A4 numeric dedup (:1545-1548)
                continue
            num_seen.add(key)
            numerics.append({**n, "page": rebase(n["page"]),
                             "provenance": {"page": rebase(n["page"])}})
        for f in rec.get("figures", []):
            figure_descriptors.append({
                "path": f.get("path"), "page": rebase(f.get("page", 0)),
                "title": f.get("label") or None, "label": f.get("label")})

    return {
        "n_turns": len(records),
        "title": title,
        "language_zh": language_zh,
        "tickers": ticker_union(*tickers),
        "entities": entities,
        "passages": passages,
        "tables": tables,
        "numerics": numerics,
        "figures": figure_descriptors,
    }


def merge_conversation_partials(partials: List[Dict]) -> Dict:
    """Pass-2 merge of shard partials **in shard order** (shards are
    contiguous turn_idx ranges, so shard order == turn order). Replays
    exactly the cross-shard residue of the fold: first-title-wins, zh any,
    ticker re-union, concatenation of order-carrying lists, and
    continuation of the A4/A5 first-occurrence dedup across shard
    boundaries using keys derived from the stored (already-rebased)
    records. ``merge([fold(chunk) for chunk in chunks]) == fold(records)``
    for any contiguous chunking — pinned by tests/test_documents.py."""
    from .entities import ticker_union

    out: Dict = {"n_turns": 0, "title": None, "language_zh": False,
                 "tickers": [], "entities": [], "passages": [],
                 "tables": [], "numerics": [], "figures": []}
    table_seen = set()
    num_seen = set()
    ticker_parts: List[List[str]] = []
    for p in partials:
        out["n_turns"] += p["n_turns"]
        if out["title"] is None and p["title"]:
            out["title"] = p["title"]
        out["language_zh"] = out["language_zh"] or p["language_zh"]
        ticker_parts.append(p["tickers"])
        out["entities"].extend(p["entities"])
        out["passages"].extend(p["passages"])
        out["figures"].extend(p["figures"])
        for tb in p["tables"]:
            if tb["table_id"] in table_seen:
                continue
            table_seen.add(tb["table_id"])
            out["tables"].append(tb)
        for n in p["numerics"]:
            key = (n["context"], n["value"], n["unit"], n["page"])
            if key in num_seen:
                continue
            num_seen.add(key)
            out["numerics"].append(n)
    out["tickers"] = ticker_union(*ticker_parts)
    return out


def finalize_conversation_document(conv_id: str, state: Dict,
                                   publication: Optional[str] = None,
                                   with_figures: bool = True) -> Dict:
    """Fold state → final schema-1.3.1 document: EntityIndex built over the
    full entity stream (A1 order-dependent), figure-stub batching over the
    full descriptor list (G4/G5 global batch-of-15 boundaries), figure
    merge against the full passage set (A11/A7), validation/repair."""
    from .entities import EntityIndex, ticker_union
    from .figure_stub import deterministic_fake, extract_figures_batched

    idx = EntityIndex(salt=publication or "")
    for e in state["entities"]:
        idx.add(e)
    passages = state["passages"]
    tables = state["tables"]
    numerics = state["numerics"]
    figure_descriptors = state["figures"]
    title = state["title"]
    language = "zh" if state["language_zh"] else "en"
    n_turns = state["n_turns"]

    all_tickers = ticker_union(state["tickers"])
    base = {
        "schema_version": SCHEMA_VERSION,
        "doc": {
            "doc_id": ids.doc_id(conv_id),
            "title": title or "Untitled Document",
            "source_uri": f"{publication}/{conv_id}" if publication else conv_id,
            "language": language,
            "timestamps": {"ingested_at": FIXED_TS, "extracted_at": FIXED_TS},
            "extraction_run": {
                "vision_model": "none",
                "synthesis_model": "rule-based-engine",
                "pipeline_steps": ["payload_dispatch", "rule_extraction",
                                   "conversation_assembly"],
                "processing_metadata": {
                    "turns_processed": n_turns,
                    "publication": publication,
                },
            },
        },
        "passages": [{"passage_id": p["passage_id"], "text": p["text"],
                      "page": p["page"], "section": p.get("section")}
                     for p in passages],
        "entities": idx.entities,
        "data": {
            "figures": [],
            "tables": [{"table_id": tb["table_id"], "title": tb["title"],
                        "page": tb["page"], "columns": tb["columns"],
                        "rows": tb["rows"], "provenance": tb["provenance"]}
                       for tb in tables],
            "numerical_data": [{"num_id": n["num_id"], "value": n["value"],
                                "unit": n["unit"],
                                "metric_type": n["metric_type"],
                                "context": n["context"],
                                "provenance": n["provenance"]}
                               for n in numerics],
            "claims": [],
            "relations": [],
            "extraction_summary": {
                "figures_count": 0,
                "tables_count": len(tables),
                "numerical_data_count": len(numerics),
                "passages_count": len(passages),
                "entities_count": len(idx.entities),
            },
        },
    }
    if all_tickers:
        base["doc"]["tickers"] = all_tickers
        base["doc"]["symbols"] = all_tickers

    if with_figures and figure_descriptors:
        figures = extract_figures_batched(figure_descriptors,
                                          extract_fn=deterministic_fake)
        base = merge_figures(base, figures)
        base["data"]["extraction_summary"]["passages_count"] = len(passages)
    ok, err = validate_document(base)
    if not ok:
        base = repair_document(base, conv_id)
    return base


def build_conversation_document(conv_id: str, records: List[Dict],
                                publication: Optional[str] = None,
                                with_figures: bool = True) -> Dict:
    """Assemble one conversation's ordered turn records into a single
    schema-1.3.1 document — the conversation-scope analogue of the
    reference's page-payload aggregation (_aggregate_page_results,
    batch_pdf_processor.py:1357-1705): entity dedup with alias index (A1),
    doc-metadata fold with ticker union (A12/A13), passage/table/numeric
    accumulation with the reference's dedup keys (A4/A5), figure-stub
    extraction in batches of 15 (G4/G5 shape) and merge (A11/A7).

    ``records`` must be in turn_idx order (stable-ordering invariant); page
    provenance is re-based per turn as ``turn_idx * 1000 + page`` so page
    numbers stay unique document-wide and invertible.

    Composition of the fold/finalize split above — the salted two-pass
    Spark path (engine/spark/documents.py) runs the same fold per shard,
    merges partials, and calls the same finalize, so both paths share one
    accumulation implementation.
    """
    return finalize_conversation_document(
        conv_id, fold_conversation_records(records),
        publication=publication, with_figures=with_figures)


def validate_document(doc: Dict) -> Tuple[bool, Optional[str]]:
    """V1/V4 strict checks — batch_pdf_processor.py:613-647, json_merger.py:99-141."""
    if not isinstance(doc, dict):
        return False, "document is not an object"
    missing = [k for k in _TOP_LEVEL if k not in doc]
    if missing:
        return False, f"missing top-level fields: {missing}"
    if doc.get("schema_version") != SCHEMA_VERSION:
        return False, f"schema_version != {SCHEMA_VERSION}"
    d = doc.get("doc")
    if not isinstance(d, dict) or not d.get("doc_id") or "title" not in d:
        return False, "doc missing doc_id/title"
    if not isinstance(doc.get("passages"), list):
        return False, "passages is not a list"
    if not isinstance(doc.get("entities"), list):
        return False, "entities is not a list"
    data = doc.get("data")
    if not isinstance(data, dict):
        return False, "data is not an object"
    for coll in ("figures", "tables", "numerical_data"):
        if coll in data and not isinstance(data[coll], list):
            return False, f"data.{coll} is not a list"
    return True, None


def repair_document(doc: Dict, doc_name: str) -> Dict:
    """V2/V3 — inject defaults for whatever is missing
    (batch_pdf_processor.py:649-706, :1751-1804)."""
    fixed = deepcopy(doc) if isinstance(doc, dict) else {}
    fixed.setdefault("schema_version", SCHEMA_VERSION)
    d = fixed.setdefault("doc", {})
    d.setdefault("doc_id", ids.doc_id(doc_name))
    d.setdefault("title", "Untitled Document")
    d.setdefault("timestamps", {"ingested_at": FIXED_TS, "extracted_at": FIXED_TS})
    d.setdefault("extraction_run", {"pipeline_steps": ["repair"]})
    fixed.setdefault("passages", [])
    fixed.setdefault("entities", [])
    data = fixed.setdefault("data", {})
    data.setdefault("figures", [])
    data.setdefault("tables", [])
    data.setdefault("numerical_data", [])
    data.setdefault("claims", [])
    data.setdefault("relations", [])
    data.setdefault("extraction_summary", {
        "figures_count": len(data["figures"]),
        "tables_count": len(data["tables"]),
        "numerical_data_count": len(data["numerical_data"]),
    })
    return fixed
