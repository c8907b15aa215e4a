"""Conversation-scope document assembly — the grouped-map UDF surface.

``conversation_documents`` groups the extracted-turns table by conv_id with
``applyInPandas`` and assembles each conversation into one schema-1.3.1 JSON
document (engine.core.assemble.build_conversation_document — entity dedup,
figure-stub merge, validation/repair).

Scale notes: this is the engine's only grouped-map stage. The shuffle key is
conv_id; conversation sizes are bounded (≤ a few thousand turns) so per-group
state is bounded. For pathological mega-conversations pass ``chunk=N``: the
salted two-pass path shards each conversation on contiguous
``floor(turn_idx / N)`` blocks (contiguous, NOT ``turn_idx % S`` — the
assembly fold is order-dependent, so shards must be turn ranges whose
concatenation in shard order reproduces the global order), folds each shard
to a compact partial with the SAME engine.core fold the single-pass path
uses, and merges ≤ ceil(turns/N) partials per conversation in a second
grouped-map. Pass-1 group size is bounded by N turns regardless of
conversation size; pass 2 holds the shard partials, which are already
within-shard-deduped and stripped of per-turn staging — the final document
itself is the irreducible memory floor (the output row IS the document).
Output is byte-identical to the single-pass path (driver query
``conversation_documents_salted`` shares the expected_docs oracle). Turn
order inside each group is re-imposed by an explicit sort — groupBy does NOT
preserve order (the stable-ordering invariant is enforced here, not assumed).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (BooleanType, IntegerType, LongType, StringType,
                               StructField, StructType)

DOC_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("n_turns", IntegerType(), False),
    StructField("doc_json", StringType(), False),
    StructField("is_valid", BooleanType(), False),
    StructField("error", StringType(), True),
])

_NEEDED = ["conv_id", "turn_idx", "payload_kind", "title", "language",
           "tickers", "passages", "tables", "numerics", "entities", "figures"]


def _plain(v):
    """Arrow→pandas cells arrive as numpy arrays / dicts of numpy scalars;
    normalize to plain Python for the kernel + json.

    Hot path of the whole grouped-map stage (profiled: ~60% of assembly
    time before the rewrite), so: exact type dispatch first (str/int/float
    /None leaves dominate and return immediately), ndarray→list via the
    C-level ``tolist()`` (which already converts NUMERIC element scalars),
    and ``np.generic.item()`` only as the fallback."""
    import numpy as np
    t = type(v)
    if t is str or t is int or t is float or t is bool or v is None:
        return v
    if t is dict:
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, np.ndarray):
        # tolist() is deep for numeric dtypes; object arrays yield their
        # elements (dicts/strs) unchanged — recurse only over those
        out = v.tolist()
        return [_plain(x) for x in out]
    if isinstance(v, (list, tuple)):
        return [_plain(x) for x in v]
    if isinstance(v, np.generic):
        return v.item()
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    return v


def _stage_records(pdf: pd.DataFrame) -> list:
    """Sorted Arrow group → plain-Python turn records, shared by the
    single-pass assemble kernel and the salted pass-1 fold kernel.
    Column-zip staging, NOT iterrows: a per-row Series materialization
    per turn measured ~2× the staging cost of this one grouped-map
    stage (VERDICT r3 #5); .tolist() converts each column once."""
    # dirty-row tolerance: turn_idx arrives float64 when any row is null
    pdf = pdf.sort_values("turn_idx", na_position="last")
    cols = [pdf[c].tolist() for c in
            ("turn_idx", "payload_kind", "title", "language", "tickers",
             "passages", "tables", "numerics", "entities", "figures")]
    records = []
    for (turn_idx, payload_kind, title, language, tickers, passages,
         tables, numerics, entities, figures) in zip(*cols):
        records.append({
            "turn_idx": 0 if pd.isna(turn_idx) else int(turn_idx),
            "payload_kind": payload_kind,
            "title": title,
            "language": language,
            "tickers": _plain(tickers),
            "passages": _plain(passages),
            "tables": _plain(tables),
            "numerics": _plain(numerics),
            "entities": _plain(entities),
            "figures": _plain(figures),
        })
    return records


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from engine.core.assemble import build_conversation_document, validate_document

    raw_conv = pdf["conv_id"].iloc[0]
    conv_id = raw_conv if isinstance(raw_conv, str) else "None"
    n_rows = len(pdf)
    try:
        records = _stage_records(pdf)
        doc = build_conversation_document(conv_id, records)
        ok, err = validate_document(doc)
        return pd.DataFrame([{
            "conv_id": conv_id, "n_turns": len(records),
            "doc_json": json.dumps(doc, ensure_ascii=False, sort_keys=True),
            "is_valid": bool(ok), "error": err,
        }])
    except Exception as exc:  # never throw — dirty group becomes an error row
        return pd.DataFrame([{
            "conv_id": conv_id, "n_turns": n_rows,
            "doc_json": "{}", "is_valid": False,
            "error": f"{type(exc).__name__}: {exc}",
        }])


PARTIAL_SCHEMA = StructType([
    StructField("conv_id", StringType(), False),
    StructField("shard", LongType(), False),
    StructField("n_rows", IntegerType(), False),
    StructField("partial_json", StringType(), False),
    StructField("error", StringType(), True),
])

# null turn_idx rows sort after every real turn in the single-pass kernel
# (na_position="last"); the salted path reproduces that by routing them to a
# shard id above any real floor(turn_idx/chunk).
_NULL_SHARD = 1 << 40


def shard_expr(chunk: int):
    """Contiguous-block shard id for the salted path; ≤ ``chunk`` turns can
    share one (conv_id, shard) pass-1 group — the memory bound is the
    grouping key itself, not a runtime check."""
    return (F.when(F.col("turn_idx").isNull(), F.lit(_NULL_SHARD))
             .otherwise(F.floor(F.col("turn_idx") / F.lit(int(chunk)))))


def _fold_shard(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pass 1 of the salted path: one (conv_id, shard) block → one compact
    JSON partial via the shared engine.core fold."""
    from engine.core.assemble import fold_conversation_records

    raw_conv = pdf["conv_id"].iloc[0]
    conv_id = raw_conv if isinstance(raw_conv, str) else "None"
    shard = int(pdf["shard"].iloc[0])
    n_rows = len(pdf)
    try:
        state = fold_conversation_records(_stage_records(pdf))
        return pd.DataFrame([{
            "conv_id": conv_id, "shard": shard, "n_rows": n_rows,
            "partial_json": json.dumps(state, ensure_ascii=False),
            "error": None,
        }])
    except Exception as exc:  # never throw — poison shard becomes an error partial
        return pd.DataFrame([{
            "conv_id": conv_id, "shard": shard, "n_rows": n_rows,
            "partial_json": "{}", "error": f"{type(exc).__name__}: {exc}",
        }])


def _merge_shards(pdf: pd.DataFrame) -> pd.DataFrame:
    """Pass 2 of the salted path: a conversation's shard partials (≤
    ceil(turns/chunk) rows, merged in shard order) → the final document via
    the shared engine.core merge + finalize."""
    from engine.core.assemble import (finalize_conversation_document,
                                      merge_conversation_partials,
                                      validate_document)

    raw_conv = pdf["conv_id"].iloc[0]
    conv_id = raw_conv if isinstance(raw_conv, str) else "None"
    n_rows = int(pdf["n_rows"].sum())
    try:
        pdf = pdf.sort_values("shard")
        errs = [e for e in pdf["error"].tolist() if e]
        if errs:  # mirror the single-pass contract: a poison turn errors the doc
            raise RuntimeError(errs[0])
        partials = [json.loads(s) for s in pdf["partial_json"].tolist()]
        state = merge_conversation_partials(partials)
        doc = finalize_conversation_document(conv_id, state)
        ok, err = validate_document(doc)
        return pd.DataFrame([{
            "conv_id": conv_id, "n_turns": state["n_turns"],
            "doc_json": json.dumps(doc, ensure_ascii=False, sort_keys=True),
            "is_valid": bool(ok), "error": err,
        }])
    except Exception as exc:
        return pd.DataFrame([{
            "conv_id": conv_id, "n_turns": n_rows,
            "doc_json": "{}", "is_valid": False,
            "error": f"{type(exc).__name__}: {exc}",
        }])


def conversation_documents(extracted: DataFrame, chunk: int | None = None) -> DataFrame:
    """``chunk=None`` — one grouped-map per conversation (default; right
    whenever conversations fit an executor, i.e. almost always).

    ``chunk=N`` — the salted two-pass escape hatch for mega-conversations:
    shard on contiguous ``floor(turn_idx / N)`` blocks so pass-1 groups are
    ≤ N turns, fold each block to a compact partial, then merge each
    conversation's partials in shard order. Byte-identical output (same
    core fold/finalize; see module docstring)."""
    if chunk is None:
        return (extracted.select(*_NEEDED)
                .groupBy("conv_id")
                .applyInPandas(_assemble_group, schema=DOC_SCHEMA))
    if chunk < 1:
        raise ValueError(f"chunk must be >= 1, got {chunk}")
    sharded = extracted.select(*_NEEDED).withColumn("shard", shard_expr(chunk))
    partials = (sharded.groupBy("conv_id", "shard")
                .applyInPandas(_fold_shard, schema=PARTIAL_SCHEMA))
    return (partials.groupBy("conv_id")
            .applyInPandas(_merge_shards, schema=DOC_SCHEMA))
