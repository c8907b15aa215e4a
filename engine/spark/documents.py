"""Conversation-scope document assembly — the grouped-map UDF surface.

``conversation_documents`` groups the extracted-turns table by conv_id with
``applyInPandas`` and assembles each conversation into one schema-1.3.1 JSON
document (engine.core.assemble.build_conversation_document — entity dedup,
figure-stub merge, validation/repair).

Scale notes: this is the engine's only grouped-map stage. The shuffle key is
conv_id; conversation sizes are bounded (≤ a few thousand turns) so per-group
state is bounded; for pathological mega-conversations AQE skew handling plus
the salted variant (group on (conv_id, turn_idx % S), reduce driverless in a
second pass) is the documented escape hatch. Turn order inside the group is
re-imposed by an explicit sort — groupBy does NOT preserve order (the
stable-ordering invariant is enforced here, not assumed).
"""

from __future__ import annotations

import json

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql.types import (BooleanType, IntegerType, StringType,
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
    normalize to plain Python for the kernel + json."""
    import numpy as np
    if isinstance(v, dict):
        return {k: _plain(x) for k, x in v.items()}
    if isinstance(v, (list, tuple)) or isinstance(v, np.ndarray):
        return [_plain(x) for x in v]
    if isinstance(v, np.generic):
        return v.item()
    return v


def _assemble_group(pdf: pd.DataFrame) -> pd.DataFrame:
    from engine.core.assemble import build_conversation_document, validate_document

    raw_conv = pdf["conv_id"].iloc[0]
    conv_id = raw_conv if isinstance(raw_conv, str) else "None"
    n_rows = len(pdf)
    try:
        # dirty-row tolerance: turn_idx arrives float64 when any row is null
        pdf = pdf.sort_values("turn_idx", na_position="last")
        # column-zip staging, NOT iterrows: a per-row Series materialization
        # per turn measured ~2× the staging cost of this one grouped-map
        # stage (VERDICT r3 #5); .tolist() converts each column once
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


def conversation_documents(extracted: DataFrame) -> DataFrame:
    return (extracted.select(*_NEEDED)
            .groupBy("conv_id")
            .applyInPandas(_assemble_group, schema=DOC_SCHEMA))
