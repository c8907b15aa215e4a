"""Build committed synthetic inputs + oracle-expected outputs.

For each scale tag this writes, under ``data/synth/{tag}/``:

  transcripts.parquet        the input table (FIXTURES.md §1, seeded)
  expected_turns.parquet     per-turn oracle record (flat scalars + md5 of
                             cleaned_text — the per-turn equality target)
  expected_passages.parquet  exploded passage rows
  expected_numerics.parquet  exploded numeric rows
  expected_tables.parquet    exploded table rows
  expected_spans.parquet     exploded span rows
  expected_convs.parquet     conversation-level rollup

The expected files are produced by the pure-Python kernel (engine.core) —
the same code whose byte-parity with the reference was established by
tools/parity_check.py — so "Spark output hash == expected hash" in the
driver's DuckDB comparison IS the per-turn equality gate.

Usage: python tools/build_expected.py [--tags sf0.001,sf0.01]
"""

from __future__ import annotations

import argparse
import hashlib
import sys
from pathlib import Path

import pyarrow as pa
import pyarrow.parquet as pq

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

from engine.core.extract import extract_turn  # noqa: E402
from tools import synth  # noqa: E402

TAG_TURNS = {"sf0.001": 800, "sf0.01": 4000, "sf0.1": 60000}


def _md5(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def build_tag(tag: str, out_base: Path) -> None:
    n_turns = TAG_TURNS.get(tag, 4000)
    out = out_base / tag
    out.mkdir(parents=True, exist_ok=True)

    synth.write_parquet(str(out / "transcripts.parquet"), n_turns)
    rows = pq.read_table(str(out / "transcripts.parquet")).to_pylist()

    turns, passages, numerics, tables, spans = [], [], [], [], []
    convs: dict = {}
    for r in rows:
        key = (r["conv_id"], r["turn_idx"])
        rec = extract_turn(r["text"], r["tool"], f"{r['conv_id']}:{r['turn_idx']}")
        turns.append({
            "conv_id": key[0], "turn_idx": key[1],
            "payload_kind": rec["payload_kind"],
            "cleaned_md5": _md5(rec["cleaned_text"]),
            "cleaned_len": len(rec["cleaned_text"]),
            "word_count": rec["word_count"],
            "page_count": rec["page_count"],
            "removed_sections": rec["clean_stats"]["removed_sections"],
            "removed_paragraphs": rec["clean_stats"]["removed_paragraphs"],
            "passages_count": rec["summary"]["passages_count"],
            "tables_count": rec["summary"]["tables_count"],
            "numerics_count": rec["summary"]["numerics_count"],
            "entities_count": rec["summary"]["entities_count"],
            "figures_kept_count": len(rec["figures_kept"]),
            "figures_dropped_count": len(rec["figures_dropped"]),
            "n_spans": len(rec["spans"]),
            "title": rec["title"], "date": rec["date"],
            "language": rec["language"], "error": rec["error"],
        })
        for p in rec["passages"]:
            passages.append({"conv_id": key[0], "turn_idx": key[1],
                             "passage_id": p["passage_id"], "page": p["page"],
                             "text_len": len(p["text"]),
                             "text_md5": _md5(p["text"])})
        for n in rec["numerics"]:
            numerics.append({"conv_id": key[0], "turn_idx": key[1],
                             "num_id": n["num_id"], "value": float(n["value"]),
                             "unit": n["unit"], "metric_type": n["metric_type"],
                             "page": n["page"]})
        for t in rec["tables"]:
            tables.append({"conv_id": key[0], "turn_idx": key[1],
                           "table_id": t["table_id"], "page": t["page"],
                           "n_cols": len(t["columns"]), "n_rows": len(t["rows"]),
                           "title": t["title"]})
        for s in rec["spans"]:
            spans.append({"conv_id": key[0], "turn_idx": key[1],
                          "kind": s["kind"], "start": s["start"],
                          "end": s["end"], "label": s["label"]})
        c = convs.setdefault(key[0], {"turns": [], "tickers": set()})
        c["turns"].append((key[1], rec))

    # real-BPE token oracle (frozen merges table, engine/core/bpe.py) —
    # skipped only if the committed merges file is absent (fresh partial
    # checkouts); the md5 pins the exact token sequence per turn
    bpe_rows = []
    docs_bpe_rows = []
    merges_path = REPO / "data" / "bpe" / "merges.txt"
    if merges_path.exists():
        from engine.core.bpe import build_ranks, encode_text, load_merges
        ranks = build_ranks(load_merges(str(merges_path)))
        cache: dict = {}
        for r in rows:
            toks = encode_text(r["text"] or "", ranks, cache)
            bpe_rows.append({
                "conv_id": r["conv_id"], "turn_idx": r["turn_idx"],
                "n_tokens": len(toks),
                "tokens_md5": _md5(" ".join(toks)),
            })
        # per-document BPE counts over the provided documents table — the
        # oracle side of token-true shard packing (pack_shards now budgets
        # in real BPE tokens; DuckDB can't run the merges kernel, so the
        # same Spark-free engine/core/bpe.py produces its counts here)
        docs_pq = Path("/root/testdata") / tag / "documents.parquet"
        if docs_pq.exists():
            dcache: dict = {}
            for d in pq.read_table(str(docs_pq),
                                   columns=["doc_id", "text"]).to_pylist():
                dtoks = encode_text(d["text"] or "", ranks, dcache)
                docs_bpe_rows.append({
                    "doc_id": d["doc_id"],
                    "n_tokens": len(dtoks),
                    "tokens_md5": _md5(" ".join(dtoks)),
                })

    import json as _json

    from engine.core.assemble import (build_conversation_document,
                                      validate_document)

    conv_rows = []
    doc_rows = []
    for conv_id in sorted(convs):
        ordered = sorted(convs[conv_id]["turns"])
        recs = [rec for _, rec in ordered]
        for (ti, _), rec in zip(ordered, recs):
            rec["turn_idx"] = ti
        doc = build_conversation_document(conv_id, recs)
        ok, _err = validate_document(doc)
        doc_rows.append({
            "conv_id": conv_id,
            "n_turns": len(recs),
            "doc_md5": _md5(_json.dumps(doc, ensure_ascii=False, sort_keys=True)),
            "is_valid": bool(ok),
        })
        tickers = sorted({t for rec in recs for t in rec["tickers"]})
        conv_rows.append({
            "conv_id": conv_id,
            "n_turns": len(recs),
            "max_turn_idx": max(i for i, _ in ordered),
            "conv_text_md5": _md5("\n\n".join(r["cleaned_text"] for r in recs)),
            "tickers_csv": ",".join(tickers),
            "passages_count": sum(r["summary"]["passages_count"] for r in recs),
            "tables_count": sum(r["summary"]["tables_count"] for r in recs),
            "numerics_count": sum(r["summary"]["numerics_count"] for r in recs),
            "failed_turns": sum(1 for r in recs if r["error"]),
            "cleaned_chars": sum(len(r["cleaned_text"]) for r in recs),
        })

    def write(name, data, int32_cols=(), int64_cols=(), double_cols=(),
              bool_cols=()):
        if not data:
            return
        fields = []
        for k in data[0]:
            if k in int32_cols:
                typ = pa.int32()
            elif k in int64_cols:
                typ = pa.int64()
            elif k in double_cols:
                typ = pa.float64()
            elif k in bool_cols:
                typ = pa.bool_()
            else:
                typ = pa.string()
            fields.append((k, typ))
        pq.write_table(pa.Table.from_pylist(data, schema=pa.schema(fields)),
                       str(out / name))

    i32 = ("turn_idx", "cleaned_len", "word_count", "page_count",
           "removed_sections", "removed_paragraphs", "passages_count",
           "tables_count", "numerics_count", "entities_count",
           "figures_kept_count", "figures_dropped_count", "n_spans",
           "page", "text_len", "n_cols", "n_rows", "start", "end")
    write("expected_turns.parquet", turns, int32_cols=i32)
    write("expected_passages.parquet", passages, int32_cols=i32)
    write("expected_numerics.parquet", numerics, int32_cols=i32,
          double_cols=("value",))
    write("expected_tables.parquet", tables, int32_cols=i32)
    write("expected_spans.parquet", spans, int32_cols=i32)
    write("expected_convs.parquet", conv_rows,
          int32_cols=("max_turn_idx",),
          int64_cols=("n_turns", "passages_count", "tables_count",
                      "numerics_count", "failed_turns", "cleaned_chars"))
    write("expected_docs.parquet", doc_rows, int32_cols=("n_turns",),
          bool_cols=("is_valid",))
    write("expected_bpe.parquet", bpe_rows, int32_cols=("turn_idx", "n_tokens"))
    write("expected_docs_bpe.parquet", docs_bpe_rows,
          int32_cols=("n_tokens",), int64_cols=("doc_id",))
    print(f"{tag}: {len(rows)} turns, {len(passages)} passages, "
          f"{len(numerics)} numerics, {len(tables)} tables, {len(spans)} spans")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--tags", default="sf0.001,sf0.01")
    ap.add_argument("--out", default=str(REPO / "data" / "synth"))
    args = ap.parse_args()
    for tag in args.tags.split(","):
        build_tag(tag.strip(), Path(args.out))


if __name__ == "__main__":
    main()
