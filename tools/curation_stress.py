"""Curation-suite scale soak: the round-5 operators (line dedup,
decontamination, temperature sampling, TF-IDF, PII redaction, shard
packing) timed at N× the sf0.1 document corpus with planted MULTI-LINE
structure.

Corpus shape (deterministic, md5-seeded — no RNG): each of copies×5000 docs
becomes 4+ lines —

* the original single-line text (unique per source doc, replicated
  ``copies`` times → exactly-duplicated lines at frequency = copies),
* two boilerplate banner lines drawn Zipf(1) over K templates (the hottest
  banner lands on ~N/ln K docs — the skew shape dedup_lines' count
  aggregate must absorb),
* on every third doc, a per-doc unique "rare" line (must SURVIVE line
  dedup),
* a planted email + IPv4 (for the redaction pass).

Usage:
    python tools/curation_stress.py --copies 100        # ~500k docs
    python tools/curation_stress.py --copies 10 --json
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

ZIPF_K = 1000


def build_corpus(spark, sf_dir: str, copies: int, cache_dir: str):
    from pyspark.sql import functions as F
    out = Path(cache_dir)
    if not out.exists():
        docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
        n = docs.selectExpr("max(doc_id) + 1 AS n").first()["n"]
        rep = docs.select(
            "doc_id", "text", "lang",
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"))
        did = (F.col("doc_id") + F.col("copy") * F.lit(n)).alias("doc_id")
        # Zipf(1) over ZIPF_K via inverse-CDF of a doc-hash uniform (the
        # dedup_stress recipe): template = floor(K^u)
        u = (F.conv(F.substring(F.md5(F.concat(F.lit("ln"), did.cast("string"))),
                                1, 8), 16, 10).cast("double") / F.lit(2.0 ** 32))
        tmpl = F.floor(F.pow(F.lit(float(ZIPF_K)), u)).cast("int")
        u2 = (F.conv(F.substring(F.md5(F.concat(F.lit("l2"), did.cast("string"))),
                                 1, 8), 16, 10).cast("double") / F.lit(2.0 ** 32))
        tmpl2 = F.floor(F.pow(F.lit(float(ZIPF_K)), u2)).cast("int")
        banner = lambda t: F.concat(
            F.lit("boilerplate navigation banner template number "),
            t.cast("string"), F.lit(" all rights reserved"))
        rare = F.when(did % 3 == 0,
                      F.concat(F.lit("\nrare unique line for doc "),
                               did.cast("string"))).otherwise(F.lit(""))
        text = F.concat(
            F.col("text"),
            F.lit("\n"), banner(tmpl),
            F.lit("\n"), banner(tmpl2),
            rare,
            F.lit("\ncontact u"), did.cast("string"),
            F.lit("@example.org via 10."), (did % 200).cast("string"),
            F.lit(".0.7"))
        (rep.select(did, text.alias("text"), "lang")
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite").parquet(str(out)))
    from engine.spark.job import tune_input_splits
    print(f"  maxPartitionBytes={tune_input_splits(spark, str(out))}")
    return spark.read.parquet(str(out))


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from engine.datawork.corpus import tfidf_top_terms
    from engine.datawork.curation import (contamination_report, dedup_lines,
                                          redact_pii, temperature_sample)
    from engine.datawork.pack import pack_shards

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName(f"curation-stress-{args.copies}x")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    docs = build_corpus(spark, args.sf, args.copies,
                        f"/tmp/spark_graft_cura_{args.copies}x")
    out: dict = {"copies": args.copies, "n_docs": docs.count(),
                 "zipf_k": ZIPF_K}

    def timed(name, fn):
        t0 = time.monotonic()
        res = fn()
        out[name] = {"wall_s": round(time.monotonic() - t0, 1), **res}
        print(f"  {name}: {out[name]}", flush=True)
        return res

    # line dedup: every replicated original line (freq = copies) and every
    # banner line is hot at min_count <= copies; rare lines must survive
    def run_line_dedup():
        res = dedup_lines(docs, min_count=min(args.copies, 100))
        agg = res.agg(F.count("*").alias("docs"),
                      F.sum("n_kept").alias("kept"),
                      F.sum("n_dropped").alias("dropped")).first()
        return {"docs": agg["docs"], "lines_kept": agg["kept"],
                "lines_dropped": agg["dropped"]}
    timed("line_dedup", run_line_dedup)

    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8),
                     16, 10).cast("long") % 100)
    def run_decontaminate():
        rep = contamination_report(docs.filter(bucket >= 1),
                                   docs.filter(bucket < 1), n=3)
        return {"contaminated_docs": rep.count()}
    timed("decontaminate_1pct_bench", run_decontaminate)

    def run_temperature():
        budget = out["n_docs"] // 100
        got = temperature_sample(docs, budget=budget)
        return {"budget": budget, "sampled": got.count()}
    timed("temperature_sample", run_temperature)

    def run_tfidf():
        return {"rows": tfidf_top_terms(docs, top_k=5).count()}
    timed("tfidf_top5", run_tfidf)

    def run_redact():
        agg = (redact_pii(docs)
               .agg(F.sum("n_emails").alias("e"), F.sum("n_ips").alias("i"))
               .first())
        return {"emails": agg["e"], "ips": agg["i"]}
    timed("redact_pii", run_redact)

    def run_pack():
        packed = pack_shards(docs, budget=2048)
        agg = packed.agg(F.max("shard_id").alias("mx"),
                         F.sum("n_tokens").alias("tok")).first()
        return {"shards": agg["mx"] + 1, "tokens": agg["tok"]}
    timed("pack_2048", run_pack)

    # the composed funnel at scale: quality gate + the full 500k dedup
    # chain + decontamination + sampling in one plan (bench = 1% hash
    # split, budget = 1% of survivors' order)
    def run_curate():
        from engine.datawork.curation import curate_funnel
        rows = curate_funnel(docs.filter(bucket >= 1),
                             docs.filter(bucket < 1),
                             budget=out["n_docs"] // 100).collect()
        return {r["stage"]: r["n_docs"] for r in rows}
    timed("curate_funnel", run_curate)

    from engine.datawork import dedup as dedup_mod
    out["rebalance_triggers"] = dedup_mod.REBALANCE_TRIGGERS
    if args.json:
        print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
