"""Selection-family scale soak: SemDeDup, DSIR, and the frozen linear
classifier timed at synthetic scale with PLANTED structure so result
counts are checkable, not just timed.

Vectors (for SemDeDup): ``--vec-copies`` near-identical variants of each
sf0.1 embedding — variant c of vector v perturbs every dimension by a
deterministic md5-seeded offset in [0, eps). Each source vector therefore
spawns a tight near-dup cluster of size vec-copies; SemDeDup at a high
threshold should collapse ~every cluster to one survivor, so

    expected losers ≈ n_vectors · (1 − 1/vec_copies)

up to clusters split across k-means cells (reported, not hidden).

Docs (for DSIR/classifier): the curation_stress corpus builder (N×5000
multi-line docs with Zipf banners + planted PII).

Usage:
    python tools/selection_stress.py --vec-copies 10 --copies 100
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def build_vectors(spark, sf_dir: str, copies: int, eps: float,
                  cache_dir: str):
    from pyspark.sql import functions as F
    out = Path(cache_dir)
    if not out.exists():
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        n = emb.selectExpr("max(vec_id) + 1 AS n").first()["n"]
        rep = emb.select(
            "vec_id", "embedding",
            F.explode(F.sequence(F.lit(0), F.lit(copies - 1))).alias("copy"))
        vid = (F.col("vec_id") + F.col("copy") * F.lit(n)).alias("vec_id")
        # per-(vector, dim) deterministic jitter in [0, eps)
        seed = F.concat(vid.cast("string"), F.lit(":"))
        jit = lambda d: (F.conv(F.substring(F.md5(  # noqa: E731
            F.concat(seed, d.cast("string"))), 1, 8), 16, 10)
            .cast("double") / F.lit(2.0 ** 32) * eps)
        pert = F.transform(
            F.col("embedding").cast("array<double>"),
            lambda x, i: x + jit(i))
        (rep.select(vid, pert.alias("embedding"))
            .repartition(spark.sparkContext.defaultParallelism)
            .write.mode("overwrite").parquet(str(out)))
    return spark.read.parquet(str(out))


def main() -> int:
    from pyspark.sql import SparkSession, functions as F

    ap = argparse.ArgumentParser()
    ap.add_argument("--vec-copies", type=int, default=10)
    ap.add_argument("--eps", type=float, default=0.01)
    ap.add_argument("--cells", type=int, default=256)
    ap.add_argument("--copies", type=int, default=100,
                    help="doc-corpus multiplier (curation_stress builder)")
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    ap.add_argument("--cpus", type=int, default=32)
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from engine.datawork.dsir import dsir_weights
    from engine.datawork.quality import classifier_scores, load_qc_weights
    from engine.datawork.similarity import semdedup_losers, train_kmeans
    from tools.curation_stress import build_corpus

    spark = (SparkSession.builder.master(f"local[{args.cpus}]")
             .appName("selection-stress")
             .config("spark.sql.shuffle.partitions", str(args.cpus * 2))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.driver.memory", "48g")
             .config("spark.ui.enabled", "false")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    out: dict = {"vec_copies": args.vec_copies, "eps": args.eps,
                 "cells": args.cells, "doc_copies": args.copies}

    def timed(name, fn):
        t0 = time.monotonic()
        res = fn()
        out[name] = {"wall_s": round(time.monotonic() - t0, 1), **res}
        print(f"  {name}: {out[name]}", flush=True)

    vecs = build_vectors(
        spark, args.sf, args.vec_copies, args.eps,
        f"/tmp/spark_graft_selvec_{args.vec_copies}x_{args.eps}")
    n_vec = vecs.count()
    out["n_vectors"] = n_vec

    cent_box: dict = {}

    def run_semdedup(nprobe: int = 1):
        cent = cent_box.setdefault(
            "cent", train_kmeans(vecs, n_cells=args.cells).persist())
        losers = semdedup_losers(vecs, threshold=0.995, centroids=cent,
                                 nprobe=nprobe)
        n = losers.count()
        expect = n_vec - n_vec // args.vec_copies
        return {"losers": n, "expected_if_no_cluster_splits": expect,
                "collapse_ratio": round(n / max(1, expect), 4),
                "nprobe": nprobe}

    timed(f"semdedup_{n_vec // 1000}k", run_semdedup)
    # the r5 lead: do the cluster-boundary misses close at nprobe=2, and
    # at what cost? (global keep order makes >1 probe safe — see the
    # multi-probe over-deletion pitfall in ROUND5_NOTES)
    timed(f"semdedup_{n_vec // 1000}k_nprobe2",
          lambda: run_semdedup(nprobe=2))

    docs = build_corpus(spark, args.sf, args.copies,
                        f"/tmp/spark_graft_cura_{args.copies}x")
    n_docs = docs.count()
    out["n_docs"] = n_docs

    def run_dsir():
        raw = docs.filter(F.col("doc_id") % 11 != 0)
        tgt = docs.filter(F.col("doc_id") % 11 == 0)
        w = dsir_weights(raw, tgt)
        agg = w.agg(F.count("*").alias("n"),
                    F.count("log_weight").alias("scored")).first()
        return {"raw_docs": agg["n"], "scored": agg["scored"]}

    timed(f"dsir_weights_{n_docs // 1000}k", run_dsir)

    def run_classifier():
        s = classifier_scores(docs, load_qc_weights(spark))
        agg = s.agg(F.count("*").alias("n"),
                    F.round(F.avg("score"), 4).alias("mean_score")).first()
        return {"docs": agg["n"], "mean_score": agg["mean_score"]}

    timed(f"classifier_{n_docs // 1000}k", run_classifier)

    print(json.dumps(out) if args.json else out)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
