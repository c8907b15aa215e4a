"""Measured recall of the approximate dedup/similarity paths vs exact truth.

Two families, each "approximate candidates + exact verify", so precision is
1.0 by construction and RECALL is the number that matters:

* embedding near-dup: banded hyperplane LSH (similarity.cosine_pairs_above
  bucketed=True) vs the brute-force all-pairs cosine, at several thresholds.
* MinHash-LSH candidates (dedup.minhash_lsh_candidates) vs exact n-gram
  Jaccard ground truth (dedup.ngram_jaccard_pairs), at several J thresholds.

Usage: python tools/recall_report.py [--sf /root/testdata/sf0.01] [--json]

Prints a table (and with --json one JSON line) for BENCH/BASELINE.md.
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default="/root/testdata/sf0.01")
    ap.add_argument("--json", action="store_true")
    args = ap.parse_args()

    from pyspark.sql import SparkSession

    from engine.datawork.dedup import (MINHASH_BANDS, MINHASH_K,
                                       minhash_lsh_candidates,
                                       ngram_jaccard_pairs)
    from engine.datawork.similarity import (LSH_BANDS, LSH_ROWS,
                                            cosine_pairs_above)

    spark = (SparkSession.builder.master("local[8]")
             .appName("recall-report")
             .config("spark.sql.shuffle.partitions", "16")
             .config("spark.ui.enabled", "false")
             .getOrCreate())

    out: dict = {"sf": args.sf}

    # ---- embedding banded LSH vs brute force ----
    emb = spark.read.parquet(f"{args.sf}/embeddings.parquet")
    truth = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             cosine_pairs_above(emb, threshold=0.35, bucketed=False).collect()}
    got = {(r["id_a"], r["id_b"]) for r in
           cosine_pairs_above(emb, threshold=0.35, bucketed=True).collect()}
    assert got <= set(truth), "banded path emitted a non-true pair"
    # candidate volume BEFORE the exact verify — the cost side of the
    # bands knob (recall gains must be reported next to this, VERDICT r2
    # #5). Counted through the SAME function the production path joins
    # with, so the number cannot drift from the real plan.
    from engine.datawork.similarity import (banded_buckets,
                                            candidate_pairs_from_banded)
    emb_candidates = candidate_pairs_from_banded(banded_buckets(emb)).count()
    emb_rows = []
    for tau in (0.35, 0.5, 0.8):
        t = {k for k, c in truth.items() if c >= tau}
        g = {k for k in got if k in t}
        emb_rows.append({"tau": tau, "true_pairs": len(t),
                         "caught": len(g),
                         "recall": round(len(g) / len(t), 4) if t else None})
    out["embedding_lsh"] = {"bands": LSH_BANDS, "rows": LSH_ROWS,
                            "candidates": emb_candidates,
                            "thresholds": emb_rows}

    # ---- MinHash-LSH candidates vs exact Jaccard ----
    docs = spark.read.parquet(f"{args.sf}/documents.parquet")
    jacc = {(r["id_a"], r["id_b"]): r["jaccard"] for r in
            ngram_jaccard_pairs(docs, threshold=0.5).collect()}
    cand = {(r["id_a"], r["id_b"]) for r in
            minhash_lsh_candidates(docs).collect()}
    mh_rows = []
    for thr in (0.5, 0.7, 0.8):
        t = {k for k, j in jacc.items() if j >= thr}
        g = {k for k in cand if k in t}
        mh_rows.append({"jaccard": thr, "true_pairs": len(t),
                        "caught": len(g),
                        "recall": round(len(g) / len(t), 4) if t else None})
    out["minhash_lsh"] = {"k": MINHASH_K, "bands": MINHASH_BANDS,
                          "candidates": len(cand), "thresholds": mh_rows}

    if args.json:
        print(json.dumps(out))
    else:
        print(f"embedding banded LSH  (B={LSH_BANDS} x r={LSH_ROWS}, "
              f"{emb_candidates} candidate pairs):")
        for r in emb_rows:
            print(f"  tau>={r['tau']:<5} true={r['true_pairs']:<5} "
                  f"caught={r['caught']:<5} recall={r['recall']}")
        print(f"minhash LSH  (k={MINHASH_K}, bands={MINHASH_BANDS}, "
              f"{len(cand)} candidate pairs):")
        for r in mh_rows:
            print(f"  J>={r['jaccard']:<6} true={r['true_pairs']:<5} "
                  f"caught={r['caught']:<5} recall={r['recall']}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
