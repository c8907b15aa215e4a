#!/usr/bin/env python
"""Train and freeze the hashed linear text classifier (dev-only).

Trains a fastText-style linear model over md5-hashed bag-of-tokens
features and writes the 6-decimal weight table to data/qc_weights.tsv
(bucket -1 = bias).

Label choice: the committed instance distills the corpus-median
STOPWORD-DENSITY heuristic (fluent-text proxy; STOPWORDS['en'] from
textstats) into dense hashed weights — the model has to discover which
buckets carry the stopwords and weigh them against everything else.
Two label candidates were tried and rejected as unlearnable from
bag-of-words on THIS synthetic corpus: the Gopher/C4 ``pass_quality``
predicate (length/structure-driven, one shared vocabulary) and
``lang == 'en'`` (the lang column does not shift token distributions
at all — measured, not assumed). On a real corpus, retrain with real
labels (wiki-vs-crawl etc.); the machinery is label-agnostic.

Everything is deterministic — labels come from the deterministic
predicate, features are md5-bucket counts, and training is full-batch
gradient descent from zero init (no RNG, no shuffling) — so re-running
this script on the same corpus reproduces the committed table byte for
byte. Commit the regenerated table together with any change that alters
the predicate or the feature hashing.

    python tools/train_qc.py \
        --input /root/testdata/sf0.01/documents.parquet \
        --out data/qc_weights.tsv
"""

from __future__ import annotations

import argparse
import hashlib
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from engine.datawork.quality import QC_BUCKETS  # noqa: E402


def bucket(term: str) -> int:
    """Must match engine.datawork.quality.qc_bucket exactly."""
    return int(hashlib.md5(term.encode("utf-8")).hexdigest()[:8], 16) \
        % QC_BUCKETS


def featurize(texts: list[str]) -> np.ndarray:
    x = np.zeros((len(texts), QC_BUCKETS))
    for i, t in enumerate(texts):
        toks = (t or "").strip().lower().split()
        for tok in toks:
            x[i, bucket(tok)] += 1.0
        if toks:
            x[i] /= len(toks)
    return x


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", default="/root/testdata/sf0.01/documents.parquet")
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "data", "qc_weights.tsv"))
    ap.add_argument("--iters", type=int, default=50000)
    ap.add_argument("--lr", type=float, default=10.0)
    ap.add_argument("--l2", type=float, default=1e-5)
    args = ap.parse_args()

    import duckdb
    from engine.datawork.textstats import STOPWORDS
    stops = set(STOPWORDS["en"])
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM read_parquet('{args.input}') "
        f"ORDER BY doc_id").fetchall()
    texts = [r[1] for r in rows]

    def density(t):
        toks = (t or "").strip().lower().split()
        return sum(tok in stops for tok in toks) / len(toks) if toks else 0.0

    dens = np.array([density(t) for t in texts])
    median = float(np.median(dens[dens > 0]))
    y = (dens >= median).astype(float)
    x = featurize(texts)
    keep = x.sum(axis=1) > 0
    x, y = x[keep], y[keep]
    print(f"n={len(y)} positives={int(y.sum())}")

    w = np.zeros(QC_BUCKETS)
    b = 0.0
    for it in range(args.iters):
        m = x @ w + b
        p = 1.0 / (1.0 + np.exp(-m))
        g = p - y
        w -= args.lr * (x.T @ g / len(y) + args.l2 * w)
        b -= args.lr * g.mean()
        if it % 10000 == 0 or it == args.iters - 1:
            acc = ((p > 0.5) == (y > 0.5)).mean()
            print(f"iter={it} acc={acc:.4f}")

    with open(args.out, "w") as f:
        f.write("bucket\tweight\n")
        f.write(f"-1\t{round(b, 6)}\n")
        for i in range(QC_BUCKETS):
            f.write(f"{i}\t{round(float(w[i]), 6)}\n")
    print(f"wrote {args.out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
