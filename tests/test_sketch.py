"""Misra-Gries heavy hitters: kernel guarantees + the two-phase Spark
pipeline's exactness vs a full histogram, under adversarial
partitioning."""
from __future__ import annotations

import random
from collections import Counter

import pytest

from engine.datawork.sketch import heavy_hitters, misra_gries


def test_mg_kernel_guarantees():
    rng = random.Random(5)
    stream = (["hot"] * 400 + ["warm"] * 120 +
              [f"t{rng.randrange(500)}" for _ in range(480)])
    rng.shuffle(stream)
    n, k = len(stream), 9
    true = Counter(stream)
    mg = misra_gries(stream, k)
    assert len(mg) <= k
    # no-miss: every item above n/(k+1) is a key
    for t, c in true.items():
        if c > n / (k + 1):
            assert t in mg, t
    # undercount bound
    for t, est in mg.items():
        assert true[t] - n / (k + 1) <= est <= true[t]
    with pytest.raises(ValueError):
        misra_gries(stream, 0)


@pytest.mark.parametrize("parts", [1, 7])
def test_heavy_hitters_exact_vs_histogram(spark, parts):
    rng = random.Random(17)
    vocab = [f"w{i}" for i in range(200)]
    docs = []
    for d in range(300):
        words = ["boiler"] * rng.randrange(4) + \
            [rng.choice(vocab) for _ in range(rng.randrange(3, 25))]
        rng.shuffle(words)
        docs.append((d, " ".join(words)))
    df = (spark.createDataFrame(docs, "doc_id long, text string")
          .repartition(parts))
    k = 20
    # truth: the full histogram
    all_toks = [t for _, txt in docs for t in txt.lower().split()]
    n = len(all_toks)
    true = {t: c for t, c in Counter(all_toks).items()
            if c * (k + 1) > n}
    got = {r.term: r.cnt for r in heavy_hitters(df, k=k).collect()}
    assert got == true and "boiler" in got


def test_heavy_hitters_edges(spark):
    df = spark.createDataFrame(
        [(0, "a a a b"), (1, None), (2, "   "), (3, "a c")],
        "doc_id long, text string")
    # N=6 tokens, k=1: only terms with cnt*2 > 6, i.e. 'a' (4)
    got = {r.term: r.cnt for r in heavy_hitters(df, k=1).collect()}
    assert got == {"a": 4}
