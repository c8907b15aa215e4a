"""Similarity search over an embedding column (array<float>).

* ``cosine_topk`` — brute-force scan: one projection (higher-order dot
  product, JVM-side) + a top-k. The baseline, and the verifier for the
  bucketed path.
* ``lsh_bucket_topk`` — random-hyperplane LSH: 2^P sign-pattern buckets; the
  query probes only its own bucket. At 100 TB the bucket id is the partition
  key, so a query touches one partition instead of the corpus (IVF-style);
  recall is tuned by P and multi-probe.
* ``cosine_pairs_above`` — all near-dup pairs by cosine ≥ τ, bucketed by the
  same LSH so the self-join is per-bucket, not a cross join.

Hyperplanes are fixed constants derived from numpy RandomState(42) — shared
with the oracle-SQL generator so both engines compute identical buckets.
"""

from __future__ import annotations

from typing import List, Sequence

from pyspark.sql import Column, DataFrame, functions as F

LSH_PLANES_SEED = 42
LSH_N_PLANES = 8
EMBED_DIM = 64


def lsh_planes(n_planes: int = LSH_N_PLANES, dim: int = EMBED_DIM) -> List[List[float]]:
    import numpy as np
    rs = np.random.RandomState(LSH_PLANES_SEED)
    return [[float(x) for x in rs.standard_normal(dim)] for _ in range(n_planes)]


def _lit_array(values: Sequence[float]) -> Column:
    return F.array(*[F.lit(float(v)) for v in values])


def dot(vec: Column, const: Sequence[float]) -> Column:
    """Σ vec[i]·const[i], left-to-right in double precision (matches the
    oracle's list_sum(list_transform(...)) evaluation order)."""
    return F.aggregate(
        F.zip_with(vec.cast("array<double>"), _lit_array(const), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)


def norm(vec: Column) -> Column:
    return F.sqrt(F.aggregate(
        F.zip_with(vec.cast("array<double>"), vec.cast("array<double>"),
                   lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x))


def cosine_to_const(vec: Column, query: Sequence[float]) -> Column:
    import math
    qn = math.sqrt(sum(v * v for v in query))
    return dot(vec, query) / (norm(vec) * F.lit(qn))


def bucket_expr(vec: Column, planes: List[List[float]]) -> Column:
    """Sign-pattern bucket id, e.g. '10110010' for 8 planes."""
    bits = [F.when(dot(vec, p) > 0, F.lit("1")).otherwise(F.lit("0"))
            for p in planes]
    return F.concat(*bits)


def bucket_of(query: Sequence[float], planes: List[List[float]]) -> str:
    return "".join(
        "1" if sum(q * c for q, c in zip(query, p)) > 0 else "0" for p in planes)


def cosine_topk(df: DataFrame, query: Sequence[float], k: int = 10,
                id_col: str = "vec_id", vec_col: str = "embedding") -> DataFrame:
    scored = df.select(
        F.col(id_col),
        F.round(cosine_to_const(F.col(vec_col), query), 6).alias("score"))
    return scored.orderBy(F.col("score").desc(), F.col(id_col)).limit(k)


def lsh_bucket_topk(df: DataFrame, query: Sequence[float], k: int = 10,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    planes: List[List[float]] | None = None) -> DataFrame:
    planes = planes or lsh_planes()
    qb = bucket_of(query, planes)
    candidates = df.filter(bucket_expr(F.col(vec_col), planes) == qb)
    return cosine_topk(candidates, query, k, id_col, vec_col)


def with_lsh_bucket(df: DataFrame, vec_col: str = "embedding",
                    planes: List[List[float]] | None = None) -> DataFrame:
    return df.withColumn("lsh_bucket", bucket_expr(F.col(vec_col), planes or lsh_planes()))


def cosine_pairs_above(df: DataFrame, threshold: float = 0.95,
                       id_col: str = "vec_id", vec_col: str = "embedding",
                       bucketed: bool = True) -> DataFrame:
    """Embedding-cosine near-dup pairs. ``bucketed=True`` joins within LSH
    buckets (the scale path — misses cross-bucket pairs by design, recall
    tunable via plane count); ``bucketed=False`` is the exact small-N path."""
    base = df.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
                     norm(F.col(vec_col)).alias("nrm"))
    if bucketed:
        base = base.withColumn("bkt", bucket_expr(F.col("v"), lsh_planes()))
        cond = (F.col("a.bkt") == F.col("b.bkt")) & (F.col("a.id") < F.col("b.id"))
    else:
        cond = F.col("a.id") < F.col("b.id")
    a, b = base.alias("a"), base.alias("b")
    dotprod = F.aggregate(
        F.zip_with(F.col("a.v").cast("array<double>"),
                   F.col("b.v").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    return (a.join(b, cond)
            .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b"),
                    F.round(dotprod / (F.col("a.nrm") * F.col("b.nrm")), 6)
                     .alias("cosine"))
            .filter(F.col("cosine") >= threshold))
