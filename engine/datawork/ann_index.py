"""Persisted LSH ANN index with wave probes — similarity's analogue of
the dedup family's incremental index (engine/datawork/incremental.py).

A production embedding corpus is hashed and laid out ONCE; query waves
(new documents looking for near neighbors, retrieval probes, dedup
lookups) then touch only the bucket slices they hash into, never the
full corpus. Same lineage as the extraction pipeline's
output-authoritative resume state (reference: batch_pdf_processor.py's
completed-stem skip) — persisted derived state stands in for recompute.

Index layout under ``<path>/``:

* ``vectors/`` — (id, v, bucket): the corpus vectors keyed by their
  sign-LSH bucket (``similarity.bucket_expr`` over the frozen
  deterministic planes), written range-partitioned + sorted by bucket so
  a probe's ``bucket IN (...)`` filter prunes parquet row groups via
  min/max statistics instead of scanning the corpus.
* ``stats/``   — (bucket, cnt) ADDITIVE partials (appends write partial
  rows, readers SUM) — occupancy observability for the skew question
  "did a bucket degenerate?" without touching ``vectors/``.

Scale contract:

* ``probe_index`` (one query vector, multi-probe): a pushed-down IN
  filter over the sorted layout + a TakeOrdered top-k — ZERO shuffles,
  reads only the P+1 probed buckets' row groups.
* ``probe_index_batch`` (a wave of query vectors): the WAVE is broadcast
  to the bucket-pruned corpus scan, so the corpus is never shuffled;
  only the candidate set (bucket-collision pairs) flows into the
  per-query top-k window.
* ``append_to_ann_index``: folding a new wave in costs O(wave) — bucket
  the wave, append its (sorted-within-file) vectors and stats partials.
"""

from __future__ import annotations

import os
from typing import List, Optional, Sequence

from pyspark.sql import DataFrame, SparkSession, Window, functions as F

from .similarity import (bucket_expr, cosine_topk, lsh_planes, norm,
                         probe_buckets)

VECTORS = "vectors"
STATS = "stats"


def _sub(path: str, name: str) -> str:
    return os.path.join(path, name)


def _bucketed(emb: DataFrame, id_col: str, vec_col: str,
              planes: List[List[float]]) -> DataFrame:
    return emb.select(
        F.col(id_col).alias("id"), F.col(vec_col).alias("v"),
        bucket_expr(F.col(vec_col), planes).alias("bucket"))


def write_ann_index(emb: DataFrame, path: str, id_col: str = "vec_id",
                    vec_col: str = "embedding",
                    planes: Optional[List[List[float]]] = None) -> None:
    """Build the persisted index from scratch (mode=overwrite)."""
    spark = emb.sparkSession
    planes = planes or lsh_planes()
    b = _bucketed(emb, id_col, vec_col, planes)
    (b.repartitionByRange("bucket").sortWithinPartitions("bucket")
      .write.mode("overwrite").parquet(_sub(path, VECTORS)))
    (spark.read.parquet(_sub(path, VECTORS))
        .groupBy("bucket").agg(F.count("*").alias("cnt"))
        .write.mode("overwrite").parquet(_sub(path, STATS)))


def append_to_ann_index(new_emb: DataFrame, path: str,
                        id_col: str = "vec_id", vec_col: str = "embedding",
                        planes: Optional[List[List[float]]] = None) -> None:
    """Fold a wave in: O(wave) — each appended file is sorted within
    itself, so row-group pruning keeps working per file; stats rows are
    appended as partials (readers SUM), never merged in place."""
    planes = planes or lsh_planes()
    b = _bucketed(new_emb, id_col, vec_col, planes)
    (b.repartitionByRange("bucket").sortWithinPartitions("bucket")
      .write.mode("append").parquet(_sub(path, VECTORS)))
    (b.groupBy("bucket").agg(F.count("*").alias("cnt"))
      .write.mode("append").parquet(_sub(path, STATS)))


def compact_ann_index(spark: SparkSession, path: str,
                      target_bytes: int = 128 * 1024 * 1024) -> dict:
    """Maintenance after K appended waves (VERDICT r5 #5): restores the
    single global bucket-sorted ``vectors/`` layout (per-wave appends
    keep pruning only per-file) and folds ``stats/`` partials to one row
    per bucket. Atomic per table; results identical before/after."""
    from engine.spark.sinks import atomic_rewrite, compact_sorted_parquet

    out = {}
    out[VECTORS] = compact_sorted_parquet(
        spark, _sub(path, VECTORS), ["bucket"], target_bytes)
    folded = (spark.read.parquet(_sub(path, STATS))
              .groupBy("bucket").agg(F.sum("cnt").cast("bigint").alias("cnt")))
    out[STATS] = atomic_rewrite(
        _sub(path, STATS),
        lambda tmp: (folded.repartitionByRange(1, "bucket")
                     .sortWithinPartitions("bucket")
                     .write.mode("overwrite").parquet(tmp)))
    return out


def index_occupancy(spark: SparkSession, path: str) -> DataFrame:
    """(bucket, cnt) with partials summed — the skew census."""
    return (spark.read.parquet(_sub(path, STATS))
            .groupBy("bucket").agg(F.sum("cnt").cast("bigint").alias("cnt")))


def probe_index(spark: SparkSession, path: str, query: Sequence[float],
                k: int = 10, probe_bits: int = 0,
                planes: Optional[List[List[float]]] = None) -> DataFrame:
    """Top-k by cosine among the P+1 probed buckets, straight off the
    persisted layout. Identical results to
    ``similarity.lsh_bucket_topk`` over the indexed corpus (equivalence
    test pins it) — but the corpus text/vector table is never rescanned
    and nothing shuffles: pushed-down IN filter, local top-k merge."""
    planes = planes or lsh_planes()
    probes = probe_buckets(query, planes, probe_bits)
    cand = (spark.read.parquet(_sub(path, VECTORS))
            .filter(F.col("bucket").isin(probes)))
    return cosine_topk(cand, query, k, id_col="id", vec_col="v")


#: Query waves above this row count fall back to a shuffle join instead of
#: a forced broadcast: vectors are wide (dim × float), so the cap is lower
#: than the dedup family's row cap — 500k × 64-dim doubles ≈ 256 MB.
#: With no hint, AQE still broadcasts at runtime when the wave is small.
MAX_BROADCAST_QUERIES = 500_000


def probe_index_batch(spark: SparkSession, path: str, queries: DataFrame,
                      k: int = 3, qid_col: str = "vec_id",
                      vec_col: str = "embedding",
                      planes: Optional[List[List[float]]] = None,
                      max_broadcast_queries: int = MAX_BROADCAST_QUERIES
                      ) -> DataFrame:
    """Home-bucket probe for a WAVE of query vectors: broadcast the
    bucketed wave against the pruned corpus scan (corpus is never
    shuffled), exact-cosine verify each collision, keep top-k per query.

    Returns (qid, id, score, rank) — self-matches (same id) excluded so
    indexing a corpus and probing it with itself yields neighbors, not
    identities.

    The wave is censused before broadcasting (VERDICT r5 #3): a wave
    past ``max_broadcast_queries`` joins without the hint — identical
    rows (equivalence test), memory bounded by the shuffle not the
    driver/executor broadcast build.
    """
    planes = planes or lsh_planes()
    from .dedup import _adopt_slot
    qb = _adopt_slot(
        "ann_probe_qb",
        (queries.select(F.col(qid_col).alias("qid"),
                        F.col(vec_col).alias("qv"))
         .withColumn("qbucket", bucket_expr(F.col("qv"), planes))
         .withColumn("qnrm", norm(F.col("qv"))))
        .persist())
    # census the PERSISTED probe side (ADVICE r6: counting the raw query
    # lineage evaluated it twice — once for the census, once in the join)
    bcast_ok = qb.count() <= max_broadcast_queries
    hint = F.broadcast if bcast_ok else (lambda df: df)
    idx = (spark.read.parquet(_sub(path, VECTORS))
           .withColumn("nrm", norm(F.col("v"))))
    j = idx.join(hint(qb),
                 (F.col("bucket") == F.col("qbucket"))
                 & (F.col("id") != F.col("qid")))
    dotprod = F.aggregate(
        F.zip_with(F.col("v").cast("array<double>"),
                   F.col("qv").cast("array<double>"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    scored = j.select(
        "qid", "id",
        F.round(dotprod / (F.col("nrm") * F.col("qnrm")), 6).alias("score"))
    rk = F.row_number().over(
        Window.partitionBy("qid").orderBy(F.col("score").desc(), "id"))
    return (scored.withColumn("rank", rk.cast("int"))
            .filter(F.col("rank") <= k))
