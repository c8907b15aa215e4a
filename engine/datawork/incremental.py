"""Incremental MinHash dedup against a persisted corpus index.

A production pipeline ingests waves: the corpus already on disk has been
signed and bucketed once; a NEW wave must be deduplicated against it (and
against itself) WITHOUT re-reading the corpus text. This is the corpus-scale
analogue of the extraction pipeline's output-authoritative resume scans
(reference: batch_pdf_processor.py:2562-2625 skips completed stems; here the
persisted signature/bucket index is the "completed" state and each wave
joins against it instead of recomputing).

Index layout under ``<path>/``:

* ``sigs/``    — (id, mh0..mh{k-1}), one row per corpus doc. The only text
  -derived state; a wave never touches corpus text again.
* ``buckets/`` — (id, band, bucket), ``bands`` rows per doc, written
  range-partitioned + sorted by (band, bucket) so a wave's probe (a join
  against the wave's touched buckets) prunes parquet row groups by min/max
  statistics instead of scanning the full index.
* ``stats/``   — (band, bucket, cnt) ADDITIVE partial counts (appends write
  partial rows; readers aggregate). Only the wave's touched buckets are
  ever aggregated, after a broadcast semi-join.

Scale contract (the point of the design): per-wave cost is proportional to
the WAVE, not the corpus —

* wave text is shingled/signed once (the only CPU-heavy stage);
* the corpus side is touched exclusively through broadcast-driven scans:
  touched-bucket semi-join on ``buckets/`` (row-group-pruned), touched
  stats aggregation, and a broadcast semi-join on ``sigs/`` restricted to
  candidate ids — ZERO corpus-sized shuffles anywhere in the plan (plan
  test: tests/test_incremental.py pins no Exchange on the corpus scans);
* the hot-bucket guard is computed on COMBINED occupancy (persisted corpus
  counts + wave counts), so the kept/dropped bucket set — and therefore
  the pair set — is exactly the one a full recompute over old ∪ new would
  produce (the equivalence tests/oracle pin this).

Precondition (same as the rest of the dedup family): ids are unique per
row AND waves are disjoint from the indexed corpus — re-ingesting an
already-indexed id would double its signature rows.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, functions as F

from .dedup import (MINHASH_BANDS, MINHASH_K, _band_explode,
                    minhash_signatures)

SIGS = "sigs"
BUCKETS = "buckets"
STATS = "stats"


def _sub(path: str, name: str) -> str:
    return os.path.join(path, name)


def write_minhash_index(docs: DataFrame, path: str, id_col: str = "doc_id",
                        text_col: str = "text", n: int = 3,
                        k: int = MINHASH_K,
                        bands: int = MINHASH_BANDS) -> None:
    """Build the persisted index from scratch (mode=overwrite).

    The signature table is written first and READ BACK to derive buckets
    and stats — the k-min aggregation (the expensive part) runs exactly
    once, and the derived tables share the on-disk row values rather than
    a recomputed lineage."""
    spark = docs.sparkSession
    sigs = minhash_signatures(docs, id_col, text_col, n, k)
    sigs.write.mode("overwrite").parquet(_sub(path, SIGS))
    sigs_r = spark.read.parquet(_sub(path, SIGS))
    buckets = _band_explode(sigs_r, k, bands)
    # range-partition + sort by (band, bucket): parquet min/max row-group
    # statistics then prune a wave's touched-bucket probe to the few row
    # groups that can hold those keys (the persisted analogue of the
    # in-memory co-partitioned bucket cache, dedup._minhash_bucket_slot)
    (buckets.repartitionByRange("band", "bucket")
            .sortWithinPartitions("band", "bucket")
            .write.mode("overwrite").parquet(_sub(path, BUCKETS)))
    (spark.read.parquet(_sub(path, BUCKETS))
        .groupBy("band", "bucket").agg(F.count("*").alias("cnt"))
        .write.mode("overwrite").parquet(_sub(path, STATS)))


def append_to_index(new_docs: DataFrame, path: str, id_col: str = "doc_id",
                    text_col: str = "text", n: int = 3,
                    k: int = MINHASH_K,
                    bands: int = MINHASH_BANDS) -> None:
    """Fold an ingested wave into the index (cost ∝ wave size).

    Stats rows are appended as PARTIALS for the wave's buckets — merging
    counters in place would rewrite a corpus-sized table per wave; readers
    SUM over the few partial rows a touched bucket has instead."""
    spark = new_docs.sparkSession
    sigs = minhash_signatures(new_docs, id_col, text_col, n, k)
    sigs.write.mode("append").parquet(_sub(path, SIGS))
    # re-read ONLY this wave's ids to derive its buckets: cheaper to recompute
    # from the wave's in-memory lineage (1 row/doc) than to rescan the table
    buckets = _band_explode(sigs, k, bands)
    (buckets.repartitionByRange("band", "bucket")
            .sortWithinPartitions("band", "bucket")
            .write.mode("append").parquet(_sub(path, BUCKETS)))
    (buckets.groupBy("band", "bucket").agg(F.count("*").alias("cnt"))
        .write.mode("append").parquet(_sub(path, STATS)))


def incremental_verified_pairs(new_docs: DataFrame, index_path: str,
                               id_col: str = "doc_id",
                               text_col: str = "text", n: int = 3,
                               k: int = MINHASH_K,
                               bands: int = MINHASH_BANDS,
                               threshold: float = 0.5,
                               max_bucket: int = 100) -> DataFrame:
    """Verified near-dup pairs TOUCHING the new wave: wave×corpus +
    wave×wave, identical to ``minhash_verified_pairs(old ∪ new)`` filtered
    to pairs with ≥1 wave member (the exactness contract; see the module
    docstring for why the combined-occupancy guard makes this hold).

    Returns (id_a, id_b, est_jaccard, origin) with id_a < id_b and origin
    ∈ {'new_new', 'new_old'} (both-ids-in-wave vs one side indexed)."""
    spark = new_docs.sparkSession
    sig_new = minhash_signatures(new_docs, id_col, text_col, n, k).persist()
    b_new = _band_explode(sig_new, k, bands).persist()

    # the wave's probe set — small (≤ bands rows/doc), broadcast everywhere
    touched = b_new.select("band", "bucket").distinct()

    # corpus side: scans filtered by broadcast joins only (no shuffle)
    corpus_buckets = (spark.read.parquet(_sub(index_path, BUCKETS))
                      .join(F.broadcast(touched), ["band", "bucket"],
                            "left_semi"))
    corpus_stats = (spark.read.parquet(_sub(index_path, STATS))
                    .join(F.broadcast(touched), ["band", "bucket"],
                          "left_semi")
                    .groupBy("band", "bucket")
                    .agg(F.sum("cnt").alias("old_cnt")))

    # combined occupancy = persisted corpus count + wave count — the same
    # totals a full recompute over old ∪ new counts, restricted to touched
    # buckets (untouched buckets cannot produce wave pairs)
    new_cnt = b_new.groupBy("band", "bucket").agg(F.count("*").alias("new_cnt"))
    hot = (new_cnt.join(corpus_stats, ["band", "bucket"], "left_outer")
           .withColumn("cnt", F.coalesce("old_cnt", F.lit(0)) + F.col("new_cnt"))
           .filter(F.col("cnt") > max_bucket).select("band", "bucket"))

    b_new_cold = b_new.join(F.broadcast(hot), ["band", "bucket"], "left_anti")
    corpus_cold = corpus_buckets.join(F.broadcast(hot), ["band", "bucket"],
                                      "left_anti")

    nn = (b_new_cold.alias("a")
          .join(b_new_cold.alias("b"),
                (F.col("a.band") == F.col("b.band"))
                & (F.col("a.bucket") == F.col("b.bucket"))
                & (F.col("a.id") < F.col("b.id")))
          .select(F.col("a.id").alias("id_a"), F.col("b.id").alias("id_b")))
    no = (b_new_cold.alias("w")
          .join(corpus_cold.alias("c"),
                (F.col("w.band") == F.col("c.band"))
                & (F.col("w.bucket") == F.col("c.bucket")))
          .select(F.least(F.col("w.id"), F.col("c.id")).alias("id_a"),
                  F.greatest(F.col("w.id"), F.col("c.id")).alias("id_b")))
    cand = nn.unionByName(no).distinct()

    # verify via the signature estimate — corpus signatures are read ONLY
    # for candidate ids (broadcast semi-join: candidate volume ∝ wave)
    cand_ids = (cand.select(F.col("id_a").alias("id"))
                .unionByName(cand.select(F.col("id_b").alias("id")))
                .distinct())
    sig_old = (spark.read.parquet(_sub(index_path, SIGS))
               .join(F.broadcast(cand_ids), "id", "left_semi"))
    sig_all = sig_new.unionByName(sig_old)
    sa = sig_all.select(F.col("id").alias("id_a"),
                        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(k)])
    sb = sig_all.select(F.col("id").alias("id_b"),
                        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(k)])
    matches = sum(F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
                  for i in range(k))
    wave_ids = sig_new.select(F.col("id").alias("wid"))
    verified = (cand.join(sa, "id_a").join(sb, "id_b")
                .select("id_a", "id_b",
                        F.round(matches / F.lit(float(k)), 6)
                         .alias("est_jaccard"))
                .filter(F.col("est_jaccard") >= threshold))
    # origin is a function of wave membership, not of which candidate
    # branch produced the pair (both-in-wave pairs can also surface via
    # the wave×corpus join when ids overlap buckets — distinct() merged them)
    return (verified
            .join(F.broadcast(wave_ids.withColumnRenamed("wid", "id_a")
                              .withColumn("a_new", F.lit(True))),
                  "id_a", "left_outer")
            .join(F.broadcast(wave_ids.withColumnRenamed("wid", "id_b")
                              .withColumn("b_new", F.lit(True))),
                  "id_b", "left_outer")
            .select("id_a", "id_b", "est_jaccard",
                    F.when(F.coalesce("a_new", F.lit(False))
                           & F.coalesce("b_new", F.lit(False)),
                           F.lit("new_new")).otherwise(F.lit("new_old"))
                     .alias("origin")))
