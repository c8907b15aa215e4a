"""Checkpoint/lineage resume contract (FIXTURES.md §3.2): a re-run of the same
run_id processes zero turns and produces zero duplicate output rows; a fresh
run over the same output dir under a new run_id reprocesses everything."""

import pytest

from tools import synth


@pytest.fixture(scope="module")
def paths(tmp_path_factory):
    base = tmp_path_factory.mktemp("resume")
    src = str(base / "tx.parquet")
    synth.write_parquet(src, 300)
    return src, str(base / "out")


def test_resume_is_idempotent(spark, paths):
    from engine.spark.pipeline import run_pipeline

    src, out = paths
    n_src = spark.read.parquet(src).count()

    first = run_pipeline(spark, src, out, run_id="runA", waves=3, n_buckets=64)
    assert first.turns_processed == n_src
    assert first.turns_skipped_resume == 0

    second = run_pipeline(spark, src, out, run_id="runA", waves=3, n_buckets=64)
    assert second.turns_processed == 0
    assert second.turns_skipped_resume == n_src

    extracted = spark.read.parquet(f"{out}/extracted_turns")
    assert extracted.count() == n_src
    assert extracted.select("conv_id", "turn_idx").distinct().count() == n_src

    lineage = spark.read.parquet(f"{out}/lineage")
    rows = lineage.collect()
    assert all(r["run_id"] == "runA" for r in rows)
    assert sum(r["turns_processed"] for r in rows) == n_src
    assert all(r["extraction_failures"] == 0 for r in rows)
    assert all(r["bytes_parsed"] > 0 for r in rows)

    # file layout: one data file per bucket (no partitionBy explosion) and
    # one manifest row per bucket
    from pathlib import Path
    n_files = len(list(Path(f"{out}/extracted_turns").rglob("*.parquet")))
    n_buckets = extracted.select("conv_bucket").distinct().count()
    assert n_files == n_buckets
    assert len(rows) == n_buckets


def test_crash_between_output_and_lineage_commit(spark, paths, tmp_path):
    """The resume authority is the OUTPUT table: output committed but lineage
    missing (crash in the window between the two commits) must not be
    reprocessed — and the manifest is backfilled from the output."""
    import shutil

    from engine.spark.pipeline import run_pipeline

    src, _ = paths
    out = str(tmp_path / "out")
    n_src = spark.read.parquet(src).count()

    run_pipeline(spark, src, out, run_id="runC", waves=2, n_buckets=64)
    shutil.rmtree(f"{out}/lineage")  # simulate the crash window

    redo = run_pipeline(spark, src, out, run_id="runC2", waves=2, n_buckets=64)
    assert redo.turns_processed == 0  # nothing reprocessed → no dup risk

    extracted = spark.read.parquet(f"{out}/extracted_turns")
    assert extracted.count() == n_src
    lineage = spark.read.parquet(f"{out}/lineage")
    rows = lineage.collect()
    assert all(r["wave"] == -1 for r in rows)  # backfilled
    assert sum(r["turns_processed"] for r in rows) == n_src


def test_bucket_is_process_stable(spark, paths):
    """kernel-side md5 bucket == SQL-side bucket expression, so resume
    anti-joins agree with what the kernel wrote."""
    from pyspark.sql import functions as F

    from engine.spark.udfs import bucket_col, stable_bucket

    src, _ = paths
    df = (spark.read.parquet(src).select("conv_id").distinct()
          .withColumn("sql_bucket", bucket_col(64)))
    for r in df.collect():
        assert r["sql_bucket"] == stable_bucket(r["conv_id"], 64)


def test_iceberg_sink_gated_with_clear_error(spark, tmp_path):
    """table_format='iceberg' must fail fast and actionably when the runtime
    lacks the Iceberg jars (this sandbox), not half-write anything."""
    import pytest

    from engine.spark.sinks import TableSink

    with pytest.raises(RuntimeError, match="iceberg-spark-runtime"):
        TableSink(spark, "cat.db.t", "iceberg")
    with pytest.raises(ValueError, match="table_format"):
        TableSink(spark, str(tmp_path), "orc")
    assert (tmp_path / "nothing").exists() is False


def test_parquet_sink_roundtrip(spark, tmp_path):
    from engine.spark.sinks import TableSink

    sink = TableSink(spark, str(tmp_path / "t"), "parquet",
                     partition_col="b")
    df = spark.createDataFrame([(1, 0), (2, 1)], "x int, b int")
    sink.append(df)
    sink.append(df)
    assert sink.read().count() == 4


def test_compact_parquet_preserves_content_and_partitions(spark, tmp_path):
    """Compaction shrinks the file count, preserves every row, keeps the
    partition layout usable, and a post-compaction resume still sees all
    buckets as done (content-identical table)."""
    import pyspark.sql.functions as F
    from engine.spark.sinks import compact_parquet
    out = str(tmp_path / "t")
    df = spark.range(0, 2000).select(
        F.col("id"), (F.col("id") % 4).cast("int").alias("part"))
    # fragment: 40 appends of 50 rows each
    for i in range(40):
        (df.filter((F.col("id") >= i * 50) & (F.col("id") < (i + 1) * 50))
           .write.mode("append").partitionBy("part").parquet(out))
    before = spark.read.parquet(out)
    rows_before = sorted((r["id"], r["part"]) for r in before.collect())
    stats = compact_parquet(spark, out, target_bytes=10**9,
                            partition_col="part")
    assert stats["files_after"] < stats["files_before"]
    after = spark.read.parquet(out)
    assert sorted((r["id"], r["part"]) for r in after.collect()) == rows_before
    # partition pruning still works (directory layout preserved)
    assert after.filter(F.col("part") == 2).count() == 500
    import pathlib
    assert any(p.name.startswith("part=") for p in
               pathlib.Path(out).iterdir())


def test_atomic_rewrite_crash_recovery(tmp_path, spark):
    """A crash between atomic_rewrite's two renames leaves the data in
    .prerewrite-* with nothing published; recover_rewrite restores it,
    and the next atomic_rewrite call self-recovers too (ADVICE r6 #1)."""
    import shutil

    from engine.spark.sinks import atomic_rewrite, recover_rewrite

    root = tmp_path / "idx"
    spark.range(10).write.parquet(str(root))
    # simulate the crash window: root moved aside, replacement not yet in
    shutil.move(str(root), str(tmp_path / "idx.prerewrite-deadbeef"))
    assert not root.exists()
    assert recover_rewrite(str(root)) is True
    assert spark.read.parquet(str(root)).count() == 10
    assert recover_rewrite(str(root)) is False  # no-op when healthy

    # self-recovery on the next rewrite call
    shutil.move(str(root), str(tmp_path / "idx.prerewrite-cafe0001"))
    out = atomic_rewrite(
        str(root),
        lambda tmp: spark.range(10).coalesce(1)
        .write.mode("overwrite").parquet(tmp))
    assert out["files_after"] >= 1
    assert spark.read.parquet(str(root)).count() == 10
