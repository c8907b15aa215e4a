"""Physical-plan regression tests: the properties that make the engine hold
at 100 TB must be visible in the plan, not just asserted in prose —
predicate pushdown to the parquet scan, broadcast (never sort-merge) for the
small-side joins, and exactly one exchange for the salted extraction map."""

import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


def fmt(df) -> str:
    jvm = df.sparkSession._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    return df._jdf.queryExecution().explainString(mode)


def test_extraction_pushdown_and_single_shuffle(spark):
    from engine.spark.pipeline import extract_df
    src = spark.read.parquet(
        "/root/repo/data/synth/sf0.001/transcripts.parquet")
    plan = fmt(extract_df(src.filter(F.col("tool") == "ocr.markdown"),
                          salt_partitions=8))
    assert "EqualTo(tool,ocr.markdown)" in plan  # filter reached the scan
    # one Exchange for the salt repartition; a second only from AQE reuse
    assert plan.count("Exchange") <= 2
    assert "SortMergeJoin" not in plan


def test_small_dim_joins_broadcast(spark):
    import __spark_entry__ as entry
    plan = fmt(entry.q_top_customers(spark, SF))
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_pricing_summary_prunes_and_pushes(spark):
    import __spark_entry__ as entry
    plan = fmt(entry.q_pricing_summary(spark, SF))
    assert "LessThanOrEqual(l_shipdate" in plan   # pushed filter
    assert "l_orderkey" not in plan.split("ReadSchema")[1][:400]  # pruned
    assert plan.count("HashAggregate") >= 2       # partial + final


def test_resume_antijoin_broadcasts(spark):
    from engine.spark.udfs import bucket_col
    src = spark.read.parquet(
        "/root/repo/data/synth/sf0.001/transcripts.parquet")
    done = spark.createDataFrame([(1,), (2,)], "conv_bucket int")
    plan = fmt(src.withColumn("conv_bucket", bucket_col(1024))
               .join(F.broadcast(done), "conv_bucket", "left_anti"))
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan
    assert "SortMergeJoin" not in plan
