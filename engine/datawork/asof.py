"""As-of join: for each left row, the latest right row at-or-before its
timestamp, per key.

Spark has no native as-of join; this is the standard union-sentinel
composition (no UDF): tag both sides, union, sort within a per-key window by
(time, side-order), carry the right side's payload forward with
``last(..., ignorenulls=True)``, keep left rows. One shuffle (the window),
same asymptotics as a sort-merge join. Skewed keys follow the same salting
escape hatch as any window (split key ranges by time bucket).
"""

from __future__ import annotations

from typing import List

from pyspark.sql import DataFrame, Window, functions as F


def asof_join(left: DataFrame, right: DataFrame, on: str, by: str,
              value_cols: List[str], suffix: str = "_asof") -> DataFrame:
    """Returns ``left`` plus, for each value column of ``right``, the value
    from the latest right row with ``right.on <= left.on`` within ``by``.

    Right rows sort before left rows at equal timestamps (side order 0 < 1),
    so an exact-tie right row IS visible to the left row — DuckDB's
    ``ASOF JOIN ... ON l.ts >= r.ts`` semantics."""
    l_tag = left.withColumn("_side", F.lit(1))
    for c in value_cols:
        l_tag = l_tag.withColumn(f"_r_{c}", F.lit(None).cast(right.schema[c].dataType))
    r_tag = right.select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        *[F.col(c).alias(f"_r_{c}") for c in value_cols])
    for col in l_tag.columns:
        if col not in r_tag.columns:
            r_tag = r_tag.withColumn(col, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    w = (Window.partitionBy(by).orderBy(F.col(on), F.col("_side"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned
    for c in value_cols:
        carried = carried.withColumn(
            f"{c}{suffix}", F.last(f"_r_{c}", ignorenulls=True).over(w))
    return (carried.filter(F.col("_side") == 1)
            .drop("_side", *[f"_r_{c}" for c in value_cols]))
