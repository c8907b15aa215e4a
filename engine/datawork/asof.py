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
    # Carry ONE struct of all value columns, not each column independently —
    # independent last(ignorenulls) carries could stitch fields from two
    # different right rows whenever a value column is null (a row that never
    # existed). The struct is non-null iff a right row exists, so the carry
    # is atomic and null fields stay null, matching ASOF JOIN semantics.
    struct_type = "struct<" + ",".join(
        f"{c}:{right.schema[c].dataType.simpleString()}" for c in value_cols) + ">"
    l_tag = (left.withColumn("_side", F.lit(1))
             .withColumn("_r", F.lit(None).cast(struct_type)))
    # a right row with a NULL timestamp can never satisfy l.on >= r.on —
    # but nulls sort FIRST in the window, so it would otherwise be carried
    # into every left row; drop them up front
    r_tag = right.filter(F.col(on).isNotNull()).select(
        F.col(by), F.col(on), F.lit(0).alias("_side"),
        F.struct(*[F.col(c) for c in value_cols]).alias("_r"))
    for col in l_tag.columns:
        if col not in r_tag.columns:
            r_tag = r_tag.withColumn(col, F.lit(None))
    unioned = l_tag.unionByName(r_tag.select(l_tag.columns))

    # xxhash64(_r) as the final key makes the choice among right rows tied on
    # (by, on) deterministic across runs/partitionings (ASOF semantics leave
    # the tie choice unspecified; SQL engines pick arbitrarily)
    w = (Window.partitionBy(by)
         .orderBy(F.col(on), F.col("_side"), F.xxhash64("_r"))
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    carried = unioned.withColumn("_carried", F.last("_r", ignorenulls=True).over(w))
    out = carried.filter(F.col("_side") == 1)
    for c in value_cols:
        out = out.withColumn(f"{c}{suffix}", F.col("_carried")[c])
    return out.drop("_side", "_r", "_carried")
