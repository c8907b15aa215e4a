"""Bucketed interval (range) join: points joined to the intervals that
contain them, WITHOUT a cartesian product.

Spark has no native fast path for a pure range predicate (``p BETWEEN s AND
e`` with no equality key plans as BroadcastNestedLoopJoin — quadratic work
and a broadcast of one whole side). The standard distributed strategy is to
quantize the join axis into fixed-width buckets: a point falls in exactly
one bucket, an interval is exploded to every bucket it covers, the join
becomes an equi-join on the bucket id, and the exact predicate re-filters
the candidates. Each matching (point, interval) pair meets in exactly one
bucket (the point's), so no distinct pass is needed afterwards.

Cost model: one explode of the intervals (rows × mean buckets-per-interval)
plus one hash equi-join; candidate volume is Σ_b |points_b| ×
|intervals covering b| — bounded when ``bucket_width`` is on the order of
the typical interval span. Mega-intervals (covering > ``max_buckets``
buckets) would blow up the explode, so they take a separate broadcast
branch: by assumption they are FEW (calendar-scale outliers in an
hour-scale workload — if a large fraction of intervals is "long", the
bucket width is simply wrong for the workload), and a broadcast
nested-loop against a handful of intervals is linear in the points.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F


def _bucket(ts: Column, width_s: int) -> Column:
    # floor-division of epoch microseconds — works for any monotone map of
    # the axis; the exact BETWEEN refilter uses the original values, so
    # bucket granularity affects cost only, never the result. The cast
    # admits TIMESTAMP_NTZ (parquet's default): NTZ→LTZ reads the wall
    # time in the session TZ, which is monotone — all bucketing needs.
    return F.floor(F.unix_micros(ts.cast("timestamp_ltz"))
                   / F.lit(int(width_s) * 1_000_000)).cast("long")


def interval_join(points: DataFrame, intervals: DataFrame,
                  point_col: str, start_col: str, end_col: str,
                  bucket_width_s: int = 3600,
                  max_buckets: int = 1000) -> DataFrame:
    """Inner-join ``points`` to every interval with
    ``start_col <= point_col <= end_col`` (timestamp columns; inclusive
    ends). Returns the point columns followed by the interval columns —
    names must not collide (caller renames).

    Null points or null/invalid intervals (start > end) never match, same
    as the SQL BETWEEN predicate.
    """
    if bucket_width_s < 1:
        raise ValueError(f"bucket_width_s must be >= 1, got {bucket_width_s}")
    p = F.col(point_col)
    s, e = F.col(start_col), F.col(end_col)
    iv = intervals.filter(s.isNotNull() & e.isNotNull() & (s <= e))
    n_cover = _bucket(e, bucket_width_s) - _bucket(s, bucket_width_s) + 1
    short_iv, long_iv = (iv.filter(n_cover <= max_buckets),
                         iv.filter(n_cover > max_buckets))

    pts = (points.filter(p.isNotNull())
           .withColumn("_b", _bucket(p, bucket_width_s)))
    exploded = short_iv.withColumn(
        "_b", F.explode(F.sequence(_bucket(s, bucket_width_s),
                                   _bucket(e, bucket_width_s))))
    fine = (pts.join(exploded, "_b")
            .filter(p.between(s, e)).drop("_b"))
    coarse = (points.filter(p.isNotNull())
              .join(F.broadcast(long_iv), p.between(s, e)))
    return fine.unionByName(coarse)
