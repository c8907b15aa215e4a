"""Exact sequential funnel over an event stream.

Step k counts entities with a step-k event strictly AFTER their earliest
step-(k-1) completion — min-after semantics, the correct ordered funnel
(min-overall per step over-counts: a purchase before the first view is
not a conversion). One shuffle: per-entity per-step sorted ts lists
aggregate with map-side combine, then the step chain is pure array
algebra (element_at of a filtered sorted list).

Per-entity memory is its own event count. ``max_events`` is the hot-key
guard (the ``max_df``/``max_bucket`` house pattern): entities above it
are EXCLUDED from the funnel rather than sorting a bot's million-event
list inside one task — observable via ``funnel_user_census`` (how many
entities the cap would cut, and how many events they carry) before
choosing the cap.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, functions as F


def sequential_funnel(events: DataFrame, steps: Sequence[str],
                      by: str = "user_id", type_col: str = "event_type",
                      ts_col: str = "ts",
                      max_events: int | None = None) -> DataFrame:
    """One row: n_<step1>, n_<step1>_<step2>, ... cumulative-completion
    counts (each label joined by '_'), matching the inline driver-query
    spelling for the default 3-step case."""
    if len(steps) < 2:
        raise ValueError("a funnel needs at least 2 steps")
    ev = events.filter(F.col(type_col).isin(list(steps)))
    if max_events is not None:
        hot = (ev.groupBy(by).agg(F.count("*").alias("_ne"))
               .filter(F.col("_ne") > max_events).select(by))
        ev = ev.join(F.broadcast(hot), by, "left_anti")
    lst = lambda t: F.sort_array(F.collect_list(  # noqa: E731
        F.when(F.col(type_col) == t, F.col(ts_col))))
    per = ev.groupBy(by).agg(
        *[lst(t).alias(f"_l{i}") for i, t in enumerate(steps)])
    # F.get, not element_at: a user missing a step has an EMPTY list and
    # ANSI mode makes element_at throw on it (get returns NULL)
    after = lambda arr, t: F.get(  # noqa: E731
        F.filter(arr, lambda x: x > t), 0)
    cur = per.withColumn("_t0", F.get(F.col("_l0"), 0))
    for i in range(1, len(steps)):
        cur = cur.withColumn(f"_t{i}",
                             after(F.col(f"_l{i}"), F.col(f"_t{i - 1}")))
    names = []
    aggs = []
    for i in range(len(steps)):
        names.append("_".join(steps[:i + 1]))
        aggs.append(F.count(f"_t{i}").cast("bigint")
                    .alias(f"n_{names[i]}"))
    return cur.agg(*aggs)


def funnel_user_census(events: DataFrame, steps: Sequence[str],
                       max_events: int, by: str = "user_id",
                       type_col: str = "event_type") -> DataFrame:
    """Who would the ``max_events`` cap cut? One row:
    (n_entities, n_capped, capped_events) — run before picking the cap,
    the same observability contract as dedup's bucket census."""
    per = (events.filter(F.col(type_col).isin(list(steps)))
           .groupBy(by).agg(F.count("*").alias("_ne")))
    return per.agg(
        F.count("*").cast("bigint").alias("n_entities"),
        F.count(F.when(F.col("_ne") > max_events, 1)).cast("bigint")
         .alias("n_capped"),
        F.coalesce(F.sum(F.when(F.col("_ne") > max_events,
                                F.col("_ne"))), F.lit(0))
         .cast("bigint").alias("capped_events"))
