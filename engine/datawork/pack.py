"""Token-budget shard packing — a distributed prefix sum over the corpus.

Training-data pipelines serialize a corpus as one concatenated token stream
cut into fixed-budget shards (sequence-packing); each document's shard is
``floor(start_offset / budget)`` where start_offset is the running token
total of every document before it in a deterministic order. The naive Spark
spelling — ``sum().over(Window.orderBy(id))`` with no partitionBy — moves
the ENTIRE corpus into one partition (Spark even warns), so this implements
the classic two-level scan instead:

1. ``repartitionByRange(id)`` + ``sortWithinPartitions(id)`` — ONE shuffle;
   range partition k holds ids strictly below partition k+1's.
2. per-partition running totals via ``mapInPandas`` (narrow, Arrow-batched,
   order-preserving — no Window, hence no Exchange for the
   constant-per-partition key).
3. per-partition sums → driver (``n_partitions`` rows, the only collect),
   exclusive prefix there, broadcast back as a tiny (pid, offset) table.

Cost at any scale: one range shuffle + one broadcast join; memory per task
is one Arrow batch. Output is independent of where the range sampler puts
partition boundaries (prefix sums are associative), so the result is
deterministic even though the boundaries need not be. The partitioned
cumsum table is persisted via the dedup cache-slot registry — REQUIRED for
cost (the totals job and the final projection share it), while output
correctness holds either way since the offsets join keys on the pid each
row actually carries.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import LongType, StructField, StructType


def pack_shards(docs: DataFrame, budget: int, id_col: str = "doc_id",
                tokens: Optional[Column] = None,
                num_partitions: Optional[int] = None) -> DataFrame:
    """(id, n_tokens, start_offset, shard_id) for concat-stream packing of
    ``docs`` ordered by ``id_col`` into shards of ``budget`` tokens.

    ``tokens`` is the per-doc token-count expression. Default (None): the
    REAL frozen-merges BPE count (tokenize.with_bpe_tokens) — token budgets
    are the currency of training-data work, so the shard cut must use the
    tokenizer's arithmetic, not a proxy (VERDICT r5 #4). Pass
    ``textstats.token_count_bpe(F.col("text"))`` explicitly to get the
    cheap regex token-class proxy back (useful when the text will be
    tokenized by an unknown downstream tokenizer anyway). ``id_col`` must
    be non-null and unique (the dedup family's contract); the stream order
    is ascending ``id_col``. NULL token counts pack as 0.
    """
    from .dedup import _cache_slot

    if budget < 1:
        raise ValueError(f"budget must be >= 1, got {budget}")
    if tokens is None:
        from .tokenize import with_bpe_tokens
        docs = with_bpe_tokens(docs.select(F.col(id_col), F.col("text")))
        tokens = F.col("n_tokens")
    spark = docs.sparkSession
    n_part = num_partitions or spark.sparkContext.defaultParallelism

    base = docs.select(
        F.col(id_col).alias("id"),
        F.coalesce(tokens.cast("bigint"), F.lit(0)).alias("n_tokens"))
    parted = (base.repartitionByRange(n_part, "id")
              .sortWithinPartitions("id")
              .withColumn("_pid", F.spark_partition_id()))

    cum_schema = StructType(parted.schema.fields +
                            [StructField("_cum", LongType(), False)])

    def _running(batches):
        run = 0
        for pdf in batches:  # Arrow batches arrive in partition row order
            c = pdf["n_tokens"].cumsum() + run
            if len(c):
                run = int(c.iloc[-1])
            pdf["_cum"] = c
            yield pdf

    local = _cache_slot("pack_cumsum",
                        parted.mapInPandas(_running, schema=cum_schema))
    totals = (local.groupBy("_pid").agg(F.sum("n_tokens").alias("t"))
              .collect())
    offsets, acc = [], 0
    for row in sorted(totals, key=lambda r: r["_pid"]):
        offsets.append((row["_pid"], acc))
        acc += row["t"]
    off_df = spark.createDataFrame(offsets or [(0, 0)],
                                   "`_pid` int, `_off` bigint")
    start = F.col("_off") + F.col("_cum") - F.col("n_tokens")
    return (local.join(F.broadcast(off_df), "_pid")
            .select(F.col("id").alias(id_col), "n_tokens",
                    start.alias("start_offset"),
                    F.floor(start / F.lit(int(budget)))
                    .cast("int").alias("shard_id")))
