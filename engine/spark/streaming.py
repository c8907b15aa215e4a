"""Structured Streaming variant of the extraction pipeline.

The reference is pure batch (SURVEY.md §2.8) and the north rule needs batch
over a static table, but a transcript firehose is the natural streaming
source, and the extraction map is stateless per turn — so the SAME
mapInPandas kernel runs under readStream/writeStream unchanged:

    readStream(parquet dir) → extract (stateless Arrow map) → writeStream
    (parquet sink, checkpointLocation) with Trigger.AvailableNow for
    catch-up runs.

Streaming checkpointing subsumes the batch lineage for exactly-once file
sinks; watermarks/windows are NOT needed because there is no event-time
aggregation in the per-turn map (a conversation-level streaming rollup would
use a conv_id session window + watermark on ts — provided here as
``streaming_conversation_counts`` to pin that pattern down).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

from .schema import EXTRACTED_SCHEMA, TRANSCRIPT_SCHEMA
from .udfs import extract_batches


def read_transcript_stream(spark: SparkSession, input_dir: str,
                           max_files_per_trigger: int = 16) -> DataFrame:
    return (spark.readStream.schema(TRANSCRIPT_SCHEMA)
            .option("maxFilesPerTrigger", max_files_per_trigger)
            .parquet(input_dir))


def extract_stream(stream: DataFrame) -> DataFrame:
    """Same kernel, same schema — stateless, so it is streaming-safe."""
    return stream.mapInPandas(lambda it: extract_batches(it),
                              schema=EXTRACTED_SCHEMA)


def run_stream_to_parquet(spark: SparkSession, input_dir: str,
                          output_dir: str, checkpoint_dir: str,
                          available_now: bool = True):
    """Start (and with available_now=True, drain) the streaming job.
    Returns the StreamingQuery."""
    q = (extract_stream(read_transcript_stream(spark, input_dir))
         .writeStream
         .format("parquet")
         .option("path", output_dir)
         .option("checkpointLocation", checkpoint_dir))
    if available_now:
        q = q.trigger(availableNow=True)
    return q.start()


def streaming_conversation_counts(stream: DataFrame,
                                  watermark: str = "10 minutes") -> DataFrame:
    """Event-time pattern exemplar: late-tolerant per-conversation turn
    counts over 1-minute windows (watermark bounds state)."""
    return (stream
            .withWatermark("ts", watermark)
            .groupBy(F.window("ts", "1 minute"), F.col("conv_id"))
            .agg(F.count("*").alias("turns_in_window"),
                 F.sum(F.length("text")).alias("bytes_in_window")))
