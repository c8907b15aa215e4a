"""Streaming variant: same kernel under readStream/writeStream produces the
same rows as the batch pipeline, exactly once, with checkpointed resume."""

import pytest

from tools import synth


@pytest.fixture(scope="module")
def stream_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("stream")
    src = base / "in"
    src.mkdir()
    synth.write_parquet(str(src / "part1.parquet"), 150)
    return base, src


def test_streaming_matches_batch(spark, stream_dirs):
    from engine.spark.pipeline import extract_df
    from engine.spark.streaming import run_stream_to_parquet

    base, src = stream_dirs
    out, ckpt = str(base / "out"), str(base / "ckpt")

    q = run_stream_to_parquet(spark, str(src), out, ckpt)
    q.awaitTermination(120)

    got = spark.read.parquet(out)
    batch = extract_df(spark.read.parquet(str(src)))
    assert got.count() == batch.count()

    g = {(r["conv_id"], r["turn_idx"]): r["cleaned_text"]
         for r in got.collect()}
    b = {(r["conv_id"], r["turn_idx"]): r["cleaned_text"]
         for r in batch.collect()}
    assert g == b


def test_streaming_checkpoint_no_reprocess_and_new_files(spark, stream_dirs):
    from engine.spark.streaming import run_stream_to_parquet

    base, src = stream_dirs
    out, ckpt = str(base / "out"), str(base / "ckpt")

    n_before = spark.read.parquet(out).count()
    # restart with no new files → nothing reprocessed
    q = run_stream_to_parquet(spark, str(src), out, ckpt)
    q.awaitTermination(120)
    assert spark.read.parquet(out).count() == n_before

    # new arrivals → only the delta is processed
    synth.write_parquet(str(src / "part2.parquet"), 60)
    extra = spark.read.parquet(str(src / "part2.parquet")).count()
    q = run_stream_to_parquet(spark, str(src), out, ckpt)
    q.awaitTermination(120)
    after = spark.read.parquet(out)
    assert after.count() == n_before + extra
    keyed = after.select("conv_id", "turn_idx").distinct().count()
    # part2 regenerates the same conversations (same seed) → duplicates by
    # key are EXPECTED across files; exactly-once is per input file
    assert keyed <= after.count()


def test_windowed_conversation_counts_end_to_end(spark, stream_dirs):
    """Event-time windowed agg with watermark, drained via availableNow into
    a memory sink, compared against the equivalent batch aggregation."""
    from pyspark.sql import functions as F

    from engine.spark.streaming import (read_transcript_stream,
                                        streaming_conversation_counts)
    _, src = stream_dirs
    agg = streaming_conversation_counts(read_transcript_stream(spark, str(src)))
    assert agg.isStreaming
    q = (agg.writeStream.format("memory").queryName("conv_counts")
         .outputMode("complete").trigger(availableNow=True).start())
    q.awaitTermination(120)

    got = {(r["conv_id"], r["window"]["start"]): r["turns_in_window"]
           for r in spark.sql("select * from conv_counts").collect()}
    batch = (spark.read.parquet(str(src))
             .groupBy(F.window("ts", "1 minute"), F.col("conv_id"))
             .agg(F.count("*").alias("n")))
    exp = {(r["conv_id"], r["window"]["start"]): r["n"]
           for r in batch.collect()}
    assert got == exp and len(got) > 0


def test_stateful_sessionize_carries_state_across_microbatches(spark, tmp_path):
    """A session whose events span two files (→ two availableNow
    micro-batches with maxFilesPerTrigger=1) must come out as ONE session:
    the open session lives in the state store between triggers."""
    from pyspark.sql import functions as F

    from engine.spark.streaming import stateful_sessionize

    stage = str(tmp_path / "in")
    schema = "user_id int, event_id int, ts timestamp, value double"
    f1 = spark.createDataFrame(
        [(1, 10, "2024-01-01 00:00:00", 1.0),
         (1, 11, "2024-01-01 00:02:00", 2.0),     # same session, batch 1
         (2, 20, "2024-01-01 00:00:00", 5.0)],
        "user_id int, event_id int, ts string, value double"
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
             "value")
    f2 = spark.createDataFrame(
        [(1, 12, "2024-01-01 00:04:00", 4.0),     # continues user 1 session
         (1, 13, "2024-01-01 01:00:00", 8.0),     # new session (gap > 300 s)
         (1, -1, "2024-01-01 09:00:00", 0.0),     # flush sentinels
         (2, -1, "2024-01-01 09:00:00", 0.0)],
        "user_id int, event_id int, ts string, value double"
    ).select("user_id", "event_id", F.col("ts").cast("timestamp").alias("ts"),
             "value")
    from engine.spark.streaming import stage_ordered_batches
    stage_ordered_batches([f1, f2], stage)

    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .option("maxFilesPerTrigger", "1").parquet(stage))
    q = (stateful_sessionize(stream, gap_s=300)
         .writeStream.format("memory").queryName("sess_carry_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {(r["user_id"], r["session_id"]): (r["n_events"], r["value_sum"])
            for r in spark.table("sess_carry_sink").collect()}
    assert rows == {
        (1, 1): (3, 7.0),   # 3 events ACROSS the batch boundary, one session
        (1, 2): (1, 8.0),
        (2, 1): (1, 5.0),
    }

def test_stateful_sessionize_numbering_survives_sentinel(spark, tmp_path):
    """Events arriving AFTER a flush sentinel (a later micro-batch) must
    continue the user's session numbering — a reset would emit a duplicate
    (user_id, session_id) key into the append-mode sink."""
    from pyspark.sql import functions as F

    from engine.spark.streaming import stage_ordered_batches, stateful_sessionize

    stage = str(tmp_path / "in")
    schema = "user_id int, event_id int, ts timestamp, value double"

    def batch(rows):
        return spark.createDataFrame(
            rows, "user_id int, event_id int, ts string, value double"
        ).select("user_id", "event_id",
                 F.col("ts").cast("timestamp").alias("ts"), "value")

    stage_ordered_batches([
        batch([(1, 10, "2024-01-01 00:00:00", 1.0)]),
        batch([(1, -1, "2024-01-01 01:00:00", 0.0)]),   # flush
        batch([(1, 20, "2024-01-01 02:00:00", 3.0),     # user reappears
               (1, -1, "2024-01-01 09:00:00", 0.0)]),
    ], stage)

    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet")
              .option("maxFilesPerTrigger", "1").parquet(stage))
    q = (stateful_sessionize(stream, gap_s=300)
         .writeStream.format("memory").queryName("sess_sentinel_sink")
         .outputMode("append").trigger(availableNow=True).start())
    q.awaitTermination()
    rows = {(r["user_id"], r["session_id"]): (r["n_events"], r["value_sum"])
            for r in spark.table("sess_sentinel_sink").collect()}
    assert rows == {(1, 1): (1, 1.0), (1, 2): (1, 3.0)}  # 2, not 1 again

def test_stateful_sessionize_timeout_evicts_idle_sessions(spark, tmp_path):
    """VERDICT r3 #7: the ProcessingTimeTimeout variant — the unbounded-
    deployment eviction path, so the test runs it the unbounded way: ONE
    continuously-running query (processing-time timeouts keep scheduling
    no-data batches, so an availableNow drain would never terminate),
    polled until the evictions land, then stopped. A user idle past the
    horizon has the open session emitted EXACTLY ONCE and the state row
    removed; a second staged file proves eviction keeps firing for later
    arrivals within the same run."""
    import os
    import time

    from pyspark.sql import functions as F

    from engine.spark.streaming import stage_ordered_batches, stateful_sessionize

    stage = str(tmp_path / "in")
    ckpt = str(tmp_path / "ckpt")
    out = str(tmp_path / "out")
    schema = "user_id int, event_id int, ts timestamp, value double"

    def batch(rows):
        return spark.createDataFrame(
            rows, "user_id int, event_id int, ts string, value double"
        ).select("user_id", "event_id",
                 F.col("ts").cast("timestamp").alias("ts"), "value")

    def add_file(df, name):
        tmp = str(tmp_path / ("stage_" + name))
        df.coalesce(1).write.mode("overwrite").parquet(tmp)
        [part] = [p for p in os.listdir(tmp) if p.endswith(".parquet")]
        os.rename(os.path.join(tmp, part), os.path.join(stage, name))

    def sink_rows():
        got = spark.read.schema(
            "user_id int, session_id bigint, n_events bigint, "
            "value_sum double, session_start long").parquet(out)
        return sorted((r["user_id"], r["session_id"], r["n_events"],
                       r["value_sum"], r["session_start"])
                      for r in got.collect())

    def poll_until(pred, deadline_s=90):
        t0 = time.monotonic()
        while time.monotonic() - t0 < deadline_s:
            if pred(sink_rows()):
                return
            time.sleep(0.5)
        raise AssertionError(f"sink never satisfied: {sink_rows()}")

    stage_ordered_batches([
        batch([(1, 10, "2024-01-01 00:00:00", 1.0),
               (2, 20, "2024-01-01 00:00:00", 5.0)])], stage)
    stream = (spark.readStream.schema(schema)
              .option("pathGlobFilter", "*.parquet").parquet(stage))
    q = (stateful_sessionize(stream, gap_s=300, timeout_ms=50)
         .writeStream.format("parquet").option("path", out)
         .option("checkpointLocation", ckpt)
         .outputMode("append").start())
    try:
        # both users idle past 50 ms → evicted, open sessions emitted
        poll_until(lambda rows: len(rows) >= 2)
        # a later arrival opens a fresh session and is evicted in turn
        add_file(batch([(3, 30, "2024-01-01 00:00:00", 7.0)]),
                 "batch-0001.parquet")
        poll_until(lambda rows: len(rows) >= 3)
        # user 1 REAPPEARS after eviction: numbering restarts at 1 (the
        # documented timeout-mode contract), but session_start keeps the
        # sink rows uniquely keyed (ADVICE r4)
        add_file(batch([(1, 40, "2024-01-01 01:00:00", 9.0)]),
                 "batch-0002.parquet")
        poll_until(lambda rows: len(rows) >= 4)
    finally:
        q.stop()
    rows = sink_rows()
    # exactly once each (state removed on eviction → can never re-fire),
    # correct aggregates, no duplicates
    assert [r[:4] for r in rows] == [
        (1, 1, 1, 1.0), (1, 1, 1, 9.0), (2, 1, 1, 5.0), (3, 1, 1, 7.0)]
    # session_start disambiguates the duplicated (user_id, session_id) key
    u1_starts = {r[4] for r in rows if r[0] == 1}
    assert len(u1_starts) == 2 and all(s is not None for s in u1_starts)
    # same-instant sessions share the start epoch across users
    assert rows[0][4] == rows[2][4] == rows[3][4] == rows[1][4] - 3600


def test_stream_dedup_drops_replayed_tail(spark):
    """The staged input feeds MORE rows than the events table (the replayed
    tail); the drained aggregate must equal exactly-once counts."""
    import __spark_entry__ as entry

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: (r["n"], r["value_sum"])
           for r in entry.q_events_stream_dedup(spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet")
    total = ev.count()
    assert sum(n for n, _ in got.values()) == total  # exactly-once
    # and the replay was non-empty (≥1 event in the last 30 minutes)
    from pyspark.sql import functions as F
    mx = ev.agg(F.max("ts").alias("m")).first()["m"]
    replayed = ev.filter(
        F.col("ts") >= F.lit(mx) - F.expr("INTERVAL 30 MINUTES")).count()
    assert replayed >= 1


def test_stream_stream_join_matches_across_microbatches(spark, tmp_path):
    """A click in micro-batch 1 must still match a purchase arriving in
    micro-batch 2 (join state holds the click until watermark + bound
    passes), and pairs must emit exactly once. Two staged files +
    maxFilesPerTrigger=1 force real batch boundaries."""
    import datetime as dt

    from pyspark.sql import functions as F

    from engine.spark.streaming import stage_ordered_batches

    T = lambda m: dt.datetime(2024, 1, 1, 10, m)
    b1 = spark.createDataFrame(
        [(1, 7, T(0), "click", 0.0),      # matches purchase in batch 2
         (2, 8, T(5), "click", 0.0),
         (3, 8, T(7), "purchase", 5.0)],  # same-batch match for click 2
        "event_id int, user_id int, ts timestamp, "
        "event_type string, value double")
    b2 = spark.createDataFrame(
        [(4, 7, T(30), "purchase", 9.0),   # cross-batch match for click 1
         (5, 7, T(59), "purchase", 2.0),   # second match for click 1
         (6, 9, T(40), "purchase", 1.0)],  # no click → no pair
        b1.schema)
    stage = str(tmp_path / "stage")
    stage_ordered_batches([b1, b2], stage)

    def side(et, p):
        s = (spark.readStream.schema(b1.schema)
             .option("pathGlobFilter", "*.parquet")
             .option("maxFilesPerTrigger", "1").parquet(stage)
             .filter(F.col("event_type") == et))
        return (s.select(F.col("user_id").alias(f"{p}_user"),
                         F.col("ts").cast("timestamp_ltz")
                          .alias(f"{p}_ts"),
                         F.col("event_id").alias(f"{p}_id"))
                .withWatermark(f"{p}_ts", "1 hour"))

    joined = side("click", "c").join(
        side("purchase", "p"),
        (F.col("c_user") == F.col("p_user"))
        & (F.col("p_ts") >= F.col("c_ts"))
        & (F.col("p_ts") <= F.col("c_ts") + F.expr("INTERVAL 1 HOUR")))
    q = (joined.writeStream.format("memory")
         .queryName("ss_join_test_sink").outputMode("append")
         .trigger(availableNow=True).start())
    q.awaitTermination(120)
    got = sorted((r["c_id"], r["p_id"])
                 for r in spark.table("ss_join_test_sink").collect())
    assert got == [(1, 4), (1, 5), (2, 3)]
