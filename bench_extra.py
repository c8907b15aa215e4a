"""Supplementary benchmarks (bench.py stays the FROZEN driver measurement).

Two additions the frozen harness cannot provide (guide §1.4, VERDICT r6 #3):

* noop-sink isolation: each requested query is timed with
  ``df.write.format("noop").mode("overwrite").save()`` — every column of
  every row computed, no sink cost, no count()-induced pruning — with
  interleaved best-of-N repeats so a one-off host stall cannot masquerade
  as a regression.
* ``extract_seconds_isolated``: the headline extraction phase timed
  best-of-N in a session that runs NOTHING else, beside bench.py's
  in-session number (which drifts with registry size).

Usage:
  python bench_extra.py                            # extract + default set
  BENCH_EXTRA_QUERIES=a,b python bench_extra.py    # chosen queries
  BENCH_EXTRA_REPEATS=3 python bench_extra.py

Prints one JSON line; never writes the frozen artifacts.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
BENCH_TURNS = int(os.environ.get("BENCH_TURNS", "120000"))
REPEATS = int(os.environ.get("BENCH_EXTRA_REPEATS", "3"))
DEFAULT_QUERIES = [
    "dedup_incremental", "corpus_curate", "corpus_curate_funnel",
    "embedding_incremental_pairs", "semdedup_wave_losers",
    "sft_pairs_budget_tokens", "conversation_documents",
    "dedup_minhash_verified",
]


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from engine.spark.pipeline import extract_df

    names = (os.environ["BENCH_EXTRA_QUERIES"].split(",")
             if os.environ.get("BENCH_EXTRA_QUERIES") else DEFAULT_QUERIES)

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("bench_extra")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    def noop(df) -> None:
        df.write.format("noop").mode("overwrite").save()

    # ---- isolated extraction throughput (best-of-N, nothing else ran) ----
    from bench import _transcripts_path
    src = spark.read.parquet(_transcripts_path(BENCH_TURNS))
    extract_df(src.limit(500)).count()  # warm JVM + python workers
    ex = []
    for _ in range(REPEATS):
        spark.sparkContext.setJobDescription("bench_extra: extract")
        t0 = time.monotonic()
        noop(extract_df(src, salt_partitions=CPUS * 4))
        ex.append(round(time.monotonic() - t0, 3))
    n_turns = src.count()

    # ---- interleaved best-of-N noop-sink query timings ----
    qs = entry.queries()
    samples: dict[str, list] = {n: [] for n in names}
    for rep in range(REPEATS):
        for name in names:
            spark.sparkContext.setJobDescription(
                f"bench_extra: {name} #{rep}")
            t0 = time.monotonic()
            try:
                noop(qs[name](spark, SF_DIR))
                samples[name].append(round(time.monotonic() - t0, 3))
            except Exception as exc:
                samples[name].append(f"error: {type(exc).__name__}")
    best = {n: (min(v) if all(isinstance(x, float) for x in v) else v)
            for n, v in samples.items()}

    print(json.dumps({
        "metric": "noop_isolated_seconds",
        "sf": SF_DIR,
        "cpus": CPUS,
        "repeats": REPEATS,
        "extract_turns": n_turns,
        "extract_seconds_isolated": min(ex),
        "extract_samples": ex,
        "queries_best": best,
        "queries_samples": samples,
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
