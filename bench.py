"""Benchmark driver: headline extraction throughput + query timings.

Prints ONE JSON line:
  {"metric": "turns_per_sec", "value": N, "unit": "sec",
   "queries": {...per-query seconds...}, "sf": ..., ...}

Env knobs:
  SPARK_GRAFT_SF_DIR   table dir (default /root/testdata/sf0.1)
  SPARK_GRAFT_CPUS     local[N] (default 32)
  BENCH_TURNS          transcript rows for the throughput section
                       (default 120000)

The headline metric is extraction throughput (turns/sec) over the seeded
synthetic transcript table — the workload BASELINE.json names. The reference
single-core anchor is the rule engine at ≈1,385 pages/s (BASELINE.md); the
scaling evidence (N vs 4N cores) lives in BENCH/BASELINE.md and is produced
by tools/bench_scaling.py.
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

# every queries() entry is timed (BENCH_QUERIES=None → all), so a regression
# in ANY driver query is visible round-over-round; override with a
# comma-separated BENCH_QUERIES env for quick local iteration
BENCH_QUERIES = (os.environ["BENCH_QUERIES"].split(",")
                 if os.environ.get("BENCH_QUERIES") else None)


def _transcripts_path(n_turns: int) -> str:
    cache = Path("/tmp/spark_graft_bench") / f"transcripts_{n_turns}.parquet"
    if not cache.exists():
        cache.parent.mkdir(parents=True, exist_ok=True)
        from tools import synth
        synth.write_parquet(str(cache), n_turns)
    # the extract_* queries resolve the same scale via _synth_dir — share the
    # generated file so a cold /tmp doesn't pay the python generator twice
    from tools.build_expected import TAG_TURNS
    tag = Path(SF_DIR).name
    tag_dir = Path("/tmp/spark_graft_synth") / tag
    tag_file = tag_dir / "transcripts.parquet"
    if TAG_TURNS.get(tag) == n_turns and not tag_file.exists():
        tag_dir.mkdir(parents=True, exist_ok=True)
        try:
            tag_file.symlink_to(cache)
        except OSError:
            import shutil
            shutil.copy(cache, tag_file)
    return str(cache)


def main() -> None:
    from pyspark.sql import SparkSession

    import __spark_entry__ as entry
    from engine.spark.pipeline import extract_df

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("bench")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    # ---- headline: extraction throughput over the transcript table ----
    src_path = _transcripts_path(BENCH_TURNS)
    src = spark.read.parquet(src_path)
    n = src.count()
    # warm-up (JVM + python workers) on a slice
    extract_df(src.limit(500)).count()
    t0 = time.monotonic()
    extracted = extract_df(src, salt_partitions=CPUS * 4)
    out_rows = extracted.count()
    extract_s = time.monotonic() - t0
    tput = out_rows / extract_s

    # ---- per-query timings at SF_DIR scale ----
    qs = entry.queries()
    timings = {}
    for name in (BENCH_QUERIES or list(qs)):
        t0 = time.monotonic()
        try:
            qs[name](spark, SF_DIR).count()
            timings[name] = round(time.monotonic() - t0, 3)
        except Exception as exc:  # keep the bench line intact
            timings[name] = f"error: {type(exc).__name__}"

    # phase split of the last end-to-end pipeline run (pipeline_lineage
    # executes one inside the loop above): extract+write is one fused
    # action; the split localizes a regression to resume scan / the fused
    # extract+write / wave-bounded lineage read-back / manifest write
    # without re-profiling (VERDICT r2 #8)
    from engine.spark import pipeline as _pipeline
    phases = (_pipeline.LAST_RUN_STATS.phases
              if _pipeline.LAST_RUN_STATS else None)

    # build/probe split of the dedup_incremental entry (its end-to-end
    # timing above includes a from-scratch index build every call; build
    # scales with the corpus, probe with the wave — report both so neither
    # masks a regression in the other)
    build_s = getattr(entry.q_dedup_incremental, "last_build_s", None)
    if phases is not None and build_s is not None \
            and isinstance(timings.get("dedup_incremental"), float):
        phases = dict(phases)
        phases["incremental_index_build"] = build_s
        phases["incremental_probe"] = round(
            timings["dedup_incremental"] - build_s, 3)

    # ingestion-proof correctness artifact (VERDICT r4 #5): the round-4
    # driver snapshot silently dropped 3 of 53 queries, so the bench entry
    # the driver DOES invoke now refreshes CORRECTNESS_SELF.json itself —
    # one row per queries() entry, checked against DuckDB at sf0.01 in a
    # subprocess (own Spark session; stdout swallowed so this function's
    # contract — exactly ONE JSON line — holds). BENCH_SELF_CHECK=0 skips.
    self_check = None
    if os.environ.get("BENCH_SELF_CHECK", "1") != "0":
        import subprocess
        res = subprocess.run(
            [sys.executable, str(REPO / "tools" / "check_oracles.py"),
             "--json", str(REPO / "CORRECTNESS_SELF.json")],
            cwd=str(REPO), capture_output=True, text=True, timeout=3600)
        lines = res.stdout.strip().splitlines() or [""]
        summary = next((l for l in reversed(lines) if "queries OK" in l),
                       lines[-1])
        self_check = {"ok": res.returncode == 0, "summary": summary}

    full = {
        "metric": "turns_per_sec",
        "value": round(tput, 1),
        "unit": "sec",
        "queries": timings,
        "pipeline_phases": phases,
        "sf": SF_DIR,
        "extract_turns": out_rows,
        "extract_seconds": round(extract_s, 2),
        "cpus": CPUS,
        "self_check": self_check,
    }
    # The driver records only a bounded TAIL of stdout: the r5 artifact's
    # single giant line lost its head (metric + half the timings) to that
    # capture and parsed as null (VERDICT r5 #7). The full artifact now
    # lives in a committed file; stdout carries a line small enough to
    # survive any tail window, with a fixed headline-query subset.
    with open(REPO / "BENCH_SELF.json", "w") as fh:
        json.dump(full, fh, indent=1, sort_keys=True)
        fh.write("\n")
    headline = [
        "extract_per_turn", "conversation_documents", "events_stream_window",
        "corpus_pack_shards", "corpus_curate", "corpus_curate_funnel",
        "dedup_incremental", "dedup_apply_full", "embedding_near_pairs",
        "embedding_near_pairs_lsh", "semdedup_losers", "corpus_dsir_select",
        "ann_ivf_topk", "ann_index_probe", "events_stream_join",
        "events_funnel", "pdf_payload_extract",
    ]
    print(json.dumps({
        "metric": "turns_per_sec",
        "value": round(tput, 1),
        "unit": "sec",
        "queries": {k: timings[k] for k in headline if k in timings},
        "queries_full": "BENCH_SELF.json",
        "n_queries": len(timings),
        "sf": SF_DIR,
        "extract_turns": out_rows,
        "extract_seconds": round(extract_s, 2),
        "cpus": CPUS,
        "self_check": self_check,
    }, separators=(",", ":")))


if __name__ == "__main__":
    main()
