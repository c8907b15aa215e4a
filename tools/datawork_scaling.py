"""Two-parallelism scaling for a SHUFFLE-BOUND datawork job (the
extraction headline in bench_scaling.py is map-bound; the north rule's
N-vs-4N criterion deserves evidence on both shapes).

Job: MinHash-LSH candidates → signature-verified pairs over the
curation-soak corpus — shingle explode, k-min signature aggregate,
band-bucket self-join, verify. Same interleaved best-of-R protocol as
bench_scaling.py (host drift is ±25% and asymmetric); results are
appended to BENCH/BASELINE.md by hand (this tool prints the JSON).

Usage: python tools/datawork_scaling.py [--copies 20] [--n 2] [--reps 2]
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))

WORKER = r"""
import json, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import SparkSession
from engine.datawork.dedup import minhash_verified_pairs

cpus = int(sys.argv[1]); src_path = sys.argv[2]
spark = (SparkSession.builder.master(f"local[{{cpus}}]")
         .config("spark.sql.shuffle.partitions", str(cpus * 2))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.driver.memory", "24g")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(src_path)
t0 = time.monotonic()
n = minhash_verified_pairs(docs, threshold=0.5).count()
dt = time.monotonic() - t0
print(json.dumps({{"cpus": cpus, "pairs": n, "seconds": dt,
                   "tput": n / dt}}))
"""


def run_level(cpus: int, src: str) -> dict:
    script = WORKER.format(repo=str(REPO))
    out = subprocess.run([sys.executable, "-c", script, str(cpus), src],
                         capture_output=True, text=True, timeout=3600)
    line = out.stdout.strip().splitlines()[-1]
    return json.loads(line)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--copies", type=int, default=20)
    ap.add_argument("--n", type=int, default=2)
    ap.add_argument("--reps", type=int, default=2)
    ap.add_argument("--sf", default="/root/testdata/sf0.1")
    args = ap.parse_args()

    from pyspark.sql import SparkSession
    from tools.curation_stress import build_corpus
    spark = (SparkSession.builder.master("local[8]")
             .config("spark.ui.enabled", "false").getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")
    src = f"/tmp/spark_graft_cura_{args.copies}x"
    build_corpus(spark, args.sf, args.copies, src)
    n_docs = spark.read.parquet(src).count()
    spark.stop()

    small_runs, big_runs = [], []
    for i in range(args.reps):
        small_runs.append(run_level(args.n, src))
        big_runs.append(run_level(args.n * 4, src))
        print(f"rep {i + 1}/{args.reps}: "
              f"N={small_runs[-1]['seconds']:.1f}s "
              f"4N={big_runs[-1]['seconds']:.1f}s", flush=True)
    small = max(small_runs, key=lambda r: r["tput"])
    big = max(big_runs, key=lambda r: r["tput"])
    eff = big["tput"] / (4 * small["tput"])
    print(json.dumps({
        "job": "minhash_verified_pairs", "n_docs": n_docs,
        "pairs": small["pairs"],
        "n_cores": args.n, "n_seconds": round(small["seconds"], 2),
        "4n_cores": args.n * 4, "4n_seconds": round(big["seconds"], 2),
        "scaling_efficiency": round(eff, 3),
        "n_seconds_all": [round(r["seconds"], 1) for r in small_runs],
        "4n_seconds_all": [round(r["seconds"], 1) for r in big_runs]}))


if __name__ == "__main__":
    main()
