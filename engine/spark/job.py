"""spark-submit entry point.

    spark-submit --py-files engine.zip engine/spark/job.py \
        --input <transcripts parquet/iceberg path> \
        --output <dir> --run-id <id> [--waves 4] [--buckets 1024] \
        [--salt-partitions N]

Also runnable as ``python -m engine.spark.job`` for local smoke (builds its
own local[*] session). Package with ``python tools/package.py`` → engine.zip.
"""

from __future__ import annotations

import argparse
import sys


def build_session(master: str | None = None, app: str = "transcript-extract",
                  shuffle_partitions: int = 32, driver_memory: str = "8g"):
    from pyspark.sql import SparkSession
    b = (SparkSession.builder.appName(app)
         .config("spark.driver.memory", driver_memory)
         .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
         .config("spark.sql.adaptive.skewJoin.enabled", "true")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
         .config("spark.sql.parquet.compression.codec", "zstd"))
    if master:
        b = b.master(master)
    return b.getOrCreate()


def main(argv=None) -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--run-id", required=True)
    ap.add_argument("--waves", type=int, default=4)
    ap.add_argument("--buckets", type=int, default=1024)
    ap.add_argument("--salt-partitions", type=int, default=None)
    ap.add_argument("--table-format", default="parquet",
                    choices=["parquet", "iceberg"],
                    help="iceberg needs runtime jars + a catalog; --output "
                         "is then a catalog namespace (cat.db)")
    ap.add_argument("--master", default=None,
                    help="local override; omit under spark-submit")
    args = ap.parse_args(argv)

    spark = build_session(args.master)
    from engine.spark.pipeline import run_pipeline
    stats = run_pipeline(spark, args.input, args.output, args.run_id,
                         n_buckets=args.buckets, waves=args.waves,
                         salt_partitions=args.salt_partitions,
                         table_format=args.table_format)
    print(f"run_id={stats.run_id} waves={stats.waves_run} "
          f"processed={stats.turns_processed} "
          f"skipped_resume={stats.turns_skipped_resume} "
          f"wall_s={stats.wall_s:.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
