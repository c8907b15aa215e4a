"""Dump ``explain("formatted")`` for declared queries to files.

Usage:
  python tools/dump_plans.py <out_dir> <suffix> <query> [<query> ...]

Writes ``<out_dir>/<query>_<suffix>.txt``. Session shape matches bench.py
(master local[N], shuffle partitions = N, AQE on). Queries whose builders
execute eager steps (index builds, stream drains) run those steps; the
dumped plan is the returned DataFrame's physical plan.
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> None:
    out_dir, suffix, *names = sys.argv[1:]
    os.makedirs(out_dir, exist_ok=True)

    from pyspark.sql import SparkSession
    import __spark_entry__ as entry

    spark = (SparkSession.builder.master(f"local[{CPUS}]")
             .appName("dump_plans")
             .config("spark.sql.shuffle.partitions", str(CPUS))
             .config("spark.sql.adaptive.enabled", "true")
             .config("spark.ui.enabled", "false")
             .config("spark.ui.showConsoleProgress", "false")
             .config("spark.driver.memory", "16g")
             .config("spark.sql.execution.arrow.maxRecordsPerBatch", "2048")
             .getOrCreate())
    spark.sparkContext.setLogLevel("ERROR")

    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")
    qs = entry.queries()
    for name in names:
        try:
            df = qs[name](spark, SF_DIR)
            txt = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:
            txt = f"ERROR building {name}: {type(exc).__name__}: {exc}\n"
        path = Path(out_dir) / f"{name}_{suffix}.txt"
        path.write_text(txt)
        print(f"wrote {path} ({len(txt)} bytes)")


if __name__ == "__main__":
    main()
