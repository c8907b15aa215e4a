from __future__ import annotations

import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parents[1]
sys.path.insert(0, str(REPO))


@pytest.fixture(scope="session")
def spark():
    from pyspark.sql import SparkSession
    s = (SparkSession.builder.master("local[4]")
         .appName("engine-tests")
         # 6g, not the 1g default: the mega-conversation test's single-pass
         # CONTROL materializes one 100k-turn group as Arrow batches in a
         # single task (the very failure mode the salted path removes — at
         # 1g the control dies with a Java-heap OOM before the comparison)
         .config("spark.driver.memory", "6g")
         .config("spark.sql.shuffle.partitions", "8")
         .config("spark.sql.adaptive.enabled", "true")
         .config("spark.ui.enabled", "false")
         .config("spark.sql.execution.arrow.maxRecordsPerBatch", "512")
         .getOrCreate())
    yield s
    s.stop()


@pytest.fixture(scope="session")
def golden_vectors():
    import json
    return json.loads((REPO / "tests" / "golden" / "vectors.json").read_text())
