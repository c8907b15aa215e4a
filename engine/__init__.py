"""spark-transcript-extract: PySpark-native main-content extraction engine.

A from-scratch re-expression of the deterministic query/data semantics of the
reference pipeline (delinquentq/deepseek-ocr-batch) as a Spark-first engine
over multi-turn conversation transcript tables:

- ``engine.core``      pure-Python kernels (zero Spark imports) — the oracle
                       and the bodies of the vectorized Arrow UDFs.
- ``engine.spark``     the Spark layer: schemas, pandas/Arrow UDF wrappers,
                       the partition-aware pipeline, checkpoint/lineage/resume.
- ``engine.datawork``  large-scale training-data operations (dedup families,
                       similarity search, text analysis) built on DataFrame ops.
"""

__version__ = "0.1.0"
