"""fastText-style hashed linear quality classifier (frozen weights).

The standard cheap "looks like good text" model in pretraining pipelines
(CCNet / LLaMA lineage): a linear classifier over hashed bag-of-tokens
features. Here the committed weight table (``data/qc_weights.tsv``,
trained by ``tools/train_qc.py`` — deterministic full-batch logistic
regression distilling the repo's own Gopher/C4 ``pass_quality``
predicate into a dense score) ships with the job the way the BPE merges
table does, so inference needs no model runtime.

Per document with token occurrences t₁..tₙ (whitespace-split lowered):

    margin = round(bias + (Σᵢ w[bucket(tᵢ)]) / n, 6)
    score  = round(1 / (1 + exp(-margin)), 6)

bucket() is the engine-shared md5 idiom. The weight sum is EXACT BIGINT
arithmetic: weights are 6-decimal literals, so w·10⁶ rounds to an exact
integer in every engine and the per-doc reduction is
(bias_µ·n + Σ w_µ) / (n·10⁶) — one correctly-rounded double division,
partition-order-independent (a plain double sum straddled the 1e-6
rounding boundary on 4/500 docs; the temperature_sample lesson). The
margin is rounded BEFORE the sigmoid so exp() sees the same input
everywhere.

Scale shape: the model is a 1024-row broadcast; scoring is one token
explode + broadcast join on an int key + per-doc aggregate — no
vocabulary-sized shuffle, no UDF, whole-stage codegen throughout.
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame, SparkSession, functions as F

QC_BUCKETS = 1024
_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_QC_WEIGHTS = os.path.join(_REPO, "data", "qc_weights.tsv")


def qc_bucket(col: Column, buckets: int = QC_BUCKETS) -> Column:
    """md5-based token bucket in [0, buckets) — must match
    tools/train_qc.py's feature hashing exactly."""
    return (F.conv(F.substring(F.md5(col), 1, 8), 16, 10)
            .cast("long") % buckets)


def load_qc_weights(spark: SparkSession,
                    path: str | None = None) -> DataFrame:
    """(bucket, weight) rows; bucket = -1 carries the bias."""
    return (spark.read.option("sep", "\t").option("header", True)
            .schema("bucket int, weight double")
            .csv(path or DEFAULT_QC_WEIGHTS))


def classifier_scores(docs: DataFrame, weights: DataFrame,
                      id_col: str = "doc_id",
                      text_col: str = "text") -> DataFrame:
    """(id_col, n_tokens, margin, score) per doc. Empty/whitespace docs
    get NULLs — no tokens, no evidence (the family-wide contract)."""
    w = F.split(F.trim(F.lower(F.col(text_col))), r"\s+")
    tok = (docs.filter(F.trim(F.coalesce(F.col(text_col), F.lit(""))) != "")
           .select(F.col(id_col).alias("id"), F.explode(w).alias("term")))
    micro = lambda c: F.round(c * 1000000).cast("long")  # noqa: E731
    wb = (weights.filter(F.col("bucket") >= 0)
          .select("bucket", micro(F.col("weight")).alias("w_u")))
    bias = (weights.filter(F.col("bucket") == -1)
            .select(micro(F.col("weight")).alias("b_u")))
    scored = (tok.withColumn("bucket", qc_bucket(F.col("term")))
              .join(F.broadcast(wb), "bucket")
              .groupBy("id")
              .agg(F.count("*").cast("bigint").alias("n_tokens"),
                   F.sum("w_u").alias("_sw"))
              .crossJoin(F.broadcast(bias))
              .withColumn("margin", F.round(
                  (F.col("b_u") * F.col("n_tokens") + F.col("_sw"))
                  / (F.col("n_tokens") * F.lit(1000000.0)), 6))
              .withColumn("score", F.round(
                  F.lit(1.0) / (F.lit(1.0) + F.exp(-F.col("margin"))), 6))
              .select("id", "n_tokens", "margin", "score"))
    return (docs.select(F.col(id_col))
            .join(scored.withColumnRenamed("id", id_col), id_col, "left")
            .select(id_col, "n_tokens", "margin", "score"))
