"""Dirty-input robustness: nulls anywhere in the transcript row must flow
through extraction and the pipeline without task failures — at 10^12 rows,
"a null cannot happen" is never true."""

import pytest


@pytest.fixture()
def dirty(spark):
    return spark.createDataFrame(
        [
            ("c1", 0, "user", "normal turn text long enough", "chat.plain", None),
            ("c1", 1, None, None, None, None),                 # all-null payload
            (None, 0, "tool", "null conversation id", None, None),
            ("c2", None, "user", "null turn_idx", "chat.plain", None),
            ("c3", 2, "user", "", "web.html", None),           # empty html
        ],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")


def test_extract_df_survives_nulls(spark, dirty):
    from engine.spark.pipeline import extract_df
    rows = extract_df(dirty).collect()
    assert len(rows) == 5
    assert all(r["error"] is None for r in rows)  # nulls are not errors
    by_text = {r["cleaned_text"] for r in rows}
    assert "normal turn text long enough" in by_text
    assert "" in by_text
    # bucket is defined for every row, including null conv_id
    assert all(r["conv_bucket"] is not None and r["conv_bucket"] >= 0
               for r in rows)


def test_bucket_null_agreement(spark, dirty):
    from pyspark.sql import functions as F

    from engine.spark.udfs import bucket_col, stable_bucket
    got = (dirty.select("conv_id")
           .withColumn("b", bucket_col(64)).collect())
    for r in got:
        assert r["b"] == stable_bucket(r["conv_id"], 64)


def test_pipeline_survives_nulls(spark, dirty, tmp_path):
    from engine.spark.pipeline import run_pipeline
    src = str(tmp_path / "dirty.parquet")
    dirty.write.parquet(src)
    stats = run_pipeline(spark, src, str(tmp_path / "out"), run_id="dirty",
                         waves=2, n_buckets=16)
    assert stats.turns_processed == 5
    out = spark.read.parquet(str(tmp_path / "out/extracted_turns"))
    assert out.count() == 5


def test_doc_id_immune_to_null_poisoned_batches(spark):
    """A null turn_idx in an Arrow batch floats the whole column; doc_name
    (→ doc_id) for the clean rows in that batch must stay 'conv:5', never
    'conv:5.0'."""
    from engine.core.extract import extract_turn
    from engine.spark.pipeline import extract_df
    df = spark.createDataFrame(
        [("c1", 5, "user", "clean row text here", "chat.plain", None),
         ("c1", None, "user", "dirty row", "chat.plain", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp").coalesce(1)  # force one batch
    rows = {r["turn_idx"]: r for r in extract_df(df).collect()}
    exp = extract_turn("clean row text here", "chat.plain", "c1:5")
    assert rows[5]["doc_id"] == exp["doc_id"]


def test_corpus_ops_tolerate_nulls(spark):
    """Null text / null ids must degrade silently (dropped or passed
    through), never throw — same contract as the extraction kernels."""
    from engine.datawork.corpus import (hash_sample, length_quantiles,
                                        token_vocabulary)
    docs = spark.createDataFrame(
        [(1, "some text here", "en", 14),
         (2, None, "en", None),
         (None, "more text", None, 9)],
        "doc_id bigint, text string, lang string, n_chars bigint")
    vocab = token_vocabulary(docs, top_k=10).collect()
    assert {r["token"] for r in vocab} == {"some", "text", "here", "more"}
    sampled = hash_sample(docs, percent=100).collect()
    assert {r["doc_id"] for r in sampled} == {1, 2}  # null id → dropped
    q = {r["lang"]: r for r in length_quantiles(docs).collect()}
    assert q["en"]["n_docs"] == 2 and q["en"]["p50"] == 14.0
    assert None in q  # null group kept as its own row


def test_dedup_apply_full_null_text_docs_collapse_to_one(spark):
    """NULL-text docs share a NULL fingerprint → one survives (documented
    convention, same as exact_duplicates); engines agree on this grouping."""
    from engine.datawork.corpus import deduplicated_corpus_full
    docs = spark.createDataFrame(
        [(1, None), (2, None), (3, "x y z"), (4, "")],
        "doc_id bigint, text string")
    clusters = spark.createDataFrame([], "doc_id bigint, cluster_id bigint")
    kept = sorted(r["doc_id"] for r in
                  deduplicated_corpus_full(docs, clusters).collect())
    assert kept == [1, 3, 4]
