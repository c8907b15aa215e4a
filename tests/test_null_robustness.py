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


def test_selection_ops_tolerate_nulls(spark):
    """The round-5 selection family (DSIR, classifier, chunking, entropy,
    semdedup, funnel, profiling) must degrade on nulls, never throw."""
    from pyspark.sql import functions as F
    docs = spark.createDataFrame(
        [(1, "some text here tokens enough", "en", 28),
         (2, None, "en", None),
         (3, "", None, 0),
         (None, "null id text", None, 12)],
        "doc_id bigint, text string, lang string, n_chars bigint")

    from engine.datawork.dsir import dsir_weights
    w = dsir_weights(docs.filter(F.coalesce(F.col("doc_id"), F.lit(9)) % 2
                                 == 1), docs).collect()
    assert all(r["log_weight"] is None or r["n_grams"] >= 1 for r in w)

    from engine.datawork.quality import classifier_scores, load_qc_weights
    s = {r["doc_id"]: r for r in
         classifier_scores(docs, load_qc_weights(spark)).collect()}
    assert s[2]["score"] is None and s[3]["score"] is None
    assert s[1]["score"] is not None

    from engine.datawork.corpus import chunk_documents, profile_table
    ch = chunk_documents(docs, max_tokens=3, stride=2).collect()
    assert {r["doc_id"] for r in ch} == {1, None}
    prof = {r["column"]: r for r in profile_table(docs).collect()}
    assert prof["text"]["n_null"] == 1 and prof["doc_id"]["n_null"] == 1

    from engine.datawork.textstats import char_entropy
    ent = {r["doc_id"]: r for r in char_entropy(docs).collect()}
    assert ent[2]["entropy"] is None and ent[3]["entropy"] is None

    from engine.datawork.similarity import semdedup_losers
    emb = spark.createDataFrame(
        [(1, [1.0] + [0.0] * 63), (2, [1.0] + [0.0] * 63)],
        "vec_id bigint, embedding array<double>")
    assert semdedup_losers(emb, threshold=0.9, n_cells=2).count() == 1

    from engine.datawork.funnel import sequential_funnel
    ev = spark.createDataFrame(
        [(1, "view", None), (None, "click", None)],
        "user_id bigint, event_type string, ts timestamp")
    (r,) = sequential_funnel(ev, ["view", "click"]).collect()
    # null ts never sorts into a list position that converts; no throw
    assert r["n_view"] >= 0 and r["n_view_click"] == 0
