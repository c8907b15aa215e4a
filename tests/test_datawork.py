import pytest

from pyspark.sql import functions as F

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    return spark.read.parquet(f"{SF}/documents.parquet")


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_text_stats_values(spark):
    from engine.datawork.textstats import with_text_stats
    df = spark.createDataFrame(
        [(1, "the cat sat on the mat, happily!"), (2, ""), (3, "x y")],
        "doc_id int, text string")
    rows = {r["doc_id"]: r for r in with_text_stats(df).collect()}
    assert rows[1]["tokens_ws"] == 7
    assert rows[1]["stopword_ratio"] == round(3 / 7, 6)  # the, on, the
    assert rows[2]["tokens_ws"] == 0 and rows[2]["quality_score"] == 0.0
    assert rows[3]["punct_ratio"] == 0.0


def test_lang_id_on_real_language_samples(spark):
    from engine.datawork.textstats import with_lang_id
    df = spark.createDataFrame([
        (1, "en", "the cat is on the mat and it is happy with the sun"),
        (2, "de", "der hund ist gross und die katze ist klein mit ein ball"),
        (3, "fr", "le chien est grand et la maison est belle pour les enfants"),
        (4, "es", "el perro es grande y la casa es bonita por los niños para todos"),
        (5, "zh", "这是一个中文句子，用来测试语言识别。"),
    ], "doc_id int, lang string, text string")
    rows = with_lang_id(df).collect()
    assert all(r["lang_pred"] == r["lang"] for r in rows), rows


def test_lang_id_total_and_deterministic(spark, docs):
    """On the synthetic corpus (whose `lang` labels are arbitrary — the text
    is English-ish in every row) the predictor must still be total and only
    emit known codes."""
    from engine.datawork.textstats import with_lang_id
    preds = {r["lang_pred"] for r in with_lang_id(docs).collect()}
    assert preds <= {"en", "de", "fr", "es", "zh"}
    assert None not in preds


def test_exact_dedup_finds_planted_dups(spark):
    from engine.datawork.dedup import exact_duplicates
    df = spark.createDataFrame(
        [(1, "same text here"), (2, "SAME   text here"), (3, "unique")],
        "doc_id int, text string")
    [g] = exact_duplicates(df).collect()
    assert g["canonical_id"] == 1 and g["member_ids"] == [1, 2]


def test_exact_dedup_caps_member_list_at_10k_group(spark):
    """A 10k-way duplicate group (boilerplate page at corpus scale) must
    report the true group_size but cap member_ids at max_members — and the
    cap is applied pre-aggregation so the agg buffer stays bounded."""
    from engine.datawork.dedup import exact_duplicates
    df = spark.range(10_000).select(
        F.col("id").alias("doc_id"), F.lit("same boilerplate page").alias("text"))
    [g] = exact_duplicates(df).collect()
    assert g["group_size"] == 10_000
    assert g["canonical_id"] == 0
    assert g["member_ids"] == list(range(100))


def test_minhash_lsh_supersets_high_jaccard(spark, docs):
    """LSH candidates must contain every pair the exact jaccard finds at 0.8."""
    from engine.datawork.dedup import minhash_lsh_candidates, ngram_jaccard_pairs
    exact = {(r["id_a"], r["id_b"])
             for r in ngram_jaccard_pairs(docs, threshold=0.8).collect()}
    cand = {(r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(docs).collect()}
    assert exact, "expected planted near-dups in testdata"
    assert exact <= cand, f"LSH missed {exact - cand}"


def test_simhash_near_pairs_align_with_jaccard(spark, docs):
    from engine.datawork.dedup import ngram_jaccard_pairs, simhash_near_pairs
    near = {(r["id_a"], r["id_b"]) for r in
            simhash_near_pairs(docs, max_hamming=3).collect()}
    exact = {(r["id_a"], r["id_b"])
             for r in ngram_jaccard_pairs(docs, threshold=0.9).collect()}
    assert exact, "expected planted near-dups"
    overlap = len(exact & near) / len(exact)
    assert overlap >= 0.8, f"simhash found only {overlap:.0%} of J≥0.9 pairs"


def test_shingles_short_text_empty(spark):
    from engine.datawork.dedup import shingles
    df = spark.createDataFrame([(1, "two words"), (2, "a b c")],
                               "doc_id int, text string")
    got = shingles(df).collect()
    assert {r["id"] for r in got} == {2}
    assert [r["shingle"] for r in got] == ["a b c"]


def test_cosine_topk_matches_numpy(spark, emb):
    import numpy as np
    from engine.datawork.similarity import cosine_topk
    rows = emb.collect()
    by_id = {r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
             for r in rows}
    q = by_id[0]
    scores = sorted(
        ((float(np.dot(v, q) / (np.linalg.norm(v) * np.linalg.norm(q))), i)
         for i, v in by_id.items()),
        key=lambda t: (-t[0], t[1]))[:5]
    got = cosine_topk(emb, [float(x) for x in by_id[0]], k=5).collect()
    assert [r["vec_id"] for r in got] == [i for _, i in scores]
    for r, (s, _) in zip(got, scores):
        assert abs(r["score"] - s) < 1e-5


def test_lsh_bucket_topk_contains_query(spark, emb):
    from engine.datawork.similarity import lsh_bucket_topk
    q = emb.filter(F.col("vec_id") == 0).collect()[0]["embedding"]
    got = lsh_bucket_topk(emb, [float(x) for x in q], k=5).collect()
    assert got and got[0]["vec_id"] == 0  # the query's own bucket holds it
    assert got[0]["score"] == 1.0


def test_guard_report_counts_planted_hot_shingle(spark):
    """2000 docs sharing one boilerplate shingle: the jaccard guard at
    max_df=1000 must report exactly 1 hot key carrying 2000 rows."""
    from engine.datawork.dedup import guard_report
    df = spark.range(2000).select(
        F.col("id").alias("doc_id"),
        F.concat(F.lit("shared boilerplate line unique"),
                 F.col("id").cast("string")).alias("text"))
    rows = {r["guard"]: r for r in guard_report(df).collect()}
    # each doc's shingles: "shared boilerplate line" (hot, df=2000) and
    # "boilerplate line uniqueN" (df=1)
    g = rows["jaccard_max_df"]
    assert g["hot_keys"] == 1 and g["dropped_rows"] == 2000
    assert "minhash_max_bucket" in rows  # near-dup sigs collide → buckets fill
    assert "embed_max_bucket" not in rows  # emb not passed


def test_banded_lsh_recall(spark, emb):
    """The banded near-pair path must catch ≥90% of true pairs at τ=0.8
    (1-(1-p^4)^16 ≥ 0.999 there) and a solid majority at τ=0.35, with
    perfect precision (every emitted pair is exact-verified)."""
    from engine.datawork.similarity import cosine_pairs_above
    truth = {(r["id_a"], r["id_b"]): r["cosine"] for r in
             cosine_pairs_above(emb, threshold=0.35, bucketed=False).collect()}
    got = {(r["id_a"], r["id_b"]): r["cosine"] for r in
           cosine_pairs_above(emb, threshold=0.35, bucketed=True).collect()}
    assert truth, "expected planted near pairs in testdata"
    assert set(got) <= set(truth)  # precision 1.0
    recall_035 = len(got) / len(truth)
    assert recall_035 >= 0.75, f"banded recall at τ=0.35 only {recall_035:.0%}"
    hi_truth = {k for k, c in truth.items() if c >= 0.8}
    if hi_truth:
        hi_got = {k for k in got if k in hi_truth}
        assert len(hi_got) / len(hi_truth) >= 0.9


def test_lsh_topk_probe_superset_of_home_bucket(spark, emb):
    from engine.datawork.similarity import lsh_bucket_topk
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    home = {r["vec_id"] for r in lsh_bucket_topk(emb, q, k=100).collect()}
    probed = {r["vec_id"] for r in
              lsh_bucket_topk(emb, q, k=100, probe_bits=1).collect()}
    assert home <= probed or len(probed) == 100


def test_multimodal_features_deterministic(spark):
    from engine.datawork.multimodal import extract_features
    assets = spark.createDataFrame(
        [("a1", "image", bytearray(b"\x00\x01payload")),
         ("a2", "audio", bytearray(b"")),
         ("a3", "video", None)],
        "asset_id string, kind string, payload binary")
    rows = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert rows["a1"]["n_bytes"] == 9
    assert len(rows["a1"]["features"]) == 16
    assert rows["a2"]["content_hash"] == rows["a3"]["content_hash"]  # b"" == None
    again = {r["asset_id"]: r for r in extract_features(assets).collect()}
    assert rows["a1"]["features"] == again["a1"]["features"]


def test_frame_sampling(spark):
    from engine.datawork.multimodal import sample_frames
    assets = spark.createDataFrame(
        [("v1", "video", None, "video/mp4", 64, 64, 3500),
         ("i1", "image", None, "image/png", 64, 64, 0)],
        "asset_id string, kind string, payload binary, mime string, "
        "width int, height int, duration_ms long")
    rows = sample_frames(assets, every_ms=1000).collect()
    assert {r["asset_id"] for r in rows} == {"v1"}
    assert sorted(r["frame_ts_ms"] for r in rows) == [0, 1000, 2000, 3000]


def test_duplicate_clusters_label_propagation(spark):
    from engine.datawork.clusters import duplicate_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4),          # chain → cluster 1
         (10, 11),                        # pair → cluster 10
         (20, 21), (21, 22), (20, 22)],   # triangle → cluster 20
        "id_a bigint, id_b bigint")
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10,
                   20: 20, 21: 20, 22: 20}


def test_repetition_ratio(spark):
    from engine.datawork.textstats import with_repetition
    df = spark.createDataFrame(
        [(1, "spam spam spam spam spam spam"),      # one distinct 3-gram
         (2, "all words here are fully distinct"),  # all distinct
         (3, "ab"), (4, "")],                       # too short → 1.0
        "doc_id int, text string")
    rows = {r["doc_id"]: r["repetition_ratio"]
            for r in with_repetition(df).collect()}
    assert rows[1] == 0.25  # 1 distinct / 4 total
    assert rows[2] == 1.0
    assert rows[3] == 1.0 and rows[4] == 1.0


def test_deduplicated_corpus_keeps_canonical_only(spark):
    from engine.datawork.corpus import deduplicated_corpus
    docs = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (9, "z")], "doc_id bigint, text string")
    clusters = spark.createDataFrame(
        [(1, 1), (2, 1), (3, 3)], "doc_id bigint, cluster_id bigint")
    kept = sorted(r["doc_id"] for r in
                  deduplicated_corpus(docs, clusters).collect())
    assert kept == [1, 3, 9]  # 2 dropped (non-canonical), 9 unclustered


def test_hash_sample_deterministic_and_disjoint(spark, docs):
    from engine.datawork.corpus import hash_sample
    s1 = {r["doc_id"] for r in hash_sample(docs, 10).collect()}
    s2 = {r["doc_id"] for r in hash_sample(docs, 10).collect()}
    assert s1 == s2  # reproducible split
    s30 = {r["doc_id"] for r in hash_sample(docs, 30).collect()}
    assert s1 <= s30  # cutoff sampling nests
    n = docs.count()
    assert 0.02 * n < len(s1) < 0.25 * n  # roughly 10%


def test_token_vocabulary_counts_and_tiebreak(spark):
    from engine.datawork.corpus import token_vocabulary
    df = spark.createDataFrame(
        [(1, "b a b"), (2, "a c  B"), (3, "")], "doc_id int, text string")
    rows = token_vocabulary(df, top_k=10).collect()
    assert [(r["token"], r["n"]) for r in rows] == [
        ("a", 2), ("b", 3)][::-1] + [("c", 1)]


def test_length_quantiles_match_numpy(spark, docs):
    import numpy as np
    from engine.datawork.corpus import length_quantiles
    rows = {r["lang"]: r for r in length_quantiles(docs).collect()}
    vals = {}
    for r in docs.select("lang", "n_chars").collect():
        vals.setdefault(r["lang"], []).append(r["n_chars"])
    for lang, xs in vals.items():
        assert rows[lang]["n_docs"] == len(xs)
        assert abs(rows[lang]["p90"]
                   - round(float(np.percentile(xs, 90)), 4)) < 1e-6


def test_duplicate_clusters_long_chain_converges_fast(spark):
    """A 60-node duplicate CHAIN (worst-case diameter) must converge inside
    the 15-round cap — path compression makes rounds O(log diameter); plain
    min propagation would need 59 rounds."""
    from engine.datawork.clusters import duplicate_clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(60)], "id_a bigint, id_b bigint")
    got = {r["doc_id"]: r["cluster_id"]
           for r in duplicate_clusters(pairs).collect()}
    assert got == {i: 0 for i in range(61)}


def test_datawork_job_cli(spark, tmp_path):
    """The spark-submit entry point for the corpus suite: op dispatch and
    parquet round-trip (session reused, no CLI subprocess)."""
    from engine.datawork.job import run_op
    total = spark.read.parquet(
        "/root/testdata/sf0.001/documents.parquet").count()
    out = run_op(spark, "sample", "/root/testdata/sf0.001/documents.parquet",
                 percent=30)
    assert 0 < out.count() < total
    got = run_op(spark, "quantiles",
                 "/root/testdata/sf0.001/documents.parquet")
    assert {r["lang"] for r in got.collect()}
    # verified-pairs default threshold prunes raw candidates, never adds
    raw = run_op(spark, "minhash-pairs",
                 "/root/testdata/sf0.001/documents.parquet").count()
    ver = run_op(spark, "verified-pairs",
                 "/root/testdata/sf0.001/documents.parquet").count()
    assert 0 < ver <= raw
    # substring/winnow family dispatch (values covered in
    # test_substrings.py; here: the ops run and keep every doc)
    sub = run_op(spark, "substring-dedup",
                 "/root/testdata/sf0.001/documents.parquet", ngram=6)
    assert sub.count() == total
    ppl = run_op(spark, "ppl-buckets",
                 "/root/testdata/sf0.001/documents.parquet")
    assert ppl.count() == total and \
        {r.bucket for r in ppl.collect()} == {1, 2, 3}


def test_ivf_topk_recall_vs_bruteforce(spark, emb):
    """IVF with nprobe=2 on 16 cells: the probed top-k must overlap the
    exact top-k meaningfully, and every returned score must be exact."""
    from engine.datawork.similarity import cosine_topk, ivf_topk
    q = [float(x) for x in
         emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    exact = {r["vec_id"]: r["score"] for r in cosine_topk(emb, q, k=10).collect()}
    got = {r["vec_id"]: r["score"] for r in ivf_topk(emb, q, k=10).collect()}
    assert got  # query's own cell is probed, so never empty
    assert all(got[v] == exact[v] for v in got if v in exact)
    assert len(set(got) & set(exact)) >= 3  # nprobe=2/16 cells still hits


def test_probe_buckets_hamming_two():
    from engine.datawork.similarity import lsh_planes, probe_buckets
    planes = lsh_planes()
    q = [1.0] * 64
    p0 = probe_buckets(q, planes, 0)
    p1 = probe_buckets(q, planes, 1)
    p2 = probe_buckets(q, planes, 2)
    assert len(p0) == 1 and len(p1) == 9 and len(p2) == 9 + 28
    assert set(p0) <= set(p1) <= set(p2)


def test_duplicate_clusters_reliable_checkpoint_identical(spark, tmp_path):
    """VERDICT r2 #2: with a reliable checkpoint_dir the label loop must
    produce exactly the clusters the localCheckpoint fallback does."""
    from engine.datawork.clusters import duplicate_clusters
    pairs = spark.createDataFrame(
        [(i, i + 1) for i in range(40)] + [(100, 101), (200, 201), (201, 202)],
        "id_a bigint, id_b bigint")
    local = {(r["doc_id"], r["cluster_id"])
             for r in duplicate_clusters(pairs).collect()}
    reliable = {(r["doc_id"], r["cluster_id"])
                for r in duplicate_clusters(
                    pairs, checkpoint_dir=str(tmp_path / "ckpt")).collect()}
    assert reliable == local
    import os
    assert os.listdir(str(tmp_path / "ckpt"))  # really wrote checkpoints


def test_duplicate_clusters_scopes_and_restores_checkpoint_dir(spark, tmp_path):
    """ADVICE r3: each call checkpoints under its own run-<id> subdirectory
    (concurrent jobs sharing a dir must never delete each other's files),
    and the context-global checkpoint dir is restored on exit — INCLUDING
    back to unset when none was configured before."""
    import os

    from engine.datawork.clusters import duplicate_clusters
    sc = spark.sparkContext
    prev = sc.getCheckpointDir()
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a bigint, id_b bigint")
    duplicate_clusters(pairs, checkpoint_dir=str(tmp_path / "ck")).collect()
    assert sc.getCheckpointDir() == prev  # restored, even from unset
    duplicate_clusters(pairs, checkpoint_dir=str(tmp_path / "ck")).collect()
    runs = os.listdir(str(tmp_path / "ck"))
    assert len(runs) == 2 and all(r.startswith("run-") for r in runs)


def test_cache_slot_reuses_semantically_equal_plan(spark, docs):
    """VERDICT r2 #6: guard_report must reuse the band-bucket table
    minhash_lsh_candidates built (one signature aggregation per combined
    run); shingles are only reused opportunistically (standalone minhash
    must not pay the persist); slots are keyed per application."""
    from engine.datawork import dedup
    from engine.datawork.dedup import (
        _CACHE_SLOTS, clear_cache_slots, minhash_lsh_candidates,
        guard_report, ngram_jaccard_pairs)
    clear_cache_slots(spark)  # isolate from slots other tests filled
    minhash_lsh_candidates(docs).collect()
    app = spark.sparkContext.applicationId
    bucket_obj = _CACHE_SLOTS[(app, "minhash_buckets")]
    guard_report(docs).collect()
    # same object: guard_report did NOT rebuild the signature aggregate
    assert _CACHE_SLOTS[(app, "minhash_buckets")] is bucket_obj
    # buckets were already cached → the shingle census was guard_report's
    # only shingle consumer, so it STREAMED instead of filling the slot
    assert (app, "shingles") not in _CACHE_SLOTS
    # jaccard fills the shingles slot; a re-run of minhash then PEEKS it
    # and still lands on the same cached buckets
    ngram_jaccard_pairs(docs).collect()
    shingle_obj = _CACHE_SLOTS[(app, "shingles")]
    assert dedup._cache_slot_peek(
        "shingles", dedup.shingles(docs)) is shingle_obj
    minhash_lsh_candidates(docs).collect()
    assert _CACHE_SLOTS[(app, "minhash_buckets")] is bucket_obj
    # a different input does NOT peek-match and DOES replace on fill
    other = docs.limit(10)
    assert dedup._cache_slot_peek(
        "shingles", dedup.shingles(other)) is not shingle_obj
    dedup._cache_slot("shingles", dedup.shingles(other))
    assert _CACHE_SLOTS[(app, "shingles")] is not shingle_obj


def test_deduplicated_corpus_full_layers_exact_over_guarded_lsh(spark):
    """Replica groups past the LSH bucket guard produce no candidates (by
    design) — the layered action must still drop them via the exact pass,
    while plain cluster-only apply keeps them (the sf1 soak finding)."""
    from engine.datawork.clusters import duplicate_clusters
    from engine.datawork.corpus import (deduplicated_corpus,
                                        deduplicated_corpus_full)
    from engine.datawork.dedup import minhash_lsh_candidates
    base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [(i, base) for i in range(8)]              # 8 identical replicas
    rows += [(100, "one two three four five six seven eight nine ten"),
             (101, "one two three four five six seven eight nine ten plus"),
             (200, "totally different unique text with many many words here")]
    docs = spark.createDataFrame(rows, "doc_id bigint, text string")
    # guard at 4: the 8-replica group's buckets are all dropped
    cand = minhash_lsh_candidates(docs, max_bucket=4)
    clusters = duplicate_clusters(cand)
    plain = sorted(r["doc_id"] for r in
                   deduplicated_corpus(docs, clusters).collect())
    full = sorted(r["doc_id"] for r in
                  deduplicated_corpus_full(docs, clusters).collect())
    assert set(range(8)) <= set(plain)       # cluster-only apply keeps all 8
    assert full == [0, 100, 200]             # layered: one canonical of each


def test_salted_aggregate_exact_on_hot_key(spark):
    """One key carrying 90% of the rows: the salted two-stage aggregate
    must produce exactly the plain aggregation's counts and sums, and its
    first stage must spread the hot key over multiple salt groups."""
    from pyspark.sql import functions as F

    from engine.datawork.skew import salted_avg, salted_count_sum
    df = spark.range(10_000).select(
        F.when(F.col("id") < 9_000, F.lit("hot")).otherwise(
            F.concat(F.lit("k"), (F.col("id") % 7).cast("string")))
        .alias("k"),
        (F.col("id") % 100).cast("double").alias("v"))
    plain = {(r["k"]): (r["n"], round(r["s"], 4)) for r in
             df.groupBy("k").agg(F.count("*").alias("n"),
                                 F.sum("v").alias("s")).collect()}
    salted = {(r["k"]): (r["n"], round(r["total"], 4)) for r in
              salted_count_sum(df, ["k"], "v").collect()}
    assert salted == plain
    avg = {r["k"]: round(r["avg"], 6) for r in
           salted_avg(df, ["k"], "v").collect()}
    assert all(abs(avg[k] - plain[k][1] / plain[k][0]) < 1e-6 for k in avg)


def test_salted_aggregate_spreads_identical_rows(spark):
    """The adversarial hot-key shape: 9,000 BYTE-IDENTICAL rows (replayed
    boilerplate). A content-only salt would put them all in one salt
    bucket; the position term must spread them, and the result must still
    equal the plain aggregation exactly."""
    from pyspark.sql import functions as F

    from engine.datawork.skew import DEFAULT_SALT, salted_count_sum
    df = spark.range(9_000).select(
        F.lit("hot").alias("k"), F.lit(2.5).alias("v")).union(
        spark.range(10).select(
            F.concat(F.lit("k"), F.col("id").cast("string")).alias("k"),
            F.lit(1.0).alias("v")))
    [hot] = [r for r in salted_count_sum(df, ["k"], "v").collect()
             if r["k"] == "hot"]
    assert (hot["n"], hot["total"]) == (9_000, 22_500.0)
    spread = (df.withColumn(
        "_salt", F.pmod(F.xxhash64("k", "v", F.monotonically_increasing_id()),
                        F.lit(DEFAULT_SALT)))
        .filter(F.col("k") == "hot").select("_salt").distinct().count())
    assert spread == DEFAULT_SALT  # identical rows still use every bucket


def test_banded_lsh_parameterized_layout_stays_exact_verified(spark, emb):
    """The scale path tunes bands/rows per corpus size (BENCH: rows must
    grow ~log2 N). A non-default layout must still emit only true pairs
    (exact verify) and keep solid recall at a high threshold."""
    from engine.datawork.similarity import cosine_pairs_above
    truth = {(r["id_a"], r["id_b"]) for r in
             cosine_pairs_above(emb, threshold=0.5, bucketed=False).collect()}
    got = {(r["id_a"], r["id_b"]) for r in
           cosine_pairs_above(emb, threshold=0.5, bucketed=True,
                              bands=8, rows=8).collect()}
    assert got <= truth            # precision 1.0 at any layout
    if truth:
        # p(0.5 cosine) = 1 - acos(0.5)/pi = 2/3; 1-(1-(2/3)^8)^8 ~ 0.28 —
        # sf0.001's planted pairs are far above 0.5, where recall is high
        assert len(got) / len(truth) >= 0.5


def test_minhash_verified_pairs_filters_false_candidates(spark, docs):
    """The verify chain (candidates → signature-estimate Jaccard ≥ τ):
    every verified pair must be a candidate, near-identical planted pairs
    must survive with est ≈ 1, and a pair of genuinely dissimilar docs
    that happens to collide in a band must be filtered (est < τ). On the
    sf corpus the estimate reproduces the true-Jaccard pair set."""
    from engine.datawork.dedup import (minhash_lsh_candidates,
                                       minhash_verified_pairs,
                                       ngram_jaccard_pairs)
    cand = {(r["id_a"], r["id_b"])
            for r in minhash_lsh_candidates(docs).collect()}
    verified = {(r["id_a"], r["id_b"]): r["est_jaccard"]
                for r in minhash_verified_pairs(docs,
                                                threshold=0.5).collect()}
    true_pairs = {(r["id_a"], r["id_b"])
                  for r in ngram_jaccard_pairs(docs,
                                               threshold=0.5).collect()}
    assert set(verified) <= cand               # verify only prunes
    assert set(verified) == true_pairs         # estimate matches truth here
    assert all(0.0 <= v <= 1.0 for v in verified.values())


def test_auto_rows_scales_with_corpus_size(spark, emb):
    """VERDICT r3 #3: rows defaults from the corpus size (rows ≈
    log2(N / target bucket population)). Small corpora keep the 24×4
    oracle pin; the 200k-vector soak scale must select r≥12 instead of
    the degenerate 16-buckets-per-band layout; and the auto path must
    produce exactly the explicit-argument result at test scale."""
    from engine.datawork.similarity import auto_rows, cosine_pairs_above
    assert auto_rows(50) == 4
    assert auto_rows(500) == 4          # the sf0.01 oracle layout
    assert auto_rows(200_000) >= 12     # the soak's manual override, auto
    assert auto_rows(500_000) >= 12
    assert auto_rows(10**12) == 24      # capped plane budget
    explicit = {(r["id_a"], r["id_b"]) for r in
                cosine_pairs_above(emb, threshold=0.5, bucketed=True,
                                   rows=4).collect()}
    auto = {(r["id_a"], r["id_b"]) for r in
            cosine_pairs_above(emb, threshold=0.5, bucketed=True).collect()}
    assert auto == explicit


def test_quality_flags_each_rule_trips(spark):
    """One crafted doc per rule: exactly that rule (plus any genuinely
    co-violated ones) fails, and a clean doc passes everything."""
    from engine.datawork.textstats import with_quality_flags
    good = ("the quick brown fox jumps over the lazy dog and runs on "
            "through a field of green grass with many other animals ") * 3
    rows = [
        (0, good),
        (1, "too short for the rule"),                       # word_count
        (2, " ".join(["a"] * 60)),                            # mean_word_len low
        (3, ("the of " + "# " * 30) + good),                  # symbol_ratio
        (4, "\n".join("- item in the list here now" for _ in range(20))),  # bullets
        (5, "\n".join("the sentence trails off..." for _ in range(10))),   # ellipsis
        (6, "\n".join(["the same line of words here"] * 10)),  # repeated lines
        (7, good + " " + " ".join(["123"] * 120)),             # alpha_words
        (8, " ".join(f"w{i}" for i in range(80))),             # stopwords
        (9, ""),                                               # empty
    ]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r.doc_id: r.asDict() for r in with_quality_flags(df).collect()}
    assert got[0]["pass_quality"]
    assert not got[1]["flag_word_count"]
    assert not got[2]["flag_mean_word_len"]
    assert not got[3]["flag_symbol_ratio"]
    assert not got[4]["flag_bullet_lines"]
    assert not got[5]["flag_ellipsis_lines"]
    assert not got[6]["flag_repeated_lines"]
    assert not got[7]["flag_alpha_words"]
    assert not got[8]["flag_stopwords"]
    assert not got[9]["pass_quality"] and got[9]["n_words"] == 0
    for d in range(1, 10):
        assert not got[d]["pass_quality"]


def test_train_kmeans_partitioning_independent(spark, emb):
    """The fixed-point centroid update must make the codebook BIT-identical
    across partitionings — the property that lets a SQL oracle pin it."""
    from engine.datawork.similarity import train_kmeans
    a = train_kmeans(emb.repartition(1)).collect()
    b = train_kmeans(emb.repartition(7)).collect()
    ca = sorted((r["cell"], tuple(r["cv"])) for r in a)
    cb = sorted((r["cell"], tuple(r["cv"])) for r in b)
    assert ca == cb
    assert len(ca) == 16
    # the update actually moved the centroids off their seed vectors
    seeds = {tuple(r["embedding"]) for r in emb.limit(64).collect()}
    moved = [cv for _, cv in ca if tuple(map(float, cv)) not in seeds]
    assert moved


def test_trained_ivf_cells_balanced_and_topk_sound(spark, emb):
    """The trained codebook's pinnable properties on this near-uniform
    synthetic corpus: (a) every vector assigned, all cells non-empty,
    (b) the cell-population spread is no wider than the untrained
    smallest-id rule's (Lloyd iterations pull centroids toward mass),
    (c) trained ivf_topk returns vectors scored identically to brute
    force (IVF only restricts the candidate set). Per-query recall on
    random synthetic embeddings is noise either way — it is MEASURED by
    tools/recall_report.py, not asserted here."""
    from engine.datawork.similarity import (cosine_topk, ivf_assignments,
                                            ivf_topk, train_kmeans)
    cent = train_kmeans(emb)
    spread = {}
    for label, c in (("untrained", None), ("trained", cent)):
        a = ivf_assignments(emb, centroids=c)
        sizes = [r["n"] for r in
                 a.groupBy("cell").agg(F.count("*").alias("n")).collect()]
        assert len(sizes) == 16 and sum(sizes) == emb.count()
        spread[label] = max(sizes) - min(sizes)
    assert spread["trained"] <= spread["untrained"]

    qvec = [float(x) for x in
            emb.filter(F.col("vec_id") == 0).first()["embedding"]]
    brute = {r["vec_id"]: r["score"]
             for r in cosine_topk(emb, qvec, 500).collect()}
    for r in ivf_topk(emb, qvec, 10, centroids=cent).collect():
        assert brute[r["vec_id"]] == r["score"]


def test_tune_input_splits_sizes_scan_to_cores(spark, tmp_path):
    """Proactive split sizing (VERDICT r4 #2): maxPartitionBytes set from
    input size so a CPU-heavy scan starts on >= cores splits without the
    reactive _ensure_parallelism repartition. The floor override makes the
    tiny fixture behave like a real multi-split corpus."""
    from engine.spark.job import tune_input_splits
    from tools import synth

    path = str(tmp_path / "tx.parquet")
    synth.write_parquet(path, 4000)
    old = spark.conf.get("spark.sql.files.maxPartitionBytes")
    try:
        got = tune_input_splits(spark, path, floor_bytes=1024)
        assert int(spark.conf.get("spark.sql.files.maxPartitionBytes")) == got
        import os
        total = os.path.getsize(path)
        cores = spark.sparkContext.defaultParallelism
        assert got == max(1024, min(128 << 20, total // (cores * 3)))
        parts = spark.read.parquet(path).rdd.getNumPartitions()
        assert parts >= cores
        # default floor (1 MB) clamps tiny inputs — the reactive backstop
        # stays responsible below that
        assert tune_input_splits(spark, path) == 1 << 20
    finally:
        spark.conf.set("spark.sql.files.maxPartitionBytes", old)


def test_pack_shards_matches_naive_prefix_sum(spark):
    """The two-level distributed scan must equal the naive exclusive prefix
    sum over id order, including exact shard boundaries at the budget."""
    from engine.datawork.pack import pack_shards
    counts = [(1, 5), (2, 3), (3, 0), (4, 9), (5, 2), (6, 8), (7, 1)]
    df = spark.createDataFrame(counts, "doc_id int, n int")
    got = {r["doc_id"]: r for r in
           pack_shards(df, budget=8, tokens=F.col("n")).collect()}
    acc = 0
    for did, n in counts:
        assert got[did]["n_tokens"] == n
        assert got[did]["start_offset"] == acc
        assert got[did]["shard_id"] == acc // 8
        acc += n
    assert len(got) == len(counts)


def test_pack_shards_partition_invariant_and_null_safe(spark):
    """Output must not depend on where range boundaries fall, and NULL token
    counts pack as 0 (never shifting later offsets)."""
    from engine.datawork.pack import pack_shards
    rows = [(i, None if i % 5 == 0 else i % 7) for i in range(1, 101)]
    df = spark.createDataFrame(rows, "doc_id int, n int")
    a = sorted(pack_shards(df, budget=10, tokens=F.col("n"),
                           num_partitions=2).collect())
    b = sorted(pack_shards(df, budget=10, tokens=F.col("n"),
                           num_partitions=13).collect())
    assert a == b
    got = {r["doc_id"]: r for r in a}
    acc = 0
    for i, n in rows:
        n = n or 0
        assert got[i]["start_offset"] == acc and got[i]["n_tokens"] == n
        acc += n


def test_pack_shards_plan_has_no_window(spark, docs):
    """The scale contract: NO Window operator (a global-order Window is a
    one-partition plan) and exactly one range Exchange feeding the cumsum."""
    from engine.datawork.pack import pack_shards
    plan = pack_shards(docs, budget=2048)._jdf.queryExecution() \
        .executedPlan().toString()
    assert "Window" not in plan
    # AQE prints the plan twice (Initial + Final) — assert the shuffle KIND,
    # not a count: the only Exchange is the range partition (plus the tiny
    # offsets broadcast); no hash shuffle anywhere
    assert "rangepartitioning" in plan
    assert "Exchange hashpartitioning" not in plan, plan


def test_dedup_lines_drops_hot_keeps_order_and_blanks(spark):
    from engine.datawork.curation import dedup_lines
    boiler = "COOKIE BANNER"
    df = spark.createDataFrame([
        (1, f"alpha\n{boiler}\n\nbeta"),
        (2, f"{boiler}\ngamma"),
        (3, f"delta\n{boiler}"),
        (4, "unique only"),
        (5, None),
    ], "doc_id int, text string")
    got = {r["doc_id"]: r for r in dedup_lines(df, min_count=3).collect()}
    assert got[1]["text"] == "alpha\n\nbeta"          # blank line survives
    assert got[1]["n_kept"] == 3 and got[1]["n_dropped"] == 1
    assert got[2]["text"] == "gamma"
    assert got[3]["text"] == "delta"
    assert got[4]["text"] == "unique only" and got[4]["n_dropped"] == 0
    assert got[5]["text"] == "" and got[5]["n_kept"] == 1  # NULL → one '' line
    assert len(got) == 5


def test_dedup_lines_min_count_boundary(spark):
    from engine.datawork.curation import dedup_lines
    df = spark.createDataFrame(
        [(1, "twice\na"), (2, "twice\nb")], "doc_id int, text string")
    got2 = {r["doc_id"]: r["text"]
            for r in dedup_lines(df, min_count=2).collect()}
    got3 = {r["doc_id"]: r["text"]
            for r in dedup_lines(df, min_count=3).collect()}
    assert got2 == {1: "a", 2: "b"}          # count 2 >= 2 → dropped
    assert got3 == {1: "twice\na", 2: "twice\nb"}  # 2 < 3 → kept


def test_line_dedup_report_matches_dedup_lines(spark):
    """The census must agree with what dedup_lines actually drops, and
    blank lines must never count as hot."""
    from engine.datawork.curation import dedup_lines, line_dedup_report
    boiler = "COOKIE BANNER"
    df = spark.createDataFrame([
        (1, f"alpha\n{boiler}\n\nbeta"),
        (2, f"{boiler}\ngamma\n\n"),
        (3, f"delta\n{boiler}"),
        (4, "unique only"),
        (5, None),
    ], "doc_id int, text string")
    rep = line_dedup_report(df, min_count=3).collect()
    assert len(rep) == 1
    r = rep[0]
    assert (r["guard"], r["threshold"]) == ("line_freq", 3)
    assert r["hot_lines"] == 1                      # the banner only
    assert r["max_line_count"] == 3                 # banner appears 3×
    dropped = dedup_lines(df, min_count=3).agg(
        F.sum("n_dropped")).collect()[0][0]
    assert r["dropped_rows"] == dropped == 3
    # below threshold: nothing hot, max count still reported
    r2 = line_dedup_report(df, min_count=4).collect()[0]
    assert r2["hot_lines"] == 0 and r2["dropped_rows"] == 0
    assert r2["max_line_count"] == 3


def test_contamination_report_counts_shared_grams(spark):
    from engine.datawork.curation import contamination_report
    docs = spark.createDataFrame([
        (1, "the quick brown fox jumps high"),     # shares "the quick brown"
        (2, "completely different words entirely here now"),
        (3, "the quick brown fox jumps high"),     # same as 1
    ], "doc_id int, text string")
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs")], "doc_id int, text string")
    got = {r["doc_id"]: r for r in
           contamination_report(docs, bench, n=3).collect()}
    assert set(got) == {1, 3}                       # doc 2 clean → absent
    # doc 1: grams {the quick brown, quick brown fox, brown fox jumps,
    #               fox jumps high}; bench holds the first two
    assert got[1]["n_grams"] == 4 and got[1]["n_hits"] == 2
    assert got[1]["hit_ratio"] == 0.5


def test_temperature_sample_flattens_mixture(spark):
    """A 10:1 skewed two-group corpus sampled at alpha=0.5 must upweight
    the small group: realized rates ratio ≈ sqrt(10):1, not 10:1, and the
    total lands near the budget. Decision is the md5 ppm-bucket — recompute
    it here as the independent check."""
    import hashlib
    from engine.datawork.curation import temperature_sample
    rows = [(i, "big" if i < 4000 else "small") for i in range(4400)]
    df = spark.createDataFrame(rows, "doc_id int, lang string")
    got = temperature_sample(df, budget=400, group_col="lang").collect()
    by = {}
    for r in got:
        by.setdefault(r["lang"], []).append(r)
    n_big, n_small = len(by["big"]), len(by["small"])
    # exact expected sets: cut_ppm from the documented integer formula
    s_big, s_small = int(4000 ** 0.5), int(400 ** 0.5)
    denom = s_big + s_small
    cut_big = min(10**6, (10**6 * 400 * s_big) // (denom * 4000))
    cut_small = min(10**6, (10**6 * 400 * s_small) // (denom * 400))
    assert by["big"][0]["cut_ppm"] == cut_big
    assert by["small"][0]["cut_ppm"] == cut_small
    for r in got:
        b = int(hashlib.md5(str(r["doc_id"]).encode()).hexdigest()[:8], 16)
        assert b % 10**6 < r["cut_ppm"]
    # small group keeps a ~sqrt(10)x higher rate than proportional
    assert cut_small / cut_big == pytest.approx(10 ** 0.5, rel=0.05)
    assert 300 < n_big + n_small < 500


def test_interval_join_matches_naive_and_handles_edges(spark):
    """Bucketed interval join must equal the naive BETWEEN filter,
    including inclusive endpoints, multi-match points, invalid (s > e)
    intervals, and a mega-interval routed through the broadcast branch
    (max_buckets=2 forces it)."""
    import datetime as dt
    from engine.datawork.ranges import interval_join
    T = lambda m: dt.datetime(2024, 1, 1, 0, m)
    pts = spark.createDataFrame(
        [(i, T(m)) for i, m in enumerate([0, 10, 30, 59, 45])],
        "pid int, ts timestamp")
    ivs = spark.createDataFrame([
        (100, T(0), T(10)),      # inclusive both ends: catches pids 0,1
        (101, T(10), T(40)),     # overlaps: pids 1,2
        (102, T(50), T(40)),     # invalid s>e: matches nothing
        (103, T(0), T(59)),      # spans everything → long branch at mb=2
    ], "iid int, ts_start timestamp, ts_end timestamp")
    got = {(r["pid"], r["iid"]) for r in interval_join(
        pts, ivs, "ts", "ts_start", "ts_end",
        bucket_width_s=600, max_buckets=2).collect()}
    naive = {(p["pid"], v["iid"])
             for p in pts.collect() for v in ivs.collect()
             if v["ts_start"] <= v["ts_end"]
             and v["ts_start"] <= p["ts"] <= v["ts_end"]}
    assert got == naive
    assert (0, 103) in got and (1, 100) in got and (1, 101) in got
    assert not any(i == 102 for _, i in got)


def test_interval_join_no_duplicate_pairs_across_buckets(spark):
    """An interval spanning many buckets must emit each contained point
    exactly once (pairs meet only in the point's bucket)."""
    import datetime as dt
    from engine.datawork.ranges import interval_join
    pts = spark.createDataFrame(
        [(i, dt.datetime(2024, 1, 1, i)) for i in range(20)],
        "pid int, ts timestamp")
    ivs = spark.createDataFrame(
        [(1, dt.datetime(2024, 1, 1, 2), dt.datetime(2024, 1, 1, 18))],
        "iid int, ts_start timestamp, ts_end timestamp")
    rows = interval_join(pts, ivs, "ts", "ts_start", "ts_end",
                         bucket_width_s=3600).collect()
    assert sorted(r["pid"] for r in rows) == list(range(2, 19))


def test_tfidf_top_terms_ranks_rare_over_common(spark):
    import math
    from engine.datawork.corpus import tfidf_top_terms
    df = spark.createDataFrame([
        (1, "common rare1 common common"),
        (2, "common plain"),
        (3, "common plain"),
    ], "doc_id int, text string")
    got = {(r["doc_id"], r["rank"]): r for r in
           tfidf_top_terms(df, top_k=2).collect()}
    # doc 1: rare1 df=1 idf=ln(4/2)+1; common df=3 tf=3 idf=ln(4/4)+1=1
    assert got[(1, 2)]["term"] == "rare1"
    assert got[(1, 1)]["term"] == "common" and got[(1, 1)]["tf"] == 3
    assert got[(1, 1)]["score"] == 3.0          # tf=3 × idf=1
    assert got[(1, 2)]["score"] == round(math.log(2) + 1, 6)
    # docs 2/3 identical: rarer 'plain' (df=2) outranks ubiquitous
    # 'common' (idf=1), and both docs emit identical rows
    assert got[(2, 1)]["term"] == got[(3, 1)]["term"] == "plain"
    assert got[(2, 2)]["term"] == got[(3, 2)]["term"] == "common"
    assert got[(2, 1)]["score"] == round(math.log(4 / 3) + 1, 6)


def test_redact_pii_replaces_and_counts(spark):
    from engine.datawork.curation import redact_pii
    df = spark.createDataFrame([
        (1, "mail bob.smith+x@corp.example.org from 192.168.1.77 "
            "card 4111222233334444 ok"),
        (2, "clean text with number 123 and 1.5 only"),
        (3, None),
    ], "doc_id int, text string")
    got = {r["doc_id"]: r for r in redact_pii(df).collect()}
    assert got[1]["text"] == "mail [EMAIL] from [IP] card [NUMBER] ok"
    assert (got[1]["n_emails"], got[1]["n_ips"], got[1]["n_numbers"]) \
        == (1, 1, 1)
    assert got[2]["text"] == got[2]["text"] and got[2]["n_numbers"] == 0
    assert "123" in got[2]["text"]             # short runs untouched
    assert got[3]["text"] == ""                # NULL normalizes


def test_hll_daily_within_error_bound(spark):
    """events_hll_daily has no SQL oracle (HLL registers are
    engine-specific) — THIS is its correctness gate: per-day approx
    uniques within 5% of exact (rsd=1%, so 5% is a generous ceiling)."""
    import __spark_entry__ as e
    rows = e.queries()["events_hll_daily"](
        spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        assert abs(r["users_approx"] - r["users_exact"]) \
            <= max(1, 0.05 * r["users_exact"]), r


def test_decode_ppm_roundtrip_and_errors():
    """Spark-free decoder check: a numpy-built P6 payload (with a header
    comment) round-trips exactly; malformed payloads raise typed errors."""
    import numpy as np
    import pytest as _pt
    from engine.datawork.multimodal import decode_ppm
    img = np.arange(2 * 3 * 3, dtype=np.uint8).reshape(2, 3, 3)
    payload = b"P6\n# a comment\n3 2\n255\n" + img.tobytes()
    got = decode_ppm(payload)
    assert got.shape == (2, 3, 3) and (got == img).all()
    with _pt.raises(ValueError, match="not a P6"):
        decode_ppm(b"P5\n1 1\n255\n\x00")
    with _pt.raises(ValueError, match="truncated PPM pixel"):
        decode_ppm(payload[:-1])
    with _pt.raises(ValueError, match="geometry or maxval"):
        decode_ppm(b"P6\n3 2\n65535\n" + img.tobytes())


def test_image_stats_decodes_planted_pixels_and_channels_errors(spark):
    """image_stats must recover planted constant-channel pixel means from
    real P6 bytes, and route non-PPM mimes through the error column."""
    import numpy as np
    from engine.datawork.multimodal import PPM_MIME, image_stats
    img = np.zeros((3, 4, 3), dtype=np.uint8)
    img[..., 0], img[..., 1], img[..., 2] = 10, 20, 250
    good = b"P6\n4 3\n255\n" + img.tobytes()
    df = spark.createDataFrame(
        [("a", PPM_MIME, bytearray(good)),
         ("b", "image/png", bytearray(b"\x89PNG...")),
         ("c", PPM_MIME, bytearray(good[:-5]))],
        "asset_id string, mime string, payload binary")
    got = {r["asset_id"]: r for r in image_stats(df).collect()}
    a = got["a"]
    assert (a["img_width"], a["img_height"]) == (4, 3)
    assert (a["mean_r"], a["mean_g"], a["mean_b"]) == (10.0, 20.0, 250.0)
    assert a["error"] is None
    assert got["b"]["error"].startswith("NotImplementedError")
    assert got["c"]["error"] == "ValueError: truncated PPM pixel data"


def test_dedup_lines_differential_random_corpus(spark):
    """Seeded random-corpus differential: dedup_lines must equal a
    pure-Python reference on messy inputs — repeated lines within one doc,
    whitespace-only lines, empty docs, unicode."""
    import random
    rng = random.Random(20260817)
    pool = (["dup-" + str(i) for i in range(8)]
            + ["uniq-" + str(i) for i in range(300)]
            + ["", "   ", "\t", "héllo wörld", "唯一的行"])
    rows = [(i, "\n".join(rng.choice(pool)
                          for _ in range(rng.randint(0, 12))))
            for i in range(120)]
    from collections import Counter
    from engine.datawork.curation import dedup_lines
    min_count = 4
    freq = Counter(l for _, t in rows for l in t.split("\n")
                   if l.strip() != "")
    hot = {l for l, c in freq.items() if c >= min_count}
    expect = {}
    for i, t in rows:
        kept = [l for l in t.split("\n") if l not in hot]
        expect[i] = ("\n".join(kept), len(kept),
                     len(t.split("\n")) - len(kept))
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r["doc_id"]: (r["text"], r["n_kept"], r["n_dropped"])
           for r in dedup_lines(df, min_count=min_count).collect()}
    assert got == expect
    assert any(v[2] > 0 for v in got.values())  # the corpus had hot lines


def test_interval_join_differential_random(spark):
    """Seeded random points/intervals (including zero-length and
    bucket-boundary-straddling spans) vs the naive quadratic reference,
    at two bucket widths — output must be width-invariant."""
    import datetime as dt
    import random
    rng = random.Random(42)
    base = dt.datetime(2024, 3, 1)
    pts = [(i, base + dt.timedelta(seconds=rng.randint(0, 86_400)))
           for i in range(150)]
    ivs = []
    for j in range(60):
        s = rng.randint(0, 86_400)
        ivs.append((j, base + dt.timedelta(seconds=s),
                    base + dt.timedelta(seconds=s + rng.choice(
                        [0, 1, 59, 3600, 7200, 40_000]))))
    naive = {(p, j) for p, ts in pts for j, s, e in ivs if s <= ts <= e}
    from engine.datawork.ranges import interval_join
    pdf = spark.createDataFrame(pts, "pid int, ts timestamp")
    idf = spark.createDataFrame(
        ivs, "iid int, ts_start timestamp, ts_end timestamp")
    for width in (600, 7200):
        got = {(r["pid"], r["iid"]) for r in interval_join(
            pdf, idf, "ts", "ts_start", "ts_end",
            bucket_width_s=width).collect()}
        assert got == naive, f"width={width}"
    assert naive  # non-vacuous


def test_unigram_logprob_orders_common_over_rare(spark):
    """A doc of corpus-common tokens must score a LOWER mean NLL than a
    doc of hapaxes, values matching the closed form; empty docs → NULL."""
    import math
    from engine.datawork.corpus import unigram_logprob
    df = spark.createDataFrame(
        [(1, "the the the"), (2, "zzyx qwfp vbnk"), (3, "the zzyx"),
         (4, "   ")], "doc_id int, text string")
    got = {r["doc_id"]: r for r in unigram_logprob(df).collect()}
    # corpus: the×4, zzyx×2, qwfp×1, vbnk×1 → total=8, vocab=4
    nll = lambda c: -math.log((c + 1) / 12)
    assert got[1]["nll"] == round(nll(4), 6)
    assert got[2]["nll"] == round((nll(2) + nll(1) + nll(1)) / 3, 6)
    assert got[3]["nll"] == round((nll(4) + nll(2)) / 2, 6)
    assert got[1]["nll"] < got[3]["nll"] < got[2]["nll"]
    assert got[4]["nll"] is None and got[4]["n_tokens"] is None


def test_curate_funnel_monotone_and_consistent(spark, docs):
    """The composed funnel: counts non-increasing through the stages, and
    the sampled stage count equals the rows curate_corpus returns."""
    from engine.datawork.curation import curate_corpus, curate_funnel
    bucket = (F.conv(F.substring(F.md5(F.col("doc_id").cast("string")),
                                 1, 8), 16, 10).cast("long") % 100)
    corpus, bench = docs.filter(bucket >= 5), docs.filter(bucket < 5)
    funnel = {r["stage"]: r["n_docs"]
              for r in curate_funnel(corpus, bench, budget=20).collect()}
    assert list(funnel) == ["input", "quality", "dedup",
                            "decontaminated", "sampled"]
    assert (funnel["input"] >= funnel["quality"] >= funnel["dedup"]
            >= funnel["decontaminated"] >= funnel["sampled"])
    assert funnel["sampled"] > 0
    rows = curate_corpus(corpus, bench, budget=20).collect()
    assert len(rows) == funnel["sampled"]


# ---------------------------------------------------------------------------
# corpus versioning / mixing / splitting (round 5, third session)
# ---------------------------------------------------------------------------

def test_snapshot_diff_statuses(spark):
    from engine.datawork.corpus import snapshot_diff
    old = spark.createDataFrame(
        [(1, "a"), (2, "b"), (3, "c"), (4, None)],
        "doc_id bigint, text string")
    new = spark.createDataFrame(
        [(2, "b"), (3, "C2"), (4, ""), (5, "e")],
        "doc_id bigint, text string")
    got = {r.doc_id: r.status for r in snapshot_diff(old, new).collect()}
    # 2 unchanged (absent); 4: NULL text hashes like '' so unchanged too
    assert got == {1: "removed", 3: "changed", 5: "added"}


def test_mixture_sample_cap_and_drop(spark):
    from engine.datawork.curation import mixture_sample
    rows = [(i, "big" if i < 400 else ("small" if i < 420 else "out"))
            for i in range(440)]
    df = spark.createDataFrame(rows, "doc_id bigint, source string")
    out = mixture_sample(df, budget=40, weights={"big": 1, "small": 1},
                         group_col="source").collect()
    by = {}
    for r in out:
        by.setdefault(r.source, []).append(r)
    assert "out" not in by                      # unweighted group dropped
    # small's target (20) matches its population: cutoff caps, keeps all
    assert {r.cut_ppm for r in by["small"]} == {1_000_000}
    assert len(by["small"]) == 20
    # big keeps ~ budget/2 of 400 (hash draw, generous bounds)
    assert 5 <= len(by["big"]) <= 45
    with pytest.raises(ValueError):
        mixture_sample(df, budget=0, weights={"big": 1})
    with pytest.raises(ValueError):
        mixture_sample(df, budget=10, weights={})


def test_assign_splits_partition_and_stability(spark):
    from engine.datawork.curation import assign_splits
    df = spark.createDataFrame([(i,) for i in range(2000)], "doc_id bigint")
    out = {r.doc_id: r.split for r in
           assign_splits(df, train_pct=80, val_pct=10).collect()}
    assert len(out) == 2000
    n_train = sum(1 for v in out.values() if v == "train")
    assert 1450 <= n_train <= 1750               # ~80% under hash noise
    assert set(out.values()) == {"train", "val", "test"}
    # growth stability: the first 500 ids keep their splits verbatim
    small = {r.doc_id: r.split for r in
             assign_splits(df.filter("doc_id < 500"),
                           train_pct=80, val_pct=10).collect()}
    assert small == {k: v for k, v in out.items() if k < 500}
    with pytest.raises(ValueError):
        assign_splits(df, train_pct=0)


def test_quality_buckets_tiling_and_nulls(spark):
    from engine.datawork.corpus import quality_buckets
    rows = [(i, "en" if i < 10 else "de",
             None if i in (3, 7) else float(i)) for i in range(17)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, nll double")
    out = {r.doc_id: r for r in
           quality_buckets(df, score_col="nll").collect()}
    assert len(out) == 17
    # en: 10 rows -> tiles of 4/3/3; NULL scores sort LAST -> tail
    en = sorted((r.bucket, r.doc_id) for r in out.values() if r.lang == "en")
    assert [b for b, _ in en] == [1] * 4 + [2] * 3 + [3] * 3
    assert out[3].bucket == 3 and out[7].bucket == 3
    # non-null order respected: lowest scores land in head
    assert [d for b, d in en if b == 1] == [0, 1, 2, 4]
    assert {r.bucket_label for r in out.values()} == {"head", "middle",
                                                      "tail"}
    # n_buckets != 3 falls back to numeric labels
    lab = {r.bucket_label for r in
           quality_buckets(df, score_col="nll", n_buckets=2).collect()}
    assert lab == {"b1", "b2"}


def test_stratified_sample_quota_and_determinism(spark):
    import hashlib
    from engine.datawork.corpus import stratified_sample
    rows = [(i, "en" if i % 3 else "de", f"t{i}") for i in range(100)]
    df = spark.createDataFrame(rows, "doc_id bigint, lang string, text string")
    out = stratified_sample(df, per_group=10, group_col="lang").collect()
    by_g = {}
    for r in out:
        by_g.setdefault(r.lang, []).append(r.doc_id)
    assert sorted(len(v) for v in by_g.values()) == [10, 10]
    # the pick is exactly the first 10 ids in md5 order per group
    for g, ids in by_g.items():
        pool = [i for i, lg, _ in rows if lg == g]
        want = sorted(pool, key=lambda i: (
            hashlib.md5(str(i).encode()).hexdigest(), i))[:10]
        assert sorted(ids) == sorted(want)
    # quota above group size returns the whole group
    small = stratified_sample(df.filter("doc_id < 4"), per_group=10,
                              group_col="lang").count()
    assert small == 4
    # schema passthrough: extra columns survive
    assert {"doc_id", "lang", "text"} == set(out[0].asDict())


def test_semdedup_drops_planted_twin_keeps_singletons(spark):
    """SemDeDup on a corpus with one planted identical twin: exactly the
    higher-ranked copy drops; orthogonal singletons all survive. Invariants:
    every loser's cosine >= tau and its keeper sits in the same cell."""
    from engine.datawork.similarity import semdedup_losers
    dim = 64
    base = [[0.0] * dim for _ in range(4)]
    base[0][0] = 1.0                      # e0
    base[1][0] = 1.0                      # e0 twin (identical)
    base[2][1] = 1.0                      # e1 (orthogonal)
    base[3][2] = 1.0                      # e2 (orthogonal)
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(base)],
        "vec_id bigint, embedding array<double>")
    losers = semdedup_losers(df, threshold=0.95, n_cells=2).collect()
    assert len(losers) == 1
    (row,) = losers
    assert {row["id"], row["kept_id"]} == {0, 1}
    assert row["cosine"] >= 0.95
    # multi-probe must agree on this fully-contained cluster (the global
    # keep order makes mutual drops impossible)
    l2 = semdedup_losers(df, threshold=0.95, n_cells=2, nprobe=2).collect()
    assert len(l2) == 1 and {l2[0]["id"], l2[0]["kept_id"]} == {0, 1}


def test_semdedup_max_cluster_guard_and_partition_independence(spark, emb):
    """max_cluster below every cluster size -> zero pairs (all kept);
    and the loser set is identical across input partitionings."""
    from engine.datawork.similarity import semdedup_losers, train_kmeans
    cent = train_kmeans(emb)
    assert semdedup_losers(emb, threshold=0.35, centroids=cent,
                           max_cluster=1).count() == 0
    key = lambda r: (r["id"], r["cell"], r["kept_id"], r["cosine"])  # noqa: E731
    a = sorted(map(key, semdedup_losers(
        emb.repartition(1), threshold=0.35, centroids=cent).collect()))
    b = sorted(map(key, semdedup_losers(
        emb.repartition(13), threshold=0.35, centroids=cent).collect()))
    assert a == b and len(a) > 0


def test_dsir_prefers_target_like_docs(spark):
    """Docs phrased like the target corpus must outrank docs phrased like
    the raw background; weights are partitioning-independent."""
    from engine.datawork.dsir import dsir_select, dsir_weights
    target = spark.createDataFrame(
        [(100 + i, "the theorem follows from the lemma") for i in range(5)],
        "doc_id bigint, text string")
    raw_rows = ([(i, "the theorem follows from the lemma") for i in range(3)]
                + [(10 + i, "buy cheap pills online now") for i in range(3)]
                + [(20, ""), (21, "   ")])
    raw = spark.createDataFrame(raw_rows, "doc_id bigint, text string")
    w = {r["doc_id"]: r for r in dsir_weights(raw, target).collect()}
    assert len(w) == 8
    assert all(w[i]["log_weight"] is None for i in (20, 21))  # no grams
    assert min(w[i]["log_weight"] for i in (0, 1, 2)) > \
        max(w[i]["log_weight"] for i in (10, 11, 12))
    sel = dsir_select(raw, target, budget=3).collect()
    assert sorted(r["doc_id"] for r in sel) == [0, 1, 2]
    a = sorted((r["doc_id"], r["log_weight"]) for r in
               dsir_weights(raw.repartition(1), target).collect())
    b = sorted((r["doc_id"], r["log_weight"]) for r in
               dsir_weights(raw.repartition(7), target).collect())
    assert a == b


def test_dedup_lines_max_hot_caps_to_hottest(spark):
    """max_hot=1 drops only the single hottest line; the cooler hot line
    survives by construction (not by broadcast-limit accident)."""
    from engine.datawork.curation import dedup_lines
    rows = [(i, "BANNER\nunique line %d%s" % (
        i, "\nFOOTER" if i < 3 else "")) for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id bigint, text string")
    # BANNER x5, FOOTER x3 are both hot at min_count=2
    full = {r["doc_id"]: r for r in dedup_lines(df).collect()}
    assert full[0]["n_dropped"] == 2
    capped = {r["doc_id"]: r for r in
              dedup_lines(df, max_hot=1).collect()}
    assert capped[0]["n_dropped"] == 1
    assert "FOOTER" in capped[0]["text"] and "BANNER" not in capped[0]["text"]


def test_classifier_scores_frozen_weights(spark):
    """The committed weight table must score the corpus deterministically
    and track its training signal: mean score of high-stopword-density
    docs > mean score of low-density docs. Empty docs -> NULLs."""
    from engine.datawork.quality import classifier_scores, load_qc_weights
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    w = load_qc_weights(spark)
    out = {r["doc_id"]: r for r in classifier_scores(docs, w).collect()}
    assert len(out) == docs.count()
    scored = [r for r in out.values() if r["score"] is not None]
    assert scored and all(0.0 <= r["score"] <= 1.0 for r in scored)
    from engine.datawork.textstats import STOPWORDS
    stops = set(STOPWORDS["en"])
    texts = {r["doc_id"]: r["text"] for r in docs.collect()}

    def dens(t):
        toks = (t or "").strip().lower().split()
        return sum(x in stops for x in toks) / len(toks) if toks else 0.0

    hi = [out[i]["score"] for i in out
          if out[i]["score"] is not None and dens(texts[i]) >= 0.08]
    lo = [out[i]["score"] for i in out
          if out[i]["score"] is not None and dens(texts[i]) <= 0.04]
    assert hi and lo
    assert sum(hi) / len(hi) > sum(lo) / len(lo)
    empt = spark.createDataFrame([(1, ""), (2, None)],
                                 "doc_id bigint, text string")
    rows = classifier_scores(empt, w).collect()
    assert all(r["score"] is None for r in rows)


def test_chunk_documents_window_layout(spark):
    """Exact window math: n<=max -> 1 chunk; overlap = max-stride; the
    tail chunk is shorter but never empty; empty docs vanish."""
    from engine.datawork.corpus import chunk_documents
    mk = lambda n: " ".join(f"w{i}" for i in range(n))  # noqa: E731
    df = spark.createDataFrame(
        [(1, mk(5)), (2, mk(10)), (3, mk(23)), (4, ""), (5, None)],
        "doc_id bigint, text string")
    out = {}
    for r in chunk_documents(df, max_tokens=10, stride=6).collect():
        out.setdefault(r["doc_id"], []).append(r)
    assert set(out) == {1, 2, 3}
    assert len(out[1]) == 1 and out[1][0]["n_tokens"] == 5
    assert len(out[2]) == 1 and out[2][0]["n_tokens"] == 10
    # n=23: ceil((23-10)/6)=3 extra -> 4 chunks at offsets 0,6,12,18
    assert [r["n_tokens"] for r in sorted(out[3],
            key=lambda r: r["chunk_idx"])] == [10, 10, 10, 5]
    c1 = sorted(out[3], key=lambda r: r["chunk_idx"])[1]
    assert c1["text"].split() == [f"w{i}" for i in range(6, 16)]
    import pytest as _pt
    with _pt.raises(ValueError):
        chunk_documents(df, max_tokens=4, stride=5)


def test_char_entropy_known_values(spark):
    """Closed-form checks: one repeated char -> 0; 'ab' -> ln 2;
    empty/NULL -> NULL."""
    import math
    from engine.datawork.textstats import char_entropy
    df = spark.createDataFrame(
        [(1, "aaaa"), (2, "ab"), (3, ""), (4, None), (5, "aabb")],
        "doc_id bigint, text string")
    out = {r["doc_id"]: r for r in char_entropy(df).collect()}
    assert out[1]["entropy"] == 0.0 and out[1]["n_chars"] == 4
    assert out[2]["entropy"] == round(math.log(2), 6)
    assert out[5]["entropy"] == round(math.log(2), 6)
    assert out[3]["entropy"] is None and out[4]["entropy"] is None


def test_decode_wav_parser_edges():
    """Pure-python parser: stereo frames, unknown chunks skipped with odd
    padding, and every malformed shape raises (never returns junk)."""
    import struct

    import numpy as np
    import pytest as _pt
    from engine.datawork.multimodal import decode_wav

    def wav(rate=8000, ch=1, frames=(), fmt=1, bits=16, extra=b""):
        data = b"".join(struct.pack("<h", v) for f in frames for v in f)
        return (b"RIFF" + struct.pack("<I", 36 + len(extra) + len(data))
                + b"WAVE" + extra
                + b"fmt " + struct.pack("<IHHIIHH", 16, fmt, ch, rate,
                                        rate * ch * 2, ch * 2, bits)
                + b"data" + struct.pack("<I", len(data)) + data)

    rate, ch, s = decode_wav(wav(frames=[(1,), (-2,), (32767,), (-32768,)]))
    assert (rate, ch) == (8000, 1)
    assert s[:, 0].tolist() == [1, -2, 32767, -32768]
    # stereo + an unknown ODD-sized chunk before fmt (pad byte honored)
    junk = b"LIST" + struct.pack("<I", 3) + b"abc" + b"\x00"
    rate, ch, s = decode_wav(wav(ch=2, frames=[(1, -1), (2, -2)],
                                 extra=junk))
    assert ch == 2 and s.shape == (2, 2) and s[1].tolist() == [2, -2]
    assert np.abs(s).max() == 2
    for bad in [b"", b"RIFFxxxxWAVE", wav(fmt=3), wav(bits=8),
                wav(frames=[(1,), (2,)])[:-1]]:
        with _pt.raises(ValueError):
            decode_wav(bad)


def test_audio_stats_error_channel_never_throws(spark):
    """Junk payloads land in the error column; the WAV row decodes."""
    import struct
    from engine.datawork.multimodal import WAV_MIME, audio_stats
    data = struct.pack("<hh", 100, -200)
    good = (b"RIFF" + struct.pack("<I", 40) + b"WAVE"
            + b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, 4000, 8000, 2, 16)
            + b"data" + struct.pack("<I", 4) + data)
    df = spark.createDataFrame(
        [("a", WAV_MIME, bytearray(good)),
         ("b", WAV_MIME, bytearray(b"garbage")),
         ("c", "audio/mpeg", bytearray(good))],
        "asset_id string, mime string, payload binary")
    out = {r["asset_id"]: r for r in audio_stats(df).collect()}
    assert out["a"]["error"] is None and out["a"]["peak"] == 200
    assert out["a"]["mean_abs"] == 150.0 and out["a"]["n_frames"] == 2
    assert "ValueError" in out["b"]["error"]
    assert "NotImplementedError" in out["c"]["error"]


def test_quantiles_approx_within_rank_error(spark):
    """events_quantiles_approx has no SQL oracle (sketch internals are
    engine-specific); the gate is the rank-error bound instead: at
    accuracy=10000 the sketch's p50/p99 must land within 1 percentile
    rank of the exact distribution per group."""
    import __spark_entry__ as e
    rows = e.queries()["events_quantiles_approx"](
        spark, "/root/testdata/sf0.01").collect()
    assert rows
    ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
    import pyspark.sql.functions as F
    for r in rows:
        vals = sorted(v["value"] for v in
                      ev.filter(F.col("event_type") == r["event_type"])
                      .select("value").collect())
        n = len(vals)
        for p, approx in ((0.5, r["p50_approx"]), (0.99, r["p99_approx"])):
            import bisect
            rank = bisect.bisect_left(vals, approx) / n
            assert abs(rank - p) <= 0.011, (r["event_type"], p, rank)


def test_profile_table_exact_and_approx(spark):
    """Exact profile matches hand counts incl. null accounting; the
    approx spelling keeps the same schema and lands within HLL error."""
    from engine.datawork.corpus import profile_table
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "a"), (None, "b")],
        "id bigint, s string")
    out = {r["column"]: r for r in profile_table(df).collect()}
    assert out["id"]["n"] == 4 and out["id"]["n_null"] == 1
    assert out["id"]["n_distinct"] == 3
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 2
    appr = {r["column"]: r for r in
            profile_table(df, exact=False).collect()}
    assert set(appr) == {"id", "s"}
    assert abs(appr["id"]["n_distinct"] - 3) <= 1


def test_sequential_funnel_order_and_guard(spark):
    """min-after semantics: a purchase BEFORE the first view does not
    convert; the max_events cap excludes the bot and the census sees it."""
    from datetime import datetime as dt
    from engine.datawork.funnel import funnel_user_census, sequential_funnel
    t = lambda m: dt(2024, 1, 1, 0, m)  # noqa: E731
    rows = [
        (1, "view", t(1)), (1, "click", t(2)), (1, "purchase", t(3)),
        (2, "purchase", t(1)), (2, "view", t(2)), (2, "click", t(3)),
        (3, "click", t(1)), (3, "view", t(2)),
    ] + [(9, "view", t(i % 50)) for i in range(100)]  # the bot
    df = spark.createDataFrame(
        rows, "user_id bigint, event_type string, ts timestamp")
    (r,) = sequential_funnel(df, ["view", "click", "purchase"]).collect()
    # users 1,2,3,9 viewed; 1 and 2 clicked after first view; only 1
    # purchased after that click (user 2's purchase preceded the view)
    assert (r["n_view"], r["n_view_click"],
            r["n_view_click_purchase"]) == (4, 2, 1)
    (c,) = sequential_funnel(df, ["view", "click", "purchase"],
                             max_events=50).collect()
    assert c["n_view"] == 3  # the bot is excluded, conversions intact
    assert (c["n_view_click"], c["n_view_click_purchase"]) == (2, 1)
    (cen,) = funnel_user_census(df, ["view", "click", "purchase"],
                                max_events=50).collect()
    assert (cen["n_entities"], cen["n_capped"],
            cen["capped_events"]) == (4, 1, 100)


def test_datawork_job_cli_selection_ops(spark):
    """Dispatch coverage for the round-5 selection CLI ops (values
    covered by their own tests/oracles; here: the ops run end-to-end
    through run_op with the documented flags)."""
    from engine.datawork.job import run_op
    d = "/root/testdata/sf0.001/documents.parquet"
    e = "/root/testdata/sf0.001/embeddings.parquet"
    total = spark.read.parquet(d).count()
    assert run_op(spark, "dsir-weights", d, bench_path=d).count() == total
    assert run_op(spark, "dsir-select", d, bench_path=d,
                  budget=5).count() == 5
    assert run_op(spark, "classify", d).count() == total
    assert run_op(spark, "semdedup", e, threshold=0.35).count() > 0
    ch = run_op(spark, "chunk", d, pack_budget=64)
    assert ch.count() >= spark.read.parquet(d) \
        .filter("trim(coalesce(text, '')) <> ''").count()
    assert run_op(spark, "entropy", d).count() == total


def test_chunk_documents_coverage_property(spark):
    """Property over 60 doc lengths (1..600, odd shapes included): the
    chunk count matches the closed form, every token index is covered by
    at least one window, and per-chunk token counts sum to n plus the
    overlap double-count — all checked against a pure-python reference."""
    from engine.datawork.corpus import chunk_documents
    maxt, stride = 20, 13
    lens = list(range(1, 30)) + [63, 64, 65, 99, 128, 200, 333, 600]
    df = spark.createDataFrame(
        [(n, " ".join(f"t{i}" for i in range(n))) for n in lens],
        "doc_id bigint, text string")
    got = {}
    for r in chunk_documents(df, max_tokens=maxt, stride=stride).collect():
        got.setdefault(r["doc_id"], []).append(r)
    for n in lens:
        ref_chunks = 1 + max(0, -(-(n - maxt) // stride)) if n > maxt else 1
        rows = sorted(got[n], key=lambda r: r["chunk_idx"])
        assert len(rows) == ref_chunks, n
        covered = set()
        for r in rows:
            k = r["chunk_idx"]
            toks = r["text"].split()
            assert toks == [f"t{i}" for i in
                            range(k * stride,
                                  min(n, k * stride + maxt))], (n, k)
            assert r["n_tokens"] == len(toks)
            covered.update(range(k * stride, k * stride + len(toks)))
        assert covered == set(range(n)), n


def test_decode_gif_meta_parser_edges():
    """Container-walk edges the driver query doesn't plant: global AND
    local color tables, interleaved extensions, multi-sub-block LZW
    data; malformed shapes raise."""
    import pytest as _pt
    from engine.datawork.multimodal import decode_gif_meta

    def gif(frames=1, gct=False, lct=False, trailer=True):
        b = bytearray(b"GIF89a")
        b += (7).to_bytes(2, "little") + (5).to_bytes(2, "little")
        b += bytes([0x80 | 0x02 if gct else 0, 0, 0])
        if gct:
            b += bytes(3 * (2 << 2))     # 8-entry global table
        for _ in range(frames):
            b += bytes([0x21, 0xFE, 3]) + b"abc" + bytes([0])  # comment ext
            b += bytes([0x2C, 0, 0, 0, 0, 2, 0, 2, 0,
                        0x80 | 0x01 if lct else 0])
            if lct:
                b += bytes(3 * (2 << 1))  # 4-entry local table
            b += bytes([2])               # LZW min code size
            b += bytes([4]) + b"\x01\x02\x03\x04"  # sub-block 1
            b += bytes([2]) + b"\x05\x06" + bytes([0])  # sub-block 2 + end
        if trailer:
            b += bytes([0x3B])
        return bytes(b)

    assert decode_gif_meta(gif(frames=3)) == (7, 5, 3)
    assert decode_gif_meta(gif(frames=2, gct=True, lct=True)) == (7, 5, 2)
    for bad in [b"", b"GIF89a" + bytes(5), gif(trailer=False),
                gif(frames=0), b"NOTAGIFXXXXXXX"]:
        with _pt.raises(ValueError):
            decode_gif_meta(bad)


def test_containment_catches_superset_jaccard_misses(spark):
    """The motivating case: a big page embedding a small article whole.
    Jaccard is diluted below threshold; containment(article in page) = 1."""
    from engine.datawork.dedup import (ngram_containment_pairs,
                                       ngram_jaccard_pairs)
    art = " ".join(f"a{i}" for i in range(20))
    page = art + " " + " ".join(f"b{i}" for i in range(120))
    df = spark.createDataFrame(
        [(1, art), (2, page)], "doc_id bigint, text string")
    assert ngram_jaccard_pairs(df, threshold=0.5).count() == 0
    rows = ngram_containment_pairs(df, threshold=0.9).collect()
    assert len(rows) == 1
    (r,) = rows
    assert (r["id_contained"], r["id_container"]) == (1, 2)
    assert r["containment"] == 1.0 and r["jaccard"] < 0.5


def test_datawork_job_cli_index_ops(spark, tmp_path):
    """Dispatch coverage for the r6 persisted-index lifecycle ops: build →
    append → probe → compact for both the MinHash text index and the
    banded embedding index (values covered by test_incremental /
    test_embed_incremental; here the CLI wiring runs end-to-end)."""
    from engine.datawork.job import run_op
    d = "/root/testdata/sf0.001/documents.parquet"
    e = "/root/testdata/sf0.001/embeddings.parquet"
    docs = spark.read.parquet(d)
    half = docs.filter("doc_id % 2 = 0")
    half.write.mode("overwrite").parquet(str(tmp_path / "corpus"))
    wave = docs.filter("doc_id % 2 = 1")
    wave.write.mode("overwrite").parquet(str(tmp_path / "wave"))
    idx = str(tmp_path / "midx")
    assert run_op(spark, "index-build", str(tmp_path / "corpus"),
                  index_path=idx).count() == 1
    assert run_op(spark, "index-append", str(tmp_path / "wave"),
                  index_path=idx).count() == 1
    probe = run_op(spark, "index-probe", str(tmp_path / "wave"),
                   index_path=idx, threshold=0.5)
    assert set(probe.columns) == {"id_a", "id_b", "est_jaccard", "origin"}
    rep = run_op(spark, "index-compact", str(tmp_path / "corpus"),
                 index_path=idx)
    assert {r["table"] for r in rep.collect()} == {"sigs", "buckets",
                                                   "stats"}
    eidx = str(tmp_path / "eidx")
    assert run_op(spark, "embed-index-build", e,
                  index_path=eidx).count() == 1
    ep = run_op(spark, "embed-index-probe", e, index_path=eidx,
                threshold=0.35)
    assert set(ep.columns) == {"id_a", "id_b", "cosine", "origin"}
    erep = run_op(spark, "embed-index-compact", e, index_path=eidx)
    assert {r["table"] for r in erep.collect()} == {"vectors", "buckets",
                                                    "stats"}
