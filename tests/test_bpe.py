"""BPE tokenizer: hand-verified merges, encode semantics, Spark parity."""

from __future__ import annotations

from engine.core.bpe import (END, build_ranks, count_tokens, encode_text,
                             encode_word, train_merges)

# the classic Sennrich corpus
CORPUS = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


def test_train_merges_hand_verified():
    """First five merges computed by hand: (e,s)=9, (es,t)=9, (est,</w>)=9,
    then the (l,o)/(o,w) tie at 7 broken lexicographically."""
    merges = train_merges(CORPUS, 5)
    assert merges == [("e", "s"), ("es", "t"), ("est", END),
                      ("l", "o"), ("lo", "w")]


def test_encode_uses_learned_merges():
    ranks = build_ranks(train_merges(CORPUS, 5))
    assert encode_word("lowest", ranks) == ("low", "est" + END)
    assert encode_word("newest", ranks) == ("n", "e", "w", "est" + END)
    # unseen characters stay as singles, end marker intact
    assert encode_word("xyz", ranks) == ("x", "y", "z", END)


def test_tokens_concatenate_back_to_words():
    ranks = build_ranks(train_merges(CORPUS, 5))
    for w in ("lowest", "widest", "low", "zzz"):
        toks = encode_word(w, ranks)
        assert "".join(toks) == w + END


def test_encode_text_and_count():
    ranks = build_ranks(train_merges(CORPUS, 5))
    toks = encode_text("  Lowest LOWEST\nnewest ", ranks)
    assert toks == ["low", "est" + END] * 2 + ["n", "e", "w", "est" + END]
    assert count_tokens("lowest newest", ranks) == 6
    assert count_tokens("", ranks) == 0
    assert count_tokens("   ", ranks) == 0


def test_frozen_merges_are_loadable_and_stable():
    """The committed table must round-trip and the encoder must compress
    (fewer tokens than characters) on corpus-like text."""
    from engine.core.bpe import load_merges
    from engine.datawork.tokenize import DEFAULT_MERGES
    merges = load_merges(DEFAULT_MERGES)
    assert len(merges) == 512
    ranks = build_ranks(merges)
    text = "the revenue of the company increased in the third quarter"
    n = count_tokens(text, ranks)
    assert 0 < n < len(text.replace(" ", ""))


def test_spark_udf_matches_pure_python(spark):
    """Invariant #1: the UDF body and the oracle are the same code —
    verify on a real slice anyway (Arrow round-trip, NULL handling)."""
    import hashlib

    from engine.core.bpe import build_ranks, encode_text, load_merges
    from engine.datawork.tokenize import DEFAULT_MERGES, with_bpe_tokens
    rows = [(0, "The LOWEST newest offer"), (1, ""), (2, None),
            (3, "revenue up 14% — margin däta\ttabs")]
    df = spark.createDataFrame(rows, "doc_id: long, text: string")
    got = {r["doc_id"]: (r["n_tokens"], r["tokens_md5"])
           for r in with_bpe_tokens(df).collect()}
    ranks = build_ranks(load_merges(DEFAULT_MERGES))
    for doc_id, text in rows:
        toks = encode_text(text or "", ranks)
        md5 = hashlib.md5(" ".join(toks).encode()).hexdigest()
        assert got[doc_id] == (len(toks), md5)
