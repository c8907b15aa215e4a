"""Exact-substring dedup: duplicate_ngram_spans / drop_duplicate_spans
vs a brute-force pure-Python oracle, plus hand-checked edge cases."""
from __future__ import annotations

import hashlib
import random

import pytest

from engine.datawork.substrings import (drop_duplicate_spans,
                                        duplicate_ngram_spans)


# ---------------------------------------------------------------- oracle
def _brute(corpus: dict[int, str], n: int, min_count: int):
    """Reference implementation: count every n-token window, merge
    overlapping-or-touching duplicated windows into spans per doc."""
    toks = {d: [t for t in text.strip().split() if t]
            for d, text in corpus.items()}
    counts: dict[str, int] = {}
    for ts in toks.values():
        for i in range(len(ts) - n + 1):
            g = " ".join(ts[i:i + n])
            counts[g] = counts.get(g, 0) + 1
    spans: dict[int, list[list[int]]] = {}
    for d, ts in toks.items():
        cur: list[list[int]] = []
        for i in range(len(ts) - n + 1):
            if counts[" ".join(ts[i:i + n])] < min_count:
                continue
            if cur and i <= cur[-1][1]:
                cur[-1][1] = max(cur[-1][1], i + n)
                cur[-1][2] += 1
            else:
                cur.append([i, i + n, 1])
        spans[d] = cur
    return toks, spans


def _df(spark, corpus):
    return spark.createDataFrame(
        [(d, t) for d, t in corpus.items()], "doc_id long, text string")


def _planted(n_docs=60, seed=7):
    """Random-word docs with a shared boilerplate phrase planted at a
    varying offset, doubled in some docs (within-doc repeat)."""
    rng = random.Random(seed)
    vocab = [f"w{i}" for i in range(40)]
    boiler = "terms of service apply to all posted content"
    corpus = {}
    for d in range(n_docs):
        words = [rng.choice(vocab) for _ in range(rng.randint(5, 30))]
        pos = rng.randint(0, len(words))
        words[pos:pos] = boiler.split()
        if d % 5 == 0:
            words += boiler.split()
        corpus[d] = " ".join(words)
    return corpus


@pytest.mark.parametrize("n,min_count", [(6, 2), (4, 3)])
def test_spans_match_brute_force(spark, n, min_count):
    corpus = _planted()
    _, exp = _brute(corpus, n, min_count)
    got = {}
    rows = duplicate_ngram_spans(_df(spark, corpus), n=n,
                                 min_count=min_count).collect()
    for r in rows:
        got.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_windows))
    for d, sp in exp.items():
        want = sorted((s, e, w) for s, e, w in sp)
        assert sorted(got.get(d, [])) == want, f"doc {d}"
    assert set(got) == {d for d, sp in exp.items() if sp}


def test_span_text_is_the_covered_slice(spark):
    corpus = _planted(n_docs=20)
    toks, _ = _brute(corpus, 6, 2)
    for r in duplicate_ngram_spans(_df(spark, corpus), n=6).collect():
        assert r.span_text == " ".join(
            toks[r.doc_id][r.span_start:r.span_end])


def test_apply_matches_brute_force(spark):
    corpus = _planted()
    toks, spans = _brute(corpus, 6, 2)
    out = {r.doc_id: r for r in
           drop_duplicate_spans(_df(spark, corpus), n=6).collect()}
    assert set(out) == set(corpus)
    for d, ts in toks.items():
        cov = set()
        for s, e, _ in spans[d]:
            cov.update(range(s, e))
        kept = [t for i, t in enumerate(ts) if i not in cov]
        assert out[d].text == " ".join(kept)
        assert out[d].n_kept == len(kept)
        assert out[d].n_dropped == len(ts) - len(kept)


def test_edges(spark):
    corpus = {
        0: "a b c d e f g",          # one copy of the phrase
        1: "x a b c d e f y",        # second copy (shifted)
        2: "",                       # empty doc
        3: "   ",                    # whitespace-only
        4: "short text",             # shorter than n
        5: "a b c d e f a b c d e f",  # within-doc repeat, touching spans
    }
    spans = {}
    for r in duplicate_ngram_spans(_df(spark, corpus), n=6).collect():
        spans.setdefault(r.doc_id, []).append(
            (r.span_start, r.span_end, r.n_windows, r.span_text))
    # the shared 6-gram "a b c d e f" duplicates; windows containing
    # g/x/y are unique
    assert spans[0] == [(0, 6, 1, "a b c d e f")]
    assert spans[1] == [(1, 7, 1, "a b c d e f")]
    # doc 5: windows at 0 and 6 duplicate ("a b c d e f" occurs 4x in
    # the corpus); they touch (gap 0) so coverage merges to one span.
    # The straddling windows (e.g. "b c d e f a") occur twice WITHIN the
    # corpus? no — only doc 5 has them, once each -> not duplicated.
    assert spans[5] == [(0, 12, 2, "a b c d e f a b c d e f")]
    assert 2 not in spans and 3 not in spans and 4 not in spans

    out = {r.doc_id: r for r in
           drop_duplicate_spans(_df(spark, corpus), n=6).collect()}
    assert out[0].text == "g" and out[0].n_dropped == 6
    assert out[1].text == "x y"
    assert out[2].text == "" and out[2].n_kept == 0
    assert out[3].text == ""
    assert out[4].text == "short text" and out[4].n_dropped == 0
    assert out[5].text == "" and out[5].n_dropped == 12


def test_min_count_threshold(spark):
    corpus = {0: "p q r s t u tail0", 1: "p q r s t u tail1",
              2: "p q r s t u tail2"}
    # phrase occurs 3x: min_count=4 finds nothing, 3 finds all
    assert duplicate_ngram_spans(_df(spark, corpus), n=6,
                                 min_count=4).count() == 0
    rows = duplicate_ngram_spans(_df(spark, corpus), n=6,
                                 min_count=3).collect()
    assert sorted((r.doc_id, r.span_start, r.span_end) for r in rows) == [
        (0, 0, 6), (1, 0, 6), (2, 0, 6)]


# ------------------------------------------------------------- winnowing
def _brute_winnow(corpus, k, w):
    fps = {}
    for d, text in corpus.items():
        ts = [t for t in text.strip().split() if t]
        hs = [hashlib.md5(" ".join(ts[i:i + k]).encode()).hexdigest()
              for i in range(len(ts) - k + 1)]
        sel = set()
        for p in range(len(hs) - w + 1):
            win = [(hs[p + j], p + j) for j in range(w)]
            sel.add(min(win))
        fps[d] = {(pos, h) for h, pos in sel}
    return fps


def test_winnow_matches_brute_force(spark):
    from engine.datawork.substrings import winnow_fingerprints
    corpus = _planted(n_docs=40, seed=11)
    exp = _brute_winnow(corpus, 4, 5)
    got = {}
    for r in winnow_fingerprints(_df(spark, corpus), k=4, w=5).collect():
        got.setdefault(r.doc_id, set()).add((r.pos, r.gram))
    assert got == {d: s for d, s in exp.items() if s}


def test_winnow_guarantee_and_density(spark):
    from engine.datawork.substrings import winnow_fingerprints
    # two docs share a long run; winnowing must fingerprint it in both
    shared = "q r s t u v w x y z"        # 10 tokens >= w+k-1 = 8
    corpus = {0: "a b c " + shared + " d e f",
              1: "m n " + shared + " o p"}
    fp = {}
    for r in winnow_fingerprints(_df(spark, corpus), k=4, w=5).collect():
        fp.setdefault(r.doc_id, set()).add(r.gram)
    assert fp[0] & fp[1], "shared run must share a fingerprint"


def test_winnow_similar_pairs(spark):
    from engine.datawork.substrings import winnow_similar_pairs
    corpus = _planted(n_docs=30, seed=3)
    exp_fp = _brute_winnow(corpus, 4, 5)
    # brute pairs with the same df guard
    from collections import Counter
    df_cnt = Counter()
    grams = {d: {h for _, h in s} for d, s in exp_fp.items()}
    for d, gs in grams.items():
        for g in gs:
            df_cnt[g] += 1
    keep = {g for g, c in df_cnt.items() if 2 <= c <= 1000}
    exp = {}
    docs = sorted(grams)
    for i, a in enumerate(docs):
        for b in docs[i + 1:]:
            n = len(grams[a] & grams[b] & keep)
            if n >= 2:
                exp[(a, b)] = n
    got = {(r.id_a, r.id_b): r.n_shared for r in
           winnow_similar_pairs(_df(spark, corpus), k=4, w=5,
                                min_shared=2).collect()}
    assert got == exp and exp, "planted boilerplate must produce pairs"


# ------------------------------------------------------- decontamination
def test_decontaminate_spans(spark):
    from engine.datawork.substrings import decontaminate_spans
    bench = {100: "What is the answer to life the universe and everything",
             101: "name the CAPITAL of france please now"}
    corpus = {
        0: "intro words THE ANSWER to life the universe and everything "
           "trailing thoughts",                       # case-insens. hit
        1: "nothing shared with any benchmark document here at all ok",
        2: "name the capital of france please now",   # fully contaminated
        3: "",                                        # empty
    }
    # brute force: case-insensitive n-gram membership, n=6
    n = 6
    bgrams = set()
    for t in bench.values():
        ts = t.lower().split()
        for i in range(len(ts) - n + 1):
            bgrams.add(" ".join(ts[i:i + n]))
    exp = {}
    for d, t in corpus.items():
        ts = [x for x in t.strip().split() if x]
        low = [x.lower() for x in ts]
        cov = set()
        for i in range(len(ts) - n + 1):
            if " ".join(low[i:i + n]) in bgrams:
                cov.update(range(i, i + n))
        kept = [t_ for i, t_ in enumerate(ts) if i not in cov]
        exp[d] = (" ".join(kept), len(kept), len(ts) - len(kept))
    out = {r.doc_id: (r.text, r.n_kept, r.n_dropped) for r in
           decontaminate_spans(_df(spark, corpus),
                               _df(spark, bench)).collect()}
    assert out == exp
    assert out[0][2] > 0 and out[2][0] == "" and out[1][2] == 0
