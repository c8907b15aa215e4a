"""SFT example assembly: window semantics vs a brute-force Python model."""

from __future__ import annotations

import hashlib

import pytest

from engine.datawork.sft import CTX_SEP, sft_examples, sft_examples_budget


def _md5(s: str) -> str:
    return hashlib.md5(s.encode("utf-8")).hexdigest()


def _render(role, text) -> str:
    return f"<|{role or ''}|>\n{text or ''}"


def _brute(rows, *, ctx_turns=None, ctx_budget=None, target_role="assistant"):
    """Reference model: per conversation, walk turns in idx order and
    assemble each target's context literally."""
    convs: dict = {}
    for conv, idx, role, text in rows:
        convs.setdefault(conv, []).append((idx, role, text))
    out = {}
    for conv, turns in convs.items():
        turns.sort()
        for i, (idx, role, text) in enumerate(turns):
            if (role or "") != target_role:
                continue
            prior = turns[:i]
            if ctx_turns is not None:
                take = prior[-ctx_turns:]
            else:
                take, total = [], 0
                for p in reversed(prior):
                    c = len(_render(p[1], p[2])) + 2
                    if total + c > ctx_budget:
                        break
                    take.insert(0, p)
                    total += c
            if not take:
                continue
            ctx = CTX_SEP.join(_render(r, t) for _, r, t in take)
            tgt = text or ""
            out[(conv, idx)] = (len(take), len(ctx), _md5(ctx),
                                len(tgt), _md5(tgt))
    return out


ROWS = [
    ("c1", 0, "user", "hello there"),
    ("c1", 1, "assistant", "hi! how can I help?"),
    ("c1", 2, "tool", "lookup(weather)"),
    ("c1", 3, "assistant", "it is sunny"),
    ("c1", 4, "user", "thanks"),
    ("c1", 5, "assistant", "anytime"),
    ("c2", 0, "assistant", "orphan target: no context, dropped"),
    ("c2", 1, "user", "x" * 300),
    ("c2", 2, "assistant", "long-context target"),
    ("c3", 0, None, None),
    ("c3", 1, "assistant", "after a null turn"),
]


def _collect(df):
    return {(r.conv_id, r.turn_idx): (r.n_ctx, r.ctx_chars, r.ctx_md5,
                                      r.target_chars, r.target_md5)
            for r in df.collect()}


@pytest.mark.parametrize("k", [1, 2, 8])
def test_fixed_window_matches_brute(spark, k):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    got = _collect(sft_examples(df, ctx_turns=k))
    assert got == _brute(ROWS, ctx_turns=k)


@pytest.mark.parametrize("budget", [30, 120, 10_000])
def test_budget_window_matches_brute(spark, budget):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    got = _collect(sft_examples_budget(df, ctx_budget=budget))
    assert got == _brute(ROWS, ctx_budget=budget)


def test_budget_context_always_fits(spark):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    for r in sft_examples_budget(df, ctx_budget=100).collect():
        assert r.ctx_chars <= 98  # budget minus the saved joiner share


def test_zero_context_targets_dropped(spark):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    keys = set(_collect(sft_examples(df, ctx_turns=4)))
    assert ("c2", 0) not in keys  # assistant turn 0 has no prior turns


def test_single_exchange_per_variant(spark):
    """Both variants shuffle once (hash by conv_id); the budget variant's
    two window specs share the partitioning, so no second Exchange."""
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    for out in (sft_examples(df), sft_examples_budget(df)):
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert plan.count("Exchange hashpartitioning") == 1
        assert "Exchange rangepartitioning" not in plan


def test_invalid_params_raise(spark):
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    with pytest.raises(ValueError):
        sft_examples(df, ctx_turns=0)
    with pytest.raises(ValueError):
        sft_examples_budget(df, ctx_budget=0)


def test_preference_pairs_cyclic_negatives(spark):
    """Every pair's rejected is some OTHER example's chosen (cyclic
    in-bucket wiring), never its own; degenerate identical-text pairs are
    dropped; output is partitioning-independent."""
    from engine.datawork.sft import preference_pairs
    rows = []
    for c in range(6):
        rows += [(f"c{c}", 0, "user", f"question {c}", None, None),
                 (f"c{c}", 1, "assistant", f"answer {c}", None, None)]
    # a 7th conversation duplicating c0's answer text exactly
    rows += [("c6", 0, "user", "question x", None, None),
             ("c6", 1, "assistant", "answer 0", None, None)]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, "
              "tool string, ts timestamp")
    out = preference_pairs(df, ctx_turns=4, buckets=1).collect()
    # bucket of 7 examples, cyclic: every row pairs with the next; only
    # pairs where chosen text == rejected text ('answer 0' vs c6) may drop
    assert 5 <= len(out) <= 7
    chosen = {r["chosen_md5"] for r in out}
    for r in out:
        assert r["rejected_md5"] != r["chosen_md5"]
        assert r["rejected_md5"] in chosen or len(out) < 7
        assert (r["rej_conv_id"], r["rej_turn_idx"]) != \
            (r["conv_id"], r["turn_idx"])
    key = lambda r: tuple(r)  # noqa: E731
    a = sorted(map(key, out))
    b = sorted(map(key, preference_pairs(
        df.repartition(5), ctx_turns=4, buckets=1).collect()))
    assert a == b


def _brute_tokens(rows, *, budget, overhead=4, target_role="assistant"):
    """Token-budget reference model: per-turn cost = real BPE count of the
    text + overhead, context = maximal suffix under budget."""
    from engine.core.bpe import build_ranks, encode_text, load_merges
    from engine.datawork.tokenize import DEFAULT_MERGES
    ranks = build_ranks(load_merges(DEFAULT_MERGES))
    cache: dict = {}

    def ntok(text):
        return len(encode_text(text or "", ranks, cache))

    convs: dict = {}
    for conv, idx, role, text in rows:
        convs.setdefault(conv, []).append((idx, role, text))
    out = {}
    for conv, turns in convs.items():
        turns.sort()
        for i, (idx, role, text) in enumerate(turns):
            if (role or "") != target_role:
                continue
            take, total = [], 0
            for p in reversed(turns[:i]):
                c = ntok(p[2]) + overhead
                if total + c > budget:
                    break
                take.insert(0, p)
                total += c
            if not take:
                continue
            ctx = CTX_SEP.join(_render(r, t) for _, r, t in take)
            tgt = text or ""
            out[(conv, idx)] = (len(take), total, len(ctx), _md5(ctx),
                                len(tgt), _md5(tgt))
    return out


@pytest.mark.parametrize("budget", [5, 12, 40, 10_000])
def test_token_budget_window_matches_brute(spark, budget):
    from engine.datawork.sft import sft_examples_budget_tokens
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    got = {(r.conv_id, r.turn_idx): (r.n_ctx, r.ctx_tokens, r.ctx_chars,
                                     r.ctx_md5, r.target_chars, r.target_md5)
           for r in sft_examples_budget_tokens(
               df, ctx_budget_tokens=budget).collect()}
    assert got == _brute_tokens(ROWS, budget=budget)


def test_token_budget_always_fits(spark):
    from engine.datawork.sft import sft_examples_budget_tokens
    df = spark.createDataFrame(
        ROWS, "conv_id string, turn_idx int, role string, text string")
    for r in sft_examples_budget_tokens(df, ctx_budget_tokens=30).collect():
        assert 0 < r.ctx_tokens <= 30


def test_pack_shards_default_is_real_bpe(spark):
    """pack_shards with tokens=None must budget in REAL BPE counts (the
    frozen-merges kernel), not the regex proxy."""
    from engine.core.bpe import build_ranks, encode_text, load_merges
    from engine.datawork.pack import pack_shards
    from engine.datawork.tokenize import DEFAULT_MERGES
    rows = [(1, "hello world, how are you?"), (2, "the quick brown fox"),
            (3, None), (4, "alpha beta gamma delta " * 9)]
    df = spark.createDataFrame(rows, "doc_id int, text string")
    got = {r.doc_id: r for r in pack_shards(df, budget=16).collect()}
    ranks = build_ranks(load_merges(DEFAULT_MERGES))
    cache: dict = {}
    acc = 0
    for did, text in rows:
        n = len(encode_text(text or "", ranks, cache))
        assert got[did].n_tokens == n
        assert got[did].start_offset == acc
        assert got[did].shard_id == acc // 16
        acc += n
