"""SFT training-example assembly from multi-turn transcripts.

The reference pipeline ends at per-document structured JSON
(md_to_json_engine.py's assembled output); a training-data pipeline's next
step is turning conversations into (context, target) supervised pairs —
for every assistant turn, the rendered preceding turns become the model
input and the assistant text becomes the label. This module does that
assembly as pure window algebra over (conv_id, turn_idx):

* ``sft_examples``       — fixed context window of the last ``ctx_turns``
                           turns (ROWS frame).
* ``sft_examples_budget`` — character-budget context: the maximal suffix
                           of preceding turns whose rendered length fits
                           ``ctx_budget`` (RANGE frame over a cumulative
                           cost — no per-row loop, no UDF).

Scale shape: both variants are ONE shuffle (hash by conv_id) followed by
in-partition sorts; frames are bounded (ctx_turns rows / ctx_budget
chars), so per-row state never grows with conversation length beyond the
configured context. Long-conversation skew therefore bounds task *time*
linearly but not memory. No driver collection, no UDFs — every expression
is JVM codegen.

Rendering contract (shared with the DuckDB oracle in
engine/oracle_sql.py): each turn renders as ``<|role|>\\n<text>`` and
turns join with a blank line (``\\n\\n``); NULL role/text render as empty
strings. A turn's *cost* for the budget variant is
``length(rendered) + 2`` (its share of one joiner), so a context admitted
by ``ctx_budget`` always joins to at most ``ctx_budget - 2`` characters.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: Separator between rendered turns in an assembled context.
CTX_SEP = "\n\n"


def _rendered(role_col: str, text_col: str) -> Column:
    """``<|role|>\\n<text>`` with NULLs blanked (both engines must agree:
    list/string_agg silently drop NULL elements in SQL engines, so a NULL
    unit would silently shrink the window — blank it instead)."""
    return F.concat(F.lit("<|"), F.coalesce(F.col(role_col), F.lit("")),
                    F.lit("|>\n"), F.coalesce(F.col(text_col), F.lit("")))


def _assemble(lst: Column) -> Column:
    """Ordered context string from a collect_list of (turn_idx, unit)
    structs. array_sort on structs orders by the leading field, so the
    result is deterministic even if collect_list ever returned frame rows
    out of order."""
    return F.array_join(
        F.transform(F.array_sort(lst), lambda s: s["u"]), CTX_SEP)


def _emit(df: DataFrame, ctx: Column, n_ctx: Column, target: Column,
          conv_col: str, idx_col: str) -> DataFrame:
    return (df.select(
        F.col(conv_col), F.col(idx_col),
        n_ctx.cast("int").alias("n_ctx"),
        F.length(ctx).cast("bigint").alias("ctx_chars"),
        F.md5(ctx).alias("ctx_md5"),
        F.length(target).cast("bigint").alias("target_chars"),
        F.md5(target).alias("target_md5"),
        F.col("_is_target"))
        .filter(F.col("_is_target") & (F.col("n_ctx") >= 1))
        .drop("_is_target"))


def sft_examples(turns: DataFrame, ctx_turns: int = 8,
                 target_role: str = "assistant",
                 conv_col: str = "conv_id", idx_col: str = "turn_idx",
                 role_col: str = "role",
                 text_col: str = "text") -> DataFrame:
    """(context, target) pairs with a fixed window of the last
    ``ctx_turns`` turns (any role) before each ``target_role`` turn.

    Output: (conv_id, turn_idx, n_ctx, ctx_chars, ctx_md5, target_chars,
    target_md5) — digests, not the assembled strings, so the result is
    manifest-sized; callers that want the text re-run ``_assemble`` via
    ``with_text=True``-style composition downstream (the driver gate
    hashes values anyway, and md5 equality IS byte equality).

    Targets with an empty window (turn 0 of a conversation) are dropped:
    a pair with no input is not a training example.
    """
    if ctx_turns < 1:
        raise ValueError(f"ctx_turns must be >= 1, got {ctx_turns}")
    unit = _rendered(role_col, text_col)
    w = (Window.partitionBy(conv_col).orderBy(idx_col)
         .rowsBetween(-ctx_turns, -1))
    lst = F.collect_list(
        F.struct(F.col(idx_col).alias("i"), unit.alias("u"))).over(w)
    df = turns.withColumn("_lst", lst).withColumn(
        "_is_target", F.coalesce(F.col(role_col), F.lit("")) == target_role)
    ctx = _assemble(F.col("_lst"))
    return _emit(df, ctx, F.size("_lst"),
                 F.coalesce(F.col(text_col), F.lit("")),
                 conv_col, idx_col)


def sft_examples_budget(turns: DataFrame, ctx_budget: int = 4000,
                        target_role: str = "assistant",
                        conv_col: str = "conv_id", idx_col: str = "turn_idx",
                        role_col: str = "role",
                        text_col: str = "text") -> DataFrame:
    """(context, target) pairs where the context is the MAXIMAL suffix of
    preceding turns whose total rendered cost fits ``ctx_budget``
    characters — token-budget context packing, done as a RANGE frame
    instead of a per-row scan:

    With ``cstart(j) = sum of costs of turns < j`` (one cumulative-sum
    window), the suffix condition "turns j..i-1 cost at most B" is exactly
    ``cstart(i) - cstart(j) <= B`` — so the admitted set for row i is the
    RANGE frame ``[cstart(i)-B, cstart(i)-1]`` over ORDER BY cstart.
    Costs are strictly positive (the rendered header alone is >= 5
    chars), so cstart is strictly increasing within a conversation and
    the ``-1`` upper bound excludes exactly the current row.

    Same output schema as ``sft_examples``.
    """
    if ctx_budget < 1:
        raise ValueError(f"ctx_budget must be >= 1, got {ctx_budget}")
    unit = _rendered(role_col, text_col)
    wcum = (Window.partitionBy(conv_col).orderBy(idx_col)
            .rowsBetween(Window.unboundedPreceding, -1))
    cost = (F.length(unit) + F.lit(2)).cast("bigint")
    df = (turns
          .withColumn("_u", unit)
          .withColumn("_cost", cost)
          .withColumn("_cstart",
                      F.coalesce(F.sum("_cost").over(wcum), F.lit(0))))
    wr = (Window.partitionBy(conv_col).orderBy("_cstart")
          .rangeBetween(-int(ctx_budget), -1))
    lst = F.collect_list(
        F.struct(F.col(idx_col).alias("i"), F.col("_u").alias("u"))).over(wr)
    df = df.withColumn("_lst", lst).withColumn(
        "_is_target", F.coalesce(F.col(role_col), F.lit("")) == target_role)
    ctx = _assemble(F.col("_lst"))
    return _emit(df, ctx, F.size("_lst"),
                 F.coalesce(F.col(text_col), F.lit("")),
                 conv_col, idx_col)


#: Per-turn token overhead in the budget-tokens variant: the rendered
#: header ``<|role|>\n`` plus the turn's share of one ``\n\n`` joiner,
#: charged as a flat constant so the cost stays a pure function of the
#: turn (and stays strictly positive — the RANGE-frame derivation needs
#: a strictly increasing cumulative cost).
TOKEN_OVERHEAD = 4


def sft_examples_budget_tokens(turns: DataFrame,
                               ctx_budget_tokens: int = 600,
                               target_role: str = "assistant",
                               conv_col: str = "conv_id",
                               idx_col: str = "turn_idx",
                               role_col: str = "role",
                               text_col: str = "text",
                               merges_path: str | None = None) -> DataFrame:
    """``sft_examples_budget`` with the budget measured in REAL BPE tokens
    (frozen merges table, engine/core/bpe.py) instead of characters —
    the unit training actually budgets in (VERDICT r5 #4).

    A turn's cost is ``n_tokens(text) + TOKEN_OVERHEAD``; the context is
    the maximal suffix of preceding turns whose total cost fits
    ``ctx_budget_tokens``, derived with the same cumulative-cost RANGE
    frame as the character variant (see ``sft_examples_budget`` for the
    frame algebra). Output adds ``ctx_tokens`` — the admitted context's
    total token cost (always ≤ ctx_budget_tokens) — so the budget math
    itself sits under the oracle gate.

    ``turns`` must not already carry ``n_tokens``/``tokens_md5`` columns
    (with_bpe_tokens adds them).
    """
    if ctx_budget_tokens < 1:
        raise ValueError(
            f"ctx_budget_tokens must be >= 1, got {ctx_budget_tokens}")
    from .tokenize import with_bpe_tokens
    t = with_bpe_tokens(turns, text_col=text_col, merges_path=merges_path)
    unit = _rendered(role_col, text_col)
    wcum = (Window.partitionBy(conv_col).orderBy(idx_col)
            .rowsBetween(Window.unboundedPreceding, -1))
    cost = (F.col("n_tokens") + F.lit(TOKEN_OVERHEAD)).cast("bigint")
    df = (t.withColumn("_u", unit)
          .withColumn("_cost", cost)
          .withColumn("_cstart",
                      F.coalesce(F.sum("_cost").over(wcum), F.lit(0))))
    wr = (Window.partitionBy(conv_col).orderBy("_cstart")
          .rangeBetween(-int(ctx_budget_tokens), -1))
    lst = F.collect_list(
        F.struct(F.col(idx_col).alias("i"), F.col("_u").alias("u"))).over(wr)
    ctx_tokens = F.coalesce(F.sum("_cost").over(wr), F.lit(0)).cast("bigint")
    df = (df.withColumn("_lst", lst)
          .withColumn("_ctx_tokens", ctx_tokens)
          .withColumn("_is_target",
                      F.coalesce(F.col(role_col), F.lit("")) == target_role))
    ctx = _assemble(F.col("_lst"))
    tgt = F.coalesce(F.col(text_col), F.lit(""))
    return (df.select(
        F.col(conv_col), F.col(idx_col),
        F.size("_lst").cast("int").alias("n_ctx"),
        F.col("_ctx_tokens").alias("ctx_tokens"),
        F.length(ctx).cast("bigint").alias("ctx_chars"),
        F.md5(ctx).alias("ctx_md5"),
        F.length(tgt).cast("bigint").alias("target_chars"),
        F.md5(tgt).alias("target_md5"),
        F.col("_is_target"))
        .filter(F.col("_is_target") & (F.col("n_ctx") >= 1))
        .drop("_is_target"))


def preference_pairs(turns: DataFrame, ctx_turns: int = 8,
                     buckets: int = 64,
                     target_role: str = "assistant",
                     conv_col: str = "conv_id", idx_col: str = "turn_idx",
                     role_col: str = "role",
                     text_col: str = "text") -> DataFrame:
    """DPO/reward-model preference pairs from SFT examples with
    deterministic in-bucket negative sampling: every example's
    ``rejected`` is the NEXT example's target in md5 order inside the
    example's md5 bucket (cyclic — the bucket's last example wraps to
    its first). md5 order is a content-independent pseudo-random draw
    both engines reproduce, so the negatives are effectively random
    responses to OTHER prompts — the standard cheap negative for reward-
    model bootstrapping — without any RNG.

    Degenerate pairs (rejected md5 == chosen md5; this includes a
    singleton bucket pairing with itself) are dropped: a preference pair
    that cannot be ordered teaches nothing.

    Scale shape: the SFT window's conv-hash shuffle, then ONE shuffle by
    bucket with in-partition sort. ``buckets`` caps per-task sort size at
    ~n_examples/buckets — size it like the LSH layouts (≈ n/10⁶) so a
    web-scale corpus never sorts in one task.

    Output: (conv_id, turn_idx, n_ctx, ctx_chars, ctx_md5, chosen_chars,
    chosen_md5, rej_conv_id, rej_turn_idx, rejected_chars, rejected_md5).
    """
    ex = (sft_examples(turns, ctx_turns=ctx_turns, target_role=target_role,
                       conv_col=conv_col, idx_col=idx_col,
                       role_col=role_col, text_col=text_col)
          .withColumnRenamed("target_chars", "chosen_chars")
          .withColumnRenamed("target_md5", "chosen_md5"))
    key = F.concat(F.col(conv_col), F.lit(":"),
                   F.col(idx_col).cast("string"))
    hk = F.md5(key)
    df = (ex.withColumn("_hk", hk)
          .withColumn("_b", F.conv(F.substring(F.col("_hk"), 1, 8), 16, 10)
                      .cast("long") % buckets))
    win = Window.partitionBy("_b").orderBy("_hk", conv_col, idx_col)
    winf = win.rowsBetween(Window.unboundedPreceding,
                           Window.unboundedFollowing)
    pick = lambda c: F.coalesce(F.lead(c, 1).over(win),  # noqa: E731
                                F.first(c).over(winf))
    return (df
            .withColumn("rej_conv_id", pick(F.col(conv_col)))
            .withColumn("rej_turn_idx", pick(F.col(idx_col)))
            .withColumn("rejected_chars", pick(F.col("chosen_chars")))
            .withColumn("rejected_md5", pick(F.col("chosen_md5")))
            .filter(F.col("rejected_md5") != F.col("chosen_md5"))
            .select(conv_col, idx_col, "n_ctx", "ctx_chars", "ctx_md5",
                    "chosen_chars", "chosen_md5", "rej_conv_id",
                    "rej_turn_idx", "rejected_chars", "rejected_md5"))
