"""Exact-substring (duplicate n-gram span) deduplication + winnowing
fingerprints.

The sequence-level analogue of CCNet line dedup (curation.dedup_lines):
instead of whole lines, find every *token n-gram window* whose exact
content occurs >= min_count times across the corpus, merge the
overlapping duplicate windows per document into maximal spans, and
optionally cut those spans out of the text. This is the distributed,
bounded-window re-expression of the suffix-array "ExactSubstr" dedup of
Lee et al. 2022 (Deduplicating Training Data Makes Language Models
Better): a length-L duplicated region shows up as L-n+1 consecutive
duplicated windows, and the span merge recovers the region.

Scale shapes (the point of each step):

* Window generation is per-row codegen (``transform`` over a
  ``sequence`` + one ``posexplode``) — no shuffle, output is n-gram
  COUNT not quadratic in corpus size.
* The duplicate test is ONE hash aggregate on md5(gram) (map-side
  combine collapses the hot boilerplate grams early — the same grams
  that make the data skewed make the partial aggregate effective).
* The join back (gram -> hot grams) is equi on the 16-byte md5 key;
  each (doc, start) window matches at most one hot row, so the join
  cannot fan out.
* Span merge is the classic running-max interval union: one window
  function partitioned by doc — the only doc-sized shuffle.
* ``drop_duplicate_spans`` applies coverage with a per-doc span ARRAY
  (spans are maximal and disjoint, so there are at most
  n_tokens/(n+1) of them) and an indexed higher-order ``filter`` —
  no second explode, no UDF.

Semantics contract (shared verbatim with the DuckDB oracle):

* Tokens are ``split(trim(text), '\\s+')`` with empties dropped;
  positions are 0-based token indices.
* A window [s, s+n) is duplicated iff its space-joined token content
  occurs >= min_count times in the corpus (within-doc repeats count).
* Spans are the union of duplicated windows; two windows merge iff
  they overlap or touch (gap == 0) — coverage, not window identity.
* Like dedup_lines, apply drops ALL occurrences of duplicated spans
  (keep-one would need a global occurrence order; the corpus-frequency
  rule is the CCNet-consistent contract used across this family).

All hashes are md5 so the oracle reproduces values exactly; swap to
xxhash64 in production (same plan, cheaper hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str):
    """Whitespace tokens with empties dropped — identical spelling to the
    oracle's list_filter(string_split_regex(trim(...)))."""
    return F.filter(
        F.split(F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"),
        lambda t: t != "")


def _windows(toks, n: int):
    """md5 over each n-token window's space-joined content; empty array
    when the doc is shorter than n (sequence() would run DESCENDING for
    start > stop — the guard is load-bearing, not cosmetic)."""
    starts = F.when(F.size(toks) >= n,
                    F.sequence(F.lit(1), F.size(toks) - n + 1)
                    ).otherwise(F.array())
    return F.transform(starts,
                       lambda i: F.md5(F.array_join(F.slice(toks, i, n),
                                                    " ")))


def _dup_windows(docs: DataFrame, n: int, min_count: int,
                 id_col: str, text_col: str) -> DataFrame:
    """(id, start) of every duplicated window, 0-based token positions."""
    from .dedup import _ensure_parallelism
    toks = (_ensure_parallelism(docs)
            .select(F.col(id_col).alias("id"),
                    _tokens(text_col).alias("toks")))
    grams = toks.select(
        "id", F.posexplode(_windows(F.col("toks"), n)).alias("start",
                                                             "gram"))
    hot = (grams.groupBy("gram").agg(F.count("*").alias("cnt"))
           .filter(F.col("cnt") >= min_count).select("gram"))
    return grams.join(hot, "gram").select("id", "start")


def _merged_spans(dup: DataFrame, n: int) -> DataFrame:
    """Interval union of [start, start+n) windows per doc: running max of
    span ends over the start-ordered windows; a window opens a new span
    iff it starts strictly past everything seen (overlap OR touch
    merges — coverage semantics). O(log) nothing: one window pass."""
    w = Window.partitionBy("id").orderBy("start")
    prev_end = F.max(F.col("start") + n).over(
        w.rowsBetween(Window.unboundedPreceding, -1))
    flagged = dup.withColumn(
        "is_new",
        (F.col("start") > F.coalesce(prev_end, F.lit(-1))).cast("int"))
    span_id = F.sum("is_new").over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (flagged.withColumn("span_id", span_id)
            .groupBy("id", "span_id")
            .agg(F.min("start").cast("int").alias("span_start"),
                 (F.max("start") + n).cast("int").alias("span_end"),
                 F.count("*").cast("bigint").alias("n_windows")))


def duplicate_ngram_spans(docs: DataFrame, n: int = 6, min_count: int = 2,
                          id_col: str = "doc_id",
                          text_col: str = "text") -> DataFrame:
    """Maximal duplicated-substring spans per document.

    Returns (id_col, span_start, span_end, n_windows, span_text) with
    token-index positions (span_end exclusive) and the covered text
    reconstructed from the doc's own tokens.
    """
    spans = _merged_spans(_dup_windows(docs, n, min_count, id_col,
                                       text_col), n)
    toks = docs.select(F.col(id_col).alias("id"),
                       _tokens(text_col).alias("toks"))
    return (spans.join(toks, "id")
            .select(F.col("id").alias(id_col), "span_start", "span_end",
                    "n_windows",
                    F.array_join(
                        F.slice(F.col("toks"), F.col("span_start") + 1,
                                F.col("span_end") - F.col("span_start")),
                        " ").alias("span_text")))


def drop_duplicate_spans(docs: DataFrame, n: int = 6, min_count: int = 2,
                         id_col: str = "doc_id",
                         text_col: str = "text") -> DataFrame:
    """Cut every duplicated span out of every document.

    Returns (id_col, text, n_kept, n_dropped) — text is the space-join
    of the surviving tokens (original inter-token whitespace is already
    normalized away by tokenization), counts are tokens. Docs with no
    duplicated spans pass through with n_dropped = 0; empty docs yield
    ''. Mirrors dedup_lines' drop-all-occurrences contract.
    """
    spans = _merged_spans(_dup_windows(docs, n, min_count, id_col,
                                       text_col), n)
    per_doc = spans.groupBy("id").agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("sp"))
    toks = docs.select(F.col(id_col).alias("id"),
                       _tokens(text_col).alias("toks"))
    covered = lambda i: F.exists(  # noqa: E731 — inline predicate
        F.col("sp"), lambda p: (i >= p["span_start"]) &
                               (i < p["span_end"]))
    kept = F.filter(F.col("toks"), lambda t, i: ~covered(i))
    return (toks.join(per_doc, "id", "left")
            .withColumn("sp", F.coalesce(
                F.col("sp"), F.array().cast(
                    "array<struct<span_start:int,span_end:int>>")))
            .select(F.col("id").alias(id_col),
                    F.array_join(kept, " ").alias("text"),
                    F.size(kept).cast("bigint").alias("n_kept"),
                    (F.size("toks") - F.size(kept)).cast("bigint")
                    .alias("n_dropped")))
