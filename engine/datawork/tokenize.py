"""Real subword token counting over a text column (frozen BPE merges).

The Spark surface of engine/core/bpe.py: an Arrow-batched pandas UDF that
encodes every row's text with the committed merges table and emits
(n_tokens, tokens_md5) — the md5 pins the exact token SEQUENCE, so the
oracle comparison verifies the tokenizer, not just a count.

Scale shape: the ranks dict (≤ a few thousand entries) is closure-captured
and ships once per executor with the serialized UDF; each Python worker
keeps a per-word memo cache, so cost is ~O(distinct words) per worker, not
O(total words) — the Zipf head dominates real corpora. No shuffle; one
projection."""

# NOTE: no `from __future__ import annotations` here — it stringifies the
# pandas_udf iterator type hints and Spark then rejects the signature.

import hashlib
import os

from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import (IntegerType, StringType, StructField,
                               StructType)

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
DEFAULT_MERGES = os.path.join(_REPO, "data", "bpe", "merges.txt")

_TOK_SCHEMA = StructType([
    StructField("n_tokens", IntegerType()),
    StructField("tokens_md5", StringType()),
])


#: per-process word→symbols memo, keyed by merges path — module-level so a
#: REUSED Python worker (spark.python.worker.reuse, the default) keeps the
#: Zipf head memoized across batches AND tasks (guide §4.5; the old cache
#: was rebuilt per 2048-row batch). Bounded: reset past _WORD_CACHE_MAX
#: distinct words (the memo is a pure-function cache — dropping it only
#: costs re-encodes).
_WORD_CACHE: dict = {}
_WORD_CACHE_MAX = 2_000_000


def with_bpe_tokens(df: DataFrame, text_col: str = "text",
                    merges_path: str | None = None) -> DataFrame:
    """Adds ``n_tokens`` (real BPE token count) and ``tokens_md5`` (md5 of
    the space-joined token sequence). NULL text → 0 tokens, md5 of ''."""
    from typing import Iterator

    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    from engine.core.bpe import build_ranks, encode_text, load_merges
    cache_key = os.path.abspath(merges_path or DEFAULT_MERGES)
    ranks = build_ranks(load_merges(cache_key))

    @pandas_udf(_TOK_SCHEMA)
    def bpe_tok(it: Iterator[pd.Series]) -> Iterator[pd.DataFrame]:
        cache = _WORD_CACHE.setdefault(cache_key, {})
        for texts in it:
            if len(cache) > _WORD_CACHE_MAX:
                cache.clear()
            ns, md5s = [], []
            for t in texts:
                toks = encode_text(t if isinstance(t, str) else "",
                                   ranks, cache)
                ns.append(len(toks))
                md5s.append(
                    hashlib.md5(" ".join(toks).encode()).hexdigest())
            yield pd.DataFrame({"n_tokens": ns, "tokens_md5": md5s})

    out = df.withColumn("_bpe", bpe_tok(F.col(text_col)))
    return (out.withColumn("n_tokens", F.col("_bpe.n_tokens"))
            .withColumn("tokens_md5", F.col("_bpe.tokens_md5"))
            .drop("_bpe"))
