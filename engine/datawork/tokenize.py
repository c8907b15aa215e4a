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

from __future__ import annotations

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


def with_bpe_tokens(df: DataFrame, text_col: str = "text",
                    merges_path: str | None = None) -> DataFrame:
    """Adds ``n_tokens`` (real BPE token count) and ``tokens_md5`` (md5 of
    the space-joined token sequence). NULL text → 0 tokens, md5 of ''."""
    from pyspark.sql.functions import pandas_udf

    from engine.core.bpe import build_ranks, encode_text, load_merges
    ranks = build_ranks(load_merges(merges_path or DEFAULT_MERGES))

    @pandas_udf(_TOK_SCHEMA)
    def bpe_tok(texts):
        import pandas as pd
        cache: dict = {}
        ns, md5s = [], []
        for t in texts:
            toks = encode_text(t if isinstance(t, str) else "", ranks, cache)
            ns.append(len(toks))
            md5s.append(hashlib.md5(" ".join(toks).encode()).hexdigest())
        return pd.DataFrame({"n_tokens": ns, "tokens_md5": md5s})

    out = df.withColumn("_bpe", bpe_tok(F.col(text_col)))
    return (out.withColumn("n_tokens", F.col("_bpe.n_tokens"))
            .withColumn("tokens_md5", F.col("_bpe.tokens_md5"))
            .drop("_bpe"))
