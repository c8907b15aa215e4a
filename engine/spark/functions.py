"""Scalar SQL-function surface: the extraction kernels as registered UDFs.

``register_all(spark)`` exposes the core operators to plain Spark SQL, so a
user can write

    SELECT conv_id, x_clean_markdown(text) AS cleaned FROM transcripts

Every UDF is an Arrow-batched ``pandas_udf`` in the ``Iterator[pd.Series]``
form (one Python worker per partition, compiled regexes reused across
batches; no per-row Python round-trips). Names are prefixed ``x_`` to avoid
colliding with builtins.
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql.functions import pandas_udf


@pandas_udf("string")
def x_clean_markdown(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.cleaner import clean_markdown
    for s in batches:
        yield s.map(lambda t: clean_markdown(t)[0] if isinstance(t, str) else None)


@pandas_udf("string")
def x_clean_html(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.html_clean import clean_html
    for s in batches:
        yield s.map(lambda t: clean_html(t)[0] if isinstance(t, str) else None)


@pandas_udf("string")
def x_grounded_to_markdown(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.grounding import grounded_to_markdown
    for s in batches:
        yield s.map(lambda t: grounded_to_markdown(t)[0] if isinstance(t, str) else None)


@pandas_udf("string")
def x_strip_eos(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.grounding import strip_eos
    for s in batches:
        yield s.map(lambda t: strip_eos(t) if isinstance(t, str) else None)


@pandas_udf("int")
def x_word_count(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.pages import word_count
    for s in batches:
        yield s.map(lambda t: word_count(t) if isinstance(t, str) else 0)


@pandas_udf("string")
def x_detect_language(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.metadata import detect_language
    for s in batches:
        yield s.map(lambda t: detect_language(t) if isinstance(t, str) else "en")


@pandas_udf("string")
def x_extract_title(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    from engine.core.metadata import extract_title
    for s in batches:
        yield s.map(lambda t: extract_title(t) if isinstance(t, str) else None)


@pandas_udf("string")
def x_extract_json(batches: Iterator[pd.Series]) -> Iterator[pd.Series]:
    import json

    from engine.core.jsonparse import extract_json
    for s in batches:
        yield s.map(lambda t: json.dumps(extract_json(t), ensure_ascii=False,
                                         sort_keys=True)
                    if isinstance(t, str) else None)


ALL = {
    "x_clean_markdown": x_clean_markdown,
    "x_clean_html": x_clean_html,
    "x_grounded_to_markdown": x_grounded_to_markdown,
    "x_strip_eos": x_strip_eos,
    "x_word_count": x_word_count,
    "x_detect_language": x_detect_language,
    "x_extract_title": x_extract_title,
    "x_extract_json": x_extract_json,
}


def register_all(spark) -> None:
    for name, fn in ALL.items():
        spark.udf.register(name, fn)
