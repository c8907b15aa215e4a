"""Spark-vs-oracle parity: the pipeline's per-turn output equals the pure
Python kernel run directly, under stable (conv_id, turn_idx) ordering —
the north-rule invariant."""

import json

import pytest

from engine.core.extract import extract_turn
from tools import synth

N_TURNS = 400


@pytest.fixture(scope="module")
def transcript_df(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("tx") / "transcripts.parquet")
    synth.write_parquet(path, N_TURNS)
    return spark.read.parquet(path)


def test_extract_matches_oracle_per_turn(spark, transcript_df):
    from engine.spark.pipeline import extract_df

    rows = (extract_df(transcript_df, salt_partitions=8)
            .orderBy("conv_id", "turn_idx")
            .collect())
    src = {(r["conv_id"], r["turn_idx"]): r
           for r in transcript_df.collect()}
    assert len(rows) == len(src)

    for r in rows:
        s = src[(r["conv_id"], r["turn_idx"])]
        exp = extract_turn(s["text"], s["tool"], f"{r['conv_id']}:{r['turn_idx']}")
        assert r["cleaned_text"] == exp["cleaned_text"], (r["conv_id"], r["turn_idx"])
        assert r["error"] is None
        assert [p["passage_id"] for p in r["passages"]] == \
               [p["passage_id"] for p in exp["passages"]]
        assert [t["table_id"] for t in r["tables"]] == \
               [t["table_id"] for t in exp["tables"]]
        assert [(n["num_id"], n["value"]) for n in r["numerics"]] == \
               [(n["num_id"], n["value"]) for n in exp["numerics"]]
        assert list(r["figures_dropped"]) == exp["figures_dropped"]
        got_spans = [(x["kind"], x["start"], x["end"]) for x in r["spans"]]
        exp_spans = [(x["kind"], x["start"], x["end"]) for x in exp["spans"]]
        assert got_spans == exp_spans


def test_conversation_rollup(spark, transcript_df):
    from engine.spark.pipeline import assemble_conversations, extract_df

    ext = extract_df(transcript_df)
    conv = assemble_conversations(ext).orderBy("conv_id").collect()
    by_conv = {}
    for r in transcript_df.collect():
        by_conv.setdefault(r["conv_id"], []).append(r)
    assert len(conv) == len(by_conv)
    for c in conv:
        turns = sorted(by_conv[c["conv_id"]], key=lambda r: r["turn_idx"])
        assert c["n_turns"] == len(turns)
        # conversation_text is cleaned turns joined in turn order
        exp_first = extract_turn(turns[0]["text"], turns[0]["tool"],
                                 f"{c['conv_id']}:0")["cleaned_text"]
        assert c["conversation_text"].startswith(exp_first)
        assert c["failed_turns"] == 0
        assert list(c["tickers"]) == sorted(set(c["tickers"]))
