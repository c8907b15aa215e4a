"""Conversation-document assembly: Spark grouped-map output equals the pure
Python assembler on ordered oracle records; docs validate against the
schema checks."""

import json

import pytest

from engine.core.assemble import build_conversation_document, validate_document
from engine.core.extract import extract_turn
from tools import synth


@pytest.fixture(scope="module")
def small_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("docs") / "tx.parquet")
    synth.write_parquet(path, 120)
    return spark.read.parquet(path)


def test_conversation_documents_match_oracle(spark, small_table):
    from engine.spark.documents import conversation_documents
    from engine.spark.pipeline import extract_df

    got = {r["conv_id"]: r for r in
           conversation_documents(extract_df(small_table)).collect()}

    by_conv = {}
    for r in small_table.collect():
        by_conv.setdefault(r["conv_id"], []).append(r)

    assert set(got) == set(by_conv)
    for conv_id, rows in by_conv.items():
        rows.sort(key=lambda r: r["turn_idx"])
        records = []
        for r in rows:
            rec = extract_turn(r["text"], r["tool"], f"{conv_id}:{r['turn_idx']}")
            rec["turn_idx"] = r["turn_idx"]
            records.append(rec)
        expected = build_conversation_document(conv_id, records)
        g = got[conv_id]
        assert g["is_valid"], g["error"]
        assert g["n_turns"] == len(rows)
        assert json.loads(g["doc_json"]) == json.loads(
            json.dumps(expected, ensure_ascii=False, sort_keys=True)), conv_id


def test_assembled_doc_contract():
    payloads = [
        ("# Doc Title\n\nAcme Corp grew 5.2% with revenue of $3B. Tickers: ACME\n\n"
         "![Figure 0-0](images/0_0.jpg)\nA neutral caption here", "ocr.markdown"),
        ("A plain follow-up turn with enough text to matter.", "chat.plain"),
    ]
    records = []
    for i, (text, tool) in enumerate(payloads):
        rec = extract_turn(text, tool, f"c:{i}")
        rec["turn_idx"] = i
        records.append(rec)
    doc = build_conversation_document("c", records)
    ok, err = validate_document(doc)
    assert ok, err
    assert doc["doc"]["title"] == "Doc Title"
    assert doc["doc"]["tickers"] == ["ACME"]
    assert doc["data"]["extraction_summary"]["figures_count"] == 1
    # page rebase: turn 0 page 0 → 0; provenance pages unique doc-wide
    pages = [p["page"] for p in doc["passages"]]
    assert pages == sorted(pages)
    assert any(p >= 1000 for p in pages)  # turn-1 passage rebased


def test_entity_dedup_across_turns():
    r1 = extract_turn("Acme Corp did things with Acme Corp in many words here.",
                      "chat.plain", "c:0")
    r2 = extract_turn("Acme Corp appeared again in the following turn text.",
                      "chat.plain", "c:1")
    r1["turn_idx"], r2["turn_idx"] = 0, 1
    doc = build_conversation_document("c", [r1, r2])
    names = [e["name"] for e in doc["entities"]]
    assert names.count("Acme Corp") == 1


def test_conversation_documents_tolerates_dirty_rows(spark):
    from engine.spark.documents import conversation_documents
    from engine.spark.pipeline import extract_df
    dirty = spark.createDataFrame(
        [("cX", 0, "user", "a normal turn with enough text", "chat.plain", None),
         ("cX", None, "user", None, None, None),
         (None, 1, "user", "null conversation", "chat.plain", None)],
        "conv_id string, turn_idx int, role string, text string, "
        "tool string, ts timestamp")
    rows = {r["conv_id"]: r for r in
            conversation_documents(extract_df(dirty)).collect()}
    assert set(rows) == {"cX", "None"}
    assert rows["cX"]["n_turns"] == 2
    assert rows["cX"]["is_valid"]
