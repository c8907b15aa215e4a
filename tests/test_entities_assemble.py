from engine.core.assemble import (build_document, merge_figures,
                                  repair_document, validate_document)
from engine.core.entities import (EntityIndex, entities_from_companies,
                                  lookup_passage_id, normalize_entity_name,
                                  ticker_union, unique_list)
from engine.core.extract import extract_turn
from engine.core.figure_stub import (coerce_type, deterministic_fake,
                                     extract_figures_batched, fallback_record)


def test_entities_from_companies_id():
    [e] = entities_from_companies(["Acme Corp"])
    assert e["type"] == "company" and len(e["entity_id"]) == 16


def test_entity_index_first_wins_and_alias_probe():
    idx = EntityIndex(salt="pub")
    idx.add({"name": "  Acme   Corp ", "type": "company", "ticker": "ACME"})
    idx.add({"name": "acme corp", "country": "US", "type": "index"})  # merge
    assert len(idx.entities) == 1
    e = idx.entities[0]
    assert e["name"] == "Acme Corp"
    assert e["type"] == "company"      # first wins
    assert e["country"] == "US"        # filled in
    assert idx.resolve("ACME") == e["entity_id"]
    assert idx.resolve({"name": "Acme Corp"}) == e["entity_id"]
    assert idx.resolve("nobody") is None


def test_utils():
    assert normalize_entity_name("  A   B ") == "A B"
    assert unique_list(["a", "A", "b", None, " "]) == ["a", "b"]
    assert ticker_union(["aapl", "MSFT"], ["msft "]) == ["AAPL", "MSFT"]
    assert lookup_passage_id({1: {0: "p0", 2: "p2"}}, 1, 1) == "p0"  # probes idx-1
    assert lookup_passage_id({1: {}}, 1, 0) is None


def test_build_validate_merge_roundtrip():
    rec = extract_turn("# T\n\nA paragraph with Acme Corp revenue of $5B up 3%.",
                       "ocr.markdown", "conv-0:0")
    doc = build_document(rec, "conv-0:0")
    ok, err = validate_document(doc)
    assert ok, err
    figs = extract_figures_batched([{"path": "images/0_0.jpg", "page": 0,
                                     "title": "Fig"}])
    merged = merge_figures(doc, figs)
    assert merged["data"]["extraction_summary"]["figures_count"] == len(figs)
    ok, err = validate_document(merged)
    assert ok, err
    # figure-passage link capped at 3, same-page only
    for f in merged["data"]["figures"]:
        rel = f.get("metadata", {}).get("related_passages", [])
        assert len(rel) <= 3


def test_merge_model_results_fill_empty_only():
    from engine.core.assemble import merge_model_results
    agg = {"title": "Agg", "sector": None, "meta": {"a": 1, "b": []},
           "items": [1]}
    model = {"title": "Model", "sector": "Tech", "meta": {"a": 9, "b": [2]},
             "items": [9, 9], "extra": ""}
    merged = merge_model_results(model, agg)
    assert merged["title"] == "Agg"          # aggregated wins
    assert merged["sector"] == "Tech"        # None slot filled
    assert merged["meta"] == {"a": 1, "b": [2]}  # nested: empty-only fill
    assert merged["items"] == [1]
    assert "extra" not in merged             # empty model value never lands
    assert merge_model_results(None, None) == {}
    assert merge_model_results({"x": 1}, None) == {"x": 1}


def test_parse_doc_name():
    from engine.core.metadata import parse_doc_name
    got = parse_doc_name("FX_Note_2025-09-03", "barclays/fx")
    assert got == {"name_clean": "FX_Note", "date_str": "2025-09-03",
                   "publication": "barclays/fx"}
    assert parse_doc_name("NoDate")["publication"] == "unknown"
    assert parse_doc_name("NoDate")["date_str"] is None


def test_claim_evidence_validation():
    from engine.core.assemble import validate_claim_evidence
    claims = [{"claim_id": "c1", "text": "t", "passage_id": "p",
               "evidence": {"figure_ids": ["f1", "fX"], "table_ids": ["tX"],
                            "num_ids": ["n1"]}},
              {"claim_id": "c2", "text": "t2", "passage_id": "p"}]
    out = validate_claim_evidence(
        claims, [{"figure_id": "f1"}], [{"table_id": "t1"}], [{"num_id": "n1"}])
    assert out[0]["evidence"] == {"figure_ids": ["f1"], "table_ids": [],
                                  "num_ids": ["n1"]}
    assert "evidence" not in out[1]


def test_repair_document():
    fixed = repair_document({"passages": "not-a-list"}, "d")
    ok, err = validate_document({**fixed, "passages": []})
    assert ok, err
    assert fixed["schema_version"] == "1.3.1"


def test_figure_stub_determinism_and_fallback():
    d = {"path": "images/1_0.jpg", "page": 1, "title": "X"}
    assert deterministic_fake(d) == deterministic_fake(d)
    assert coerce_type("LINE") == "line" and coerce_type("weird") == "other"
    fb = fallback_record(d)
    assert fb["page"] == 2 and fb["series"] == []  # 0-based → 1-based

    def boom(_):
        raise RuntimeError("model down")
    out = extract_figures_batched([d], extract_fn=boom)
    assert out == [fb]
