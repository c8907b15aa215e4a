"""Golden-vector regression: engine.core output frozen after byte-parity with
the reference modules was established (tools/parity_check.py, 1000/1000)."""

from engine.core.extract import extract_turn


def test_golden_vectors(golden_vectors):
    assert len(golden_vectors) >= 20
    for v in golden_vectors:
        got = extract_turn(v["payload"], v["tool"], v["name"])
        exp = v["expected"]
        assert got["cleaned_text"] == exp["cleaned_text"], v["name"]
        for key in ("payload_kind", "title", "date", "language", "word_count",
                    "page_count", "doc_id", "tickers", "authors",
                    "figures_kept", "figures_dropped", "clean_stats",
                    "summary", "error"):
            assert got[key] == exp[key], f"{v['name']}:{key}"
        for coll in ("passages", "tables", "numerics", "entities", "figures"):
            assert got[coll] == exp[coll], f"{v['name']}:{coll}"
        assert got["spans"] == exp["spans"], f"{v['name']}:spans"


def test_span_bounds_hold_on_golden(golden_vectors):
    for v in golden_vectors:
        got = extract_turn(v["payload"], v["tool"], v["name"])
        n = len(v["payload"])
        for s in got["spans"]:
            assert s["start"] == -1 or (0 <= s["start"] <= s["end"] <= n), \
                (v["name"], s)
