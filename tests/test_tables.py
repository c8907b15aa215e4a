from engine.core.tables import extract_tables


def test_basic_table_and_ragged_row_drop():
    md = ("| A | B | C |\n|---|---|---|\n| 1 | 2 | 3 |\n| 4 | 5 |\n| 6 | 7 | 8 |\n")
    [t] = extract_tables(md, 3)
    assert t["columns"] == ["A", "B", "C"]
    assert t["rows"] == [{"A": "1", "B": "2", "C": "3"},
                         {"A": "6", "B": "7", "C": "8"}]
    assert t["title"] == "Table on page 3"
    assert t["page"] == 3


def test_table_requires_trailing_newline_on_last_row():
    md = "| A | B |\n|---|---|\n| 1 | 2 |"  # no trailing newline → regex misses
    assert extract_tables(md, 0) == []


def test_all_rows_ragged_drops_table():
    md = "| A | B |\n|---|---|\n| 1 |\n| 2 |\n"
    assert extract_tables(md, 0) == []


def test_two_tables_index_in_id():
    md = ("| A |\n|---|\n| 1 |\n\ntext between\n\n| B |\n|---|\n| 2 |\n")
    t = extract_tables(md, 1)
    assert len(t) == 2
    assert t[0]["table_id"] != t[1]["table_id"]
