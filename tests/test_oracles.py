"""Driver-gate rehearsal inside pytest: a representative subset of
queries() vs oracle_sql() (full sweep: tools/check_oracles.py)."""

import duckdb
import pytest

from tools.check_oracles import TABLES, normalize

SF = "/root/testdata/sf0.01"

SUBSET = ["extract_per_turn", "extract_kind_rollup", "conversation_rollup",
          "pricing_summary", "doc_text_stats", "doc_lang_id",
          "dedup_minhash_pairs", "dedup_ngram_jaccard",
          "ann_cosine_topk", "ann_lsh_buckets"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{SF}/{t}.parquet')")
    return con


@pytest.mark.parametrize("name", SUBSET)
def test_query_matches_oracle(spark, duck, name):
    import __spark_entry__ as entry
    sdf = entry.queries()[name](spark, SF)
    srows = [tuple(r) for r in sdf.collect()]
    rel = duck.sql(entry.oracle_sql()[name])
    orows = rel.fetchall()
    assert sorted(sdf.columns) == sorted(rel.columns), name
    assert len(srows) == len(orows), name
    assert normalize(srows, sdf.columns) == normalize(orows, rel.columns), name
