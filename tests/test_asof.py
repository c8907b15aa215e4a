from datetime import datetime

from engine.datawork.asof import asof_join


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [("e1", 1, _ts("2024-01-01T10:00")),   # before any right → null
         ("e2", 1, _ts("2024-01-01T12:00")),   # after r1 → r1
         ("e3", 1, _ts("2024-01-01T13:00")),   # exact tie with r2 → r2
         ("e4", 2, _ts("2024-01-01T12:00"))],  # other key, no right → null
        "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        [("r1", 1, _ts("2024-01-01T11:00"), 10.0),
         ("r2", 1, _ts("2024-01-01T13:00"), 20.0)],
        "rid string, user_id int, ts timestamp, value double")

    out = {r["event_id"]: r for r in
           asof_join(left, right, on="ts", by="user_id",
                     value_cols=["rid", "value"]).collect()}
    assert out["e1"]["rid_asof"] is None
    assert out["e2"]["rid_asof"] == "r1" and out["e2"]["value_asof"] == 10.0
    assert out["e3"]["rid_asof"] == "r2" and out["e3"]["value_asof"] == 20.0
    assert out["e4"]["rid_asof"] is None
    assert len(out) == 4  # left rows preserved exactly


def test_asof_carry_is_atomic_across_null_fields(spark):
    """A right row with a null value column must not be backfilled from an
    older right row — the carried record is one struct, not per-column."""
    left = spark.createDataFrame(
        [("e1", 1, _ts("2024-01-01T14:00"))],
        "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        [("r1", 1, _ts("2024-01-01T11:00"), 2.0),
         ("r2", 1, _ts("2024-01-01T12:00"), None)],
        "rid string, user_id int, ts timestamp, value double")
    [row] = asof_join(left, right, on="ts", by="user_id",
                      value_cols=["rid", "value"]).collect()
    assert row["rid_asof"] == "r2"
    assert row["value_asof"] is None  # NOT 2.0 stitched from r1


def test_asof_ignores_null_right_timestamps(spark):
    left = spark.createDataFrame(
        [("e1", 1, _ts("2024-01-01T12:00"))],
        "event_id string, user_id int, ts timestamp")
    right = spark.createDataFrame(
        [("rX", 1, None, 9.9)],
        "rid string, user_id int, ts timestamp, value double")
    [row] = asof_join(left, right, on="ts", by="user_id",
                      value_cols=["rid", "value"]).collect()
    assert row["rid_asof"] is None and row["value_asof"] is None
