"""T2 window-invalidation unit tests (reference edge_operations.py:364-394
semantics as batch windows)."""

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from kgspark.operators.temporal import invalidate_edges, point_in_time

NOW = datetime(2025, 1, 1)


def _edges(spark, rows):
    df = pd.DataFrame(
        rows,
        columns=["uuid", "group_id", "source_node_uuid", "target_node_uuid",
                 "pred", "valid_at", "invalid_at", "ref_ts"],
    )
    return spark.createDataFrame(df)


def test_affect_polarity_flip(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    out = invalidate_edges(_edges(spark, [
        ("e1", "g", "alice", "bob", "LIKES", t0, None, t0),
        ("e2", "g", "alice", "bob", "DISLIKES", t1, None, t1),
    ]), now=NOW)
    rows = {r["uuid"]: r for r in out.collect()}
    assert rows["e1"]["invalid_at"] == t1 and rows["e1"]["expired_at"] == NOW
    assert rows["e2"]["invalid_at"] is None


def test_same_polarity_no_invalidation(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    out = invalidate_edges(_edges(spark, [
        ("e1", "g", "alice", "bob", "LIKES", t0, None, t0),
        ("e2", "g", "alice", "bob", "LOVES", t1, None, t1),  # same polarity class
    ]), now=NOW)
    rows = {r["uuid"]: r for r in out.collect()}
    assert rows["e1"]["invalid_at"] is None


def test_functional_supersede(spark):
    t0, t1, t2 = datetime(2024, 1, 1), datetime(2024, 2, 1), datetime(2024, 3, 1)
    out = invalidate_edges(_edges(spark, [
        ("e1", "g", "u", "paris", "LIVES_IN", t0, None, t0),
        ("e2", "g", "u", "berlin", "LIVES_IN", t1, None, t1),
        ("e3", "g", "u", "tokyo", "LIVES_IN", t2, None, t2),
    ]), now=NOW)
    rows = {r["uuid"]: r for r in out.collect()}
    assert rows["e1"]["invalid_at"] == t1
    assert rows["e2"]["invalid_at"] == t2
    assert rows["e3"]["invalid_at"] is None


def test_role_inverse_functional(spark):
    t0, t1 = datetime(2011, 1, 1), datetime(2017, 1, 10)
    out = invalidate_edges(_edges(spark, [
        ("e1", "g", "kamala", "california", "IS_ATTORNEY_GENERAL_OF", t0,
         datetime(2017, 1, 3), t0),
        ("e2", "g", "xavier", "california", "IS_ATTORNEY_GENERAL_OF", t1, None, t1),
    ]), now=NOW)
    rows = {r["uuid"]: r for r in out.collect()}
    # explicit earlier end date is kept (tightening only)
    assert rows["e1"]["invalid_at"] == datetime(2017, 1, 3)
    assert rows["e2"]["invalid_at"] is None


def test_null_valid_at_ordered_by_ref_ts(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    out = invalidate_edges(_edges(spark, [
        ("e1", "g", "u", "acme", "WORKS_AT", None, None, t0),
        ("e2", "g", "u", "globex", "WORKS_AT", None, None, t1),
    ]), now=NOW)
    rows = {r["uuid"]: r for r in out.collect()}
    assert rows["e1"]["invalid_at"] == t1


def test_point_in_time(spark):
    t0, t1 = datetime(2024, 1, 1), datetime(2024, 2, 1)
    df = invalidate_edges(_edges(spark, [
        ("e1", "g", "a", "b", "LIKES", t0, None, t0),
        ("e2", "g", "a", "b", "DISLIKES", t1, None, t1),
    ]), now=NOW)
    mid = point_in_time(df, datetime(2024, 1, 15)).collect()
    assert [r["uuid"] for r in mid] == ["e1"]
    after = point_in_time(df, datetime(2024, 3, 1)).collect()
    assert [r["uuid"] for r in after] == ["e2"]
