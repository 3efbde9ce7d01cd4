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


def _mixed_corpus():
    """Deterministic multi-group edge set exercising all three passes
    (affect flips, functional chains, role holder changes) plus solo
    predicates and a pre-existing explicit invalid_at."""
    rows, i = [], 0
    base = datetime(2024, 1, 1)
    for g in ("g0", "g1", "g2"):
        for s, o in (("alice", "bob"), ("carol", "dan")):
            for m, pred in enumerate(("LIKES", "DISLIKES", "LOVES")):
                t = datetime(2024, 1 + m, 1)
                rows.append((f"e{i}", g, s, o, pred, t, None, t)); i += 1
        for m, city in enumerate(("paris", "berlin", "tokyo")):
            t = datetime(2024, 2 + m, 1)
            rows.append((f"e{i}", g, "u" + g, city, "LIVES_IN", t, None, t)); i += 1
        for m, ceo in enumerate(("kamala", "xavier")):
            t = datetime(2024, 1 + m, 15)
            rows.append((f"e{i}", g, ceo, "acme" + g, "IS_CEO_OF", t,
                         datetime(2024, 2, 10) if m == 0 else None, t)); i += 1
        rows.append((f"e{i}", g, "alice", "report", "MENTIONS", base, None, base)); i += 1
        rows.append((f"e{i}", g, "x", "acme" + g, "WORKS_AT", None, None,
                     datetime(2024, 5, 1))); i += 1
    return rows


def test_slim_wide_prepartition_parity(spark):
    """The 2x2 matrix {slim, wide} x {pre_partition on, off} is
    row-identical — the slim join-back and the shared-exchange fast path
    are pure physical rewrites."""
    edges = _edges(spark, _mixed_corpus())
    outs = []
    for n_edges in (1, 10**9):          # below / above slim_threshold
        for pre in (True, False):
            out = invalidate_edges(edges, now=NOW, n_edges=n_edges,
                                   pre_partition=pre)
            outs.append(sorted(map(tuple, out.collect())))
    assert outs[0] == outs[1] == outs[2] == outs[3]
    # the corpus actually exercises every pass family: something got
    # invalidated among affect / functional / role rows, solos untouched
    cols = edges.columns
    bypred = {}
    for t in outs[0]:
        r = dict(zip(cols, t))
        bypred.setdefault(r["pred"], []).append(r)
    assert any(r["invalid_at"] for r in bypred["LIKES"])
    assert any(r["invalid_at"] for r in bypred["LIVES_IN"])
    # role pass: the displaced holder keeps its EARLIER explicit end date
    # (tightening only); the last holder stays open
    for r in bypred["IS_CEO_OF"]:
        if r["source_node_uuid"] == "kamala":
            assert r["invalid_at"] == datetime(2024, 2, 10)
        else:
            assert r["invalid_at"] is None
    assert all(r["invalid_at"] is None for r in bypred["MENTIONS"])


def test_prepartition_shares_one_exchange(spark):
    """pre_partition=True: one hash exchange on group_id satisfies all
    three passes' ClusteredDistribution (group_id, key) — the plan holds
    exactly 1 Exchange; the fallback re-shuffles per pass (3)."""
    edges = _edges(spark, _mixed_corpus())
    aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        def n_exchanges(pre):
            out = invalidate_edges(edges, now=NOW, n_edges=1,  # wide: no join
                                   pre_partition=pre)
            plan = out._jdf.queryExecution().executedPlan().toString()
            return plan.count("Exchange hashpartitioning")
        assert n_exchanges(True) == 1
        assert n_exchanges(False) == 3
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe)


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
