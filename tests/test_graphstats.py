"""Triangle / clustering stats (kgspark/operators/graphstats.py)."""

from pyspark.sql import functions as F

from kgspark.operators.graphstats import (
    degree_oriented,
    simple_undirected,
    triangle_stats,
    triangle_stats_oracle_sql,
)

COLS = ["source_node_uuid", "target_node_uuid"]


def _stats(spark, edges):
    df = spark.createDataFrame(edges, COLS)
    rows = triangle_stats(df).collect()
    return {r["node"]: (r["degree"], r["triangles"], r["clustering"]) for r in rows}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    got = _stats(spark, k4)
    assert got == {n: (3, 3, 1.0) for n in "abcd"}


def test_triangle_plus_pendant(spark):
    # a-b-c triangle, d hangs off c: d closes nothing
    got = _stats(spark, [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d")])
    assert got["a"] == (2, 1, 1.0)
    assert got["b"] == (2, 1, 1.0)
    assert got["c"][:2] == (3, 1)
    assert abs(got["c"][2] - 1 / 3) < 1e-12
    assert got["d"] == (1, 0, None)


def test_multigraph_collapses_before_counting(spark):
    # reciprocal + parallel edges and a self-loop must not inflate
    # degree or triangle counts
    noisy = [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c"), ("a", "c"),
             ("c", "c")]
    assert _stats(spark, noisy) == _stats(spark, [("a", "b"), ("b", "c"), ("a", "c")])


def test_star_graph_orients_away_from_hub(spark):
    """Skew mitigation: on a hub-and-spokes graph every edge must orient
    leaf → hub, so the hub's wedge-producing out-degree is 0 (the
    'last reducer' never sees the hub's neighbor list)."""
    star = [("hub", f"leaf{i:02d}") for i in range(20)]
    df = spark.createDataFrame(star, COLS)
    und = simple_undirected(df).persist()
    deg = (
        und.select(F.col("u").alias("node"))
        .unionByName(und.select(F.col("v").alias("node")))
        .groupBy("node").agg(F.count("*").alias("degree"))
    )
    out_deg = {r["src"]: r["c"] for r in
               degree_oriented(und, deg).groupBy("src")
               .agg(F.count("*").alias("c")).collect()}
    assert "hub" not in out_deg
    assert max(out_deg.values()) == 1
    got = _stats(spark, star)
    assert all(t == 0 for (_, t, _) in got.values())


def test_oracle_sql_matches_spark_in_duckdb(spark):
    import duckdb

    edges = [("a", "b"), ("b", "c"), ("a", "c"), ("c", "d"), ("b", "d"),
             ("d", "e"), ("e", "a"), ("e", "b")]
    con = duckdb.connect()
    con.execute("CREATE TABLE et (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO et VALUES (?, ?)", edges)
    got = {r[0]: (r[1], r[2]) for r in con.execute(
        triangle_stats_oracle_sql("SELECT src, dst FROM et")).fetchall()}
    want = {n: (d, t) for n, (d, t, _) in _stats(spark, edges).items()}
    assert {k: (int(d), int(t)) for k, (d, t) in got.items()} == want


def _cores(spark, pairs, **kw):
    from kgspark.operators.graphstats import kcore_numbers

    df = spark.createDataFrame(pairs, ["source_node_uuid", "target_node_uuid"])
    return {r["node"]: r["core"] for r in kcore_numbers(df, **kw).collect()}


def test_kcore_clique_with_tail(spark):
    # K4 (core 3) with a path tail d-e-f (core 1): d is in K4
    k4 = [(a, b) for a in "abcd" for b in "abcd" if a < b]
    got = _cores(spark, k4 + [("d", "e"), ("e", "f")])
    assert got == {"a": 3, "b": 3, "c": 3, "d": 3, "e": 1, "f": 1}


def test_kcore_two_triangles_bridge(spark):
    # two triangles joined by a bridge: every triangle node core 2
    pairs = [("a", "b"), ("b", "c"), ("a", "c"),
             ("x", "y"), ("y", "z"), ("x", "z"), ("c", "x")]
    got = _cores(spark, pairs)
    assert got == {n: 2 for n in "abcxyz"}


def test_kcore_fixed_schedule_matches_converged(spark):
    # h-index estimates are monotone; once converged, extra rounds no-op —
    # a fixed n_iter ≥ convergence rounds equals the fixpoint
    # path: all core 1; h-index convergence on a path takes ~len/2 rounds
    # (the 1-estimates walk inward one hop per round), so n_iter must
    # cover the diameter — 5 rounds suffice for 9 nodes, not for 13
    pairs = [(f"n{i}", f"n{i+1}") for i in range(8)]
    assert _cores(spark, pairs, n_iter=5) == {f"n{i}": 1 for i in range(9)}
    long = [(f"n{i}", f"n{i+1}") for i in range(12)]
    assert _cores(spark, long) == {f"n{i}": 1 for i in range(13)}


def test_kcore_q_kcore_graph_converges_within_6(spark):
    # the q_kcore oracle query runs a FIXED 6-round schedule for
    # cross-engine parity; assert that on its exact graph (sf0.01
    # lineitem part co-occurrence, l_orderkey <= 100) the converged
    # fixpoint equals the 6-round output — i.e. 6 rounds genuinely
    # cover convergence there, not just on synthetic paths/cliques
    from pyspark.sql import functions as F

    from kgspark.operators.graphstats import kcore_numbers

    li = (spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet")
          .where(F.col("l_orderkey") <= 100)
          .select("l_orderkey", "l_partkey"))
    a, b = li.alias("a"), li.alias("b")
    co = a.join(
        b, (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
        & (F.col("a.l_partkey") < F.col("b.l_partkey")),
    ).select(
        F.concat(F.lit("p"), F.col("a.l_partkey")).alias("source_node_uuid"),
        F.concat(F.lit("p"), F.col("b.l_partkey")).alias("target_node_uuid"),
    )
    fixed = {r["node"]: r["core"]
             for r in kcore_numbers(co, n_iter=6, num_partitions=8).collect()}
    conv = {r["node"]: r["core"]
            for r in kcore_numbers(co, num_partitions=8).collect()}
    assert fixed == conv and len(fixed) > 0


def test_kcore_max_iter_raises(spark):
    import pytest as _pytest

    # a 13-node path needs ~6 rounds; max_iter=1 must abort, not return
    # the half-converged estimates
    pairs = [(f"n{i}", f"n{i+1}") for i in range(12)]
    with _pytest.raises(RuntimeError, match="no fixpoint"):
        _cores(spark, pairs, max_iter=1)
