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
