"""PageRank centrality (kgspark/operators/centrality.py)."""

from fractions import Fraction

from pyspark.sql import functions as F

from kgspark.operators.centrality import pagerank, pagerank_oracle_sql

# a -> b, a -> c, b -> c, c -> a, d -> c   (d is a source; no dangling-
# node redistribution: c is the hub, a second via c's backlink)
EDGES = [("a", "b"), ("a", "c"), ("b", "c"), ("c", "a"), ("d", "c")]


def _reference_fixed_point(edges, damping=0.85, n_iter=10, scale=1_000_000):
    """Plain-Python replay of the documented fixed-point semantics."""
    d = Fraction(damping).limit_denominator(10_000)
    base = int(round((1 - damping) * scale))
    out = {}
    for s, _ in edges:
        out[s] = out.get(s, 0) + 1
    nodes = sorted({n for e in edges for n in e})
    rank = {n: scale for n in nodes}
    for _ in range(n_iter):
        s = {n: 0 for n in nodes}
        for u, v in edges:
            s[v] += rank[u] // out[u]
        rank = {n: base + (d.numerator * s[n]) // d.denominator for n in nodes}
    return rank


def _run(spark, **kw):
    df = spark.createDataFrame(EDGES, ["source_node_uuid", "target_node_uuid"])
    return pagerank(df, **kw)


def test_fixed_point_matches_python_reference(spark):
    got = {r["node"]: r["rank_fp"] for r in _run(spark, n_iter=10).collect()}
    assert got == _reference_fixed_point(EDGES, n_iter=10)


def test_hub_ranks_highest_and_source_lowest(spark):
    got = {r["node"]: r["rank_fp"] for r in _run(spark, n_iter=10).collect()}
    assert got["c"] == max(got.values())
    assert got["d"] == min(got.values())  # nothing links to d


def test_float_variant_tracks_fixed_point(spark):
    fp = {r["node"]: r["rank"] for r in _run(spark, n_iter=5).collect()}
    fl = {r["node"]: r["rank"] for r in _run(spark, n_iter=5, scale=None).collect()}
    assert fl.keys() == fp.keys()
    for n in fp:
        # fixed-point floors each division at 1e-6 granularity; a few
        # iterations compound that to ~1e-5 relative
        assert abs(fl[n] - fp[n]) < 1e-4


def test_parallel_edges_carry_multiplicity(spark):
    doubled = EDGES + [("d", "c")]
    base = {r["node"]: r["rank_fp"] for r in _run(spark).collect()}
    df = spark.createDataFrame(doubled, ["source_node_uuid", "target_node_uuid"])
    got = {r["node"]: r["rank_fp"] for r in pagerank(df).collect()}
    # d now has out-degree 2 but both edges hit c: same total mass to c
    assert got == _reference_fixed_point(doubled)
    assert got["c"] == base["c"]


def test_oracle_sql_matches_spark_in_duckdb(spark):
    import duckdb

    con = duckdb.connect()
    con.execute("CREATE TABLE et (src VARCHAR, dst VARCHAR)")
    con.executemany("INSERT INTO et VALUES (?, ?)", EDGES)
    sql = pagerank_oracle_sql("SELECT src, dst FROM et", n_iter=10)
    got = dict(con.execute(sql).fetchall())
    spark_got = {r["node"]: r["rank_fp"] for r in _run(spark, n_iter=10).collect()}
    assert {k: int(v) for k, v in got.items()} == spark_got


def test_partition_invariance(spark):
    """Bigint sums are order-independent: the exact same rank_fp values
    must come out regardless of how the edges are partitioned — the
    property the fixed-point design buys (a float PageRank only promises
    this to within ulp re-association drift)."""
    a = {r["node"]: r["rank_fp"] for r in _run(spark, num_partitions=1).collect()}
    b = {r["node"]: r["rank_fp"] for r in _run(spark, num_partitions=7).collect()}
    assert a == b
