"""Unit tests for MinHash-LSH (D2 machinery) and connected components (D4)."""

import pandas as pd
from pyspark.sql import functions as F

from kgspark.functions.minhash import (
    char_shingles,
    hamming64,
    jaccard,
    lsh_pairs,
    simhash64,
    word_shingles,
)
from kgspark.operators.dedup import connected_components


def test_lsh_finds_near_dups(spark):
    df = spark.createDataFrame(
        pd.DataFrame({
            "id": ["a", "b", "c", "d"],
            "grp": ["g", "g", "g", "g"],
            "name": [
                "acme corporation international",
                "acme corporation internationa1",  # near-identical
                "completely different words here",
                "acme corp",
            ],
        })
    ).withColumn("sh", char_shingles(F.col("name"), 3))
    pairs = lsh_pairs(df, "id", "sh", "grp", jaccard_threshold=0.6)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("a", "b") in got
    assert all("c" not in p for p in got)


def test_jaccard_exact(spark):
    row = spark.range(1).select(
        jaccard(F.array(F.lit("x"), F.lit("y")), F.array(F.lit("y"), F.lit("z"))).alias("j")
    ).collect()[0]
    assert abs(row["j"] - 1 / 3) < 1e-9


def test_word_shingles(spark):
    row = spark.range(1).select(
        word_shingles(F.split(F.lit("a b c d"), " "), 3).alias("s")
    ).collect()[0]
    assert row["s"] == ["a b c", "b c d"]


def test_simhash_similarity(spark):
    df = spark.createDataFrame(
        pd.DataFrame({"id": [1, 2, 3], "text": [
            "the quick brown fox jumps over the lazy dog",
            "the quick brown fox jumps over the lazy cat",
            "entirely unrelated content about spark sql engines",
        ]})
    ).select("id", simhash64(F.split("text", " ")).alias("h"))
    rows = {r["id"]: r["h"] for r in df.collect()}
    d12 = spark.range(1).select(hamming64(F.lit(rows[1]), F.lit(rows[2])).alias("d")).collect()[0]["d"]
    d13 = spark.range(1).select(hamming64(F.lit(rows[1]), F.lit(rows[3])).alias("d")).collect()[0]["d"]
    assert d12 < d13


def test_connected_components_transitive(spark):
    pairs = spark.createDataFrame(
        pd.DataFrame({"id_a": ["a", "b", "x"], "id_b": ["b", "c", "y"]})
    )
    comp = {r["id"]: r["comp"] for r in connected_components(pairs).collect()}
    assert comp["a"] == comp["b"] == comp["c"]  # D4 chain a→b→c compressed
    assert comp["x"] == comp["y"]
    assert comp["a"] != comp["x"]


def _alias_graph():
    """Deterministic stress graph for the CC/uuid-map scale paths:
    3 deep chains (40 hops — exercises pointer-jumping depth, since
    label propagation alone covers only O(rounds) hops), 2 cliques,
    and isolated pairs. ~200 nodes / ~260 pairs."""
    pairs = []
    for c in range(3):
        pairs += [(f"ch{c}n{j:02d}", f"ch{c}n{j + 1:02d}") for j in range(40)]
    for q in range(2):
        ids = [f"cl{q}n{j}" for j in range(8)]
        pairs += [(a, b) for i, a in enumerate(ids) for b in ids[i + 1:]]
    pairs += [(f"p{i}a", f"p{i}b") for i in range(10)]
    return pairs


def test_distributed_cc_and_uuid_map_match_driver_paths(spark):
    """The ≥threshold scale branches (distributed pointer-jumping CC,
    join-formulated uuid map) must agree exactly with the driver
    union-find fast paths on the same input — forced by driver_threshold=0."""
    from datetime import datetime, timedelta

    from kgspark.operators.dedup import build_uuid_map

    pairs = _alias_graph()
    pdf = pd.DataFrame(pairs, columns=["id_a", "id_b"])
    df = spark.createDataFrame(pdf).repartition(8)

    fast = {r["id"]: r["comp"] for r in
            connected_components(df, driver_threshold=10**6).collect()}
    # rounds=6 → covers diameter ~2^6, enough for the 40-hop chains
    dist = {r["id"]: r["comp"] for r in
            connected_components(df, driver_threshold=0).collect()}
    assert dist == fast
    # chains really collapse to one component each
    assert len({v for k, v in fast.items() if k.startswith("ch1")}) == 1

    # uuid-map parity: created_at varies so first-wins is non-trivial
    ids = sorted({x for p in pairs for x in p})
    t0 = datetime(2024, 1, 1)
    nodes = spark.createDataFrame(pd.DataFrame({
        "uuid": ids,
        "created_at": [t0 + timedelta(minutes=(hash(i) % 997)) for i in ids],
    }))
    fast_m = {r["uuid"]: r["canonical_uuid"] for r in
              build_uuid_map(nodes, df, driver_threshold=10**6).collect()}
    dist_m = {r["uuid"]: r["canonical_uuid"] for r in
              build_uuid_map(nodes, df, driver_threshold=0).collect()}
    assert dist_m == fast_m and len(fast_m) > 100
