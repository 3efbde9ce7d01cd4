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
