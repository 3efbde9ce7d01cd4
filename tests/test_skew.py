"""Skew toolkit tests: salted join/count equivalence to unsalted, salt
determinism, LSH bucket capping."""

import pandas as pd
from pyspark.sql import functions as F

from kgspark.functions.skew import cap_buckets, salted_count, salted_join, with_salt


def _skewed(spark, n=2000):
    # hot key: 90% of rows share key 'hot'
    rows = [(i, "hot" if i % 10 else f"k{i}", i * 1.5) for i in range(n)]
    return spark.createDataFrame(pd.DataFrame(rows, columns=["id", "k", "v"]))


def test_salted_join_matches_plain_join(spark):
    big = _skewed(spark)
    small = spark.createDataFrame(
        pd.DataFrame({"k": ["hot", "k5", "missing"], "label": ["H", "F", "M"]}))
    plain = {(r["id"], r["label"]) for r in big.join(small, "k").collect()}
    salted = {(r["id"], r["label"]) for r in
              salted_join(big, small, "k", n_salt=8).collect()}
    assert salted == plain and len(plain) > 1000


def test_salted_join_left_outer(spark):
    big = _skewed(spark, 100)
    small = spark.createDataFrame(pd.DataFrame({"k": ["hot"], "label": ["H"]}))
    out = salted_join(big, small, "k", n_salt=4, how="left")
    rows = out.collect()
    assert len(rows) == 100
    assert sum(1 for r in rows if r["label"] is None) == 10  # the k{i} keys


def test_salted_count_matches_groupby(spark):
    df = _skewed(spark)
    plain = {(r["k"], r["count"]) for r in
             df.groupBy("k").agg(F.count("*").alias("count")).collect()}
    salted = {(r["k"], r["count"]) for r in
              salted_count(df, ["k"], n_salt=8).collect()}
    assert salted == plain


def test_salt_deterministic(spark):
    df = _skewed(spark, 200)
    a = {(r["id"], r["_salt"]) for r in with_salt(df, 16, ["id"]).collect()}
    b = {(r["id"], r["_salt"]) for r in with_salt(df, 16, ["id"]).collect()}
    assert a == b
    assert len({s for _, s in a}) > 4  # actually spreads


def test_cap_buckets_drops_only_oversized(spark):
    rows = [(i, "big") for i in range(50)] + [(100 + i, f"s{i % 5}") for i in range(10)]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "bucket"]))
    kept = cap_buckets(df, ["bucket"], max_size=10).collect()
    assert all(r["bucket"] != "big" for r in kept)
    assert len(kept) == 10


def test_lsh_pairs_bucket_cap_bounds_blowup(spark):
    """200 docs sharing identical boilerplate text would produce ~20k
    candidate pairs; a bucket cap of 20 bounds the self-join while the
    distinct near-dup pair is still found via its (uncapped) bands."""
    from kgspark.datapipe.dedupe import minhash_lsh_pairs

    boiler = "lorem ipsum dolor sit amet consectetur adipiscing elit sed do"
    rows = [(i, boiler) for i in range(200)]
    rows += [(900, "a unique document about spark adaptive execution planning"),
             (901, "a unique document about spark adaptive execution planning!")]
    df = spark.createDataFrame(pd.DataFrame(rows, columns=["id", "text"]))
    pairs = minhash_lsh_pairs(df, "id", "text", threshold=0.5,
                              max_bucket_size=20)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert (900, 901) in got
    # boilerplate pairs bounded: full blowup would be 19900 pairs
    assert len(got) < 2000


def test_dedupe_edges_salted_equals_plain(spark):
    """The two-phase hot-key path of dedupe_edges must be output-
    equivalent to the single-shuffle path (same argmin winner, same
    sorted episode provenance)."""
    from tools.skew_bench import skewed_ext_edges

    from kgspark.operators.dedup import dedupe_edges

    def canon(rows):
        return sorted(
            tuple(tuple(v) if isinstance(v, list) else v for v in r)
            for r in rows
        )

    edges = skewed_ext_edges(spark, 5000, 0.3)
    plain = canon(dedupe_edges(edges).collect())
    salted = canon(dedupe_edges(edges, n_salt=8).collect())
    assert plain == salted
