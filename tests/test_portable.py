"""Cross-engine portable hash primitives (kgspark/functions/portable.py):
the md5-derived 60-bit family must be bit-identical between Spark and
DuckDB — that equivalence is what turns the xxhash64-blocked driver
queries (simhash_pairs, knn_join, fingerprint) into fully
oracle-checkable ones."""

import duckdb
import pandas as pd

from pyspark.sql import functions as F

from kgspark.functions.portable import (
    HASH_BITS,
    fingerprint60,
    md5_parity,
    md5hash60,
    simhash60,
)
from kgspark.functions.text import tokenize

TEXTS = [
    "the quick brown fox jumps over the lazy dog",
    "The Quick brown FOX!",
    "",
    "Ünïcode tëst — dashes and £symbols",
    "a|b|c pipes should not collide with a |b|c",
    "repeat repeat repeat repeat token weighting",
]


def _spark_vals(spark, col):
    df = spark.createDataFrame(pd.DataFrame({"t": TEXTS}))
    return [r["v"] for r in df.select(col.alias("v")).collect()]


def test_md5hash60_matches_duckdb(spark):
    got = _spark_vals(spark, md5hash60(F.col("t")))
    con = duckdb.connect()
    for t, g in zip(TEXTS, got):
        want = con.sql(
            "SELECT ('0x' || substr(md5(?),1,15))::UBIGINT", params=[t]
        ).fetchone()[0]
        assert g == want, t
        assert 0 <= g < 2 ** HASH_BITS


def test_md5_parity_matches_duckdb(spark):
    got = _spark_vals(spark, md5_parity(F.col("t")))
    con = duckdb.connect()
    for t, g in zip(TEXTS, got):
        want = con.sql(
            "SELECT ('0x' || substr(md5(?),32,1))::INT % 2", params=[t]
        ).fetchone()[0]
        assert g == want, t


def test_simhash60_matches_duckdb(spark):
    got = _spark_vals(spark, simhash60(tokenize(F.col("t"))))
    con = duckdb.connect()
    sql = """
        WITH toks AS (SELECT list_filter(
              string_split_regex(lower(?), '[^a-z0-9]+'), x -> x <> '') AS t),
        hs AS (SELECT list_transform(t,
              w -> ('0x' || substr(md5(w),1,15))::UBIGINT) AS h FROM toks)
        SELECT list_sum(list_transform(range(60), j -> CASE WHEN
                 coalesce(list_sum(list_transform(h, x ->
                   CASE WHEN (x >> j) & 1 = 1 THEN 1 ELSE -1 END)), 0) > 0
                 THEN (1::UBIGINT << j) ELSE 0::UBIGINT END))::UBIGINT
        FROM hs
    """
    for t, g in zip(TEXTS, got):
        assert g == con.sql(sql, params=[t]).fetchone()[0], t


def test_fingerprint60_matches_duckdb_and_is_order_sensitive(spark):
    got = _spark_vals(spark, fingerprint60(F.col("t")))
    con = duckdb.connect()
    sql = """
        WITH toks AS (SELECT list_filter(
              string_split_regex(lower(?), '[^a-z0-9]+'), x -> x <> '') AS t),
        grams AS (SELECT CASE WHEN len(t) >= 4 THEN
              list_transform(range(len(t) - 3),
                             i -> array_to_string(t[i+1:i+4], ' '))
            ELSE [coalesce(array_to_string(t, ' '), '')] END AS g0 FROM toks),
        dg AS (SELECT list_filter(g0,
              (x, i) -> list_position(g0, x) = i) AS g FROM grams)
        SELECT list_reduce(list_prepend(0::UBIGINT,
                 list_transform(g, w -> ('0x' || substr(md5(w),1,15))::UBIGINT)),
               (acc, h) -> ('0x' || substr(md5(acc::VARCHAR || '|' ||
                            h::VARCHAR), 1, 15))::UBIGINT)::BIGINT
        FROM dg
    """
    for t, g in zip(TEXTS, got):
        assert g == con.sql(sql, params=[t]).fetchone()[0], t
    # order sensitivity: same bag of words, different order → different fp
    df = spark.createDataFrame(
        pd.DataFrame({"t": ["alpha beta gamma delta epsilon",
                            "epsilon delta gamma beta alpha"]}))
    fps = [r["v"] for r in df.select(fingerprint60(F.col("t")).alias("v")).collect()]
    assert fps[0] != fps[1]


def test_simhash_portable_pigeonhole_equals_all_pairs(spark):
    """simhash_pairs(portable) with default bands must return EXACTLY the
    all-pairs hamming ≤ h set (pigeonhole guarantee, no w.h.p. slack)."""
    from kgspark.datapipe.dedupe import simhash_pairs

    docs = [(i, f"shared core text block number {i % 3} with tail {i}")
            for i in range(12)]
    df = spark.createDataFrame(pd.DataFrame(docs, columns=["id", "text"]))
    h = 12
    got = {(r["id_a"], r["id_b"], r["hamming"]) for r in
           simhash_pairs(df, "id", "text", max_hamming=h, portable=True).collect()}
    fp = {r["id"]: r["v"] for r in
          df.select("id", simhash60(tokenize(F.col("text"))).alias("v")).collect()}
    want = set()
    for a in fp:
        for b in fp:
            if a < b and bin(fp[a] ^ fp[b]).count("1") <= h:
                want.add((a, b, bin(fp[a] ^ fp[b]).count("1")))
    assert got == want
