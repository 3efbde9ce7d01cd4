"""Skew handling for hot keys (SURVEY §4 "Skew: hot entities" — the
north rule's "salted joins for hot entities").

Celebrity pages at web scale concentrate mentions onto single join /
groupBy keys. AQE's skew-join split handles oversized *shuffle blocks*
on sort-merge joins, but not hot keys inside a hash aggregation or an
exploded LSH bucket. Three explicit tools:

- ``with_salt``          deterministic salt column (content-derived, so
                         re-runs place rows identically — checkpoint-safe)
- ``salted_join``        big-side salted equi-join: small side replicated
                         across the salt domain, hot key fan-out bounded
                         by n_salt
- ``salted_count``       two-phase aggregation: partial count per
                         (key, salt), final merge per key
- ``cap_buckets``        drop LSH band buckets above a size cap —
                         boilerplate shingle-sets produce quadratic
                         self-join blowups; near-dup pairs lost from a
                         capped bucket still collide in their other bands
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def with_salt(df: DataFrame, n_salt: int, from_cols: list[str]) -> DataFrame:
    """Add a deterministic `_salt` in [0, n_salt) derived from row
    content (NOT rand() — resume/retry must re-derive the same salt)."""
    return df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*[F.col(c).cast("string") for c in from_cols]),
               F.lit(n_salt)).cast("int"),
    )


def salted_join(
    big: DataFrame, small: DataFrame, on: str, n_salt: int = 16,
    how: str = "inner", salt_from: list[str] | None = None,
) -> DataFrame:
    """Equi-join where `big` has hot values of `on`: big rows get a
    content-derived salt, `small` is replicated n_salt× (explode — it
    stays broadcast-sized for n_salt × |small| small), and the join key
    becomes (on, salt) — a hot key now spreads over n_salt partitions."""
    salt_cols = salt_from or [c for c in big.columns if c != on][:2] or [on]
    b = with_salt(big, n_salt, salt_cols)
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("int"))
    return b.join(s, [on, "_salt"], how).drop("_salt")


def salted_count(
    df: DataFrame, keys: list[str], n_salt: int = 16,
    salt_from: list[str] | None = None,
) -> DataFrame:
    """Hot-key-safe count: partial count per (keys, salt), then final
    merge per keys. (Spark's hash agg already does map-side partials;
    this adds a reduce-side split for keys too hot for one task.)"""
    salt_cols = salt_from or keys
    partial = (
        with_salt(df, n_salt, salt_cols)
        .groupBy(*keys, "_salt")
        .agg(F.count("*").alias("_partial"))
    )
    return partial.groupBy(*keys).agg(F.sum("_partial").alias("count"))


def cap_buckets(
    banded: DataFrame, bucket_cols: list[str], max_size: int,
) -> DataFrame:
    """Keep only rows whose bucket has ≤ max_size members. Bounds the
    quadratic cost of bucket self-joins under adversarial/boilerplate
    buckets; membership is decided with one window count (no join)."""
    w = Window.partitionBy(*bucket_cols)
    return (
        banded.withColumn("_bsz", F.count("*").over(w))
        .where(F.col("_bsz") <= max_size)
        .drop("_bsz")
    )
