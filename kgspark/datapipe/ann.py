"""Approximate-nearest-neighbor search over an embedding column.

- brute_force_topk: exact cosine top-k (baseline; scan-parallel,
  TakeOrderedAndProject — no UDF)
- sign_lsh_buckets / lsh_topk: random-hyperplane (SimHash-style) LSH —
  the scale path: probe joins on bucket keys only, never a full scan
- knn_join: per-row top-k neighbors between two tables via bucket join
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from kgspark.functions.embed import cosine


def _norm(c: Column) -> Column:
    return F.sqrt(F.aggregate(c, F.lit(0.0), lambda a, x: a + x * x))


def cosine_sim(a: Column, b: Column) -> Column:
    return cosine(a, b) / (_norm(a) * _norm(b))


def brute_force_topk(
    df: DataFrame, id_col: str, emb_col: str, query_vec: list[float], k: int = 10,
) -> DataFrame:
    q = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        df.select(
            F.col(id_col),
            F.round(cosine_sim(F.col(emb_col).cast("array<double>"), q), 4).alias("cos"),
        )
        .orderBy(F.desc("cos"), id_col)
        .limit(k)
    )


def hyperplane_keys(
    emb: Column, dim: int, n_planes: int = 16, seed: int = 7,
    portable: bool = False,
) -> Column:
    """Deterministic random-hyperplane signature: plane p has pseudo-random
    ±1 weights per dimension derived from xxhash64(p, d, seed); the key is
    the sign-bit string. Pure SQL expressions — no UDF, no model fit.

    ``portable=True`` derives the weights from md5 parity instead
    (functions/portable.md5_parity of "p|d|seed"), which any engine with
    md5() reproduces — the driver oracle mirrors the whole LSH bucket
    assignment in DuckDB SQL.  Same asymptotics, ~3x hash cost."""
    planes = F.sequence(F.lit(0), F.lit(n_planes - 1))

    def weight(p, d):
        if portable:
            from kgspark.functions.portable import md5_parity

            bit = md5_parity(
                F.concat(p.cast("string"), F.lit("|"), d.cast("string"),
                         F.lit("|"), F.lit(str(seed))))
            return F.when(bit == 0, F.lit(1.0)).otherwise(F.lit(-1.0))
        return F.when(
            F.xxhash64(p.cast("string"), d.cast("string"), F.lit(seed)) % 2 == 0,
            F.lit(1.0),
        ).otherwise(F.lit(-1.0))

    def dot_sign(p):
        prods = F.zip_with(
            emb,
            F.sequence(F.lit(0), F.lit(dim - 1)),
            lambda x, d: x * weight(p, d),
        )
        s = F.aggregate(prods, F.lit(0.0), lambda a, x: a + x)
        return F.when(s >= 0, F.lit("1")).otherwise(F.lit("0"))
    return F.concat_ws("", F.transform(planes, dot_sign))


def lsh_topk(
    df: DataFrame, id_col: str, emb_col: str, query_vec: list[float],
    dim: int, k: int = 10, n_planes: int = 12, n_tables: int = 4,
) -> DataFrame:
    """ANN top-k: candidates = rows sharing any of n_tables hyperplane
    buckets with the query, re-scored exactly. Probe cost is
    O(candidates), not O(corpus)."""
    spark = df.sparkSession
    cands = None
    for t in range(n_tables):
        keys = hyperplane_keys(F.col(emb_col).cast("array<double>"), dim,
                               n_planes, seed=7 + t)
        qrow = spark.range(1).select(
            hyperplane_keys(
                F.array(*[F.lit(float(x)) for x in query_vec]), dim, n_planes,
                seed=7 + t,
            ).alias("qkey")
        )
        qkey = qrow.collect()[0]["qkey"]
        hits = df.where(keys == qkey)
        cands = hits if cands is None else cands.unionByName(hits)
    cands = cands.dropDuplicates([id_col])
    return brute_force_topk(cands, id_col, emb_col, query_vec, k)


def ivf_assign(emb: Column, centroids: list[list[float]]) -> Column:
    """Nearest-centroid id for an embedding (argmax cosine against the
    broadcast centroid list — a pure SQL expression, no UDF)."""
    scored = [
        F.struct(
            cosine_sim(emb, F.array(*[F.lit(float(x)) for x in c])).alias("cos"),
            F.lit(i).alias("cid"),
        )
        for i, c in enumerate(centroids)
    ]
    return F.array_max(F.array(*scored)).getField("cid")


def ivf_centroids(
    df: DataFrame, id_col: str, emb_col: str, n_centroids: int = 16,
) -> list[list[float]]:
    """Deterministic pivot centroids: the n rows with the smallest
    xxhash64(id) — the k-means init (and a cheap stand-in quantizer);
    ``kmeans_centroids`` refines them with distributed Lloyd
    iterations."""
    rows = (
        df.select(F.col(emb_col).cast("array<double>").alias("e"),
                  F.xxhash64(F.col(id_col).cast("string")).alias("h"))
        .orderBy("h")
        .limit(n_centroids)
        .collect()
    )
    return [list(r["e"]) for r in rows]


def kmeans_centroids(
    df: DataFrame, id_col: str, emb_col: str, dim: int,
    n_centroids: int = 16, n_iters: int = 5,
    sample_mod: int | None = None,
) -> list[list[float]]:
    """Distributed Lloyd's k-means for the IVF coarse quantizer
    (cosine-assignment flavour — the centroid update is the plain mean,
    assignment is nearest-by-cosine, matching ``ivf_assign``).

    Fully deterministic: init = the hash-pivot seeds (``ivf_centroids``),
    and every iteration is
      assign:  one broadcast-literal SQL expression per row (no UDF)
      update:  one ``groupBy(_cid)`` of per-dimension means
    The update's shuffle is k×dim partial sums per input partition
    (map-side combine), so an iteration costs one corpus scan regardless
    of corpus size; at 10^10-row scale fit on a hash sample instead —
    ``sample_mod=m`` keeps rows with xxhash64(id) % m == 0 (a 1/m
    deterministic, resume-safe sample; a 0.1% sample of a web corpus
    still gives millions of points per centroid). Empty clusters keep
    their previous centroid."""
    fit = df.select(F.col(id_col).alias("_id"),
                    F.col(emb_col).cast("array<double>").alias("e"))
    if sample_mod is not None and sample_mod > 1:
        fit = fit.where(
            F.pmod(F.xxhash64(F.col("_id").cast("string")),
                   F.lit(sample_mod)) == 0)
    fit = fit.persist()
    try:
        cents = ivf_centroids(fit, "_id", "e", n_centroids)
        for _ in range(n_iters):
            assigned = fit.withColumn("_cid", ivf_assign(F.col("e"), cents))
            rows = assigned.groupBy("_cid").agg(
                *[F.avg(F.col("e").getItem(i)).alias(f"c{i}")
                  for i in range(dim)]
            ).collect()
            cents = list(cents)
            for r in rows:
                cents[r["_cid"]] = [float(r[f"c{i}"]) for i in range(dim)]
    finally:
        fit.unpersist()
    return cents


def ivf_topk(
    df: DataFrame, id_col: str, emb_col: str, query_vec: list[float],
    n_centroids: int = 16, n_probe: int = 4, k: int = 10,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF-flavoured ANN: partition the corpus by nearest centroid, probe
    only the n_probe centroids closest to the query, rescore exactly.
    Scan cost ≈ corpus * n_probe / n_centroids; the assignment column is
    precomputable/persistable so repeated probes touch only their cells
    (at scale: partition the table by cid for partition pruning)."""
    import math

    cents = centroids if centroids is not None else ivf_centroids(
        df, id_col, emb_col, n_centroids)

    def _cos(c):
        num = sum(a * b for a, b in zip(c, query_vec))
        den = math.sqrt(sum(a * a for a in c)) * math.sqrt(
            sum(b * b for b in query_vec)) or 1.0
        return num / den

    probe = sorted(range(len(cents)), key=lambda i: (-_cos(cents[i]), i))[:n_probe]
    assigned = df.withColumn(
        "_cid", ivf_assign(F.col(emb_col).cast("array<double>"), cents)
    )
    cell = assigned.where(F.col("_cid").isin(probe))
    return brute_force_topk(cell, id_col, emb_col, query_vec, k)


def ivf_write_index(
    df: DataFrame, id_col: str, emb_col: str, path: str,
    n_centroids: int = 16, centroids: list[list[float]] | None = None,
) -> list[list[float]]:
    """Materialize the IVF index: precompute the assignment column and
    write the table hive-partitioned by ``cid`` (at cluster scale: the
    Iceberg partition transform). A probe then reads ONLY its n_probe
    ``cid=`` directories — the scan is partition-pruned by the storage
    layout, not just row-filtered (`PartitionFilters: [cid IN (...)]` in
    the probe plan; physically verified in test_datapipe by corrupting a
    non-probed partition's files and probing successfully). Returns the
    centroid list (persist it next to the index; probes need it)."""
    cents = centroids if centroids is not None else ivf_centroids(
        df, id_col, emb_col, n_centroids)
    assigned = df.withColumn(
        "cid", ivf_assign(F.col(emb_col).cast("array<double>"), cents))
    (assigned.write.mode("overwrite").option("compression", "zstd")
     .partitionBy("cid").parquet(path))
    return cents


def ivf_probe_index(
    spark, path: str, id_col: str, emb_col: str, query_vec: list[float],
    centroids: list[list[float]], n_probe: int = 4, k: int = 10,
    schema=None,
) -> DataFrame:
    """Probe a materialized IVF index (``ivf_write_index``): rank the
    stored centroids against the query on the driver (k × dim floats —
    tiny), then scan only the n_probe nearest cells. The cid IN-filter
    is a partition filter on the hive layout, so unprobed cells'
    files are never opened."""
    import math

    def _cos(c):
        num = sum(a * b for a, b in zip(c, query_vec))
        den = math.sqrt(sum(a * a for a in c)) * math.sqrt(
            sum(b * b for b in query_vec)) or 1.0
        return num / den

    probe = sorted(range(len(centroids)),
                   key=lambda i: (-_cos(centroids[i]), i))[:n_probe]
    # explicit schema (from the table catalog at cluster scale) skips
    # footer-based inference, so NO file outside the probed cells is
    # ever opened — not even for schema discovery
    reader = spark.read.schema(schema) if schema is not None else spark.read
    cell = reader.parquet(path).where(F.col("cid").isin(probe))
    return brute_force_topk(cell, id_col, emb_col, query_vec, k)


def knn_join(
    left: DataFrame, right: DataFrame, left_id: str, right_id: str,
    emb_col: str, dim: int, k: int = 5, n_planes: int = 8,
    n_tables: int = 1, portable: bool = False,
) -> DataFrame:
    """Per-left-row approximate k-NN from `right` via shared hyperplane
    bucket equi-join + exact rescoring + windowed top-k. One shuffle on
    bucket keys; bucket sizes bounded by n_planes choice (2^n buckets).

    ``n_tables`` is the standard LSH recall knob: each table hashes with
    independently-seeded planes and a row's candidates are the UNION of
    its buckets across tables (dedup before rescoring), so recall rises
    with tables at linearly growing probe cost — tune (n_planes,
    n_tables) to the corpus' neighbor-distance distribution. The bucket
    keys are table-tagged, so one equi-join covers all tables."""
    def keys_col(tagged_emb):
        e = tagged_emb.cast("array<double>")
        return F.array(*[
            F.concat(F.lit(f"{t}|"),
                     hyperplane_keys(e, dim, n_planes, seed=7 + t,
                                     portable=portable))
            for t in range(n_tables)
        ])

    lk = left.select(
        F.col(left_id).alias("lid"), F.col(emb_col).alias("lemb"),
        F.explode(keys_col(F.col(emb_col))).alias("bkey"),
    )
    rk = right.select(
        F.col(right_id).alias("rid"), F.col(emb_col).alias("remb"),
        F.explode(keys_col(F.col(emb_col))).alias("bkey"),
    )
    joined = (
        lk.join(rk.hint("merge"), "bkey")
        .where(F.col("lid") != F.col("rid"))
        .dropDuplicates(["lid", "rid"])
    )
    scored = joined.withColumn(
        "cos", cosine_sim(F.col("lemb").cast("array<double>"),
                          F.col("remb").cast("array<double>"))
    )
    w = Window.partitionBy("lid").orderBy(F.desc("cos"), "rid")
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= k)
        .select("lid", "rid", F.round("cos", 4).alias("cos"), F.col("_rn").alias("rank"))
    )
