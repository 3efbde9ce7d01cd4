"""MinHash + LSH banding + SimHash as native Spark SQL expressions.

No Python in the hot path: shingling = `sequence`+`transform`+`substring`,
hashing = `xxhash64` with per-permutation seeds, min-reduction =
`array_min`, banding = `concat_ws` slices. All whole-stage-codegen'd.

Used by:
- D2 entity-name dedup (SURVEY §2.3; replaces the reference's LLM
  compress_nodes, bulk_utils.py:291-362)
- datapipe document near-dup (MinHash-LSH / SimHash over `documents`)

LSH recall math: P(collide) = 1 - (1 - j^r)^b for Jaccard j with b bands
of r rows; defaults b=16, r=8 (128 perms) → j=0.7 collides w.p. ~0.61,
j=0.9 ~1.0 — tuned for near-dup thresholds ≥0.8.
"""

from __future__ import annotations

import pandas as pd

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def char_shingles(text: Column, n: int = 3) -> Column:
    """Distinct character n-grams of a string (padded for short strings)."""
    padded = F.concat(F.lit(" "), text, F.lit(" "))
    idx = F.sequence(F.lit(1), F.greatest(F.length(padded) - (n - 1), F.lit(1)))
    return F.array_distinct(F.transform(idx, lambda i: F.substring(padded, i, n)))


def word_shingles(tokens: Column, n: int = 3) -> Column:
    """Distinct word n-grams from a token array column."""
    m = F.size(tokens)
    idx = F.sequence(F.lit(0), F.greatest(m - n, F.lit(0)))
    return F.when(m >= n, F.array_distinct(
        F.transform(idx, lambda i: F.concat_ws(" ", F.slice(tokens, i + 1, n)))
    )).otherwise(F.array(F.concat_ws(" ", tokens)))


def minhash_signature(shingles: Column, num_hashes: int = 128) -> Column:
    """ARRAY<BIGINT> of num_hashes min-hash values: for permutation k,
    min over shingles of xxhash64(shingle, k)."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda k: F.array_min(F.transform(shingles, lambda s: F.xxhash64(s, k))),
    )


def lsh_band_keys(signature: Column, bands: int = 16, rows: int = 8) -> Column:
    """ARRAY<STRING> of band bucket keys: band index + hash of its row slice."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.concat_ws(
            "|", b.cast("string"),
            F.xxhash64(F.concat_ws(",", F.transform(
                F.slice(signature, b * rows + 1, rows), lambda x: x.cast("string")
            ))).cast("string"),
        ),
    )


def shingle_hashes(shingles: Column) -> Column:
    """ARRAY<BIGINT>: one xxhash64 per shingle — the only string hashing
    pass (everything downstream is integer arithmetic)."""
    return F.transform(shingles, lambda s: F.xxhash64(s))


def band_keys_udf(num_hashes: int = 128, bands: int = 16, seed: int = 1337):
    """Arrow-vectorized MinHash banding: ARRAY<BIGINT> shingle hashes →
    ARRAY<BIGINT> band bucket keys.

    Signature k = min over shingles of (A_k * h + B_k) (uint64 wrap,
    universal-hash family, seeded); band key = FNV-fold of its row slice
    with the band index packed into the high byte (cross-band collisions
    impossible). numpy-vectorized per row (num_hashes × |shingles| ops),
    ~50-100× the interpreted nested-HOF expression this replaced."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    rows = num_hashes // bands
    rng = np.random.RandomState(seed)
    A = (rng.randint(0, 2**63, size=num_hashes, dtype=np.uint64) << np.uint64(1)) | np.uint64(1)
    B = rng.randint(0, 2**63, size=num_hashes, dtype=np.uint64)
    FNV = np.uint64(1099511628211)
    band_tag = (np.arange(bands, dtype=np.uint64) << np.uint64(56))

    @pandas_udf("array<long>")
    def _keys(hashes: pd.Series) -> pd.Series:
        out = []
        err = np.seterr(over="ignore")
        for h in hashes:
            if h is None or len(h) == 0:
                out.append(band_tag.view(np.int64).tolist())
                continue
            hv = np.asarray(h, dtype=np.int64).view(np.uint64)
            sig = (A[:, None] * hv[None, :] + B[:, None]).min(axis=1)
            sl = sig.reshape(bands, rows)
            k = np.full(bands, np.uint64(14695981039346656037))
            for r in range(rows):
                k = (k * FNV) ^ sl[:, r]
            out.append(((k >> np.uint64(8)) ^ band_tag).view(np.int64).tolist())
        np.seterr(**err)
        return pd.Series(out)

    return _keys


def jaccard(a: Column, b: Column) -> Column:
    inter = F.size(F.array_intersect(a, b))
    return inter / (F.size(a) + F.size(b) - inter)


def simhash64(tokens: Column) -> Column:
    """64-bit SimHash of a token array: per-bit majority vote of token
    hashes. Token hashes are rendered as 64-bit binary strings (two's
    complement via `bin`), votes aggregated per position, and the result
    reassembled from two 32-bit halves (`conv` base-2 → long)."""
    hash_bits = F.transform(tokens, lambda t: F.lpad(F.bin(F.xxhash64(t)), 64, "0"))
    votes = F.transform(
        F.sequence(F.lit(1), F.lit(64)),
        lambda i: F.aggregate(
            hash_bits,
            F.lit(0),
            lambda acc, s: acc + F.when(F.substring(s, i, F.lit(1)) == "1", 1).otherwise(-1),
        ),
    )
    bits = F.concat_ws(
        "", F.transform(votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0")))
    )
    hi = F.conv(F.substring(bits, 1, 32), 2, 10).cast("long")
    lo = F.conv(F.substring(bits, 33, 32), 2, 10).cast("long")
    return F.shiftleft(hi, 32).bitwiseOR(lo)


def hamming64(a: Column, b: Column) -> Column:
    return F.bit_count(a.bitwiseXOR(b))


def lsh_pairs(
    df: DataFrame,
    id_col: str,
    shingle_col: str,
    group_col: str | None = None,
    num_hashes: int = 128,
    bands: int = 16,
    jaccard_threshold: float = 0.6,
    max_bucket_size: int = 5000,
) -> DataFrame:
    """Candidate near-dup pairs (id_a < id_b, jaccard) via banded MinHash
    LSH: signature → explode band keys → self-join per bucket → exact
    Jaccard verify. Shuffle is on band keys; hot buckets (boilerplate
    shingle sets — the web-scale skew case) are capped at
    ``max_bucket_size`` before the quadratic self-join (skew.cap_buckets);
    true near-dups in a capped bucket still collide in other bands.

    Shuffle-volume discipline (the measured memory-bandwidth fix): the
    band self-join moves ONLY slim (id, grp, band) rows — never the
    shingle payload. Carrying shingles through the banded explode
    multiplies them ×bands×2 sides (measured ~15 GB shuffled at 600k
    docs vs ~0.4 GB slim), which was the dominant task-time inflation
    under multi-core memory contention. Shingles are hashed to BIGINT
    once up front (exact-equivalent Jaccard: xxhash64 is 1:1 per
    element, so intersections/sizes are preserved modulo 2^-64
    collisions) and re-attached only to the surviving candidate pairs
    — a frame that is O(near-dups), not O(corpus×bands)."""
    from kgspark.functions.skew import cap_buckets

    keys = band_keys_udf(num_hashes, bands)
    base = df.select(
        F.col(id_col).alias("_id"),
        *( [F.col(group_col).alias("_grp")] if group_col else [F.lit("").alias("_grp")] ),
        shingle_hashes(F.col(shingle_col)).alias("_shh"),
    )
    # both persists released below — lsh_pairs runs on every incremental/
    # streaming micro-batch, and a leaked persist per batch accumulates
    # in the CacheManager for the life of the stream.
    base = base.persist()
    sig = base.select(
        "_id", "_grp", F.explode(keys(F.col("_shh"))).alias("_band"))
    if max_bucket_size:
        sig = cap_buckets(sig, ["_grp", "_band"], max_bucket_size)
    sig = sig.persist()
    a = sig.alias("a")
    # merge hint: the banded table is mid-size and Catalyst's cached-plan
    # size estimate can sneak under the broadcast threshold — broadcasting
    # millions of banded rows stalls the driver (measured 9× slowdown at
    # local[32]); a bucket self-join must shuffle on the band key.
    b = sig.alias("b").hint("merge")
    cand = (
        a.join(b, on=[F.col("a._band") == F.col("b._band"),
                      F.col("a._grp") == F.col("b._grp"),
                      F.col("a._id") < F.col("b._id")])
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.col("a._grp").alias("group"),
        )
        .dropDuplicates(["id_a", "id_b"])
    )
    # Data-sized explicit repartition (AQE-exempt): AQE coalesces the
    # deduped candidate list by BYTES, which serializes the verify stage
    # — the array_intersect Jaccard + two hash joins below are CPU-bound
    # per row (measured: an 18s single-task verify at 20k docs on a
    # 32-core box). Round-robin of slim (id,id,grp) rows is trivial to
    # shuffle at any scale.
    n_verify_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
    cand = cand.repartition(n_verify_parts)
    # verify: re-attach hashed shingles per side, keyed on (id, group) —
    # ids are only contracted unique WITHIN a group, so an id-only join
    # would cross-match another group's shingle set. No hint — when the
    # candidate set is small AQE broadcasts IT, so the corpus-side frame
    # is read straight from cache without a shuffle.
    ha = base.select(F.col("_id").alias("id_a"), F.col("_grp").alias("group"),
                     F.col("_shh").alias("_sh_a"))
    hb = base.select(F.col("_id").alias("id_b"), F.col("_grp").alias("group"),
                     F.col("_shh").alias("_sh_b"))
    pairs = (
        cand.join(ha, ["id_a", "group"])
        .join(hb, ["id_b", "group"])
        .withColumn("jaccard", jaccard(F.col("_sh_a"), F.col("_sh_b")))
        .where(F.col("jaccard") >= jaccard_threshold)
        .select("id_a", "id_b", "group", "jaccard")
    )
    # eager materialization (pairs are small — post-verify near-dups), so
    # the banded + hashed tables can be released before returning
    df.sparkSession.sparkContext.setJobDescription("lsh_pairs: band join + verify")
    pairs = pairs.localCheckpoint(eager=True)
    df.sparkSession.sparkContext.setJobDescription(None)
    sig.unpersist()
    base.unpersist()
    return pairs
