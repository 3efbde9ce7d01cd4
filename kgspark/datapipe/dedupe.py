"""Document deduplication operators over a corpus DataFrame
(id, text[, group]) — the training-data counterpart of the entity-dedup
machinery (same MinHash/SimHash primitives, kgspark.functions.minhash).

- exact:        hash-groupBy canonical pick (one shuffle, map-side combinable)
- ngram_jaccard: exact word-n-gram Jaccard over candidate pairs
- minhash_lsh:  banded MinHash candidate generation + exact-Jaccard verify
                (scale path: shuffle is on band keys, never all-pairs)
- simhash:      64-bit fingerprint + hamming-distance band join
- embedding near-dup: cosine ≥ τ via sign-bucket LSH (datapipe.ann)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.functions.minhash import (
    hamming64,
    jaccard,
    lsh_pairs,
    simhash64,
    word_shingles,
)
from kgspark.functions.text import tokenize


def exact_dedup(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Canonical row per exact text duplicate class: (hash, n, canonical_id)."""
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(F.count("*").alias("n"), F.min(id_col).alias("canonical_id"))
    )


def exact_dedup_keep_first(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Rows surviving exact dedup (first id wins per duplicate class)."""
    w = Window.partitionBy(F.md5(F.col(text_col))).orderBy(id_col)
    return df.withColumn("_rn", F.row_number().over(w)).where("_rn = 1").drop("_rn")


def ngram_jaccard_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """All near-dup pairs by exact word-n-gram Jaccard ≥ threshold.
    EXACT all-pairs within the corpus — O(n²) compare, oracle-checkable;
    use minhash_lsh_pairs at scale."""
    sh = df.select(
        F.col(id_col).alias("_id"),
        word_shingles(tokenize(F.col(text_col)), n).alias("_sh"),
    )
    a, b = sh.alias("a"), sh.alias("b")
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .withColumn("jaccard", jaccard(F.col("a._sh"), F.col("b._sh")))
        .where(F.col("jaccard") >= threshold)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "jaccard")
    )


def minhash_lsh_pairs(
    df: DataFrame, id_col: str, text_col: str, n: int = 3,
    threshold: float = 0.5, num_hashes: int = 128, bands: int = 32,
    max_bucket_size: int = 5000,
) -> DataFrame:
    """Near-dup pairs via banded MinHash over word n-gram shingles,
    verified with exact Jaccard. At 10^12 docs the only shuffle is on
    band bucket keys; oversized buckets (boilerplate shingle sets) can be
    salted upstream. b=32/r=4 → P(catch j=0.5) ≈ 0.87, j=0.7 ≈ 0.999."""
    sh = df.select(
        F.col(id_col).alias("id"),
        word_shingles(tokenize(F.col(text_col)), n).alias("sh"),
    )
    return lsh_pairs(sh, "id", "sh", None, num_hashes, bands, threshold,
                     max_bucket_size).select("id_a", "id_b", "jaccard")


def simhash_pairs(
    df: DataFrame, id_col: str, text_col: str, max_hamming: int = 8,
    n_bands: int | None = None, portable: bool = False,
) -> DataFrame:
    """Near-dup pairs by SimHash hamming distance ≤ max_hamming.

    Candidate generation splits the fingerprint into ``n_bands``
    contiguous bit bands; two fingerprints within hamming h share at
    least one identical band whenever n_bands > h (pigeonhole), so the
    default ``n_bands = max_hamming + 1`` makes candidate recall exactly
    1.0 and the verified output EQUAL to all-pairs hamming ≤ h — which
    is what lets the DuckDB oracle check this operator without
    reproducing the banding.  Narrow bands mean bigger buckets
    (quadratic candidate cost), so at web scale prefer a small
    max_hamming (e.g. 3 → 4 bands of 15-16 bits, the classic Google
    near-dup setting) or pass an explicit smaller ``n_bands`` and accept
    w.h.p. rather than guaranteed recall.

    ``portable=True`` swaps the xxhash64-based 64-bit fingerprint for
    the md5-derived 60-bit one (functions/portable.simhash60) that any
    engine with md5() reproduces bit-for-bit — the driver oracle runs
    that mirror in DuckDB.
    """
    if portable:
        from kgspark.functions.portable import HASH_BITS, simhash60

        bits, fp_fn = HASH_BITS, simhash60
    else:
        bits, fp_fn = 64, simhash64
    b = n_bands if n_bands is not None else min(bits, max_hamming + 1)
    fp = df.select(
        F.col(id_col).alias("_id"),
        fp_fn(tokenize(F.col(text_col))).alias("_fp"),
    )
    bounds = [(i * bits // b, (i + 1) * bits // b) for i in range(b)]
    banded = fp.select(
        "_id", "_fp",
        F.explode(F.array(*[
            F.concat_ws("|", F.lit(i),
                        F.shiftrightunsigned(F.col("_fp"), lo)
                        .bitwiseAND(F.lit((1 << (hi - lo)) - 1))
                        .cast("string"))
            for i, (lo, hi) in enumerate(bounds)
        ])).alias("_band"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    return (
        a.join(b.hint("merge"),  # band self-join must shuffle, never broadcast
               (F.col("a._band") == F.col("b._band")) & (F.col("a._id") < F.col("b._id")))
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                F.col("a._fp").alias("fp_a"), F.col("b._fp").alias("fp_b"))
        .dropDuplicates(["id_a", "id_b"])
        .withColumn("hamming", hamming64(F.col("fp_a"), F.col("fp_b")))
        .where(F.col("hamming") <= max_hamming)
        .select("id_a", "id_b", "hamming")
    )


def embedding_neardup_pairs(
    df: DataFrame, id_col: str, emb_col: str, threshold: float = 0.9,
) -> DataFrame:
    """EXACT embedding-cosine near-dup pairs (cos ≥ threshold). All-pairs
    compare — oracle-checkable reference; use the LSH variant at scale."""
    from kgspark.datapipe.ann import cosine_sim

    e = df.select(F.col(id_col).alias("_id"),
                  F.col(emb_col).cast("array<double>").alias("_e"))
    a, b = e.alias("a"), e.alias("b")
    return (
        a.join(b, F.col("a._id") < F.col("b._id"))
        .withColumn("cos", F.round(cosine_sim(F.col("a._e"), F.col("b._e")), 4))
        .where(F.col("cos") >= threshold)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "cos")
    )


def embedding_neardup_pairs_lsh(
    df: DataFrame, id_col: str, emb_col: str, dim: int,
    threshold: float = 0.9, n_planes: int = 8, n_tables: int = 4,
) -> DataFrame:
    """Scale path: candidates share a random-hyperplane bucket in any of
    n_tables tables (shuffle on bucket keys only — never all-pairs),
    then exact-cosine verify. Recall for cos≥0.9 pairs with 8 planes ×
    4 tables ≈ 1-(1-0.76)^4 ≈ 0.997."""
    from kgspark.datapipe.ann import cosine_sim, hyperplane_keys

    e = df.select(F.col(id_col).alias("_id"),
                  F.col(emb_col).cast("array<double>").alias("_e"))
    cands = None
    for t in range(n_tables):
        k = e.withColumn("_bk", hyperplane_keys(F.col("_e"), dim, n_planes,
                                                seed=11 + t))
        a, b = k.alias("a"), k.alias("b")
        p = a.join(
            b.hint("merge"),  # bucket self-join: shuffle on bucket key
            (F.col("a._bk") == F.col("b._bk")) & (F.col("a._id") < F.col("b._id"))
        ).select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"),
                 F.col("a._e").alias("ea"), F.col("b._e").alias("eb"))
        cands = p if cands is None else cands.unionByName(p)
    return (
        cands.dropDuplicates(["id_a", "id_b"])
        .withColumn("cos", F.round(cosine_sim(F.col("ea"), F.col("eb")), 4))
        .where(F.col("cos") >= threshold)
        .select("id_a", "id_b", "cos")
    )


def substring_dup_spans(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", k: int = 8
) -> DataFrame:
    """Exact duplicated-substring spans — the distributed k-gram formulation
    of suffix-array substring dedup (Lee et al., "Deduplicating Training Data
    Makes Language Models Better", 2021; public literature). The reference has
    no counterpart (its dedup is entity-level, dedup_helpers.py); this is the
    document-level op a 100-TB pretraining pipeline runs before it.

    A k-token gram is *duplicated* when it occurs more than once in the corpus
    (any document, any position). Every non-canonical occurrence (canonical =
    global minimum (doc_id, pos)) marks tokens [pos, pos+k-1] for removal;
    overlapping or adjacent marks merge into maximal per-document spans, so
    a repeated passage of any length ≥ k collapses to one span.

    Scale shape: each gram is hashed to 64 bits in the projection — the gram
    string itself never shuffles; repeat detection is ONE exchange of the
    slim (doc_id, pos, hash) rows into hash-partitions where a single
    window pass computes (count, global-first occurrence) per gram — the
    gram/tokenize projection runs exactly once (a groupBy+join-back
    formulation recomputes it per consumer, measured ~2× the CPU at 600k
    docs); the span merge is a per-document window over only the marked
    rows. No all-pairs path. A mega-repeated boilerplate gram concentrates
    its occurrences in one hash partition (same rows any formulation must
    co-locate); the sort spills rather than OOMs. A 64-bit hash collision
    can mark a false span (~n²/2⁶⁵) — acceptable for dedup, noted here.

    Returns (doc_id, span_start, span_end, span_len): 1-based inclusive
    token indexes into tokenize(text).
    """
    k = int(k)
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= k)
    occ = toks.select(
        "doc_id",
        F.explode(
            F.expr(
                f"transform(sequence(1, size(_t) - {k} + 1), "
                f"i -> struct(i AS pos, "
                f"xxhash64(array_join(slice(_t, i, {k}), ' ')) AS h))"
            )
        ).alias("o"),
    ).select("doc_id", F.col("o.pos").cast("long").alias("pos"), "o.h")
    wh = Window.partitionBy("h")
    dup = (
        occ.select(
            "doc_id",
            "pos",
            F.count("*").over(wh).alias("n"),
            F.min(F.struct("doc_id", "pos")).over(wh).alias("first"),
        )
        .where(
            (F.col("n") > 1)
            & (
                (F.col("doc_id") != F.col("first.doc_id"))
                | (F.col("pos") != F.col("first.pos"))
            )
        )
        .select("doc_id", "pos", (F.col("pos") + F.lit(k - 1)).alias("e"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    prev_end = F.max("e").over(w.rowsBetween(Window.unboundedPreceding, -1))
    # first row of each doc: prev_end is NULL -> comparison NULL -> otherwise(1)
    marked = dup.withColumn(
        "brk", F.when(F.col("pos") <= prev_end + 1, F.lit(0)).otherwise(F.lit(1))
    ).withColumn("island", F.sum("brk").over(w))
    return (
        marked.groupBy("doc_id", "island")
        .agg(F.min("pos").alias("span_start"), F.max("e").alias("span_end"))
        .select(
            "doc_id",
            "span_start",
            "span_end",
            (F.col("span_end") - F.col("span_start") + 1).alias("span_len"),
        )
    )


def strip_dup_spans(
    df: DataFrame,
    spans: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Rebuild each document's text with its duplicated spans removed (the
    canonical copy survives elsewhere in the corpus by construction).

    One join (broadcast-eligible: spans aggregate to one row per affected
    doc); the kept text is assembled by slicing the GAPS between the
    sorted spans — O(n_tokens + n_spans) per document in a codegen array
    lambda (a per-token exists() over the span list would be
    O(n_tokens × n_spans), quadratic on exactly the boilerplate-heavy
    documents dedup targets). No Python, no extra shuffle. Reconstructed
    text is token-joined (tokenizer-lossy w.r.t. original
    punctuation/whitespace, like the reference fulltext normalization,
    search_utils.py:59-76).

    Returns (id_col, dedup_text, n_tokens_kept).
    """
    per_doc = spans.groupBy(F.col("doc_id").alias(id_col)).agg(
        F.collect_list(F.struct("span_start", "span_end")).alias("_spans")
    )
    # NULL text -> empty token array (legacy size(NULL) is -1; a NULL-text
    # doc must come out as ("", 0), not (NULL, -1) — the pack.py contract)
    toks = df.select(
        F.col(id_col),
        F.coalesce(tokenize(F.col(text_col)), F.array().cast("array<string>")).alias("_t"),
    )
    joined = toks.join(per_doc, id_col, "left").withColumn(
        "_sp", F.array_sort("_spans")  # struct order = (span_start, ...)
    )
    # The gap-slice below requires sorted spans to be pairwise DISJOINT
    # (true for substring_dup_spans output — merged maximal spans); a
    # span nested inside an earlier, longer one would otherwise restart
    # the gap at the inner span's end and leak covered tokens back into
    # dedup_text. Guard the public signature: an O(n_spans) adjacent-pair
    # check keeps the hot path linear, and only offending rows pay the
    # O(n_spans²) fold that merges overlaps (running max of span_end).
    disjoint = F.expr(
        "forall(zip_with(slice(_sp, 1, greatest(size(_sp) - 1, 0)), "
        "slice(_sp, 2, greatest(size(_sp) - 1, 0)), "
        "(a, b) -> b.span_start > a.span_end), x -> x)"
    )
    merged = F.expr(
        "aggregate(slice(_sp, 2, greatest(size(_sp) - 1, 0)), slice(_sp, 1, 1), "
        "(acc, s) -> CASE WHEN s.span_start > element_at(acc, -1).span_end "
        "THEN concat(acc, array(s)) "
        "ELSE concat(slice(acc, 1, size(acc) - 1), array(named_struct("
        "'span_start', element_at(acc, -1).span_start, "
        "'span_end', greatest(element_at(acc, -1).span_end, s.span_end)))) END)"
    )
    joined = joined.withColumn("_sp", F.when(disjoint, F.col("_sp")).otherwise(merged))
    # gap i spans (prev_end+1 .. next_start-1); gaps 0 and n are the
    # prefix before the first span and the suffix after the last
    gaps = F.expr(
        "flatten(transform(sequence(0, size(_sp)), i -> slice(_t, "
        " CASE WHEN i = 0 THEN 1 ELSE element_at(_sp, i).span_end + 1 END, "
        " greatest((CASE WHEN i = size(_sp) THEN size(_t) "
        "           ELSE element_at(_sp, i + 1).span_start - 1 END) "
        "          - (CASE WHEN i = 0 THEN 1 "
        "             ELSE element_at(_sp, i).span_end + 1 END) + 1, 0))))"
    )
    kept = F.when(F.col("_spans").isNull(), F.col("_t")).otherwise(gaps)
    return joined.select(
        id_col,
        F.array_join(kept, " ").alias("dedup_text"),
        F.size(kept).cast("long").alias("n_tokens_kept"),
    )


def dedup_keep_canonical(df: DataFrame, id_col: str, pairs: DataFrame) -> DataFrame:
    """Drop every row that near-dups an earlier (smaller-id) row:
    survivors = rows never appearing as id_b in the pair list (after
    component closure via connected_components for chains)."""
    from kgspark.operators.dedup import connected_components

    comp = connected_components(pairs)
    canon = comp.groupBy("comp").agg(F.min("id").alias("keep"))
    drop = comp.join(canon, "comp").where(F.col("id") != F.col("keep")).select("id")
    return df.join(drop.withColumnRenamed("id", id_col), id_col, "left_anti")
