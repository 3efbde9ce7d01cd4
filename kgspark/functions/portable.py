"""Cross-engine portable hash primitives (Spark <-> any engine with md5).

The engine's hot paths hash with ``xxhash64`` — JVM whole-stage-codegen,
the fastest option — but no other SQL engine reproduces Spark's xxhash64
bit-for-bit, which leaves xxhash64-derived operators (SimHash, rolling
fingerprints, hyperplane-LSH plane signs) without an independent oracle.
These variants derive a 60-bit hash from the standard ``md5()`` hex
digest instead: ``conv(substr(md5(x), 1, 15), 16, 10)`` — 15 hex chars =
60 bits, always below 2^63 so it fits a signed BIGINT in every engine,
and md5 of the same UTF-8 string is identical everywhere.  The DuckDB
mirror is ``('0x' || substr(md5(x), 1, 15))::UBIGINT`` (verified
value-identical, including on non-ASCII input).

Cost is ~3-5x xxhash64 per call (still JVM-side, no Python), so use
these when cross-engine verifiability matters more than raw speed:
driver correctness queries, cross-system dedup handoffs, audits.  The
xxhash64 twins (functions/minhash.py, datapipe/textqa.py) stay the
default for the 100 TB hot path.

Reference provenance: the reference has no cross-engine story at all
(one Neo4j/FalkorDB store is both engine and truth); this module exists
because our correctness gate (DuckDB oracle parity) demands a hash both
engines can compute.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

HASH_BITS = 60  # 15 hex chars of the md5 digest


def md5hash60(c: Column) -> Column:
    """Portable 60-bit hash of a string column (identical in DuckDB)."""
    return F.conv(F.substring(F.md5(c), 1, 15), 16, 10).cast("long")


def md5_parity(c: Column) -> Column:
    """Portable pseudo-random bit (0/1) of a string column: parity of the
    last hex nibble of md5 — DuckDB: ``('0x'||substr(md5(x),32,1))::INT % 2``."""
    return (F.conv(F.substring(F.md5(c), 32, 1), 16, 10).cast("int") % 2)


def simhash60(tokens: Column) -> Column:
    """Portable 60-bit SimHash of a token array: per-bit majority vote of
    md5hash60 token hashes (duplicates vote once each, matching the
    weighted-by-count semantics of functions/minhash.simhash64).

    Bit j of the result is independent of every other bit, so the DuckDB
    mirror can iterate bits in any order:
      fp = sum_j CASE WHEN sum_tokens(±1 by bit j of hash) > 0
                 THEN 1<<j ELSE 0 END
    """
    hash_bits = F.transform(
        tokens, lambda t: F.lpad(F.bin(md5hash60(t)), HASH_BITS, "0")
    )
    votes = F.transform(
        F.sequence(F.lit(1), F.lit(HASH_BITS)),
        lambda i: F.aggregate(
            hash_bits,
            F.lit(0),
            lambda acc, s: acc
            + F.when(F.substring(s, i, F.lit(1)) == "1", 1).otherwise(-1),
        ),
    )
    bits = F.concat_ws(
        "",
        F.transform(votes, lambda v: F.when(v > 0, F.lit("1")).otherwise(F.lit("0"))),
    )
    # 60 bits < 2^63: a single conv fits a signed long (the 64-bit twin
    # must split halves; we don't).
    return F.conv(bits, 2, 10).cast("long")


def fingerprint60(text: Column, n: int = 4) -> Column:
    """Portable order-sensitive document fingerprint: md5hash60 chained
    left-to-right over word n-gram hashes (rolling-hash analogue of
    datapipe/textqa.fingerprint64, with a cross-engine hash).

    DuckDB mirror: ``list_reduce(list_prepend(0, gram_hashes),
    (acc, h) -> md5hash60(acc || '|' || h))`` — the explicit '|'
    separator makes the chain injective over (acc, h) renderings.
    """
    from kgspark.functions.minhash import word_shingles
    from kgspark.functions.text import tokenize

    grams = word_shingles(tokenize(text), n)
    return F.aggregate(
        F.transform(grams, md5hash60),
        F.lit(0).cast("long"),
        lambda acc, h: md5hash60(
            F.concat(acc.cast("string"), F.lit("|"), h.cast("string"))
        ),
    )
