"""Deterministic training-mix construction: hash-based stratified
sampling with fractional up/down-weighting.

Mix construction (the Pile / Llama / Dolma training cards — public)
re-weights corpus strata: keep 25% of raw crawl, 100% of books, repeat
curated wiki 2.3×. Doing that with ``rand()`` breaks reproducibility
(task retries on a real cluster resample different rows) and breaks
lineage (can't answer "was doc X in the mix?"). The standard fix,
implemented here: derive a uniform u ∈ [0, 1) from a portable hash of
(salt, doc id) — retry-stable, replayable in any engine, and ``salt``
switches to an independent sample for held-out splits.

Weight semantics: weight w emits ``floor(w)`` full copies plus one more
iff u < frac(w) — so w = 2.3 repeats every doc twice and a
deterministic 30% of docs a third time (epoch-weighted upsampling),
w = 0.25 keeps a 25% subsample, copies numbered 0..n-1 for downstream
shard interleaving.

Scale shape: one CASE lookup (strata maps are tiny) + one md5 + one
filter + one ``explode(sequence)`` — all codegen, zero shuffle, zero
Python; at 100 TB this is a pure map over the scan with the weight
predicate evaluated before any wide column is touched.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from kgspark.functions.portable import md5hash60

RESOLUTION = 1_000_000  # weight granularity: 1e-6


def _u_micro(id_col: Column, salt: str) -> Column:
    """Uniform integer in [0, RESOLUTION) from the portable 60-bit md5
    of 'salt:id' — identical in DuckDB (functions/portable.py)."""
    return md5hash60(F.concat(F.lit(f"{salt}:"), id_col.cast("string"))) % RESOLUTION


def stratified_sample(
    docs: DataFrame,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
    salt: str = "mix-v1",
) -> DataFrame:
    """→ input rows × ``copy`` (long, 0-based), re-weighted per stratum.

    Strata absent from ``weights`` get ``default_weight``. Weights are
    quantized to 1e-6 (RESOLUTION); negative weights are invalid.
    """
    if any(w < 0 for w in weights.values()) or default_weight < 0:
        raise ValueError("weights must be >= 0")
    clash = {"_n", "copy"} & set(docs.columns)
    if clash:
        raise ValueError(
            f"input already has column(s) {sorted(clash)} — `copy` is the "
            "reserved output column (and `_n` a working column); rename "
            "them before sampling rather than having them silently "
            "overwritten")
    w_micro = F.lit(int(round(default_weight * RESOLUTION)))
    for k in sorted(weights):  # deterministic CASE order
        w_micro = F.when(F.col(strata_col) == k,
                         int(round(weights[k] * RESOLUTION))).otherwise(w_micro)
    # NULL ids can't hash: they keep their floor(w) copies but never win
    # the fractional extra — the same NULL-comparison outcome the SQL
    # oracle's CASE produces, so parity holds row-for-row
    extra = F.coalesce(
        (_u_micro(F.col(id_col), salt) < w_micro % RESOLUTION).cast("long"),
        F.lit(0),
    )
    n_copies = (w_micro / RESOLUTION).cast("long") + extra
    return (
        docs.withColumn("_n", n_copies)
        .where(F.col("_n") > 0)
        .withColumn("copy", F.explode(F.sequence(F.lit(0), F.col("_n") - 1)))
        .drop("_n")
        .withColumn("copy", F.col("copy").cast("long"))
    )


def stratified_sample_oracle_sql(
    docs_sql: str,
    weights: dict[str, float],
    strata_col: str = "lang",
    id_col: str = "doc_id",
    default_weight: float = 0.0,
    salt: str = "mix-v1",
    select_cols: str = "doc_id, lang",
) -> str:
    """DuckDB replay: same md5-60bit uniform, same CASE, same
    floor+fractional copy rule (generate_series instead of explode)."""
    default_micro = int(round(default_weight * RESOLUTION))

    def q(s: str) -> str:  # SQL string literal: double embedded quotes
        return s.replace("'", "''")

    if weights:
        case = " ".join(
            f"WHEN {strata_col} = '{q(k)}' THEN {int(round(weights[k] * RESOLUTION))}"
            for k in sorted(weights)
        )
        w_expr = f"CASE {case} ELSE {default_micro} END"
    else:
        w_expr = str(default_micro)
    return f"""
        WITH w AS (
          SELECT *,
                 {w_expr} AS w_micro,
                 CAST(('0x' || substr(md5('{q(salt)}:' || CAST({id_col} AS VARCHAR)), 1, 15))::BIGINT
                      % {RESOLUTION} AS BIGINT) AS u
          FROM ({docs_sql})
        ), n AS (
          SELECT *, w_micro // {RESOLUTION}
                    + CASE WHEN u < w_micro % {RESOLUTION} THEN 1 ELSE 0 END AS n_copies
          FROM w
        )
        SELECT {select_cols}, CAST(gs.copy AS BIGINT) AS copy
        FROM n, LATERAL (SELECT UNNEST(generate_series(0, n_copies - 1)) AS copy) gs
        WHERE n_copies > 0
    """
