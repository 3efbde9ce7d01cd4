"""N-gram language-model quality scoring — the deterministic stand-in for
CCNet's KenLM perplexity filter (Wenzek et al., "CCNet: Extracting High
Quality Monolingual Datasets from Web Crawl Data", 2020 — public
literature). The reference repo has no counterpart (its quality signal is
the LLM itself); this is the filter a pretraining pipeline runs between
crawl dedup and mix construction, complementing textqa.quality_score's
surface heuristics with a corpus-statistical signal.

Model: add-alpha-smoothed bigram LM. For each in-document bigram
(w1, w2):  logp = ln((c(w1,w2) + alpha) / (c(w1) + alpha*V))
with counts from the training corpus (default: the scored corpus itself —
self-scoring, the CCNet configuration for "how typical is this document
of the crawl") and V = training vocabulary size. A document's score is
the mean negative log-probability (nll) over its bigram positions —
low = fluent/common phrasing, high = rare or garbled continuations.

Scale shape (100 TB):
- count tables are single map-side-combinable groupBys on token keys;
- smoothed log-probs are computed once per DISTINCT bigram (vocab²-bounded,
  zipf-truncated in practice) by joining bigram counts with unigram counts
  on w1 — the w1 key is zipf-skewed ("the") but this join is over distinct
  bigrams, not occurrences, so the hottest key carries at most
  |successors("the")| rows, and AQE skew-split applies to the residue;
- per-document scoring pre-aggregates occurrences to (doc, w1, w2, n)
  (well-spread keys) before joining the per-bigram log-prob table;
- V rides along as a 1-row crossJoin (broadcast), never a driver collect.

Cross-engine determinism: per-bigram log-probs are fixed-pointed to
micro-nats (round(lp*1e6) as bigint) before summation, so the per-doc
mean is an exact integer computation and the DuckDB oracle reproduces it
bit-for-bit regardless of float summation order.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.functions.text import tokenize


def _bigrams(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(doc_id, w1, w2) — one row per bigram position, docs with ≥ 2 tokens."""
    toks = df.select(
        F.col(id_col).alias("doc_id"), tokenize(F.col(text_col)).alias("_t")
    ).where(F.size("_t") >= 2)
    return toks.select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(_t) - 1), "
                "i -> struct(element_at(_t, i) AS w1, element_at(_t, i + 1) AS w2))"
            )
        ).alias("b"),
    ).select("doc_id", "b.w1", "b.w2")


def _count_tables(train: DataFrame, id_col: str, text_col: str):
    """Training-corpus count tables: uni (w, cw), vdf (1-row v), bcnt
    (w1, w2, cb) — each a single map-side-combinable groupBy."""
    toks = train.select(tokenize(F.col(text_col)).alias("_t"))
    uni = (
        toks.select(F.explode("_t").alias("w"))
        .groupBy("w")
        .agg(F.count("*").alias("cw"))
    )
    vdf = uni.agg(F.count("*").alias("v"))
    bcnt = _bigrams(train, id_col, text_col).groupBy("w1", "w2").agg(
        F.count("*").alias("cb")
    )
    return uni, vdf, bcnt


def _lp_micro(cb, cw, alpha: float):
    """The ONE smoothing formula, fixed-pointed to micro-nats; every LM
    path (self-trained, external-trained, unseen floor) routes through
    here so they cannot diverge. Expects a `v` column in scope."""
    return (
        F.round(
            F.log((cb + F.lit(alpha)) / (cw + F.lit(alpha) * F.col("v")))
            * F.lit(1e6)
        ).cast("long")
    )


def bigram_lm(train: DataFrame, id_col: str, text_col: str, alpha: float = 0.5):
    """Train the smoothed bigram LM: returns a per-distinct-bigram table
    (w1, w2, lp_micro) with lp fixed-pointed to micro-nats (bigint)."""
    uni, vdf, bcnt = _count_tables(train, id_col, text_col)
    return (
        bcnt.join(uni.withColumnRenamed("w", "w1"), "w1")
        .crossJoin(vdf)
        .select("w1", "w2",
                _lp_micro(F.col("cb"), F.col("cw"), alpha).alias("lp_micro"))
    )


def lm_nll_scores(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    alpha: float = 0.5,
    train: DataFrame | None = None,
) -> DataFrame:
    """Per-document mean bigram negative-log-prob under the (self- or
    externally-) trained LM. Returns (doc_id, n_bigrams, nll); docs with
    < 2 tokens are absent (no bigram positions to score).

    With an external `train` corpus, bigrams absent from it are scored at
    the unseen floor ln(alpha / (c(w1) + alpha*V)) — and w1 itself unseen
    falls to ln(1/V); both arise from the same coalesce-to-zero counts.
    """
    if train is None:
        lm = bigram_lm(df, id_col, text_col, alpha)
        occ = (
            _bigrams(df, id_col, text_col)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("n"))
            .join(lm, ["w1", "w2"])  # self-trained: every bigram is in the LM
        )
    else:
        uni, vdf, bcnt = _count_tables(train, id_col, text_col)
        occ = (
            _bigrams(df, id_col, text_col)
            .groupBy("doc_id", "w1", "w2")
            .agg(F.count("*").alias("n"))
        )
        # log-probs once per DISTINCT scored bigram (vocab²-bounded), not
        # per (doc, bigram) row — unseen counts coalesce to 0 so the
        # unseen-bigram and unseen-w1 floors fall out of the same formula
        lp = (
            occ.select("w1", "w2").distinct()
            .join(bcnt, ["w1", "w2"], "left")
            .join(uni.withColumnRenamed("w", "w1"), "w1", "left")
            .crossJoin(vdf)
            .select(
                "w1", "w2",
                _lp_micro(
                    F.coalesce("cb", F.lit(0)), F.coalesce("cw", F.lit(0)), alpha
                ).alias("lp_micro"),
            )
        )
        occ = occ.join(lp, ["w1", "w2"])
    return (
        occ.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.round(
                -F.sum(F.col("n") * F.col("lp_micro"))
                / (F.sum("n") * F.lit(1e6)),
                4,
            ).alias("nll"),
        )
    )
