"""Q7-Q11 rerankers (SURVEY §2.5).

Input convention: each candidate list is a DataFrame (uuid, score) whose
*row order* defines ranks within its method (the reference reranks over
Python lists); we materialize rank with row_number over the method's
own ordering, then fuse.
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_MMR_LAMBDA = 0.5  # reference search_utils.py:54


def rrf(ranked_lists: list[DataFrame], min_score: float = 0.0) -> DataFrame:
    """Q7 (search_utils.py:887-898): score[uuid] = Σ 1/(rank+1) over
    lists (rank is 0-based position), sort desc, min_score cut."""
    tagged = []
    for df in ranked_lists:
        # global rank over a candidate list of ≤ 2×limit rows — bounded,
        # so the single-partition window is safe at any scale. (The
        # lit(0) partition key is folded away by Catalyst; WindowExec's
        # "No Partition Defined" WARN is silenced at the logger instead —
        # see session._silence_bounded_window_warn.)
        w = Window.partitionBy(F.lit(0)).orderBy(F.desc("score"), "uuid")
        tagged.append(
            df.withColumn("rank", F.row_number().over(w) - 1).select("uuid", "rank")
        )
    out = tagged[0]
    for t in tagged[1:]:
        out = out.unionByName(t)
    return (
        out.groupBy("uuid")
        .agg(F.sum(1.0 / (F.col("rank") + 1)).alias("score"))
        .where(F.col("score") >= min_score)
        .orderBy(F.desc("score"), "uuid")
    )


def mmr(
    candidates: DataFrame,
    query_vec: list[float],
    embedding_col: str,
    lambda_: float = DEFAULT_MMR_LAMBDA,
    min_score: float = float("-inf"),
) -> DataFrame:
    """Q8 (search_utils.py:976-1012): maximal-marginal-relevance —
    mmr(c) = λ·sim(q,c) + (λ-1)·max_sim(c, other candidates).
    Candidate sets are already trimmed to ~2*limit (≤ tens of rows), so
    this runs driver-side on collected vectors, like the reference."""
    rows = candidates.select("uuid", embedding_col).collect()
    if not rows:
        return candidates.sparkSession.createDataFrame([], "uuid string, score double")
    uuids = [r["uuid"] for r in rows]
    mat = np.array([r[embedding_col] for r in rows], dtype=np.float64)
    norms = np.linalg.norm(mat, axis=1, keepdims=True)
    norms[norms == 0] = 1.0
    mat = mat / norms  # reference normalizes candidates (helpers.py:82-85)
    q = np.array(query_vec, dtype=np.float64)
    qn = np.linalg.norm(q) or 1.0
    q = q / qn
    sim_q = mat @ q
    sim_cc = mat @ mat.T
    np.fill_diagonal(sim_cc, -np.inf)
    max_other = sim_cc.max(axis=1) if len(uuids) > 1 else np.zeros(len(uuids))
    scores = lambda_ * sim_q + (lambda_ - 1) * max_other
    out = [(u, float(s)) for u, s in zip(uuids, scores) if s >= min_score]
    out.sort(key=lambda x: (-x[1], x[0]))
    return candidates.sparkSession.createDataFrame(out, "uuid string, score double")


def node_distance_rerank(
    candidates: DataFrame,
    edges: DataFrame,
    center_node_uuid: str,
    min_score: float = 0.0,
    max_depth: int = 6,
) -> DataFrame:
    """Q9 (search_utils.py:901-943): rank by shortest-path length from a
    center node; unreachable = ∞ (dropped by min_score), center = 0.1,
    ascending distance; keep 1/dist ≥ min_score."""
    from kgspark.search.bfs import node_distances

    dist = node_distances(edges, [center_node_uuid], max_depth)
    out = (
        candidates.join(dist, "uuid", "left")
        .withColumn(
            "dist",
            F.when(F.col("uuid") == center_node_uuid, F.lit(0.1))
            .otherwise(F.col("dist").cast("double")),
        )
        .where(F.col("dist").isNotNull())
        .withColumn("score", 1.0 / F.col("dist"))
        .where(F.col("score") >= min_score)
        .orderBy("dist", "uuid")
        .select("uuid", "score")
    )
    return out


def episode_mentions_rerank(
    candidates_rrf_sorted: DataFrame, mentions: DataFrame
) -> DataFrame:
    """Q10 (search_utils.py:946-973): count MENTIONS per node then sort —
    the reference sorts ASCENDING by count (the `.sort(key=scores)` quirk
    at :971) — preserved deliberately."""
    counts = mentions.groupBy(F.col("entity_uuid").alias("uuid")).agg(
        F.count("*").alias("score")
    )
    return (
        candidates_rrf_sorted.select("uuid")
        .join(counts, "uuid", "left")
        .fillna(0, subset=["score"])
        .withColumn("score", F.col("score").cast("double"))
        .orderBy("score", "uuid")  # ascending — reference quirk
    )


# ------------------------------------------------------------------ Q11 / E7
@F.pandas_udf(T.DoubleType())
def lexical_overlap_score(query: pd.Series, passage: pd.Series) -> pd.Series:
    """Deterministic cross-encoder stand-in (E7; reference
    cross_encoder/client.py:20-41): token-overlap F1 between query and
    passage. Pluggable slot for a real reranker model at scale."""
    out = []
    for q, p in zip(query, passage):
        qs = set(str(q or "").lower().split())
        ps = set(str(p or "").lower().split())
        if not qs or not ps:
            out.append(0.0)
            continue
        inter = len(qs & ps)
        prec = inter / len(ps)
        rec = inter / len(qs)
        out.append(2 * prec * rec / (prec + rec) if (prec + rec) else 0.0)
    return pd.Series(out)


def cross_encoder_rerank(
    candidates: DataFrame, query: str, passage_col: str, min_score: float = 0.0
) -> DataFrame:
    """Q11 (search.py:224-229): score candidates with the cross-encoder
    UDF, keep score ≥ min_score, sort desc."""
    return (
        candidates.withColumn(
            "score", lexical_overlap_score(F.lit(query), F.col(passage_col))
        )
        .where(F.col("score") >= min_score)
        .orderBy(F.desc("score"), "uuid")
        .select("uuid", "score")
    )
