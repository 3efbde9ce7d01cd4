"""Q4: cosine-similarity search (SURVEY §2.5; reference
`vector.similarity.cosine(emb, $query) > min_score ORDER BY score LIMIT`,
search_utils.py:198-269 edge, 370-424 node, 543-585 community).

Embeddings are L2-normalized at write time (kgspark embedder), so
cosine = dot product — a native `zip_with`+`aggregate` expression, no
UDF, codegen'd, scan-parallel. Top-k via sort-limit (Spark plans
TakeOrderedAndProject — no full sort materialization).

Scale path: brute force is a full scan per query batch; for the
10^12-doc regime use the LSH-bucketed variant in kgspark.datapipe.ann
(same scoring expression after a bucket equi-join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.functions.embed import cosine, embed_texts

DEFAULT_MIN_SCORE = 0.6  # reference search_utils.py:53


def embed_query(query: str, dim: int = 64) -> list[float]:
    return list(embed_texts(__import__("pandas").Series([query]), dim)[0])


def cosine_search(
    df: DataFrame,
    query_vec: list[float],
    embedding_col: str,
    group_ids: list[str] | None = None,
    min_score: float = DEFAULT_MIN_SCORE,
    limit: int = 20,
) -> DataFrame:
    """Top-`limit` (uuid, score) rows with cosine(embedding, query) > min_score."""
    out = df
    if group_ids:
        out = out.where(F.col("group_id").isin(group_ids))
    qcol = F.array(*[F.lit(float(x)) for x in query_vec])
    return (
        out.where(F.col(embedding_col).isNotNull())
        .withColumn("score", cosine(F.col(embedding_col).cast("array<double>"), qcol))
        .where(F.col("score") > min_score)
        .orderBy(F.desc("score"), "uuid")
        .limit(limit)
        .select("uuid", "score")
    )


def similarity_join(
    left: DataFrame,
    right: DataFrame,
    left_emb: str,
    right_emb: str,
    on: list[str],
    min_score: float,
    k: int | None = None,
) -> DataFrame:
    """θ-join on cosine > min_score, pruned by equi-keys `on` (e.g.
    group_id [+ LSH bucket]); optional per-left-row top-k. Used by D6 /
    D10 / T1 candidate generation (search_utils.py:662-883)."""
    from pyspark.sql import Window

    l = left.alias("l")  # noqa: E741
    r = right.alias("r")
    joined = l.join(r, on=on).withColumn(
        "score",
        cosine(F.col(f"l.{left_emb}").cast("array<double>"),
               F.col(f"r.{right_emb}").cast("array<double>")),
    ).where(F.col("score") > min_score)
    if k is not None:
        w = Window.partitionBy(F.col("l.uuid")).orderBy(F.desc("score"), F.col("r.uuid"))
        joined = joined.withColumn("_rn", F.row_number().over(w)).where(
            F.col("_rn") <= k).drop("_rn")
    return joined
