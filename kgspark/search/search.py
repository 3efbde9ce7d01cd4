"""Q1/Q2/Q6/Q14: the hybrid search dispatcher (SURVEY §2.5; reference
search/search.py:67-159 dispatcher, 162-260 edge_search, 263-340
node_search, 343-390 episode_search, 393-440 community_search).

Shape preserved: embed the query once; per sub-search, each configured
method fetches ``2 * limit`` candidates (search.py:181-195); union +
uuid-dedup; rerank (rrf / mmr / cross_encoder / node_distance /
episode_mentions); trim to limit. Empty query → empty results
(search.py:83-88).
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.search.config import (
    CommunityReranker,
    EdgeReranker,
    EdgeSearchMethod,
    NodeReranker,
    NodeSearchMethod,
    SearchConfig,
)
from kgspark.search.filters import SearchFilters, edge_filter, node_filter
from kgspark.search.fulltext import bm25_search
from kgspark.search.rerank import (
    cross_encoder_rerank,
    episode_mentions_rerank,
    mmr,
    node_distance_rerank,
    rrf,
)
from kgspark.search.similarity import cosine_search, embed_query


@dataclass
class SearchResults:  # reference search_config.py:121-126
    edges: DataFrame | None = None
    nodes: DataFrame | None = None
    episodes: DataFrame | None = None
    communities: DataFrame | None = None
    extras: dict = field(default_factory=dict)


def _empty(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "uuid string, score double")


def _dedup_union(cands: list[DataFrame], spark: SparkSession) -> DataFrame:
    """uuid-level dedup across method lists, keeping each method's scores
    for RRF (reference dedups via uuid map, search.py:207)."""
    if not cands:
        return _empty(spark)
    out = cands[0]
    for c in cands[1:]:
        out = out.unionByName(c)
    return out.groupBy("uuid").agg(F.max("score").alias("score"))


def _apply_reranker(
    spark, kind, reranker, cands, config, graph, query, qvec,
    center_node_uuid, passage_col, table,
):
    candidates = _dedup_union(cands, spark)
    if reranker in ("reciprocal_rank_fusion",):
        return rrf(cands, config.reranker_min_score)
    if reranker == "mmr":
        emb_col = "fact_embedding" if kind == "edge" else "name_embedding"
        with_emb = candidates.join(table.select("uuid", emb_col), "uuid")
        return mmr(with_emb, qvec, emb_col, min_score=config.reranker_min_score)
    if reranker == "cross_encoder":
        with_text = candidates.join(table.select("uuid", passage_col), "uuid")
        return cross_encoder_rerank(with_text, query, passage_col,
                                    config.reranker_min_score)
    if reranker == "node_distance" and center_node_uuid:
        if kind == "edge":
            # rank an edge by its source node's distance from the center
            # (reference reranks edges via endpoint node distance,
            # search.py:244-251)
            from kgspark.search.bfs import node_distances

            dist = node_distances(graph["edges"], [center_node_uuid], 6)
            src = table.select(F.col("uuid").alias("edge_uuid"),
                               F.col("source_node_uuid").alias("node_uuid"))
            return (
                candidates.withColumnRenamed("uuid", "edge_uuid")
                .join(src, "edge_uuid")
                .join(dist.withColumnRenamed("uuid", "node_uuid"), "node_uuid", "left")
                .where(F.col("dist").isNotNull())
                .withColumn("score", 1.0 / F.greatest(F.col("dist").cast("double"), F.lit(0.1)))
                .where(F.col("score") >= config.reranker_min_score)
                .select(F.col("edge_uuid").alias("uuid"), "score")
                .orderBy(F.desc("score"), "uuid")
            )
        return node_distance_rerank(candidates, graph["edges"], center_node_uuid,
                                    min_score=config.reranker_min_score)
    if reranker == "episode_mentions":
        presorted = rrf(cands, 0.0)
        if kind == "node":
            return episode_mentions_rerank(presorted, graph["mentions"])
        # edge variant sorts desc by number of supporting episodes
        # (reference search.py:257-258)
        n_eps = table.select("uuid", F.size("episodes").cast("double").alias("score"))
        return (
            presorted.select("uuid").join(n_eps, "uuid")
            .orderBy(F.desc("score"), "uuid")
        )
    return rrf(cands, config.reranker_min_score)


def edge_search(
    spark, graph, postings, query, qvec, config, limit,
    group_ids=None, center_node_uuid=None, bfs_origin_uuids=None,
    filters: SearchFilters | None = None,
):
    ec = config.edge_config
    edges = graph["edges"]
    if filters:
        edges = edges.where(edge_filter(filters))
    cands = []
    if EdgeSearchMethod.bm25 in ec.search_methods:
        cands.append(bm25_search(spark, postings, "edge", query, group_ids, 2 * limit))
    if EdgeSearchMethod.cosine_similarity in ec.search_methods:
        cands.append(cosine_search(edges, qvec, "fact_embedding", group_ids,
                                   ec.sim_min_score, 2 * limit))
    if EdgeSearchMethod.bfs in ec.search_methods and (bfs_origin_uuids or center_node_uuid):
        from kgspark.search.bfs import bfs_edges

        origins = bfs_origin_uuids or [center_node_uuid]
        hits = bfs_edges(graph["edges"], origins, ec.bfs_max_depth)
        cands.append(hits.select("uuid", F.lit(1.0).alias("score")).limit(2 * limit))
    if filters:
        allowed = edges.select("uuid")
        cands = [c.join(allowed, "uuid", "left_semi") for c in cands]
    ranked = _apply_reranker(
        spark, "edge", ec.reranker.value, cands, config, graph, query, qvec,
        center_node_uuid, "fact", graph["edges"],
    )
    return ranked.limit(limit)


def node_search(
    spark, graph, postings, query, qvec, config, limit,
    group_ids=None, center_node_uuid=None, bfs_origin_uuids=None,
    filters: SearchFilters | None = None,
):
    nc = config.node_config
    nodes = graph["nodes"]
    if filters:
        nodes = nodes.where(node_filter(filters))
    cands = []
    if NodeSearchMethod.bm25 in nc.search_methods:
        cands.append(bm25_search(spark, postings, "node", query, group_ids, 2 * limit))
    if NodeSearchMethod.cosine_similarity in nc.search_methods:
        cands.append(cosine_search(nodes, qvec, "name_embedding", group_ids,
                                   nc.sim_min_score, 2 * limit))
    if NodeSearchMethod.bfs in nc.search_methods and (bfs_origin_uuids or center_node_uuid):
        from kgspark.search.bfs import bfs_nodes

        origins = bfs_origin_uuids or [center_node_uuid]
        hits = bfs_nodes(nodes, graph["edges"], origins, nc.bfs_max_depth)
        cands.append(hits.select("uuid", F.lit(1.0).alias("score")).limit(2 * limit))
    if filters:
        allowed = nodes.select("uuid")
        cands = [c.join(allowed, "uuid", "left_semi") for c in cands]
    ranked = _apply_reranker(
        spark, "node", nc.reranker.value, cands, config, graph, query, qvec,
        center_node_uuid, "summary", graph["nodes"],
    )
    return ranked.limit(limit)


def episode_search(spark, graph, postings, query, config, limit, group_ids=None):
    cands = [bm25_search(spark, postings, "episode", query, group_ids, 2 * limit)]
    if config.episode_config.reranker.value == "cross_encoder":
        ranked = cross_encoder_rerank(
            _dedup_union(cands, spark).join(graph["episodes"].select("uuid", "content"), "uuid"),
            query, "content", config.reranker_min_score)
    else:
        ranked = rrf(cands, config.reranker_min_score)
    return ranked.limit(limit)


def community_search(spark, graph, postings, query, qvec, config, limit, group_ids=None):
    if "communities" not in graph:
        return _empty(spark)
    cc = config.community_config
    cands = [bm25_search(spark, postings, "community", query, group_ids, 2 * limit)]
    if "cosine_similarity" in [m.value for m in cc.search_methods]:
        cands.append(cosine_search(graph["communities"], qvec, "name_embedding",
                                   group_ids, 0.6, 2 * limit))
    if cc.reranker == CommunityReranker.mmr:
        with_emb = _dedup_union(cands, spark).join(
            graph["communities"].select("uuid", "name_embedding"), "uuid")
        ranked = mmr(with_emb, qvec, "name_embedding", min_score=config.reranker_min_score)
    elif cc.reranker == CommunityReranker.cross_encoder:
        ranked = cross_encoder_rerank(
            _dedup_union(cands, spark).join(
                graph["communities"].select("uuid", "summary"), "uuid"),
            query, "summary", config.reranker_min_score)
    else:
        ranked = rrf(cands, config.reranker_min_score)
    return ranked.limit(limit)


def search(
    spark: SparkSession,
    graph: dict[str, DataFrame],
    postings: DataFrame,
    query: str,
    config: SearchConfig,
    group_ids: list[str] | None = None,
    center_node_uuid: str | None = None,
    bfs_origin_uuids: list[str] | None = None,
    filters: SearchFilters | None = None,
    embed_dim: int = 64,
) -> SearchResults:
    """Q1 dispatcher (search/search.py:67-159)."""
    if not query or not query.strip():
        e = _empty(spark)
        return SearchResults(edges=e, nodes=e, episodes=e, communities=e)
    qvec = embed_query(query.replace("\n", " "), embed_dim)
    res = SearchResults()
    if config.edge_config:
        res.edges = edge_search(spark, graph, postings, query, qvec, config,
                                config.limit, group_ids, center_node_uuid,
                                bfs_origin_uuids, filters)
    if config.node_config:
        res.nodes = node_search(spark, graph, postings, query, qvec, config,
                                config.limit, group_ids, center_node_uuid,
                                bfs_origin_uuids, filters)
    if config.episode_config:
        res.episodes = episode_search(spark, graph, postings, query, config,
                                      config.limit, group_ids)
    if config.community_config:
        res.communities = community_search(spark, graph, postings, query, qvec,
                                           config, config.limit, group_ids)
    return res


def get_nodes_and_edges_by_episode(
    graph: dict[str, DataFrame], episode_uuids: list[str]
) -> tuple[DataFrame, DataFrame]:
    """Q14 (graphiti.py:723-734): an episode's entity edges + mentioned nodes."""
    eps = graph["episodes"].where(F.col("uuid").isin(episode_uuids))
    edge_uuids = eps.select(F.explode("entity_edges").alias("uuid")).distinct()
    edges = graph["edges"].join(edge_uuids, "uuid", "left_semi")
    node_uuids = graph["mentions"].where(
        F.col("episode_uuid").isin(episode_uuids)
    ).select(F.col("entity_uuid").alias("uuid")).distinct()
    nodes = graph["nodes"].join(node_uuids, "uuid", "left_semi")
    return nodes, edges
