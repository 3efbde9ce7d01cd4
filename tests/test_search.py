"""Retrieval-layer tests Q1-Q14 over a small built graph."""

from datetime import datetime

from pyspark.sql import functions as F

from kgspark.search import recipes
from kgspark.search.bfs import bfs_nodes, node_distances
from kgspark.search.filters import (
    ComparisonOperator,
    DateFilter,
    SearchFilters,
)
from kgspark.search.fulltext import bm25_search
from kgspark.search.rerank import rrf
from kgspark.search.search import get_nodes_and_edges_by_episode, search
from kgspark.search.similarity import cosine_search, embed_query

NOW = datetime(2024, 6, 1)
GOLD = "golden.example.org"


def _names(graph, result_df):
    return [
        r["name"]
        for r in result_df.join(graph["nodes"], "uuid")
        .select("name", result_df["score"])
        .orderBy(F.desc("score"), "name")
        .collect()
    ]


def test_bm25_finds_episode(spark, graph, postings):
    hits = bm25_search(spark, postings, "episode", "attorney general california",
                       group_ids=[GOLD], limit=5)
    top = hits.join(graph["episodes"], hits.uuid == graph["episodes"].uuid).select(
        "content").collect()
    assert any("Attorney General" in r["content"] for r in top)


def test_bm25_query_too_long_returns_empty(spark, postings):
    q = " ".join(f"term{i}" for i in range(40))
    assert bm25_search(spark, postings, "episode", q).count() == 0


def test_cosine_search_nodes(graph):
    qvec = embed_query("Kamala Harris")
    hits = cosine_search(graph["nodes"], qvec, "name_embedding",
                         group_ids=[GOLD], min_score=0.3, limit=5)
    names = _names(graph, hits)
    assert names[0] == "Kamala Harris"


def test_bfs_and_distances(spark, graph):
    nodes = graph["nodes"]
    kamala = nodes.where((F.col("name") == "Kamala Harris")
                         & (F.col("group_id") == GOLD)).collect()[0]["uuid"]
    dist = {r["uuid"]: r["dist"] for r in
            node_distances(graph["edges"], [kamala], 3).collect()}
    assert dist[kamala] == 0
    sf = nodes.where((F.col("name") == "San Francisco")
                     & (F.col("group_id") == GOLD)).collect()[0]["uuid"]
    assert dist[sf] == 1  # LIVES_IN / VISITED edge
    found = bfs_nodes(nodes, graph["edges"], [kamala], 2)
    assert "San Francisco" in [r["name"] for r in found.collect()]


def test_rrf_order(spark):
    a = spark.createDataFrame([("x", 3.0), ("y", 2.0)], "uuid string, score double")
    b = spark.createDataFrame([("y", 9.0), ("x", 1.0)], "uuid string, score double")
    got = rrf([a, b]).collect()
    # x: 1/1 + 1/2 = 1.5 ; y: 1/2 + 1/1 = 1.5 → tie broken by uuid
    assert [(r["uuid"], r["score"]) for r in got] == [("x", 1.5), ("y", 1.5)]


def test_hybrid_edge_search_rrf(spark, graph, postings):
    res = search(spark, graph, postings, "Alice Smith likes Bob",
                 recipes.EDGE_HYBRID_SEARCH_RRF, group_ids=[GOLD])
    facts = [
        r["fact"] for r in res.edges.join(graph["edges"], "uuid").select("fact").collect()
    ]
    assert any("Alice Smith likes Bob Jones" in f for f in facts)


def test_combined_search_all_kinds(spark, graph, postings):
    res = search(spark, graph, postings, "Kamala Harris California",
                 recipes.COMBINED_HYBRID_SEARCH_RRF, group_ids=[GOLD])
    assert res.edges.count() > 0
    assert res.nodes.count() > 0
    assert res.episodes.count() > 0
    assert "Kamala Harris" in _names(graph, res.nodes)


def test_empty_query_returns_empty(spark, graph, postings):
    res = search(spark, graph, postings, "  ", recipes.COMBINED_HYBRID_SEARCH_RRF)
    assert res.edges.count() == 0 and res.nodes.count() == 0


def test_mmr_reranker(spark, graph, postings):
    res = search(spark, graph, postings, "Kamala Harris California",
                 recipes.NODE_HYBRID_SEARCH_MMR, group_ids=[GOLD])
    assert res.nodes.count() > 0


def test_cross_encoder_reranker(spark, graph, postings):
    res = search(spark, graph, postings, "Alice Smith likes Bob Jones",
                 recipes.EDGE_HYBRID_SEARCH_CROSS_ENCODER, group_ids=[GOLD])
    rows = (
        res.edges.join(graph["edges"], "uuid")
        .select("fact", res.edges["score"])
        .orderBy(F.desc("score"), "fact")
        .collect()
    )
    assert rows and "Alice Smith" in rows[0]["fact"]


def test_node_distance_reranker(spark, graph, postings):
    kamala = graph["nodes"].where(
        (F.col("name") == "Kamala Harris") & (F.col("group_id") == GOLD)
    ).collect()[0]["uuid"]
    res = search(spark, graph, postings, "Kamala Harris San Francisco California",
                 recipes.NODE_HYBRID_SEARCH_NODE_DISTANCE, group_ids=[GOLD],
                 center_node_uuid=kamala)
    assert res.nodes.count() > 0


def test_episode_mentions_reranker(spark, graph, postings):
    res = search(spark, graph, postings, "Kamala Harris California",
                 recipes.NODE_HYBRID_SEARCH_EPISODE_MENTIONS, group_ids=[GOLD])
    rows = res.nodes.collect()
    # ascending-by-mention-count quirk preserved (search_utils.py:971)
    scores = [r["score"] for r in rows]
    assert scores == sorted(scores)


def test_date_filters(spark, graph, postings):
    filt = SearchFilters(valid_at=[[DateFilter(datetime(2020, 1, 1),
                                               ComparisonOperator.less_than)]])
    res = search(spark, graph, postings, "Kamala Harris California",
                 recipes.EDGE_HYBRID_SEARCH_RRF, group_ids=[GOLD], filters=filt)
    rows = res.edges.join(graph["edges"], "uuid").select("valid_at").collect()
    assert all(r["valid_at"] < datetime(2020, 1, 1) for r in rows)


def test_get_nodes_and_edges_by_episode(spark, graph):
    ep = graph["episodes"].where(
        F.col("url") == "https://golden.example.org/doc/a0").collect()[0]
    nodes, edges = get_nodes_and_edges_by_episode(graph, [ep["uuid"]])
    names = {r["name"] for r in nodes.collect()}
    assert {"Alice Smith", "Bob Jones"} <= names
    assert edges.count() >= 1
