"""Q5/Q9: bounded BFS over RELATES_TO (SURVEY §2.5; reference
edge BFS search_utils.py:272-324, node BFS 427-463, node-distance
reranker 901-943; MAX_SEARCH_DEPTH=3 search_utils.py:55).

Iterative frontier joins — depth is a small constant (≤3), so this is
a fixed number of equi-joins on node uuid, no recursion. Frontier is
deduped per hop (distinct) and group-consistency is enforced by
joining within the edges table itself (edges carry group_id —
reference search_utils.py:445 `n.group_id = origin.group_id`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MAX_SEARCH_DEPTH = 3


def _undirected(edges: DataFrame) -> DataFrame:
    fwd = edges.select(
        F.col("source_node_uuid").alias("a"),
        F.col("target_node_uuid").alias("b"),
        F.col("uuid").alias("edge_uuid"),
        "group_id",
    )
    return fwd.unionByName(
        edges.select(
            F.col("target_node_uuid").alias("a"),
            F.col("source_node_uuid").alias("b"),
            F.col("uuid").alias("edge_uuid"),
            "group_id",
        )
    )


def node_distances(
    edges: DataFrame, origin_uuids: list[str], max_depth: int = MAX_SEARCH_DEPTH
) -> DataFrame:
    """(uuid, dist) for nodes within max_depth hops of any origin;
    origins get dist 0. Frontier join per hop, visited-set anti-join."""
    adj = _undirected(edges).select("a", "b")
    spark = edges.sparkSession
    visited = spark.createDataFrame(
        [(u, 0) for u in origin_uuids], "uuid string, dist int"
    )
    frontier = visited.select("uuid")
    for depth in range(1, max_depth + 1):
        nxt = (
            adj.join(frontier, adj.a == frontier.uuid)
            .select(F.col("b").alias("uuid"))
            .distinct()
            .join(visited.select("uuid"), "uuid", "left_anti")
            .withColumn("dist", F.lit(depth))
            .localCheckpoint()
        )
        if nxt.isEmpty():
            break
        visited = visited.unionByName(nxt)
        frontier = nxt.select("uuid")
    return visited


def bfs_edges(
    edges: DataFrame, origin_uuids: list[str], max_depth: int = MAX_SEARCH_DEPTH
) -> DataFrame:
    """Edge BFS (search_utils.py:272-324): all RELATES_TO edges whose
    source end is reachable within max_depth-1 hops of an origin."""
    dist = node_distances(edges, origin_uuids, max_depth - 1)
    reach = dist.select("uuid")
    und = _undirected(edges)
    hit = (
        und.join(reach, und.a == reach.uuid)
        .select("edge_uuid")
        .distinct()
    )
    return edges.join(hit, edges.uuid == hit.edge_uuid, "left_semi")


def bfs_nodes(
    nodes: DataFrame, edges: DataFrame, origin_uuids: list[str],
    max_depth: int = MAX_SEARCH_DEPTH,
) -> DataFrame:
    """Node BFS (search_utils.py:427-463): nodes within max_depth hops,
    excluding the origins themselves."""
    dist = node_distances(edges, origin_uuids, max_depth)
    found = dist.where(F.col("dist") > 0).select("uuid")
    return nodes.join(found, "uuid", "left_semi")
