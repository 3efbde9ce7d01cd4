"""Community operators C1-C5 (SURVEY §2.6; reference
utils/maintenance/community_operations.py).

C2 label propagation is the reference's algorithm (community_operations.py:79-125)
as iterative DataFrame joins: each node adopts the plurality community
among neighbors weighted by edge count; ties break to the larger
community id (lexicographically greatest label — deterministic);
iterate to fixpoint with a bounded driver loop.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from kgspark.functions.embed import embedder_udf
from kgspark.operators.extract import sha1_uuid


def build_projection(edges: DataFrame) -> DataFrame:
    """C1 (community_operations.py:28-76): undirected neighbor map with
    RELATES_TO counts per (group_id, node, neighbor)."""
    fwd = edges.select("group_id", F.col("source_node_uuid").alias("node"),
                       F.col("target_node_uuid").alias("nbr"))
    rev = edges.select("group_id", F.col("target_node_uuid").alias("node"),
                       F.col("source_node_uuid").alias("nbr"))
    return (
        fwd.unionByName(rev)
        .groupBy("group_id", "node", "nbr")
        .agg(F.count("*").alias("edge_count"))
    )


def label_propagation(projection: DataFrame, max_iter: int = 20) -> DataFrame:
    """C2 (community_operations.py:79-125) → (node, group_id, community).

    Per iteration: candidate[node] = argmax over neighbor labels of
    Σ edge_count, ties to the greater label id; a node only switches if
    the winning weight beats staying (reference: plurality must have
    rank > 1 — i.e., a strictly better neighbor community). Fixpoint
    when no label changes; localCheckpoint truncates lineage."""
    proj = projection.persist()
    labels = (
        proj.select("group_id", "node").distinct()
        .withColumn("label", F.col("node"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        nbr_lab = proj.join(
            labels.select(F.col("node").alias("nbr"), F.col("label").alias("nbr_label")),
            "nbr",
        )
        votes = nbr_lab.groupBy("group_id", "node", "nbr_label").agg(
            F.sum("edge_count").alias("w")
        )
        w = Window.partitionBy("node").orderBy(F.desc("w"), F.desc("nbr_label"))
        winner = (
            votes.withColumn("_rn", F.row_number().over(w))
            .where(F.col("_rn") == 1)
            .select("node", F.col("nbr_label").alias("new_label"), "w")
        )
        new_labels = (
            labels.join(winner, "node", "left")
            .select(
                "group_id", "node",
                F.coalesce("new_label", "label").alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n").join(labels.alias("o"), "node")
            .where(F.col("n.label") != F.col("o.label"))
            .limit(1).count()
        )
        labels = new_labels
        if changed == 0:
            break
    proj.unpersist()
    return labels.select("group_id", "node", F.col("label").alias("community"))


def build_communities(
    nodes: DataFrame,
    edges: DataFrame,
    now: datetime | None = None,
    embed_dim: int = 64,
    group_ids: list[str] | None = None,
) -> tuple[DataFrame, DataFrame]:
    """C1+C2+C3 (graphiti.py:600-622): → (communities, community_members).

    C3 deterministic summarization (replacing the pairwise-LLM merge,
    community_operations.py:128-193): community name = most-mentioned
    member entity's name (ties → lexicographic); summary = top-5 member
    names joined. ``group_ids`` restricts the rebuild to those graph
    partitions (reference build_communities(group_ids),
    graphiti.py:600-622) — label propagation never crosses groups, so
    the filter is a plain partition-pruning predicate."""
    if group_ids:
        nodes = nodes.where(F.col("group_id").isin(group_ids))
        edges = edges.where(F.col("group_id").isin(group_ids))
    proj = build_projection(edges)
    labels = label_propagation(proj)

    members = labels.join(
        nodes.select(F.col("uuid").alias("node"), "name",
                     F.coalesce(
                         F.element_at(F.col("attributes"), "mention_count").cast("long"),
                         F.lit(1)).alias("weight")),
        "node",
    )
    now_col = F.lit(now) if now else F.current_timestamp()
    agg = members.groupBy("group_id", "community").agg(
        F.max_by("name", F.struct(F.col("weight"), F.col("name"))).alias("name"),
        F.concat_ws(
            "; ", F.slice(F.array_sort(F.collect_list(F.struct(
                (-F.col("weight")).alias("nw"), F.col("name").alias("n")
            ))), 1, 5).getField("n"),
        ).alias("summary"),
        F.count("*").alias("n_members"),
    )
    embed = embedder_udf(embed_dim)
    communities = (
        agg.withColumn("uuid", sha1_uuid(F.lit("community"), F.col("group_id"),
                                         F.col("community")))
        .withColumn("name_embedding", embed(F.col("name")))
        .withColumn("created_at", now_col)
        .select("uuid", "name", "group_id", "summary", "name_embedding", "created_at")
    )
    community_members = (
        labels.withColumn(
            "community_uuid",
            sha1_uuid(F.lit("community"), F.col("group_id"), F.col("community")),
        )
        .withColumn("uuid", sha1_uuid(F.lit("member"), F.col("community_uuid"),
                                      F.col("node")))
        .select("uuid", "community_uuid", F.col("node").alias("entity_uuid"),
                "group_id", now_col.alias("created_at"))
    )
    return communities, community_members


def remove_communities(store, spark) -> None:
    """C5 (community_operations.py:222-229)."""
    for t in ("communities", "community_members"):
        if store.exists(t):
            store.write(t, store.read(spark, t).limit(0))


def update_communities(
    nodes: DataFrame,
    edges: DataFrame,
    communities: DataFrame,
    community_members: DataFrame,
    touched: DataFrame,
    now: datetime | None = None,
    embed_dim: int = 64,
) -> tuple[DataFrame, DataFrame]:
    """C4, set-based (reference update_community per touched node,
    community_operations.py:232-313, invoked from
    graphiti.py:464-471 when add_episode(update_communities=True)):

    - nodes already in a community keep it (determine_entity_community's
      first query);
    - unassigned touched nodes join the plurality community among their
      neighbors (edge-count weighted, ties to the greater community
      uuid — the reference's defaultdict count over one row per
      RELATES_TO path); no neighbor community → no assignment;
    - affected communities get their name/summary/embedding refreshed
      deterministically (the C3 rule stands in for the reference's
      summarize_pair LLM call).

    One batch dataflow for ANY number of touched nodes — the reference
    loops a Cypher round-trip per node. Returns (communities, members).
    """
    touched = touched.select("uuid").distinct()
    unassigned = touched.join(
        community_members.select(F.col("entity_uuid").alias("uuid")),
        "uuid", "left_anti")
    # prune edges to the unassigned nodes' incident set BEFORE the
    # projection groupBy — per-batch cost must be proportional to the
    # touched neighborhood, not the whole graph (a full build_projection
    # here would shuffle every edge in the store on every micro-batch,
    # defeating C4's purpose). Two broadcast semi-joins are map-side;
    # only the small incident set is shuffled. Neighbor counts are
    # unchanged: every edge of an unassigned node is in the incident set.
    u = F.broadcast(unassigned)
    incident = (
        edges.join(u.withColumnRenamed("uuid", "source_node_uuid"),
                   "source_node_uuid", "left_semi")
        .unionByName(
            edges.join(u.withColumnRenamed("uuid", "target_node_uuid"),
                       "target_node_uuid", "left_semi"))
        .dropDuplicates(["uuid"])  # both-endpoints-unassigned edges once
    )
    proj = build_projection(incident).join(
        F.broadcast(unassigned.withColumnRenamed("uuid", "node")), "node", "left_semi")
    votes = (
        proj.join(
            community_members.select(F.col("entity_uuid").alias("nbr"),
                                     "community_uuid"),
            "nbr",
        )
        .groupBy("node", "community_uuid")
        .agg(F.sum("edge_count").alias("w"))
    )
    w_rank = Window.partitionBy("node").orderBy(F.desc("w"), F.desc("community_uuid"))
    now_col = F.lit(now) if now else F.current_timestamp()
    new_rows = (
        votes.withColumn("_rn", F.row_number().over(w_rank)).where("_rn = 1")
        .join(nodes.select(F.col("uuid").alias("node"), "group_id"), "node")
        .select(
            sha1_uuid(F.lit("member"), F.col("community_uuid"),
                      F.col("node")).alias("uuid"),
            "community_uuid",
            F.col("node").alias("entity_uuid"),
            "group_id",
            now_col.alias("created_at"),
        )
    )
    members = community_members.unionByName(new_rows)

    # refresh name/summary of ONLY the affected communities (the ones a
    # touched node belongs to after assignment) — C3 deterministic rule
    affected = members.join(
        F.broadcast(touched.withColumnRenamed("uuid", "entity_uuid")),
        "entity_uuid", "left_semi").select("community_uuid").distinct()
    stats = (
        members.join(F.broadcast(affected), "community_uuid", "left_semi")
        .join(nodes.select(F.col("uuid").alias("entity_uuid"), "name",
                           F.coalesce(
                               F.element_at(F.col("attributes"), "mention_count")
                               .cast("long"), F.lit(1)).alias("weight")),
              "entity_uuid")
        .groupBy("community_uuid")
        .agg(
            F.max_by("name", F.struct(F.col("weight"), F.col("name"))).alias("_name"),
            F.concat_ws(
                "; ", F.slice(F.array_sort(F.collect_list(F.struct(
                    (-F.col("weight")).alias("nw"), F.col("name").alias("n")
                ))), 1, 5).getField("n"),
            ).alias("_summary"),
        )
    )
    embed = embedder_udf(embed_dim)
    refreshed = (
        communities.join(F.broadcast(stats),
                         communities.uuid == stats.community_uuid, "left")
        .withColumn("name", F.coalesce("_name", "name"))
        .withColumn("summary", F.coalesce("_summary", "summary"))
        .withColumn(
            "name_embedding",
            F.when(F.col("_name").isNotNull(), embed(F.col("name")))
            .otherwise(F.col("name_embedding")),
        )
        .drop("community_uuid", "_name", "_summary")
    )
    return refreshed, members


def update_community(
    nodes: DataFrame,
    edges: DataFrame,
    communities: DataFrame,
    community_members: DataFrame,
    node_uuid: str,
    now: datetime | None = None,
) -> DataFrame:
    """C4 (community_operations.py:232-313): assign a (new) node to the
    plurality community of its neighbors; returns updated membership."""
    proj = build_projection(edges).where(F.col("node") == node_uuid)
    votes = (
        proj.join(
            community_members.select(F.col("entity_uuid").alias("nbr"),
                                     F.col("community_uuid")),
            "nbr",
        )
        .groupBy("community_uuid")
        .agg(F.sum("edge_count").alias("w"))
        .orderBy(F.desc("w"), F.desc("community_uuid"))
        .limit(1)
    )
    now_col = F.lit(now) if now else F.current_timestamp()
    node_grp = nodes.where(F.col("uuid") == node_uuid).select("group_id")
    new_row = (
        votes.crossJoin(node_grp)
        .withColumn("entity_uuid", F.lit(node_uuid))
        .withColumn("uuid", sha1_uuid(F.lit("member"), F.col("community_uuid"),
                                      F.col("entity_uuid")))
        .select("uuid", "community_uuid", "entity_uuid", "group_id",
                now_col.alias("created_at"))
    )
    existing = community_members.where(F.col("entity_uuid") != node_uuid)
    return existing.unionByName(new_row)
