"""C1-C4 community operator tests (reference community_operations.py)."""

from datetime import datetime

import pandas as pd
from pyspark.sql import functions as F

from kgspark.operators.community import (
    build_communities,
    build_projection,
    label_propagation,
    update_community,
)

NOW = datetime(2024, 6, 1)


def _edges(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame(rows, columns=["uuid", "group_id", "source_node_uuid",
                                    "target_node_uuid"])
    )


def test_projection_undirected_counts(spark):
    e = _edges(spark, [("e1", "g", "a", "b"), ("e2", "g", "a", "b"),
                       ("e3", "g", "b", "c")])
    proj = {(r["node"], r["nbr"]): r["edge_count"]
            for r in build_projection(e).collect()}
    assert proj[("a", "b")] == 2 and proj[("b", "a")] == 2
    assert proj[("b", "c")] == 1 and proj[("c", "b")] == 1


def test_label_propagation_two_cliques(spark):
    # clique {a,b,c} densely connected; clique {x,y,z}; one weak bridge c-x
    rows = [("1", "g", "a", "b"), ("2", "g", "b", "c"), ("3", "g", "a", "c"),
            ("4", "g", "a", "b"), ("5", "g", "b", "c"), ("6", "g", "a", "c"),
            ("7", "g", "x", "y"), ("8", "g", "y", "z"), ("9", "g", "x", "z"),
            ("10", "g", "x", "y"), ("11", "g", "y", "z"), ("12", "g", "x", "z"),
            ("13", "g", "c", "x")]
    labels = {r["node"]: r["community"]
              for r in label_propagation(build_projection(_edges(spark, rows))).collect()}
    assert labels["a"] == labels["b"] == labels["c"]
    assert labels["x"] == labels["y"] == labels["z"]
    assert labels["a"] != labels["x"]


def test_build_communities_from_graph(spark, graph):
    communities, members = build_communities(graph["nodes"], graph["edges"], NOW)
    c = communities.where(F.col("group_id") == "golden.example.org").collect()
    assert len(c) >= 1
    assert all(r["name"] and r["summary"] for r in c)
    # every member points at an existing community
    orphans = members.join(communities.select(F.col("uuid").alias("community_uuid")),
                           "community_uuid", "left_anti").count()
    assert orphans == 0
    # membership covers the golden entities
    gold_nodes = graph["nodes"].where(F.col("group_id") == "golden.example.org")
    joined = gold_nodes.join(members, gold_nodes.uuid == members.entity_uuid,
                             "left_semi").count()
    assert joined > 0


def test_auto_update_communities_on_ingest(spark, tmp_path):
    """C4 wired into ingest (reference add_episode(update_communities=True),
    graphiti.py:464-471): a new entity connected to an existing community
    member joins that community without a full build_communities(), and
    the affected community's summary refreshes."""
    from kgspark.api import KGSpark

    kg = KGSpark(spark, str(tmp_path / "c4"))
    kg.add_episode("e1", "Alice Johnson works at Acme Corp. Alice Johnson "
                   "knows Bob Smith. Bob Smith works at Acme Corp.",
                   reference_time=datetime(2024, 1, 1), group_id="g1", now=NOW)
    kg.build_communities(now=NOW)
    before = {r["entity_uuid"]: r["community_uuid"]
              for r in kg.graph()["community_members"].collect()}
    alice = kg.graph()["nodes"].where(F.col("name") == "Alice Johnson") \
        .collect()[0]["uuid"]
    # new entity Carol connected to Alice, auto-update on
    kg.add_episode("e2", "Carol Davis knows Alice Johnson.",
                   reference_time=datetime(2024, 2, 1), group_id="g1", now=NOW,
                   update_communities=True)
    g = kg.graph()
    carol = g["nodes"].where(F.col("name") == "Carol Davis").collect()[0]["uuid"]
    after = {r["entity_uuid"]: r["community_uuid"]
             for r in g["community_members"].collect()}
    assert after[carol] == before[alice], "Carol joins Alice's community"
    # existing memberships untouched
    assert all(after[k] == v for k, v in before.items())
    # refreshed summary mentions the new member
    comm = g["communities"].where(F.col("uuid") == after[carol]).collect()[0]
    assert "Carol Davis" in comm["summary"]


def test_build_communities_group_filter(spark, tmp_path):
    """build_communities(group_ids=[g]) rebuilds only that partition and
    splices over prior state (reference graphiti.py:600-622)."""
    from kgspark.api import KGSpark

    kg = KGSpark(spark, str(tmp_path / "cgrp"))
    kg.add_episode("a", "Ann Li works at Acme Corp. Ann Li knows Max Roe.",
                   reference_time=datetime(2024, 1, 1), group_id="gA", now=NOW)
    kg.add_episode("b", "Zoe Kim works at Globex. Zoe Kim knows Ian Ott.",
                   reference_time=datetime(2024, 1, 1), group_id="gB", now=NOW)
    kg.build_communities(now=NOW)
    before_b = {(r["uuid"], r["name"]) for r in kg.graph()["communities"]
                .where(F.col("group_id") == "gB").collect()}
    # partial rebuild of gA only — gB communities must be byte-identical
    kg.build_communities(now=NOW, group_ids=["gA"])
    g = kg.graph()
    after_b = {(r["uuid"], r["name"]) for r in g["communities"]
               .where(F.col("group_id") == "gB").collect()}
    assert after_b == before_b
    assert g["communities"].where(F.col("group_id") == "gA").count() >= 1
    # no duplicated gA rows from the splice
    assert (g["communities"].groupBy("uuid").count()
            .where("count > 1").count() == 0)


def test_update_community(spark):
    e = _edges(spark, [("1", "g", "a", "b"), ("2", "g", "a", "b"),
                       ("3", "g", "n", "a")])
    nodes = spark.createDataFrame(
        [("a", "g", "A", {"mention_count": "3"}),
         ("b", "g", "B", {"mention_count": "3"}),
         ("n", "g", "N", {"mention_count": "3"})],
        "uuid string, group_id string, name string, attributes map<string,string>",
    )
    communities, members = build_communities(nodes, e, NOW)
    updated = update_community(nodes, e, communities, members, "n", NOW)
    n_row = [r for r in updated.collect() if r["entity_uuid"] == "n"]
    assert len(n_row) == 1
    a_comm = [r["community_uuid"] for r in members.collect() if r["entity_uuid"] == "a"][0]
    assert n_row[0]["community_uuid"] == a_comm
