"""Q3: BM25-style fulltext search in pure Spark SQL (SURVEY §2.5).

Replaces the reference's Lucene fulltext indexes
(graph_data_operations.py:73-82; queries search_utils.py:144-195 edge,
327-367 node, 466-505 episode, 508-540 community) with materialized
postings: tokenize the searchable text per table → explode →
``postings(kind, term, doc_uuid, group_id, tf, doc_len)``. A query is
then a broadcast-able IN-filter on term + join + groupBy sum — no UDF,
full codegen, and the postings build is one shuffle per table.

Semantics preserved:
- searchable text per kind mirrors the reference's index fields:
  edge: name + fact; node: name + summary; episode: content;
  community: name (DDL graph_data_operations.py:73-82)
- queries longer than MAX_QUERY_LENGTH=32 terms return empty
  (search_utils.py:56, 70-72)
- group_id prefilter inside the query (fulltext_query, search_utils.py:59-76)
"""

from __future__ import annotations

import re
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.functions.text import tokenize

MAX_QUERY_LENGTH = 32  # reference search_utils.py:56
BM25_K1 = 1.2
BM25_B = 0.75

_SEARCH_TEXT = {
    "edge": lambda df: F.concat_ws(" ", df["name"], df["fact"]),
    "node": lambda df: F.concat_ws(" ", df["name"], df["summary"]),
    "episode": lambda df: df["content"],
    "community": lambda df: df["name"],
}


def build_postings(graph: dict[str, DataFrame]) -> DataFrame:
    """Materialize the postings table for all present kinds; one shuffle
    per kind (groupBy (doc, term)), unioned."""
    parts = []
    kind_table = {"edge": "edges", "node": "nodes", "episode": "episodes",
                  "community": "communities"}
    for kind, table in kind_table.items():
        if table not in graph:
            continue
        df = graph[table]
        toks = df.select(
            F.lit(kind).alias("kind"),
            F.col("uuid").alias("doc_uuid"),
            "group_id",
            tokenize(_SEARCH_TEXT[kind](df)).alias("toks"),
        ).withColumn("doc_len", F.size("toks"))
        parts.append(
            toks.select("kind", "doc_uuid", "group_id", "doc_len",
                        F.explode("toks").alias("term"))
            .groupBy("kind", "doc_uuid", "group_id", "doc_len", "term")
            .agg(F.count("*").cast("int").alias("tf"))
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out.select("kind", "term", "doc_uuid", "group_id", "tf", "doc_len")


def build_doc_stats(postings: DataFrame) -> DataFrame:
    """Materialize per-(kind, group) corpus stats next to the postings —
    the same "materialized view" move as the postings themselves. BM25
    needs (n_docs, avg_len) for the query scope; storing per-group
    (n_docs, sum_len) lets any group_ids subset be answered by a tiny
    re-aggregation of this table instead of a full postings scan per
    query (the measured scale-killer: a distinct+agg over all postings
    on every call)."""
    return (
        postings.select("kind", "group_id", "doc_uuid", "doc_len").distinct()
        .groupBy("kind", "group_id")
        .agg(F.count("*").alias("n_docs"), F.sum("doc_len").alias("sum_len"))
    )


@dataclass
class PostingsIndex:
    """Postings + precomputed doc stats, built once per graph state
    (KGSpark.postings()); the reference's Lucene index analogue."""

    postings: DataFrame
    doc_stats: DataFrame

    def persist(self) -> "PostingsIndex":
        self.postings.persist()
        self.doc_stats.persist()
        return self

    def unpersist(self) -> None:
        self.postings.unpersist()
        self.doc_stats.unpersist()


def build_index(graph: dict[str, DataFrame]) -> PostingsIndex:
    postings = build_postings(graph)
    return PostingsIndex(postings, build_doc_stats(postings))


def refresh_postings_groups(spark: SparkSession, store, groups: DataFrame,
                            parts: list[int] | None = None,
                            group_list: list[str] | None = None,
                            graph_frames: dict | None = None) -> int:
    """Incrementally maintain the materialized ``postings`` / ``doc_stats``
    store tables for the given group_ids: rebuild the touched groups'
    postings from the (already-spliced) graph tables — scans pruned to
    those groups' ``gpart`` partitions — and splice them over the
    previous index state (store.splice_groups, the Iceberg
    overwritePartitions emulation).

    This is the Spark analogue of the reference keeping its Lucene
    fulltext indexes current on every save (the indexes are DDL'd once,
    graph_data_operations.py:73-82, and every node/edge/episode MERGE
    updates them): per-ingest-batch index IO is O(touched partitions),
    never O(corpus). Postings are group-partitionable by construction —
    every document (edge/node/episode/community) belongs to exactly one
    group — so a group splice is exact.

    Returns rows written into the touched postings partitions."""
    if parts is None:
        parts = store.group_parts(groups)
    # group_list (point-update fast path): literal IN-filter pushed to
    # the scan instead of a broadcast semi-join — saves one broadcast-
    # exchange driver job per action on each of these lineages
    keep_groups = (
        (lambda df: df.where(F.col("group_id").isin(group_list)))
        if group_list is not None
        else (lambda df: df.join(F.broadcast(groups), "group_id", "left_semi")))
    kind_table = {"edge": "edges", "node": "nodes", "episode": "episodes",
                  "community": "communities"}
    # ``graph_frames``: the caller (reassemble_groups) already holds the
    # rebuilt touched-group rows in memory — identical to what a pruned
    # post-splice disk read would return — so passing them (a) skips the
    # re-read jobs and (b) removes the data dependency on the graph-table
    # splices, letting this refresh run CONCURRENTLY with them (postings/
    # doc_stats are disjoint store tables). Kinds absent from the dict
    # (communities — rebuilt on a separate lifecycle) still come from the
    # pruned disk read, exactly as before.
    graph_frames = graph_frames or {}
    graph = {}
    for table in kind_table.values():
        if table in graph_frames:
            graph[table] = graph_frames[table]
        elif store.exists(table):
            graph[table] = keep_groups(store.read_parts(spark, table, parts))
    if not graph:
        return 0
    n = store.splice_groups(spark, "postings", build_postings(graph), groups,
                            parts=parts, group_list=group_list)
    # doc_stats from the just-written postings files (pruned read), not
    # from the lazy build_postings frame — that would re-run tokenization
    stats = build_doc_stats(
        keep_groups(store.read_parts(spark, "postings", parts)))
    store.splice_groups(spark, "doc_stats", stats, groups, parts=parts,
                        group_list=group_list)
    return n


def read_index(spark: SparkSession, store) -> PostingsIndex | None:
    """The incrementally-maintained index, if the store has one (facade
    ingest paths keep it current via ``refresh_postings_groups``);
    None → caller falls back to a full in-memory build."""
    if store.exists("postings") and store.exists("doc_stats"):
        return PostingsIndex(store.read(spark, "postings"),
                             store.read(spark, "doc_stats"))
    return None


def query_terms(query: str) -> list[str]:
    return [t for t in re.split(r"[^a-z0-9]+", query.lower()) if t]


def bm25_search(
    spark: SparkSession,
    postings: DataFrame | PostingsIndex,
    kind: str,
    query: str,
    group_ids: list[str] | None = None,
    limit: int = 20,
) -> DataFrame:
    """Top-`limit` (doc_uuid, score) for `query` within `kind` —
    the reference fetches 2*limit per method upstream (search.py:181-195);
    callers pass that in. Empty result for >32-term queries.

    Pass a ``PostingsIndex`` (what ``KGSpark.postings()`` returns) to use
    the materialized doc stats; a bare postings DataFrame falls back to
    computing stats inline (a full scoped-postings scan per query — fine
    for tests, wrong at scale)."""
    doc_stats = None
    if isinstance(postings, PostingsIndex):
        doc_stats = postings.doc_stats
        postings = postings.postings
    terms = query_terms(query)
    if not terms or len(terms) > MAX_QUERY_LENGTH:
        return spark.createDataFrame([], "uuid string, score double")

    scoped = postings.where(F.col("kind") == kind)
    if group_ids:
        scoped = scoped.where(F.col("group_id").isin(group_ids))

    # corpus stats as a broadcast 1-row frame — single lazy plan, no collect
    if doc_stats is not None:
        s = doc_stats.where(F.col("kind") == kind)
        if group_ids:
            s = s.where(F.col("group_id").isin(group_ids))
        stats = s.agg(
            F.sum("n_docs").cast("double").alias("n_docs"),
            (F.sum("sum_len") / F.sum("n_docs")).cast("double").alias("avg_len"),
        )
    else:
        # (avg doc len from distinct docs, not postings rows)
        stats = scoped.select("doc_uuid", "doc_len").distinct().agg(
            F.count("*").cast("double").alias("n_docs"), F.avg("doc_len").alias("avg_len")
        )
    q = scoped.where(F.col("term").isin(terms))
    dfreq = q.groupBy("term").agg(F.countDistinct("doc_uuid").alias("df"))
    idf = F.log(F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5))
    tf_norm = (F.col("tf") * (BM25_K1 + 1)) / (
        F.col("tf") + BM25_K1 * (1 - BM25_B + BM25_B * F.col("doc_len") / F.col("avg_len"))
    )
    return (
        q.join(F.broadcast(dfreq), "term")
        .crossJoin(F.broadcast(stats))
        .withColumn("contrib", idf * tf_norm)
        .groupBy("doc_uuid")
        .agg(F.sum("contrib").alias("score"))
        .withColumnRenamed("doc_uuid", "uuid")
        .orderBy(F.desc("score"), "uuid")
        .limit(limit)
    )
