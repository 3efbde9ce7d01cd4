"""Incremental ingest — the Spark restatement of the reference's
`add_episode` point-update path (graphiti.py:267-484) as a micro-batch
job (SURVEY §2.7 "Streaming": the reference has no stream engine, just
an external queue feeding add_episode one at a time;
server/graph_service/routers/ingest.py:17-52).

Design (materialized-incremental-view pattern):

- Per-episode extraction results are **append-only side tables**
  (``ext_nodes``/``ext_edges``) — extraction is deterministic per
  episode, so it runs exactly once per new page (the expensive pandas-UDF
  stage is never repeated).
- The graph tables (``nodes``/``edges``/``mentions`` + episode
  entity_edges backfill) are a deterministic aggregation of those side
  tables, partitioned by ``group_id``. A new batch only perturbs the
  groups it touches, so we re-assemble **affected groups only** from the
  stored extraction rows and splice them over the previous table state.

This gives exact convergence: after any sequence of batches, every table
is byte-identical to a one-shot ``build_graph`` over the union of all
pages (tested in tests/test_streaming.py) — i.e. the incremental path
has full `add_episode` semantics including D5 resolution against the
existing graph (dedup within re-assembled group) and T2 re-invalidation,
which the reference's own bulk path skips (graphiti.py:520-522).

At cluster scale: affected-group splice = Iceberg
``overwritePartitions`` on the group-hash partition
(`GraphStore.splice_groups`) — per-batch IO is O(affected
partitions), never O(corpus): side-table scans, the idempotence
anti-join, and the graph-table rewrite are all pruned to the batch's
``gpart=`` partitions (unaffected partition files are neither read
nor rewritten; asserted via file mtimes in
tests/test_checkpoint_streaming.py).
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from kgspark.operators.extract import pages_to_episodes, run_extraction
from kgspark.pipeline import assemble_graph
from kgspark.sources.store import GraphStore

EXT_TABLES = ("ext_nodes", "ext_edges", "raw_episodes")
GRAPH_TABLES = ("episodes", "nodes", "edges", "mentions")


def ingest_pages(
    spark: SparkSession,
    store: GraphStore,
    pages: DataFrame,
    now: datetime | None = None,
    embed_dim: int = 64,
    entity_types: dict | None = None,
) -> dict[str, int]:
    """One micro-batch: extract new pages once, append extraction side
    tables, re-assemble affected groups, splice graph tables."""
    ext = run_extraction(pages_to_episodes(pages))
    episodes, ext_nodes, ext_edges = ext.episodes, ext.ext_nodes, ext.ext_edges

    # idempotence / exactly-once per url: drop episodes already ingested
    # (stream restarts can redeliver a batch). A redelivered episode has
    # the same group_id, so scanning only the batch's gpart partitions
    # sees every possible duplicate — O(touched partitions), not O(corpus).
    if store.exists("raw_episodes"):
        batch_parts = store.group_parts(episodes.select("group_id").distinct())
        seen = store.read_parts(spark, "raw_episodes", batch_parts).select("uuid")
        episodes = episodes.join(seen, "uuid", "left_anti")
    # eager localCheckpoint severs lineage BEFORE we append to
    # raw_episodes — otherwise the anti-join above re-reads the table we
    # just appended this very batch to and filters everything out. This
    # job also materializes run_extraction's shared persist, so the two
    # ext appends below read the cache directly — appending them without
    # their own checkpoints saves 2 driver jobs per batch (jobs are wall
    # time at point-update sizes, BASELINE fact 24).
    episodes = episodes.localCheckpoint()
    new_uuids = episodes.select(F.col("uuid").alias("episode_uuid"))
    ext_nodes = ext_nodes.join(F.broadcast(new_uuids), "episode_uuid", "left_semi")
    ext_edges = ext_edges.join(F.broadcast(new_uuids), "episode_uuid", "left_semi")

    n_new = episodes.count()
    if n_new == 0:
        ext.cached.unpersist()
        return {"new_episodes": 0}

    store.append_grouped("raw_episodes", episodes, bucket_key="uuid")
    store.append_grouped("ext_nodes", ext_nodes, bucket_key="uuid")
    store.append_grouped("ext_edges", ext_edges, bucket_key="uuid")
    # side tables are on disk now; reassembly reads them back, so the
    # extraction cache is dead weight from here (and a long-running
    # stream must not accumulate one dead cache per micro-batch)
    ext.cached.unpersist()

    groups = episodes.select("group_id").distinct().localCheckpoint()
    counts = {"new_episodes": n_new}
    counts.update(reassemble_groups(spark, store, groups, now, embed_dim,
                                    entity_types))
    return counts


def reassemble_groups(
    spark: SparkSession,
    store: GraphStore,
    groups: DataFrame,
    now: datetime | None = None,
    embed_dim: int = 64,
    entity_types: dict | None = None,
) -> dict[str, int]:
    """Rebuild the graph tables for the given group_ids from the stored
    per-episode extraction side tables and splice them over the previous
    state (no re-extraction — summary_text persisted with raw_episodes).
    Shared by batch ingest and add_triplet."""
    parts = store.group_parts(groups)
    # gpart prune cuts the scan to the touched partitions; the semi-join
    # then drops hash-collision co-tenants of those partitions.
    all_eps = store.read_parts(spark, "raw_episodes", parts).join(
        F.broadcast(groups), "group_id", "left_semi")
    all_nodes = store.read_parts(spark, "ext_nodes", parts).join(
        F.broadcast(groups), "group_id", "left_semi")
    all_edges = store.read_parts(spark, "ext_edges", parts).join(
        F.broadcast(groups), "group_id", "left_semi")
    g = assemble_graph(all_eps, all_nodes, all_edges, embed_dim, now,
                       entity_types=entity_types)
    counts = {t: store.splice_groups(spark, t, g[t], groups, parts=parts)
              for t in GRAPH_TABLES}
    # keep the materialized fulltext index current (the reference's
    # Lucene indexes update on every save) — same splice machinery, so
    # per-batch index IO is also O(touched partitions)
    from kgspark.search.fulltext import refresh_postings_groups

    counts["postings"] = refresh_postings_groups(spark, store, groups,
                                                 parts=parts)
    return counts
