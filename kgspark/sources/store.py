"""Graph-table store S2-S8, S12 (SURVEY §2.1).

Iceberg-shaped API over parquet: the sandbox image has no Iceberg jars
(they'd be a config swap in ``get_spark`` + ``format('iceberg')`` here),
so writes are parquet with url-hash bucket columns — the same physical
layout the north rule asks for (`bucket(N, url_hash)` partitioning).
MERGE-upsert (the reference's Cypher MERGE, node_db_queries.py:17-69) is
emulated with anti-join + union, keyed on uuid.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = ("episodes", "nodes", "edges", "mentions", "communities",
          "community_members", "postings", "checkpoints")

N_BUCKETS = 64


def with_bucket(df: DataFrame, key: str = "uuid", n: int = N_BUCKETS) -> DataFrame:
    """Stable hash bucket for co-located writes/joins (north rule:
    partitioned by url-hash bucket; at cluster scale this becomes the
    Iceberg `bucket(n, key)` partition transform)."""
    return df.withColumn("bucket", F.pmod(F.xxhash64(F.col(key)), F.lit(n)).cast("int"))


class GraphStore:
    def __init__(self, root: str, n_buckets: int = N_BUCKETS):
        self.root = root
        self.n_buckets = n_buckets

    def path(self, table: str) -> str:
        return os.path.join(self.root, table)

    def write(self, table: str, df: DataFrame, mode: str = "overwrite",
              bucket_key: str = "uuid") -> None:
        out = with_bucket(df, bucket_key, self.n_buckets) if bucket_key in df.columns else df
        (out.write.mode(mode).option("compression", "zstd").parquet(self.path(table)))

    def write_all(self, tables: dict[str, DataFrame]) -> None:
        for name, df in tables.items():
            self.write(name, df)

    def read(self, spark: SparkSession, table: str) -> DataFrame:
        df = spark.read.parquet(self.path(table))
        return df.drop("bucket") if "bucket" in df.columns else df

    def exists(self, table: str) -> bool:
        p = self.path(table)
        return os.path.isdir(p) and any(f.endswith(".parquet") for f in os.listdir(p))

    # ---------------------------------------------------------- S2-S4 upsert
    def merge(self, spark: SparkSession, table: str, updates: DataFrame,
              key: str = "uuid") -> None:
        """MERGE INTO emulation: existing rows not in updates ∪ updates.
        With Iceberg this is `MERGE INTO t USING u ON t.uuid = u.uuid
        WHEN MATCHED THEN UPDATE * WHEN NOT MATCHED THEN INSERT *`."""
        if not self.exists(table):
            self.write(table, updates)
            return
        existing = self.read(spark, table)
        kept = existing.join(updates.select(key), key, "left_anti")
        merged = kept.unionByName(updates, allowMissingColumns=True).localCheckpoint()
        self.write(table, merged)

    # ---------------------------------------------------------- S12 delete
    def delete_by_group(self, spark: SparkSession, table: str, group_ids: list[str]) -> None:
        if not self.exists(table):
            return
        df = self.read(spark, table)
        remaining = df.where(~F.col("group_id").isin(group_ids)).localCheckpoint()
        self.write(table, remaining)

    def purge_episode_inputs(self, spark: SparkSession, episode_uuid: str) -> str | None:
        """Delete an episode's rows from the append-only extraction side
        tables (raw_episodes / ext_nodes / ext_edges) so a later
        re-assembly cannot resurrect it. Returns the episode's group_id
        (for targeted re-assembly), or None if the episode has no side
        rows (e.g. graph tables written by a one-shot batch build)."""
        if not self.exists("raw_episodes"):
            return None
        raw = self.read(spark, "raw_episodes")
        hit = raw.where(F.col("uuid") == episode_uuid).select("group_id").take(1)
        if not hit:
            return None
        kept = raw.where(F.col("uuid") != episode_uuid).localCheckpoint()
        self.write("raw_episodes", kept)
        for t in ("ext_nodes", "ext_edges"):
            if self.exists(t):
                rem = self.read(spark, t).where(
                    F.col("episode_uuid") != episode_uuid).localCheckpoint()
                self.write(t, rem)
        return hit[0]["group_id"]

    def remove_episode(self, spark: SparkSession, episode_uuid: str) -> None:
        """Cascading delete (reference graphiti.py:776-805): drop the
        episode, its mentions, edges only it supports, and orphan nodes."""
        episodes = self.read(spark, "episodes").where(F.col("uuid") != episode_uuid)
        mentions = self.read(spark, "mentions").where(F.col("episode_uuid") != episode_uuid)
        edges = self.read(spark, "edges")
        edges = (
            edges.withColumn("episodes", F.array_remove("episodes", episode_uuid))
            .where(F.size("episodes") > 0)
        )
        nodes = self.read(spark, "nodes")
        live = mentions.select(F.col("entity_uuid").alias("uuid")).distinct()
        nodes = nodes.join(live, "uuid", "left_semi")
        # materialize EVERY frame before overwriting ANY table — nodes'
        # lineage reads the mentions files the loop would have replaced
        frames = [(name, df.localCheckpoint()) for name, df in
                  [("episodes", episodes), ("mentions", mentions),
                   ("edges", edges), ("nodes", nodes)]]
        for name, df in frames:
            self.write(name, df)


# ------------------------------------------------------------------ S7/S8
def get_by_uuids(df: DataFrame, uuids: list[str]) -> DataFrame:
    """Point lookups (reference nodes.py:178-228 et al.) — an IN filter the
    scan pushes down; for large probe lists use a broadcast semi-join."""
    return df.where(F.col("uuid").isin(uuids))


def get_by_group_ids(
    df: DataFrame, group_ids: list[str], limit: int | None = None,
    uuid_cursor: str | None = None,
) -> DataFrame:
    """Keyset pagination ORDER BY uuid DESC (reference nodes.py:230-269)."""
    out = df.where(F.col("group_id").isin(group_ids))
    if uuid_cursor:
        out = out.where(F.col("uuid") < uuid_cursor)
    out = out.orderBy(F.desc("uuid"))
    return out.limit(limit) if limit else out
