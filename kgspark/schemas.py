"""Graph-table schemas (SURVEY.md §1.4; reference: graphiti_core/nodes.py,
graphiti_core/edges.py Pydantic models re-expressed as Spark StructTypes).

All timestamps UTC (reference utils/datetime_utils.py:20-42); graph is
horizontally partitioned by ``group_id`` (nodes.py:96, edges.py:60).
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------- input
# BASELINE.json input_hint: Common-Crawl-style web pages, one row = one episode.
PAGES = T.StructType(
    [
        T.StructField("url", T.StringType(), False),
        T.StructField("warc_ts", T.TimestampType(), False),
        T.StructField("html", T.BinaryType(), True),
        T.StructField("text", T.StringType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# ---------------------------------------------------------------- graph tables
# EpisodicNode (reference nodes.py:145-157) + page provenance columns.
EPISODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("source", T.StringType(), True),  # EpisodeType: message|json|text
        T.StructField("source_description", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("entity_edges", T.ArrayType(T.StringType()), True),
        T.StructField("summary_text", T.StringType(), True),
        T.StructField("url", T.StringType(), True),
        T.StructField("warc_ts", T.TimestampType(), True),
        T.StructField("lang", T.StringType(), True),
    ]
)

# EntityNode (reference nodes.py:297-302).
NODES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("labels", T.ArrayType(T.StringType()), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("summary", T.StringType(), True),
        T.StructField("name_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# EntityEdge / RELATES_TO fact triple with bi-temporal quadruple
# (reference edges.py:198-217).
EDGES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("source_node_uuid", T.StringType(), False),
        T.StructField("target_node_uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), False),  # predicate, SCREAMING_SNAKE_CASE
        T.StructField("fact", T.StringType(), True),
        T.StructField("fact_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("episodes", T.ArrayType(T.StringType()), True),
        T.StructField("created_at", T.TimestampType(), True),
        T.StructField("expired_at", T.TimestampType(), True),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("invalid_at", T.TimestampType(), True),
        T.StructField("attributes", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

# EpisodicEdge / MENTIONS (reference edges.py:94-108).
MENTIONS = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("episode_uuid", T.StringType(), False),
        T.StructField("entity_uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# CommunityNode / HAS_MEMBER (reference nodes.py:440-442, edges.py:374-388).
COMMUNITIES = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("name", T.StringType(), True),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("summary", T.StringType(), True),
        T.StructField("name_embedding", T.ArrayType(T.FloatType()), True),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

COMMUNITY_MEMBERS = T.StructType(
    [
        T.StructField("uuid", T.StringType(), False),
        T.StructField("community_uuid", T.StringType(), False),
        T.StructField("entity_uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("created_at", T.TimestampType(), True),
    ]
)

# BM25 materialization (SURVEY Q3 — replaces Lucene fulltext indexes,
# reference graph_data_operations.py:73-82).
POSTINGS = T.StructType(
    [
        T.StructField("kind", T.StringType(), False),  # edge|node|episode|community
        T.StructField("term", T.StringType(), False),
        T.StructField("doc_uuid", T.StringType(), False),
        T.StructField("group_id", T.StringType(), False),
        T.StructField("tf", T.IntegerType(), False),
        T.StructField("doc_len", T.IntegerType(), False),
    ]
)

# Per-partition checkpoint/lineage/metrics (north rule; SURVEY §4 last row).
CHECKPOINTS = T.StructType(
    [
        T.StructField("run_id", T.StringType(), False),
        T.StructField("partition_key", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("input_fingerprint", T.StringType(), True),
        T.StructField("rows_in", T.LongType(), True),
        T.StructField("rows_out", T.LongType(), True),
        T.StructField("metrics", T.MapType(T.StringType(), T.DoubleType()), True),
        T.StructField("status", T.StringType(), False),  # done|failed
        T.StructField("finished_at", T.TimestampType(), True),
    ]
)

# Intermediate: extracted mention (E1 output element; reference
# prompts/extract_nodes.py:25-31 ExtractedEntity).
MENTION_STRUCT = T.StructType(
    [
        T.StructField("name", T.StringType(), False),
        T.StructField("entity_type", T.StringType(), False),
    ]
)

# Intermediate: extracted triple (E2/E3 output element; reference
# prompts/extract_edges.py:25-37 Edge model + resolved dates).
TRIPLE_STRUCT = T.StructType(
    [
        T.StructField("subj", T.StringType(), False),
        T.StructField("pred", T.StringType(), False),
        T.StructField("obj", T.StringType(), False),
        T.StructField("fact", T.StringType(), False),
        T.StructField("valid_at", T.TimestampType(), True),
        T.StructField("invalid_at", T.TimestampType(), True),
    ]
)
