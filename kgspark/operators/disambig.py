"""Homonym (same-name, different-entity) disambiguation — the
deterministic counterpart of the reference's LLM duplicate judge
(node_operations.py:271-380, which reads entity summaries/context to
decide whether two same-named candidates are the same real entity).

This engine's uuid scheme merges same-normalized-name entities within a
group by construction (extract.py:68; trade-off measured and documented
in SURVEY §8 / tests/test_homonym.py). ``split_homonyms`` adds the
OPT-IN splitting machinery: cluster each name-node's MENTION contexts
into at most two groups and mint separate node uuids when the contexts
are clearly bimodal.

The Spark plumbing here is real and scale-shaped; the discriminative
power comes entirely from the ``embedder`` argument. The engine's
default hash embedder is deterministic NOISE with respect to meaning —
two contexts about different Michael Jordans are no farther apart than
two contexts about the same one — so with the default embedder this
operator should stay off (and the default ``build_graph`` keeps it
off). On a real cluster, plug a semantic model (sentence encoder) in as
``embedder`` and set a validated threshold; the tests inject a
discriminative embedder to prove the dataflow end-to-end.

Scale shape:
- one groupBy(node uuid) ``applyInPandas`` over slim (uuid, episode,
  context-embedding) rows; per-node work is O(n·d) via deterministic
  farthest-point seeding (centroid → farthest → farthest-from-that, a
  2-approximation of the diameter pair) — no pairwise matrix;
- mentions per node capped at ``max_mentions`` (deterministic order) so
  a celebrity name in a hot group cannot blow up one task;
- the resulting split map only contains SPLIT nodes (rare), so the
  pointer rewrite is a broadcast join keyed (old uuid, episode_uuid).

Split-node uuids are content-addressed — sha1 of (group, norm_name,
min episode uuid of the cluster) — so a re-run of the same corpus
yields identical uuids. This is a batch-build option; the incremental
path does not re-split (documented in the kgspark.streaming docstring
contract: batch options must be fixed per store).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from kgspark.functions.embed import embedder_udf
from kgspark.operators.extract import sha1_uuid

SPLIT_MAP_SCHEMA = (
    "uuid string, episode_uuid string, new_uuid string"
)


def split_homonyms(
    ext_nodes: DataFrame,
    episodes: DataFrame,
    threshold: float = 0.5,
    embedder=None,
    embed_dim: int = 64,
    max_mentions: int = 1024,
) -> DataFrame:
    """Mention-level split map (uuid, episode_uuid, new_uuid) for name
    nodes whose mention contexts are bimodal: the farthest-point seed
    pair has cosine < ``threshold``. Nodes with homogeneous contexts
    (or a single mention) emit nothing. ``embedder`` is a
    column-function (text column → array<float> column); defaults to
    the engine hash embedder, which carries no semantic signal — see
    module docstring."""
    embed = embedder or embedder_udf(embed_dim)
    ctx = (
        ext_nodes.select("uuid", "group_id", "norm_name", "episode_uuid")
        .join(
            episodes.select(
                F.col("uuid").alias("episode_uuid"),
                F.coalesce("summary_text", F.lit("")).alias("_ctx_text"),
            ),
            "episode_uuid",
        )
        .withColumn("_ctx", embed(F.col("_ctx_text")))
        .select("uuid", "group_id", "norm_name", "episode_uuid", "_ctx")
    )

    def fn(key, pdf: pd.DataFrame) -> pd.DataFrame:
        empty = pd.DataFrame(columns=["uuid", "episode_uuid", "new_uuid"])
        # deterministic mention order + hot-name cap
        pdf = pdf.sort_values("episode_uuid").head(max_mentions)
        if len(pdf) < 2:
            return empty
        E = np.asarray([np.asarray(e, dtype=np.float64) for e in pdf["_ctx"]])
        norms = np.linalg.norm(E, axis=1)
        norms[norms == 0] = 1.0
        E = E / norms[:, None]
        # farthest-point seeding (ties broken by the episode sort order
        # via argmin/argmax first-hit)
        c = E.mean(axis=0)
        a = int(np.argmin(E @ c))            # farthest from centroid
        b = int(np.argmin(E @ E[a]))         # farthest from a
        if float(E[a] @ E[b]) >= threshold:
            return empty                     # contexts homogeneous
        sim_a, sim_b = E @ E[a], E @ E[b]
        lab = sim_b > sim_a                  # nearest seed (ties → a)
        import hashlib

        group_id = str(pdf["group_id"].iloc[0])
        norm = str(pdf["norm_name"].iloc[0])
        out = []
        for cluster in (False, True):
            eps = pdf["episode_uuid"].to_numpy()[lab == cluster]
            if len(eps) == 0:
                continue
            anchor = min(eps)
            nid = hashlib.sha1(
                f"node:{group_id}:{norm}:{anchor}".encode()).hexdigest()
            out += [(str(pdf["uuid"].iloc[0]), str(e), nid) for e in eps]
        return pd.DataFrame(out, columns=["uuid", "episode_uuid", "new_uuid"])

    return ctx.groupBy("uuid").applyInPandas(fn, SPLIT_MAP_SCHEMA)


def apply_split(
    ext_nodes: DataFrame, ext_edges: DataFrame, split_map: DataFrame
) -> tuple[DataFrame, DataFrame]:
    """Rewrite mention-level node uuids and edge endpoint uuids through
    the (old uuid, episode_uuid) → new_uuid map. The map holds only
    split nodes, so every join broadcasts. Mentions beyond the
    ``max_mentions`` cap keep the first cluster's identity via a
    per-uuid fallback (min new_uuid — deterministic), never a dangling
    old uuid."""
    m = split_map.select(
        F.col("uuid").alias("_ou"),
        F.col("episode_uuid").alias("_oe"),
        F.col("new_uuid").alias("_nu"),
    )
    fb = split_map.groupBy("uuid").agg(F.min("new_uuid").alias("_fb")) \
        .withColumnRenamed("uuid", "_of")

    def rewrite(df: DataFrame, uuid_col: str) -> DataFrame:
        return (
            df.join(F.broadcast(m),
                    (F.col(uuid_col) == F.col("_ou"))
                    & (F.col("episode_uuid") == F.col("_oe")), "left")
            .join(F.broadcast(fb), F.col(uuid_col) == F.col("_of"), "left")
            .withColumn(uuid_col, F.coalesce("_nu", "_fb", F.col(uuid_col)))
            .drop("_ou", "_oe", "_nu", "_of", "_fb")
        )

    nodes = rewrite(ext_nodes, "uuid")
    edges = rewrite(rewrite(ext_edges, "source_node_uuid"),
                    "target_node_uuid")
    # edge uuids embed their endpoint uuids (extract.py) — re-derive so
    # identity stays content-addressed after the rewrite
    edges = edges.withColumn(
        "uuid",
        sha1_uuid(F.lit("edge"), F.col("group_id"),
                  F.col("source_node_uuid"), F.col("pred"),
                  F.col("target_node_uuid"), F.col("episode_uuid"),
                  F.col("idx").cast("string")),
    )
    return nodes, edges
