"""Entity-importance centrality over the materialized KG edge table.

The reference (markalosey/graphiti) ranks entities only by mention count
(search_utils.py episode-mentions reranker, covered by Q10); a web-scale
KG additionally needs a link-structure importance signal for entity
canonicalization priority and retrieval boosting. PageRank (Page et al.
1999, public) over the (source_node_uuid -> target_node_uuid) edge set
is the standard choice.

Spark-first iteration shape (the part that must survive 100 TB):

- the EDGE table — the big side — is hash-partitioned on ``src`` ONCE and
  persisted; every iteration's ``ranks ⋈ edges`` join then reuses that
  partitioning, so only the rank vector (one slim row per node) shuffles
  per iteration, never the edges;
- per-edge out-degree weights are precomputed once (one groupBy + one
  join, both on the same ``src`` key → single exchange);
- contributions aggregate with ``groupBy(dst).sum`` — map-side
  combinable, so the shuffle carries at most one partial sum per
  (partition, dst), not one row per edge;
- ``localCheckpoint`` per iteration truncates lineage (same trade-off as
  operators/community.py label_propagation — see PLANS.md note on
  reliable checkpointing for preemptible clusters).

Determinism across engines: distributed double sums are
order-dependent, so a float PageRank can differ in the last ulp between
Spark and DuckDB and break value-hash parity. ``scale`` therefore
selects FIXED-POINT arithmetic: ranks are bigint micro-units
(rank_fp = rank * scale), per-edge contributions use integer division
``rank_fp div out_degree``, and the damping step is
``(1-d)*scale + (d_num * Σcontrib) div d_den`` — bigint sums are exact
and order-independent, so both engines produce IDENTICAL integers.
``scale=None`` gives the conventional double variant (rounded per
iteration to 12 decimals to bound drift).

Dangling nodes (no out-edges) drop their mass — the "simplified
PageRank" variant; ranks then converge to relative importance rather
than a probability distribution, which is what the downstream consumers
(ordering, top-k boost) need.
"""

from __future__ import annotations

from fractions import Fraction

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pagerank(
    edges: DataFrame,
    damping: float = 0.85,
    n_iter: int = 10,
    src: str = "source_node_uuid",
    dst: str = "target_node_uuid",
    scale: int | None = 1_000_000,
    num_partitions: int | None = None,
) -> DataFrame:
    """PageRank over a directed edge list → ``(node, rank_fp, rank)``.

    ``rank_fp`` is the exact fixed-point bigint (null when ``scale`` is
    None); ``rank`` is the double view. Parallel edges count once each
    (multiplicity = weight), matching the C1 projection convention.
    """
    d = Fraction(damping).limit_denominator(10_000)
    d_num, d_den = d.numerator, d.denominator

    e = edges.select(F.col(src).alias("src"), F.col(dst).alias("dst"))
    if num_partitions:
        e = e.repartition(num_partitions, "src")
    else:
        e = e.repartition("src")

    deg = e.groupBy("src").agg(F.count("*").alias("out_deg"))
    # one co-partitioned join: both sides already hashed on src
    e = e.join(deg, "src").persist()
    e.count()  # materialize so every iteration reuses the same blocks

    nodes = (
        e.select("src").withColumnRenamed("src", "node")
        .unionByName(e.select("dst").withColumnRenamed("dst", "node"))
        .distinct()
        .localCheckpoint()
    )

    # one iteration skeleton, two arithmetic modes
    if scale is not None:
        base = int(round((1 - damping) * scale))
        rank_col = "rank_fp"
        init = F.lit(int(scale)).cast("long")
        contrib = F.expr("rank_fp div out_deg")
        update = (F.lit(base)
                  + F.expr(f"({d_num} * coalesce(s, 0L)) div {d_den}")
                  ).cast("long")
    else:
        rank_col = "rank"
        init = F.lit(1.0)
        contrib = F.col("rank") / F.col("out_deg")
        update = F.round(
            F.lit(1 - damping) + F.lit(damping) * F.coalesce("s", F.lit(0.0)), 12)

    ranks = nodes.withColumn(rank_col, init)
    for _ in range(n_iter):
        contribs = (
            e.join(ranks.withColumnRenamed("node", "src"), "src")
            .select("dst", contrib.alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        ranks = (
            nodes.join(contribs, nodes["node"] == contribs["dst"], "left")
            .select("node", update.alias(rank_col))
            .localCheckpoint()
        )

    if scale is not None:
        out = ranks.select(
            "node", "rank_fp",
            (F.col("rank_fp") / F.lit(float(scale))).alias("rank"),
        )
    else:
        out = ranks.select("node", F.lit(None).cast("long").alias("rank_fp"), "rank")

    e.unpersist()
    return out


def pagerank_oracle_sql(
    edges_sql: str,
    damping: float = 0.85,
    n_iter: int = 10,
    scale: int = 1_000_000,
) -> str:
    """ANSI-SQL replay of the FIXED-POINT path: the iterations unrolled
    as chained CTEs (same technique as the C2 label-propagation oracle).
    ``edges_sql`` must yield columns (src, dst). Returns (node, rank_fp)
    ordered by node — exact bigint parity with :func:`pagerank`.
    """
    d = Fraction(damping).limit_denominator(10_000)
    base = int(round((1 - damping) * scale))
    parts = [
        f"WITH e AS ({edges_sql})",
        "deg AS (SELECT src, COUNT(*) AS out_deg FROM e GROUP BY src)",
        "nodes AS (SELECT src AS node FROM e UNION SELECT dst FROM e)",
        f"r0 AS (SELECT node, CAST({scale} AS BIGINT) AS rank_fp FROM nodes)",
    ]
    for i in range(n_iter):
        parts.append(
            f"r{i + 1} AS (SELECT n.node, CAST({base} + "
            f"({d.numerator} * COALESCE(c.s, 0)) // {d.denominator} AS BIGINT) AS rank_fp "
            f"FROM nodes n LEFT JOIN ("
            f"SELECT e.dst, SUM(r.rank_fp // deg.out_deg) AS s "
            f"FROM e JOIN r{i} r ON r.node = e.src "
            f"JOIN deg ON deg.src = e.src GROUP BY e.dst) c ON c.dst = n.node)"
        )
    return (", ".join(parts)
            + f" SELECT node, rank_fp FROM r{n_iter} ORDER BY node")
