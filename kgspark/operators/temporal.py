"""Bi-temporal invalidation operators T1-T3 (SURVEY §2.4).

The reference resolves contradictions per-new-edge: fetch candidates
sharing an endpoint (search_utils.py:819-883), LLM/pure-Python overlap
test, then ``edge.invalid_at = new.valid_at; edge.expired_at = now``
(edge_operations.py:364-394). As batch dataflow this is exactly a
window pass: partition facts by their contradiction key, order by
effective time (coalesce(valid_at, warc_ts)), and close each run of
equal value at the start of the next differing run.

Deterministic contradiction predicate (T3 stand-in for the LLM variant,
temporal_operations.py:74-101):
- AFFECT class: {LIKES,LOVES}=pos vs {DISLIKES,HATES}=neg on the same
  (src,dst) — polarity flip contradicts (the reference's own
  Alice-likes/dislikes-Bob fixture, test_temporal_operations_int.py:94-120)
- TRUST class: TRUSTS vs DISTRUSTS; SUPPORT class: SUPPORTS vs OPPOSES
- functional predicates (one object at a time per subject):
  LIVES_IN / WORKS_AT / WORKS_FOR / REPORTS_TO / MOVED_TO / IS_*_OF —
  new object supersedes the old
- role predicates IS_*_OF are also inverse-functional: a new holder of
  the same (pred, obj) supersedes the previous holder

Each pass = one shuffle on its partition key; passes compose (they only
tighten invalid_at; ordering keys never change). Skew note: hot
entities (celebrity pages) concentrate in single (group, src, pred)
partitions — the window itself is O(run) per partition and AQE handles
shuffle-size skew; pathological single-key explosions are bounded
upstream by D9's per-(src,dst,pred) collapse.
"""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

POS_AFFECT = ("LIKES", "LOVES")
NEG_AFFECT = ("DISLIKES", "HATES")
CLASSES = {  # pred -> (class, polarity value)
    **{p: ("AFFECT", "pos") for p in POS_AFFECT},
    **{p: ("AFFECT", "neg") for p in NEG_AFFECT},
    "TRUSTS": ("TRUST", "pos"), "DISTRUSTS": ("TRUST", "neg"),
    "SUPPORTS": ("SUPPORT", "pos"), "OPPOSES": ("SUPPORT", "neg"),
}
FUNCTIONAL_PREDS = ("LIVES_IN", "WORKS_AT", "WORKS_FOR", "REPORTS_TO", "MOVED_TO")


def _class_expr():
    mapping = F.create_map(*[F.lit(x) for kv in CLASSES.items() for x in (kv[0], kv[1][0])])
    return F.element_at(mapping, F.col("pred"))


def _polarity_expr():
    mapping = F.create_map(*[F.lit(x) for kv in CLASSES.items() for x in (kv[0], kv[1][1])])
    return F.element_at(mapping, F.col("pred"))


def _is_functional():
    return F.col("pred").isin(*FUNCTIONAL_PREDS) | (
        F.col("pred").startswith("IS_") & F.col("pred").endswith("_OF")
    )


def _close_runs(df: DataFrame, part_cols: list, value_col, now_col, t_col="_t",
                pre_partitioned: bool = False) -> DataFrame:
    """Core T2 window pass: within each partition (ordered by effective
    time), a row's run of equal `value` is closed by the start time of
    the next run with a different value → tighten invalid_at, stamp
    expired_at (transaction-time end) when this pass changed it.

    ``pre_partitioned``: the caller already holds an explicit hash
    partitioning on a PREFIX of ``part_cols`` (e.g. group_id) — that
    satisfies the Window's ClusteredDistribution for every pass, so all
    passes share ONE exchange and each adds only a partition-local sort
    (invalidate_edges uses this to run 3 passes on 1 shuffle)."""
    if not pre_partitioned:
        # Explicit data-sized hash repartition on the window keys: it
        # satisfies the Window's required ClusteredDistribution, so
        # Catalyst plans NO additional exchange — this replaces the
        # implicit window shuffle rather than adding one. The point is
        # the explicit numPartitions, which is exempt from AQE
        # coalescing: byte-based coalescing collapsed the slim frame to
        # a single partition and ran the window serially (measured 4s
        # single-task at 20k docs); window sort CPU is invisible to
        # byte sizing.
        n_parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions", "32"))
        df = df.repartition(n_parts, *part_cols)
    w = Window.partitionBy(*part_cols).orderBy(t_col, "uuid")
    changed = (
        F.when(F.lag(value_col).over(w).isNull(), F.lit(1))
        .when(F.lag(value_col).over(w) != value_col, F.lit(1))
        .otherwise(F.lit(0))
    )
    # Runs are contiguous in the sort, so the start of the next differing
    # run = the earliest boundary row (_chg=1) strictly after this row.
    # Both windows share one partitioning+sort → a single shuffle, no
    # groupBy/re-join (this pass used to cost 3 shuffles).
    out = df.withColumn("_chg", changed).withColumn(
        "_next_start",
        F.min(F.when(F.col("_chg") == 1, F.col(t_col))).over(
            w.rowsBetween(1, Window.unboundedFollowing)),
    )
    tightened = F.when(
        F.col("_next_start").isNotNull()
        & (F.col("invalid_at").isNull() | (F.col("_next_start") < F.col("invalid_at"))),
        F.col("_next_start"),
    )
    return (
        out.withColumn("expired_at",
                       F.when(tightened.isNotNull(), now_col).otherwise(F.col("expired_at")))
        .withColumn("invalid_at", F.coalesce(tightened, F.col("invalid_at")))
        .drop("_chg", "_next_start")
    )


def invalidate_edges(edges: DataFrame, now: datetime | None = None,
                     n_edges: int | None = None,
                     slim_threshold: int = 1_000_000,
                     pre_partition: bool = True) -> DataFrame:
    """T2 over a deduped edge set. Expects columns: uuid, group_id,
    source_node_uuid, target_node_uuid, pred, valid_at, invalid_at,
    ref_ts (the earliest supporting episode's warc_ts). Adds/updates
    invalid_at + expired_at.

    CONTRACT: ``uuid`` must be unique and non-null (what D9 dedupe_edges
    emits — its uuid is min() over a groupBy key). The slim projection's
    join-back is an inner equi-join on uuid, so a null uuid row would be
    dropped and a duplicated uuid would multiply rows; callers passing
    edges that did not come through dedupe_edges must dedupe first.

    The three window passes run over a SLIM projection (uuid, keys,
    timestamps — ~60 bytes/row) and the tightened (invalid_at,
    expired_at) pair is joined back to the wide edge rows by uuid at the
    end. Edge rows carry fact text + episode-uuid arrays (~1 KB/row), so
    shuffling the full rows through 3 window exchanges moved ~50× more
    bytes than the decision actually needs — the same slim-shuffle move
    as the LSH band join (BASELINE.md fact 14). Cost: one extra uuid
    join; at cluster scale shuffle bytes are the scarce resource and the
    trade wins by an order of magnitude. Below ``slim_threshold`` rows
    (when the caller supplies ``n_edges``) the projection+join-back is
    skipped and the windows run over the wide rows directly — at small
    inputs the extra uuid join costs more wall than the slim shuffle
    saves (measured crossover documented in BENCH_T2_CROSSOVER.json)."""
    now_col = F.lit(now) if now is not None else F.current_timestamp()
    wide = edges
    if "expired_at" not in wide.columns:
        wide = wide.withColumn("expired_at", F.lit(None).cast("timestamp"))
    # no size hint → assume big (the scale-default); a caller that knows
    # the count (the pipeline counts its persisted dedup output anyway)
    # lets small inputs skip the projection + join-back
    use_slim = n_edges is None or n_edges >= slim_threshold

    is_role = F.col("pred").startswith("IS_") & F.col("pred").endswith("_OF")
    key_cols = [
        F.coalesce("valid_at", "ref_ts").alias("_t"),
        # pass 1 key/value: antonym classes on the same directed (src, dst)
        F.when(
            _class_expr().isNotNull(),
            F.concat_ws("|", "source_node_uuid", "target_node_uuid", _class_expr()),
        ).otherwise(F.concat(F.lit("solo|"), F.col("uuid"))).alias("_k1"),
        _polarity_expr().alias("_v1"),
        # pass 2: functional preds — new object supersedes old per (src, pred)
        F.when(
            _is_functional(), F.concat_ws("|", "source_node_uuid", "pred"),
        ).otherwise(F.concat(F.lit("solo|"), F.col("uuid"))).alias("_k2"),
        F.col("target_node_uuid").alias("_v2"),
        # pass 3: inverse-functional role preds — new holder supersedes per (pred, obj)
        F.when(
            is_role, F.concat_ws("|", "target_node_uuid", "pred"),
        ).otherwise(F.concat(F.lit("solo|"), F.col("uuid"))).alias("_k3"),
        F.col("source_node_uuid").alias("_v3"),
    ]
    if use_slim:
        df = wide.select("uuid", "group_id", "invalid_at", "expired_at", *key_cols)
    else:
        df = wide.select("*", *key_cols)

    # Each pass runs over the FULL set with a per-row-unique partition key
    # for rows the pass doesn't apply to (their singleton window has no
    # next run → no-op). Splitting with where()/union instead would put
    # the whole upstream plan into the tree once per branch — 6 subtree
    # re-evaluations; this way lineage is linear.
    #
    # ONE shuffle for all three passes: the explicit hash repartition on
    # group_id satisfies every pass's ClusteredDistribution(group_id, _k)
    # (equal (group_id, _k) ⇒ equal group_id ⇒ same partition), so each
    # pass adds only a partition-local sort — 3 exchanges + 3 AQE stage
    # materializations collapsed to 1 (the serial per-stage driver cost
    # was the measured end-to-end scaling drag). Explicit numPartitions
    # is AQE-coalesce-exempt (see _close_runs). Skew note: this keys the
    # shuffle by group alone; a single pathologically hot group (one
    # domain = the whole corpus) sorts in one task — for such corpora
    # pass pre_partition=False to fall back to per-pass (group, key)
    # shuffles, which spread the solo rows.
    if pre_partition:
        n_parts = int(df.sparkSession.conf.get(
            "spark.sql.shuffle.partitions", "32"))
        df = df.repartition(n_parts, "group_id")
    for k, v in (("_k1", "_v1"), ("_k2", "_v2"), ("_k3", "_v3")):
        df = _close_runs(df.withColumn("_k", F.col(k)), ["group_id", "_k"],
                         F.col(v), now_col, pre_partitioned=pre_partition)
    df = df.drop("_t", "_k", "_k1", "_v1", "_k2", "_v2", "_k3", "_v3")

    if not use_slim:
        return df.select(*wide.columns)
    slim = df.select("uuid", F.col("invalid_at").alias("_inv"),
                     F.col("expired_at").alias("_exp"))
    return (
        wide.drop("invalid_at", "expired_at")
        .join(slim, "uuid")
        .withColumnRenamed("_inv", "invalid_at")
        .withColumnRenamed("_exp", "expired_at")
        .select(*wide.columns)  # same column order as the wide path
    )


def point_in_time(edges: DataFrame, at) -> DataFrame:
    """T4 validity filter (search_helpers.py:53-59): facts valid at `at` —
    valid_at <= at AND (invalid_at IS NULL OR invalid_at > at)."""
    at_col = F.lit(at)
    return edges.where(
        (F.col("valid_at").isNull() | (F.col("valid_at") <= at_col))
        & (F.col("invalid_at").isNull() | (F.col("invalid_at") > at_col))
    )
