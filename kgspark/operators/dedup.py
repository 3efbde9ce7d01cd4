"""Deduplication / canonicalization operators D1-D11 (SURVEY §2.3).

The reference dedups with per-chunk LLM calls + embedding dot-products
(bulk_utils.py:291-362, node_operations.py:271-380). We replace that
with deterministic candidate generation — exact normalized name (D1),
acronym/initialism alias, surname-containment alias, MinHash-LSH
shingle similarity (D2) — then connected components over the alias
pair graph, canonical = first occurrence (min (created_at, uuid) —
reference "first wins", bulk_utils.py:283-287), with D4's transitive
closure handled by the CC fixpoint itself.

All joins are equi-joins on derived keys (group_id + alias key / LSH
band) — no cross joins; the CC step is alternating large-star/
small-star (Kiveris et al. 2014) with a proven O(log² n) round bound
(localCheckpoint per round to truncate lineage) plus a driver
union-find fast path for alias graphs under 1M edges.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from kgspark.functions.minhash import char_shingles, lsh_pairs
from kgspark.functions.text import acronym, last_token, norm_name


# ------------------------------------------------------------------ D1
def name_match_uuid_map(ext_nodes: DataFrame) -> DataFrame:
    """D1 (bulk_utils.py:278-288): exact-name dedup, first occurrence wins.
    With content-addressed node uuids (sha1 of group+norm_name) this is
    identity — kept as an explicit operator for parity tests over
    arbitrary uuid inputs: emits (uuid, canonical_uuid)."""
    w = Window.partitionBy("group_id", "norm_name").orderBy("warc_ts", "episode_uuid")
    return (
        ext_nodes.withColumn("canonical_uuid", F.first("uuid").over(w))
        .select("uuid", "canonical_uuid")
        .dropDuplicates(["uuid"])
    )


# ------------------------------------------------------------------ D2
def alias_pairs(nodes: DataFrame, jaccard_threshold: float = 0.55) -> DataFrame:
    """Candidate alias pairs (uuid_a, uuid_b) within group_id from three
    deterministic generators (replacing LLM dedupe_node_list semantics,
    prompts/dedupe_nodes.py:100-107 — alias forms, abbreviations):

    1. acronym:  'SF' == initialism('San Francisco')
    2. surname:  single-token name == last token of a multi-token name;
       ambiguity resolved to the most-mentioned candidate (deterministic
       stand-in for the reference's LLM duplicate_idx pick,
       prompts/dedupe_nodes.py:52-65)
    3. MinHash-LSH over char-3-gram shingles of the normalized name with
       exact-Jaccard verification ('Acme Corp' vs 'Acme Corp.')
    """
    base = nodes.select(
        "uuid", "group_id", "name", "norm_name",
        F.coalesce(
            F.element_at(F.col("attributes"), "mention_count").cast("long"), F.lit(1)
        ).alias("weight"),
        F.size(F.split(F.col("norm_name"), " ")).alias("n_toks"),
    )

    # 1+2. acronym + surname generators FUSED into one equi-join + one
    # ranking window. Both have the same shape — short single-token name
    # matched against a key derived from multi-token names, ambiguity
    # resolved per short name by weight — so each side emits rows tagged
    # with a key TYPE ('a' acronym / 's' surname) and one join on
    # (group_id, ktype, key) covers both. Halves the number of tiny
    # node-level query stages (driver-serial stage-materialization cost
    # was measured at ~0.1-0.2s per stage in this sandbox).
    multi = base.where(F.col("n_toks") >= 2)
    multi_keys = multi.select(
        "group_id", F.col("uuid").alias("uuid_m"), F.col("weight").alias("w_m"),
        F.explode(F.array(
            F.struct(F.lit("a").alias("ktype"), acronym(F.col("name")).alias("key")),
            F.struct(F.lit("s").alias("ktype"),
                     norm_name(last_token(F.col("norm_name"))).alias("key")),
        )).alias("k"),
    ).select("group_id", "uuid_m", "w_m", "k.ktype", "k.key")
    ones = base.where(F.col("n_toks") == 1)
    short_keys = ones.where(
        F.col("name").rlike(r"^[A-Z][A-Z0-9.&]{1,5}$")
    ).select(
        "group_id", F.col("uuid").alias("uuid_s"), F.lit("a").alias("ktype"),
        F.upper(F.regexp_replace("name", r"[^A-Za-z0-9]", "")).alias("key"),
    ).unionByName(ones.select(
        "group_id", F.col("uuid").alias("uuid_s"), F.lit("s").alias("ktype"),
        F.col("norm_name").alias("key"),
    ))
    cand = multi_keys.join(short_keys, ["group_id", "ktype", "key"]).select(
        F.col("uuid_m").alias("id_a"), F.col("uuid_s").alias("id_b"),
        "ktype", F.col("w_m").alias("w"),
    )
    # ambiguous key (two expansions in group) → keep highest-weight, tie min uuid
    w_rk = Window.partitionBy("ktype", "id_b").orderBy(F.desc("w"), "id_a")
    acro_surname = (
        cand.withColumn("_rn", F.row_number().over(w_rk)).where("_rn = 1")
        .select("id_a", "id_b")
    )

    # 3. MinHash-LSH near-identical spellings (64 perms / 16 bands of 4 —
    # permissive recall; exact-Jaccard verify inside lsh_pairs filters)
    sh = base.withColumn("shingles", char_shingles(F.col("norm_name"), 3))
    lsh = lsh_pairs(
        sh, id_col="uuid", shingle_col="shingles", group_col="group_id",
        num_hashes=64, bands=16,
        jaccard_threshold=jaccard_threshold,
    ).select("id_a", "id_b")
    # homonym-split protection (operators/disambig.py): deliberately
    # split nodes carry an IDENTICAL norm_name, which name-shingle LSH
    # would pair at Jaccard 1.0 and merge right back — veto equal-norm-
    # name pairs. A no-op when splitting is off: equal norm_name implies
    # equal uuid by construction (extract.py uuid scheme) and lsh_pairs
    # never emits self-pairs.
    nn = base.select("uuid", "norm_name")
    lsh = (
        lsh.join(nn.withColumnRenamed("uuid", "id_a")
                 .withColumnRenamed("norm_name", "_nn_a"), "id_a")
        .join(nn.withColumnRenamed("uuid", "id_b")
              .withColumnRenamed("norm_name", "_nn_b"), "id_b")
        .where(F.col("_nn_a") != F.col("_nn_b"))
        .select("id_a", "id_b")
    )

    # eagerly materialized: the pair list is tiny (post-verify near-dups)
    # but its lineage is the most expensive subtree in the build, and the
    # downstream consumer (build_uuid_map) probes it with driver-side
    # take/collect actions — lazy evaluation re-ran the acronym/surname
    # joins per action. lsh_pairs is already checkpointed internally;
    # this closes over the union + dropDuplicates as well.
    spark = nodes.sparkSession
    spark.sparkContext.setJobDescription("alias_pairs: union + dedup materialize")
    out = acro_surname.unionByName(lsh).dropDuplicates(["id_a", "id_b"]) \
        .localCheckpoint(eager=True)
    spark.sparkContext.setJobDescription(None)
    return out


# ------------------------------------------------------------------ D2/D4: CC
def _uf_find(parent: dict, x):
    r = x
    while parent[r] != r:
        r = parent[r]
    while parent[x] != r:  # path compression
        parent[x], x = r, parent[x]
    return r


def _df_from_driver(spark, rows, schema):
    """Driver rows → DataFrame via pandas so the Arrow fast path applies:
    plain createDataFrame(list-of-tuples) serializes row-by-row through
    Py4J — measured 5.5s vs 1.2s for 100k 2-string rows — and this cost
    is SERIAL driver time paid identically at every cluster size, i.e.
    pure scaling-efficiency loss."""
    import pandas as pd

    return spark.createDataFrame(
        pd.DataFrame(rows, columns=[f.name for f in schema.fields]), schema)


def _union_find(rows) -> dict:
    """Min-root union-find over (id_a, id_b)-shaped rows; duplicates and
    direction are irrelevant. Returns the parent map (call _uf_find per
    key to resolve roots)."""
    parent: dict = {}
    for row in rows:
        a, b = row[0], row[1]
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = _uf_find(parent, a), _uf_find(parent, b)
        if ra != rb:  # min value becomes the root
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return parent


def connected_components(
    pairs: DataFrame, max_rounds: int = 64, driver_threshold: int = 1_000_000,
    rounds: int | None = None, _stats: dict | None = None,
) -> DataFrame:
    """Alternating large-star/small-star connected components (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii, "Connected Components in
    MapReduce and Beyond", SoCC 2014 — public) over the undirected
    alias-pair graph → (id, comp) — subsumes D4 transitive uuid-map
    compression (bulk_utils.py:387-396): chains a→b→c converge to one
    component, comp = min(id) per component.

    Each round applies large-star (every node links its strictly-larger
    neighbors to the min of its closed neighborhood) then small-star
    (every node links its smaller-or-equal neighbors and itself to that
    min), and stops when the edge set is unchanged — at which point the
    graph is a disjoint set of min-rooted stars that read off directly
    as labels. Unlike the previous min-label+pointer-jump loop (whose
    jump is NOT a guaranteed doubling — a diameter-d path could need d
    rounds on adversarial id orderings; hypothesis found a diameter-7
    mislabeling, test_property pins it), the alternating algorithm has
    a PROVEN O(log² n) round bound regardless of id ordering, so the
    ``max_rounds`` raise is an unreachable backstop rather than a live
    failure mode on deep graphs. Still convergence-checked: raises if
    the cap is somehow hit rather than returning a silently-wrong
    labeling; ``rounds``, if given, overrides max_rounds (legacy
    alias); ``_stats``, if passed, receives {"rounds": k} for tests.
    localCheckpoint truncates lineage per round.

    Small-graph fast path: below ``driver_threshold`` edges the pair
    list fits trivially in driver memory and a union-find beats ~30
    tiny shuffle stages by ~100× wall-clock; the distributed loop is
    the ≥10^9-edge scale path. Both produce comp = min(id) per
    component, so the switch is invisible to callers.

    Threshold memory, measured at exactly 1M edges with worst-case
    all-distinct 40-char sha1 ids (2M nodes): union-find dict + output
    peak 112 MB (tracemalloc); whole-process delta 0.53 GB including
    the collected edge list — ~1-2% of the driver heap this engine
    configures, with ~4 s of driver CPU. A pathological alias graph at
    the threshold therefore cannot OOM the driver; the real cost cap is
    the collect itself, which is why the threshold stays at 1M.

    The fast-path probe is a single ``take(threshold+1)`` on the RAW
    pair list — no symmetrize/distinct/count first. Union-find is
    insensitive to duplicates and edge direction, so pre-deduping only
    added shuffles, and the count+collect pair evaluated the (often
    expensive, LSH-verify-backed) pairs lineage TWICE — measured ~390
    wasted core-s per 20k-doc build. Only the ≥threshold scale path
    re-evaluates pairs, where the extra pass is noise against the
    star loop's own stages."""
    spark = pairs.sparkSession
    id_type = pairs.schema["id_a"].dataType
    spark.sparkContext.setJobDescription("cc: fast-path probe (single take)")
    head = pairs.select("id_a", "id_b").take(driver_threshold + 1)
    spark.sparkContext.setJobDescription(None)
    if not head:
        return spark.createDataFrame(
            [], T.StructType([T.StructField("id", id_type),
                              T.StructField("comp", id_type)]))
    if len(head) <= driver_threshold:
        parent = _union_find(head)
        out = [(k, _uf_find(parent, k)) for k in parent]
        return _df_from_driver(
            spark, out, T.StructType([T.StructField("id", id_type),
                                      T.StructField("comp", id_type)]))
    # canonical unordered-pair representation: (hi, lo), hi > lo, distinct
    stars = (
        pairs.select(F.greatest("id_a", "id_b").alias("hi"),
                     F.least("id_a", "id_b").alias("lo"))
        .where(F.col("hi") != F.col("lo"))
        .distinct()
        .localCheckpoint()
    )
    cap = rounds if rounds is not None else max_rounds
    converged = False
    n_rounds = 0
    for _ in range(cap):
        n_rounds += 1
        # --- large-star: u links every strictly-larger neighbor to
        # m(u) = min(Γ(u) ∪ {u}). Needs the full symmetric neighborhood.
        sym = stars.select(F.col("hi").alias("u"), F.col("lo").alias("v")) \
            .unionByName(stars.select(F.col("lo").alias("u"),
                                      F.col("hi").alias("v")))
        mins = sym.groupBy("u").agg(F.min("v").alias("mn")) \
            .select("u", F.least("mn", "u").alias("m"))
        large = (
            sym.join(mins, "u")
            .where(F.col("v") > F.col("u"))  # larger neighbors only
            .select(F.col("v").alias("hi"), F.col("m").alias("lo"))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
        )
        # --- small-star: on the (hi → lo) orientation every edge already
        # points large→small, so Γ_small(u) = {lo : (u, lo)}; u links
        # each smaller neighbor and itself to m(u) = min(Γ_small ∪ {u}).
        smins = large.groupBy("hi").agg(F.min("lo").alias("m"))
        small = (
            large.join(smins, "hi")
            .select(F.col("lo").alias("hi"), F.col("m").alias("lo"))
            .unionByName(smins.select(F.col("hi"), F.col("m").alias("lo")))
            .where(F.col("hi") != F.col("lo"))
            .distinct()
            .localCheckpoint()
        )
        # fixpoint ⇔ edge set unchanged (a disjoint star set is invariant
        # under both steps); both sides are distinct sets, so two slim
        # anti-join probes decide equality without a full count
        changed = (
            small.join(stars, ["hi", "lo"], "left_anti").limit(1).count()
            + stars.join(small, ["hi", "lo"], "left_anti").limit(1).count()
        )
        stars = small
        if changed == 0:
            converged = True
            break
    if _stats is not None:
        _stats["rounds"] = n_rounds
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge within {cap} rounds — "
            "raise max_rounds (should be unreachable: the alternating "
            "star algorithm is O(log² n) rounds)")
    # converged star set: (child, center) edges; centers label themselves
    return (
        stars.select(F.col("hi").alias("id"), F.col("lo").alias("comp"))
        .unionByName(
            stars.select(F.col("lo").alias("id"), F.col("lo").alias("comp"))
            .distinct())
    )


def build_uuid_map(
    nodes: DataFrame, pairs: DataFrame, driver_threshold: int = 1_000_000
) -> DataFrame:
    """(uuid, canonical_uuid) for every aliased node; canonical = first
    occurrence in the component by (created_at, uuid) — reference
    first-wins (bulk_utils.py:283-287). Identity rows omitted.

    Fast path (pairs ≤ driver_threshold — the same driver-memory budget
    as connected_components, see its docstring for the measured 1M-edge
    footprint): union-find on the driver plus ONE distributed job — a
    broadcast-semi-join collect of created_at for just the aliased ids
    (O(component members), not O(nodes)). The previous all-DataFrame
    formulation (comp ⋈ nodes → groupBy min_by → ⋈ back) was 3 AQE
    queries / ~10 shuffle stages whose fixed per-stage driver cost
    dwarfed the actual work at any corpus size where the alias graph
    fits the driver. The distributed path below is the ≥10^9-pairs
    route and keeps the join formulation."""
    spark = pairs.sparkSession
    sc = spark.sparkContext
    id_type = pairs.schema["id_a"].dataType
    out_schema = T.StructType([T.StructField("uuid", id_type),
                               T.StructField("canonical_uuid", id_type)])
    sc.setJobDescription("uuid_map: pairs take (fast-path probe)")
    head = pairs.select("id_a", "id_b").take(driver_threshold + 1)
    sc.setJobDescription(None)
    if not head:
        return spark.createDataFrame([], out_schema)
    if len(head) <= driver_threshold:
        parent = _union_find(head)
        comp = {k: _uf_find(parent, k) for k in parent}
        ids_df = _df_from_driver(
            spark, [(k,) for k in comp],
            T.StructType([T.StructField("id", id_type)]))
        sc.setJobDescription("uuid_map: created_at lookup (broadcast semi-join collect)")
        meta = (
            nodes.select("uuid", "created_at")
            .join(F.broadcast(ids_df), nodes.uuid == ids_df.id)
            .select("uuid", "created_at")
            .collect()
        )
        sc.setJobDescription(None)
        created = {r["uuid"]: r["created_at"] for r in meta}
        # first-wins key mirrors min_by(id, struct(created_at, id)) with
        # Spark's NULLS-FIRST ascending struct order (created_at is in
        # practice never null — it derives from warc_ts). Ids in `pairs`
        # but absent from `nodes` are skipped entirely — the distributed
        # path's inner join drops them, and the two public paths must
        # agree (pipeline pairs always derive from nodes, so this only
        # matters for direct API callers).
        best: dict = {}
        for u, root in comp.items():
            if u not in created:
                continue
            key = (created[u] is not None, created[u], u)
            if root not in best or key < best[root][0]:
                best[root] = (key, u)
        rows = [(u, best[root][1]) for u, root in comp.items()
                if u in created and u != best[root][1]]
        return _df_from_driver(spark, rows, out_schema)
    comp_df = connected_components(pairs)
    with_meta = comp_df.join(nodes.select("uuid", "created_at"), comp_df.id == nodes.uuid).select(
        "id", "comp", "created_at"
    )
    canon = with_meta.groupBy("comp").agg(
        F.min_by("id", F.struct("created_at", "id")).alias("canonical_uuid")
    )
    return (
        with_meta.join(canon, "comp")
        .select(F.col("id").alias("uuid"), "canonical_uuid")
        .where(F.col("uuid") != F.col("canonical_uuid"))
    )


def apply_uuid_map_nodes(nodes: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """Merge aliased node rows into their canonical row (D3 merge
    semantics, node_operations.py:539-581): canonical row wins name /
    created_at / embedding; alias names recorded in attributes; mention
    counts summed."""
    mapped = (
        nodes.join(F.broadcast(uuid_map), "uuid", "left")
        .withColumn("final_uuid", F.coalesce("canonical_uuid", "uuid"))
    )
    merged = (
        mapped.groupBy("final_uuid")
        .agg(
            F.min_by(
                F.struct("name", "group_id", "labels", "summary", "name_embedding", "norm_name"),
                F.struct("created_at", "uuid"),
            ).alias("first"),
            F.min("created_at").alias("created_at"),
            F.array_sort(F.array_distinct(F.collect_list("name"))).alias("alias_names"),
            F.sum(
                F.coalesce(
                    F.element_at(F.col("attributes"), "mention_count").cast("long"),
                    F.lit(1),
                )
            ).alias("mention_count"),
        )
        .select(
            F.col("final_uuid").alias("uuid"),
            F.col("first.name").alias("name"),
            F.col("first.group_id").alias("group_id"),
            F.col("first.labels").alias("labels"),
            F.col("created_at"),
            F.col("first.summary").alias("summary"),
            F.col("first.name_embedding").alias("name_embedding"),
            F.map_from_arrays(
                F.array(F.lit("mention_count"), F.lit("aliases")),
                F.array(
                    F.col("mention_count").cast("string"),
                    F.concat_ws("|", F.col("alias_names")),
                ),
            ).alias("attributes"),
            F.col("first.norm_name").alias("norm_name"),
        )
    )
    return merged


# ------------------------------------------------------------------ D12
def apply_edge_type_map(
    edges: DataFrame,
    nodes: DataFrame,
    edge_type_map: dict[tuple[str, str], list[str]],
    default_allow: bool = True,
) -> DataFrame:
    """D12 (reference edge_operations.py:299-320; default map
    graphiti.py:369-373): constrain which predicates may connect which
    entity-type pairs. The reference unions allowed types over the
    CROSS-PRODUCT of the endpoints' full labels arrays
    (edge_operations.py:304-320) — so a rule keyed ('Entity','Entity')
    matches every entity pair (labels always start with 'Entity'), and a
    node labeled ['Entity','Order'] matches both 'Entity'- and
    'Order'-keyed rules. A pair is *constrained* iff any label combo has
    a map entry; unconstrained pairs (including edges whose endpoints
    have null/missing labels) fall through per ``default_allow``.

    The map is a tiny driver dict, so the whole lookup compiles to a
    folded ``array_contains`` predicate — two equi-joins to attach the
    endpoints' labels arrays and zero lookup joins, no shuffle of the
    edge set beyond the label attach."""
    # extraction-time frames carry the predicate as `pred`; the final
    # edges table as `name` (reference EntityEdge.name)
    pred = F.col("pred") if "pred" in edges.columns else F.col("name")
    labels = nodes.select("uuid", "labels")
    e = (
        edges.join(F.broadcast(labels.withColumnRenamed("uuid", "source_node_uuid")
                               .withColumnRenamed("labels", "_src_labels")),
                   "source_node_uuid", "left")
        .join(F.broadcast(labels.withColumnRenamed("uuid", "target_node_uuid")
                          .withColumnRenamed("labels", "_tgt_labels")),
              "target_node_uuid", "left")
    )
    allowed = F.lit(False)
    constrained = F.lit(False)
    for (src, tgt), preds in edge_type_map.items():
        m = (
            F.coalesce(F.array_contains(F.col("_src_labels"), src), F.lit(False))
            & F.coalesce(F.array_contains(F.col("_tgt_labels"), tgt), F.lit(False))
        )
        constrained = constrained | m
        if preds:
            allowed = allowed | (m & pred.isin(list(preds)))
    keep = allowed | (~constrained & F.lit(default_allow))
    return e.where(keep).drop("_src_labels", "_tgt_labels")


# ------------------------------------------------------------------ D7/D8/D9
def resolve_edge_pointers(ext_edges: DataFrame, uuid_map: DataFrame) -> DataFrame:
    """D7 (bulk_utils.py:402-426): rewrite edge endpoints through the
    uuid_map. Alias map is small relative to edges → broadcast joins, no
    shuffle of the edge set."""
    m_src = F.broadcast(uuid_map.withColumnRenamed("uuid", "source_node_uuid")
                        .withColumnRenamed("canonical_uuid", "_src_canon"))
    m_dst = F.broadcast(uuid_map.withColumnRenamed("uuid", "target_node_uuid")
                        .withColumnRenamed("canonical_uuid", "_dst_canon"))
    return (
        ext_edges.join(m_src, "source_node_uuid", "left")
        .join(m_dst, "target_node_uuid", "left")
        .withColumn("source_node_uuid", F.coalesce("_src_canon", "source_node_uuid"))
        .withColumn("target_node_uuid", F.coalesce("_dst_canon", "target_node_uuid"))
        .drop("_src_canon", "_dst_canon")
    )


def dedupe_edges(ext_edges: DataFrame, n_salt: int | None = None) -> DataFrame:
    """D8+D9 (bulk_utils.py:469-486, edge_operations.py:550-580): drop
    self-loops, then within (group, src, dst, pred) keep the first fact
    (by valid_at-then-created order) and union episode provenance —
    duplicate ⇒ reuse existing edge + append episode uuid
    (edge_operations.py:450-477). One shuffle on the edge key.

    ``n_salt``: hot-key path (north rule "salted joins for hot
    entities"). A celebrity fact repeated across millions of pages makes
    one (src, dst, pred) key a single-reduce-task straggler that
    map-side combine cannot fix for collect_list. With salt, phase 1
    pre-aggregates per (key, salt) — every min_by is associative and
    episode lists merge by flatten — and phase 2 merges n_salt partials
    per key. Same output (episodes array is sorted at the end either
    way); measured on the skewed corpus in tools/skew_bench.py."""
    no_loops = ext_edges.where(F.col("source_node_uuid") != F.col("target_node_uuid"))
    key = ["group_id", "source_node_uuid", "target_node_uuid", "pred"]
    order = F.struct(
        F.coalesce(F.col("valid_at"), F.col("warc_ts")).alias("t"),
        F.col("warc_ts"),
        F.col("uuid"),
    )
    picks = [("uuid", "uuid"), ("fact", "fact"), ("valid_at", "valid_at"),
             ("invalid_at", "invalid_at"), ("subj_name", "subj_name"),
             ("obj_name", "obj_name")]
    if n_salt is None:
        return no_loops.groupBy(*key).agg(
            *[F.min_by(c, order).alias(a) for c, a in picks],
            F.min("warc_ts").alias("created_at"),
            F.min_by("warc_ts", order).alias("ref_ts"),
            F.array_sort(F.array_distinct(F.collect_list("episode_uuid"))).alias("episodes"),
        )

    from kgspark.functions.skew import with_salt

    # phase 1: partial aggregate per (key, salt) — carries the full order
    # struct so phase 2 can re-run the same argmin over partials
    partial = (
        with_salt(no_loops, n_salt, ["uuid"])
        .groupBy(*key, "_salt")
        .agg(
            F.min(order).alias("_ord"),
            *[F.min_by(c, order).alias(a) for c, a in picks],
            F.min("warc_ts").alias("created_at"),
            F.min_by("warc_ts", order).alias("ref_ts"),
            F.array_distinct(F.collect_list("episode_uuid")).alias("episodes"),
        )
    )
    return (
        partial.groupBy(*key)
        .agg(
            *[F.min_by(a, F.col("_ord")).alias(a) for _, a in picks],
            F.min("created_at").alias("created_at"),
            F.min_by("ref_ts", F.col("_ord")).alias("ref_ts"),
            F.array_sort(F.array_distinct(F.flatten(F.collect_list("episodes"))))
            .alias("episodes"),
        )
    )
