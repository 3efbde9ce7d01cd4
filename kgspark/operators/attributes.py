"""E4: custom entity types, typed attribute fill, fact-derived summaries
(SURVEY §2.2).

The reference builds a dynamic Pydantic model per entity type and has an
LLM fill typed attributes plus a <250-word summary from the node's
context (node_operations.py:449-536), with field-collision validation
against the base EntityNode fields (utils/ontology_utils/
entity_types_utils.py:23-37) and example custom types in
models/nodes/custom_entity_types.py:26-151.

Deterministic Spark restatement: a node's context is the set of facts on
its edges, so
- a typed field declares WHERE its value lives: ``from_pred`` (the
  object of the node's newest still-valid outgoing edge with that
  predicate — e.g. Person.employer ← WORKS_AT), ``from_pred_inverse``
  (subject of an incoming edge — e.g. Organization.top_employee), or
  ``pattern`` (a regex with one capture group over the concatenated
  fact text);
- the entity type itself, when extraction didn't assign one, is
  inferred from the node's predicate signature (subject of WORKS_AT /
  LIVES_IN → Person; object of WORKS_AT → Organization; object of
  LIVES_IN / MOVED_TO → Place);
- the summary is the node name plus its most recent facts, truncated to
  250 words (the reference prompt's own bound).

Dataflow: ONE extra shuffle — explode edges to (endpoint uuid, fact
struct), groupBy uuid, sort/slice the collected array with higher-order
functions (no UDF), join back to nodes on uuid.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# base EntityNode fields a typed attribute may not shadow
# (reference EntityNode model, nodes.py; validation entity_types_utils.py:23-37)
RESERVED_NODE_FIELDS = frozenset(
    {"uuid", "name", "group_id", "labels", "created_at", "summary",
     "attributes", "name_embedding", "norm_name"}
)

SUMMARY_MAX_WORDS = 250   # prompt bound, node_operations.py:494
DEFAULT_TOP_K_FACTS = 5


class EntityTypeValidationError(Exception):
    """A custom entity type redefines a base EntityNode field
    (reference errors.py / entity_types_utils.py:23-37)."""

    def __init__(self, type_name: str, field_name: str):
        super().__init__(
            f"entity type '{type_name}' field '{field_name}' collides with a "
            f"base EntityNode field")
        self.type_name = type_name
        self.field_name = field_name


@dataclass(frozen=True)
class EntityField:
    """One typed attribute. Exactly one extractor should be set."""

    name: str
    description: str = ""
    from_pred: str | None = None          # object of newest valid outgoing edge
    from_pred_inverse: str | None = None  # subject of newest valid incoming edge
    pattern: str | None = None            # regex group 1 over fact context


@dataclass(frozen=True)
class EntityType:
    name: str
    description: str = ""
    fields: tuple[EntityField, ...] = ()
    # predicate signature for deterministic type inference: a node gets
    # this label when it is subject of any `as_subject_of` predicate or
    # object of any `as_object_of` predicate.
    as_subject_of: tuple[str, ...] = ()
    as_object_of: tuple[str, ...] = ()


def validate_entity_types(entity_types: dict[str, EntityType] | None) -> bool:
    """Mirror of reference validate_entity_types
    (entity_types_utils.py:23-37): reject field names that shadow base
    EntityNode fields."""
    if entity_types is None:
        return True
    for type_name, etype in entity_types.items():
        for f in etype.fields:
            if f.name in RESERVED_NODE_FIELDS:
                raise EntityTypeValidationError(type_name, f.name)
    return True


# Default ontology — same shape as the reference's example custom types
# (custom_entity_types.py:26-151: optional described fields on top of the
# base node), populated for the predicates this extractor emits.
DEFAULT_ENTITY_TYPES: dict[str, EntityType] = {
    "Person": EntityType(
        name="Person",
        description="A human actor: appears as the subject of affect/"
                    "employment/residence facts.",
        fields=(
            EntityField("employer", "Current employer organization",
                        from_pred="WORKS_AT"),
            EntityField("location", "Current place of residence",
                        from_pred="LIVES_IN"),
            EntityField("role", "Stated role, e.g. 'Attorney General of'",
                        pattern=r"\b(?:is|was|became) (?:the|a|an) ([A-Za-z][A-Za-z ]{2,40}?) of\b"),
        ),
        as_subject_of=("WORKS_AT", "WORKS_FOR", "LIVES_IN", "MOVED_TO",
                       "LIKES", "DISLIKES", "LOVES", "HATES", "TRUSTS",
                       "DISTRUSTS", "REPORTS_TO", "IS_*_OF"),
    ),
    "Organization": EntityType(
        name="Organization",
        description="An employer / institution: object of employment facts.",
        fields=(
            EntityField("notable_member", "Most recently attested member",
                        from_pred_inverse="WORKS_AT"),
        ),
        as_object_of=("WORKS_AT", "WORKS_FOR", "IS_*_OF"),
    ),
    "Place": EntityType(
        name="Place",
        description="A location: object of residence/movement facts.",
        fields=(
            EntityField("notable_resident", "Most recently attested resident",
                        from_pred_inverse="LIVES_IN"),
        ),
        as_object_of=("LIVES_IN", "MOVED_TO"),
    ),
}


def _fact_structs(edges: DataFrame) -> DataFrame:
    """Edges → (uuid, fact struct) per endpoint. Expects the
    post-invalidation temporal frame (pred, fact, subj_name, obj_name,
    valid_at, invalid_at, ref_ts)."""
    t = F.coalesce("valid_at", "ref_ts").alias("t")
    base = edges.select(
        "source_node_uuid", "target_node_uuid", "pred", "fact",
        "subj_name", "obj_name", "invalid_at", t,
    )
    src = base.select(
        F.col("source_node_uuid").alias("uuid"),
        F.struct(
            F.col("t"), F.col("fact"), F.col("pred"),
            F.col("obj_name").alias("other_name"),
            F.lit(True).alias("is_src"),
            F.col("invalid_at").isNull().alias("is_valid"),
        ).alias("f"),
    )
    dst = base.select(
        F.col("target_node_uuid").alias("uuid"),
        F.struct(
            F.col("t"), F.col("fact"), F.col("pred"),
            F.col("subj_name").alias("other_name"),
            F.lit(False).alias("is_src"),
            F.col("invalid_at").isNull().alias("is_valid"),
        ).alias("f"),
    )
    return src.unionByName(dst)


def _newest(filtered) -> F.Column:
    """facts are sorted newest-first; take the first match's other_name.
    F.get (0-based) returns NULL on an empty array — element_at throws
    under ANSI mode."""
    return F.get(filtered, 0)["other_name"]


def extract_attributes(
    nodes: DataFrame,
    edges: DataFrame,
    entity_types: dict[str, EntityType] | None = None,
    top_k_facts: int = DEFAULT_TOP_K_FACTS,
    max_context_facts: int = 64,
) -> DataFrame:
    """E4 (node_operations.py:449-536): per node, fill a real summary
    (name + newest facts, ≤250 words), infer/attach the entity-type
    label, and fill that type's declared attributes. One shuffle
    (groupBy uuid) + one join back to nodes; all per-node logic is
    higher-order array functions — no UDF.

    ``max_context_facts`` bounds the per-node collected context at the
    newest N facts — a celebrity entity on a web corpus can carry
    millions of edges, and an unbounded collect_list would make its row
    gigabytes (the E4 flavor of the hot-key problem). The truncation
    window shares the groupBy's uuid partitioning, so Catalyst reuses
    one exchange — no extra shuffle."""
    from pyspark.sql import Window

    entity_types = DEFAULT_ENTITY_TYPES if entity_types is None else entity_types
    validate_entity_types(entity_types)

    structs = _fact_structs(edges)
    # total order over the full struct (same field order array_sort uses,
    # reversed): with only (t, fact) the cut at _rn == max_context_facts
    # would keep a partition-layout-dependent subset when two facts tie
    # on both — e.g. one clause attached to two edges of a hot node —
    # and hot nodes are exactly where the truncation bites
    w = Window.partitionBy("uuid").orderBy(
        F.desc(F.col("f")["t"]), F.desc(F.col("f")["fact"]),
        F.desc(F.col("f")["pred"]), F.desc(F.col("f")["other_name"]),
        F.desc(F.col("f")["is_src"]), F.desc(F.col("f")["is_valid"]))
    ctx = (
        structs.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= max_context_facts)
        .groupBy("uuid")
        .agg(F.reverse(F.array_sort(F.collect_list("f"))).alias("facts"))
    )  # reverse(array_sort) = newest-first (struct sorts by t first)

    joined = nodes.join(ctx, "uuid", "left")
    facts = F.coalesce(F.col("facts"), F.array().cast(
        "array<struct<t:timestamp,fact:string,pred:string,"
        "other_name:string,is_src:boolean,is_valid:boolean>>"))

    # ---- entity-type inference from the predicate signature
    # (closure FACTORIES, not default-arg lambdas: Spark's lambda builder
    # treats every parameter as a lambda variable, so `lambda x, p=...`
    # would be built as a binary HOF lambda)
    def _dir_pred(preds: tuple[str, ...], want_src: bool):
        plain = [p for p in preds if p != "IS_*_OF"]
        roles = "IS_*_OF" in preds  # role predicates match by shape

        def fn(x):
            side = x["is_src"] if want_src else ~x["is_src"]
            cond = x["pred"].isin(*plain) if plain else F.lit(False)
            if roles:
                cond = cond | (x["pred"].startswith("IS_")
                               & x["pred"].endswith("_OF"))
            return side & cond
        return fn

    label = F.element_at(F.col("labels"), -1)
    inferred = F.lit(None).cast("string")
    # later entries take precedence in the coalesce order → iterate reversed
    for etype in reversed(list(entity_types.values())):
        cond = F.lit(False)
        if etype.as_subject_of:
            cond = cond | F.exists(facts, _dir_pred(etype.as_subject_of, True))
        if etype.as_object_of:
            cond = cond | F.exists(facts, _dir_pred(etype.as_object_of, False))
        inferred = F.when(cond, F.lit(etype.name)).otherwise(inferred)
    # extraction-assigned types (anything beyond the bare 'Entity') win
    node_type = F.when(label != "Entity", label).otherwise(
        F.coalesce(inferred, F.lit("Entity")))
    new_labels = F.array_distinct(F.concat(F.col("labels"), F.array(node_type)))

    # ---- summary: name + newest facts, truncated to 250 words
    top_facts = F.transform(F.slice(facts, 1, top_k_facts), lambda x: x["fact"])
    summary_text = F.concat(F.col("name"), F.lit(": "),
                            F.concat_ws(" ", top_facts))
    summary = F.when(
        F.size(facts) > 0,
        F.array_join(F.slice(F.split(summary_text, " "), 1, SUMMARY_MAX_WORDS), " "),
    ).otherwise(F.col("summary"))

    # ---- typed attribute fill
    def _valid_pred(pred: str, want_src: bool):
        def fn(x):
            side = x["is_src"] if want_src else ~x["is_src"]
            return side & x["is_valid"] & (x["pred"] == pred)
        return fn

    fact_text = F.concat_ws("; ", F.transform(facts, lambda x: x["fact"]))
    attr_entries: list[tuple[F.Column, F.Column]] = []
    for etype in entity_types.values():
        for fld in etype.fields:
            if fld.from_pred:
                val = _newest(F.filter(
                    facts, _valid_pred(fld.from_pred, want_src=True)))
            elif fld.from_pred_inverse:
                val = _newest(F.filter(
                    facts, _valid_pred(fld.from_pred_inverse, want_src=False)))
            elif fld.pattern:
                ext = F.regexp_extract(fact_text, fld.pattern, 1)
                val = F.when(ext != "", ext)
            else:
                continue
            # a field applies only to nodes of its declaring type
            val = F.when(node_type == etype.name, val)
            attr_entries.append((fld.name, val))

    # the same field name may appear on several types (only one can be
    # non-null per node — vals are gated on node_type); fold duplicates
    # so map_from_arrays sees unique keys
    by_name: dict[str, list] = {}
    for name, val in attr_entries:
        by_name.setdefault(name, []).append(val)
    attr_entries = [(F.lit(n), vs[0] if len(vs) == 1 else F.coalesce(*vs))
                    for n, vs in by_name.items()]

    # merge typed fields into the existing attributes map, dropping nulls
    if attr_entries:
        typed = F.map_filter(
            F.map_from_arrays(
                F.array(*[k for k, _ in attr_entries]),
                F.array(*[v for _, v in attr_entries]),
            ),
            lambda k, v: v.isNotNull(),
        )
        attributes = F.map_zip_with(
            F.coalesce(F.col("attributes"),
                       F.create_map().cast("map<string,string>")),
            typed,
            lambda k, v1, v2: F.coalesce(v2, v1),
        )
    else:
        attributes = F.col("attributes")

    return joined.select(
        *[c for c in nodes.columns if c not in ("labels", "summary", "attributes")],
        new_labels.alias("labels"),
        summary.alias("summary"),
        attributes.alias("attributes"),
    ).select(*nodes.columns)
