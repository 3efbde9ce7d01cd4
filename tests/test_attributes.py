"""E4 tests: custom entity types, typed attribute fill, fact-derived
summaries (reference node_operations.py:449-536,
entity_types_utils.py:23-37)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from kgspark.operators.attributes import (
    DEFAULT_ENTITY_TYPES,
    EntityField,
    EntityType,
    EntityTypeValidationError,
    validate_entity_types,
)

NOW = datetime(2024, 6, 1)


def test_validate_rejects_reserved_fields():
    bad = {"Thing": EntityType("Thing", fields=(
        EntityField("summary", "collides with base field"),))}
    with pytest.raises(EntityTypeValidationError) as e:
        validate_entity_types(bad)
    assert e.value.type_name == "Thing" and e.value.field_name == "summary"
    assert validate_entity_types(None)
    assert validate_entity_types(DEFAULT_ENTITY_TYPES)


@pytest.fixture(scope="module")
def kg_attr(spark, tmp_path_factory):
    from kgspark.api import KGSpark

    kg = KGSpark(spark, str(tmp_path_factory.mktemp("kgattr")))
    kg.add_episode(
        "ep1", "Alice Johnson lives in Berlin. Alice Johnson works at Acme Corp.",
        reference_time=datetime(2024, 1, 1), group_id="g1", now=NOW)
    kg.add_episode(
        "ep2", "Alice Johnson moved to Paris. Alice Johnson lives in Paris.",
        reference_time=datetime(2024, 3, 1), group_id="g1", now=NOW)
    return kg


def _node(kg, name):
    return kg.graph()["nodes"].where(F.col("name") == name).collect()[0]


def test_person_typed_attributes(kg_attr):
    """Person fields fill from the node's own VALID edges: employer from
    WORKS_AT; location from the newest un-invalidated LIVES_IN (Berlin
    was superseded by Paris via T2, so location must be Paris)."""
    alice = _node(kg_attr, "Alice Johnson")
    assert "Person" in alice["labels"]
    assert alice["attributes"]["employer"] == "Acme Corp"
    assert alice["attributes"]["location"] == "Paris"


def test_summary_is_fact_derived(kg_attr):
    alice = _node(kg_attr, "Alice Johnson")
    assert "Alice Johnson" in alice["summary"]
    # a real fact, not the round-1 "Entity <name>" stub alone
    assert "Paris" in alice["summary"] or "Acme" in alice["summary"]
    assert len(alice["summary"].split(" ")) <= 251


def test_org_and_place_inference(kg_attr):
    acme = _node(kg_attr, "Acme Corp")
    assert "Organization" in acme["labels"]
    assert acme["attributes"]["notable_member"] == "Alice Johnson"
    paris = _node(kg_attr, "Paris")
    assert "Place" in paris["labels"]
    assert paris["attributes"]["notable_resident"] == "Alice Johnson"


def test_custom_type_pattern_field(spark):
    """A user-supplied type with a regex-extracted field (the analogue of
    custom_entity_types.py's described fields)."""
    from kgspark.pipeline import build_graph
    from kgspark.synth import synth_pages

    types = {
        "Person": EntityType("Person", fields=(
            EntityField("role", "stated role",
                        pattern=r"\b(?:is|was|became) (?:the|a|an) ([A-Za-z][A-Za-z ]{2,40}?) of\b"),
        ), as_subject_of=("WORKS_AT", "LIVES_IN", "LIKES", "IS_*_OF")),
    }
    pages = synth_pages(spark, n_docs=60, n_groups=4, seed=42)
    g = build_graph(pages, now=NOW, entity_types=types)
    roles = (g["nodes"].where(F.element_at("attributes", "role").isNotNull())
             .select(F.element_at("attributes", "role").alias("r")).collect())
    assert roles, "at least one role extracted from narrative facts"
    assert any("Attorney General" in r["r"] for r in roles)


def test_empty_registry_keeps_summaries_only(spark):
    from kgspark.pipeline import build_graph
    from kgspark.synth import synth_pages

    pages = synth_pages(spark, n_docs=30, n_groups=2, seed=7)
    g = build_graph(pages, now=NOW, entity_types={})
    attrs = g["nodes"].select(F.map_keys("attributes").alias("k")).collect()
    keys = {k for r in attrs for k in r["k"]}
    assert keys <= {"mention_count", "aliases"}
    # summaries still fact-derived for connected nodes
    assert g["nodes"].where(F.col("summary").contains(": ")).count() > 0
