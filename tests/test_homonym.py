"""Homonym (same-name, different-entity) stress eval — VERDICT r3 item 8.

The reference separates two "Michael Jordan"s with an LLM judge during
dedup (node_operations.py:271-380: the duplicate decision reads entity
summaries/context). This engine's deterministic scheme cannot: node
uuid = sha1("node", group_id, norm_name) (operators/extract.py:68), so
two distinct people with the same normalized name IN THE SAME GROUP
merge by construction. These tests MEASURE the damage (conflation +
the false T2 invalidation it induces) and pin the boundary conditions
where it does NOT occur — different groups, or different surface names
— so the trade-off documented in SURVEY §8 stays true as the code
evolves.
"""

from datetime import datetime, timedelta

import pandas as pd
import pytest

from kgspark.pipeline import build_graph
from kgspark.schemas import PAGES

NOW = datetime(2024, 6, 1)


def _pages(spark, rows):
    return spark.createDataFrame(
        pd.DataFrame([
            {"url": u, "warc_ts": ts, "html": None, "text": t, "lang": "en"}
            for u, ts, t in rows
        ]), PAGES)


def _graph(spark, rows):
    g = build_graph(_pages(spark, rows), now=NOW)
    nodes = g["nodes"].collect()
    edges = g["edges"].collect()
    return nodes, edges


def test_homonym_same_group_conflates_and_falsely_invalidates(spark):
    """Two different people named Michael Jordan in ONE group: the
    engine merges them into a single node, and T2's functional-predicate
    pass then closes person A's employer when person B's (unrelated)
    employer fact arrives — a FALSE invalidation. This is the measured
    damage of the deterministic name-keyed uuid scheme; the reference's
    LLM dedup would keep them apart."""
    rows = [
        ("https://example.com/a", NOW, "Michael Jordan works at Nike."),
        ("https://example.com/b", NOW + timedelta(days=1),
         "Michael Jordan works at Berkeley."),
    ]
    nodes, edges = _graph(spark, rows)
    mj = [n for n in nodes if n["name"] == "Michael Jordan"]
    assert len(mj) == 1  # conflation: one node for two real-world people
    works = sorted(
        (e for e in edges if e["name"] == "WORKS_AT"),
        key=lambda e: e["valid_at"])
    assert len(works) == 2
    nike, berkeley = works
    # the damage: Nike employment is CLOSED by the homonym's fact
    assert nike["invalid_at"] is not None
    assert berkeley["invalid_at"] is None


def test_homonym_different_groups_stay_separate(spark):
    """The blast radius is bounded by group_id: the same name in two
    groups yields two nodes and no cross-group invalidation — at corpus
    scale (group = domain) homonym damage is per-domain, never global."""
    rows = [
        ("https://nba.example/a", NOW, "Michael Jordan works at Nike."),
        ("https://ml.example/b", NOW + timedelta(days=1),
         "Michael Jordan works at Berkeley."),
    ]
    nodes, edges = _graph(spark, rows)
    mj = [n for n in nodes if n["name"] == "Michael Jordan"]
    assert len(mj) == 2
    assert {n["group_id"] for n in mj} == {"nba.example", "ml.example"}
    assert all(e["invalid_at"] is None for e in edges
               if e["name"] == "WORKS_AT")


def test_near_identical_variant_merges_by_design(spark):
    """A middle initial does NOT keep entities apart: the MinHash-LSH
    alias generator (dedup.alias_pairs generator 3) merges near-identical
    spellings — char-3-gram Jaccard('michael jordan', 'michael i jordan')
    = 0.76 ≥ 0.55 — exactly as it merges 'Acme Corp'/'Acme Corp.'. That
    is the alias machinery working as intended (the reference's LLM would
    usually also call these duplicates), so the homonym risk extends to
    near-identical surface variants, not just byte-equal names. Pinned so
    the documented trade-off (SURVEY §8) tracks the real threshold."""
    rows = [
        ("https://example.com/a", NOW, "Michael Jordan works at Nike."),
        ("https://example.com/b", NOW + timedelta(days=1),
         "Michael I. Jordan works at Berkeley."),
    ]
    nodes, edges = _graph(spark, rows)
    jordan_nodes = [n for n in nodes if "Jordan" in n["name"]]
    assert len(jordan_nodes) == 1  # merged into the first-seen spelling
    assert jordan_nodes[0]["name"] == "Michael Jordan"


def test_below_threshold_names_stay_separate(spark):
    """The true boundary: merging stops at the near-dup threshold. A
    shared surname with a different given name ('Katie Jordan', Jaccard
    0.30 < 0.55, both multi-token so the surname generator — which only
    matches single-token names — can't fire) yields two nodes and no
    cross-entity invalidation."""
    rows = [
        ("https://example.com/a", NOW, "Michael Jordan works at Nike."),
        ("https://example.com/b", NOW + timedelta(days=1),
         "Katie Jordan works at Berkeley."),
    ]
    nodes, edges = _graph(spark, rows)
    names = {n["name"] for n in nodes if "Jordan" in n["name"]}
    assert names == {"Michael Jordan", "Katie Jordan"}
    assert all(e["invalid_at"] is None for e in edges
               if e["name"] == "WORKS_AT")


# ---------------------------------------------------------------- opt-in split

def _discriminative_embedder(col):
    """Test stand-in for a semantic encoder: contexts about the athlete
    (Nike) and the professor (Berkeley) land on orthogonal axes. The
    engine's default hash embedder cannot do this — which is exactly why
    homonym_split defaults to off (operators/disambig.py docstring)."""
    from pyspark.sql import functions as F

    return F.array(
        F.when(col.contains("Nike"), F.lit(1.0)).otherwise(F.lit(0.0)),
        F.when(col.contains("Berkeley"), F.lit(1.0)).otherwise(F.lit(0.0)),
    ).cast("array<float>")


def test_context_split_separates_homonyms(spark):
    """homonym_split + a discriminative embedder: the two same-name
    entities become separate nodes, each WORKS_AT edge follows its
    episode's cluster, and the false T2 invalidation measured in
    test_same_name_conflation disappears."""
    rows = [
        ("https://example.com/a", NOW, "Michael Jordan works at Nike."),
        ("https://example.com/b", NOW + timedelta(days=1),
         "Michael Jordan works at Berkeley."),
    ]
    g = build_graph(_pages(spark, rows), now=NOW, homonym_split=0.5,
                    ctx_embedder=_discriminative_embedder)
    nodes = g["nodes"].collect()
    edges = g["edges"].collect()
    jordans = [n for n in nodes if n["name"] == "Michael Jordan"]
    assert len(jordans) == 2
    assert len({n["uuid"] for n in jordans}) == 2
    works = [e for e in edges if e["name"] == "WORKS_AT"]
    assert len(works) == 2
    assert len({e["source_node_uuid"] for e in works}) == 2
    # functional-pred contradiction no longer fires across entities
    assert all(e["invalid_at"] is None for e in works)


def test_context_split_keeps_homogeneous_entity(spark):
    """Same entity, homogeneous contexts: farthest-point seeds stay
    above the threshold, so no split — the one node keeps both episodes'
    facts and same-subject T2 semantics are unchanged."""
    rows = [
        ("https://example.com/a", NOW, "Michael Jordan works at Nike."),
        ("https://example.com/b", NOW + timedelta(days=1),
         "Michael Jordan lives in Portland. He works at Nike."),
    ]
    g = build_graph(_pages(spark, rows), now=NOW, homonym_split=0.5,
                    ctx_embedder=_discriminative_embedder)
    jordans = [n for n in g["nodes"].collect()
               if n["name"] == "Michael Jordan"]
    assert len(jordans) == 1


def test_context_split_off_matches_default(spark):
    """Flag off (default): identical graph to the documented merged
    behavior — the split machinery must be invisible unless opted into."""
    rows = [
        ("https://example.com/a", NOW, "Michael Jordan works at Nike."),
        ("https://example.com/b", NOW + timedelta(days=1),
         "Michael Jordan works at Berkeley."),
    ]
    g = build_graph(_pages(spark, rows), now=NOW)
    jordans = [n for n in g["nodes"].collect()
               if n["name"] == "Michael Jordan"]
    assert len(jordans) == 1


def test_homonym_eval_operating_point(spark):
    """The shipped default τ=0.5 holds its measured operating point on
    the eval fixture under the GENERIC bag-of-words hash embedder (no
    fixture-specific keywords): split precision 1.0, recall ≥ 0.9,
    mention purity 1.0 (EVAL_HOMONYM.json / SURVEY §8)."""
    from kgspark.evals import run_homonym_eval

    res = run_homonym_eval(spark, thresholds=[0.5])
    row = res["by_threshold"]["0.5"]
    assert row["split_precision"] == 1.0
    assert row["split_recall"] >= 0.9
    assert row["mention_purity"] == 1.0
