"""End-to-end pipeline goldens (FIXTURES.md §2-3): dedup aliasing,
bi-temporal invalidation, byte-identical text extraction, and triple
P/R ≥ 0.95 on the golden narrative set."""

from datetime import datetime

from pyspark.sql import functions as F

from kgspark.functions.text import html_to_text
from kgspark.pipeline import build_graph
from kgspark.synth import golden_pages, synth_pages

NOW = datetime(2024, 6, 1)


def _golden_nodes(graph):
    return {
        r["name"]: r
        for r in graph["nodes"].where(F.col("group_id") == "golden.example.org").collect()
    }


def _golden_edges(graph):
    return graph["edges"].where(F.col("group_id") == "golden.example.org").collect()


def test_text_extraction_byte_identical(spark):
    pages = synth_pages(spark, n_docs=100, n_groups=4, seed=42)
    bad = pages.where(html_to_text(F.col("html")) != F.col("text")).count()
    assert bad == 0


def test_alias_dedup(graph):
    nodes = _golden_nodes(graph)
    # SF folded into San Francisco; Harris into Kamala Harris
    assert "SF" not in nodes
    assert "Harris" not in nodes
    assert "SF" in nodes["San Francisco"]["attributes"]["aliases"].split("|")
    assert "Harris" in nodes["Kamala Harris"]["attributes"]["aliases"].split("|")
    # similar-but-distinct stays apart (FIXTURES §2)
    assert "San Jose" in nodes
    assert "San Francisco" in nodes


def test_contradiction_invalidation(graph):
    edges = {(e["name"]): e for e in _golden_edges(graph)
             if e["name"] in ("LIKES", "DISLIKES")}
    likes, dislikes = edges["LIKES"], edges["DISLIKES"]
    # LIKES closed at the DISLIKES valid_at; expired stamped with `now`
    assert likes["invalid_at"] == dislikes["valid_at"]
    assert likes["expired_at"] == NOW
    assert dislikes["invalid_at"] is None
    assert dislikes["expired_at"] is None


def test_term_dated_fact(graph):
    ag = [e for e in _golden_edges(graph) if e["name"] == "IS_ATTORNEY_GENERAL_OF"][0]
    assert ag["valid_at"] == datetime(2011, 1, 3)
    assert ag["invalid_at"] == datetime(2017, 1, 3)
    assert ag["expired_at"] is None  # explicit end date, not superseded


def test_edge_endpoints_canonical(graph):
    # "Harris visited SF" must point at the canonical Kamala Harris / San Francisco
    nodes = _golden_nodes(graph)
    visited = [e for e in _golden_edges(graph) if e["name"] == "VISITED"][0]
    assert visited["source_node_uuid"] == nodes["Kamala Harris"]["uuid"]
    assert visited["target_node_uuid"] == nodes["San Francisco"]["uuid"]


def test_mentions_and_entity_edges(graph):
    eps = graph["episodes"].where(F.col("group_id") == "golden.example.org")
    m = graph["mentions"].where(F.col("group_id") == "golden.example.org")
    assert m.count() > 0
    # every episode with triples has entity_edges backfilled
    with_edges = eps.where(F.size("entity_edges") > 0).count()
    assert with_edges >= 7
    # mentions point at canonical nodes only
    orphan = (
        m.join(graph["nodes"], m.entity_uuid == graph["nodes"].uuid, "left_anti").count()
    )
    assert orphan == 0


EXPECTED_GOLDEN_TRIPLES = {
    ("Alice Smith", "LIKES", "Bob Jones"),
    ("Alice Smith", "DISLIKES", "Bob Jones"),
    ("Kamala Harris", "IS_ATTORNEY_GENERAL_OF", "California"),
    ("Kamala Harris", "LIVES_IN", "San Francisco"),
    ("Kamala Harris", "VISITED", "San Francisco"),
    ("user", "MOVED_TO", "Paris"),
    ("Gavin Newsom", "POSITION", "Governor"),
    ("Gavin Newsom", "EMPLOYER", "California"),
    ("Carol Brown", "LIVES_IN", "San Jose"),
}


def test_golden_triple_precision_recall(graph):
    nodes = graph["nodes"].select("uuid", "name")
    subj = nodes.toDF("source_node_uuid", "subj")
    obj = nodes.toDF("target_node_uuid", "obj")
    got = {
        (r["subj"], r["name"], r["obj"])
        for r in graph["edges"].where(F.col("group_id") == "golden.example.org")
        .join(subj, "source_node_uuid").join(obj, "target_node_uuid")
        .select("subj", "name", "obj").collect()
    }
    tp = len(got & EXPECTED_GOLDEN_TRIPLES)
    precision = tp / len(got) if got else 0.0
    recall = tp / len(EXPECTED_GOLDEN_TRIPLES)
    assert precision >= 0.95, f"precision {precision}: extra={got - EXPECTED_GOLDEN_TRIPLES}"
    assert recall >= 0.95, f"recall {recall}: missing={EXPECTED_GOLDEN_TRIPLES - got}"


def test_determinism(spark):
    """Same seed → byte-identical graph (triple set hash)."""
    def run():
        pages = spark.createDataFrame(__import__("pandas").DataFrame(golden_pages()))
        g = build_graph(pages, now=NOW)
        rows = g["edges"].select("uuid", "source_node_uuid", "target_node_uuid",
                                 "name", "valid_at", "invalid_at").collect()
        return sorted(tuple(str(v) for v in r) for r in rows)

    assert run() == run()


def test_node_embed_stage_parallelism(spark):
    """The name-embedding pandas UDF (and the downstream MinHash banding
    that inherits nodes0's partitioning) must run at the data-sized
    partition count, not whatever AQE's byte-based coalescing leaves:
    slim node rows coalesce to ~3 partitions at 150k docs, serializing
    every CPU-bound UDF stage regardless of core count (profiled)."""
    from kgspark.operators.extract import build_entity_nodes, pages_to_episodes, run_extraction

    pages = synth_pages(spark, n_docs=300, n_groups=8, seed=7)
    ext_nodes = run_extraction(pages_to_episodes(pages)).ext_nodes
    nodes0 = build_entity_nodes(ext_nodes)
    n_conf = int(spark.conf.get("spark.sql.shuffle.partitions"))
    assert nodes0.rdd.getNumPartitions() == n_conf
