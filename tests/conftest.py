from datetime import datetime

import pytest

from kgspark.session import get_spark

NOW = datetime(2024, 6, 1)


@pytest.fixture(scope="session")
def spark():
    s = get_spark("kgspark-tests", master="local[8]", shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def graph(spark):
    """One shared built graph for pipeline + search test modules."""
    from kgspark.pipeline import build_graph
    from kgspark.synth import synth_pages

    pages = synth_pages(spark, n_docs=60, n_groups=4, seed=42)
    g = build_graph(pages, now=NOW)
    g = {k: df.persist() for k, df in g.items()}
    g["edges"].count()
    return g


@pytest.fixture(scope="session")
def postings(graph):
    """PostingsIndex (postings + materialized doc stats) — what
    KGSpark.postings() hands to the search layer."""
    from kgspark.search.fulltext import build_index

    idx = build_index(graph).persist()
    idx.postings.count()
    return idx
