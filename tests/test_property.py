"""Property-based tests (hypothesis): Spark operators vs pure-Python
reference implementations on randomly generated inputs.

Covers the two hardest-to-trust operators — T2 run-closing invalidation
and connected components — plus dedup idempotence. Example counts kept
small (each example runs a Spark job)."""

from datetime import datetime, timedelta

import pandas as pd
import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from pyspark.sql import functions as F

SETTINGS = dict(
    max_examples=10, deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

BASE = datetime(2024, 1, 1)

events = st.lists(
    st.tuples(
        st.integers(0, 2),     # partition key
        st.integers(0, 40),    # time offset (hours) — ties allowed
        st.integers(0, 2),     # value id
    ),
    min_size=1, max_size=24,
)


def _close_runs_reference(rows):
    """Pure-python T2: within each key (ordered by t, then uuid), a run of
    equal values is closed by the start time of the next differing run."""
    out = {}
    by_key = {}
    for uuid, key, t, val in rows:
        by_key.setdefault(key, []).append((t, uuid, val))
    for key, items in by_key.items():
        items.sort()
        # run boundaries
        runs = []  # (start_t, [uuids]) with value
        for t, uuid, val in items:
            if not runs or runs[-1][2] != val:
                runs.append([t, [uuid], val])
            else:
                runs[-1][1].append(uuid)
        for i, (start, uuids, val) in enumerate(runs):
            nxt = runs[i + 1][0] if i + 1 < len(runs) else None
            for u in uuids:
                out[u] = nxt
    return out


@pytest.mark.parametrize("dummy", [0])
@settings(**SETTINGS)
@given(data=events)
def test_close_runs_matches_reference(spark, dummy, data):
    from kgspark.operators.temporal import _close_runs

    rows = [
        (f"u{i:03d}", f"k{k}", BASE + timedelta(hours=h), f"v{v}")
        for i, (k, h, v) in enumerate(data)
    ]
    df = spark.createDataFrame(
        pd.DataFrame(rows, columns=["uuid", "group_id", "_t", "val"])
    ).withColumn("invalid_at", F.lit(None).cast("timestamp")) \
     .withColumn("expired_at", F.lit(None).cast("timestamp"))
    out = _close_runs(df, ["group_id"], F.col("val"), F.current_timestamp())
    got = {r["uuid"]: r["invalid_at"] for r in out.collect()}
    want = _close_runs_reference(rows)
    assert got == want
    # expired_at stamped exactly where invalid_at was tightened
    exp = {r["uuid"]: r["expired_at"] is not None for r in out.collect()}
    assert exp == {u: want[u] is not None for u in want}


pairs_strategy = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)).filter(lambda p: p[0] != p[1]),
    min_size=0, max_size=25,
)


def _cc_reference(pairs):
    parent = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        parent.setdefault(a, a)
        parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            if rb < ra:
                ra, rb = rb, ra
            parent[rb] = ra
    return {x: find(x) for x in parent}


@pytest.mark.parametrize("path", ["driver", "distributed"])
@settings(**SETTINGS)
@given(pairs=pairs_strategy)
def test_connected_components_matches_union_find(spark, path, pairs):
    from kgspark.operators.dedup import connected_components

    want = _cc_reference(pairs)
    if not pairs:
        return
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    threshold = 0 if path == "distributed" else 1_000_000
    got = {r["id"]: r["comp"] for r in
           connected_components(df, driver_threshold=threshold).collect()}
    assert got == want


@pytest.mark.parametrize("path", ["driver", "distributed"])
def test_connected_components_deep_chain_regression(spark, path):
    """Hypothesis-found diameter-7 path where the pointer jump is a
    no-op every round (the adopted label is already a root), so a fixed
    6-round schedule mislabeled node 1. The convergence-checked loop
    must label the whole chain comp=0."""
    from kgspark.operators.dedup import connected_components

    pairs = [(10, 3), (7, 10), (5, 15), (1, 5), (3, 15), (14, 0), (7, 14)]
    df = spark.createDataFrame(pd.DataFrame(pairs, columns=["id_a", "id_b"]))
    threshold = 0 if path == "distributed" else 1_000_000
    got = {r["id"]: r["comp"] for r in
           connected_components(df, driver_threshold=threshold).collect()}
    assert got == {n: 0 for n in {0, 1, 3, 5, 7, 10, 14, 15}}
    if path == "distributed":
        # a cap below the needed rounds must raise, never mislabel
        with pytest.raises(RuntimeError, match="did not converge"):
            connected_components(df, max_rounds=2, driver_threshold=0).collect()


def test_connected_components_path_graph_logsq_rounds(spark):
    """Worst case for label propagation — a 120-node path graph forced
    down the distributed branch — must converge well inside the
    alternating star algorithm's proven O(log² n) round bound (Kiveris
    et al. 2014) instead of degenerating to O(diameter) rounds and
    tripping max_rounds."""
    import math

    from kgspark.operators.dedup import connected_components

    n = 120
    df = spark.createDataFrame(
        pd.DataFrame([(i, i + 1) for i in range(n - 1)],
                     columns=["id_a", "id_b"]))
    stats = {}
    got = {r["id"]: r["comp"] for r in
           connected_components(df, driver_threshold=0,
                                _stats=stats).collect()}
    assert got == {i: 0 for i in range(n)}
    bound = 2 * math.ceil(math.log2(n)) ** 2
    assert stats["rounds"] <= bound, (stats, bound)
    # observed: 8 rounds — O(log n)-ish in practice, far under the bound
    assert stats["rounds"] <= 2 * math.ceil(math.log2(n))


@settings(**SETTINGS)
@given(texts=st.lists(st.sampled_from(["aa", "bb", "cc", "aa bb"]), min_size=1, max_size=12))
def test_exact_dedup_idempotent(spark, texts):
    from kgspark.datapipe.dedupe import exact_dedup_keep_first

    df = spark.createDataFrame(
        pd.DataFrame({"id": range(len(texts)), "text": texts}))
    once = exact_dedup_keep_first(df, "id", "text")
    twice = exact_dedup_keep_first(once, "id", "text")
    a = sorted(r["id"] for r in once.collect())
    b = sorted(r["id"] for r in twice.collect())
    assert a == b
    # first id per distinct text survives
    first = {}
    for i, t in enumerate(texts):
        first.setdefault(t, i)
    assert a == sorted(first.values())
