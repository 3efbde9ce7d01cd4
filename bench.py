"""Benchmark harness (driver contract): runs the headline queries at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on
local[$SPARK_GRAFT_CPUS] and prints ONE JSON line.

Sections:
- pipeline: full KG construction (synth pages → graph tables) — docs/sec
  and triples/sec, the BASELINE.json headline metric
- retrieval/operator queries from __spark_entry__ at the sf dir

Scaling evidence (local[8] vs local[32]) is produced by
tools/scaling_bench.py which invokes this file twice.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# pipeline corpus size scales with the sf of the test dir
_SF = float(SF_DIR.rstrip("/").rsplit("sf", 1)[-1]) if "sf" in SF_DIR else 0.1
PIPE_DOCS = int(os.environ.get("SPARK_GRAFT_PIPE_DOCS", str(max(200, int(200_000 * _SF)))))
# Controlled-measurement protocol: every metric is run REPEATS times and
# reported as the MEDIAN, with per-run raw values in "runs" — the sandbox
# shares its kernel/FS with co-tenants (±40% wall noise documented in
# BASELINE.md), so single-shot numbers are not comparable across rounds.
REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_REPEATS", "3")))
# the pipeline leg is the headline metric AND the noisiest one (round-3
# raw runs spanned 9.1-19.8 s within one session) — n=5 by default so
# the median is trustworthy; the scaling harness (which repeats at its
# own level) sets this to 1
PIPE_REPEATS = max(1, int(os.environ.get("SPARK_GRAFT_PIPE_REPEATS",
                                         str(max(REPEATS, 5)))))

BENCH_QUERIES = [
    "q3_bm25", "q4_cosine_topk", "q7_rrf", "t2_invalidation",
    "sessionize", "tpch_q1", "top_k_join",
]


def main() -> None:
    from datetime import datetime

    import __spark_entry__ as entry_mod
    from kgspark.pipeline import build_graph
    from kgspark.session import get_spark
    from kgspark.synth import synth_pages

    # Partition counts are sized by DATA VOLUME, not core count (the
    # standard ~100MB-per-partition rule). Tying them to CPUS would (a)
    # give different physical plans per cluster size and (b) multiply
    # the environment's per-task overhead by core count, corrupting the
    # N-vs-4N scaling comparison. With a fixed task count, extra cores
    # just run more waves in parallel. SPARK_GRAFT_PARTS overrides the
    # 32-part floor: the scaling harness compares corpus SIZES, so both
    # sizes must use the same docs-per-partition, floor included.
    n_parts = int(os.environ.get("SPARK_GRAFT_PARTS", "0")) \
        or max(32, PIPE_DOCS // 10_000)
    # SPARK_GRAFT_EVENTLOG_DIR: when set, write the Spark event log there
    # — lets the scaling harness re-run a committed leg with per-stage
    # task metrics recorded (tools/compare_profiles.py) without changing
    # anything else about the measured job.
    extra = {}
    ev_dir = os.environ.get("SPARK_GRAFT_EVENTLOG_DIR")
    if ev_dir:
        os.makedirs(ev_dir, exist_ok=True)
        extra = {"spark.eventLog.enabled": "true",
                 "spark.eventLog.dir": ev_dir,
                 "spark.eventLog.compress": "false"}
    spark = get_spark("kgspark-bench", master=f"local[{CPUS}]",
                      shuffle_partitions=n_parts, extra=extra)

    timings: dict[str, float] = {}
    total_start = time.perf_counter()

    # ---------------- pipeline: the headline construction job.
    # n_groups depends only on the doc count (NOT on CPUS) so runs at
    # different parallelism levels process the identical input — the
    # scaling-efficiency comparison requires it.
    n_groups = int(os.environ.get("SPARK_GRAFT_PIPE_GROUPS",
                                  str(max(16, PIPE_DOCS // 250))))
    # Input materialization is OUTSIDE the timed leg: the north rule's
    # input is a stored pages table (Iceberg at cluster scale), so the
    # timed quantity is KG construction over already-materialized input,
    # not the synthetic generator. localCheckpoint keeps the exact
    # data-sized partitioning (n_parts*2 map partitions).
    # input (map-side) partitions 2× the shuffle count: the pandas-UDF
    # extraction stage carries most of the Python CPU — shorter map tasks
    # cut the straggler tail that idles cores at the end of each wave.
    pages = synth_pages(spark, n_docs=PIPE_DOCS, n_groups=n_groups,
                        seed=42, partitions=n_parts * 2)
    pages = pages.localCheckpoint(eager=True)

    # Pre-warm one Python UDF worker per core (fork + pandas/numpy/
    # extraction-module import — measured as a multi-second straggler in
    # the first pandas-UDF stage). A production cluster/stream has warm
    # workers; a cold fork per benchmark run is sandbox noise.
    from pyspark.sql.functions import col, pandas_udf

    @pandas_udf("long")
    def _warm(x: pd.Series) -> pd.Series:
        import kgspark.operators._extract_core  # noqa: F401
        return x * 0

    spark.range(CPUS * 4, numPartitions=CPUS).select(_warm(col("id"))).count()

    # the benched job is the BULK construction path — like the
    # reference's add_episode_bulk it does not hydrate per-node typed
    # attributes (that is the point-update path's stage; see
    # pipeline.build_graph docstring). E4 hydration is benched by its
    # own oracle query (e4_attributes) and the e2e eval.
    # JVM GC wall during the pipeline legs (driver+executors share one
    # JVM in local mode): separates "slower because GC" from "slower
    # because idle/contended" when two cluster sizes are compared.
    def _gc_ms() -> int:
        beans = spark._jvm.java.lang.management.ManagementFactory \
            .getGarbageCollectorMXBeans()
        return int(sum(beans.get(i).getCollectionTime()
                       for i in range(beans.size())))

    runs: dict[str, list[float]] = {}
    pipe_runs = []
    # One UNTIMED warm-up build before the timed repeats (only when
    # repeating — the scaling harness runs PIPE_REPEATS=1 and wants the
    # true end-to-end wall including JIT). First-build wall at sf0.01
    # measured 53.9s vs 11.8s steady on identical code: whole-stage
    # codegen JIT + page-cache fill, a fixed cost every long-lived
    # cluster pays once. It is still REPORTED (warmup_s) so nothing is
    # hidden; medians/spread cover the post-warm runs only.
    warmup_s = None
    if PIPE_REPEATS > 1:
        t0 = time.perf_counter()
        g = build_graph(pages, now=datetime(2024, 6, 1))
        g["edges"].count()
        g["nodes"].count()
        warmup_s = round(time.perf_counter() - t0, 3)
        spark.catalog.clearCache()
    gc_before = _gc_ms()
    n_edges = n_nodes = 0
    for _ in range(PIPE_REPEATS):
        t0 = time.perf_counter()
        g = build_graph(pages, now=datetime(2024, 6, 1))
        n_edges = g["edges"].count()
        n_nodes = g["nodes"].count()
        pipe_runs.append(round(time.perf_counter() - t0, 3))
        # builds persist intermediates internally; drop them so repeat
        # runs measure the same cold-cache job (pages stay checkpointed)
        spark.catalog.clearCache()
    pipe_sec = statistics.median(pipe_runs)
    pipe_gc_ms = _gc_ms() - gc_before
    timings["pipeline_build_graph"] = round(pipe_sec, 3)
    runs["pipeline_build_graph"] = pipe_runs

    # ---------------- operator/retrieval queries at the sf dir
    qs = entry_mod.queries()
    if os.environ.get("SPARK_GRAFT_SKIP_QUERIES"):
        qs = {}
    if qs:
        # BM25 queries run against a materialized postings index (the
        # reference's searches run against prebuilt Lucene indexes, and
        # the engine's KGSpark.postings() is likewise built once per
        # graph state) — so the one-time index build is timed on its own
        # line and q3/q6 measure query-over-index.
        t0 = time.perf_counter()
        entry_mod._bm25_index(spark, SF_DIR)
        timings["bm25_index_build"] = round(time.perf_counter() - t0, 3)
    for name in (BENCH_QUERIES if qs else []):
        fn = qs[name]
        vals = []
        if REPEATS > 1:  # untimed warm-up, same rationale as the pipeline's
            fn(spark, SF_DIR).count()
        for _ in range(REPEATS):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.count()  # materialize; results stay distributed
            vals.append(round(time.perf_counter() - t0, 3))
        timings[name] = round(statistics.median(vals), 3)
        runs[name] = vals

    total = time.perf_counter() - total_start
    docs_per_sec = PIPE_DOCS / pipe_sec if pipe_sec else 0.0
    triples_per_sec = n_edges / pipe_sec if pipe_sec else 0.0

    print(json.dumps({
        "metric": "kg_construct_total",
        "value": round(total, 3),
        "unit": "sec",
        "queries": timings,
        "runs": runs,  # raw per-repeat values behind each median
        # headline spread, quoted wherever the median is quoted: a noisy
        # co-tenant run is visible as [min, max], not hidden in a median
        "spread": {k: [min(v), max(v)] for k, v in runs.items()},
        "repeats": {"queries": REPEATS, "pipeline": PIPE_REPEATS},
        # untimed first build (JIT + page-cache fill), excluded from the
        # median/spread above but disclosed here; null in single-run mode
        "pipeline_warmup_s": warmup_s,
        "sf": _SF,
        "pipeline": {
            "docs": PIPE_DOCS,
            "nodes": n_nodes,
            "triples": n_edges,
            "docs_per_sec": round(docs_per_sec, 1),
            "triples_per_sec": round(triples_per_sec, 1),
            "jvm_gc_ms": pipe_gc_ms,
            "cpus": CPUS,
        },
    }))


if __name__ == "__main__":
    main()
