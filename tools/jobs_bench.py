"""Spark jobs-per-add_episode counter (VERDICT r3 item 6 / BASELINE
fact 24): every Spark job on a point update costs a fixed ~60 ms of
serial driver time in this sandbox, so the job COUNT — not the data
volume — is the wall-clock floor of the incremental path at
single-episode batch sizes. Target: <= 40 jobs per add_episode.

Protocol: ingest a base corpus, then N single-episode add_episode calls
each wrapped in its own job group; jobs are counted with
statusTracker().getJobIdsForGroup (works with the UI disabled).

Usage: python tools/jobs_bench.py [n_episodes]
Appends a "jobs_per_add_episode" row to BENCH_INCREMENTAL.json.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import tempfile
import time
from datetime import datetime

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

NOW = datetime(2024, 6, 1)


def measure(spark, n_episodes: int = 5, base_docs: int = 2000) -> dict:
    from kgspark.api import KGSpark
    from kgspark.synth import synth_pages

    root = tempfile.mkdtemp(prefix="jobsbench_")
    kg = KGSpark(spark, root)
    pages = synth_pages(spark, n_docs=base_docs, n_groups=32, seed=21)
    kg.add_pages(pages, now=NOW)

    sc = spark.sparkContext

    def _job_id_mark(tag: str) -> int:
        """Submit a sentinel 1-task job and return its job id. Job ids
        are assigned monotonically across ALL driver threads, so the
        bracket (mark .. mark) counts every job in between — including
        the splice jobs the incremental path now submits from its own
        thread pool, which setJobGroup (thread-local under PySpark's
        pinned-thread mode) would miss."""
        sc.setJobGroup(tag, "jobs_bench sentinel")
        spark.range(1).count()
        sc.setJobGroup(None, None)
        ids = sc.statusTracker().getJobIdsForGroup(tag)
        return max(ids)

    jobs, walls = [], []
    for i in range(n_episodes):
        before = _job_id_mark(f"mark-pre-{i}")
        t0 = time.perf_counter()
        kg.add_episode(
            name=f"probe-{i}",
            episode_body=f"Alice Porter visited Lisbon. Alice Porter "
                         f"works at Initech. Event number {i}.",
            reference_time=NOW,
            group_id="probe.example",
        )
        walls.append(round(time.perf_counter() - t0, 3))
        after = _job_id_mark(f"mark-post-{i}")
        jobs.append(after - before - 1)
    return {
        "jobs_per_episode": jobs,
        "jobs_median": int(statistics.median(jobs)),
        "wall_s_per_episode": walls,
        "wall_median_s": round(statistics.median(walls), 3),
        "base_docs": base_docs,
    }


def main() -> None:
    from kgspark.session import get_spark

    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("jobs-bench", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    row = measure(spark, n)
    out_path = os.path.join(REPO, "BENCH_INCREMENTAL.json")
    doc = {}
    if os.path.exists(out_path):
        with open(out_path) as f:
            doc = json.load(f)
    doc["jobs_per_add_episode"] = row
    with open(out_path, "w") as f:
        json.dump(doc, f, indent=2)
    print(json.dumps(row))


if __name__ == "__main__":
    main()
