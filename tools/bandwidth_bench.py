"""Memory-bandwidth microbenchmark: quantifies the single-box ceiling
that caps CPU-scaling efficiency for memory-bound stages.

STREAM-style triad (a = b + s*c, 24 bytes/element of traffic) run in K
independent processes, each pinned to its own physical core, arrays
sized far past LLC. Aggregate bandwidth at K cores vs K=1 gives the
hardware's maximum achievable speedup for a bandwidth-bound job:

    predicted_efficiency_ceiling(K) = agg_bw(K) / (K * agg_bw(1))

This is the measurement behind BENCH_SCALING_1M8.json's narrative: the
1.8M-doc pipeline's 1->4-core efficiency cannot exceed this ceiling on
this box no matter how perfectly the Spark plan scales, because the
per-core bandwidth each ADDITIONAL core sees shrinks as the shared
memory controllers saturate. A real 4x cluster adds 4x memory systems
and does not hit this wall.

Usage: python tools/bandwidth_bench.py [cores ...] [--out FILE]
Defaults: 1 2 4 8, BENCH_BANDWIDTH.json. Run on an otherwise-idle box
(same protocol as the scaling legs - no concurrent compute).
"""

from __future__ import annotations

import json
import multiprocessing as mp
import os
import sys
import time

import numpy as np

N = 32 * 1024 * 1024  # 32M float64 = 256 MB/array, 768 MB/worker: >> LLC
REPS = 6


def _triad_worker(core: int, barrier, out_q) -> None:
    os.sched_setaffinity(0, {core})
    rng = np.random.default_rng(core)
    b = rng.random(N)
    c = rng.random(N)
    a = np.empty_like(b)
    np.add(b, 3.0 * c, out=a)  # touch every page before timing
    barrier.wait()  # all workers start the timed window together
    t0 = time.perf_counter()
    for _ in range(REPS):
        np.multiply(c, 3.0, out=a)
        np.add(a, b, out=a)
    dt = time.perf_counter() - t0
    # triad traffic: read b, read c, write a = 24 bytes/element/rep
    out_q.put((core, 24.0 * N * REPS / dt / 1e9))


GATHER_N = 128 * 1024 * 1024 // 8  # 128 MB table: >> LLC, random access
GATHER_SMALL_N = 256 * 1024 // 8   # 256 KB table: fits private L2
GATHER_IDX = 8 * 1024 * 1024       # gathers per rep
GATHER_REPS = 8


def _gather_worker(core: int, n: int, barrier, out_q) -> None:
    """Random 8-byte gathers over an n-element table — the access
    pattern of a shuffle hash-probe / sort-merge pass, where latency
    and miss-level parallelism (not streaming prefetch bandwidth)
    bound throughput. Contrast with the triad: if the big-table gather
    rate per core DROPS when a second pinned core runs the same loop
    while the triad holds ~1.0, the shared memory system is
    latency/MLP-contended for cache-missing access even though it has
    spare streaming bandwidth."""
    os.sched_setaffinity(0, {core})
    rng = np.random.default_rng(core)
    table = rng.random(n)
    idx = rng.integers(0, n, size=GATHER_IDX)
    table[idx].sum()  # touch pages before timing
    barrier.wait()
    t0 = time.perf_counter()
    s = 0.0
    for _ in range(GATHER_REPS):
        s += table[idx].sum()
    dt = time.perf_counter() - t0
    out_q.put((core, GATHER_IDX * GATHER_REPS / dt / 1e6, s))


def _run_pinned(k: int, target, args: tuple) -> list:
    ctx = mp.get_context("spawn")
    barrier = ctx.Barrier(k)
    out_q = ctx.Queue()
    procs = [ctx.Process(target=target, args=(i, *args, barrier, out_q))
             for i in range(k)]
    for p in procs:
        p.start()
    per_core = [out_q.get() for _ in procs]
    for p in procs:
        p.join()
    return per_core


# Each point is best-of-TRIALS: a hardware-ceiling measurement wants the
# interference-free maximum, and single-shot points on this shared-kernel
# sandbox produced non-physical non-monotone curves (a 2-core gather
# point 2× below the 4-core one) that a repeat removed. Gather (latency-
# bound) is far noisier than triad (bandwidth-bound) on this virtualized
# host — adjacent-vs-spread core-pair probes showed the same pair
# swinging 23.8→75.4 Mgathers/s across runs with no topology effect
# (no SMT: 32 physical cores, 1 NUMA node) — so the ceiling needs more
# trials than the triad does.
TRIALS = int(os.environ.get("BW_TRIALS", "5"))


def measure(k: int) -> dict:
    aggs = []
    for _ in range(TRIALS):
        per_core = _run_pinned(k, _triad_worker, ())
        aggs.append(sum(bw for _, bw in per_core))
    agg = max(aggs)
    return {"cores": k, "aggregate_gb_s": round(agg, 2),
            "per_core_gb_s": round(agg / k, 2),
            "trials_gb_s": [round(a, 2) for a in aggs]}


def measure_gather(k: int, n: int) -> dict:
    aggs = []
    for _ in range(TRIALS):
        per_core = _run_pinned(k, _gather_worker, (n,))
        aggs.append(sum(r for _, r, _ in per_core))
    agg = max(aggs)
    return {"cores": k, "aggregate_mgathers_s": round(agg, 1),
            "per_core_mgathers_s": round(agg / k, 1),
            "trials_mgathers_s": [round(a, 1) for a in aggs]}


def main_gather(cores: list[int], out_path: str) -> None:
    results = []
    for label, n in (("big_128mb", GATHER_N), ("small_256kb", GATHER_SMALL_N)):
        pts = [measure_gather(k, n) for k in cores]
        base = pts[0]["aggregate_mgathers_s"] / pts[0]["cores"]
        for r in pts:
            r["scaling_efficiency_vs_1core"] = round(
                r["aggregate_mgathers_s"] / (r["cores"] * base), 3)
        results.append({"table": label, "table_mb": round(n * 8 / 1e6, 2),
                        "points": pts})
    summary = {
        "metric": "random_gather_throughput",
        "unit": "Mgathers/s (8-byte random reads, numpy fancy-index)",
        "results": results,
        "interpretation": (
            "shuffle hash-probe/sort access pattern: scaling_efficiency "
            "< 1 on the big (LLC-missing) table with ~1.0 on the small "
            "(cache-resident) table and ~1.0 STREAM triad at the same "
            "core count = the shared memory system is latency/MLP-"
            "contended for cache-missing access despite spare streaming "
            "bandwidth; this, not DRAM bandwidth, is the single-box "
            "ceiling for shuffle-heavy stages at large working sets. A "
            "real K-machine cluster multiplies memory systems and does "
            "not see it."),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, out_path), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


def main() -> None:
    argv = sys.argv[1:]
    gather = "--gather" in argv
    out_path = "BENCH_MEMLATENCY.json" if gather else "BENCH_BANDWIDTH.json"
    if "--out" in argv:
        i = argv.index("--out")
        out_path = argv[i + 1]
        del argv[i:i + 2]
    args = [a for a in argv if not a.startswith("--")]
    cores = sorted({int(a) for a in args}) or [1, 2, 4, 8]
    if gather:
        main_gather(cores, out_path)
        return
    results = [measure(k) for k in cores]
    base = results[0]["aggregate_gb_s"] / results[0]["cores"]
    for r in results:
        r["bw_scaling_efficiency_vs_1core"] = round(
            r["aggregate_gb_s"] / (r["cores"] * base), 3)
    summary = {
        "metric": "stream_triad_aggregate_bandwidth",
        "unit": "GB/s (24 bytes/element triad traffic)",
        "array_mb_per_worker": round(3 * N * 8 / 1e6),
        "points": results,
        "interpretation": (
            "bw_scaling_efficiency_vs_1core at K cores is the HARDWARE "
            "ceiling on K-core CPU-scaling efficiency for any "
            "memory-bandwidth-bound stage on this box"),
    }
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    with open(os.path.join(repo, out_path), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
