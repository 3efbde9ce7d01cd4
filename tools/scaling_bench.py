"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N vs 4N executor comparison needs a cluster; in this sandbox we
run the identical pipeline input at local[N] and local[4N] in separate
JVMs (thread count, shuffle partitions and memory pools honestly
re-initialized) and report throughput at both plus
scaling efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4.

Default pair is local[1] vs local[4] — both far under-subscribe the
32-core box, so per-core memory bandwidth and LLC stay constant between
legs, which is the honest single-machine analogue of adding executor
machines (each bringing its own memory system). Higher pairs on one box
instead measure the memory-bandwidth wall: at local[8] JVM task time
already inflates ~1.3× vs local[2], and local[32] inflates ~2.2× vs
local[8], from cache/bus contention that a real 4× cluster would not
see (numbers in BASELINE.md).

Usage: python tools/scaling_bench.py [n_docs] [N] [4N] [repeats] [out.json]
Defaults: 600000 docs, N=1, 4N=4, out=BENCH_SCALING.json.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def run_bench(cpus: int, n_docs: int) -> dict:
    env = dict(
        os.environ,
        SPARK_GRAFT_CPUS=str(cpus),
        SPARK_GRAFT_PIPE_DOCS=str(n_docs),
        SPARK_GRAFT_SKIP_QUERIES="1",
        SPARK_GRAFT_PIPE_REPEATS="1",  # this harness repeats at its own level
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        # identical docs-per-partition at BOTH corpus sizes (the marginal
        # method subtracts them — per-task work must not change shape);
        # rounded to a multiple of 4 so neither leg loses a partial task
        # wave (15 partitions on 4 cores = 3.75 waves = 6% tail idle)
        SPARK_GRAFT_PARTS=str(max(4, (n_docs // 9_375 + 3) // 4 * 4)),
    )
    # Pin the WHOLE process tree (JVM task threads + Python UDF workers)
    # to exactly `cpus` cores — otherwise Python workers run beside the
    # JVM on extra cores and a "local[2]" leg really consumes ~4,
    # diluting the N-vs-4N comparison. taskset is inherited by children.
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable,
           os.path.join(REPO, "bench.py")]
    out = subprocess.run(cmd, env=env, capture_output=True, text=True,
                         timeout=2400, check=True)
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    """Two sizes × two cluster sizes. End-to-end efficiency uses the big
    corpus directly; STEADY-STATE efficiency uses marginal throughput
    Δdocs/Δwall between the two sizes, which cancels the per-job driver/
    scheduler constant (~40 query stages × ~0.6s in this sandbox) that a
    real production corpus (10^6× larger) amortizes to nothing."""
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 600_000
    lo = int(sys.argv[2]) if len(sys.argv) > 2 else 1
    hi = int(sys.argv[3]) if len(sys.argv) > 3 else 4 * lo
    repeats = int(sys.argv[4]) if len(sys.argv) > 4 else 2
    out_path = sys.argv[5] if len(sys.argv) > 5 else "BENCH_SCALING.json"
    small = n_docs // 4
    res = {}
    for cpus in (lo, hi):
        # best-of-N: the sandbox shares its kernel/FS with other tenants;
        # min wall is the standard noise-floor estimator for throughput
        bigs = [run_bench(cpus, n_docs) for _ in range(repeats)]
        sms = [run_bench(cpus, small) for _ in range(repeats)]
        big = min(bigs, key=lambda r: r["queries"]["pipeline_build_graph"])
        sm = min(sms, key=lambda r: r["queries"]["pipeline_build_graph"])
        wall_big = big["queries"]["pipeline_build_graph"]
        wall_sm = sm["queries"]["pipeline_build_graph"]
        marginal = (n_docs - small) / max(wall_big - wall_sm, 1e-9)
        res[cpus] = {
            "docs": big["pipeline"]["docs"],
            "triples": big["pipeline"]["triples"],
            "wall_s": wall_big,
            "wall_s_quarter_corpus": wall_sm,
            "docs_per_sec": big["pipeline"]["docs_per_sec"],
            "triples_per_sec": big["pipeline"]["triples_per_sec"],
            "marginal_docs_per_sec": round(marginal, 1),
            # GC share separates "slower because the shared heap's GC
            # doesn't parallelize" from genuine compute inefficiency
            "jvm_gc_ms": big["pipeline"].get("jvm_gc_ms"),
            "jvm_gc_ms_quarter_corpus": sm["pipeline"].get("jvm_gc_ms"),
        }
    ratio = hi / lo
    eff_e2e = (res[hi]["docs_per_sec"] / res[lo]["docs_per_sec"]) / ratio
    eff_marg = (res[hi]["marginal_docs_per_sec"]
                / res[lo]["marginal_docs_per_sec"]) / ratio
    summary = {
        "metric": f"scaling_efficiency_local{lo}_vs_local{hi}",
        "value": round(eff_marg, 3),
        "unit": "fraction (1.0 = linear); steady-state (marginal-throughput)",
        "end_to_end_efficiency": round(eff_e2e, 3),
        "n_docs": n_docs,
        f"local{lo}": res[lo],
        f"local{hi}": res[hi],
        "speedup_end_to_end": round(
            res[hi]["docs_per_sec"] / res[lo]["docs_per_sec"], 2),
        "speedup_steady_state": round(
            res[hi]["marginal_docs_per_sec"] / res[lo]["marginal_docs_per_sec"], 2),
        "method": (
            "identical input + identical data-sized partitioning at both "
            "cluster sizes; process tree pinned with taskset to exactly N "
            "cores; marginal throughput = delta(docs)/delta(wall) between "
            "quarter and full corpus, cancelling fixed per-job driver cost"
        ),
    }
    with open(os.path.join(REPO, out_path), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
