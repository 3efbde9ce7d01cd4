"""Two-cluster-size scaling evidence (BASELINE.json north rule).

A real N vs 4N executor comparison needs a cluster; in this sandbox we
run the identical pipeline input at local[8] and local[32] (separate
JVMs via subprocess so executor-thread count, shuffle partitions and
memory pools are honestly re-initialized) and report throughput at both
plus scaling efficiency = (docs_per_sec_32 / docs_per_sec_8) / 4.

Usage: python tools/scaling_bench.py [n_docs]   (default 20000)
Writes BENCH_SCALING.json and prints one JSON line.
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
        SPARK_GRAFT_SF_DIR=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
    )
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        env=env, capture_output=True, text=True, timeout=1800, check=True,
    )
    line = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(line)


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000
    res = {}
    for cpus in (8, 32):
        r = run_bench(cpus, n_docs)
        res[cpus] = {
            "docs": r["pipeline"]["docs"],
            "triples": r["pipeline"]["triples"],
            "wall_s": r["queries"]["pipeline_build_graph"],
            "docs_per_sec": r["pipeline"]["docs_per_sec"],
            "triples_per_sec": r["pipeline"]["triples_per_sec"],
        }
    eff = (res[32]["docs_per_sec"] / res[8]["docs_per_sec"]) / (32 / 8)
    summary = {
        "metric": "scaling_efficiency_local8_vs_local32",
        "value": round(eff, 3),
        "unit": "fraction (1.0 = linear)",
        "n_docs": n_docs,
        "local8": res[8],
        "local32": res[32],
        "speedup": round(res[32]["docs_per_sec"] / res[8]["docs_per_sec"], 2),
    }
    with open(os.path.join(REPO, "BENCH_SCALING.json"), "w") as f:
        json.dump(summary, f, indent=2)
    print(json.dumps(summary))


if __name__ == "__main__":
    main()
