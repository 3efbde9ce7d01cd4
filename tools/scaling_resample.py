"""Resample the high-parallelism legs of an existing scaling artifact.

Why this exists: on this shared sandbox, host co-tenancy arrives in
minutes-scale windows (BENCH_SCALING_1M8_STAGES.json pins a 6-minute
window inflating identical stages 1.7-3.7×; BENCH_MEMLATENCY.json shows
the same 2-core probe measuring 23.8 vs 95.4 Mgathers/s in different
minutes). The 1-core leg of the 600k pair is weather-insensitive
(385.0 s vs 377.0 s across different days and code revisions, ±2%),
while the 4-core leg swings 112-218 s on IDENTICAL code. Best-of-N with
all N samples taken inside one noisy window therefore under-estimates
the 4-core floor. This tool spreads extra 4-core samples across session
time, merges them into the artifact's per-leg minima (the same
noise-floor estimator scaling_bench.py already uses), recomputes both
efficiency estimators, and appends the FULL sample history to the
artifact so the protocol is auditable.

Usage: python tools/scaling_resample.py [artifact.json] [repeats]
Defaults: BENCH_SCALING_r04.json, 2.
"""

from __future__ import annotations

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from scaling_bench import run_bench  # noqa: E402

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_r04.json"
    repeats = int(sys.argv[2]) if len(sys.argv) > 2 else 2
    path = os.path.join(REPO, path)
    art = json.load(open(path))
    legs = sorted(int(k[5:]) for k in art if k.startswith("local"))
    lo, hi = legs[0], legs[-1]  # default: the highest leg even if >2 present
    # optional 3rd arg: which leg (core count) to resample — BOTH legs
    # need the multi-window minimum when neither was measured on a known-
    # quiet box (the r5 1.8M campaign resamples local1 AND local2)
    target = int(sys.argv[3]) if len(sys.argv) > 3 else hi
    if target not in legs:
        raise SystemExit(f"leg local{target} not in artifact (has {legs})")
    n_docs = art["n_docs"]
    small = n_docs // 4
    leg = art[f"local{target}"]
    all_hist = art.setdefault("resample_history", {})
    if "full_wall_s" in all_hist:  # migrate pre-r5 flat (hi-leg) layout
        all_hist = art["resample_history"] = {f"local{hi}": all_hist}
    hist = all_hist.setdefault(
        f"local{target}", {"full_wall_s": [leg["wall_s"]],
                           "quarter_wall_s": [leg["wall_s_quarter_corpus"]]})
    for _ in range(repeats):
        big = run_bench(target, n_docs)
        sm = run_bench(target, small)
        wb = big["queries"]["pipeline_build_graph"]
        ws = sm["queries"]["pipeline_build_graph"]
        hist["full_wall_s"].append(wb)
        hist["quarter_wall_s"].append(ws)
        if wb < leg["wall_s"]:
            leg.update(wall_s=wb,
                       docs_per_sec=big["pipeline"]["docs_per_sec"],
                       triples_per_sec=big["pipeline"]["triples_per_sec"],
                       jvm_gc_ms=big["pipeline"].get("jvm_gc_ms"))
        if ws < leg["wall_s_quarter_corpus"]:
            leg["wall_s_quarter_corpus"] = ws
            leg["jvm_gc_ms_quarter_corpus"] = sm["pipeline"].get("jvm_gc_ms")
    leg["marginal_docs_per_sec"] = round(
        (n_docs - small) / max(leg["wall_s"] - leg["wall_s_quarter_corpus"], 1e-9), 1)
    lo_leg, hi_leg = art[f"local{lo}"], art[f"local{hi}"]
    ratio = hi / lo
    art["value"] = round(
        (hi_leg["marginal_docs_per_sec"] / lo_leg["marginal_docs_per_sec"]) / ratio, 3)
    art["end_to_end_efficiency"] = round(
        (hi_leg["docs_per_sec"] / lo_leg["docs_per_sec"]) / ratio, 3)
    art["speedup_end_to_end"] = round(
        hi_leg["docs_per_sec"] / lo_leg["docs_per_sec"], 2)
    art["speedup_steady_state"] = round(
        hi_leg["marginal_docs_per_sec"] / lo_leg["marginal_docs_per_sec"], 2)
    art["method"] += (
        "; legs additionally resampled across separate "
        "session time windows (minutes-scale host co-tenancy is bimodal on "
        "this box) and merged by per-leg minimum — full sample history in "
        "resample_history"
    )
    # method string appended once per file write is wrong if run twice — dedup
    marker = "; legs additionally resampled"
    first = art["method"].find(marker)
    second = art["method"].find(marker, first + 1)
    if second != -1:
        art["method"] = art["method"][:second]
    with open(path, "w") as f:
        json.dump(art, f, indent=2)
    print(json.dumps({"value": art["value"],
                      "end_to_end_efficiency": art["end_to_end_efficiency"],
                      "history": hist}))


if __name__ == "__main__":
    main()
