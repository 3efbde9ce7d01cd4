"""Compare two Spark event logs of the SAME job run at different
parallelism: per-stage task-core-second inflation.

The scaling question "why is local[K] less than K× faster than
local[1]?" decomposes into (a) stages whose SUMMED task time inflates
with K (memory contention / GC — real per-core slowdown), (b) stages
whose wall is bounded by one straggler task (skew), and (c) time
outside any stage (serial driver work). This tool aligns the two runs'
stages by occurrence order of (stage name, task count, shuffle-byte
signature) — the plans are identical by construction (data-sized
partitioning, AQE decisions pinned by identical input) — and prints
the per-stage ratio, worst inflators first.

Usage: python tools/compare_profiles.py LOGDIR_A LOGDIR_B [--json OUT]
(A = fewer cores. Event-log dirs as written by tools/profile_pipeline.)
"""

from __future__ import annotations

import glob
import json
import os
import sys


def load_stages(log_dir: str) -> list[dict]:
    stages: dict[int, dict] = {}
    paths = [p for p in glob.glob(f"{log_dir}/**/*", recursive=True)
             if os.path.isfile(p) and "appstatus" not in p]
    for path in paths:
        with open(path) as f:
            for line in f:
                try:
                    ev = json.loads(line)
                except json.JSONDecodeError:
                    continue
                e = ev.get("Event")
                if e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    st = stages.setdefault(si["Stage ID"], {})
                    st.update({
                        "name": si.get("Stage Name", "")[:48],
                        "tasks": si.get("Number of Tasks"),
                        "start": si.get("Submission Time"),
                        "end": si.get("Completion Time"),
                    })
                elif e == "SparkListenerTaskEnd":
                    sid = ev["Stage ID"]
                    m = ev.get("Task Metrics") or {}
                    st = stages.setdefault(sid, {})
                    dur = (m.get("Executor Run Time", 0)
                           + m.get("Executor Deserialize Time", 0))
                    st["task_ms"] = st.get("task_ms", 0) + dur
                    st["max_task_ms"] = max(st.get("max_task_ms", 0), dur)
                    st["gc_ms"] = st.get("gc_ms", 0) + m.get("JVM GC Time", 0)
                    sw = m.get("Shuffle Write Metrics") or {}
                    st["sw_b"] = st.get("sw_b", 0) + sw.get("Shuffle Bytes Written", 0)
    out = [s for s in stages.values() if s.get("start") is not None]
    out.sort(key=lambda s: s["start"])
    return out


def wall_split(stages: list[dict]) -> tuple[float, float]:
    """(in-stage wall, outside-stage wall) in seconds: union of the
    [submission, completion] intervals vs the span first-submit →
    last-complete. Outside-stage time is serial driver work (Catalyst,
    py4j, AQE re-planning) — the component that scales with NEITHER
    cores NOR corpus size per stage, only with stage count."""
    ivals = sorted((s["start"], s.get("end") or s["start"])
                   for s in stages if s.get("start"))
    if not ivals:
        return 0.0, 0.0
    covered = 0
    cur_a, cur_b = ivals[0]
    for a, b in ivals[1:]:
        if a > cur_b:
            covered += cur_b - cur_a
            cur_a, cur_b = a, b
        else:
            cur_b = max(cur_b, b)
    covered += cur_b - cur_a
    span = max(e for _, e in ivals) - ivals[0][0]
    return covered / 1000, (span - covered) / 1000


def main() -> None:
    dir_a, dir_b = sys.argv[1], sys.argv[2]
    out_json = None
    if "--json" in sys.argv:
        out_json = sys.argv[sys.argv.index("--json") + 1]
    a_stages = load_stages(dir_a)
    b_stages = load_stages(dir_b)

    # align by (name, tasks, shuffle-write bytes) + occurrence order —
    # robust to stage-ID renumbering AND to concurrent broadcast-future
    # jobs submitting in a different interleave at different core counts
    # (occurrence-only alignment mispaired those; shuffle bytes are
    # deterministic for identical input, so they fingerprint the stage)
    def keyed(stages):
        seen: dict[tuple, int] = {}
        out = {}
        for s in stages:
            k = (s.get("name"), s.get("tasks"), s.get("sw_b", 0))
            i = seen.get(k, 0)
            seen[k] = i + 1
            out[(k, i)] = s
        return out

    ka, kb = keyed(a_stages), keyed(b_stages)
    both = sorted(set(ka) & set(kb),
                  key=lambda k: -(ka[k].get("task_ms", 0)))
    only_a = sorted(set(ka) - set(kb))
    only_b = sorted(set(kb) - set(ka))

    tot_a = sum(s.get("task_ms", 0) for s in a_stages) / 1000
    tot_b = sum(s.get("task_ms", 0) for s in b_stages) / 1000
    gc_a = sum(s.get("gc_ms", 0) for s in a_stages) / 1000
    gc_b = sum(s.get("gc_ms", 0) for s in b_stages) / 1000
    in_a, out_a = wall_split(a_stages)
    in_b, out_b = wall_split(b_stages)
    print(f"total task core-s: A={tot_a:.1f} B={tot_b:.1f} "
          f"inflation={tot_b / max(tot_a, 1e-9):.3f}")
    print(f"total GC   core-s: A={gc_a:.1f} B={gc_b:.1f}")
    print(f"wall in-stage/outside-stage s: A={in_a:.1f}/{out_a:.1f} "
          f"B={in_b:.1f}/{out_b:.1f}")
    if only_a or only_b:
        print(f"unmatched stages: {len(only_a)} only in A, {len(only_b)} only in B "
              f"({sum(ka[k].get('task_ms', 0) for k in only_a) / 1000:.1f} / "
              f"{sum(kb[k].get('task_ms', 0) for k in only_b) / 1000:.1f} core-s)")
    print(f"\n{'A core-s':>9} {'B core-s':>9} {'ratio':>6} {'A gc':>6} {'B gc':>6} "
          f"{'B max_task':>10}  stage")
    rows = []
    for k in both:
        sa, sb = ka[k], kb[k]
        ta, tb = sa.get("task_ms", 0) / 1000, sb.get("task_ms", 0) / 1000
        if ta < 1 and tb < 1:
            continue
        r = tb / max(ta, 1e-9)
        rows.append({"name": k[0][0], "tasks": k[0][1], "occurrence": k[1],
                     "a_core_s": round(ta, 1), "b_core_s": round(tb, 1),
                     "ratio": round(r, 3),
                     "a_gc_s": round(sa.get("gc_ms", 0) / 1000, 1),
                     "b_gc_s": round(sb.get("gc_ms", 0) / 1000, 1),
                     "b_max_task_s": round(sb.get("max_task_ms", 0) / 1000, 1)})
    for row in sorted(rows, key=lambda r: -(r["b_core_s"] - r["a_core_s"])):
        print(f"{row['a_core_s']:9.1f} {row['b_core_s']:9.1f} {row['ratio']:6.2f} "
              f"{row['a_gc_s']:6.1f} {row['b_gc_s']:6.1f} {row['b_max_task_s']:10.1f}  "
              f"{row['name']} x{row['tasks']} #{row['occurrence']}")
    if out_json:
        with open(out_json, "w") as f:
            json.dump({"total_a_core_s": round(tot_a, 1),
                       "total_b_core_s": round(tot_b, 1),
                       "inflation": round(tot_b / max(tot_a, 1e-9), 3),
                       "gc_a_core_s": round(gc_a, 1),
                       "gc_b_core_s": round(gc_b, 1),
                       "wall_in_stage_s": [round(in_a, 1), round(in_b, 1)],
                       "wall_outside_stage_s": [round(out_a, 1), round(out_b, 1)],
                       "stages": rows}, f, indent=1)


if __name__ == "__main__":
    main()
