"""Profile the KG-construction pipeline's job/stage timeline.

Runs build_graph once with the Spark event log enabled, then parses the
log to answer the scaling-efficiency questions:
- how many jobs / query stages does one build trigger?
- how much wall time is between jobs/stages (serial driver time — the
  part that does not scale with cores)?
- per-stage task-time sum vs stage wall (parallel efficiency / tail).

Usage: python tools/profile_pipeline.py [n_docs] [cpus]
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    from datetime import datetime

    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 150_000
    cpus = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    # extra spark confs: k=v k=v ... ; n_parts override via PARTS=n
    extra_conf = dict(kv.split("=", 1) for kv in sys.argv[3:])
    parts_override = int(extra_conf.pop("PARTS", 0)) or None

    log_dir = f"/tmp/kgspark_eventlog_{os.getpid()}"
    os.makedirs(log_dir, exist_ok=True)

    from kgspark.pipeline import build_graph
    from kgspark.session import get_spark
    from kgspark.synth import synth_pages

    n_parts = parts_override or max(32, n_docs // 10_000)
    n_groups = max(16, n_docs // 250)
    spark = get_spark(
        "kgspark-profile", master=f"local[{cpus}]", shuffle_partitions=n_parts,
        extra={"spark.eventLog.enabled": "true", "spark.eventLog.dir": log_dir,
               "spark.eventLog.compress": "false", **extra_conf},
    )
    pages = synth_pages(spark, n_docs=n_docs, n_groups=n_groups, seed=42,
                        partitions=n_parts * 2).localCheckpoint(eager=True)

    t0_epoch_ms = time.time() * 1000  # filter out pre-pipeline (synth) events
    t0 = time.perf_counter()
    g = build_graph(pages, now=datetime(2024, 6, 1))
    g["edges"].count()
    g["nodes"].count()
    wall = time.perf_counter() - t0
    spark.stop()
    time.sleep(1)

    jobs: dict[int, dict] = {}
    stages: dict[int, dict] = {}
    executions: dict[str, str] = {}
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
                if e == "SparkListenerJobStart":
                    props = ev.get("Properties") or {}
                    jobs[ev["Job ID"]] = {
                        "start": ev["Submission Time"],
                        "site": props.get("callSite.short", ""),
                        "desc": props.get("spark.job.description", ""),
                        "exec_id": props.get("spark.sql.execution.id", ""),
                        "stages": [s["Stage ID"] for s in ev.get("Stage Infos", [])],
                    }
                elif e and e.endswith("SparkListenerSQLExecutionStart"):
                    plan = ev.get("physicalPlanDescription", "")
                    # grab the most informative operator lines; "InPandas"
                    # substring-matches the real pandas operators
                    # (FlatMapGroupsInPandas, MapInPandas, ...), and the
                    # regex strip removes codegen ids ("*(3) HashAggregate")
                    # so the uniq dedup below actually collapses repeats
                    ops = [re.sub(r"^[+\-: ]*\*?(\(\d+\)\s*)?", "",
                                  ln.strip()).split("(")[0].strip()
                           for ln in plan.splitlines()
                           if any(k in ln for k in ("ArrowEvalPython", "InPandas",
                                                    "Window", "SortMergeJoin",
                                                    "BroadcastHashJoin", "HashAggregate",
                                                    "ObjectHashAggregate", "Generate"))]
                    uniq: list[str] = []
                    for o in ops:
                        if o not in uniq:
                            uniq.append(o)
                    executions[str(ev["executionId"])] = ",".join(uniq[:5])
                elif e == "SparkListenerJobEnd":
                    jobs.setdefault(ev["Job ID"], {})["end"] = ev["Completion Time"]
                elif e == "SparkListenerStageCompleted":
                    si = ev["Stage Info"]
                    stages.setdefault(si["Stage ID"], {}).update({
                        "start": si.get("Submission Time"),
                        "end": si.get("Completion Time"),
                        "tasks": si.get("Number of Tasks"),
                        "name": si.get("Stage Name", "")[:60],
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
                    sr = m.get("Shuffle Read Metrics") or {}
                    st["sw_b"] = st.get("sw_b", 0) + sw.get("Shuffle Bytes Written", 0)
                    st["sr_b"] = st.get("sr_b", 0) + (
                        sr.get("Remote Bytes Read", 0) + sr.get("Local Bytes Read", 0))
                    st["spill_b"] = st.get("spill_b", 0) + (
                        m.get("Memory Bytes Spilled", 0) + m.get("Disk Bytes Spilled", 0))
                    st["in_b"] = st.get("in_b", 0) + (
                        (m.get("Input Metrics") or {}).get("Bytes Read", 0))

    done = sorted((j for j in jobs.values() if "start" in j and "end" in j
                   and j["start"] >= t0_epoch_ms),
                  key=lambda j: j["start"])
    stages = {k: s for k, s in stages.items()
              if s.get("start") and s["start"] >= t0_epoch_ms}
    if not done:
        print("no job events parsed")
        return
    total_span = (done[-1]["end"] - done[0]["start"]) / 1000
    in_job = sum(j["end"] - j["start"] for j in done) / 1000
    gaps = []
    for a, b in zip(done, done[1:]):
        gaps.append(max(0, b["start"] - a["end"]))
    sdone = sorted((s for s in stages.values() if s.get("start") and s.get("end")),
                   key=lambda s: s["start"])
    stage_wall = sum(s["end"] - s["start"] for s in sdone) / 1000
    sgaps = [max(0, b["start"] - a["end"]) for a, b in zip(sdone, sdone[1:])]
    task_s = sum(s.get("task_ms", 0) for s in stages.values()) / 1000
    gc_s = sum(s.get("gc_ms", 0) for s in stages.values()) / 1000
    sw_mb = sum(s.get("sw_b", 0) for s in stages.values()) / 1e6
    spill_mb = sum(s.get("spill_b", 0) for s in stages.values()) / 1e6

    print(json.dumps({
        "wall_s": round(wall, 1),
        "n_jobs": len(done),
        "job_span_s": round(total_span, 1),
        "in_job_s": round(in_job, 1),
        "between_job_gap_s": round(sum(gaps) / 1000, 1),
        "n_stages": len(sdone),
        "stage_wall_sum_s": round(stage_wall, 1),
        "between_stage_gap_s": round(sum(sgaps) / 1000, 1),
        "task_time_core_s": round(task_s, 1),
        "gc_core_s": round(gc_s, 1),
        "parallelism_achieved": round(task_s / max(stage_wall, 1e-9), 2),
        "shuffle_write_mb": round(sw_mb, 1),
        "spill_mb": round(spill_mb, 1),
        "cpus": cpus,
        "n_docs": n_docs,
    }, indent=1))
    print("\n-- jobs (chronological) --")
    for j in done:
        jw = (j["end"] - j["start"]) / 1000
        jt = sum(stages.get(sid, {}).get("task_ms", 0) for sid in j.get("stages", []))
        nt = sum(stages.get(sid, {}).get("tasks") or 0 for sid in j.get("stages", []))
        label = j.get("desc") or executions.get(j.get("exec_id", ""), "") or j.get("site", "")
        print(f"  job {jw:7.2f}s tasks={nt:4} task_core_s={jt / 1000:7.1f} "
              f"[x{j.get('exec_id', '?')}] {label[:100]}")

    print("\n-- top stages by task core-s --")
    for sid, s in sorted(stages.items(), key=lambda kv: -kv[1].get("task_ms", 0))[:12]:
        print(f"  stage {sid:4} {s.get('task_ms', 0)/1000:7.1f} core-s "
              f"tasks={s.get('tasks'):4} max_task={s.get('max_task_ms', 0)/1000:6.1f}s "
              f"{s.get('name', '')}")

    print("\n-- top stages by shuffle bytes (write + read) --")
    bykey = sorted(stages.items(),
                   key=lambda kv: -(kv[1].get("sw_b", 0) + kv[1].get("sr_b", 0)))
    for sid, s in bykey[:12]:
        tot = s.get("sw_b", 0) + s.get("sr_b", 0)
        if tot == 0:
            break
        print(f"  stage {sid:4} write={s.get('sw_b', 0)/1e6:8.1f}MB "
              f"read={s.get('sr_b', 0)/1e6:8.1f}MB spill={s.get('spill_b', 0)/1e6:7.1f}MB "
              f"core_s={s.get('task_ms', 0)/1000:7.1f} {s.get('name', '')}")


if __name__ == "__main__":
    main()
