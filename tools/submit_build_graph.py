"""Cluster job script: KG construction via ``spark-submit --py-files``
(the north rule's deployment shape — a multi-executor cluster runs this
file with dist/kgspark.zip on the executors' PYTHONPATH).

    python tools/make_submit.py
    spark-submit --master <cluster-master> \
        --py-files dist/kgspark.zip \
        tools/submit_build_graph.py \
        --input  /path/to/pages_parquet_or_table \
        --output /path/to/graph_store_root \
        [--now 2024-06-01T00:00:00] [--parts 64] [--run-id run-3] \
        [--shuffle-partitions 512] [--synth N_DOCS]

Semantics: checkpointed, resumable construction (CheckpointedPipeline —
per-partition lineage + extraction metrics; re-submitting the identical
command after a crash skips completed partitions via input
fingerprints). ``--synth N`` generates the deterministic synthetic
corpus instead of reading ``--input`` (smoke-testing the submit path on
a laptop/CI without a corpus).

The script takes its SparkSession from spark-submit (master, executor
count/memory, driver memory all belong on the submit command line) and
applies only the engine's runtime-settable SQL confs (tune_session).
Cite: reference ingestion entry Graphiti.add_episode_bulk
(graphiti.py:487-598) — this job is its whole-corpus batch analogue.
"""

from __future__ import annotations

import argparse
import json
from datetime import datetime

from pyspark.sql import SparkSession

from kgspark.checkpoint import CheckpointedPipeline
from kgspark.session import tune_session


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="pages table: parquet path (or a "
                    "catalog table name when a catalog is configured)")
    ap.add_argument("--output", required=True, help="graph store root")
    ap.add_argument("--now", default=None,
                    help="invalidation clock, ISO-8601 (default: max warc_ts)")
    ap.add_argument("--parts", type=int, default=64,
                    help="checkpoint partitions (group-aligned)")
    ap.add_argument("--run-id", default="run-0")
    ap.add_argument("--shuffle-partitions", type=int, default=None)
    ap.add_argument("--synth", type=int, default=None,
                    help="generate N synthetic docs instead of --input")
    args = ap.parse_args()
    if not args.input and not args.synth:
        ap.error("one of --input / --synth is required")

    spark = tune_session(
        SparkSession.builder.appName("kgspark-build-graph").getOrCreate(),
        shuffle_partitions=args.shuffle_partitions,
    )

    if args.synth:
        from kgspark.synth import synth_pages
        pages = synth_pages(spark, n_docs=args.synth,
                            n_groups=max(16, args.synth // 250), seed=42)
    elif args.input.endswith((".parquet", "/")) or "/" in args.input:
        pages = spark.read.parquet(args.input)
    else:
        pages = spark.read.table(args.input)

    now = datetime.fromisoformat(args.now) if args.now else None
    pipe = CheckpointedPipeline(spark, args.output, n_parts=args.parts)
    metrics = pipe.run(pages, now=now, run_id=args.run_id)

    done = sorted(metrics["parts"])
    print(json.dumps({
        "run_id": metrics["run_id"],
        "n_parts": metrics["n_parts"],
        "parts_processed": len(done),
        "parts_skipped_resume": metrics["skipped"],
        "n_pages": sum(r["n_pages"] for r in metrics["parts"].values()),
        "n_nodes": sum(r["n_nodes"] for r in metrics["parts"].values()),
        "n_edges": sum(r["n_edges"] for r in metrics["parts"].values()),
        "wall_s": round(sum(r["wall_s"] for r in metrics["parts"].values()), 3),
        "output": args.output,
    }))


if __name__ == "__main__":
    main()
