"""E2E graph-building + retrieval eval CLI (reference eval_cli.py /
eval_e2e_graph_building.py, deterministic restatement — see
kgspark/evals.py).

Usage:
  python tools/eval_e2e.py                  # score vs committed goldens
  python tools/eval_e2e.py --write-goldens  # (re)record golden orderings

Writes EVAL_E2E.json at the repo root with triple P/R, invalidation
accuracy, and the search-ordering-match score.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

GOLDEN_PATH = os.path.join(REPO, "tests", "goldens", "eval_search_orderings.json")


def main() -> None:
    from kgspark.evals import compare_orderings, load_goldens, run_eval
    from kgspark.session import get_spark

    spark = get_spark("eval-e2e", master="local[8]", shuffle_partitions=8)
    with tempfile.TemporaryDirectory() as root:
        metrics = run_eval(spark, root)

    orderings = metrics.pop("search_orderings")
    if "--write-goldens" in sys.argv:
        os.makedirs(os.path.dirname(GOLDEN_PATH), exist_ok=True)
        with open(GOLDEN_PATH, "w") as f:
            json.dump(orderings, f, indent=2, sort_keys=True)
        print(f"goldens written: {GOLDEN_PATH}")

    golden = load_goldens(GOLDEN_PATH)
    metrics["search_ordering_match"] = (
        compare_orderings(orderings, golden) if golden else None)
    metrics["pass"] = bool(
        metrics["triple_precision"] >= 0.95
        and metrics["triple_recall"] >= 0.95
        and metrics["invalidation_accuracy"] == 1.0
        and (metrics["search_ordering_match"] or 0) == 1.0
    )
    out = os.path.join(REPO, "EVAL_E2E.json")
    with open(out, "w") as f:
        json.dump(metrics, f, indent=2)
    print(json.dumps(metrics))
    sys.exit(0 if metrics["pass"] else 1)


if __name__ == "__main__":
    main()
