"""Homonym-split threshold sweep (VERDICT r4 item 8) → EVAL_HOMONYM.json.

Runs kgspark.evals.run_homonym_eval: 40 same-group names × 6 mention
pages (20 true homonym pairs with disjoint context themes, 20 single
entities), split_homonyms under a GENERIC bag-of-words hash embedder,
sweeping τ and reporting split precision / recall / mention purity.

Usage: python tools/homonym_eval.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    from kgspark.evals import run_homonym_eval
    from kgspark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "8"))
    spark = get_spark("homonym-eval", master=f"local[{cpus}]",
                      shuffle_partitions=cpus)
    res = run_homonym_eval(spark)
    out = os.path.join(REPO, "EVAL_HOMONYM.json")
    with open(out, "w") as f:
        json.dump(res, f, indent=2)
    print(json.dumps(res))


if __name__ == "__main__":
    main()
