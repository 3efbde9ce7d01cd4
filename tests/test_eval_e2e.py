"""E2E graph-building eval (reference eval_e2e_graph_building.py
shape): multi-session ingestion per user across all three episode
source types, then exact scoring — triple P/R ≥ 0.95 (the north-star
gate), invalidation correctness, and search-result ordering stability
vs committed goldens.

The pytest smoke runs a 3-user subset of the 12-user roster for
runtime; the committed EVAL_E2E.json (tools/eval_e2e.py) covers the
full roster. Orderings are compared against the full-roster goldens
(compare_orderings scores got-side keys only)."""

import os

from kgspark.evals import USERS, compare_orderings, load_goldens, run_eval

GOLDEN_PATH = os.path.join(os.path.dirname(__file__), "goldens",
                           "eval_search_orderings.json")


def test_e2e_eval(spark, tmp_path):
    metrics = run_eval(spark, str(tmp_path / "eval"), users=USERS[:3])
    assert metrics["triple_precision"] >= 0.95, metrics
    assert metrics["triple_recall"] >= 0.95, metrics
    assert metrics["invalidation_accuracy"] == 1.0, metrics
    golden = load_goldens(GOLDEN_PATH)
    assert golden, "run `python tools/eval_e2e.py --write-goldens` first"
    score = compare_orderings(metrics["search_orderings"], golden)
    assert score == 1.0, (metrics["search_orderings"], golden)
