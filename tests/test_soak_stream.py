"""Long-run streaming soak (VERDICT r3 item 7) — many micro-batches
with periodic compaction must keep files bounded, per-batch wall flat,
and the final graph equal to a one-shot build. 12 batches by default so
the suite stays fast; KGSPARK_SOAK=1 runs the full 50 (the committed
evidence row in BENCH_INCREMENTAL.json is produced by
tools/soak_stream.py at 50)."""

import os

from tools.soak_stream import run_soak

K = 50 if os.environ.get("KGSPARK_SOAK") else 12


def test_stream_soak_bounded_and_flat(spark, tmp_path):
    row = run_soak(spark, str(tmp_path), n_batches=K, compact_every=4)
    # run_soak asserts the invariants; re-state the headline ones so a
    # contract change in run_soak can't silently weaken this test
    assert row["graph_equals_oneshot"]
    assert row["flatness_ratio"] < 1.5
    assert row["max_files_per_partition_after"] <= 1
