"""spark-submit packaging surface: deterministic zip artifact, import
from the zip (the executor-side contract of --py-files), and the job
script's checkpointed run over a tiny synth corpus."""

from __future__ import annotations

import hashlib
import os
import subprocess
import sys
import zipfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_zip_is_deterministic_and_complete(tmp_path):
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_submit

    z1 = make_submit.build(str(tmp_path / "a.zip"))
    z2 = make_submit.build(str(tmp_path / "b.zip"))
    h = lambda p: hashlib.sha256(open(p, "rb").read()).hexdigest()
    assert h(z1) == h(z2), "re-running make_submit must be byte-identical"

    names = set(zipfile.ZipFile(z1).namelist())
    # every module of the package ships; nothing else does
    for root, dirs, files in os.walk(os.path.join(REPO, "kgspark")):
        dirs[:] = [d for d in dirs if d != "__pycache__"]
        for f in files:
            if f.endswith(".py"):
                rel = os.path.relpath(os.path.join(root, f), REPO)
                assert rel in names, f"missing from zip: {rel}"
    assert all(n.startswith("kgspark/") and n.endswith(".py") for n in names)


def test_import_from_zip_subprocess(tmp_path):
    """Import the package from the zip in a clean interpreter whose cwd
    is NOT the repo — exactly what a remote executor does."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import make_submit

    z = make_submit.build(str(tmp_path / "kgspark.zip"))
    code = (
        "import sys; sys.path.insert(0, %r); "
        "import kgspark.pipeline, kgspark.checkpoint, kgspark.session, "
        "kgspark.search.search, kgspark.datapipe.dedupe; "
        "print('ok')" % z
    )
    out = subprocess.run([sys.executable, "-c", code], cwd=str(tmp_path),
                         capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stderr
    assert out.stdout.strip() == "ok"


def test_tune_session_applies_confs(spark):
    from kgspark.session import SQL_CONFS, tune_session

    s = tune_session(spark, shuffle_partitions=7)
    assert s.conf.get("spark.sql.shuffle.partitions") == "7"
    for k in SQL_CONFS:
        assert s.conf.get(k) is not None
    # restore the suite's shuffle setting
    s.conf.set("spark.sql.shuffle.partitions", "8")


def test_submit_job_script_runs_and_resumes(spark, tmp_path):
    """Drive the job script's main() in-process (the SparkSession is
    taken from getOrCreate exactly as under spark-submit) with --synth;
    a second identical run must skip every completed partition."""
    sys.path.insert(0, os.path.join(REPO, "tools"))
    import json

    import submit_build_graph

    out_root = str(tmp_path / "store")
    argv = ["submit_build_graph.py", "--synth", "300", "--output", out_root,
            "--parts", "4", "--now", "2024-06-01T00:00:00"]
    old, sys.argv = sys.argv, argv
    import io
    from contextlib import redirect_stdout
    try:
        buf = io.StringIO()
        with redirect_stdout(buf):
            submit_build_graph.main()
        first = json.loads(buf.getvalue().strip().splitlines()[-1])
        buf = io.StringIO()
        with redirect_stdout(buf):
            submit_build_graph.main()
        second = json.loads(buf.getvalue().strip().splitlines()[-1])
    finally:
        sys.argv = old
    assert first["parts_processed"] >= 1
    assert first["n_edges"] > 0
    assert second["parts_skipped_resume"] == sorted(
        range(first["n_parts"])), "identical resubmit must resume-skip all parts"
    assert second["parts_processed"] == 0
