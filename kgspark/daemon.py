"""Preloading Python-worker daemon (``spark.python.daemon.module``).

Spark forks each Python UDF worker from a per-executor daemon process;
the fork itself is cheap, but every worker then *imports* what the UDF
needs — pandas, numpy, pyarrow, and this engine's extraction modules —
and on a filesystem with slow metadata ops a 32-wide stage means 32
concurrent import storms that serialize on open() (measured: a ~15 s
all-task stall on the first stage of each new worker cohort; a second
cohort appears whenever a stage chains two Python evals, needing 2
workers per task). Importing the heavy modules HERE, once, in the
daemon, lets every forked worker inherit them via copy-on-write — the
same trick as gunicorn's ``preload_app``. Saves both the import wall
time and ~50 MB × workers of private RSS.

Set by ``kgspark.session.get_spark`` (local mode / driver-side
sessions). CLUSTER CAVEAT: ``--py-files`` artifacts are attached to
workers *after* the daemon forks them, so the daemon process itself
cannot import from the zip — on a cluster, either install the package
on executors (pip / ``spark.executorEnv.PYTHONPATH`` pointing at the
zip) before adding ``--conf spark.python.daemon.module=kgspark.daemon``,
or skip the conf entirely (plain ``--py-files`` runs fine without it,
just without preloading). ``KGSPARK_PRELOAD_DAEMON=0`` disables the
local default. Dep imports are individually try-guarded — preloading
is an optimization, never a requirement.
"""

from __future__ import annotations

for _mod in (
    "numpy",
    "pandas",
    "pyarrow",
    "pyspark.sql.pandas.serializers",
    "pyspark.sql.pandas.types",
    # engine modules imported inside UDF bodies (extraction, embedding,
    # minhash banding) — everything the hot pipeline's workers touch
    "kgspark.operators._extract_core",
    "kgspark.functions.dates",
):
    try:
        __import__(_mod)
    except Exception:  # pragma: no cover - absent optional dep
        pass

from pyspark.daemon import manager  # noqa: E402

if __name__ == "__main__":
    manager()
