"""SparkSession factory tuned for this engine.

Local-mode testing defaults; at cluster scale the same builder is used
with ``master`` unset (taken from spark-submit) and shuffle partitions
sized to executors*cores*2.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """One shared heap default for BOTH the submit-args path (the only
    one local mode honors — see the comment in get_spark) and the
    .config mirror, sized from the host so a smaller machine doesn't get
    a 48g -Xmx it can't satisfy: ~40% of MemTotal clamped to [4g, 48g]
    (this 128g sandbox → 48g, which the round-1 GC measurements need).
    Override with KGSPARK_DRIVER_MEM."""
    env = os.environ.get("KGSPARK_DRIVER_MEM")
    if env:
        return env
    try:
        with open("/proc/meminfo") as f:
            kb = int(next(ln for ln in f if ln.startswith("MemTotal")).split()[1])
        return f"{max(4, min(48, int(kb / 1024 / 1024 * 0.4)))}g"
    except Exception:
        return "8g"


def _default_local_dir() -> str | None:
    """Shuffle/spill scratch directory. Local-mode shuffle writes two
    files per map task per stage; on a slow virtio/overlay root FS the
    file *creation* syscalls serialize and become the bottleneck —
    jstack sampling showed 26 of 28 executor threads RUNNABLE inside
    ``DiskBlockObjectWriter.initialize → FileOutputStream.open0`` (4×
    wall inflation at local[32]). tmpfs makes block-file metadata ops
    memory-speed, the single-box analogue of the NVMe shuffle disks a
    real cluster provisions. Override with KGSPARK_LOCAL_DIR (empty
    string → Spark default)."""
    env = os.environ.get("KGSPARK_LOCAL_DIR")
    if env is not None:
        return env or None
    shm = "/dev/shm"
    if os.path.isdir(shm) and os.access(shm, os.W_OK):
        return os.path.join(shm, "kgspark-scratch")
    return None


# SQL confs that are runtime-settable (spark.conf.set) on a session the
# engine did not create — e.g. one handed to a spark-submit job script
# (tools/submit_build_graph.py). JVM-launch confs (driver memory,
# local.dir, master) are deliberately absent: in a submitted job those
# belong on the spark-submit command line.
SQL_CONFS: dict[str, str] = {
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.parallelismFirst": "false",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "32m",
    "spark.sql.adaptive.coalescePartitions.minPartitionSize": "4m",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "10000",
    "spark.sql.autoBroadcastJoinThreshold": str(64 * 1024 * 1024),
    # Partition discovery below this many paths lists on the driver
    # instead of launching a Spark job. The store's group-partitioned
    # tables have n_gparts=64 subdirectories, just over the default of
    # 32, so EVERY full-table read was paying one ~60 ms listing job —
    # a dozen per point update. Driver-side listing of a few hundred
    # dirs is microseconds on any FS; a real 100 TB deployment with
    # thousands of partitions still gets the parallel path.
    "spark.sql.sources.parallelPartitionDiscovery.threshold": "512",
}

# STATIC confs: must be set at JVM/session build (builder .config or
# spark-submit --conf) — runtime spark.conf.set raises CANNOT_MODIFY.
STATIC_CONFS: dict[str, str] = {
    # PySpark call-site capture (DataFrameQueryContext) costs ~3 extra
    # py4j round-trips (a conf.get RPC + origin set/clear) PLUS a Python
    # stack walk on EVERY wrapped DataFrame/Column call — cProfile on the
    # point-update path showed ~10k py4j turns per add_episode with this
    # on, a large slice of the driver-side wall (BASELINE fact 24: wall
    # is driver-bound, not job-bound, at point-update sizes). The only
    # loss is the "was called from user_code.py:N" line in error
    # messages; KGSPARK_DF_DEBUG=1 restores it for interactive debugging.
    # Submitted jobs (tune_session path) pass it on the spark-submit
    # command line: --conf spark.python.sql.dataFrameDebugging.enabled=false
    "spark.python.sql.dataFrameDebugging.enabled": (
        "true" if os.environ.get("KGSPARK_DF_DEBUG") == "1" else "false"),
}


def tune_session(spark: SparkSession,
                 shuffle_partitions: int | None = None) -> SparkSession:
    """Apply the engine's runtime-settable SQL confs to an existing
    session (the spark-submit path: the JVM already exists, so only
    conf.set-able settings apply). Local-mode callers should use
    get_spark, which also controls the JVM-launch confs."""
    for k, v in SQL_CONFS.items():
        spark.conf.set(k, v)
    if shuffle_partitions:
        spark.conf.set("spark.sql.shuffle.partitions", str(shuffle_partitions))
    return spark


def get_spark(
    app_name: str = "kgspark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra: dict[str, str] | None = None,
) -> SparkSession:
    # CRITICAL: in PySpark local mode the JVM is forked at getOrCreate,
    # so `spark.driver.memory` passed via builder .config() is applied
    # AFTER the JVM exists and is silently ignored — the driver runs on
    # the 1g default. With 32 concurrent tasks that is a GC death spiral
    # (measured: 1132 GC core-seconds vs 605 CPU core-seconds on one
    # pipeline run). Heap must go through the spark-submit argv instead.
    mem = _default_driver_mem()
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = f"--driver-memory {mem} pyspark-shell"
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    if shuffle_partitions is None:
        # local[N] → N shuffle partitions; "local[*]" → machine cores
        n = cpus if master == f"local[{cpus}]" else "32"
        try:
            shuffle_partitions = int(str(master).split("[")[1].rstrip("]").replace("*", n))
        except Exception:
            shuffle_partitions = 32

    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # 32 concurrent tasks + cached page/episode strings in one JVM:
        # an 8g heap GC-thrashes (measured +20% wall); the box has 128g.
        .config("spark.driver.memory", mem)
        .config("spark.ui.enabled", "false")
        # tiny createDataFrame/range leaves default to defaultParallelism
        # = core count, which makes plan shapes differ between cluster
        # sizes (the N-vs-4N comparison needs identical plans) and pays
        # per-partition python fixed cost on UDF stages over tiny frames
        .config("spark.sql.leafNodeDefaultParallelism", "4")
    )
    # Shared SQL confs (also applied by tune_session on submitted jobs).
    # Notable: coalescePartitions.parallelismFirst=false shrinks tiny
    # shuffles to few tasks instead of >= defaultParallelism — measured
    # 1.5× end-to-end on the KG pipeline at local[32].
    for k, v in {**SQL_CONFS, **STATIC_CONFS}.items():
        b = b.config(k, v)
    local_dir = _default_local_dir()
    if local_dir:
        b = b.config("spark.local.dir", local_dir)
    # Preloading worker daemon: forked UDF workers inherit numpy/pandas/
    # pyarrow + the engine's extraction modules copy-on-write instead of
    # re-importing them per worker — kills the measured ~15s all-task
    # stall when a wide stage spawns a fresh worker cohort on a slow-
    # metadata FS (see kgspark/daemon.py). KGSPARK_PRELOAD_DAEMON=0
    # disables (e.g. if a cluster's PYTHONPATH lacks the kgspark zip).
    if os.environ.get("KGSPARK_PRELOAD_DAEMON", "1") != "0":
        b = b.config("spark.python.daemon.module", "kgspark.daemon")
    for k, v in (extra or {}).items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    _silence_bounded_window_warn(spark)
    return spark


def _silence_bounded_window_warn(spark: SparkSession) -> None:
    """WindowExec warns "No Partition Defined ... single partition" once
    per global-rank window. Every such window in this engine ranks a
    BOUNDED candidate list (≤ 2×limit rows by construction — see
    kgspark/search/rerank.py), so the warning is noise that buries real
    warnings in the bench tail. It cannot be silenced in the plan: a
    constant partition key like partitionBy(lit(0)) is folded away by
    Catalyst and non-deterministic keys are rejected in window specs —
    so raise that ONE logger's threshold instead (log4j2 Configurator
    via the py4j gateway)."""
    try:
        jvm = spark.sparkContext._jvm
        jvm.org.apache.logging.log4j.core.config.Configurator.setLevel(
            "org.apache.spark.sql.execution.window.WindowExec",
            jvm.org.apache.logging.log4j.Level.ERROR)
    except Exception:
        pass  # non-log4j2 deployment: keep the (harmless) warning
