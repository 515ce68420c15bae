"""SparkSession factory tuned for the rollup workload.

The sandbox runs local[N]; on a real cluster the same confs apply (the
builder only sets master when none is configured, so ``spark-submit
--master yarn ...`` wins).
"""

from __future__ import annotations

import ctypes
import os

from pyspark.sql import SparkSession

#: numpy kernels allocate/free ~100MB temporaries per Arrow batch; with
#: glibc's default 128KB mmap threshold every temporary is a fresh
#: mmap/munmap + page-fault storm (measured 3-15x kernel slowdown in this
#: VM). Raising the thresholds keeps the arena mapped and reused.
_MALLOC_ENV = {
    "MALLOC_MMAP_THRESHOLD_": "1073741824",
    "MALLOC_TRIM_THRESHOLD_": "1073741824",
}


def tune_malloc() -> None:
    """Apply the large-allocation malloc tuning to THIS process (numpy on
    the driver / in pytest) and export it for children (Python workers
    forked by the executor JVM inherit the env)."""
    os.environ.update(_MALLOC_ENV)
    try:
        libc = ctypes.CDLL("libc.so.6", use_errno=True)
        libc.mallopt(-3, 1 << 30)  # M_MMAP_THRESHOLD
        libc.mallopt(-1, 1 << 30)  # M_TRIM_THRESHOLD
    except OSError:  # non-glibc platform: env vars alone must do
        pass


def get_spark(app_name: str = "tsf",
              cores: int | None = None,
              shuffle_partitions: int | None = None,
              arrow_batch_rows: int = 1024,
              extra: dict[str, str] | None = None) -> SparkSession:
    tune_malloc()  # before the JVM (and its python workers) are launched
    cores = cores or int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Master resolution, first match wins: TSF_MASTER env (explicit
    # override) > spark-submit's configured spark.master (--master yarn
    # / spark-defaults.conf — a builder .master() would silently REPLACE
    # it, turning a "cluster" job into a driver-local local[N] run) >
    # local[cores] for the sandbox. A spark-submit-launched driver is
    # recognizable by the gateway env it attaches to (PYSPARK_GATEWAY_
    # PORT); only there can an external spark.master exist, and there
    # SparkConf(loadDefaults) reads the submit JVM's real properties
    # (in a plain python process the gateway is not up yet and
    # loadDefaults would silently read nothing).
    master = os.environ.get("TSF_MASTER")
    ext_master = None
    if master is None:
        submitted = "PYSPARK_GATEWAY_PORT" in os.environ
        if submitted:
            # attach to the submit JVM so SparkConf(loadDefaults) reads
            # its real properties — before the attach it reads nothing
            from pyspark import SparkConf
            from pyspark.context import SparkContext
            SparkContext._ensure_initialized()
            ext_master = SparkConf(loadDefaults=True).get(
                "spark.master", None)
        if ext_master is None:
            master = f"local[{cores}]"
    builder = (
        SparkSession.builder.appName(app_name)
        # UTC so timestamp comparisons against DuckDB (UTC-naive) line up.
        .config("spark.sql.session.timeZone", "UTC")
        # ~2 shuffle partitions per core locally; AQE coalesces the rest.
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or 2 * cores))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow everywhere; bounded batches so long token arrays cannot
        # blow up the Python worker (1024 rows x ~100KB chunk ~= 100MB
        # peak per worker — measured ~10% faster tier-0 than 512 in an
        # interleaved A/B, and 2048 gains nothing further).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", str(arrow_batch_rows))
        # 32MB file splits (not the 128MB default): the tier-0 UDF stage
        # expands parquet tokens ~4x into float64 window matrices, and
        # coarse splits leave a one-task straggler wave on small clusters
        # (measured: 9 tasks over 8 slots = 42% idle in the tail wave).
        .config("spark.sql.files.maxPartitionBytes", "33554432")
        .config("spark.driver.memory", os.environ.get("TSF_DRIVER_MEM", "16g"))
        # The r6 flat-dot/flat-score expressions compile into large
        # generated classes (seconds of Janino work each). The default
        # 100-entry codegen cache evicts them between a query's sf-dir
        # and x10 runs in a 110-query suite, re-paying the compile; the
        # cache holds compiled classes (small), so a few thousand
        # entries cost MBs and keep every operator's code hot for the
        # whole application lifetime (any cluster size — this is
        # per-JVM, not data-dependent).
        .config("spark.sql.codegen.cache.maxEntries", "4000")
        .config("spark.ui.enabled", "false")
    )
    if master is not None:
        builder = builder.master(master)
    # Python UDF workers on real executors get the malloc tuning too
    for k, v in _MALLOC_ENV.items():
        builder = builder.config(f"spark.executorEnv.{k}", v)
    # In local mode every task pairs a JVM Arrow-serialization thread with
    # a Python worker process, so local[32] runs ~64 busy threads on 32
    # cores — measured 2-4x slowdown + erratic latency on UDF stages.
    # task.cpus=2 co-schedules the pair (a real cluster instead sizes
    # executors at 1 python worker per core with their own memory bus).
    # local[N] only — NOT local-cluster[...]: in a scaling pair one side
    # crossing the cores>=16 line would halve its task slots and corrupt
    # the N-vs-4N efficiency comparison (bench/scaling.py pins
    # TSF_TASK_CPUS itself for both sizes). The gate reads N from the
    # MASTER string, not the `cores` default: under TSF_MASTER=local[2]
    # a 32-core `cores` default would otherwise set task.cpus=2 on a
    # 2-slot scheduler (halved parallelism; a 1-slot one never
    # schedules at all).
    local_n = None
    sched = master or ext_master
    if sched is not None and sched.startswith("local["):
        inside = sched[len("local["):-1]
        local_n = os.cpu_count() if inside == "*" else int(inside)
    if local_n is not None and local_n >= 16 \
            and "spark.task.cpus" not in (extra or {}):
        builder = builder.config(
            "spark.task.cpus", os.environ.get("TSF_TASK_CPUS", "2"))
    for k, v in (extra or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
