"""SparkSession factory tuned for the engine.

The reference hand-tunes four levels of goroutine pools
(/root/reference/config/config.go:96-114) and a custom worker pool
(/root/reference/pool/pool.go). On Spark all of that collapses into
executor parallelism + AQE; the knobs that matter are shuffle
partitions, adaptive execution, and Arrow for the Pandas-UDF paths.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_parallelism() -> int:
    try:
        return int(os.environ.get("SPARK_GRAFT_CPUS", "") or os.cpu_count() or 8)
    except ValueError:
        return os.cpu_count() or 8


def get_spark(
    app_name: str = "transferdb-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-oriented defaults.

    Defaults chosen for a large cluster but correct on local[N]:
    - AQE on (runtime coalesce, skew-join splitting) — replaces the
      reference's static chunk-count tuning.
    - shuffle.partitions = cores locally; on a real cluster this is
      overridden by AQE coalescing from the initial number.
    - Arrow on for all pandas UDF/`applyInPandas` extension operators.
    """
    cpus = _default_parallelism()
    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # let AQE coalesce the output partitioning of CACHED plans too
        # (off by default): persisted iteration tables (word counts,
        # classifier features, shingle indexes) otherwise pin
        # shuffle.partitions near-empty partitions into the cache, and
        # every later pass over them pays one task + one Python/Arrow
        # round-trip per empty partition. Scale-adaptive by
        # construction — AQE sizes partitions from bytes, so at real
        # volume the cache keeps its parallelism (round-9 A/B:
        # iterative trainers -15-30% at sf0.1, no regressions).
        .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions or cpus))
        .config("spark.default.parallelism", str(cpus))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    if master:
        builder = builder.master(master)
    elif not os.environ.get("SPARK_MASTER"):
        builder = builder.master(f"local[{cpus}]")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
