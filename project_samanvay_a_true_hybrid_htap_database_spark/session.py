"""SparkSession factory tuned for the Samanvay workload.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]``; the same configs are the
ones we would set on a multi-executor cluster (AQE, skew-join handling,
broadcast threshold sized for dimension tables, parquet pushdown).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def _default_driver_mem() -> str:
    """Half of physical RAM in whole GiB, clamped to [2g, 32g]."""
    try:
        total = os.sysconf("SC_PAGE_SIZE") * os.sysconf("SC_PHYS_PAGES")
        gb = total // (1024**3)
    except (ValueError, OSError, AttributeError):
        gb = 8
    return f"{max(2, min(32, gb // 2))}g"


def get_spark(
    app_name: str = "samanvay-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", os.cpu_count() or 4))
    master = master or f"local[{cpus}]"
    # On a real cluster shuffle partitions scale with input size; AQE coalesces
    # them back down at runtime, so we size for the large case.
    shuffle_partitions = shuffle_partitions or max(cpus, 32)

    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        # local[...] runs driver AND executors in ONE JVM whose default
        # heap is 1g — a 32-core run with a 1g heap GC-thrashes on any
        # shuffle in the hundreds of MB (the 10x scaling probe died here,
        # not in any operator). Sized to HALF of physical RAM, capped at
        # 32g (a hardcoded 32g would invite the OS OOM-killer on smaller
        # hosts; review r6). sysconf can't see cgroup limits — containered
        # runners should set SPARK_GRAFT_DRIVER_MEM explicitly. Only takes
        # effect when the JVM is launched by this session (a pre-existing
        # JVM keeps its heap); on a cluster, executor memory comes from
        # spark-submit and this conf only affects the driver process.
        .config(
            "spark.driver.memory",
            os.environ.get("SPARK_GRAFT_DRIVER_MEM", _default_driver_mem()),
        )
        # Adaptive execution: runtime re-plan, partition coalescing, skew joins.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # Arrow for every pandas UDF / toPandas crossing.
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # Dimension tables (region/nation/supplier/part at any SF we test)
        # comfortably broadcast; at 100 TB the fact tables never would, which
        # is exactly the asymmetry broadcast joins want.
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.parquet.filterPushdown", "true")
        # Some events testdata generations store ts as TIMESTAMP(NANOS),
        # which Spark's parquet reader rejects by default; with this conf it
        # reads as a raw long and sources.load_table adapts (newer
        # generations use TIMESTAMP(MICROS), where this conf is a no-op).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.sql.parquet.aggregatePushdown", "true")
        .config("spark.sql.files.maxPartitionBytes", "128m")
        .config("spark.sql.session.timeZone", "UTC")
        # FAIR across scheduler pools: HTAP maintenance work (flush folds,
        # compactions) runs in its own pool (engine.py sets
        # spark.scheduler.pool on the flushing thread), so an O(base)
        # fold no longer holds every task slot while analytical reads
        # queue behind it in FIFO order — measured: a 3 s compacting fold
        # blocked ALL reads for its full duration under FIFO.
        .config("spark.scheduler.mode", "FAIR")
        .config("spark.ui.enabled", "false")
    )
    for key, value in (extra_conf or {}).items():
        builder = builder.config(key, value)
    return builder.getOrCreate()
