"""SparkSession factory tuned for the engine.

Local testing runs on ``local[$SPARK_GRAFT_CPUS]`` (default 32 threads); the same
configs are what we'd set on a 1000-executor cluster — AQE for runtime re-planning
(skew joins, partition coalescing), Arrow for the few pandas_udf stages, and a
shuffle-partition count that the caller can scale with data volume.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "memory-opensource-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    master = master or f"local[{cpus}]"
    shuffle_partitions = shuffle_partitions or int(
        os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", DEFAULT_SHUFFLE_PARTITIONS)
    )
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        # r13 OPT (guide §1.2: the profiler, not intuition): PySpark 4's
        # DataFrame-debugging wrapper pays THREE py4j round trips
        # (conf.get + PySparkCurrentOrigin.set/clear) plus a Python stack
        # walk on EVERY DataFrame/Column API call, purely to decorate JVM
        # error messages with the Python call site.  cProfile showed plan
        # CONSTRUCTION (not execution) at ~half the bench wall, dominated
        # by exactly these calls; disabling cuts build 30-55% per query
        # (controlled A/B, min-of-5).  Scale-neutral: driver-side CPU at
        # any cluster size.  Errors keep the full JVM context; only the
        # "called from <file>:<line>" fragment disappears.  Re-enable via
        # extra_conf when debugging a plan interactively.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
