"""SparkSession factory tuned for the NQS analytic workload.

The reference runs a 3-way-parallel Flink job (env/BaseFlink.java:47-50,
config.properties:54).  Here parallelism is Spark's concern: AQE re-plans
shuffles at runtime, broadcast thresholds keep dimension joins shuffle-free,
and the shuffle-partition count tracks the available cores so local runs
don't drown in tiny tasks while a cluster run can raise it to
(executors x cores x 2-3).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def default_parallelism() -> int:
    cpus = os.environ.get("SPARK_GRAFT_CPUS")
    if cpus:
        return max(1, int(cpus))
    return os.cpu_count() or 8


def tune(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable conf to an existing session (e.g. the driver's).

    Only touches SQL conf that is legal to change after session start.
    """
    conf = spark.conf
    conf.set("spark.sql.session.timeZone", "UTC")
    conf.set("spark.sql.adaptive.enabled", "true")
    conf.set("spark.sql.adaptive.coalescePartitions.enabled", "true")
    conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    # Dim tables (probe/task/geo analogues) are MBs at most — always broadcast.
    conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    conf.set("spark.sql.shuffle.partitions", str(default_parallelism()))
    # The compiled score expressions generate >8KB bytecode methods; the JVM
    # JIT refuses those (DontCompileHugeMethods) and un-JIT-ed codegen runs
    # ~5x slower than Spark's interpreted path.  Falling back to interpreted
    # evaluation for huge methods cut the 13-protocol dispatch from 21s to
    # 7.7s per 10M rows (measured, see README "Designed for 100 TB").
    conf.set("spark.sql.codegen.hugeMethodLimit", "8000")
    return spark


def get_spark(app_name: str = "nqs-spark", master: str | None = None) -> SparkSession:
    master = master or f"local[{default_parallelism()}]"
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master)
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
        .config("spark.driver.memory", os.environ.get("NQS_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.ui.showConsoleProgress", "false")
    )
    return tune(builder.getOrCreate())
