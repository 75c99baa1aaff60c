"""SparkSession factory tuned for the test harness (local mode) while
keeping settings that scale to a multi-executor cluster.

On a real cluster the same builder works — only ``master`` and the memory
sizing change; AQE handles runtime re-planning (partition coalescing, skew
joins, dynamic broadcast) at any scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "nosql_to_sql_migration_tool_spark") -> SparkSession:
    """Build (or reuse) a SparkSession.

    Env knobs (driver contract): ``SPARK_GRAFT_CPUS`` sets local
    parallelism; shuffle partitions follow it so local runs don't pay for
    200 empty partitions, while AQE coalesces further at runtime.
    """
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    # Driver heap must be fixed before the JVM launches — a builder config
    # is a silent no-op once getOrCreate starts the gateway, so inject it
    # via PYSPARK_SUBMIT_ARGS (only effective if the JVM isn't up yet).
    mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g")
    if "PYSPARK_SUBMIT_ARGS" not in os.environ:
        os.environ["PYSPARK_SUBMIT_ARGS"] = (
            f"--driver-memory {mem} pyspark-shell"
        )
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.ui.enabled", "false")
        # events.ts is parquet TIMESTAMP(NANOS); Spark reads it as a long
        # (sources/registry.py truncates to micros). Session-level so
        # loading a table never mutates conf mid-session.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
