"""SparkSession factory tuned for the local[32] test rig but configured the
way a 1000-executor cluster run would be: AQE on (runtime coalesce + skew
join), Arrow for any Python exchange, UTC session time zone so timestamp
semantics match the DuckDB oracle.

Table readers and the ``spread`` parallelism helper live in ``tables.py``
(split r09): they are in every query's dependency closure, this factory is
in none — so session tuning no longer re-queues the whole registry for
driver re-verification (r08 verdict ask #5).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "duckdb_nats_jetstream_spark") -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(cpus))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
