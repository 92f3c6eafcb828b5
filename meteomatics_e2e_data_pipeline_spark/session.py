"""SparkSession factory.

Centralizes the configuration the whole engine depends on:

- ``spark.sql.session.timeZone=UTC`` — the reference pipeline is UTC-pinned
  (reference ``meteomatics_get_data.py:31,36`` formats ``...T00:00:00Z``) and
  the DuckDB correctness oracle compares naive-UTC timestamps.
- AQE on (runtime coalesce / skew-join) — at 100 TB the static shuffle
  partition count is always wrong somewhere; AQE re-plans per stage.
- shuffle partitions sized for the local harness via env; on a real cluster
  this is overridden per-deploy (or left to AQE's coalescing).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "meteomatics_e2e_data_pipeline_spark",
              shuffle_partitions: int | None = None) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus)
    builder = (
        SparkSession.builder
        .master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Engine-wide parquet policy: TIMESTAMP(NANOS) columns read as long
        # (see sources/tables.py — converted to micros with integer math).
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
