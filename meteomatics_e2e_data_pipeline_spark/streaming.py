"""Structured Streaming ingest (SURVEY §2.10).

The reference's orchestration — a Dataset-triggered transformation DAG
plus a "files not already in target" anti-join — is exactly what a file-
source stream with ``trigger(availableNow=True)`` gives natively:

- the checkpoint's file log IS the processed-files ledger (exactly-once
  at file grain; replaces ``stg_weather_raw.sql:21-25``'s NOT IN);
- ``availableNow`` processes everything currently in the lake, then
  stops — the batch-cadence behavior of the reference's daily run, with
  restart-safe bookkeeping for free.

The transformation is the *same* ``flatten_bronze`` plan as the batch
path; only the scan node differs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .plans.weather import flatten_bronze
from .sources.bronze import RAW_WEATHER_SCHEMA


def read_bronze_stream(spark: SparkSession, path: str) -> DataFrame:
    """Streaming twin of ``sources.bronze.read_bronze`` — same schema,
    same metadata columns, same path normalization."""
    df = (
        spark.readStream.schema(RAW_WEATHER_SCHEMA)
        .option("maxFilesPerTrigger", 64)  # bounded micro-batches at scale
        .json(path)
    )
    return df.select(
        F.regexp_replace(F.col("_metadata.file_path"), r"^.*/bronze/", "")
        .alias("file_path"),
        F.col("_metadata.file_modification_time").alias("file_modified"),
        "*",
    )


def stream_bronze_to_staging(spark: SparkSession, bronze_glob: str,
                             target_path: str, checkpoint_path: str) -> None:
    """Run one availableNow pass: new bronze files → staging parquet.

    Idempotent across invocations via the checkpoint: files already in
    the log are never reprocessed, so calling this daily reproduces the
    reference's incremental staging load (S7/S8 at file grain) without a
    metastore. Output is partitioned by reading date (S10) so downstream
    as_of-window fact builds prune partitions.
    """
    stg = flatten_bronze(read_bronze_stream(spark, bronze_glob))
    stg = stg.withColumn("reading_date", F.to_date("reading_datetime"))
    q = (
        stg.writeStream
        .format("parquet")
        .option("path", target_path)
        .option("checkpointLocation", checkpoint_path)
        .partitionBy("reading_date")
        .trigger(availableNow=True)
        .outputMode("append")
        .start()
    )
    q.awaitTermination()
