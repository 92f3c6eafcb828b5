"""Incremental-processing operators (reference ``stg_weather_raw.sql:3-25``).

The reference tracks processed files via the target table itself:
``METADATA$FILENAME NOT IN (SELECT file_path FROM {{ this }})`` — P4. Spark
plans the equivalent ``left_anti`` join as a BroadcastHashJoin when the
processed-file list is small (it is: one row per file, not per record —
project + distinct first so only the key column ships to the build side).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def new_files_only(df: DataFrame, existing: DataFrame | None,
                   file_col: str = "file_path") -> DataFrame:
    """P4/J1: keep only rows whose ``file_col`` is absent from ``existing``.

    ``existing`` may be None (first run — reference ``is_incremental()``
    false branch elides the filter entirely).
    """
    if existing is None:
        return df
    seen = F.broadcast(existing.select(file_col).distinct())
    return df.join(seen, on=file_col, how="left_anti")


def upsert_by_key(new: DataFrame, target_path: str, keys: Sequence[str],
                  spark: SparkSession) -> None:
    """S8: incremental upsert with a dedupe key onto a plain-parquet target
    (Delta MERGE fallback per SURVEY.md §2.1 S8 — Delta jars are not in this
    image, so: anti-join existing keys, then append).

    Exactly-once at file grain comes from `new_files_only`; this guards the
    record grain. At scale the anti-join shuffles on the key — acceptable
    because `new` is one micro-batch, not the full table, and the existing
    side is pruned to key columns only (column pruning at the parquet scan).
    """
    if os.path.isdir(target_path) and any(
            f.endswith(".parquet") for _, _, fs in os.walk(target_path) for f in fs):
        existing_keys = spark.read.parquet(target_path).select(*keys).distinct()
        new = new.join(existing_keys, on=list(keys), how="left_anti")
    new.dropDuplicates(list(keys)).write.mode("append").parquet(target_path)
