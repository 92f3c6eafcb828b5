"""Flatten / table-generating operators (F1–F3).

Snowflake ``LATERAL FLATTEN`` ×3 (reference ``stg_weather_raw.sql:40-42``)
maps to chained ``explode`` — a Catalyst ``Generate`` node, pipelined inside
the same stage (no shuffle, no join)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def explode_path(df: DataFrame, *array_cols: str) -> DataFrame:
    """Explode nested arrays level by level.

    ``explode_path(df, "weather.data:param", "param.coordinates:coord")``
    each spec is ``"<array column>:<alias>"``.
    """
    for spec in array_cols:
        col, alias = spec.split(":")
        df = df.select("*", F.explode(F.col(col)).alias(alias))
    return df
