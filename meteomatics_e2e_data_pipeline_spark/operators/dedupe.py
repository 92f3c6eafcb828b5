"""Record-dedupe operators.

W1 (reference ``fact_weather_params_history.sql:17-24,32`` — identical in the
other 3 facts): ``row_number() over (partition by keys order by version desc)``
then keep row 1, i.e. "latest issuance wins" per reading slot.

Scale notes: one shuffle on the partition keys; with millions of distinct
keys this is a plain hash-partitioned window, no skew risk unless a single
key dominates (AQE skew handling is on in the session factory). The
``max_by(struct)`` formulation below is preferred when only a few payload
columns are needed — it is a partial-aggregatable hash agg (map-side combine)
instead of a full sort-within-partition window.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def latest_record_wins(df: DataFrame, keys: Sequence[str],
                       order_desc: Sequence[str | Column]) -> DataFrame:
    """Keep, per ``keys`` group, the single row that sorts first by
    ``order_desc`` descending (reference W1). Pass extra tiebreaker columns
    (e.g. file_path) for determinism when versions tie — the reference leaves
    ties unspecified; we document the deterministic deviation (SURVEY.md §7).
    """
    order_cols = [
        (F.col(c) if isinstance(c, str) else c).desc() for c in order_desc
    ]
    w = Window.partitionBy(*keys).orderBy(*order_cols)
    return (
        df.withColumn("__row_num", F.row_number().over(w))
        .filter(F.col("__row_num") == 1)
        .drop("__row_num")
    )


def dedupe_by_key(df: DataFrame, keys: Sequence[str]) -> DataFrame:
    """A3/S8: key-based dedupe (dbt ``unique_key`` semantics) — arbitrary
    survivor via ``dropDuplicates`` (hash agg, map-side combined)."""
    return df.dropDuplicates(list(keys))
