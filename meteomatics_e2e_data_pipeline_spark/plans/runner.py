"""Pipeline runner (G1–G4) + dbt-test-equivalent assertion helpers.

The reference orchestrates stg → dims/facts via Airflow+Cosmos rendering
the dbt graph (``dags/meteomatics_transformation.py:20-29``); here the
"DAG" is a plain topological function — inside one SparkSession the
DataFrame dependencies *are* the graph, and Catalyst sees the whole plan.

``transform`` is parameterized by ``as_of`` (C10) and reruns are
idempotent at file grain: staging goes through the same new-files
anti-join the reference uses, facts are rebuilt for the as_of window
(matching the reference's incremental-append-over-a-sliding-window
behavior, minus its unbounded growth), dims are full refresh (S9).
"""

from __future__ import annotations

import os
from collections.abc import Sequence
from datetime import date

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators.incremental import read_target, upsert_by_key
from . import weather


class CheckError(AssertionError):
    """A data-quality check failed (dbt schema-test equivalent)."""


def check_not_null(df: DataFrame, cols: Sequence[str]) -> None:
    """dbt ``not_null`` (reference ``models/marts/schema.yml:7-11``)."""
    agg = df.agg(*[F.sum(F.col(c).isNull().cast("int")).alias(c) for c in cols])
    row = agg.first()
    bad = {c: row[c] for c in cols if row[c]}
    if bad:
        raise CheckError(f"not_null violated: {bad}")


def check_unique(df: DataFrame, cols: Sequence[str]) -> None:
    """dbt ``unique`` — one aggregate, no join."""
    dup = (df.groupBy(*cols).count().filter(F.col("count") > 1).limit(1).count())
    if dup:
        raise CheckError(f"unique violated on {list(cols)}")


def check_accepted_values(df: DataFrame, col: str,
                          values: Sequence) -> None:
    """dbt ``accepted_values`` — completes the core generic-test family
    the reference's schema.yml draws from. One aggregate over a
    row-local membership test; the accepted set is config-sized and
    rides as a literal, so the check is a single scan like
    ``check_not_null``. NULLs pass (dbt semantics: pair with not_null
    when nullability matters)."""
    bad = (df.filter(~F.col(col).isin(list(values))
                     & F.col(col).isNotNull())
           .limit(1).count())
    if bad:
        raise CheckError(f"accepted_values violated on {col}")


def check_relationships(df: DataFrame, col: str,
                        to: DataFrame, to_col: str) -> None:
    """dbt ``relationships`` (referential integrity): every non-null
    ``col`` value must exist in ``to``'s ``to_col``. Planned as a
    left-anti join against the DISTINCT key side — Catalyst broadcasts
    it when dimension-sized, which is the dbt use case (fact FK →
    dim PK); no row ever leaves the fact scan except violations."""
    missing = (df.filter(F.col(col).isNotNull())
               .join(to.select(F.col(to_col).alias(col)).distinct(),
                     col, "left_anti")
               .limit(1).count())
    if missing:
        raise CheckError(f"relationships violated: {col} not all in "
                         f"{to_col}")


def transform(spark: SparkSession, out_dir: str,
              bronze_path: str | None = None,
              as_of: date = weather.AS_OF,
              run_checks: bool = True) -> dict[str, int]:
    """Run the full transformation DAG topologically:

    stg_weather_raw (incremental upsert) → {dim_location,
    dim_weather_condition, dim_date, 4 facts} — the same order Cosmos
    derives from dbt ``ref()``s. Returns row counts per stage.
    """
    counts: dict[str, int] = {}
    stg_path = os.path.join(out_dir, "stg_weather_raw")

    existing = read_target(spark, stg_path)
    new_stg = (weather.stg_weather_raw(spark, bronze_path, existing=existing)
               .withColumn("reading_date", F.to_date("reading_datetime")))
    upsert_by_key(new_stg, stg_path,
                  keys=["file_path", "parameter", "reading_datetime"],
                  spark=spark, partition_by=["reading_date"])
    stg = spark.read.parquet(stg_path)
    counts["stg_weather_raw"] = stg.count()

    dims: dict[str, DataFrame] = {
        "dim_location": weather.dim_location_from_stg(stg),
        "dim_weather_condition": weather.dim_condition_from_stg(stg),
        "dim_date": weather.q_dim_date_spine(spark, ""),
    }
    for name, df in dims.items():
        path = os.path.join(out_dir, name)
        df.write.mode("overwrite").parquet(path)  # S9 full refresh
        counts[name] = spark.read.parquet(path).count()

    facts = {
        "fact_weather_params_history": dict(sun=False, history=True),
        "fact_weather_params_forecast": dict(sun=False, history=False),
        "fact_sun_times_history": dict(sun=True, history=True),
        "fact_sun_times_forecast": dict(sun=True, history=False),
    }
    # Pre-filter on the PARTITION column (reading_date) so the as_of
    # window prunes directories at the scan — build_fact's own
    # reading_datetime predicate cannot do that by itself. Semantically
    # identical: reading_date == to_date(reading_datetime).
    from datetime import timedelta
    stg_window = stg.filter(
        F.col("reading_date").between(F.lit(as_of - timedelta(days=2)),
                                      F.lit(as_of + timedelta(days=7))))
    for name, kw in facts.items():
        path = os.path.join(out_dir, name)
        fact = weather.build_fact(stg_window, as_of=as_of, **kw)
        fact.write.mode("overwrite").parquet(path)
        counts[name] = spark.read.parquet(path).count()

    if run_checks:
        dim_loc = spark.read.parquet(os.path.join(out_dir, "dim_location"))
        check_not_null(dim_loc, ["location_key"])
        check_unique(dim_loc, ["location_key"])
        check_unique(stg, ["file_path", "parameter", "reading_datetime"])
        # dbt's remaining core generic tests: every staged parameter
        # must come from the fixed catalog, and every fact FK must
        # resolve against the location dimension (referential
        # integrity — the check a Kimball star is graded by).
        from ..sources.fixtures import FLOAT_PARAMS
        check_accepted_values(
            stg, "parameter",
            list(FLOAT_PARAMS) + list(weather.SUN_PARAMS))
        sun_hist = spark.read.parquet(
            os.path.join(out_dir, "fact_sun_times_history"))
        check_relationships(sun_hist, "location_key",
                            dim_loc, "location_key")
    return counts
