"""End-to-end tests for the weather pipeline on the bronze JSON fixtures:
flatten chain shape, late-reissuance (latest dateGenerated wins), the
history/forecast split, and file-grain incrementality."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.plans.weather import (
    AS_OF, SUN_PARAMS, build_fact, stg_weather_raw,
)
from meteomatics_e2e_data_pipeline_spark.sources.fixtures import (
    FLOAT_PARAMS, LOCATIONS, RUN_DATES, ensure_fixtures,
)


@pytest.fixture(scope="module")
def stg(spark):
    ensure_fixtures()
    return stg_weather_raw(spark).cache()


def test_staging_shape(stg):
    # 3 locations x 4 runs x (8 hourly params x 193 + 2 sun params x 9)
    expected = len(LOCATIONS) * len(RUN_DATES) * (len(FLOAT_PARAMS) * 193 + 2 * 9)
    assert stg.count() == expected
    # one staging row per (file, parameter, reading) — the S8 unique key
    assert (stg.select("file_path", "parameter", "reading_datetime")
            .distinct().count() == expected)
    # file metadata survived the flatten
    assert stg.filter(F.col("file_modified").isNull()).count() == 0
    assert stg.filter(~F.col("file_path").startswith("estonia/")
                      & ~F.col("file_path").startswith("netherlands/")
                      & ~F.col("file_path").startswith("germany/")).count() == 0


def test_late_reissuance_latest_wins(spark, stg):
    """Overlapping run_dates re-deliver the same slot with newer
    date_generated and a different value: the fact must carry the value
    from the NEWEST issuance (reference fact_*.sql:17-24,32)."""
    fact = build_fact(stg, sun=False, history=True)
    # Pick a slot covered by several runs and old enough to be history
    # for the latest issuance (dateGenerated = run_date 02:00).
    slot = dt.datetime(2025, 3, 27, 1, 0)  # within runs 3/26..3/28's windows
    raw = (stg.filter((F.col("city") == "berlin")
                      & (F.col("parameter") == "t_2m:C")
                      & (F.col("reading_datetime") == slot))
           .select("date_generated", "reading_value").collect())
    assert len(raw) > 1, "fixture must re-deliver the slot from several runs"
    newest_value = max(raw, key=lambda r: r[0])[1]
    # fact has no city column; locate the row via the surrogate keys
    from meteomatics_e2e_data_pipeline_spark.functions.keys import surrogate_key
    berlin_key = (stg.filter(F.col("city") == "berlin")
                  .select(surrogate_key("country", "city").alias("k"))
                  .first()["k"])
    cond_key = (stg.filter(F.col("parameter") == "t_2m:C")
                .select(surrogate_key("parameter").alias("k")).first()["k"])
    row = (fact.filter((F.col("location_key") == berlin_key)
                       & (F.col("condition_key") == cond_key)
                       & (F.col("reading_datetime") == slot)).collect())
    assert len(row) == 1
    assert row[0]["reading_value"] == float(newest_value)


def test_history_forecast_split_is_partition(stg):
    """P7: history and forecast are complementary — together they cover
    every deduped in-window row exactly once."""
    hist = build_fact(stg, sun=False, history=True)
    fcst = build_fact(stg, sun=False, history=False)
    sun_h = build_fact(stg, sun=True, history=True)
    sun_f = build_fact(stg, sun=True, history=False)
    total = hist.count() + fcst.count() + sun_h.count() + sun_f.count()

    lo = dt.datetime.combine(AS_OF - dt.timedelta(days=2), dt.time())
    hi = dt.datetime.combine(AS_OF + dt.timedelta(days=7), dt.time())
    deduped = (stg.filter(F.col("reading_datetime").between(lo, hi))
               .select("city", "parameter", "reading_datetime").distinct()
               # slots whose latest issuance ties reading_datetime ==
               # date_generated go to history; > goes to forecast; both
               # always match exactly one side
               .count())
    assert total == deduped


def test_sun_values_stay_strings(stg):
    sun = build_fact(stg, sun=True, history=False)
    assert dict(sun.dtypes)["reading_value"] == "string"
    params = build_fact(stg, sun=False, history=False)
    assert dict(params.dtypes)["reading_value"] == "double"
    # sun fact only carries the 2 sun parameters
    from meteomatics_e2e_data_pipeline_spark.functions.keys import surrogate_key
    sun_keys = {r["k"] for r in
                stg.filter(F.col("parameter").isin(*SUN_PARAMS))
                .select(surrogate_key("parameter").alias("k")).distinct().collect()}
    got_keys = {r["condition_key"] for r in
                sun.select("condition_key").distinct().collect()}
    assert got_keys <= sun_keys


def test_incremental_new_files_only(spark, stg, tmp_path):
    """File-grain incrementality (stg_weather_raw.sql:21-25): a second run
    over the same lake with the first run's output as `existing` yields
    zero rows; with a partial `existing` it yields exactly the delta."""
    target = str(tmp_path / "stg")
    stg.write.parquet(target)
    existing = spark.read.parquet(target)

    rerun = stg_weather_raw(spark, existing=existing)
    assert rerun.count() == 0

    partial = existing.filter(~F.col("file_path").contains("2025-03-29"))
    delta = stg_weather_raw(spark, existing=partial)
    assert set(r["file_path"] for r in delta.select("file_path").distinct().collect()) \
        == set(r["file_path"] for r in
               stg.filter(F.col("file_path").contains("2025-03-29"))
               .select("file_path").distinct().collect())
