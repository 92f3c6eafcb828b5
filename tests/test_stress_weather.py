"""Volume stress test of the weather pipeline (opt-in: set
SPARK_GRAFT_STRESS=1). Generates a lake ~40x the committed fixtures
(40 locations x 10 overlapping run_dates ≈ 625k readings), runs the full
staging + fact chain, and asserts the same invariants the small tests
check — proving the pipeline shape, not just the sample size."""

from __future__ import annotations

import datetime as dt
import os
import time

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.dedupe import latest_record_wins
from meteomatics_e2e_data_pipeline_spark.plans.weather import build_fact, stg_weather_raw
from meteomatics_e2e_data_pipeline_spark.sources.fixtures import (
    FLOAT_PARAMS, ensure_fixtures, synthetic_locations,
)

pytestmark = pytest.mark.skipif(
    os.environ.get("SPARK_GRAFT_STRESS") != "1",
    reason="stress test; set SPARK_GRAFT_STRESS=1 to run")

N_LOCATIONS = 40
RUN_DATES = [f"2025-03-{d:02d}" for d in range(10, 20)]


def test_pipeline_at_volume(spark, tmp_path):
    t0 = time.perf_counter()
    root = ensure_fixtures(tmp_path / "bronze",
                           locations=synthetic_locations(N_LOCATIONS),
                           run_dates=RUN_DATES)
    gen_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    stg = stg_weather_raw(spark, f"{root}/*/*/*.json")
    expected = N_LOCATIONS * len(RUN_DATES) * (len(FLOAT_PARAMS) * 193 + 2 * 9)
    n_stg = stg.count()
    stg_s = time.perf_counter() - t0
    assert n_stg == expected

    as_of = dt.date(2025, 3, 15)
    t0 = time.perf_counter()
    parts = [build_fact(stg, sun=s, history=h, as_of=as_of)
             for s in (False, True) for h in (True, False)]
    total = sum(p.count() for p in parts)
    fact_s = time.perf_counter() - t0

    lo = dt.datetime.combine(as_of - dt.timedelta(days=2), dt.time())
    hi = dt.datetime.combine(as_of + dt.timedelta(days=7), dt.time())
    deduped = (stg.filter(F.col("reading_datetime").between(lo, hi))
               .select("city", "parameter", "reading_datetime")
               .distinct().count())
    assert total == deduped  # facts partition the deduped window exactly

    # latest-wins must keep exactly one issuance per slot at volume too
    latest = latest_record_wins(
        stg, keys=["city", "parameter", "reading_datetime"],
        order_desc=["date_generated", "file_path"])
    assert latest.groupBy("city", "parameter", "reading_datetime") \
        .count().filter(F.col("count") > 1).count() == 0

    print(f"\nstress: {n_stg} staging rows | gen {gen_s:.1f}s "
          f"| stage+count {stg_s:.1f}s | 4 facts {fact_s:.1f}s "
          f"| window rows {deduped}")
