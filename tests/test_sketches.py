"""Mergeable HLL sketch rollups (operators/sketches.py) — engine-specific
binary output, so correctness is pytest-bounded rather than
oracle-hashed: merge consistency, accuracy vs exact, and determinism."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.sketches import (
    sketch_rollup, sketch_union)
from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

SF = os.environ.get("SPARK_GRAFT_TEST_SF", "/root/testdata/sf0.01")

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF), reason="driver testdata not present")


def test_daily_sketches_merge_to_whole_range_estimate(spark):
    """Union of per-(type, day) sketches must estimate the same count as
    one sketch built over all days — the merge-losslessness that makes
    the pre-aggregation pattern sound."""
    ev = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    daily = sketch_rollup(ev, "user_id", ("event_type", "day"))
    merged = {r["event_type"]: r["approx_distinct"]
              for r in sketch_union(daily, ("event_type",)).collect()}
    direct = {r["event_type"]: r["approx_distinct"]
              for r in sketch_union(
                  sketch_rollup(ev, "user_id", ("event_type",)),
                  ("event_type",)).collect()}
    assert merged == direct        # HLL union is exact at equal lgK


def test_sketch_estimate_within_tolerance_of_exact(spark):
    ev = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    daily = sketch_rollup(ev, "user_id", ("event_type", "day"))
    approx = {r["event_type"]: r["approx_distinct"]
              for r in sketch_union(daily, ("event_type",)).collect()}
    exact = {r["event_type"]: r["n"]
             for r in ev.groupBy("event_type")
             .agg(F.countDistinct("user_id").alias("n")).collect()}
    assert set(approx) == set(exact)
    for k in exact:
        assert abs(approx[k] - exact[k]) / exact[k] <= 0.05


def test_sketch_rollup_deterministic_and_partial_agg(spark):
    ev = load_table(spark, SF, "events").withColumn("day", F.to_date("ts"))
    a = sketch_union(sketch_rollup(ev, "user_id", ("event_type", "day")),
                     ("event_type",)).collect()
    b = sketch_union(
        sketch_rollup(ev.repartition(13), "user_id", ("event_type", "day")),
        ("event_type",)).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))  # layout-invariant
    plan = (sketch_rollup(ev, "user_id", ("event_type", "day"))
            ._jdf.queryExecution().executedPlan().toString())
    assert "partial_hll_sketch_agg" in plan  # map-side combinable


def test_weekly_driver_entries_agree(spark):
    """The rows-only driver entry and its exact twin cover the same
    (event_type, week) windows, and every weekly estimate is within the
    5% HLL bound of its exact count."""
    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_event_reach_sketch_weekly, q_event_reach_weekly_exact)
    approx = {(r["event_type"], r["week"]): r["approx_distinct"]
              for r in q_event_reach_sketch_weekly(spark, SF).collect()}
    exact = {(r["event_type"], r["week"]): r["n_users"]
             for r in q_event_reach_weekly_exact(spark, SF).collect()}
    assert set(approx) == set(exact)
    for k, n in exact.items():
        assert abs(approx[k] - n) / n <= 0.05


def test_cms_grid_merges_and_never_underestimates(spark):
    """Count-min invariants: cell-wise sum of two disjoint-slice grids
    equals the whole-input grid (mergeability), and every point
    estimate is >= the true count (overestimate-only)."""
    from pyspark.sql import functions as F

    from meteomatics_e2e_data_pipeline_spark.operators.sketches import (
        cms_cells, cms_point_estimate)

    ev = load_table(spark, SF, "events")
    half_a = ev.filter(F.col("event_id") % 2 == 0)
    half_b = ev.filter(F.col("event_id") % 2 == 1)
    whole = {(r.depth, r.idx): r.cell_n for r in cms_cells(ev, "user_id").collect()}
    merged: dict = {}
    for part in (half_a, half_b):
        for r in cms_cells(part, "user_id").collect():
            merged[(r.depth, r.idx)] = merged.get((r.depth, r.idx), 0) + r.cell_n
    assert merged == whole

    exact = {r.user_id: r.n for r in
             ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    keys = ev.select("user_id").distinct().limit(200)
    cells = cms_cells(ev, "user_id")
    for r in cms_point_estimate(cells, keys, "user_id").collect():
        assert r.cms_estimate >= exact[int(r.user_id)], r
