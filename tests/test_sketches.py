"""Mergeable HLL sketch rollups (operators/sketches.py) — engine-specific
binary output, so correctness is pytest-bounded rather than
oracle-hashed: merge consistency, accuracy vs exact, and determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.sketches import (
    sketch_rollup, sketch_union)
from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

SF = "/root/testdata/sf0.01"


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
