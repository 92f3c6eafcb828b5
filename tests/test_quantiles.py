"""operators/quantiles.py: the scale-safe global-order primitives.

Equivalence contract: ``global_ntile`` must be bit-identical to
``ntile() OVER`` and ``global_running_sum`` to ``sum() OVER (... ROWS
UNBOUNDED PRECEDING)`` — including on boundary ties, tiny frames
(n < k), and skewed distributions where many rows share one range.
Plan contract: no window over a data-sized single partition (the only
allowed global window is the config-sized per-range offsets frame).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators import quantiles


def _df(spark, rows):
    return spark.createDataFrame(rows, "id int, v double")


CASES = [
    # heavy boundary ties: every value shared by 3 rows
    [(i, float(i // 3)) for i in range(30)],
    # all-distinct values, n not divisible by k
    [(i, float(97 - 7 * i)) for i in range(23)],
    # n < k: each row its own bucket
    [(i, float(i)) for i in range(3)],
    # constant column: one range absorbs everything (degraded but exact)
    [(i, 1.0) for i in range(17)],
]


@pytest.mark.parametrize("descending", [False, True])
@pytest.mark.parametrize("rows", CASES, ids=["ties", "distinct", "tiny",
                                             "constant"])
def test_global_ntile_matches_window_ntile(spark, rows, descending):
    df = _df(spark, rows)
    order = [F.col("v").desc() if descending else F.col("v").asc(),
             F.col("id").asc()]
    expected = df.select(
        "id", F.ntile(4).over(Window.orderBy(*order)).alias("b"))
    got = quantiles.global_ntile(
        df, "v", 4, "id", descending=descending, out_col="b",
        n_ranges=5).select("id", "b")
    assert sorted(got.collect()) == sorted(expected.collect())


from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=-50, max_value=50),
                     min_size=1, max_size=60),
       k=st.integers(min_value=1, max_value=7),
       descending=st.booleans())
def test_global_ntile_property_matches_window(spark, vals, k, descending):
    """Randomized equivalence: arbitrary (tie-heavy) integer values,
    any k, both directions — bit-identical to window ntile."""
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id int, v double")
    order = [F.col("v").desc() if descending else F.col("v").asc(),
             F.col("id").asc()]
    expected = df.select(
        "id", F.ntile(k).over(Window.orderBy(*order)).alias("b"))
    got = quantiles.global_ntile(
        df, "v", k, "id", descending=descending, out_col="b",
        n_ranges=4).select("id", "b")
    assert sorted(got.collect()) == sorted(expected.collect())


def test_global_running_sum_matches_window_sum(spark):
    rows = [(i, float((i * 37) % 11)) for i in range(40)]  # many ties
    df = _df(spark, rows).withColumn("w", F.col("v").cast("decimal(10,2)"))
    w = (Window.orderBy(F.col("v").desc(), "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    expected = df.select("id", F.sum("w").over(w).alias("cum"))
    got = quantiles.global_running_sum(
        df, "v", "w", "id", descending=True, out_col="cum",
        total_col="tot", n_ranges=4)
    assert sorted((r.id, r.cum) for r in got.collect()) \
        == sorted((r.id, r.cum) for r in expected.collect())
    tot = {r.tot for r in got.collect()}
    assert len(tot) == 1
    assert tot.pop() == sum(r.w for r in df.collect())


def test_global_running_sums_one_pass_matches_stacked_calls(spark):
    """The multi-weight one-pass form is value-identical to two stacked
    single-weight calls (and to the window oracle), including both
    grand totals."""
    rows = [(i, float((i * 37) % 11)) for i in range(40)]  # many ties
    df = (_df(spark, rows)
          .withColumn("w1", F.col("v").cast("decimal(10,2)"))
          .withColumn("w2", (F.col("v") * 2 + 1).cast("bigint")))
    w = (Window.orderBy("v", "id")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    expected = df.select("id", F.sum("w1").over(w).alias("c1"),
                         F.sum("w2").over(w).alias("c2"))
    got = quantiles.global_running_sums(
        df, "v", {"w1": "c1", "w2": "c2"}, "id",
        total_cols={"w1": "t1", "w2": "t2"}, n_ranges=4)
    assert sorted((r.id, r.c1, r.c2) for r in got.collect()) \
        == sorted((r.id, r.c1, r.c2) for r in expected.collect())
    one = got.select("t1", "t2").distinct().collect()
    assert len(one) == 1
    assert one[0].t1 == sum(r.w1 for r in df.collect())
    assert one[0].t2 == sum(r.w2 for r in df.collect())
    with pytest.raises(ValueError, match="total_cols"):
        quantiles.global_running_sums(df, "v", {"w1": "c1"}, "id",
                                      total_cols={"w2": "t2"})


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(vals=st.lists(st.integers(min_value=0, max_value=20),
                     min_size=1, max_size=50))
def test_global_running_sum_property_matches_window(spark, vals):
    df = spark.createDataFrame(
        [(i, float(v)) for i, v in enumerate(vals)], "id int, v double"
    ).withColumn("w", F.col("v").cast("decimal(10,2)"))
    win = (Window.orderBy("v", "id")
           .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    expected = sorted((r.id, r.c) for r in
                      df.select("id", F.sum("w").over(win).alias("c"))
                      .collect())
    got = sorted((r.id, r.c) for r in quantiles.global_running_sum(
        df, "v", "w", "id", out_col="c", n_ranges=3)
        .select("id", "c").collect())
    assert got == expected


def test_quantile_cut_bucket_boundaries(spark):
    # 8 rows 1..8: desc quartile cuts at p75=6.25, p50=4.5, p25=2.75.
    df = _df(spark, [(i, float(i)) for i in range(1, 9)])
    got = {r.id: r.b for r in quantiles.quantile_cut(
        df, "v", [0.75, 0.5, 0.25], descending=True,
        out_col="b").collect()}
    assert got == {8: 1, 7: 1, 6: 2, 5: 2, 4: 3, 3: 3, 2: 4, 1: 4}
    # ties on a cut point share the better (lower) bucket
    tied = _df(spark, [(i, 5.0) for i in range(4)] + [(9, 1.0)])
    out = quantiles.quantile_cut(tied, "v", [0.75, 0.5, 0.25],
                                 descending=True, out_col="b")
    by_id = {r.id: r.b for r in out.collect()}
    assert all(by_id[i] == 1 for i in range(4)) and by_id[9] == 4
    with pytest.raises(ValueError):
        quantiles.quantile_cut(df, "v", [0.25, 0.75], descending=True)
    with pytest.raises(ValueError):
        quantiles.quantile_cut(df, "v", [])


def test_global_ntile_plan_has_no_global_data_window(spark):
    """Every Window node in the optimized plan must partition by the
    range id except the offsets window, whose input is the config-sized
    per-range totals aggregate — assert the shape via the plan text."""
    df = _df(spark, [(i, float(i % 7)) for i in range(50)])
    out = quantiles.global_ntile(df, "v", 4, "id", out_col="b",
                                 n_ranges=8)
    import re
    plan = out._jdf.queryExecution().optimizedPlan().toString()
    windows = [ln for ln in plan.splitlines() if "Window [" in ln]
    # a partitioned Window prints "...], [__rng#N], [<order>...]"; the
    # offsets window has only an ORDER BY list ("...], [__rng#N ASC...")
    unpartitioned = [
        ln for ln in windows
        if not re.search(r"\], \[__rng#\d+\], \[", ln)]
    # exactly one unpartitioned window is allowed: the offsets frame
    assert len(windows) >= 2
    assert len(unpartitioned) == 1, plan
    assert "__tot" in unpartitioned[0], plan
