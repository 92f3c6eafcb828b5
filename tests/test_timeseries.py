"""Focused semantics tests for the time-series family (plans/timeseries.py)
and the new sampling/projection operators — hand-computed fixtures, plan-shape
guards, and determinism properties. The oracle parity of the full queries is
covered by tests/test_oracle_parity.py (all entries, sf0.01)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators import sampling, similarity


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


@pytest.fixture(scope="module")
def tiny_events(spark):
    rows = [
        # user 1: events on day 1 and day 4 — days 2-3 must be gap-filled
        (1, _ts("2024-01-01T10:00:00"), 1, "signup", 10.0),
        (2, _ts("2024-01-01T12:00:00"), 1, "click", 20.0),
        (3, _ts("2024-01-04T09:00:00"), 1, "purchase", 40.0),
        # user 2: click BEFORE signup (tests ordered-funnel semantics),
        # then a click after signup, never purchases
        (4, _ts("2024-01-02T08:00:00"), 2, "click", 5.0),
        (5, _ts("2024-01-02T09:00:00"), 2, "signup", 6.0),
        (6, _ts("2024-01-02T10:00:00"), 2, "click", 7.0),
        # user 3: signup only
        (7, _ts("2024-01-10T00:00:00"), 3, "signup", 1.0),
    ]
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")


def _patch_loader(monkeypatch, df):
    from meteomatics_e2e_data_pipeline_spark.plans import timeseries

    monkeypatch.setattr(timeseries, "load_table", lambda s, d, n: df)
    return timeseries


def test_gapfill_spine_and_locf(spark, tiny_events, monkeypatch):
    ts = _patch_loader(monkeypatch, tiny_events)
    out = {(r["user_id"], str(r["day"])): (r["filled_value"], r["observed"])
           for r in ts.q_events_gapfill(spark, "unused").collect()}
    # user 1 spans 4 days; gap days carry the last observed day-value (20.0
    # = the LATER of day 1's two events, ts tiebreak)
    assert out[(1, "2024-01-01")] == (20.0, 1)
    assert out[(1, "2024-01-02")] == (20.0, 0)
    assert out[(1, "2024-01-03")] == (20.0, 0)
    assert out[(1, "2024-01-04")] == (40.0, 1)
    # single-day users produce exactly one spine row
    assert out[(3, "2024-01-10")] == (1.0, 1)
    assert len([k for k in out if k[0] == 2]) == 1


def test_gapfill_daily_agg_is_partial(spark, tiny_events, monkeypatch):
    ts = _patch_loader(monkeypatch, tiny_events)
    plan = ts.q_events_gapfill(spark, "unused") \
        ._jdf.queryExecution().executedPlan().toString()
    # the last-per-day reduction must be the map-side-combinable max_by,
    # never a row_number window over the raw event table
    assert "partial_max_by" in plan


def test_funnel_ordered_steps(spark, tiny_events, monkeypatch):
    ts = _patch_loader(monkeypatch, tiny_events)
    rows = {r["user_id"]: r for r in
            ts.q_events_funnel(spark, "unused").collect()}
    # user 1 completes all three steps in order
    assert rows[1]["funnel_stage"] == 3
    # user 2's 08:00 click precedes signup and must NOT count; the 10:00
    # click does; no purchase → stage 2
    assert rows[2]["funnel_stage"] == 2
    assert rows[2]["t_click"] == _ts("2024-01-02T10:00:00")
    assert rows[2]["t_purchase"] is None
    # user 3 never advances past signup
    assert rows[3]["funnel_stage"] == 1


def test_retention_offsets(spark, tiny_events, monkeypatch):
    ts = _patch_loader(monkeypatch, tiny_events)
    out = {(str(r["cohort_week"]), r["week_offset"]): r["active_users"]
           for r in ts.q_events_retention(spark, "unused").collect()}
    # every user is active at offset 0 of their own cohort
    assert out[("2024-01-01", 0)] == 2   # users 1 and 2 (week of Jan 1)
    assert out[("2024-01-08", 0)] == 1   # user 3
    # no negative offsets, counts positive
    assert all(k[1] >= 0 and v > 0 for k, v in out.items())


def test_twa_hand_computed(spark, tiny_events, monkeypatch):
    ts = _patch_loader(monkeypatch, tiny_events)
    rows = {r["user_id"]: r for r in
            ts.q_events_twa(spark, "unused").collect()}
    # user 2: intervals 3600s@5.0 and 3600s@6.0 → twa 5.5
    assert rows[2]["n_intervals"] == 2
    assert rows[2]["twa_value"] == pytest.approx(5.5, abs=1e-9)
    # user 1: 2h@10 then 69h@20 → (2*10 + 69*20)/71
    assert rows[1]["twa_value"] == pytest.approx((2 * 10 + 69 * 20) / 71,
                                                 abs=1e-6)
    # single-event users have no intervals and are excluded
    assert 3 not in rows


def test_zscore_null_until_window_full_and_on_zero_var(spark, monkeypatch):
    # 9 days of constant counts except a spike on the last day
    rows = []
    eid = 0
    for d in range(1, 10):
        n = 3 if d < 9 else 9
        for i in range(n):
            eid += 1
            rows.append((eid, _ts(f"2024-01-0{d}T06:00:00")
                         + dt.timedelta(minutes=i), 1, "click", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    ts = _patch_loader(monkeypatch, ev)
    out = {str(r["day"]): r for r in
           ts.q_events_zscore(spark, "unused").collect()}
    # days 1-6: window not yet full → NULL
    for d in range(1, 7):
        assert out[f"2024-01-0{d}"]["zscore"] is None
    # day 7-8: full window but all counts equal → zero variance → NULL
    assert out["2024-01-07"]["zscore"] is None
    assert out["2024-01-08"]["zscore"] is None
    # day 9: spike → positive z
    assert out["2024-01-09"]["zscore"] > 2.0


# -- real-loader smokes: one per family, NO monkeypatching, so the actual
# -- load_table path (events dtype branch included) is on the tested path.
# -- These exist because round 4 shipped a loader that unit tests couldn't
# -- see fail (every fixture test patches load_table away).
SF_SMOKE = "/root/testdata/sf0.001"


@pytest.mark.parametrize("qname", [
    "events_gapfill", "events_funnel", "events_retention",
    "events_twa", "events_zscore",
    "events_ewma", "events_rolling_corr", "events_value_histogram",
])
def test_timeseries_real_loader_smoke(spark, qname):
    from meteomatics_e2e_data_pipeline_spark.plans import timeseries
    df = timeseries.TS_QUERIES[qname](spark, SF_SMOKE)
    assert df.count() > 0


def test_split_assign_partition_invariant_and_exhaustive(spark):
    df = spark.range(0, 2000).select(F.col("id").alias("doc_id"))
    a = {r["doc_id"]: r["split"]
         for r in sampling.split_assign(df).collect()}
    b = {r["doc_id"]: r["split"]
         for r in sampling.split_assign(df.repartition(7)).collect()}
    assert a == b                       # layout cannot move the split
    assert set(a.values()) == {"train", "val", "test"}
    n = len(a)
    frac_train = sum(v == "train" for v in a.values()) / n
    assert 0.85 < frac_train < 0.95     # rate lands near spec
    # growth stability: the 0..999 prefix keeps identical assignments
    small = {r["doc_id"]: r["split"] for r in sampling.split_assign(
        spark.range(0, 1000).select(F.col("id").alias("doc_id"))).collect()}
    assert all(a[k] == v for k, v in small.items())


def test_split_assign_rejects_bad_spec(spark):
    df = spark.range(3).select(F.col("id").alias("doc_id"))
    with pytest.raises(ValueError, match="sum to 1"):
        sampling.split_assign(df, (("train", 0.5), ("val", 0.1)))


def test_random_projection_rowlocal_and_width(spark):
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    out = similarity.random_projection(emb, 4, 64)
    assert out.columns == ["vec_id", "p0", "p1", "p2", "p3"]
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan       # zero shuffles — pure row map
    row = out.orderBy("vec_id").first()
    # projections are real numbers, not degenerate zeros
    assert any(abs(row[f"p{j}"]) > 1e-6 for j in range(4))


def test_ewma_recurrence_hand_computed(spark, monkeypatch):
    # one type, three days: counts 2, 4, 8 -> a1=2, a2=.3*4+.7*2=2.6,
    # a3=.3*8+.7*2.6=4.22
    rows = []
    eid = 0
    for d, n in ((1, 2), (2, 4), (3, 8)):
        for i in range(n):
            eid += 1
            rows.append((eid, _ts(f"2024-01-0{d}T06:00:00")
                         + dt.timedelta(minutes=i), 1, "click", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    ts = _patch_loader(monkeypatch, ev)
    out = {str(r["day"]): r["ewma"] for r in
           ts.q_events_ewma(spark, "unused").collect()}
    assert out["2024-01-01"] == pytest.approx(2.0)
    assert out["2024-01-02"] == pytest.approx(2.6)
    assert out["2024-01-03"] == pytest.approx(4.22)


def test_rolling_corr_perfect_correlation(spark, monkeypatch):
    # y = 2x daily for 8 days -> corr exactly 1.0 once window fills;
    # NULL before day 7
    rows = []
    eid = 0
    for d in range(1, 9):
        for i in range(d):           # clicks: 1,2,...,8
            eid += 1
            rows.append((eid, _ts(f"2024-01-0{min(d,9)}T01:00:00")
                         if d < 10 else None, 1, "click", 1.0))
        for i in range(2 * d):       # purchases: 2,4,...,16
            eid += 1
            rows.append((eid, _ts(f"2024-01-0{min(d,9)}T02:00:00"), 1,
                         "purchase", 1.0))
    ev = spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double")
    ts = _patch_loader(monkeypatch, ev)
    out = {str(r["day"]): r for r in
           ts.q_events_rolling_corr(spark, "unused").collect()}
    for d in range(1, 7):
        assert out[f"2024-01-0{d}"]["rolling_corr"] is None
    assert out["2024-01-07"]["rolling_corr"] == pytest.approx(1.0)
    assert out["2024-01-08"]["rolling_corr"] == pytest.approx(1.0)
    assert out["2024-01-08"]["n_x"] == 8 and out["2024-01-08"]["n_y"] == 16


def test_value_histogram_buckets_and_clamp(spark, monkeypatch):
    ev = spark.createDataFrame(
        [(1, _ts("2024-01-01T00:00:00"), 1, "click", 0.0),    # bucket 0
         (2, _ts("2024-01-01T00:01:00"), 1, "click", 19.99),  # bucket 0
         (3, _ts("2024-01-01T00:02:00"), 1, "click", 20.0),   # bucket 1
         (4, _ts("2024-01-01T00:03:00"), 1, "click", 500.0),  # clamp -> 9
         (5, _ts("2024-01-01T00:04:00"), 1, "error", 185.0)], # bucket 9
        "event_id long, ts timestamp, user_id long, "
        "event_type string, value double")
    ts = _patch_loader(monkeypatch, ev)
    out = {(r["event_type"], r["bucket"]): r for r in
           ts.q_events_value_histogram(spark, "unused").collect()}
    assert out[("click", 0)]["n"] == 2
    assert out[("click", 1)]["n"] == 1
    assert out[("click", 9)]["n"] == 1          # 500 clamps to last bucket
    assert out[("error", 9)]["lo"] == 180.0 and out[("error", 9)]["hi"] == 200.0


def test_label_outliers_flags_farthest(spark):
    import random

    from meteomatics_e2e_data_pipeline_spark.operators.similarity import (
        label_outliers)

    rnd = random.Random(7)
    rows = []
    # label 0: 40 vectors near [1,0,...]; one planted far vector (id 999)
    for i in range(40):
        v = [1.0] + [rnd.uniform(-0.05, 0.05) for _ in range(7)]
        rows.append((i, 0, v))
    rows.append((999, 0, [-1.0] + [0.0] * 7))
    emb = spark.createDataFrame(
        rows, "vec_id long, label int, embedding array<double>")
    out = {r["vec_id"]: r for r in label_outliers(emb, 0.05).collect()}
    assert len(out) == 41                         # every member returned
    assert out[999]["is_outlier"] is True         # the planted far point
    n_flagged = sum(r["is_outlier"] for r in out.values())
    assert n_flagged <= 3                         # ~5% of 41, ties allowed
    assert min(out.values(), key=lambda r: r["cos_to_centroid"])["vec_id"] == 999


def test_weighted_sample_favors_heavy_rows_and_is_deterministic(spark):
    """A-ES semantics: inclusion probability scales with weight — over
    many salts, heavy rows must be sampled far more often than light
    ones; same salt → identical sample; non-positive weights excluded."""
    rows = [(i, 100.0 if i < 50 else 1.0) for i in range(500)]
    rows.append((999, 0.0))                   # weight 0: never sampled
    df = spark.createDataFrame(rows, "doc_id long, w double")

    heavy_hits = light_hits = 0
    for salt in ("s1", "s2", "s3", "s4", "s5"):
        got = {r["doc_id"] for r in
               sampling.weighted_sample_n(df, 50, "w", salt=salt).collect()}
        assert 999 not in got
        assert len(got) == 50
        heavy_hits += sum(1 for i in got if i < 50)
        light_hits += sum(1 for i in got if i >= 50)
    # 50 heavy rows at weight 100 vs 450 light at weight 1: the heavy
    # group must dominate the sample across salts
    assert heavy_hits > 3 * light_hits

    a = sorted(r["doc_id"] for r in
               sampling.weighted_sample_n(df, 50, "w", salt="s1").collect())
    b = sorted(r["doc_id"] for r in
               sampling.weighted_sample_n(df.repartition(7), 50, "w",
                                          salt="s1").collect())
    assert a == b                             # layout-invariant


def test_audience_overlap_sketch_tracks_exact(spark, sf_oracle):
    """HLL inclusion-exclusion overlap stays within the sketch error
    envelope of the exact self-join twin on every event-type pair."""
    import __spark_entry__ as entrymod

    ap = entrymod.queries()["event_audience_overlap_approx"](
        spark, sf_oracle).collect()
    ex = {(r["type_a"], r["type_b"]): r for r in
          entrymod.queries()["event_audience_overlap_exact"](
              spark, sf_oracle).collect()}
    assert len(ap) == len(ex) > 0
    for r in ap:
        x = ex[(r["type_a"], r["type_b"])]
        union = x["n_a"] + x["n_b"] - x["n_both"]
        # inclusion-exclusion compounds three estimates' errors — bound
        # the overlap estimate by 15% of the UNION size (the scale of
        # the quantities being subtracted), not of the overlap itself
        assert abs(r["est_both"] - x["n_both"]) <= max(0.15 * union, 3.0)


def test_approx_percentiles_within_rank_error(spark, sf_oracle):
    """GK-sketch quantiles must land inside the rank-error envelope of
    the exact distribution: approx pX ∈ [exact p(X−ε), exact p(X+ε)]
    with ε = 2/accuracy per group and quantile."""
    import __spark_entry__ as entrymod
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    ap = {r["o_orderpriority"]: r for r in
          entrymod.queries()["order_value_percentiles_approx"](
              spark, sf_oracle).collect()}
    orders = load_table(spark, sf_oracle, "orders")
    eps = 0.002
    for q, col in ((0.5, "p50"), (0.9, "p90"), (0.99, "p99")):
        lo_q, hi_q = max(q - eps, 0.0), min(q + eps, 1.0)
        env = {r["o_orderpriority"]: (r["lo"], r["hi"]) for r in
               orders.groupBy("o_orderpriority").agg(
                   F.expr(f"percentile(o_totalprice, {lo_q})").alias("lo"),
                   F.expr(f"percentile(o_totalprice, {hi_q})").alias("hi"))
               .collect()}
        for grp, r in ap.items():
            lo, hi = env[grp]
            assert lo - 0.01 <= r[col] <= hi + 0.01, (grp, col)


def test_type_runs_and_scd2_match_python_reference(spark):
    """Random event streams: the two-window island collapse and the
    SCD2 intervals must equal a direct per-user scan."""
    import random

    from meteomatics_e2e_data_pipeline_spark.plans.analytics import (
        q_events_type_runs, q_events_user_state_scd2)

    # build a tiny synthetic events dir? No — run against the shared
    # testdata and recompute per user in python.
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    rows = sorted(
        ((r.user_id, r.ts, r.event_id, r.event_type)
         for r in ev.collect()),
        key=lambda t: (t[0], t[1], t[2]))
    runs = []
    for (u, ts, eid, et) in rows:
        if runs and runs[-1][0] == u and runs[-1][1] == et:
            runs[-1][4] = ts
            runs[-1][5] += 1
        else:
            runs.append([u, et, None, ts, ts, 1])
    want = {(r[0], r[1], r[3], r[4], r[5]) for r in runs}
    got = {(r.user_id, r.event_type, r.run_start, r.run_end, r.run_length)
           for r in q_events_type_runs(spark, sf).collect()}
    assert got == want

    # SCD2: valid_to of each interval == next interval's valid_from
    scd = sorted(q_events_user_state_scd2(spark, sf).collect(),
                 key=lambda r: (r.user_id, r.valid_from))
    by_user: dict = {}
    for r in scd:
        by_user.setdefault(r.user_id, []).append(r)
    for u, ivs in by_user.items():
        for a, b in zip(ivs, ivs[1:]):
            assert a.valid_to == b.valid_from and not a.is_current
        assert ivs[-1].valid_to is None and ivs[-1].is_current


def test_forecast_backtest_is_walk_forward_no_leakage(spark):
    """The backtest must equal a sequential Python walk that forecasts
    each day ONLY from strictly prior same-weekday days (exact
    Fraction arithmetic, quantized at 9 dp like the engine) — any
    leakage of the current or future day into the forecast shows up
    as a mismatch, as would an off-by-one in the frame."""
    from decimal import ROUND_HALF_UP, Decimal
    from fractions import Fraction

    from meteomatics_e2e_data_pipeline_spark.plans.timeseries import (
        q_events_forecast_backtest,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n"))).collect()
    series: dict = {}
    for r in sorted(daily, key=lambda r: r["day"]):
        dow = (r["day"].isoweekday()) % 7  # Sunday=0, matching dayofweek-1
        series.setdefault((r["event_type"], dow), []).append(r["n"])

    q9 = Decimal("1e-9")
    want = {}
    for (et, dow), ns in series.items():
        apes, errs = [], []
        for i in range(1, len(ns)):
            fc = Fraction(sum(ns[:i]), i)
            a = Fraction(ns[i])
            apes.append(Decimal(float(abs(a - fc) / a))
                        .quantize(q9, ROUND_HALF_UP))
            errs.append(Decimal(float(fc - a)).quantize(q9, ROUND_HALF_UP))
        if apes:
            n = len(apes)
            want[(et, dow)] = (
                n,
                round(float(sum(apes)) / n, 6),
                round(float(sum(errs)) / n, 6))

    got = {(r["event_type"], r["dow"]):
           (r["n_days"], r["mape"], r["mean_err"])
           for r in q_events_forecast_backtest(spark, sf).collect()}
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 2e-6, k
        assert abs(got[k][2] - want[k][2]) < 2e-6, k


# --------------------------------------------------------------------------
# CUSUM changepoint monitor (q_events_cusum_alarms)
# --------------------------------------------------------------------------


def test_cusum_matches_sequential_recursion_and_alarms_on_shift(
        spark, tmp_path):
    """The window-identity CUSUM (S_t = R_t − min(0, min_{j≤t} R_j))
    equals the textbook sequential recursion on an injected level shift,
    and the alarm actually fires past the shift (the sf testdata is
    stationary, so this is the only exercise of the alarm path)."""
    import datetime as dtt
    import math

    from meteomatics_e2e_data_pipeline_spark.plans.timeseries import (
        CUSUM_H, CUSUM_K, q_events_cusum_alarms)

    # 30 days of 'error' counts: 10/day, then a shift to 25/day on day 21
    counts = [10] * 20 + [25] * 10
    rows, eid = [], 0
    for d, n in enumerate(counts):
        day = dtt.datetime(2024, 3, 1) + dtt.timedelta(days=d)
        for i in range(n):
            rows.append((eid, day + dtt.timedelta(seconds=i), i % 7,
                         "error", float(i), "{}"))
            eid += 1
    (spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, "
              "event_type string, value double, props string")
     .coalesce(1).write.parquet(str(tmp_path / "events.parquet")))

    got = {r["day"]: r for r in
           q_events_cusum_alarms(spark, str(tmp_path)).collect()}
    assert len(got) == 30

    # sequential reference, same float discipline (quantize y to 9 dp)
    mu = sum(counts) / len(counts)
    sigma = math.sqrt(sum((n - mu) ** 2 for n in counts) / len(counts))
    sp = sn = 0.0
    up_alarms = []
    for d, n in enumerate(counts):
        z = (n - mu) / sigma
        yp = round(z - CUSUM_K, 9)
        yn = round(-z - CUSUM_K, 9)
        sp = max(0.0, sp + yp)
        sn = max(0.0, sn + yn)
        day = (dtt.date(2024, 3, 1) + dtt.timedelta(days=d))
        r = got[day]
        assert abs(r["cusum_pos"] - round(sp, 6)) < 2e-6, (d, sp, r)
        assert abs(r["cusum_neg"] - round(sn, 6)) < 2e-6, (d, sn, r)
        up_alarms.append(r["cusum_pos"] > CUSUM_H)
        assert r["alarm"] == int(sp > CUSUM_H or sn > CUSUM_H), d
    # the upward shift is detected on the UPPER side: the positive
    # CUSUM never alarms during the low regime and does after the
    # shift. (The lower side legitimately accumulates during the
    # low-level prefix under global-mean standardization — that is
    # textbook CUSUM behavior, not a false positive to assert away.)
    assert not any(up_alarms[:20])
    assert any(up_alarms[21:])
