"""Time-series analytics over the ``events`` table — the operator family a
metrics/observability workload runs on an event lake: gap-fill with forward
fill, conversion funnels, cohort retention, time-weighted averages, and
trailing-window anomaly scores.

The reference pipeline has no streaming/time-series surface (its marts are
daily snapshots — ``fact_weather_params_history.sql`` takes "latest issuance
wins" per day); these queries are the batch time-series capabilities the
SURVEY §2.10/§2.13 extension families imply, expressed Spark-first.

Oracle-parity conventions (see ``plans/analytics.py`` module docstring), plus
two specific to this family:

- "last observation per day" is specified by the oracle as
  ``row_number() = 1`` under ``ORDER BY ts DESC, event_id DESC``; the Spark
  plan implements the identical semantics with the partial-aggregatable
  ``max_by(value, struct(ts, event_id))`` — one map-side-combinable shuffle
  instead of a window sort (the oracle is the spec, not the plan).
- float reductions over per-entity interval lists use the pinned-order fold
  (``sort_array`` + ``aggregate`` vs DuckDB ``list(... ORDER BY ...)`` +
  ``list_aggregate``) so both engines accumulate in the same order —
  bit-identical, no tolerance needed (same pattern as
  ``operators/textops.py:unigram_logprob``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..sources.tables import load_table

# --------------------------------------------------------------------------
# Gap-fill + forward fill (the timeseries "locf" operator)
# --------------------------------------------------------------------------


def q_events_gapfill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user daily spine with last-observation-carried-forward.

    Plan shape at scale: one map-side-combinable hash aggregate builds the
    per-(user, day) last value AND (reused grouping) the per-user min/max
    day; the spine is a row-local ``sequence`` explode off the per-user
    bounds (never a driver loop, never a cross join against a global
    calendar); the fill is one window shuffle on user_id. Spine width is
    bounded per user, so no task sees more than one user's span.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.withColumn("day", F.to_date("ts"))
        .groupBy("user_id", "day")
        .agg(F.max_by("value", F.struct(F.col("ts"), F.col("event_id")))
             .alias("day_value"))
    )
    bounds = daily.groupBy("user_id").agg(
        F.min("day").alias("mn"), F.max("day").alias("mx"))
    spine = bounds.select(
        "user_id", F.explode(F.sequence("mn", "mx")).alias("day"))
    w = (Window.partitionBy("user_id").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    return (
        spine.join(daily, ["user_id", "day"], "left")
        .select(
            "user_id", "day",
            F.last("day_value", ignorenulls=True).over(w).alias("filled_value"),
            F.col("day_value").isNotNull().cast("int").alias("observed"),
        )
    )


ORACLE_GAPFILL = """
WITH ranked AS (
  SELECT user_id, CAST(ts AS DATE) AS day, value,
         row_number() OVER (PARTITION BY user_id, CAST(ts AS DATE)
                            ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
),
daily AS (SELECT user_id, day, value AS day_value FROM ranked WHERE rn = 1),
bounds AS (SELECT user_id, min(day) AS mn, max(day) AS mx FROM daily GROUP BY user_id),
spine AS (
  SELECT user_id,
         CAST(unnest(generate_series(CAST(mn AS TIMESTAMP),
                                     CAST(mx AS TIMESTAMP),
                                     INTERVAL 1 DAY)) AS DATE) AS day
  FROM bounds
)
SELECT s.user_id, s.day,
       last_value(d.day_value IGNORE NULLS) OVER (
         PARTITION BY s.user_id ORDER BY s.day
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value,
       (d.day_value IS NOT NULL)::INT AS observed
FROM spine s LEFT JOIN daily d USING (user_id, day)
"""


# --------------------------------------------------------------------------
# Conversion funnel (ordered-step sequence match)
# --------------------------------------------------------------------------


def q_events_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel signup → click → purchase: each step's timestamp is
    the first occurrence at-or-after the previous step's.

    Plan shape at scale: three aggregations/joins ALL keyed on user_id, so
    one hash partitioning is reused end-to-end (co-partitioned joins, no
    re-shuffle); each step's input is pre-filtered to its event type before
    the join, so only that type's rows move. The per-step frames are
    user-cardinality, not event-cardinality.
    """
    ev = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    s1 = (ev.filter(F.col("event_type") == "signup")
          .groupBy("user_id").agg(F.min("ts").alias("t_signup")))
    s2 = (ev.filter(F.col("event_type") == "click")
          .join(s1, "user_id")
          .filter(F.col("ts") >= F.col("t_signup"))
          .groupBy("user_id").agg(F.min("ts").alias("t_click")))
    s3 = (ev.filter(F.col("event_type") == "purchase")
          .join(s2, "user_id")
          .filter(F.col("ts") >= F.col("t_click"))
          .groupBy("user_id").agg(F.min("ts").alias("t_purchase")))
    return (
        s1.join(s2, "user_id", "left").join(s3, "user_id", "left")
        .select(
            "user_id", "t_signup", "t_click", "t_purchase",
            (F.lit(1)
             + F.col("t_click").isNotNull().cast("int")
             + F.col("t_purchase").isNotNull().cast("int")).alias("funnel_stage"),
        )
    )


ORACLE_FUNNEL = """
WITH s1 AS (
  SELECT user_id, min(ts) AS t_signup FROM events
  WHERE event_type = 'signup' GROUP BY user_id
),
s2 AS (
  SELECT e.user_id, min(e.ts) AS t_click
  FROM events e JOIN s1 USING (user_id)
  WHERE e.event_type = 'click' AND e.ts >= s1.t_signup
  GROUP BY e.user_id
),
s3 AS (
  SELECT e.user_id, min(e.ts) AS t_purchase
  FROM events e JOIN s2 USING (user_id)
  WHERE e.event_type = 'purchase' AND e.ts >= s2.t_click
  GROUP BY e.user_id
)
SELECT s1.user_id, s1.t_signup, s2.t_click, s3.t_purchase,
       (1 + (s2.t_click IS NOT NULL)::INT
          + (s3.t_purchase IS NOT NULL)::INT) AS funnel_stage
FROM s1 LEFT JOIN s2 USING (user_id) LEFT JOIN s3 ON s1.user_id = s3.user_id
"""


# --------------------------------------------------------------------------
# Cohort retention matrix
# --------------------------------------------------------------------------


def q_events_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users bucketed by the Monday of their first
    event; retained = active (any event) in cohort-week + N.

    Plan shape at scale: first-seen is a min aggregate on user_id; the join
    back to activity is co-partitioned on user_id; the distinct collapses
    (cohort, offset, user) BEFORE the count, and both the distinct and the
    final count are partial-aggregatable. week_offset is pure integer day
    arithmetic — no engine-specific week numbering in the comparison.
    """
    ev = load_table(spark, sf_dir, "events").select(
        "user_id", F.to_date("ts").alias("day"))
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("day")).cast("date").alias("cohort_week"))
    return (
        ev.join(first_seen, "user_id")
        .select(
            "user_id", "cohort_week",
            F.floor(F.datediff("day", "cohort_week") / 7)
            .cast("int").alias("week_offset"),
        )
        .distinct()
        .groupBy("cohort_week", "week_offset")
        .agg(F.count(F.lit(1)).alias("active_users"))
    )


ORACLE_RETENTION = """
WITH act AS (SELECT user_id, CAST(ts AS DATE) AS day FROM events),
first_seen AS (
  SELECT user_id, CAST(date_trunc('week', min(day)) AS DATE) AS cohort_week
  FROM act GROUP BY user_id
)
SELECT cohort_week, week_offset, count(*) AS active_users
FROM (
  SELECT DISTINCT a.user_id, f.cohort_week,
         (floor((a.day - f.cohort_week) / 7))::INT AS week_offset
  FROM act a JOIN first_seen f USING (user_id)
)
GROUP BY cohort_week, week_offset
"""


# --------------------------------------------------------------------------
# Time-weighted average (interval-weighted mean, pinned-order fold)
# --------------------------------------------------------------------------


def q_events_twa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user time-weighted average of ``value``: each reading is weighted
    by the seconds until the user's next event (the last reading carries no
    weight — standard left-closed TWA).

    Float parity: the weighted sums are pinned-order folds over the user's
    interval list (``sort_array`` + ``aggregate`` here, ``list(... ORDER BY
    ts, event_id)`` + ``list_aggregate`` in the oracle) — both engines add
    in the same order, so the quotient is bit-identical before the
    display ``round``. The collected list is per-user and bounded by that
    user's event count; for unbounded entities swap the fold for plain
    ``sum`` + a documented tolerance (the fold is the exactness tier).

    Plan shape at scale: one window shuffle on user_id computes the lead
    durations; the fold is one hash aggregate on the same key (partitioning
    reused). Nothing corpus-wide ever sorts globally.
    """
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    epoch = F.col("ts").cast("double")
    dur = F.lead(epoch).over(w) - epoch
    stepped = (
        ev.select("user_id", "ts", "event_id", "value")
        .withColumn("dur", dur)
        .filter(F.col("dur").isNotNull())
        .withColumn("wv", F.col("value") * F.col("dur"))
    )
    arr = F.sort_array(F.collect_list(F.struct("ts", "event_id", "wv", "dur")))
    fold = lambda field: F.aggregate(  # noqa: E731 - tiny local builder
        F.transform(arr, lambda s: s[field]),
        F.lit(0.0), lambda acc, x: acc + x)
    return (
        stepped.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n_intervals"),
             F.round(fold("wv") / fold("dur"), 6).alias("twa_value"))
    )


ORACLE_TWA = """
WITH stepped AS (
  SELECT user_id, ts, event_id, value,
         lead(epoch(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id)
           - epoch(ts) AS dur
  FROM events
)
SELECT user_id, count(*) AS n_intervals,
       round(list_aggregate(list(value * dur ORDER BY ts, event_id), 'sum')
             / list_aggregate(list(dur ORDER BY ts, event_id), 'sum'),
             6) AS twa_value
FROM stepped WHERE dur IS NOT NULL
GROUP BY user_id
"""


# --------------------------------------------------------------------------
# Trailing-window anomaly score
# --------------------------------------------------------------------------


def q_events_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily event-count anomaly score per event type: z-score of today's
    count against the trailing 7-row window (current day inclusive).

    Float parity without trusting either engine's stddev kernel: counts are
    integers, so the window ``sum``/``sum of squares`` are EXACT in double;
    mean and variance are then derived with the identical explicit formula
    on both sides — every step is a deterministic IEEE op on identical
    inputs, so no tolerance and no reliance on Welford-vs-naive agreement.
    z is NULL until the window is full (fewer than 7 trailing days).

    Plan shape at scale: one hash aggregate to (type, day) — map-side
    combinable — then one window shuffle on event_type over the tiny
    (types × days) frame. The raw event table never enters a window.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-6, Window.currentRow))
    nd = F.col("n").cast("double")
    sum_w = F.sum(nd).over(w)
    sumsq_w = F.sum(nd * nd).over(w)
    cnt_w = F.count(F.lit(1)).over(w).cast("double")
    mean = sum_w / cnt_w
    var = (sumsq_w - sum_w * sum_w / cnt_w) / (cnt_w - 1)
    z = F.when((cnt_w == 7) & (var > 0),
               F.round((nd - mean) / F.sqrt(var), 6))
    return daily.select("event_type", "day", "n", z.alias("zscore"))


ORACLE_ZSCORE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
win AS (
  SELECT event_type, day, n,
         sum(n::DOUBLE)        OVER w AS sum_w,
         sum(n::DOUBLE * n)    OVER w AS sumsq_w,
         count(*) OVER w               AS cnt_w
  FROM daily
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)
)
SELECT event_type, day, n,
       CASE WHEN cnt_w = 7
             AND (sumsq_w - sum_w * sum_w / cnt_w) / (cnt_w - 1) > 0
            THEN round((n - sum_w / cnt_w)
                       / sqrt((sumsq_w - sum_w * sum_w / cnt_w) / (cnt_w - 1)),
                       6)
       END AS zscore
FROM win
"""


EWMA_ALPHA = 0.3
EWMA_WINDOW = 14


def q_events_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily event count per
    event type — the smoothing baseline dashboards plot against the raw
    series (and the anomaly denominator when z-scores are too twitchy).

    Semantics: the textbook recurrence ``a_0 = n_0; a_k = α·n_k +
    (1−α)·a_{k−1}`` restarted over a trailing EWMA_WINDOW-row history
    (bounded memory: a day's smoothed value depends on at most 14 rows,
    so backfills reproduce any day's value without replaying all
    history; weight lost beyond 14 rows is (1−α)^14 ≈ 0.7 %).

    Float parity: the fold is a pinned-order sequential reduction over
    the frame's rows (day ascending) on BOTH engines — Spark
    ``aggregate`` over the window-collected list, DuckDB ``list_reduce``
    over the frame-ordered ``list(...)`` with its first element as the
    seed —
    identical IEEE op sequence, no pow(), no tolerance.

    Plan shape at scale: one map-side-combinable hash aggregate to
    (type, day), then one window over the tiny (types × days) rollup.
    The raw event table never enters a window; per-row state is a ≤ 14
    element array.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(-(EWMA_WINDOW - 1), Window.currentRow))
    hist = F.array_sort(
        F.collect_list(
            F.struct("day", F.col("n").cast("double").alias("n"))).over(w))
    vals = F.expr("transform(__hist, s -> s.n)")
    a = EWMA_ALPHA
    ewma = F.aggregate(
        F.slice(vals, 2, F.greatest(F.size(vals) - 1, F.lit(0))),
        F.element_at(vals, 1),
        lambda acc, x: F.lit(a) * x + F.lit(1 - a) * acc)
    return (
        daily.withColumn("__hist", hist)
        .select("event_type", "day", "n",
                F.round(ewma, 6).alias("ewma"))
    )


ORACLE_EWMA = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
win AS (
  SELECT event_type, day, n,
         list(n::DOUBLE) OVER (
           PARTITION BY event_type ORDER BY day
           ROWS BETWEEN {EWMA_WINDOW - 1} PRECEDING AND CURRENT ROW
         ) AS hist
  FROM daily
)
SELECT event_type, day, n,
       round(list_reduce(hist,
                         (a, x) -> {EWMA_ALPHA} * x + {1 - EWMA_ALPHA} * a),
             6) AS ewma
FROM win
"""


CORR_TYPE_X = "click"
CORR_TYPE_Y = "purchase"
CORR_WINDOW = 7


def q_events_rolling_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing CORR_WINDOW-day Pearson correlation between two event
    types' daily counts (does purchasing track clicking this week?).

    Days where either type is absent count as 0 (the day spine is the
    union of days where ANY event occurred — one aggregate provides
    both series via conditional sums, no join, no gap-fill pass).

    Float parity uses the `events_zscore` trick: the windowed sums
    (Σx, Σy, Σx², Σy², Σxy, cnt) are integer-exact in double, and the
    correlation is derived with the identical explicit formula on both
    engines — no reliance on either engine's corr() kernel. NULL until
    the window holds CORR_WINDOW days or when either variance is 0.

    Plan shape at scale: one hash aggregate to day grain (map-side
    combinable), then ONE unpartitioned window over the days-only frame
    — safe because it is bounded by the calendar (3 650 rows a decade),
    never by event or type cardinality.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.filter(F.col("event_type").isin(CORR_TYPE_X, CORR_TYPE_Y))
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.sum(F.when(F.col("event_type") == CORR_TYPE_X, 1)
                   .otherwise(0)).cast("double").alias("x"),
             F.sum(F.when(F.col("event_type") == CORR_TYPE_Y, 1)
                   .otherwise(0)).cast("double").alias("y"))
    )
    w = (Window.orderBy("day")
         .rowsBetween(-(CORR_WINDOW - 1), Window.currentRow))
    sx = F.sum("x").over(w)
    sy = F.sum("y").over(w)
    sxx = F.sum(F.col("x") * F.col("x")).over(w)
    syy = F.sum(F.col("y") * F.col("y")).over(w)
    sxy = F.sum(F.col("x") * F.col("y")).over(w)
    cnt = F.count(F.lit(1)).over(w).cast("double")
    vx = cnt * sxx - sx * sx
    vy = cnt * syy - sy * sy
    corr = F.when((cnt == CORR_WINDOW) & (vx > 0) & (vy > 0),
                  F.round((cnt * sxy - sx * sy) / F.sqrt(vx * vy), 6))
    return daily.select(
        "day", F.col("x").cast("bigint").alias("n_x"),
        F.col("y").cast("bigint").alias("n_y"), corr.alias("rolling_corr"))


ORACLE_ROLLING_CORR = f"""
WITH daily AS (
  SELECT CAST(ts AS DATE) AS day,
         sum(CASE WHEN event_type = '{CORR_TYPE_X}' THEN 1 ELSE 0 END)::DOUBLE AS x,
         sum(CASE WHEN event_type = '{CORR_TYPE_Y}' THEN 1 ELSE 0 END)::DOUBLE AS y
  FROM events
  WHERE event_type IN ('{CORR_TYPE_X}', '{CORR_TYPE_Y}')
  GROUP BY 1
),
win AS (
  SELECT day, x, y,
         sum(x)     OVER w AS sx,  sum(y)     OVER w AS sy,
         sum(x * x) OVER w AS sxx, sum(y * y) OVER w AS syy,
         sum(x * y) OVER w AS sxy, count(*)   OVER w AS cnt
  FROM daily
  WINDOW w AS (ORDER BY day
               ROWS BETWEEN {CORR_WINDOW - 1} PRECEDING AND CURRENT ROW)
)
SELECT day, x::BIGINT AS n_x, y::BIGINT AS n_y,
       CASE WHEN cnt = {CORR_WINDOW}
             AND cnt * sxx - sx * sx > 0
             AND cnt * syy - sy * sy > 0
            THEN round((cnt * sxy - sx * sy)
                       / sqrt((cnt * sxx - sx * sx)
                              * (cnt * syy - sy * sy)), 6)
       END AS rolling_corr
FROM win
"""


HIST_BUCKET_WIDTH = 20.0
HIST_N_BUCKETS = 10


def q_events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type: bucket i covers
    [i·20, (i+1)·20), the last bucket clamps the upper tail (the
    standard distribution profile an analytics engine ships next to
    percentiles — cheap enough to run on every ingest batch).

    Plan shape at scale: bucket assignment is row-local arithmetic; the
    count is ONE map-side-combinable hash aggregate on (type, bucket) —
    cardinality types × HIST_N_BUCKETS, no window, no sort until the
    final tiny ORDER of the result."""
    ev = load_table(spark, sf_dir, "events")
    bucket = F.least(
        F.floor(F.col("value") / HIST_BUCKET_WIDTH),
        F.lit(HIST_N_BUCKETS - 1)).cast("int")
    return (
        ev.select("event_type", bucket.alias("bucket"))
        .groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("event_type", "bucket",
                F.round(F.col("bucket") * HIST_BUCKET_WIDTH, 1).alias("lo"),
                F.round((F.col("bucket") + 1) * HIST_BUCKET_WIDTH, 1)
                .alias("hi"), "n")
    )


ORACLE_VALUE_HISTOGRAM = f"""
SELECT event_type,
       least(floor(value / {HIST_BUCKET_WIDTH}),
             {HIST_N_BUCKETS - 1})::INT AS bucket,
       round(least(floor(value / {HIST_BUCKET_WIDTH}),
                   {HIST_N_BUCKETS - 1}) * {HIST_BUCKET_WIDTH}, 1) AS lo,
       round((least(floor(value / {HIST_BUCKET_WIDTH}),
                    {HIST_N_BUCKETS - 1}) + 1) * {HIST_BUCKET_WIDTH}, 1) AS hi,
       count(*) AS n
FROM events
GROUP BY 1, 2, 3, 4
"""


# Iglewicz–Hoaglin constants for the modified z-score: 0.6745 ≈ Φ⁻¹(0.75)
# scales MAD to σ-equivalents; |z| > 3.5 is their recommended outlier cut.
MAD_C = 0.6745
MAD_Z_CUTOFF = 3.5


def q_events_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust daily-volume anomaly detection per event type: modified
    z-score on median/MAD instead of mean/stddev — the estimator of
    choice when the outliers you're hunting are exactly what would
    poison a mean/stddev baseline (a single 100× spike inflates stddev
    enough to hide itself; it barely moves the median).

    Float parity without tolerance: the series is the INTEGER daily
    count, and every median is an exact half-integer (interpolated
    midpoint of two integers), so med, MAD and the (n − med) numerator
    are all exact doubles; the one rounding point is the final 6-dp
    modified z, and the anomaly flag compares the ROUNDED z on both
    engines so the cut cannot boundary-flip.

    Plan shape at scale: one map-side-combinable hash aggregate to
    (type, day), then two per-TYPE aggregates over the tiny daily frame
    (types × days rows) with broadcast joins back. The raw events table
    is scanned once and never windowed; `percentile` is exact but runs
    only on the daily frame, never the event grain.
    """
    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    med = (daily.groupBy("event_type")
           .agg(F.percentile(F.col("n"), F.lit(0.5)).alias("med")))
    ad = (daily.join(F.broadcast(med), "event_type")
          .withColumn("__ad", F.abs(F.col("n") - F.col("med"))))
    mad = (ad.groupBy("event_type")
           .agg(F.percentile(F.col("__ad"), F.lit(0.5)).alias("mad")))
    z = F.when(F.col("mad") > 0,
               F.round(MAD_C * (F.col("n") - F.col("med")) / F.col("mad"), 6))
    return (
        ad.join(F.broadcast(mad), "event_type")
        .select("event_type", "day", "n", "med", "mad",
                z.alias("robust_z"),
                F.when(F.col("mad") > 0,
                       F.abs(z) > MAD_Z_CUTOFF).alias("is_anomaly"))
    )


ORACLE_ANOMALY_MAD = f"""
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*) AS n
  FROM events GROUP BY 1, 2
),
med AS (SELECT event_type, quantile_cont(n, 0.5) AS med
        FROM daily GROUP BY 1),
ad AS (
  SELECT d.event_type, d.day, d.n, m.med, abs(d.n - m.med) AS adev
  FROM daily d JOIN med m USING (event_type)
),
mad AS (SELECT event_type, quantile_cont(adev, 0.5) AS mad
        FROM ad GROUP BY 1)
SELECT a.event_type, a.day, a.n, a.med, m.mad,
       CASE WHEN m.mad > 0
            THEN round({MAD_C} * (a.n - a.med) / m.mad, 6) END AS robust_z,
       CASE WHEN m.mad > 0
            THEN abs(round({MAD_C} * (a.n - a.med) / m.mad, 6))
                 > {MAD_Z_CUTOFF} END AS is_anomaly
FROM ad a JOIN mad m USING (event_type)
"""



def q_events_dow_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal baseline: each (type, day) daily count
    against the mean count of the SAME weekday for that type — the
    deseasonalized ratio that separates "it's just Sunday" from a real
    shift (the poor man's STL seasonal component). Scale shape: one
    map-side-combinable daily aggregate, then a (type × 7)-row baseline
    frame joined back broadcast — the raw events are scanned once and
    never windowed. Integer sums divide exactly once, rounded at 6 dp
    on both engines."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    )
    base = (
        daily.groupBy("event_type", "dow")
        .agg((F.sum("n").cast("double") / F.count(F.lit(1)))
             .alias("baseline_raw"))
    )
    return (
        daily.join(F.broadcast(base), ["event_type", "dow"])
        .select("event_type", "day", "dow", "n",
                F.round("baseline_raw", 6).alias("baseline"),
                F.round(F.col("n") / F.col("baseline_raw"), 6)
                .alias("ratio"))
    )


def q_events_stl_decompose(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Additive trend/seasonal/residual decomposition per event type —
    the STL-lite read a monitoring dashboard draws: trend = centered
    7-day moving average of the daily count (ROWS BETWEEN 3 PRECEDING
    AND 3 FOLLOWING, partial at the edges on both engines), seasonal =
    that type's same-weekday mean minus its grand mean, residual = the
    leftover. All three terms derive from INTEGER sums divided once
    (exact sums → one deterministic IEEE division), so no
    order-dependent double summation exists anywhere — the
    cross-engine float policy's "ratio of exact sums" pattern applied
    three times. Scale shape: everything after the one map-side daily
    aggregate operates on the (type × day)-grain rollup; the MA window
    partitions by type, bounded by the date range, never the fact."""
    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    )
    w_ma = (Window.partitionBy("event_type").orderBy("day")
            .rowsBetween(-3, 3))
    trend = (F.sum("n").over(w_ma).cast("double")
             / F.count(F.lit(1)).over(w_ma))
    dowm = (daily.groupBy("event_type", "dow")
            .agg(F.sum("n").alias("__ds"), F.count(F.lit(1)).alias("__dc")))
    grand = (daily.groupBy("event_type")
             .agg(F.sum("n").alias("__gs"), F.count(F.lit(1)).alias("__gc")))
    seasonal = (F.col("__ds").cast("double") / F.col("__dc")
                - F.col("__gs").cast("double") / F.col("__gc"))
    return (
        daily.withColumn("__trend", trend)
        .join(F.broadcast(dowm), ["event_type", "dow"])
        .join(F.broadcast(grand), ["event_type"])
        .select(
            "event_type", "day", "n",
            F.round("__trend", 6).alias("trend"),
            F.round(seasonal, 6).alias("seasonal"),
            F.round(F.col("n") - F.col("__trend") - seasonal, 6)
            .alias("residual"))
    )


ORACLE_STL_DECOMPOSE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
  FROM events GROUP BY event_type, CAST(ts AS DATE)
),
d2 AS (SELECT *, (dayofweek(day))::INT AS dow FROM daily),
ma AS (
  SELECT *,
         sum(n) OVER w::DOUBLE / count(*) OVER w AS trend_raw
  FROM d2
  WINDOW w AS (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
),
dowm AS (SELECT event_type, dow, sum(n) AS ds, count(*) AS dc
         FROM d2 GROUP BY event_type, dow),
grand AS (SELECT event_type, sum(n) AS gs, count(*) AS gc
          FROM d2 GROUP BY event_type)
SELECT ma.event_type, day, n,
       round(trend_raw, 6) AS trend,
       round(ds::DOUBLE / dc - gs::DOUBLE / gc, 6) AS seasonal,
       round(n - trend_raw - (ds::DOUBLE / dc - gs::DOUBLE / gc), 6)
         AS residual
FROM ma
JOIN dowm  ON ma.event_type = dowm.event_type AND ma.dow = dowm.dow
JOIN grand ON ma.event_type = grand.event_type
"""


ORACLE_DOW_BASELINE = """
WITH daily AS (
  SELECT event_type, CAST(ts AS DATE) AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
d2 AS (SELECT *, dayofweek(day)::INT AS dow FROM daily),
base AS (SELECT event_type, dow,
                sum(n)::DOUBLE / count(*) AS baseline_raw
         FROM d2 GROUP BY 1, 2)
SELECT d2.event_type, day, d2.dow, n,
       round(baseline_raw, 6) AS baseline,
       round(n / baseline_raw, 6) AS ratio
FROM d2 JOIN base ON d2.event_type = base.event_type AND d2.dow = base.dow
"""


def q_events_forecast_backtest(spark: SparkSession,
                               sf_dir: str) -> DataFrame:
    """Walk-forward seasonal-naive forecast backtest — the evaluation
    loop behind every capacity-planning baseline: forecast each
    (type, day) daily count as the mean of the SAME weekday's counts
    over STRICTLY PRIOR days (ROWS UNBOUNDED PRECEDING AND 1
    PRECEDING — no leakage by construction), then report per
    (type, dow) the exact day count, MAPE, and signed mean error.

    Float policy (the module's "ratio of exact sums" pattern): daily
    counts are integers; the forecast is one exact int-sum / count
    division; each day's APE and error quantize straight to
    DECIMAL(18,9) (double→decimal cast: HALF_UP in Spark, to-nearest
    in DuckDB — same classifier-gradient pattern, midpoints
    measure-zero) so the cross-day mean is an exact decimal sum with
    one final division. Scale shape: one map-side daily aggregate;
    the window runs over the (type × day) rollup — calendar-bounded,
    partitioned by (type, dow), never the raw events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (
        ev.groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn("dow", (F.dayofweek("day") - 1).cast("int"))
    )
    w = (Window.partitionBy("event_type", "dow").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, -1))
    scored = (
        daily
        .withColumn("s", F.sum("n").over(w))
        .withColumn("c", F.count(F.lit(1)).over(w))
        .filter(F.col("c") >= 1)
        .select("event_type", "dow",
                F.col("n").cast("double").alias("a"),
                (F.col("s").cast("double") / F.col("c")).alias("fc"))
    )
    t = scored.select(
        "event_type", "dow",
        (F.abs(F.col("a") - F.col("fc")) / F.col("a"))
        .cast("decimal(18,9)").alias("ape"),
        (F.col("fc") - F.col("a")).cast("decimal(18,9)").alias("err"))
    return (
        t.groupBy("event_type", "dow")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_days"),
             F.round(F.sum("ape").cast("double") / F.count(F.lit(1)), 6)
             .alias("mape"),
             F.round(F.sum("err").cast("double") / F.count(F.lit(1)), 6)
             .alias("mean_err"))
    )


ORACLE_FORECAST_BACKTEST = """
WITH daily AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
w AS (
  SELECT event_type, dayofweek(day) AS dow, day, n,
         sum(n) OVER (PARTITION BY event_type, dayofweek(day)
                      ORDER BY day
                      ROWS BETWEEN UNBOUNDED PRECEDING
                               AND 1 PRECEDING) AS s,
         count(*) OVER (PARTITION BY event_type, dayofweek(day)
                        ORDER BY day
                        ROWS BETWEEN UNBOUNDED PRECEDING
                                 AND 1 PRECEDING) AS c
  FROM daily
),
f AS (
  SELECT event_type, dow, n::DOUBLE AS a, s::DOUBLE / c AS fc
  FROM w WHERE c >= 1
),
t AS (
  SELECT event_type, dow,
         (abs(a - fc) / a)::DECIMAL(18,9) AS ape,
         (fc - a)::DECIMAL(18,9) AS err
  FROM f
)
SELECT event_type, dow::INT AS dow, count(*)::BIGINT AS n_days,
       round((sum(ape))::DOUBLE / count(*), 6) AS mape,
       round((sum(err))::DOUBLE / count(*), 6) AS mean_err
FROM t GROUP BY 1, 2
"""


CUSUM_K = 0.5   # CUSUM slack, in σ units
CUSUM_H = 4     # alarm threshold, in σ units (integer → exact compares)


def q_events_cusum_alarms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tabular CUSUM changepoint monitor (Page 1954 — the standard
    drift detector for pipeline health metrics): per (event_type, day),
    the one-sided upper/lower CUSUM statistics of the standardized
    daily count, and an alarm flag where either side exceeds
    ``CUSUM_H``σ.

    The textbook recursion ``S_t = max(0, S_{t-1} + z_t - k)`` is not a
    window function, but its closed form is: with ``R_t = Σ_{j≤t}
    (z_j - k)``, ``S_t = R_t - min(0, min_{j≤t} R_j)`` — two stacked
    running aggregates (sum, then min) over the same partitioned
    window. Float policy: the per-day increment quantizes to
    DECIMAL(18,9) once (deterministic double ops: mean = exact-int
    sum / count, σ = sqrt of an exact decimal sum of squared
    deviations — sqrt is IEEE correctly-rounded in both engines, unlike
    libm ln/exp), so every running sum/min and the ``> H`` alarm
    compare are EXACT decimal arithmetic — no cross-engine drift can
    flip an alarm. Scale shape: one map-side daily rollup, then
    windows over the (type × day) frame — calendar-bounded,
    partitioned by event_type, never the raw events."""
    from pyspark.sql import Window

    ev = load_table(spark, sf_dir, "events")
    daily = (ev.groupBy("event_type", F.to_date("ts").alias("day"))
             .agg(F.count(F.lit(1)).alias("n")))
    stats = (daily.groupBy("event_type")
             .agg(F.sum("n").alias("__s"), F.count(F.lit(1)).alias("__c")))
    m = (daily.join(F.broadcast(stats), "event_type")
         .withColumn("__mu", F.col("__s").cast("double") / F.col("__c")))
    dev = F.col("n").cast("double") - F.col("__mu")
    sig = (m.groupBy("event_type")
           .agg(F.sum((dev * dev).cast("decimal(25,12)")).alias("__ssq"),
                F.first("__c").alias("__c"))
           .select("event_type",
                   F.sqrt(F.col("__ssq").cast("double") / F.col("__c"))
                   .alias("__sigma")))
    z = (F.col("n").cast("double") - F.col("__mu")) / F.col("__sigma")
    base = (m.join(F.broadcast(sig), "event_type")
            .select("event_type", "day", "n",
                    (z - F.lit(CUSUM_K)).cast("decimal(18,9)").alias("__yp"),
                    (-z - F.lit(CUSUM_K)).cast("decimal(18,9)").alias("__yn")))
    w = (Window.partitionBy("event_type").orderBy("day")
         .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    r = (base.withColumn("__rp", F.sum("__yp").over(w))
         .withColumn("__rn", F.sum("__yn").over(w)))
    mn = (r.withColumn("__mrp", F.min("__rp").over(w))
          .withColumn("__mrn", F.min("__rn").over(w)))
    zero = F.lit(0).cast("decimal(18,9)")
    sp = F.col("__rp") - F.least(zero, F.col("__mrp"))
    sn = F.col("__rn") - F.least(zero, F.col("__mrn"))
    return mn.select(
        "event_type", "day", "n",
        F.round(sp.cast("double"), 6).alias("cusum_pos"),
        F.round(sn.cast("double"), 6).alias("cusum_neg"),
        ((sp > CUSUM_H) | (sn > CUSUM_H)).cast("int").alias("alarm"))


ORACLE_CUSUM_ALARMS = f"""
WITH daily AS (
  SELECT event_type, ts::DATE AS day, count(*)::BIGINT AS n
  FROM events GROUP BY 1, 2
),
st AS (SELECT event_type, sum(n)::BIGINT AS s, count(*)::BIGINT AS c
       FROM daily GROUP BY 1),
m AS (SELECT d.*, s::DOUBLE / c AS mu, c
      FROM daily d JOIN st USING (event_type)),
sg AS (SELECT event_type,
              sqrt((sum(((n - mu) * (n - mu))::DECIMAL(25,12)))::DOUBLE
                   / any_value(c)) AS sigma
       FROM m GROUP BY event_type),
z AS (SELECT m.event_type, day, n,
             (((n - mu) / sigma) - {CUSUM_K})::DECIMAL(18,9) AS yp,
             ((-((n - mu) / sigma)) - {CUSUM_K})::DECIMAL(18,9) AS yn
      FROM m JOIN sg USING (event_type)),
r AS (SELECT *, sum(yp) OVER w AS rp, sum(yn) OVER w AS rn
      FROM z
      WINDOW w AS (PARTITION BY event_type ORDER BY day
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)),
mn AS (SELECT *, min(rp) OVER w AS mrp, min(rn) OVER w AS mrn
       FROM r
       WINDOW w AS (PARTITION BY event_type ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW))
SELECT event_type, day, n,
       round((rp - least(0::DECIMAL(18,9), mrp))::DOUBLE, 6) AS cusum_pos,
       round((rn - least(0::DECIMAL(18,9), mrn))::DOUBLE, 6) AS cusum_neg,
       ((rp - least(0::DECIMAL(18,9), mrp)) > {CUSUM_H}
        OR (rn - least(0::DECIMAL(18,9), mrn)) > {CUSUM_H})::INT AS alarm
FROM mn
"""


TS_QUERIES = {
    "events_gapfill": q_events_gapfill,
    "events_funnel": q_events_funnel,
    "events_retention": q_events_retention,
    "events_twa": q_events_twa,
    "events_zscore": q_events_zscore,
    "events_anomaly_mad": q_events_anomaly_mad,
    "events_ewma": q_events_ewma,
    "events_rolling_corr": q_events_rolling_corr,
    "events_value_histogram": q_events_value_histogram,
    "events_dow_baseline": q_events_dow_baseline,
    "events_stl_decompose": q_events_stl_decompose,
    "events_forecast_backtest": q_events_forecast_backtest,
    "events_cusum_alarms": q_events_cusum_alarms,
}


def ts_oracle() -> dict[str, str]:
    return {
        "events_gapfill": ORACLE_GAPFILL,
        "events_funnel": ORACLE_FUNNEL,
        "events_retention": ORACLE_RETENTION,
        "events_twa": ORACLE_TWA,
        "events_zscore": ORACLE_ZSCORE,
        "events_anomaly_mad": ORACLE_ANOMALY_MAD,
        "events_ewma": ORACLE_EWMA,
        "events_rolling_corr": ORACLE_ROLLING_CORR,
        "events_value_histogram": ORACLE_VALUE_HISTOGRAM,
        "events_dow_baseline": ORACLE_DOW_BASELINE,
        "events_stl_decompose": ORACLE_STL_DECOMPOSE,
        "events_forecast_backtest": ORACLE_FORECAST_BACKTEST,
        "events_cusum_alarms": ORACLE_CUSUM_ALARMS,
    }
