"""Salted aggregation correctness on skewed data; interval-join semantics
on a hand-checkable fixture."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from meteomatics_e2e_data_pipeline_spark.operators.rangejoin import interval_join
from meteomatics_e2e_data_pipeline_spark.operators.skew import salted_agg


def test_salted_agg_equals_plain(spark):
    # 90% of rows share one hot key — the exact shape salting exists for
    rows = [("hot", float(i % 7)) for i in range(9000)]
    rows += [(f"k{i % 50}", float(i)) for i in range(1000)]
    df = spark.createDataFrame(rows, "k string, v double")
    got = {r["k"]: (r["s"], r["n"], r["mn"], r["mx"], round(r["a"], 9))
           for r in salted_agg(df, ["k"],
                               {"s": ("sum", "v"), "n": ("count", "v"),
                                "mn": ("min", "v"), "mx": ("max", "v"),
                                "a": ("avg", "v")}).collect()}
    want = {r["k"]: (r["s"], r["n"], r["mn"], r["mx"], round(r["a"], 9))
            for r in df.groupBy("k").agg(
                F.sum("v").alias("s"), F.count("v").alias("n"),
                F.min("v").alias("mn"), F.max("v").alias("mx"),
                F.avg("v").alias("a")).collect()}
    assert got == want


def test_quantile_bucketing_matches_ntile_distribution(spark, sf_oracle):
    """The distributed quantile bucketing must produce near-equal bucket
    sizes and order-consistent assignment (higher value -> lower-or-equal
    bucket number never violated) versus the exact ntile."""
    from meteomatics_e2e_data_pipeline_spark.operators.skew import (
        bucket_by_quantiles,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table
    from pyspark.sql import Window

    orders = load_table(spark, sf_oracle, "orders")
    spend = (orders.groupBy("o_custkey")
             .agg(F.sum("o_totalprice").alias("v")))
    got = bucket_by_quantiles(spend, "v", 4)
    sizes = {r["bucket"]: r["count"] for r in
             got.groupBy("bucket").count().collect()}
    assert set(sizes) == {1, 2, 3, 4}
    n = sum(sizes.values())
    assert all(abs(s - n / 4) <= n * 0.02 + 2 for s in sizes.values())
    # monotone: bucket number never decreases as value increases
    w = Window.orderBy("v")
    viol = (got.withColumn("prev_b", F.lag("bucket").over(w))
            .filter(F.col("prev_b").isNotNull()
                    & (F.col("bucket") < F.col("prev_b"))).count())
    assert viol == 0


def test_interval_join_semantics(spark):
    T = dt.datetime
    points = spark.createDataFrame(
        [("a", T(2025, 1, 1, 10)), ("a", T(2025, 1, 1, 23)),
         ("a", T(2025, 1, 2, 1)), ("b", T(2025, 1, 1, 10))],
        "k string, ts timestamp")
    # one interval crossing midnight (spans 2 day-buckets), key 'b' has none
    intervals = spark.createDataFrame(
        [("a", T(2025, 1, 1, 22), T(2025, 1, 2, 2))],
        "k string, lo timestamp, hi timestamp")
    got = {(r["k"], r["ts"]) for r in
           interval_join(points, intervals, ["k"], "ts", "lo", "hi").collect()}
    assert got == {("a", T(2025, 1, 1, 23)), ("a", T(2025, 1, 2, 1))}
    # no duplicate rows even though the interval covers two buckets
    assert interval_join(points, intervals, ["k"], "ts", "lo", "hi").count() == 2

    # LEFT join keeps unmatched points with NULL interval payload
    left = interval_join(points, intervals, ["k"], "ts", "lo", "hi",
                         how="left").collect()
    assert len(left) == 4
    by_key = {(r["k"], r["ts"]): r["lo"] for r in left}
    assert by_key[("b", T(2025, 1, 1, 10))] is None   # no interval for 'b'
    assert by_key[("a", T(2025, 1, 1, 10))] is None   # outside the window
    assert by_key[("a", T(2025, 1, 1, 23))] is not None


def test_quantile_bucketing_nulls_get_null_bucket(spark):
    from meteomatics_e2e_data_pipeline_spark.operators.skew import (
        bucket_by_quantiles,
    )
    df = spark.createDataFrame(
        [(float(i),) for i in range(1, 9)] + [(None,), (None,)], "x double")
    out = bucket_by_quantiles(df, "x", 4)
    got = {r["x"]: r["bucket"] for r in out.collect()}
    assert got[None] is None                      # not the top bucket
    assert got[8.0] == 4 and got[1.0] == 1        # real values unaffected


def test_interval_join_rejects_outer_how(spark):
    import pytest as _pytest
    from meteomatics_e2e_data_pipeline_spark.operators.rangejoin import (
        interval_join,
    )
    pts = spark.createDataFrame(
        [("a", "2024-01-01 12:00:00")], "k string, ts string") \
        .withColumn("ts", F.to_timestamp("ts"))
    ivs = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-05 23:59:59")],
        "k string, s string, e string") \
        .withColumn("s", F.to_timestamp("s")).withColumn("e", F.to_timestamp("e"))
    with _pytest.raises(ValueError, match="inner.*left"):
        interval_join(pts, ivs, ["k"], "ts", "s", "e", how="full")


def test_salted_join_matches_plain_join(spark):
    """The salted equi-join must be value-identical to the plain join,
    including under a deliberately hot key with duplicate rows."""
    from pyspark.sql import functions as F

    from meteomatics_e2e_data_pipeline_spark.operators.skew import (
        salted_join,
    )

    big = spark.createDataFrame(
        [(1, f"e{i}") for i in range(500)]      # hot key 1
        + [(k, f"x{k}") for k in range(2, 40)], # long tail
        "k long, payload string")
    small = spark.createDataFrame(
        [(k, f"dim{k}") for k in range(0, 40)], "k long, attr string")
    want = {tuple(r) for r in big.join(small, "k").collect()}
    got_rows = salted_join(big, small, "k", n_salts=8).collect()
    assert {tuple(r) for r in got_rows} == want
    assert len(got_rows) == len(want) == 538
    # plan sanity: the join key carries the salt, so the hot key's rows
    # spread across salt partitions rather than one task
    plan = salted_join(big, small, "k", n_salts=8) \
        ._jdf.queryExecution().executedPlan().toString()
    assert "__salt" in plan


def test_bloom_pruned_join_is_exact_and_prunes(spark):
    """The Bloom-pruned join must equal the plain join exactly (false
    positives die in the real join) while the row-local pre-filter
    passes strictly fewer big-side rows than a full scan."""
    from pyspark.sql import functions as F

    from meteomatics_e2e_data_pipeline_spark.operators.skew import (
        bloom_pruned_join,
    )
    from meteomatics_e2e_data_pipeline_spark.sources.tables import load_table

    sf = "/root/testdata/sf0.001"
    li = load_table(spark, sf, "lineitem")
    urgent = (load_table(spark, sf, "orders")
              .filter(F.col("o_orderpriority") == "1-URGENT")
              .select(F.col("o_orderkey").alias("l_orderkey"),
                      "o_orderpriority"))
    want = {tuple(r) for r in li.join(urgent, "l_orderkey").collect()}
    got_df = bloom_pruned_join(li, urgent, "l_orderkey")
    assert {tuple(r) for r in got_df.collect()} == want
    # pruning really happened: a 5-key filter passes only a sliver of
    # the big side before any join
    from meteomatics_e2e_data_pipeline_spark.operators.skew import (
        bloom_key_prefilter,
    )
    tiny = urgent.limit(5)
    survivors = bloom_key_prefilter(li, tiny, "l_orderkey").count()
    assert survivors < li.count() * 0.05
    # ... and never drops a true match (no false negatives)
    assert survivors >= li.join(tiny, "l_orderkey").count()
