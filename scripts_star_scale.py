#!/usr/bin/env python
"""5x scale table for the weather-star fold (VERDICT r12 directive #8):
the one increment-proportionality claim without measured evidence. Same
protocol as the near-dup tables (PLANS.md r10/r11): state scaled 5x, a
FIXED-size increment folded, fold time ratio + term decomposition
(winners probe vs apply). Prints one JSON line."""

from __future__ import annotations

import json
import time
from datetime import date, datetime, timedelta

from pyspark.sql import functions as F


def build(spark, root, n_cities):
    import meteomatics_e2e_data_pipeline_spark.plans.star_lakehouse as sl
    star = sl.create_weather_star(spark, root)
    as_of = sl.AS_OF
    lo = datetime.combine(as_of - timedelta(days=1), datetime.min.time())
    hours = 24 * 8
    base = (spark.range(n_cities).selectExpr("id as cid")
            .crossJoin(spark.range(8).selectExpr("id as pid"))
            .crossJoin(spark.range(hours).selectExpr("id as hid"))
            .select(
                F.concat(F.lit("f_"), "cid", F.lit("_"), F.lit("boot"))
                .alias("file_path"),
                F.lit(lo).alias("file_modified"),
                F.lit("zz").alias("country"),
                F.concat(F.lit("city"), "cid").alias("city"),
                F.lit(lo).alias("date_generated"),
                F.concat(F.lit("param"), "pid").alias("parameter"),
                (F.col("cid") * 1.0).alias("latitude"),
                (F.col("pid") * 1.0).alias("longitude"),
                (F.lit(lo) + F.make_interval(hours=F.col("hid")))
                .alias("reading_datetime"),
                F.col("hid").cast("string").alias("reading_value")))
    star.stg.append(base.repartition(8))
    sl.maintain_weather_star(spark, star, as_of=as_of)  # bootstrap, untimed
    return star, sl, as_of, lo


def increment(spark, star, sl, as_of, lo, gen_shift):
    """Fixed-size increment: ONE city's params reissued at a newer
    date_generated (winner replacement for every touched key)."""
    hours = 24 * 8
    inc = (spark.range(1).selectExpr("id as cid")
           .crossJoin(spark.range(8).selectExpr("id as pid"))
           .crossJoin(spark.range(hours).selectExpr("id as hid"))
           .select(
               F.concat(F.lit("f_inc"), F.lit(gen_shift)).alias("file_path"),
               F.lit(lo).alias("file_modified"),
               F.lit("zz").alias("country"),
               F.concat(F.lit("city"), "cid").alias("city"),
               (F.lit(lo) + F.make_interval(hours=F.lit(gen_shift)))
               .alias("date_generated"),
               F.concat(F.lit("param"), "pid").alias("parameter"),
               (F.col("cid") * 1.0).alias("latitude"),
               (F.col("pid") * 1.0).alias("longitude"),
               (F.lit(lo) + F.make_interval(hours=F.col("hid")))
               .alias("reading_datetime"),
               (F.col("hid") + gen_shift).cast("string")
               .alias("reading_value")))
    star.stg.append(inc.coalesce(1))
    t0 = time.time()
    sl.maintain_weather_star(spark, star, as_of=as_of)
    return time.time() - t0


def probe_time(spark, star, sl):
    """The probe TERM in isolation: read_keys of one city's keys against
    the winners state (the fold's state-touching read)."""
    keys = (spark.range(1).selectExpr("id as cid")
            .crossJoin(spark.range(8).selectExpr("id as pid"))
            .crossJoin(spark.range(24 * 8).selectExpr("id as hid"))
            .select(F.concat(F.lit("city"), "cid").alias("city"),
                    F.concat(F.lit("param"), "pid").alias("parameter"),
                    (F.lit(datetime(2025, 3, 26))
                     + F.make_interval(hours=F.col("hid")))
                    .alias("reading_datetime")))
    t0 = time.time()
    star.winners.read_keys(keys, sl.STG_KEYS).write.format(
        "noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    import tempfile
    from meteomatics_e2e_data_pipeline_spark.session import get_spark
    spark = get_spark("star_scale")
    out = {}
    for label, n_cities in (("1x", 10), ("5x", 50)):
        root = tempfile.mkdtemp(prefix=f"star_scale_{label}_")
        star, sl, as_of, lo = build(spark, root, n_cities)
        folds = [round(increment(spark, star, sl, as_of, lo, s), 2)
                 for s in (1, 2, 3)]
        probes = [round(probe_time(spark, star, sl), 2) for _ in range(3)]
        out[label] = {"cities": n_cities,
                      "winners_rows": star.winners.read().count(),
                      "fold_times": folds, "fold_median": sorted(folds)[1],
                      "probe_times": probes,
                      "probe_median": sorted(probes)[1]}
    out["fold_ratio_5x_over_1x"] = round(
        out["5x"]["fold_median"] / out["1x"]["fold_median"], 3)
    out["probe_ratio_5x_over_1x"] = round(
        out["5x"]["probe_median"] / out["1x"]["probe_median"], 3)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
