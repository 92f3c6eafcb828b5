"""Round-14 feature scale measurements (run manually, results recorded
in PLANS.md):

1. Generated-column partition pruning at many partitions: a table
   partitioned by a GENERATED month key (``substring(cast(d as
   string), 1, 7)``) over 240 months; a 3-month BASE-column range
   pushed into the plain-IO reader must plan exactly the 3 partitions'
   files, with driver-side planning time independent of data volume.
2. Point-lookup floor: steady repetitions of the two pointget gate
   queries (literal probe + IN-predicate scan — ONE Spark job).

Usage: python scripts_feature_scale.py [sf_dir]
"""

from __future__ import annotations

import datetime
import sys
import tempfile
import time

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = (SparkSession.builder.master("local[32]")
             .config("spark.sql.shuffle.partitions", "32")
             .config("spark.sql.session.timeZone", "UTC")
             .config("spark.ui.enabled", "false").getOrCreate())
    from meteomatics_e2e_data_pipeline_spark.operators.txlog import TxTable
    from meteomatics_e2e_data_pipeline_spark.sources.txlog_batch import (
        TxLogBatchReader)
    from pyspark.sql.datasource import GreaterThanOrEqual, LessThanOrEqual

    # -------- 1. generated pruning at 240 month-partitions
    root = tempfile.mkdtemp(prefix="genscale_") + "/t"
    months = 240
    rows = spark.range(months * 8).select(
        F.col("id").alias("k"),
        F.date_add(F.lit(datetime.date(2000, 1, 15)),
                   ((F.col("id") % months) * 31).cast("int")).alias("d"),
        (F.col("id") * 3).alias("v"))
    t = TxTable.create(
        spark, rows.repartition(8), root, stat_cols=["k", "d"],
        partition_cols=["ym"],
        generated={"ym": "substring(cast(d as string), 1, 7)"})
    n_parts = len({p.split("/")[0] for p in t.live_files()})
    n_files = len(t.live_files())
    lo, hi = datetime.date(2010, 1, 1), datetime.date(2010, 3, 31)
    reps = []
    planned = []
    for _ in range(5):
        r = TxLogBatchReader({"path": root})
        t0 = time.time()
        list(r.pushFilters([GreaterThanOrEqual(("d",), lo),
                            LessThanOrEqual(("d",), hi)]))
        planned = r.partitions()
        reps.append(time.time() - t0)
    kept_parts = {p.file_path.split("ym=")[1].split("/")[0]
                  for p in planned}
    print(f"[generated pruning] partitions={n_parts} files={n_files} "
          f"-> planned_files={len(planned)} planned_partitions="
          f"{sorted(kept_parts)} plan_s={[round(x, 4) for x in reps]}")

    # the DML side: a delete keyed on the base column stays in-month
    target = t.read().filter("ym = '2010-02'").select("d").first()["d"]
    t.delete(spark.createDataFrame([(target,)], "d date"), ["d"])
    touched = [a["remove"]["path"] for a in t.history()[-1]
               if "remove" in a]
    print(f"[generated DML prune] delete(d={target}) touched files: "
          f"{touched or '(none matched)'}")

    # -------- 2. pointget floor
    import __spark_entry__ as e
    qs = e.queries()
    for name in ("orders_converted_pointget", "orders_dv_pointget"):
        qs[name](spark, sf_dir).collect()  # warm the build cache
        reps = []
        for _ in range(5):
            t0 = time.time()
            qs[name](spark, sf_dir).collect()
            reps.append(time.time() - t0)
        print(f"[pointget floor] {name}: "
              f"steady={[round(x, 3) for x in reps]}")
    spark.stop()


if __name__ == "__main__":
    main()
