#!/usr/bin/env python
"""Dump .explain("formatted") for the named queries to
plans/r16/<query>_<suffix>.txt. Usage:
  python scripts_dump_plans_r16.py <suffix> q1 q2 ...
Also prints a one-line plan-shape summary (scan/exchange/join/python
node counts) per query for quick before/after diffs."""

from __future__ import annotations

import os
import re
import sys


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)
    from meteomatics_e2e_data_pipeline_spark.session import get_spark
    spark = get_spark("plans16")
    import __spark_entry__ as entrymod
    queries = entrymod.queries()
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode \
        .fromString("formatted")
    for name in names:
        df = queries[name](spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(mode)
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        counts = {
            "scan": len(re.findall(r"Scan parquet|Scan ExistingRDD", plan)),
            "exchange": plan.count("Exchange"),
            "smj": plan.count("SortMergeJoin"),
            "bhj": plan.count("BroadcastHashJoin"),
            "bnlj": plan.count("BroadcastNestedLoopJoin"),
            "window": plan.count("Window"),
            "python": (plan.count("BatchEvalPython")
                       + plan.count("ArrowEvalPython")
                       + plan.count("MapInPandas")
                       + plan.count("MapInArrow")),
            "lines": plan.count("\n"),
        }
        print(name, counts)


if __name__ == "__main__":
    main()
