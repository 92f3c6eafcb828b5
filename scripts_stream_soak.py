#!/usr/bin/env python
"""Round-14 verdict #5: soak the two streaming-e2e tests that each went
red ONCE to a load transient in round 13 — 20 iterations of each,
running CONCURRENTLY with a heavy Spark workload (emulating the test
pool the transients appeared under). Any red preserves full artifacts
via the _capture_on_failure hook (tests/test_e2e_ingest.py) and is
re-raised with the artifact dir in the message.

Prints one JSON line: {"iterations": N, "green": n, "red": [...]}.
"""

from __future__ import annotations

import json
import sys
import tempfile
import threading
from pathlib import Path

from meteomatics_e2e_data_pipeline_spark.session import get_spark


def main() -> None:
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 20
    spark = get_spark("stream-soak")
    sys.path.insert(0, ".")
    from tests.test_e2e_ingest import (
        _heavy_test_full_relay_api_stream_to_txlog_to_cdc_consumer as relay,
        _heavy_test_stream_validate_merge_survives_crash_between_commits
        as crash)

    stop = threading.Event()

    def churn() -> None:
        # concurrent heavy load: repeated shuffle-heavy jobs on the same
        # session, the shape the pooled suite runs the e2e tests under
        from pyspark.sql import functions as F
        while not stop.is_set():
            (spark.range(2_000_000)
             .withColumn("g", F.col("id") % 1000)
             .groupBy("g").agg(F.sum("id"), F.avg("id"))
             .write.format("noop").mode("overwrite").save())

    churners = [threading.Thread(target=churn, daemon=True)
                for _ in range(3)]
    for c in churners:
        c.start()

    red: list[str] = []
    green = 0
    try:
        for i in range(iters):
            for name, fn in (("crash", crash), ("relay", relay)):
                tmp = Path(tempfile.mkdtemp(prefix=f"soak_{name}_{i}_"))
                try:
                    fn(spark, tmp)
                    green += 1
                except BaseException as exc:  # noqa: BLE001 - record all
                    red.append(f"{name}#{i}: {exc}")
                print(f"iter {i} {name}: "
                      f"{'ok' if not red or not red[-1].startswith(f'{name}#{i}') else 'RED'}",
                      file=sys.stderr)
    finally:
        stop.set()
    print(json.dumps({"iterations": iters * 2, "green": green,
                      "red": red}))


if __name__ == "__main__":
    main()
