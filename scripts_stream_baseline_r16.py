#!/usr/bin/env python
"""Round-16 streaming-path performance baseline (VERDICT r15 item 9):
the streaming operators have had no optimization-round attention, so
this captures a reproducible wall-clock reading for the main streaming
surfaces — each runs its REAL availableNow micro-batch pipeline end to
end (checkpoint + sink included), timed around the surface's own
awaitTermination. Event rows counted once so the readings convert to
rows/sec. Prints one JSON line.

Usage: python scripts_stream_baseline_r16.py [sf_dir] [reps]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    sf_dir = (sys.argv[1] if len(sys.argv) > 1
              else os.environ.get("SPARK_GRAFT_SF_DIR",
                                  "/root/testdata/sf0.1"))
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    from meteomatics_e2e_data_pipeline_spark.session import get_spark
    from meteomatics_e2e_data_pipeline_spark import streaming as st

    spark = get_spark("stream-baseline16")
    n_events = spark.read.parquet(
        os.path.join(sf_dir, "events.parquet")).count()
    out: dict = {"n_events": int(n_events)}

    def timed(name: str, fn) -> None:
        times = []
        for i in range(reps):
            tmp = tempfile.mkdtemp(prefix=f"sb16_{name}_{i}_")
            try:
                t0 = time.perf_counter()
                fn(tmp, f"sb16_{name}_{i}")
                times.append(round(time.perf_counter() - t0, 3))
            except Exception as exc:  # noqa: BLE001
                out[name] = {"error": str(exc)[:200]}
                return
            finally:
                shutil.rmtree(tmp, ignore_errors=True)
        best = min(times)
        out[name] = {"times": times, "best": best,
                     "events_per_sec": round(n_events / best, 1)}

    timed("events_hourly", lambda tmp, qn: st.stream_events_hourly(
        spark, sf_dir, os.path.join(tmp, "out"), os.path.join(tmp, "cp")))
    timed("user_sessions", lambda tmp, qn: st.stream_user_sessions(
        spark, sf_dir, os.path.join(tmp, "cp"), qn))
    timed("user_event_totals", lambda tmp, qn: st.stream_user_event_totals(
        spark, sf_dir, os.path.join(tmp, "cp"), qn))
    timed("sliding_reach", lambda tmp, qn: st.stream_sliding_reach(
        spark, sf_dir, os.path.join(tmp, "cp"), qn))
    timed("heavy_hitters", lambda tmp, qn: st.stream_heavy_hitters(
        spark, sf_dir, os.path.join(tmp, "cp"), qn))

    print(json.dumps(out))


if __name__ == "__main__":
    main()
