#!/usr/bin/env python
"""Isolated steady-state protocol for the r12 bench movers (VERDICT r12
directive #3): local[32], sf0.1, noop sink, 1 warm-up + 5 timed runs per
query, box state recorded — the same method that settled
docs_simhash_pairs in r11 (PLANS.md r11). Prints one JSON line."""

from __future__ import annotations

import json
import os
import time

TARGETS = [
    "pricing_summary",            # control
    "customer_rfm_segments",
    "docs_simhash",
    "promo_revenue_share",
    "emb_ann_ivf",
    "emb_ann_ivf_multiprobe",
    "emb_ann_ivf_trained",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    from meteomatics_e2e_data_pipeline_spark.session import get_spark
    spark = get_spark("steady")
    import __spark_entry__ as entrymod
    queries = entrymod.queries()

    def state():
        out = {}
        with open("/proc/meminfo") as fh:
            for line in fh:
                if line.startswith("Cached:"):
                    out["cached_gb"] = round(int(line.split()[1]) / 2**20, 2)
        out["load1"] = float(open("/proc/loadavg").read().split()[0])
        return out

    def run(name):
        df = queries[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()

    for t in ("lineitem", "orders", "documents", "embeddings", "events"):
        (spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet"))
         .write.format("noop").mode("overwrite").save())

    report = {"state_start": state(), "runs": {}}
    for name in TARGETS:
        run(name)  # warm-up (artifact caches built here, not timed)
        times = []
        for _ in range(5):
            t0 = time.time()
            run(name)
            times.append(round(time.time() - t0, 3))
        report["runs"][name] = {"times": times, "best": min(times),
                                "median": sorted(times)[2]}
    report["state_end"] = state()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
