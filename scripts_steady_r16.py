#!/usr/bin/env python
"""Isolated steady-state protocol for round-16 optimization targets:
local[$SPARK_GRAFT_CPUS], sf0.1 by default, noop sink, 1 warm-up + N
timed runs per query (default 5), box state recorded. Prints one JSON
line. Usage: python scripts_steady_r16.py q1 q2 ...  (no args = the
round-16 watchlist). The same method that settled docs_simhash_pairs in
r11 and the r15 movers (PLANS.md r11/r15)."""

from __future__ import annotations

import json
import os
import sys
import time


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    reps = int(os.environ.get("STEADY_REPS", "5"))
    targets = sys.argv[1:] or [
        "pricing_summary",            # control
        "emb_mmr_rerank", "emb_ann_recall", "emb_pq_recall",
        "emb_hamming_recall", "emb_knn_bruteforce",
        "docs_simhash", "docs_simhash_pairs",
        "docs_dup_clusters_incremental", "docs_bloom_contamination",
        "parts_hierarchy_rollup", "docs_repetition_signals",
        "docs_bigram_nll", "docs_containment_pairs",
        "docs_jaccard_join", "docs_minhash_calibration",
        "docs_scrub_effect",
    ]
    from meteomatics_e2e_data_pipeline_spark.session import get_spark
    spark = get_spark("steady16")
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
    (spark.range(32).mapInPandas(lambda it: it, "id long")
     .write.format("noop").mode("overwrite").save())

    report = {"state_start": state(), "runs": {}}
    for name in targets:
        spark.sparkContext.setJobDescription(f"steady16: {name}")
        try:
            run(name)  # warm-up (artifact caches built here, not timed)
        except Exception as exc:  # noqa: BLE001
            report["runs"][name] = {"error": str(exc)[:200]}
            continue
        times = []
        for _ in range(reps):
            t0 = time.perf_counter()
            run(name)
            times.append(round(time.perf_counter() - t0, 3))
        report["runs"][name] = {"times": times, "best": min(times),
                                "median": sorted(times)[len(times) // 2]}
        spark.sparkContext.setJobDescription(None)
    report["state_end"] = state()
    print(json.dumps(report))


if __name__ == "__main__":
    main()
