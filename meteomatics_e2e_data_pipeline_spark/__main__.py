"""CLI entry point — the operational surface a user of the reference's
Airflow deployment would expect (`airflow dags trigger` →
`python -m meteomatics_e2e_data_pipeline_spark <command>`).

Commands:
  ingest     — fetch/validate/land one run_date into the bronze lake
  backfill   — ingest a range of run_dates (catchup semantics)
  transform  — run the staging → dims → facts DAG with an explicit as_of
  stream     — one availableNow bronze→staging streaming pass
"""

from __future__ import annotations

import argparse
import json
import sys
from datetime import date, timedelta


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="meteomatics_e2e_data_pipeline_spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    pi = sub.add_parser("ingest", help="ingest one run_date")
    pi.add_argument("--run-date", required=True)
    pi.add_argument("--bronze", required=True)
    pi.add_argument("--quarantine")

    pb = sub.add_parser("backfill", help="ingest a date range, inclusive")
    pb.add_argument("--start", required=True)
    pb.add_argument("--end", required=True)
    pb.add_argument("--bronze", required=True)

    pt = sub.add_parser("transform", help="run the transformation DAG")
    pt.add_argument("--bronze", help="bronze glob (default: fixtures)")
    pt.add_argument("--out", required=True)
    pt.add_argument("--as-of", help="YYYY-MM-DD (default: fixture as_of)")
    pt.add_argument("--no-checks", action="store_true")

    ps = sub.add_parser("stream", help="availableNow bronze→staging pass")
    ps.add_argument("--bronze-glob", required=True)
    ps.add_argument("--target", required=True)
    ps.add_argument("--checkpoint", required=True)

    args = p.parse_args(argv)

    from .session import get_spark
    spark = get_spark(f"cli-{args.cmd}")

    if args.cmd == "ingest":
        from .sources.ingest import ingest
        n_ok, n_q = ingest(spark, args.run_date, args.bronze,
                           quarantine_root=args.quarantine)
        print(json.dumps({"run_date": args.run_date, "valid": n_ok,
                          "quarantined": n_q}))
    elif args.cmd == "backfill":
        from .sources.ingest import backfill_ingest
        start, end = date.fromisoformat(args.start), date.fromisoformat(args.end)
        dates = [(start + timedelta(days=i)).isoformat()
                 for i in range((end - start).days + 1)]
        res = backfill_ingest(spark, dates, args.bronze)
        print(json.dumps({d: {"valid": v, "quarantined": q}
                          for d, (v, q) in res.items()}))
    elif args.cmd == "transform":
        from .plans import weather
        from .plans.runner import transform
        as_of = (date.fromisoformat(args.as_of) if args.as_of
                 else weather.AS_OF)
        counts = transform(spark, args.out, bronze_path=args.bronze,
                           as_of=as_of, run_checks=not args.no_checks)
        print(json.dumps(counts))
    elif args.cmd == "stream":
        from .streaming import stream_bronze_to_staging
        stream_bronze_to_staging(spark, args.bronze_glob, args.target,
                                 args.checkpoint)
        print(json.dumps({"status": "complete"}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
