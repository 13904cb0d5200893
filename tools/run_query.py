"""Run any declared query from the CLI.

    python tools/run_query.py <name> [--sf DIR] [--limit N] [--explain]
    python tools/run_query.py --list [pattern]

The switch-over entry point for a reference user: every query a
reference deployment runs (and every extension op) is addressable by
name against any scale-factor directory.
"""

from __future__ import annotations

import argparse
import fnmatch
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("name", nargs="?", help="declared query name")
    ap.add_argument(
        "--sf",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01"),
        help="scale-factor directory of parquet tables",
    )
    ap.add_argument("--limit", type=int, default=20, help="rows to show")
    ap.add_argument(
        "--explain", action="store_true", help="print the formatted physical plan"
    )
    ap.add_argument(
        "--list", action="store_true", help="list declared queries (optionally glob)"
    )
    args = ap.parse_args()

    from real_time_trip_processing_spark.plans import REGISTRY

    if args.list or not args.name:
        pat = args.name or "*"
        for name in sorted(REGISTRY):
            if fnmatch.fnmatch(name, pat):
                doc = (REGISTRY[name].builder.__doc__ or "").strip().splitlines()
                print(f"{name}: {doc[0] if doc else ''}")
        return

    if args.name not in REGISTRY:
        sys.exit(f"unknown query {args.name!r} — try --list")

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("rtp-run")
    spark.sparkContext.setLogLevel("ERROR")
    df = REGISTRY[args.name].builder(spark, args.sf)
    if args.explain:
        df.explain("formatted")
    df.show(args.limit, truncate=False)


if __name__ == "__main__":
    main()
