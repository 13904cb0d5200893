"""Print the formatted physical plan of declared queries — the loop for
verifying pushdown/broadcast/codegen claims (see SCALE.md).

Usage: python tools/explain.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_trip_processing_spark.plans import REGISTRY
from real_time_trip_processing_spark.session import get_spark


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    names = sys.argv[2:] or ["kpi_daily", "join_multiway", "match_start_end"]
    spark = get_spark("explain")
    for name in names:
        print(f"{'=' * 24} {name} {'=' * 24}")
        REGISTRY[name].builder(spark, sf_dir).explain("formatted")


if __name__ == "__main__":
    main()
