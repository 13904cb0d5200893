"""Local mirror of the driver's correctness harness.

Runs every declared query via Spark AND its DuckDB oracle on the same
parquet tables, then compares row-count, schema (column names) and an
order-insensitive value comparison. Floats are compared both exactly and
with tolerance so we can see whether exact hashing would pass.

Usage: python tools/check_oracle.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import os
import sys
import time

import duckdb
import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from real_time_trip_processing_spark.plans import REGISTRY
from real_time_trip_processing_spark.schemas import TESTDATA_TABLES
from real_time_trip_processing_spark.session import get_spark


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TESTDATA_TABLES:
        path = f"{sf_dir}/{t}.parquet"
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    df = df.reindex(sorted(df.columns), axis=1)
    df = df.sort_values(by=list(df.columns), ignore_index=True, kind="mergesort")
    return df


def compare(name: str, spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame) -> list[str]:
    issues: list[str] = []
    if len(spark_pdf) != len(duck_pdf):
        return [f"rowcount spark={len(spark_pdf)} duck={len(duck_pdf)}"]
    s_cols, d_cols = sorted(spark_pdf.columns), sorted(duck_pdf.columns)
    if s_cols != d_cols:
        return [f"schema spark={s_cols} duck={d_cols}"]
    if len(spark_pdf) == 0:
        return []
    s, d = canon(spark_pdf), canon(duck_pdf)
    for c in s.columns:
        sv, dv = s[c], d[c]
        if sv.dtype.kind == "f" or dv.dtype.kind == "f":
            sa, da = sv.astype(float).to_numpy(), dv.astype(float).to_numpy()
            both_nan = pd.isna(sa) & pd.isna(da)
            exact = ((sa == da) | both_nan).all()
            close = all(
                (math.isnan(a) and math.isnan(b)) or abs(a - b) <= 1e-9 * max(1.0, abs(a), abs(b))
                for a, b in zip(sa, da)
            )
            if not exact:
                worst = max(
                    (abs(a - b) for a, b in zip(sa, da) if not (math.isnan(a) and math.isnan(b))),
                    default=0.0,
                )
                issues.append(
                    f"col {c}: float {'CLOSE' if close else 'DIFF'} (max abs diff {worst:.3e})"
                )
        else:
            if not sv.astype(object).where(pd.notna(sv), None).equals(
                dv.astype(object).where(pd.notna(dv), None)
            ):
                mism = (sv.astype(str) != dv.astype(str)).sum()
                issues.append(f"col {c}: {mism} mismatched values (dtype s={sv.dtype} d={dv.dtype})")
    # dtype visibility (driver may compare schema more strictly than names)
    for c in s.columns:
        if str(s[c].dtype) != str(d[c].dtype):
            issues.append(f"dtype note {c}: spark={s[c].dtype} duck={d[c].dtype}")
    return issues


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    only = set(sys.argv[2:])
    if os.environ.get("SPARK_GRAFT_VANILLA"):
        # Driver-shaped session: NO tuned configs from session.get_spark
        # (default 200 shuffle partitions, default broadcast threshold).
        # Catches anything that only works under our own factory —
        # sources.table() must supply every conf the queries need.
        from pyspark.sql import SparkSession

        spark = (
            SparkSession.builder.master("local[8]")
            .appName("oracle-check-vanilla")
            .getOrCreate()
        )
    else:
        spark = get_spark("oracle-check")
    con = duck_con(sf_dir)
    failures = 0
    for name, q in REGISTRY.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = q.builder(spark, sf_dir)
            spark_pdf = sdf.toPandas()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: spark error: {e}")
            failures += 1
            continue
        if q.oracle is None:
            print(f"ok   {name}: rows-only, {len(spark_pdf)} rows ({time.time()-t0:.1f}s)")
            continue
        try:
            duck_pdf = con.execute(q.oracle).fetchdf()
        except Exception as e:  # noqa: BLE001
            print(f"FAIL {name}: duckdb error: {e}")
            failures += 1
            continue
        issues = compare(name, spark_pdf, duck_pdf)
        hard = [i for i in issues if not i.startswith("dtype note")]
        status = "ok  " if not hard else "FAIL"
        if hard:
            failures += 1
        print(f"{status} {name}: {len(spark_pdf)} rows ({time.time()-t0:.1f}s)"
              + ("" if not issues else " | " + "; ".join(issues)))
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
