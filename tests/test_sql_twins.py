"""SQL-twin parity (SURVEY §7): every declared query is DataFrame-native
AND SQL-addressable over ``register_views``.

For each declared query carrying an oracle, this runs the DataFrame
form and ``spark.sql(oracle)`` over the registered temp views and
compares with the same canonicalizer as the oracle gate. The oracle
strings are written in portable ANSI SQL precisely so DuckDB can run
them — so most of them are valid Spark SQL too, and when they are, the
SQL run must match the DataFrame run bit-for-bit.

Oracles that use engine-specific syntax Spark cannot parse/resolve
(DuckDB lambdas, list_* functions, FILTER clauses on non-agg, etc.)
are recorded as skips with the engine error — the honest boundary of
the twin claim. A query that PARSES but returns different values is a
real failure unless listed in EXPECTED_DIVERGENT with a documented
engine-semantics reason.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(
    0,
    os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"
    ),
)

from check_oracle import compare  # noqa: E402

from real_time_trip_processing_spark.plans import REGISTRY
from real_time_trip_processing_spark.sources.tables import register_views

SF_DIR = "/root/testdata/sf0.001"

#: name -> reason. Queries whose oracle SQL parses in Spark but is
#: KNOWN to mean something different there (documented divergence, not
#: a bug). Keep empty unless a concrete engine-semantics difference is
#: written down.
EXPECTED_DIVERGENT: dict[str, str] = {}

_ORACLED = sorted(n for n, q in REGISTRY.items() if q.oracle is not None)


@pytest.fixture(scope="module")
def views(spark):
    register_views(spark, SF_DIR)
    return spark


@pytest.mark.parametrize("name", _ORACLED)
def test_sql_twin(views, name):
    spark = views
    q = REGISTRY[name]
    try:
        sql_pdf = spark.sql(q.oracle).toPandas()
    except Exception as e:  # noqa: BLE001 — engine-specific SQL boundary
        head = str(e).splitlines()[0][:160]
        pytest.skip(f"oracle SQL is not Spark-parseable ({head})")
    if name in EXPECTED_DIVERGENT:
        pytest.skip(f"documented divergence: {EXPECTED_DIVERGENT[name]}")
    df_pdf = q.builder(spark, SF_DIR).toPandas()
    issues = [
        i
        for i in compare(name, df_pdf, sql_pdf)
        if not i.startswith("dtype note")
    ]
    assert not issues, f"{name}: {issues}"
