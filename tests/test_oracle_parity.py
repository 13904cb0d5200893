"""Every declared query vs its DuckDB oracle at sf0.001 — the in-repo
mirror of the driver's correctness gate."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from check_oracle import compare, duck_con  # noqa: E402

from real_time_trip_processing_spark.plans import REGISTRY

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def con():
    return duck_con(SF_DIR)


@pytest.mark.parametrize("name", sorted(REGISTRY))
def test_oracle_parity(spark, con, name):
    q = REGISTRY[name]
    spark_pdf = q.builder(spark, SF_DIR).toPandas()
    if q.oracle is None:
        assert len(spark_pdf) >= 0  # rows-only contract: must execute
        return
    duck_pdf = con.execute(q.oracle).fetchdf()
    issues = [i for i in compare(name, spark_pdf, duck_pdf) if not i.startswith("dtype note")]
    assert not issues, f"{name}: {issues}"
