"""Set operators (SURVEY §2.8, U1).

The reference concatenates start+end frames with *different* schemas
(pandas fills NaN — scripts/to_kinesis.py:119); Spark's
``unionByName(allowMissingColumns=True)`` reproduces that exactly and is
a zero-shuffle operator (pure partition concatenation).
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def union_all(*frames: DataFrame) -> DataFrame:
    """U1: by-name union with null-fill for missing columns."""
    out = frames[0]
    for f in frames[1:]:
        out = out.unionByName(f, allowMissingColumns=True)
    return out
