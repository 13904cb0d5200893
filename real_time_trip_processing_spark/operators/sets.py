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


def table_diff(
    old: DataFrame,
    new: DataFrame,
    key: str,
    compare_cols: list[str],
) -> DataFrame:
    """Snapshot diff between two versions of a table: one row per key
    that changed, with status ``added`` / ``removed`` / ``changed`` —
    the validation/CDC primitive behind "what did this ingest cycle
    actually do to the corpus".

    Values are compared column-by-column with null-safe equality (no
    row hashing — hashing floats/dates to strings is engine-specific;
    direct comparison is exact everywhere). Plan shape: ONE full-outer
    join on the key; with both snapshots bucketed on the key (the
    layout `write_bucketed` produces) the join is co-located and the
    diff is a zero-shuffle zip of the two scans.
    """
    from pyspark.sql import functions as F

    o = old.select(key, *compare_cols).alias("o")
    n = new.select(key, *compare_cols).alias("n")
    joined = o.join(n, F.col(f"o.{key}") == F.col(f"n.{key}"), "full_outer")
    # Empty compare_cols degrades to a keys-only add/remove diff — a
    # None predicate would otherwise blow up at plan build inside when().
    any_change = F.lit(False)
    for c in compare_cols:
        ne = ~F.col(f"o.{c}").eqNullSafe(F.col(f"n.{c}"))
        any_change = any_change | ne
    status = (
        F.when(F.col(f"o.{key}").isNull(), F.lit("added"))
        .when(F.col(f"n.{key}").isNull(), F.lit("removed"))
        .when(any_change, F.lit("changed"))
        .otherwise(F.lit("same"))
    )
    return (
        joined.select(
            F.coalesce(F.col(f"o.{key}"), F.col(f"n.{key}")).alias(key),
            status.alias("status"),
        )
        .filter(F.col("status") != "same")
    )
