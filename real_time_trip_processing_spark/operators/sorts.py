"""Sort / limit / top-k operators (SURVEY §2.7, O1-O4 + extension top-k).

Global sorts are range-partitioned exchanges in Spark (sampled
boundaries, no single-node sort). ``ORDER BY … LIMIT k`` is rewritten by
the planner into TakeOrderedAndProject — a per-partition top-k + driver
merge of k·p rows, never a full sort; that is the shape every top-k here
relies on.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def sort_by_time(df: DataFrame, *cols: str) -> DataFrame:
    """O1/O3: ascending multi-column sort (reference
    scripts/to_kinesis.py:21,34; notebook cell 13)."""
    return df.orderBy(*cols)


def sort_event_time_union(
    df: DataFrame, candidates: Sequence[str], out_col: str = "event_time"
) -> DataFrame:
    """O2: derive unified event_time via coalesce of per-type timestamp
    columns, then globally order the interleaved stream
    (reference scripts/to_kinesis.py:117-120)."""
    return df.withColumn(out_col, F.coalesce(*[F.col(c) for c in candidates])).orderBy(
        out_col
    )


def limit_topk(df: DataFrame, order: Sequence, k: int) -> DataFrame:
    """O4 generalized: deterministic top-k (planner emits
    TakeOrderedAndProject — no global sort)."""
    return df.orderBy(*order).limit(k)


def topk_per_group(
    df: DataFrame, group: Sequence[str], order: Sequence, k: int, rank_col: str = "rank"
) -> DataFrame:
    """Top-k per group via ranking window — one shuffle on the group key.
    Not in the reference (SURVEY §2.6: no window functions); part of the
    extension surface (similarity top-k reuses this)."""
    w = Window.partitionBy(*group).orderBy(*order)
    return df.withColumn(rank_col, F.row_number().over(w)).filter(
        F.col(rank_col) <= k
    )
