"""Aggregation operators (SURVEY §2.5, A1-A8).

Every reference aggregation is a hash group-by on one key
(scripts/glue_scripts.py:139-161); Spark executes each as
partial(map-side) + final HashAggregate after a shuffle on the group
key — the plan that scales linearly to 100 TB. The five daily KPIs
collapse into ONE groupBy (A6), replacing the reference's five pandas
group-bys + four merges (scripts/glue_scripts.py:139-175).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def kpi_daily(
    df: DataFrame,
    ts_col: str = "pickup_datetime",
    value_col: str = "fare_amount",
    id_col: str = "trip_id",
) -> DataFrame:
    """A6 (flagship): sum/count/avg/max/min of ``value_col`` per calendar
    day — the canonical output row (reference data/24-daily_trip_kpis.csv:1,
    composition of scripts/glue_scripts.py:139-161)."""
    return (
        df.withColumn("pickup_date", F.date_trunc("day", F.col(ts_col)))
        .groupBy("pickup_date")
        .agg(
            F.sum(value_col).alias("total_fare"),
            F.count(id_col).alias("trip_count"),
            F.avg(value_col).alias("average_fare"),
            F.max(value_col).alias("maximum_fare"),
            F.min(value_col).alias("minimum_fare"),
        )
    )


def _daily_agg(df: DataFrame, ts_col: str, agg_col, alias: str) -> DataFrame:
    # date_trunc (timestamp@midnight) instead of to_date: identical
    # bucketing, but the output type round-trips unambiguously through
    # Arrow/pandas on both Spark and the DuckDB oracle.
    return (
        df.withColumn("pickup_date", F.date_trunc("day", F.col(ts_col)))
        .groupBy("pickup_date")
        .agg(agg_col.alias(alias))
    )


def kpi_total_fare(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """A1 (reference scripts/glue_scripts.py:139-141)."""
    return _daily_agg(df, ts_col, F.sum(value_col), "total_fare")


def kpi_trip_count(df: DataFrame, ts_col: str, id_col: str) -> DataFrame:
    """A2 (reference scripts/glue_scripts.py:144-146)."""
    return _daily_agg(df, ts_col, F.count(id_col), "trip_count")


def kpi_avg_fare(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """A3 (reference scripts/glue_scripts.py:149-151)."""
    return _daily_agg(df, ts_col, F.avg(value_col), "average_fare")


def kpi_max_fare(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """A4 (reference scripts/glue_scripts.py:154-156)."""
    return _daily_agg(df, ts_col, F.max(value_col), "maximum_fare")


def kpi_min_fare(df: DataFrame, ts_col: str, value_col: str) -> DataFrame:
    """A5 (reference scripts/glue_scripts.py:159-161)."""
    return _daily_agg(df, ts_col, F.min(value_col), "minimum_fare")


def global_minmax(df: DataFrame, ts_col: str, id_col: str) -> DataFrame:
    """A7: report metadata — overall date range + record count
    (reference scripts/glue_scripts.py:200-205). Keyless aggregate:
    partial per partition, single final reduce."""
    return df.agg(
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.count(id_col).alias("record_count"),
    )


def value_counts(df: DataFrame, col: str) -> DataFrame:
    """A8: frequency per value, descending (reference notebook cell 15 —
    pandas value_counts)."""
    return df.groupBy(col).agg(F.count(F.lit(1)).alias("count")).orderBy(
        F.desc("count"), F.col(col)
    )


# --- incremental / materialized-view maintenance ---------------------------

#: exact-decimal accumulator for mergeable sums: DECIMAL addition is
#: associative (unlike double), so partial states merge to EXACTLY the
#: full-recompute value regardless of batch boundaries or merge order.
_ACC = "decimal(18,6)"


def kpi_state(
    df: DataFrame, ts_col: str = "ts", value_col: str = "value"
) -> DataFrame:
    """Mergeable per-day KPI state: (pickup_date, n_events, total_value
    decimal, min_value, max_value). This is the persisted form of an
    incrementally-maintained rollup — each ingest batch aggregates its
    own rows to this shape map-side and the merge (`merge_kpi_states`)
    only ever touches state-grain rows, never re-reads history. The
    sum rides an exact decimal so merge order can't flip a low bit."""
    return df.groupBy(
        F.date_trunc("day", F.col(ts_col)).alias("pickup_date")
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(F.col(value_col).cast(_ACC)).alias("total_value"),
        F.min(value_col).alias("min_value"),
        F.max(value_col).alias("max_value"),
    )


def merge_kpi_states(*states: DataFrame) -> DataFrame:
    """Combine any number of KPI state frames into one — the aggregate
    merge algebra (n: sum, total: exact-decimal sum, min: min,
    max: max). At 100 TB this is the maintenance step of a
    materialized rollup: yesterday's state (tiny, state-grain) merges
    with today's delta state without touching raw history; the shuffle
    is state-grain (days), not event-grain."""
    out = states[0]
    for s in states[1:]:
        out = out.unionByName(s)
    return out.groupBy("pickup_date").agg(
        F.sum("n_events").alias("n_events"),
        F.sum("total_value").alias("total_value"),
        F.min("min_value").alias("min_value"),
        F.max("max_value").alias("max_value"),
    )


def kpi_from_state(state: DataFrame) -> DataFrame:
    """Publishable KPI view from (possibly merged) state: derived
    metrics (avg) computed at read time — derived values are never
    stored, so they can't drift from their inputs."""
    total_d = F.col("total_value").cast("double")
    return state.select(
        "pickup_date",
        F.col("n_events").cast("long").alias("n_events"),
        total_d.alias("total_value"),
        "min_value",
        "max_value",
        F.round(total_d / F.col("n_events"), 6).alias("avg_value"),
    )
