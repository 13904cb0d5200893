"""Join operators (SURVEY §2.4, J1-J4).

The reference's core operator is the start/end matcher: an indexed
point-query per inserted event (scripts/lambda2.py:27-63) plus an
attribute-map merge with end-side collision rename
(scripts/lambda2.py:66-109). In Spark the whole thing is one equi-join:
the DynamoDB raw-item index becomes the join's hash table (batch) or the
stream-stream join state store (streaming/matcher.py).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, functions as F

from .dedup import dedup_keyed


def match_start_end(
    starts: DataFrame,
    ends: DataFrame,
    key: str = "trip_id",
    start_order: Sequence[str] = ("pickup_datetime",),
    end_order: Sequence[str] = ("dropoff_datetime",),
) -> DataFrame:
    """J1+J2: match each start with its end on ``key`` and merge.

    Reference semantics preserved (scripts/lambda2.py:27-63, 230-255):
    - first match wins → dedup each side to its first event per key
      before joining (the reference's Query returns items in SK order and
      takes item[0]);
    - unmatched events produce nothing (they "wait forever"; the batch
      flavor is an inner join, the streaming flavor keeps them in state);
    - merged record carries all start attributes ∪ all end attributes,
      end-side columns renamed ``end_<col>`` on collision
      (scripts/lambda2.py:100-104), and data_type forced to
      'completed_trip' (scripts/lambda2.py:97).

    Scale: a plain equi-join on the key — Catalyst picks sort-merge with
    both sides hash-partitioned on ``key``; AQE splits skewed keys. No
    row ever visits the driver.
    """
    s = dedup_keyed(starts, [key], list(start_order))
    e = dedup_keyed(ends, [key], list(end_order))
    return merge_events(s, e, key)


def merge_events(
    starts: DataFrame, ends: DataFrame, key: str, cond=None
) -> DataFrame:
    """J2: post-join projection encoding the reference's collision policy
    (scripts/lambda2.py:93-104): start-side attribute wins the plain
    name; the end-side duplicate is kept as ``end_<col>``.

    Sides are aliased so the projection stays unambiguous even when both
    derive from the same source (self-join on event_type partitions).

    ``cond`` overrides the join condition (default: equi on ``key``) —
    the streaming matcher passes its watermark range-join condition
    through here so batch and streaming share ONE collision-rename
    projection instead of two copies that could drift
    (streaming/matcher.merge_events_streaming).
    """
    s, e = starts.alias("__s"), ends.alias("__e")
    start_cols = list(starts.columns)
    end_cols = [c for c in ends.columns if c != key]
    # the reference exempts trip_id/data_type from the end_ collision
    # rename (lambda2.py:101) — data_type is overwritten in place and
    # then forced to 'completed_trip', so no end_data_type column exists
    collisions = {c for c in end_cols if c in start_cols and c != "data_type"}
    projection = [F.col(f"__s.{c}").alias(c) for c in start_cols]
    projection += [
        F.col(f"__e.{c}").alias(f"end_{c}" if c in collisions else c)
        for c in end_cols
        if not (c == "data_type" and c in start_cols)
    ]
    if cond is None:
        cond = F.col(f"__s.{key}") == F.col(f"__e.{key}")
    out = s.join(e, on=cond, how="inner").select(*projection)
    if "data_type" in out.columns:
        out = out.withColumn("data_type", F.lit("completed_trip"))
    return out.withColumn("status", F.lit("completed"))


def join_multiway(
    fact: DataFrame, dims: Sequence[tuple[DataFrame, str, str]], broadcast_dims: bool = True
) -> DataFrame:
    """J3 generalized: chain of equi-joins fact ⋈ dim1 ⋈ dim2 …

    ``dims`` is [(dim_df, fact_key, dim_key), ...]. Dimension sides are
    broadcast (reference's notebook join is two ~5k frames; at 100 TB the
    fact side streams through map-side hash joins with zero shuffle of
    the fact table — the plan to demand for star-schema joins).
    """
    out = fact
    for dim, fk, dk in dims:
        d = F.broadcast(dim) if broadcast_dims else dim
        # drop the DIM-side key by reference, not by name: when
        # fk == dk (shared key name, the common star-schema case) a
        # drop-by-name removes BOTH copies and the join key vanishes
        # from the output
        out = out.join(d, on=out[fk] == d[dk], how="inner").drop(d[dk])
    return out


def assemble_kpis(kpi_frames: Sequence[DataFrame], on: str = "pickup_date") -> DataFrame:
    """J4: left-join single-KPI frames into one row per day
    (reference scripts/glue_scripts.py:167-175). Redundant in Spark — one
    groupBy emits all KPIs — but declared to prove left-join parity."""
    out = kpi_frames[0]
    for kf in kpi_frames[1:]:
        out = out.join(kf, on=on, how="left")
    return out


def point_in_time_join(
    facts: DataFrame,
    dim: DataFrame,
    key: str,
    ts: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
    how: str = "inner",
) -> DataFrame:
    """Point-in-time (temporal) join: each fact row picks up the
    dimension version whose [valid_from, valid_to) interval contains its
    timestamp (open tail = NULL valid_to) — the feature-store
    correctness primitive that prevents training-serving skew from
    future leakage.

    ``how="inner"`` (default) DROPS facts with no covering interval (a
    fact before the key's first valid_from, or a key absent from the
    dimension) — cardinality is ≤ |facts|, exactly |facts| only when
    every fact has an interval to land in. Pass ``how="left"`` to keep
    unmatched facts with NULL dimension state for audit flows that must
    account for every input row.

    Plan shape: an equi-join on ``key`` with the interval containment as
    a post-join filter — Spark plans the equi part as a hash/SMJ on the
    key, so the non-equi range never degenerates to a cross product;
    SCD2 intervals are non-overlapping per key, so no fact matches more
    than one version.
    """
    d = dim.select(
        F.col(key), F.col(valid_from), F.col(valid_to),
        *[c for c in dim.columns if c not in (key, valid_from, valid_to)],
    )
    cond = (
        (facts[key] == d[key])
        & (facts[ts] >= d[valid_from])
        & (d[valid_to].isNull() | (facts[ts] < d[valid_to]))
    )
    return facts.join(d, cond, how).drop(d[key])


def bloom_filtered_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """Semi join with a Bloom-filter runtime prefilter — the row-level
    runtime filtering pattern, built portably from DataFrame ops: the
    build side's keys are folded into an m-bit bitmap (k xxhash64
    positions per key, bit_or-aggregated into array<long> words) that
    rides to every probe partition as ONE broadcast row; probe rows
    failing any of their k bit tests are dropped MAP-SIDE, before the
    semi-join exchange ever sees them.

    Output is EXACT: survivors still pass through a real left-semi join,
    so Bloom false positives never reach the result — the filter only
    changes how many probe rows shuffle, never what comes out. At 100 TB
    this is the difference between shuffling the full fact table and
    shuffling the ~selectivity fraction that can possibly match; size
    m ≈ 10 bits/build-key for ~1% false positives (m rides as
    m/64 longs — 8192 bits = 1 KiB — so even 10^9-bit filters broadcast
    fine).

    Determinism: positions are xxhash64 — deterministic within Spark
    and CHEAP (one codegen'd hash per position). Cross-engine
    reproducibility is deliberately not required: the ORACLE for
    queries built on this is a plain semi join, because the exact
    verify makes the Bloom transparent to results.
    """
    filtered = _bloom_prefilter(probe, build, probe_key, build_key, m_bits, k)
    return filtered.join(
        build.select(F.col(build_key).alias(probe_key)).distinct(),
        probe_key,
        "left_semi",
    )


def _bloom_prefilter(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 8192,
    k: int = 3,
) -> DataFrame:
    """The map-side bitmap-test stage of `bloom_filtered_semi_join`,
    exposed so tests can measure pruning (rows surviving the bitmap =
    true matches + Bloom false positives, with no verify join on top)."""
    words = m_bits // 64
    assert m_bits % 64 == 0

    def positions(key_col: str):
        # xxhash64 with the probe index as a second hashed column: one
        # cheap codegen'd hash per position. Nothing here needs
        # cross-engine reproducibility — the Bloom never reaches the
        # result (the verify join is exact), so the hash can be the
        # fast one rather than the md5-arithmetic used by the
        # oracle-replayed LSH ops.
        return [
            F.pmod(F.xxhash64(F.col(key_col), F.lit(j)), F.lit(m_bits))
            for j in range(k)
        ]

    bitmap = (
        build.select(F.explode(F.array(*positions(build_key))).alias("pos"))
        .select(
            (F.col("pos") / 64).cast("int").alias("w"),
            F.expr("shiftleft(CAST(1 AS BIGINT), CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("w")
        .agg(F.bit_or("bit").alias("word"))
        .agg(
            F.map_from_arrays(
                F.collect_list("w"), F.collect_list("word")
            ).alias("wm")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(words - 1)),
                lambda i: F.coalesce(F.element_at("wm", i.cast("int")), F.lit(0).cast("long")),
            ).alias("__bloom")
        )
    )

    pos_cols = {f"__bp{j}": p for j, p in enumerate(positions(probe_key))}
    tagged = probe.crossJoin(F.broadcast(bitmap)).withColumns(pos_cols)
    test = None
    for name in pos_cols:
        hit = F.expr(
            f"(shiftright(element_at(__bloom, CAST({name} DIV 64 AS INT) + 1), "
            f"CAST({name} % 64 AS INT)) & 1) = 1"
        )
        test = hit if test is None else (test & hit)
    return tagged.filter(test).drop("__bloom", *pos_cols)
