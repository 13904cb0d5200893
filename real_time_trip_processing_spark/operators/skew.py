"""Skew-resilient aggregation (SCALE.md "Aggregations": two-level
salt → partial → unsalt plan).

AQE splits skewed *join* partitions, but a skewed **aggregation** key
(one hot group receiving most rows) still funnels a whole group into
one reducer under a plain groupBy. The standard fix is algebraic
decomposition: aggregate on (key, salt) first — spreading the hot group
over ``buckets`` reducers — then merge the partials per key. Results
are bit-identical for the decomposable aggregates below (sum/count/
min/max; avg = sum/count at merge time).

The salt is ``spark_partition_id() % buckets``: deterministic, free
(no hash of row content), and by construction each input partition
contributes one salt value, so the partial agg stays map-side-friendly.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

#: supported algebraic aggregates: name -> (partial fn, merge fn)
_ALGEBRAIC = {
    "sum": (F.sum, F.sum),
    "count": (F.count, F.sum),
    "min": (F.min, F.min),
    "max": (F.max, F.max),
}


def salted_agg(
    df: DataFrame,
    keys: Sequence[str],
    specs: Sequence[tuple[str, str, str]],
    buckets: int = 64,
) -> DataFrame:
    """GroupBy with a salted two-level plan.

    ``specs`` is a list of (column, agg, alias) with agg ∈ {sum, count,
    min, max, avg}. Semantically identical to
    ``df.groupBy(keys).agg(...)`` — the DuckDB oracle for any query
    using this is the plain GROUP BY — but the hot key's rows are
    reduced by ``buckets`` tasks instead of one.
    """
    partials: list[Column] = []
    finals: list[Column] = []
    for i, (col, agg, alias) in enumerate(specs):
        p = f"__p{i}"
        if agg == "avg":
            partials += [F.sum(col).alias(p + "s"), F.count(col).alias(p + "c")]
            finals.append((F.sum(p + "s") / F.sum(p + "c")).alias(alias))
        elif agg in _ALGEBRAIC:
            part, merge = _ALGEBRAIC[agg]
            partials.append(part(col).alias(p))
            finals.append(merge(p).alias(alias))
        else:
            raise ValueError(f"non-algebraic aggregate: {agg}")
    salted = df.withColumn("__salt", F.spark_partition_id() % buckets)
    partial = salted.groupBy(*keys, "__salt").agg(*partials)
    return partial.groupBy(*keys).agg(*finals)


def salted_join(
    big: DataFrame,
    small: DataFrame,
    big_key: str,
    small_key: str,
    buckets: int = 16,
) -> DataFrame:
    """Skew-resilient inner equi join (SCALE.md "Joins").

    AQE's skew-join split handles moderate skew, but a pathological hot
    key (one key holding a double-digit percent of the probe side)
    still bounds the join by that key's single post-split stream when
    the build side cannot broadcast. The classic fix: give every probe
    row a salt in ``[0, buckets)`` that is INDEPENDENT of the key —
    ``spark_partition_id() % buckets``, deterministic and free — and
    replicate each build row once per salt value, so the hot key's rows
    land on ``buckets`` different reducers, each holding its own copy
    of the matching build rows.

    Semantically identical to ``big.join(small, big[big_key] ==
    small[small_key], "inner")`` — the oracle for any query built on
    this is the plain join. Cost: the build side shuffles ``buckets``×
    its size; use only when the build side is small-ish but above the
    broadcast threshold and the probe side is provably skewed.
    """
    salted_big = big.withColumn("__salt", F.spark_partition_id() % buckets)
    salted_small = small.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0), F.lit(buckets - 1)))
    )
    joined = salted_big.join(
        salted_small,
        (salted_big["__salt"] == salted_small["__salt"])
        & (salted_big[big_key] == salted_small[small_key]),
        "inner",
    )
    return joined.drop(salted_big["__salt"]).drop(salted_small["__salt"])
