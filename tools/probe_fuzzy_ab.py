"""A/B probe: fuzzy_pairs blocked self-join — planner-chosen join
strategy vs a shuffled-hash hint with a shared subtree (the
_shingle_pair_intersections fix applied to the blocked fuzzy join).
Times both flavors with the bench's own discipline (noop sink, gc
before each steady run, median of N) and asserts the row sets are
identical. Throwaway probe for the r11 optimization log.

Usage: python tools/probe_fuzzy_ab.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from real_time_trip_processing_spark.session import get_spark
from real_time_trip_processing_spark.sources import table

N = 6


def blocked(docs, id_col="doc_id", text_col="text",
            block_prefix=4, length_bucket=8, prefix_len=32):
    return docs.select(
        F.col(id_col).alias("doc"),
        F.lower(F.trim(F.col(text_col))).alias("nt"),
    ).withColumn(
        "blk",
        F.concat_ws(
            "|",
            F.substring("nt", 1, block_prefix),
            F.floor(F.length("nt") / F.lit(length_bucket)).cast("int").cast("string"),
        ),
    ).withColumn("head", F.substring("nt", 1, prefix_len))


def pairs(t, hint: str | None, max_dist=5):
    a = t.select(F.col("doc").alias("a"), F.col("blk"), F.col("head").alias("ha"),
                 F.length("nt").alias("len_a"))
    b = t.select(F.col("doc").alias("b"), F.col("blk"), F.col("head").alias("hb"),
                 F.length("nt").alias("len_b"))
    if hint:
        b = b.hint(hint)
    return (
        a.join(b, "blk")
        .filter(F.col("a") < F.col("b"))
        .withColumn("dist", F.levenshtein("ha", "hb"))
        .filter(F.col("dist") <= max_dist)
        .select("a", "b", F.col("dist").cast("long").alias("dist"),
                F.col("len_a").cast("long").alias("len_a"),
                F.col("len_b").cast("long").alias("len_b"))
    )


def timed(spark, build):
    runs = []
    for i in range(N + 1):
        df = build()
        if i > 0:
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df.write.mode("overwrite").format("noop").save()
        runs.append(time.perf_counter() - t0)
    steady = sorted(runs[1:])
    return runs[0], steady[len(steady) // 2], steady


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = get_spark("probe-fuzzy-ab")
    spark.sparkContext.setLogLevel("ERROR")
    docs = table(spark, sf_dir, "documents")
    t = blocked(docs)

    for label, hint in (("planner", None), ("shj", "shuffle_hash"),
                        ("merge", "merge")):
        cold, med, steady = timed(spark, lambda: pairs(t, hint))
        print(f"{label:8s}: cold={cold:.3f} median={med:.3f} "
              f"steady={[round(s, 3) for s in steady]}")

    rows = {}
    for label, hint in (("planner", None), ("shj", "shuffle_hash")):
        rows[label] = sorted(map(tuple, pairs(t, hint).collect()))
    assert rows["planner"] == rows["shj"], (
        len(rows["planner"]), len(rows["shj"]))
    print(f"rows identical: {len(rows['planner'])}")


if __name__ == "__main__":
    main()
