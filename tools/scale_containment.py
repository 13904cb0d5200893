"""Containment screen at corpus scale — the measured footing for the
round-11 `containment_incremental_pairs` claims (SCALE.md dedup
family): the per-cycle cost is the BATCH side plus matched postings,
the persisted `corpus_postings_index` removes the corpus re-shingle
from every cycle, and planted containment cases are caught exactly
(the screen is exact set arithmetic — no probabilistic tail, so
planted recall must be 1.0 among surviving docs).

Setup (reuses tools/scale_text.py's deterministic zipfian corpus):
corpus = the first N docs; postings AND the (sh, df) stop-shingle
table built once and persisted to parquet (the at-scale configuration
`containment_incremental_pairs`' corpus_postings/corpus_df params
document — per cycle nothing corpus-wide is recomputed). Each cycle's
batch is B docs derived from a disjoint corpus
slice: half are planted EXCERPTS (a contiguous 10-word slice of a
corpus doc with >= 20 words -> all 8 of the excerpt's 3-shingles occur
in the source doc, containment exactly 1.0 even under the stop-shingle
cap, which drops shingles from both sides symmetrically), half are
NOVEL (every token suffixed, leaving the generator vocabulary -> zero
shared shingles). Asserted per cycle:

- every surviving planted excerpt pairs with its source doc at
  containment 1.0 (recall == 1.0; an excerpt whose 8 shingles are ALL
  above the df cap drops out of the screen entirely and is counted,
  not hidden);
- no novel doc pairs with anything at the 0.8 threshold;
- cycle 2 (same shapes, different slice, postings READ not rebuilt)
  costs screen-only wall — reported beside the raw-corpus re-shingle
  wall, the A/B that justifies the persisted-postings dial.

Usage: python tools/scale_containment.py [--corpus 1000000]
       [--batch 10000] [--max-df 1000] [--skip-gen]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from scale_text import OUT, generate  # noqa: E402

POSTINGS = os.path.join(os.path.dirname(OUT), "containment_postings")
EXCERPT_OFFSET = 1_000_000_000
THRESHOLD = 0.8


def make_batch(spark, corpus, lo: int, hi: int):
    """Batch from the corpus slice [lo, hi): even doc_ids become
    10-word excerpts of themselves (ids + EXCERPT_OFFSET), odd ids
    become fully-novel docs (every token suffixed). Only docs with
    >= 20 words qualify as excerpt sources, keeping the planted
    containment exactly 1.0 by construction."""
    from pyspark.sql import functions as F

    src = corpus.filter(
        (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
    ).withColumn("toks", F.split(F.trim(F.col("text")), r"\s+"))
    excerpts = (
        src.filter((F.col("doc_id") % 2 == 0) & (F.size("toks") >= 20))
        .select(
            (F.col("doc_id") + EXCERPT_OFFSET).alias("doc_id"),
            F.array_join(F.slice("toks", 6, 10), " ").alias("text"),
        )
    )
    novel = src.filter(F.col("doc_id") % 2 == 1).select(
        (F.col("doc_id") + 2 * EXCERPT_OFFSET).alias("doc_id"),
        F.array_join(
            F.transform("toks", lambda w: F.concat(w, F.lit("x"))), " "
        ).alias("text"),
    )
    return excerpts.unionAll(novel)


def screen(spark, batch, max_df: int, corpus=None, postings=None, df_tbl=None):
    from real_time_trip_processing_spark.functions.caching import (
        release_owned_caches,
    )
    from real_time_trip_processing_spark.functions.similarity import (
        containment_incremental_pairs,
    )

    t0 = time.monotonic()
    frame = containment_incremental_pairs(
        batch,
        corpus,
        n=3,
        threshold=THRESHOLD,
        max_df=max_df,
        corpus_postings=postings,
        corpus_df=df_tbl,
    )
    pairs = frame.collect()
    wall = round(time.monotonic() - t0, 2)
    # per-cycle hygiene: without this every cycle pins another cached
    # pair frame (the round-8/9 cache-accumulation class the owned-
    # cache contract exists for — cycle walls then measure heap
    # pressure, not the screen)
    release_owned_caches(frame)
    return pairs, wall


def check_cycle(spark, corpus, pairs, lo: int, hi: int, max_df: int) -> dict:
    """Planted-recall accounting for one cycle's pair list."""
    from pyspark.sql import functions as F

    expected = {
        int(r["doc_id"]) + EXCERPT_OFFSET
        for r in corpus.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
            & (F.col("doc_id") % 2 == 0)
            & (F.size(F.split(F.trim(F.col("text")), r"\s+")) >= 20)
        ).select("doc_id").collect()
    }
    hit = {
        int(p["a"])
        for p in pairs
        if p["a"] >= EXCERPT_OFFSET and p["a"] < 2 * EXCERPT_OFFSET
        and p["b"] == p["a"] - EXCERPT_OFFSET and p["containment"] == 1.0
    }
    novel_hits = [p for p in pairs if p["a"] >= 2 * EXCERPT_OFFSET]
    assert not novel_hits, f"novel docs paired: {novel_hits[:3]}"
    # an excerpt may legitimately miss ONLY if every one of its
    # shingles is a stop-shingle under the df cap (it then never
    # enters the join at all) — VERIFY that for each miss instead of
    # assuming it, so the recall claim is exact, not vacuous: any miss
    # with a surviving shingle is a true screen failure and asserts
    missed = expected - hit
    if missed:
        from pyspark.sql import functions as F

        from real_time_trip_processing_spark.functions.similarity import (
            shingle_rows,
        )

        src_ids = [m - EXCERPT_OFFSET for m in missed]
        miss_docs = make_batch(
            spark, corpus, lo, hi
        ).filter(F.col("doc_id").isin([int(m) for m in missed]))
        postings = spark.read.parquet(POSTINGS)
        rare = (
            postings.groupBy("sh")
            .agg(F.count(F.lit(1)).alias("df"))
            .filter(F.col("df") <= max_df)
            .select("sh")
        )
        surviving = (
            shingle_rows(miss_docs, 3, "doc_id", "text")
            .dropDuplicates(["doc", "sh"])
            .join(rare, "sh")
            .groupBy("doc")
            .agg(F.count(F.lit(1)).alias("n"))
            .collect()
        )
        assert not surviving, (
            f"TRUE MISSES (surviving shingles but no 1.0 pair): "
            f"{[(r['doc'], r['n']) for r in surviving[:5]]} "
            f"(sources {src_ids[:5]})"
        )
    return {
        "expected_excerpts": len(expected),
        "caught_at_1.0": len(hit),
        "dropped_by_df_cap_verified": len(missed),
        "n_pairs": len(pairs),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--corpus", type=int, default=1_000_000)
    ap.add_argument("--batch", type=int, default=10_000)
    ap.add_argument("--max-df", type=int, default=1_000)
    ap.add_argument("--skip-gen", action="store_true")
    args = ap.parse_args()

    if not args.skip_gen and not os.path.isdir(OUT):
        generate(max(2_000_000, args.corpus), OUT)

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.similarity import (
        corpus_postings_index,
    )
    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("scale-containment")
    corpus = spark.read.parquet(OUT).filter(
        F.col("doc_id") < args.corpus
    ).select("doc_id", "text")

    if os.path.isdir(POSTINGS):
        shutil.rmtree(POSTINGS)
    t0 = time.monotonic()
    corpus_postings_index(corpus, n=3).write.parquet(POSTINGS)
    build_sec = round(time.monotonic() - t0, 2)
    postings = spark.read.parquet(POSTINGS)
    n_postings = postings.count()
    # the (sh, df) table is built ONCE beside the postings — the
    # at-scale configuration the corpus_df param documents; without it
    # every cycle re-aggregates all postings just to find stop-shingles
    from pyspark.sql import functions as SF

    df_dir = POSTINGS + "_df"
    if os.path.isdir(df_dir):
        shutil.rmtree(df_dir)
    t0 = time.monotonic()
    postings.groupBy("sh").agg(SF.count(SF.lit(1)).alias("df")) \
        .write.parquet(df_dir)
    df_build_sec = round(time.monotonic() - t0, 2)
    df_tbl = spark.read.parquet(df_dir)

    out = {
        "corpus_docs": args.corpus,
        "batch_docs": args.batch,
        "max_df": args.max_df,
        "postings_rows": n_postings,
        "postings_build_sec": build_sec,
        "df_table_build_sec": df_build_sec,
        "cycles": [],
    }
    # two cycles over disjoint slices: both screen-only against the
    # persisted postings + df table (no corpus re-shingle, no
    # corpus-wide aggregate anywhere in the cycle)
    for c in range(2):
        lo = c * args.batch
        hi = lo + args.batch
        batch = make_batch(spark, corpus, lo, hi)
        pairs, wall = screen(
            spark, batch, args.max_df, postings=postings, df_tbl=df_tbl
        )
        stats = check_cycle(spark, corpus, pairs, lo, hi, args.max_df)
        stats["screen_sec"] = wall
        out["cycles"].append(stats)
    # the A/B: same screen with the corpus re-shingled in-cycle. The
    # postings-side figure is cycle 2 — the steady-state screen the
    # docstring promises — not the warm-up-inflated first cycle
    # (round-11 review); cycle 1's wall stays visible in cycles[0]
    batch = make_batch(spark, corpus, 0, args.batch)
    _, wall_raw = screen(spark, batch, args.max_df, corpus=corpus)
    out["cycle_sec_postings"] = out["cycles"][1]["screen_sec"]
    out["cycle_sec_raw_corpus"] = wall_raw
    print(json.dumps(out))


if __name__ == "__main__":
    main()
