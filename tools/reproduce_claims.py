"""One-command reproduction of SCALE.md's measured claims, at sizes
small enough to finish in minutes.

Each scale harness (scale_pack, scale_skew_ann, scale_streaming,
scale_text, recall_ann) measures one family's 100 TB design at 0.5M-8M
rows and records its numbers in SCALE.md — but a number nobody can
re-run decays into an assertion. This driver re-executes every claim's
QUALITATIVE envelope at reduced size and prints one JSON verdict per
claim: the properties that must hold at ANY size (bit-identity,
zero-loss, recall floor, salting parity), plus the timing ratios that
only have to hold directionally (hardware varies; the envelopes are
deliberately loose — they convict a broken design, not a slow laptop).

Claims checked:
- pack:      bucketed two-phase prefix sum is BIT-IDENTICAL to the
             single-window path (exact diff 0) at 100k docs/1 stream.
- skew_ann:  salted ANN join returns the SAME rows as unsalted under a
             30%-hot corpus, and is not catastrophically slower
             (<= 2x) at 100k rows.
- streaming: 100k-event replay through the watermarked matcher loses
             ZERO matches (n_completed == n_events / 2).
- recall:    IVF recall@10 (nprobe=4/16) on the driver testdata >= the
             declared band of `sim_ivf_recall` (imported, 0.73 as of
             round 8 -- the just-under-the-measured-low-end rule).
- ivf_index: persisted-index serve is bit-identical to the in-query
             path, and append == rebuild (the O(delta) maintenance
             claim) on the testdata corpus.
- serve_split: the ann_join_ivfpq_persisted serve-state memo survives
             repeated serves (payload identity) and the warm prologue
             is a small fraction of the cold one (round-9; the
             100k/1M fixed-vs-linear split is scale_serve_decomp.py).
- lsh_cap:   minhash_lsh_pairs(max_bucket) keeps duplicate clusters
             connected and is a no-op when no bucket exceeds the cap
             (the 2M-doc quadratic-term fix, SCALE.md round 5); the
             DECLARED capped query (dedup_near_minhash_capped) returns
             a strict, nonempty subset of the uncapped declared pairs.

Usage: python tools/reproduce_claims.py  [--full]
(--full runs the pack/skew claims at the SCALE.md sizes instead of the
reduced ones; budget ~30 min.)
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = "/root/testdata/sf0.01"
#: smallest driver testdata — used where a claim compares TWO full
#: declared pipelines side-by-side (LSH capped vs uncapped) and the
#: sf0.01 run time would double the suite for no extra signal
SF_SMALL_DIR = "/root/testdata/sf0.001"


def claim_pack(spark, n_docs: int) -> dict:
    import scale_pack

    from real_time_trip_processing_spark.functions.curation import (
        pack_sequences,
    )

    out = os.path.join(scale_pack.OUT + "_repro")
    scale_pack.generate(n_docs, out)
    try:
        docs = spark.read.parquet(out)
        a = pack_sequences(docs, budget=512, n_buckets=1)
        single_sec = _drain(a)
        b = pack_sequences(docs, budget=512, n_buckets=32)
        bucketed_sec = _drain(b)
        cols = ["doc_id", "n_tokens", "tok_offset", "seq_id"]
        diff = (
            a.select(cols).exceptAll(b.select(cols)).count()
            + b.select(cols).exceptAll(a.select(cols)).count()
        )
        return {
            "ok": diff == 0,
            "exact_diff_rows": diff,
            "single_sec": single_sec,
            "bucketed_sec": bucketed_sec,
            "claim": "two-phase prefix sum bit-identical to single window",
        }
    finally:
        shutil.rmtree(out, ignore_errors=True)


def _drain(df) -> float:
    t0 = time.monotonic()
    df.write.mode("overwrite").format("noop").save()
    return round(time.monotonic() - t0, 2)


def claim_skew_ann(spark, n_rows: int) -> dict:
    import scale_skew_ann

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf,
    )

    # reuse the harness's generator (30% hot cluster) at reduced size
    scale_skew_ann.generate(n_rows)
    full = spark.read.parquet(scale_skew_ann.OUT)
    corpus = full.filter(F.col("vec_id") % 50 != 0)
    queries = full.filter((F.col("vec_id") % 50 == 0) & (F.col("vec_id") < 25_000))
    cb = [
        (int(r[0]), list(r[1]))
        for r in corpus.filter(F.col("vec_id") < 129)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]
    t0 = time.monotonic()
    un = ann_join_ivf(corpus, queries, k=5, nprobe=4, codebook=cb)
    un_rows = sorted(tuple(r) for r in un.collect())
    un_sec = round(time.monotonic() - t0, 2)
    t0 = time.monotonic()
    sa = ann_join_ivf(
        corpus, queries, k=5, nprobe=4, codebook=cb, max_bucket=5_000
    )
    sa_rows = sorted(tuple(r) for r in sa.collect())
    sa_sec = round(time.monotonic() - t0, 2)
    return {
        "ok": un_rows == sa_rows and sa_sec <= max(un_sec * 2.0, un_sec + 10),
        "rows_equal": un_rows == sa_rows,
        "unsalted_sec": un_sec,
        "salted_sec": sa_sec,
        "n_pairs": len(un_rows),
        "claim": "hot-bucket salting is bit-identical and not a regression",
    }


def claim_streaming(spark, n_events: int) -> dict:
    import scale_streaming

    work = tempfile.mkdtemp(prefix="repro_stream_")
    try:
        rdir = os.path.join(work, "replay")
        scale_streaming.generate(spark, n_events, rdir)
        r = scale_streaming.replay(spark, rdir, work, "repro")
        ok = int(r["n_completed"]) == n_events // 2
        return {
            "ok": ok,
            "n_events": n_events,
            "n_completed": int(r["n_completed"]),
            "match_sec": r["match_sec"],
            "claim": "watermarked matcher loses zero in-watermark matches",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def claim_recall(spark) -> dict:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.pq import (
        ivfpq_topk, pq_train,
    )
    from real_time_trip_processing_spark.functions.similarity import (
        cosine_topk,
    )
    from real_time_trip_processing_spark.plans import REGISTRY
    from real_time_trip_processing_spark.plans.vector_queries import (
        _PQ_RECALL_BAND,
        _RECALL_BAND,
    )
    from real_time_trip_processing_spark.sources import table

    row = REGISTRY["sim_ivf_recall"].builder(spark, SF_DIR).collect()[0]
    # the PQ twin keeps its raw recall OFF the declared output (PQ
    # training is not oracle-replayable), so the NUMBER is re-measured
    # here from the underlying ops — same shape as the declared query —
    # and checked against both the declared floor (imported — keeps
    # this envelope in lockstep with the declared query) and the
    # documented 0.57–0.645 measurement envelope (with slack: the
    # envelope is a regression tripwire, not a tolerance contract)
    emb = table(spark, SF_DIR, "embeddings")
    probes = emb.filter(F.col("vec_id") < 20)
    books = pq_train(emb, m=32, k=16, iters=2)
    approx = ivfpq_topk(
        emb, probes, books, k=10, n_centroids=16, nprobe=4
    ).select("query_id", "cand_id")
    exact = cosine_topk(emb, probes, k=10).select("query_id", "cand_id")
    n_expected = exact.count()
    n_hit = exact.join(approx, ["query_id", "cand_id"], "left_semi").count()
    pq_recall = n_hit / n_expected
    return {
        "ok": bool(row["recall_ok"]) and pq_recall >= _PQ_RECALL_BAND,
        "recall": float(row["recall"]),
        "band": _RECALL_BAND,
        "pq_recall": round(pq_recall, 4),
        "pq_band": _PQ_RECALL_BAND,
        "pq_envelope_0_5_to_0_75": bool(0.5 <= pq_recall <= 0.75),
        "claim": "IVF recall@10 (nprobe 4/16) above the declared band;"
        " IVF-PQ ADC recall re-measured above its floor",
    }


def claim_ivf_index(spark) -> dict:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_append,
        ivf_index_build,
        ivf_persisted_topk,
    )
    from real_time_trip_processing_spark.functions.similarity import ivf_topk
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    delta = emb.filter(F.col("vec_id") % 3 == 0)
    queries = emb.filter(F.col("vec_id") < 5)
    cb = [
        (int(r[0]), list(r[1]))
        for r in emb.filter(F.col("vec_id") < 16)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]
    work = tempfile.mkdtemp(prefix="repro_ivf_")
    try:
        grown = os.path.join(work, "grown")
        ivf_index_build(base, grown, n_centroids=16, codebook=cb)
        t0 = time.monotonic()
        ivf_index_append(delta, grown)
        append_sec = round(time.monotonic() - t0, 2)
        got = sorted(
            tuple(r)
            for r in ivf_persisted_topk(
                spark, grown, queries, k=3, nprobe=4
            ).collect()
        )
        want = sorted(
            tuple(r)
            for r in ivf_topk(
                emb, queries, k=3, n_centroids=16, nprobe=4, codebook=cb
            ).collect()
        )
        return {
            "ok": got == want,
            "serve_equals_in_query": got == want,
            "append_sec": append_sec,
            "claim": "persisted serve bit-identical; append == rebuild",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def claim_serve_split(spark) -> dict:
    """Round-9 claim (verdict #6): the `ann_join_ivfpq_persisted` serve
    wall decomposes into a FIXED driver prologue (codebook + books
    collect + float64 convert) that the file-signature memo pays ONCE
    per session-and-content, and the distributed probe/shuffle/kernel
    part that every serve pays. Asserted here: (a) the memo genuinely
    survives repeated serves — the second state load returns the
    IDENTICAL payload object, no reload/reconvert; (b) the warm
    state-load cost is a small fraction of the cold one; (c) repeated
    serves are not slower than the first (directional — the memo must
    never make serving worse). The fixed-vs-linear split at 100k/1M is
    measured by tools/scale_serve_decomp.py and recorded in SCALE.md."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions import ivf_index as IX
    from real_time_trip_processing_spark.functions import pq as PQ
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    queries = emb.filter(F.col("vec_id") % 40 == 0)
    work = tempfile.mkdtemp(prefix="repro_serve_split_")
    try:
        idx = os.path.join(work, "idx")
        books = PQ.pq_train(emb.limit(1024), m=8, k=16, iters=2, dim=64)
        IX.ivfpq_index_build(emb, idx, books, n_centroids=16, dim=64)

        IX._SERVE_STATE_CACHE.clear()
        t0 = time.monotonic()
        IX._load_centroids(spark, idx, "pq")
        b1 = IX._load_books_np(spark, idx)
        prologue_cold = round(time.monotonic() - t0, 4)
        t0 = time.monotonic()
        IX._load_centroids(spark, idx, "pq")
        b2 = IX._load_books_np(spark, idx)
        prologue_warm = round(time.monotonic() - t0, 4)
        memo_survives = b1 is b2

        def serve() -> float:
            t0 = time.monotonic()
            IX.ann_join_ivfpq_persisted(
                spark, idx, queries, k=3, nprobe=4
            ).write.mode("overwrite").format("noop").save()
            return round(time.monotonic() - t0, 3)

        IX._SERVE_STATE_CACHE.clear()
        cold = serve()
        warms = sorted(serve() for _ in range(3))
        warm_med = warms[1]

        # round 10 (round-9 verdict #6): the same memo-survival claim
        # for the IVF (float) book path — `ann_join_persisted`'s
        # centroids-only prologue. `_load_centroids` hands back a
        # defensive shallow COPY of the memoized list, so identity is
        # asserted on the shared row tuples, not the list object.
        ividx = os.path.join(work, "ividx")
        IX.ivf_index_build(emb, ividx, n_centroids=16)
        IX._SERVE_STATE_CACHE.clear()
        c1 = IX._load_centroids(spark, ividx, "ivf")
        c2 = IX._load_centroids(spark, ividx, "ivf")
        ivf_memo_survives = bool(c1 and c2 and c1[0] is c2[0])
        IX.ann_join_persisted(
            spark, ividx, queries, k=3, nprobe=4
        ).write.mode("overwrite").format("noop").save()
        c3 = IX._load_centroids(spark, ividx, "ivf")
        ivf_memo_after_serve = bool(c3 and c2[0] is c3[0])

        ok = (
            memo_survives
            and ivf_memo_survives
            and ivf_memo_after_serve
            and prologue_warm < max(0.1, 0.5 * prologue_cold)
            # directional: the memo must never make repeat serves worse
            # (generous 1.25 band — walls this small carry GC noise)
            and warm_med <= cold * 1.25
        )
        return {
            "ok": bool(ok),
            "memo_survives": bool(memo_survives),
            "ivf_memo_survives": bool(ivf_memo_survives),
            "ivf_memo_after_serve": bool(ivf_memo_after_serve),
            "prologue_cold_sec": prologue_cold,
            "prologue_warm_sec": prologue_warm,
            "serve_cold_sec": cold,
            "serve_warm_median_sec": warm_med,
            "claim": "serve-state memo survives repeated serves (PQ "
                     "books AND IVF float centroids); warm prologue is "
                     "a small fraction of cold",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def claim_compact(spark) -> dict:
    """Round-6 lifecycle claim (SCALE.md 1M table, here at sf scale):
    stream-staged micro-batches fold into the base in O(streamed) with
    results INVARIANT across the fold — pre-compact serve ==
    post-compact serve == in-query top-k — while the parquet file
    count under the index strictly drops (the op's reason to exist),
    and a manually replayed pre-compaction batch id after the fold is
    short-circuited by the high-water marker (no duplicates)."""
    import glob as _glob

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.ivf_index import (
        ivf_index_build,
        ivf_index_compact_stream,
        ivf_persisted_topk,
        read_index_cells,
        streaming_index_append,
    )
    from real_time_trip_processing_spark.functions.similarity import ivf_topk
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    base = emb.filter(F.col("vec_id") % 3 != 0)
    b0 = emb.filter(F.col("vec_id") % 3 == 0).filter(F.col("vec_id") % 2 == 0)
    b1 = emb.filter(F.col("vec_id") % 3 == 0).filter(F.col("vec_id") % 2 == 1)
    queries = emb.filter(F.col("vec_id") < 5)
    cb = [
        (int(r[0]), list(r[1]))
        for r in emb.filter(F.col("vec_id") < 16)
        .select("vec_id", F.col("embedding").cast("array<double>"))
        .collect()
    ]

    def files(d):
        return sum(1 for _ in _glob.iglob(
            os.path.join(d, "**", "*.parquet"), recursive=True))

    def serve(idx):
        return sorted(tuple(r) for r in ivf_persisted_topk(
            spark, idx, queries, k=3, nprobe=4).collect())

    work = tempfile.mkdtemp(prefix="repro_compact_")
    try:
        idx = os.path.join(work, "idx")
        ivf_index_build(base, idx, n_centroids=16, codebook=cb)
        sink = streaming_index_append(idx)
        sink(b0, 0)
        sink(b1, 1)
        n_total = read_index_cells(spark, idx).count()
        pre = serve(idx)
        f_before = files(idx)
        t0 = time.monotonic()
        ivf_index_compact_stream(spark, idx)
        compact_sec = round(time.monotonic() - t0, 2)
        f_after = files(idx)
        post = serve(idx)
        # a replayed pre-compaction batch must short-circuit on the
        # high-water marker, not re-apply rows the fold already moved
        sink(b1, 1)
        n_after_replay = read_index_cells(spark, idx).count()
        want = sorted(tuple(r) for r in ivf_topk(
            emb, queries, k=3, n_centroids=16, nprobe=4, codebook=cb
        ).collect())
        ok = (pre == want and post == want and f_after < f_before
              and n_after_replay == n_total)
        return {
            "ok": ok,
            "pre_eq_post_eq_in_query": pre == want and post == want,
            "compact_sec": compact_sec,
            "files_before": f_before,
            "files_after": f_after,
            "replay_after_compact_noop": n_after_replay == n_total,
            "claim": "compaction is invisible to results, visible to "
                     "file counts; replays short-circuit on high-water",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def claim_delete(spark) -> dict:
    """Round-8 erasure claim (tests/test_index_delete.py at full
    matrix): `ivf_index_delete` is the index-side GDPR purge — serve
    results afterwards are BIT-IDENTICAL to an index rebuilt over the
    purged corpus with the same codebook, the manifest reads FRESH
    against the purged corpus (the delete replaces the O(corpus)
    rebuild instead of triggering it), deleted ids never serve, and
    only the affected cells are rewritten (unaffected partition files
    are byte-untouched)."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.ivf_index import (
        _load_centroids,
        ivf_index_build,
        ivf_index_delete,
        ivf_index_is_fresh,
        ivf_persisted_topk,
    )
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, SF_DIR, "embeddings")
    del_ids = [3, 17, 40, 41]
    queries = emb.filter(F.col("vec_id") < 6)
    work = tempfile.mkdtemp(prefix="repro_delete_")
    try:
        idx, idx2 = os.path.join(work, "idx"), os.path.join(work, "idx2")
        ivf_index_build(emb, idx, n_centroids=16)
        stored = _load_centroids(spark, idx)
        before = {}  # (path, mtime, size) of every cell file pre-delete
        for root, _, fns in os.walk(os.path.join(idx, "cells")):
            for fn in fns:
                p = os.path.join(root, fn)
                st = os.stat(p)
                before[p] = (st.st_mtime_ns, st.st_size)
        t0 = time.monotonic()
        res = ivf_index_delete(spark, idx, del_ids)
        delete_sec = round(time.monotonic() - t0, 2)
        purged = emb.filter(~F.col("vec_id").isin(del_ids))
        ivf_index_build(purged, idx2, n_centroids=16, codebook=stored)
        got = sorted(tuple(r) for r in ivf_persisted_topk(
            spark, idx, queries, k=3, nprobe=4).collect())
        want = sorted(tuple(r) for r in ivf_persisted_topk(
            spark, idx2, queries, k=3, nprobe=4).collect())
        # unaffected partitions byte-untouched (partition-scoped claim)
        survivors = [p for p in before if os.path.exists(p)]
        untouched = sum(
            1 for p in survivors
            if (os.stat(p).st_mtime_ns, os.stat(p).st_size) == before[p]
        )
        fresh_flip = (
            ivf_index_is_fresh(spark, purged, idx, 16)
            and not ivf_index_is_fresh(spark, emb, idx, 16)
        )
        ok = (
            got == want
            and res["n_deleted"] == len(del_ids)
            and fresh_flip
            and not any(r[1] in del_ids for r in got)
            and untouched > 0
        )
        return {
            "ok": ok,
            "serve_equals_rebuild_minus": got == want,
            "freshness_flips": fresh_flip,
            "untouched_files": untouched,
            "total_files_before": len(before),
            "delete_sec": delete_sec,
            "claim": "index delete == rebuild-over-purged-corpus "
                     "(same codebook); partition-scoped rewrite",
        }
    finally:
        shutil.rmtree(work, ignore_errors=True)


def claim_lsh_cap(spark) -> dict:
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.minhash import (
        minhash_lsh_pairs,
    )

    rows = [(i, "alpha beta gamma delta epsilon zeta eta theta iota kap")
            for i in range(100)]
    rows += [(100 + i, f"u{i} f{i} w{i} a{i} o{i} s{i} t{i} k{i}")
             for i in range(20)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    capped = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.5, max_bucket=10
    ).collect()
    parent = list(range(100))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in capped:
        if r["a"] < 100 and r["b"] < 100:
            parent[find(int(r["a"]))] = find(int(r["b"]))
    n_comp = len({find(i) for i in range(100)})
    dup_edges = sum(1 for r in capped if r["a"] < 100 and r["b"] < 100)
    base = minhash_lsh_pairs(
        docs, n=3, num_perm=32, bands=8, threshold=0.5,
        max_bucket=10_000_000,
    )
    full = minhash_lsh_pairs(docs, n=3, num_perm=32, bands=8, threshold=0.5)
    noop_equal = sorted(map(tuple, base.collect())) == sorted(
        map(tuple, full.collect())
    )
    # the DECLARED production configuration (dedup_near_minhash_capped:
    # det=True, max_bucket=3) only ever DROPS candidates relative to the
    # uncapped declared query — star edges live inside buckets whose
    # full pair set the uncapped join generates — so capped ⊆ uncapped
    # must hold on real data, with the cap actually firing
    from real_time_trip_processing_spark.plans.registry import REGISTRY

    sf_dir = SF_SMALL_DIR
    capped_decl = {
        (r["a"], r["b"])
        for r in REGISTRY["dedup_near_minhash_capped"].builder(spark, sf_dir).collect()
    }
    uncapped_decl = {
        (r["a"], r["b"])
        for r in REGISTRY["dedup_near_minhash"].builder(spark, sf_dir).collect()
    }
    declared_subset = capped_decl <= uncapped_decl and 0 < len(
        capped_decl
    ) < len(uncapped_decl)
    spark.catalog.clearCache()
    return {
        "ok": n_comp == 1 and dup_edges < 500 and noop_equal
        and declared_subset,
        "dup_components": n_comp,
        "dup_edges_capped": dup_edges,
        "noop_cap_equal": noop_equal,
        "declared_capped_subset": declared_subset,
        "declared_capped_pairs": len(capped_decl),
        "declared_uncapped_pairs": len(uncapped_decl),
        "claim": "LSH hot-bucket cap keeps clusters connected, linear",
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--full", action="store_true")
    args = ap.parse_args()

    from real_time_trip_processing_spark.session import get_spark

    spark = get_spark("reproduce-claims")
    pack_n = 1_000_000 if args.full else 100_000
    skew_n = 500_000 if args.full else 100_000
    stream_n = 100_000

    out = {}
    for name, fn in (
        ("pack", lambda: claim_pack(spark, pack_n)),
        ("skew_ann", lambda: claim_skew_ann(spark, skew_n)),
        ("streaming", lambda: claim_streaming(spark, stream_n)),
        ("recall", lambda: claim_recall(spark)),
        ("ivf_index", lambda: claim_ivf_index(spark)),
        ("serve_split", lambda: claim_serve_split(spark)),
        ("compact", lambda: claim_compact(spark)),
        ("delete", lambda: claim_delete(spark)),
        ("lsh_cap", lambda: claim_lsh_cap(spark)),
    ):
        t0 = time.monotonic()
        try:
            out[name] = fn()
        except Exception as ex:  # noqa: BLE001 — report, keep going
            out[name] = {"ok": False, "error": str(ex)[:300]}
        out[name]["wall_sec"] = round(time.monotonic() - t0, 1)
        print(f"{name:10s} ok={out[name].get('ok')}  "
              f"({out[name]['wall_sec']}s)", flush=True)

    all_ok = all(v.get("ok") for v in out.values())
    print(json.dumps({"all_ok": all_ok, "claims": out}))
    sys.exit(0 if all_ok else 1)


if __name__ == "__main__":
    main()
