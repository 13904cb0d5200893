"""Operator unit tests on tiny in-memory frames, reproducing the
reference's hand-computed goldens (reference test/test.py:155-209) and
exercising the matcher semantics the reference leaves untested."""

from __future__ import annotations

import math

from pyspark.sql import Row, functions as F

from real_time_trip_processing_spark.operators import aggregates as A
from real_time_trip_processing_spark.operators import cleaning as P
from real_time_trip_processing_spark.operators.dedup import dedup_keyed
from real_time_trip_processing_spark.operators.joins import match_start_end
from real_time_trip_processing_spark.operators.sets import union_all

#: the reference's 4-trip KPI oracle (test/test.py:42-89, 163-166)
MICRO = [
    ("trip1", "2025-04-20 08:30:00", 25.50),
    ("trip2", "2025-04-20 09:15:00", 30.75),
    ("trip3", "2025-04-21 10:00:00", 15.25),
    ("trip4", "2025-04-21 14:45:00", 42.00),
]


def _micro_df(spark):
    df = spark.createDataFrame(MICRO, "trip_id string, pickup_datetime string, fare_amount double")
    return df.withColumn("pickup_datetime", F.to_timestamp("pickup_datetime"))


def test_kpi_daily_golden(spark):
    out = {
        str(r["pickup_date"])[:10]: r
        for r in A.kpi_daily(_micro_df(spark)).collect()
    }
    d1, d2 = out["2025-04-20"], out["2025-04-21"]
    # hand-computed goldens from reference test/test.py:163-166, 196-201
    assert math.isclose(d1["total_fare"], 56.25, abs_tol=0.01)
    assert d1["trip_count"] == 2
    assert math.isclose(d1["average_fare"], 28.125, abs_tol=0.01)
    assert math.isclose(d1["maximum_fare"], 30.75, abs_tol=0.01)
    assert math.isclose(d1["minimum_fare"], 25.50, abs_tol=0.01)
    assert math.isclose(d2["total_fare"], 57.25, abs_tol=0.01)
    assert d2["trip_count"] == 2


def test_invalid_rows_coerced_and_dropped(spark):
    # reference test/test.py:223-247: bad date and bad fare → dropped
    rows = MICRO + [
        ("bad1", "invalid-date", 10.0),
        ("bad2", "2025-04-22 10:00:00", None),
    ]
    df = spark.createDataFrame(rows, "trip_id string, pickup_datetime string, fare_amount double")
    df = df.withColumn("fare_amount", F.col("fare_amount").cast("string"))
    clean = P.coerce_timestamp(df, ["pickup_datetime"])
    clean = P.coerce_numeric(clean, ["fare_amount"])
    ids = {r["trip_id"] for r in clean.select("trip_id").collect()}
    assert ids == {"trip1", "trip2", "trip3", "trip4"}


def test_clean_numeric_nan_inf(spark):
    df = spark.createDataFrame(
        [(1, 1.5), (2, float("nan")), (3, float("inf")), (4, float("-inf"))],
        "id int, v double",
    )
    out = P.clean_numeric(df, ["v"]).collect()
    vals = {r["id"]: r["v"] for r in out}
    assert vals[1] == 1.5
    assert vals[2] is None and vals[3] is None and vals[4] is None


def test_dedup_keyed_first_wins(spark):
    df = spark.createDataFrame(
        [("a", "2025-01-01 00:00:01", 1), ("a", "2025-01-01 00:00:02", 2), ("b", "2025-01-01 00:00:03", 3)],
        "k string, ts string, payload int",
    )
    out = dedup_keyed(df, ["k"], ["ts"]).collect()
    got = {r["k"]: r["payload"] for r in out}
    assert got == {"a": 1, "b": 3}


def test_matcher_merge_collision_rename(spark):
    starts = spark.createDataFrame(
        [Row(trip_id="t1", pickup_datetime="2024-05-25 10:00:00", record_id="s-1", data_type="trip_start")]
    )
    ends = spark.createDataFrame(
        [Row(trip_id="t1", dropoff_datetime="2024-05-25 10:30:00", record_id="e-1", data_type="trip_end", fare_amount=12.5)]
    )
    out = match_start_end(starts, ends, key="trip_id",
                          start_order=("pickup_datetime",), end_order=("dropoff_datetime",)).collect()
    assert len(out) == 1
    r = out[0].asDict()
    # collision policy (reference scripts/lambda2.py:100-104): start side
    # keeps the plain name, end side renamed end_<col>
    assert r["record_id"] == "s-1" and r["end_record_id"] == "e-1"
    assert r["data_type"] == "completed_trip"  # scripts/lambda2.py:97
    assert r["status"] == "completed"
    assert r["fare_amount"] == 12.5  # non-colliding end column keeps its name


def test_matcher_unmatched_waits_first_match_wins(spark):
    starts = spark.createDataFrame(
        [("t1", "2024-05-25 10:00:00"), ("t1", "2024-05-25 10:05:00"), ("t2", "2024-05-25 11:00:00")],
        "trip_id string, pickup_datetime string",
    )
    ends = spark.createDataFrame(
        [("t1", "2024-05-25 10:40:00"), ("t1", "2024-05-25 10:50:00")],
        "trip_id string, dropoff_datetime string",
    )
    out = match_start_end(starts, ends, key="trip_id",
                          start_order=("pickup_datetime",), end_order=("dropoff_datetime",)).collect()
    # t2 has no partner → waits (absent from inner-join output,
    # reference scripts/lambda2.py:254-255); duplicate t1 events →
    # first occurrence on each side wins (scripts/lambda2.py:27-63)
    assert len(out) == 1
    r = out[0].asDict()
    assert r["trip_id"] == "t1"
    assert str(r["pickup_datetime"]) == "2024-05-25 10:00:00"
    assert str(r["end_dropoff_datetime"] if "end_dropoff_datetime" in r else r["dropoff_datetime"]) == "2024-05-25 10:40:00"


def test_union_all_fills_missing(spark):
    a = spark.createDataFrame([(1, "x")], "id int, a string")
    b = spark.createDataFrame([(2, "y")], "id int, b string")
    out = union_all(a, b)
    assert sorted(out.columns) == ["a", "b", "id"]
    rows = {r["id"]: (r["a"], r["b"]) for r in out.collect()}
    assert rows == {1: ("x", None), 2: (None, "y")}


def test_global_minmax_and_value_counts(spark):
    df = _micro_df(spark)
    mm = A.global_minmax(df, "pickup_datetime", "trip_id").collect()[0]
    assert mm["record_count"] == 4
    assert str(mm["start_ts"]) == "2025-04-20 08:30:00"
    vc = A.value_counts(P.derive_date(df, "pickup_datetime"), "pickup_date").collect()
    assert [r["count"] for r in vc] == [2, 2]


def test_multimodal_feature_plumbing(spark):
    """X6: binary column + mapInPandas plumbing — deterministic fake
    codec; asserts the Arrow round-trip, schema, and feature math."""
    from real_time_trip_processing_spark.functions.multimodal import (
        N_FEATURE_BINS,
        decode_media,
        extract_features,
        synth_media,
    )
    import pytest as _pytest

    docs = spark.createDataFrame(
        [(1, "abc", "en", "s", 3), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    out = {r["doc_id"]: r for r in extract_features(synth_media(docs)).collect()}
    assert out[1]["byte_len"] == 3
    assert out[1]["byte_mean"] == (97 + 98 + 99) / 3  # 'abc'
    assert len(out[1]["features"]) == N_FEATURE_BINS
    assert abs(sum(out[1]["features"]) - 1.0) < 1e-12  # histogram normalized
    assert out[2]["byte_len"] == 0 and out[2]["byte_mean"] == 0.0
    # the real-codec path is a loud stub, not a silent fake
    with _pytest.raises(NotImplementedError):
        decode_media(b"\xff\xd8", "image/jpeg")


def test_multimodal_frame_sample_and_resize(spark):
    """X6 frame sampling + resize: deterministic slicing math, empty
    payloads yield no frames, resize keeps schema and scales bytes."""
    from real_time_trip_processing_spark.functions.multimodal import (
        resize_media,
        sample_frames,
        synth_media,
    )

    text = "x" * 100  # 100 bytes → 7 frames of 16 (last short), keep 0 and 4
    docs = spark.createDataFrame(
        [(1, text, "en", "s", 100), (2, "", "en", "s", 0)],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    assets = synth_media(docs)
    frames = sample_frames(assets, frame_bytes=16, stride=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert sorted(r["frame_idx"] for r in by_doc[1]) == [0, 4]
    assert {r["frame_idx"]: r["frame_len"] for r in by_doc[1]} == {0: 16, 4: 16}
    assert all(bytes(r["frame"]) == b"x" * 16 for r in by_doc[1])
    assert 2 not in by_doc  # empty payload → zero frames

    resized = {r["doc_id"]: r for r in resize_media(assets, factor=4).collect()}
    assert len(bytes(resized[1]["media"])) == 25  # every 4th of 100
    assert resized[1]["width"] == assets.filter("doc_id=1").first()["width"] // 4
    assert len(bytes(resized[2]["media"])) == 0
    assert [f.name for f in resize_media(assets).schema] == [
        f.name for f in assets.schema
    ]


def test_kmeans_converges(spark):
    """Lloyd's on three obvious clusters: centroids land on the cluster
    means, assignment is stable, empty clusters keep their centroid."""
    import numpy as np

    from real_time_trip_processing_spark.functions.kmeans import (
        assign_clusters,
        kmeans_fit,
    )

    rng = np.random.default_rng(7)
    centers = np.array([[10.0, 0.0], [0.0, 10.0], [-10.0, -10.0]])
    rows = []
    for i in range(60):
        c = centers[i % 3]
        rows.append((i, (c + rng.normal(0, 0.1, 2)).tolist()))
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    cb = kmeans_fit(emb, k=3, iters=4)
    cents = {r["cent_id"]: r["centroid"] for r in cb.collect()}
    assert set(cents) == {0, 1, 2}
    # each true center has exactly one learned centroid cosine≈1 to it
    def cos(a, b):
        a, b = np.array(a), np.array(b)
        return float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))

    matched = set()
    for tc in centers:
        best = max(cents, key=lambda cid: cos(cents[cid], tc))
        assert cos(cents[best], tc) > 0.999
        matched.add(best)
    assert matched == {0, 1, 2}

    # assignment is pure: every vector goes to the centroid nearest it
    vecs = emb.selectExpr("vec_id as vid", "cast(embedding as array<double>) as v")
    assigned = {
        r["vid"]: r["cent_id"]
        for r in assign_clusters(
            vecs, cb.select("cent_id", "centroid")
        ).collect()
    }
    for i, v in rows:
        best = max(cents, key=lambda cid: (cos(cents[cid], v), -cid))
        assert assigned[i] == best

    # determinism: second fit is identical
    cb2 = {r["cent_id"]: r["centroid"] for r in kmeans_fit(emb, k=3, iters=4).collect()}
    assert cb2 == cents


def test_ivf_trained_recall(spark):
    """IVF with a trained codebook: results are a subset of the legal
    candidate space and recall@3 vs exact top-k is reasonable on
    clustered data (probing 3 of 8 buckets)."""
    from real_time_trip_processing_spark.functions.kmeans import kmeans_fit
    from real_time_trip_processing_spark.functions.similarity import (
        cosine_topk,
        ivf_topk,
    )
    import numpy as np

    rng = np.random.default_rng(11)
    centers = rng.normal(0, 1, (8, 16))
    rows = [
        (i, (centers[i % 8] + rng.normal(0, 0.05, 16)).tolist())
        for i in range(200)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    queries = emb.filter("vec_id < 5")

    cb = kmeans_fit(emb, k=8, iters=3)
    approx = ivf_topk(emb, queries, k=3, nprobe=3, codebook=cb).collect()
    exact = cosine_topk(emb, queries, k=3).collect()

    ap = {(r["query_id"], r["cand_id"]) for r in approx}
    ex = {(r["query_id"], r["cand_id"]) for r in exact}
    assert len(ap) == len(ex) == 15  # 5 queries × 3
    recall = len(ap & ex) / len(ex)
    assert recall >= 0.8, f"recall {recall}"


def test_connected_components(spark):
    """Min-label propagation: chains collapse to the minimum id,
    singletons stay canonical."""
    from real_time_trip_processing_spark.operators.graph import dedup_canonical

    docs = spark.createDataFrame([(i,) for i in (1, 2, 3, 10, 11, 99)], "doc_id long")
    pairs = spark.createDataFrame([(2, 3), (1, 2), (10, 11)], "a long, b long")
    got = {
        r["doc_id"]: (r["canonical_id"], r["is_canonical"])
        for r in dedup_canonical(docs, pairs).collect()
    }
    assert got == {
        1: (1, True), 2: (1, False), 3: (1, False),
        10: (10, True), 11: (10, False), 99: (99, True),
    }


def test_approx_distinct_accuracy(spark):
    """HLL++ distinct estimate within the configured rsd of exact on
    every day bucket."""
    from real_time_trip_processing_spark.plans import REGISTRY

    sf = "/root/testdata/sf0.01"
    rows = REGISTRY["approx_distinct_users"].builder(spark, sf).collect()
    got = {r["pickup_date"]: r for r in rows}
    exact = {
        r["pickup_date"]: r["users"]
        for r in REGISTRY["distinct_daily_users"].builder(spark, sf).collect()
    }
    assert set(got) == set(exact)
    for day, r in got.items():
        assert r["exact_users"] == exact[day], (day, r)
        assert r["hll_ok"], (day, r)


def test_salted_agg_matches_plain(spark):
    """Salted two-level aggregation is semantically identical to the
    plain groupBy on a deliberately skewed frame (99% of rows on one
    key)."""
    import math

    from real_time_trip_processing_spark.operators.skew import salted_agg

    df = spark.range(0, 20_000, 1, 16).select(
        F.when(F.col("id") % 100 < 99, "hot").otherwise("cold").alias("k"),
        (F.col("id") % 997).cast("double").alias("v"),
    )
    got = {
        r["k"]: r
        for r in salted_agg(
            df, ["k"],
            [("v", "sum", "s"), ("v", "count", "c"),
             ("v", "min", "lo"), ("v", "max", "hi"), ("v", "avg", "m")],
            buckets=8,
        ).collect()
    }
    want = {
        r["k"]: r
        for r in df.groupBy("k")
        .agg(F.sum("v").alias("s"), F.count("v").alias("c"),
             F.min("v").alias("lo"), F.max("v").alias("hi"),
             F.avg("v").alias("m"))
        .collect()
    }
    assert set(got) == {"hot", "cold"} == set(want)
    for k in want:
        assert got[k]["c"] == want[k]["c"]
        assert got[k]["lo"] == want[k]["lo"]
        assert got[k]["hi"] == want[k]["hi"]
        assert math.isclose(got[k]["s"], want[k]["s"], rel_tol=1e-12)
        assert math.isclose(got[k]["m"], want[k]["m"], rel_tol=1e-12)


def test_sql_views_parity(spark):
    """SURVEY §7: registered views make every table SQL-addressable —
    the flagship KPI expressed as spark.sql matches the DataFrame plan
    row-for-row."""
    from real_time_trip_processing_spark.plans import REGISTRY
    from real_time_trip_processing_spark.sources.tables import register_views

    sf = "/root/testdata/sf0.001"
    names = register_views(spark, sf)
    assert {"events", "documents", "lineitem"} <= set(names)
    via_sql = spark.sql(
        """
        SELECT date_trunc('day', ts) AS pickup_date,
               SUM(value) AS total_fare, COUNT(event_id) AS trip_count,
               AVG(value) AS average_fare, MAX(value) AS maximum_fare,
               MIN(value) AS minimum_fare
        FROM events GROUP BY 1
        """
    )
    via_df = REGISTRY["kpi_daily"].builder(spark, sf)
    assert sorted(map(tuple, via_sql.collect())) == sorted(
        map(tuple, via_df.collect())
    )


def test_srp_near_dup_subset(spark):
    """SRP-LSH near-dup is exact-verified: every emitted pair (and its
    score) must appear in the exact all-pairs answer, and the buckets
    must recall at least the strongest pairs."""
    from real_time_trip_processing_spark.functions.similarity import (
        embedding_near_dup,
        srp_near_dup,
    )
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    exact = {
        (r["a"], r["b"]): r["score"]
        for r in embedding_near_dup(emb, threshold=0.4).collect()
    }
    got = {
        (r["a"], r["b"]): r["score"]
        for r in srp_near_dup(emb, num_bits=16, bands=8, threshold=0.4).collect()
    }
    assert set(got) <= set(exact)          # no false positives
    for k, v in got.items():
        assert v == exact[k]               # scores are the exact scores
    # the declared production config (6-bit bands) holds the same contract
    got96 = {
        (r["a"], r["b"]): r["score"]
        for r in srp_near_dup(emb, num_bits=96, bands=16, threshold=0.4).collect()
    }
    assert set(got96) <= set(exact)
    for k, v in got96.items():
        assert v == exact[k]
    if exact:
        # the highest-cosine pair collides in some band with high prob
        best = max(exact, key=exact.get)
        assert best in got, f"strongest pair {best} missed by LSH"


def test_srp_signature_impls_agree(spark):
    """The Arrow int64-matmul signature kernel and the JVM
    higher-order-function fallback produce identical (vid, band, bh)
    bucket rows — integer dots are accumulation-order-free, so the two
    impls (and the DuckDB oracle) must agree bit-for-bit."""
    from real_time_trip_processing_spark.functions.similarity import srp_buckets
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    arrow = sorted(map(tuple, srp_buckets(emb, 96, 16, 64, impl="arrow").collect()))
    builtin = sorted(map(tuple, srp_buckets(emb, 96, 16, 64, impl="builtin").collect()))
    assert arrow == builtin
    assert len(arrow) == emb.count() * 16


def test_asof_join_edges(spark):
    """Backward as-of: inclusive ties, no-prior → null, latest wins."""
    from real_time_trip_processing_spark.operators.asof import asof_join

    left = spark.createDataFrame(
        [(1, 1, 100), (2, 1, 205), (3, 2, 50)], "event_id long, u long, t long"
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    right = spark.createDataFrame(
        [(1, 100, 1.0), (1, 200, 2.0), (2, 60, 9.0)], "u long, t long, v double"
    ).withColumn("t", F.timestamp_micros(F.col("t") * 1_000_000))
    right = right.select("u", "t", F.col("t").alias("rt"), F.col("v").alias("rv"))
    out = {r["event_id"]: r for r in
           asof_join(left, right, key="u", ts="t", payload_cols=["rt", "rv"]).collect()}
    assert out[1]["rv"] == 1.0       # tie at t=100 matches (inclusive)
    assert out[2]["rv"] == 2.0       # latest at-or-before 205 is t=200
    assert out[3]["rv"] is None      # u=2 has no right row <= 50


def test_approx_percentiles_rank_error_bounded(spark):
    """Greenwald-Khanna guarantees bounded RANK error (≤ n/accuracy),
    not value error — in a sparse tail the value at rank ± ε can differ
    a lot, so the right assertion is on the estimate's position in the
    sorted stratum. Each estimate must sit within quantile ± (1/acc +
    1/n) of its target rank (the 1/n term absorbs discreteness)."""
    from real_time_trip_processing_spark.plans import REGISTRY
    from real_time_trip_processing_spark.sources import table

    sf_dir = "/root/testdata/sf0.001"
    # the declared query now asserts the guarantee distributed-side;
    # every boolean must come back true
    for r in REGISTRY["approx_fare_percentiles"].builder(spark, sf_dir).collect():
        assert r["p50_ok"] and r["p90_ok"] and r["p99_ok"], r
    # independent driver-side bisect check of the same estimates
    approx = {
        r["event_type"]: r["ps"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.percentile_approx("value", [0.5, 0.9, 0.99], 10000).alias("ps"))
        .collect()
    }
    values = {}
    for row in table(spark, sf_dir, "events").select("event_type", "value").collect():
        values.setdefault(row["event_type"], []).append(row["value"])
    assert set(approx) == set(values)
    for et, vs in values.items():
        vs.sort()
        n = len(vs)
        for q, est in zip([0.5, 0.9, 0.99], approx[et]):
            import bisect

            lo = bisect.bisect_left(vs, est) / n
            hi = bisect.bisect_right(vs, est) / n
            slack = 1.0 / 10000 + 1.0 / n
            assert lo - slack <= q <= hi + slack, (et, q, est, lo, hi, n)


def test_compact_parquet_dir(spark, tmp_path):
    """Compaction: 64 tiny files rewritten into the computed target
    count with byte-identical content; clustered mode additionally
    range-sorts so each output file covers a disjoint key range."""
    from real_time_trip_processing_spark.operators.maintenance import (
        compact_parquet_dir,
        dir_bytes,
    )
    from real_time_trip_processing_spark.sources import table

    src = str(tmp_path / "small_files")
    events = table(spark, "/root/testdata/sf0.001", "events")
    events.repartition(64).write.parquet(src)
    n_small = len([p for p in (tmp_path / "small_files").glob("*.parquet")])
    assert n_small == 64

    # target sized so everything fits in ONE file
    dst = str(tmp_path / "compacted")
    n = compact_parquet_dir(spark, src, dst, target_file_bytes=dir_bytes(spark, src) + 1)
    assert n == 1
    assert len([p for p in (tmp_path / "compacted").glob("*.parquet")]) == 1
    assert spark.read.parquet(dst).orderBy("event_id").collect() == \
        events.orderBy("event_id").collect()

    # clustered rewrite: 4 files, disjoint user_id ranges
    dst2 = str(tmp_path / "clustered")
    n2 = compact_parquet_dir(
        spark, src, dst2,
        target_file_bytes=max(1, dir_bytes(spark, src) // 4),
        cluster_by=["user_id"],
    )
    assert n2 >= 4
    per_file = (
        spark.read.parquet(dst2)
        .groupBy(F.input_file_name().alias("f"))
        .agg(F.min("user_id").alias("lo"), F.max("user_id").alias("hi"))
        .collect()
    )
    spans = sorted((r["lo"], r["hi"]) for r in per_file)
    for (prev_lo, prev_hi), (lo, hi) in zip(spans, spans[1:]):
        assert prev_hi <= lo  # disjoint (boundary value may repeat)


def test_zorder_two_dim_pruning(spark, tmp_path):
    """Z-order clustering: on a 64×64 uniform grid rewritten into ~16
    files, a selective filter on EITHER dimension intersects only a
    fraction of the files' min/max spans — single-column clustering can
    only ever prune its leading column."""
    from real_time_trip_processing_spark.operators.maintenance import (
        dir_bytes,
        zorder_parquet_dir,
    )

    src = str(tmp_path / "grid")
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"),
        (F.col("id") / 64).cast("long").alias("y"),
        F.col("id").alias("payload"),
    )
    grid.coalesce(1).write.parquet(src)

    dst = str(tmp_path / "zordered")
    n = zorder_parquet_dir(
        spark, src, dst,
        zorder_by=["x", "y"],
        target_file_bytes=max(1, dir_bytes(spark, src) // 16),
    )
    assert n >= 8
    out = spark.read.parquet(dst)
    assert out.count() == 64 * 64

    per_file = (
        out.groupBy(F.input_file_name().alias("f"))
        .agg(
            F.min("x").alias("x_lo"), F.max("x").alias("x_hi"),
            F.min("y").alias("y_lo"), F.max("y").alias("y_hi"),
        )
        .collect()
    )
    n_files = len(per_file)
    for dim in ("x", "y"):
        # files whose [min,max] span intersects the narrow band [0, 7]
        touching = [
            r for r in per_file if r[f"{dim}_lo"] <= 7 and r[f"{dim}_hi"] >= 0
        ]
        assert len(touching) <= n_files // 2, (
            f"{dim}-band filter touches {len(touching)}/{n_files} files"
        )


def test_dedup_priority_source_preference(spark):
    """Among exact duplicates the lowest (priority, id) row survives
    and carries the duplicate-group size; unique docs pass through
    with dup_count=1."""
    from real_time_trip_processing_spark.operators.dedup import dedup_priority

    rows = [
        (1, "Same Text ", 5),   # dup group (normalized) — worst priority
        (2, "same text", 1),    # survivor: priority 1
        (3, "  SAME TEXT", 1),  # same priority, higher id → loses
        (4, "unique", 9),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, pri int")
    got = {r["doc_id"]: r for r in dedup_priority(df, "pri").collect()}
    assert set(got) == {2, 4}
    assert got[2]["dup_count"] == 3 and got[2]["pri"] == 1
    assert got[4]["dup_count"] == 1


def test_pq_encode_deterministic_and_bounded(spark):
    """PQ encoding: codes are deterministic for a fixed codebook and
    every code addresses a real codebook entry."""
    from real_time_trip_processing_spark.functions.pq import pq_encode, pq_train
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    books = pq_train(emb, m=8, k=16, iters=1)
    a = {r["cand_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    b = {r["cand_id"]: list(r["codes"]) for r in pq_encode(emb, books).collect()}
    assert a == b
    assert len(a) == emb.count()
    for codes in a.values():
        assert len(codes) == 8
        assert all(0 <= c < 16 for c in codes)


def test_pq_adc_quality(spark):
    """ADC top-3 against exact top-10: the declared contract's stronger
    measured form — every probe's approximate top-3 shares >=2 members
    with the exact top-10."""
    from real_time_trip_processing_spark.functions.pq import (
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from real_time_trip_processing_spark.functions.similarity import cosine_topk
    from real_time_trip_processing_spark.sources import table
    from collections import defaultdict

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    books = pq_train(emb, m=32, k=16, iters=2)
    adc = pq_adc_topk(pq_encode(emb, books), queries, books, k=3).collect()
    exact10 = defaultdict(set)
    for r in cosine_topk(emb, queries, k=10).collect():
        exact10[r["query_id"]].add(r["cand_id"])
    hits = defaultdict(int)
    n_res = defaultdict(int)
    for r in adc:
        n_res[r["query_id"]] += 1
        if r["cand_id"] in exact10[r["query_id"]]:
            hits[r["query_id"]] += 1
    assert set(n_res) == set(exact10)
    for q in exact10:
        assert n_res[q] == 3
        assert hits[q] >= 2, (q, dict(hits))


def test_ivfpq_scores_match_full_scan(spark):
    """IVF-PQ is pure pruning on top of PQ: every (query, cand) pair it
    returns carries the IDENTICAL ADC score as the full-scan
    pq_adc_topk, and each probe yields exactly k ranked results."""
    from real_time_trip_processing_spark.functions.pq import (
        ivfpq_topk,
        pq_adc_topk,
        pq_encode,
        pq_train,
    )
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 3)
    books = pq_train(emb, m=8, k=16, iters=1)
    full = {
        (r["query_id"], r["cand_id"]): r["score"]
        for r in pq_adc_topk(
            pq_encode(emb, books), queries, books, k=100
        ).collect()
    }
    ivf = ivfpq_topk(emb, queries, books, k=3, n_centroids=8, nprobe=4).collect()
    per_q = {}
    for r in ivf:
        per_q.setdefault(r["query_id"], []).append(r["rank"])
        assert full[(r["query_id"], r["cand_id"])] == r["score"]
    for q, ranks in per_q.items():
        assert sorted(ranks) == [1, 2, 3]
    assert len(per_q) == 3


def test_random_projection_matches_numpy(spark):
    import numpy as np

    from real_time_trip_processing_spark.functions.similarity import (
        SRP_QUANT,
        random_projection,
        srp_signs,
    )

    rng = [[(i * 7 + j * 3) % 11 / 10.0 - 0.5 for j in range(16)] for i in range(6)]
    df = spark.createDataFrame(
        [(i, v) for i, v in enumerate(rng)], "vec_id long, embedding array<double>"
    )
    out = random_projection(df, dim_out=4, dim=16)
    got = {(r["vec_id"], r["dim"]): r["proj"] for r in out.collect()}
    planes = np.array(srp_signs(4, 16), dtype=np.int64)
    m = np.array(rng) * SRP_QUANT
    q = (np.sign(m) * np.floor(np.abs(m) + 0.5)).astype(np.int64)
    want = q @ planes.T
    assert len(got) == 6 * 4
    for i in range(6):
        for d in range(4):
            assert got[(i, d)] == want[i, d]


def test_bigram_rows_window_edges(spark):
    from real_time_trip_processing_spark.functions.text import bigram_rows

    df = spark.createDataFrame(
        [(1, "a b c"), (2, "solo"), (3, "  x   y  ")],
        "doc_id long, text string",
    )
    got = {(r["doc"], r["w1"], r["w2"]) for r in bigram_rows(df).collect()}
    assert got == {(1, "a", "b"), (1, "b", "c"), (3, "x", "y")}


def test_table_diff_statuses(spark):
    from real_time_trip_processing_spark.operators.sets import table_diff

    old = spark.createDataFrame(
        [(1, "a", 10), (2, "b", 20), (3, "c", 30), (4, None, 40)],
        "k long, v string, n long",
    )
    new = spark.createDataFrame(
        [(2, "b", 20), (3, "CHANGED", 30), (4, None, 40), (5, "e", 50)],
        "k long, v string, n long",
    )
    got = {r["k"]: r["status"] for r in table_diff(old, new, "k", ["v", "n"]).collect()}
    # 1 removed, 3 changed, 5 added; 2 same; 4 same (null-safe equality)
    assert got == {1: "removed", 3: "changed", 5: "added"}

    # empty compare_cols degrades to a keys-only add/remove diff
    # instead of crashing at plan build
    keys_only = {r["k"]: r["status"] for r in table_diff(old, new, "k", []).collect()}
    assert keys_only == {1: "removed", 5: "added"}


def test_audio_window_energy_numpy_model(spark):
    """X6 audio: windowed RMS/zero-crossing/peak over int16 PCM matches
    the numpy model; odd trailing byte is dropped; windows fan out
    inside the Arrow batch."""
    import numpy as np

    from real_time_trip_processing_spark.functions.multimodal import (
        audio_window_energy,
    )

    pcm = np.array([100, -100, 200, -200, 300, 0, -50, 7, 9], dtype="<i2")
    payload = pcm.tobytes() + b"\x01"  # odd trailing byte must be ignored
    assets = spark.createDataFrame(
        [(1, bytearray(payload), "application/x-fake")],
        "doc_id long, media binary, media_type string",
    )
    rows = {r["win_idx"]: r for r in audio_window_energy(assets, 4, 4).collect()}
    w0 = pcm[:4].astype("float64")
    assert rows[0]["n_samples"] == 4
    assert abs(rows[0]["rms"] - float(np.sqrt((w0 * w0).mean()))) < 1e-12
    assert rows[0]["zero_crossings"] == 3
    assert rows[0]["peak"] == 200
    w1 = pcm[4:8].astype("float64")
    assert rows[1]["peak"] == 300
    assert abs(rows[1]["rms"] - float(np.sqrt((w1 * w1).mean()))) < 1e-12
    assert rows[2]["n_samples"] == 1 and rows[2]["peak"] == 9


def test_point_in_time_join_no_future_leakage(spark):
    from real_time_trip_processing_spark.operators.joins import point_in_time_join

    dim = spark.createDataFrame(
        [
            (1, "bronze", 0, 10),
            (1, "gold", 10, None),
            (2, "silver", 5, None),
        ],
        "user_id long, state string, valid_from long, valid_to long",
    )
    facts = spark.createDataFrame(
        [(100, 1, 3), (101, 1, 10), (102, 1, 99), (103, 2, 7)],
        "event_id long, user_id long, ts long",
    )
    got = {r["event_id"]: r["state"]
           for r in point_in_time_join(facts, dim, "user_id").collect()}
    # ts=3 → bronze; ts=10 lands in the NEW interval (half-open); ts=99
    # → open tail; user 2 before valid_from=5 would not match (none here)
    assert got == {100: "bronze", 101: "gold", 102: "gold", 103: "silver"}


def test_point_in_time_join_excludes_pre_history(spark):
    from real_time_trip_processing_spark.operators.joins import point_in_time_join

    dim = spark.createDataFrame(
        [(1, "a", 10, None)], "user_id long, state string, valid_from long, valid_to long"
    )
    facts = spark.createDataFrame(
        [(1, 1, 5)], "event_id long, user_id long, ts long"
    )
    assert point_in_time_join(facts, dim, "user_id").count() == 0
    # left variant keeps the unmatched fact with NULL dimension state
    left = point_in_time_join(facts, dim, "user_id", how="left").collect()
    assert len(left) == 1 and left[0]["state"] is None


def test_fuzzy_pairs_blocking_and_verify(spark):
    from real_time_trip_processing_spark.functions.text import fuzzy_pairs

    df = spark.createDataFrame(
        [
            (1, "hello world one"),
            (2, "hello world onX"),      # same block, dist 1 → pair
            (3, "hello world completely different tail making it longer"),  # other length bucket
            (4, "goodbye world one"),    # different prefix block
        ],
        "doc_id long, text string",
    )
    got = {(r["a"], r["b"]): r["dist"] for r in fuzzy_pairs(df, max_dist=5).collect()}
    assert got == {(1, 2): 1}


def test_ivf_arrow_matches_builtin(spark):
    """The fused-scan Arrow IVF (assignment + probe filter + scoring in
    one kernel) must be bit-identical to the Python-free JVM flavor
    (row-local assignment fold, broadcast probe join, interpreted
    scoring) — integer-exact quantized math makes equality exact, not
    approximate."""
    from real_time_trip_processing_spark.functions.similarity import ivf_topk
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, ivf_topk(emb, queries, k=3, nprobe=4, impl="arrow").collect()))
    b = sorted(map(tuple, ivf_topk(emb, queries, k=3, nprobe=4, impl="builtin").collect()))
    assert a == b
    assert len(a) == 15


def test_cosine_topk_arrow_matches_builtin(spark):
    from real_time_trip_processing_spark.functions.similarity import cosine_topk
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    a = sorted(map(tuple, cosine_topk(emb, queries, k=4, impl="arrow").collect()))
    b = sorted(map(tuple, cosine_topk(emb, queries, k=4, impl="builtin").collect()))
    assert a == b
    assert len(a) == 20


def test_srp_near_dup_arrow_matches_builtin(spark):
    """Fused bucket-kernel flavor (long band hashes, vectorized
    singleton pruning) vs the bucket-self-join flavor: same pairs, same
    scores, bit-for-bit."""
    from real_time_trip_processing_spark.functions.similarity import srp_near_dup
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, srp_near_dup(emb, 96, 16, 0.4, impl="arrow").collect()))
    b = sorted(map(tuple, srp_near_dup(emb, 96, 16, 0.4, impl="builtin").collect()))
    assert a == b
    assert len(a) > 0


def test_random_projection_arrow_matches_builtin(spark):
    """int64-matmul JL kernel vs the interpreted JVM fold: exact
    integer dots make proj identical by construction; y (the rounded
    JL coordinate) must also agree — pins the numpy half-away-from-zero
    replication of Spark/DuckDB ROUND."""
    from real_time_trip_processing_spark.functions.similarity import random_projection
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    a = sorted(map(tuple, random_projection(emb, impl="arrow").collect()))
    b = sorted(map(tuple, random_projection(emb, impl="builtin").collect()))
    assert a == b
    assert len(a) == emb.count() * 8


def test_kpi_state_merge_exact_and_order_invariant(spark):
    """The mergeable-KPI algebra: any batch split, any merge order,
    EXACTLY the full-recompute result (decimal accumulator — a double
    sum would drift at the last ulp)."""
    from real_time_trip_processing_spark.operators import aggregates as A
    from real_time_trip_processing_spark.sources import table

    ev = table(spark, "/root/testdata/sf0.001", "events").select(
        "event_id", "ts", "value"
    )
    full = sorted(map(tuple, A.kpi_from_state(A.kpi_state(ev)).collect()))
    parts = [A.kpi_state(ev.filter(F.col("event_id") % 3 == i)) for i in range(3)]
    merged = sorted(
        map(tuple, A.kpi_from_state(A.merge_kpi_states(*parts)).collect())
    )
    merged_rev = sorted(
        map(tuple, A.kpi_from_state(A.merge_kpi_states(*reversed(parts))).collect())
    )
    assert merged == full
    assert merged_rev == full


def test_srp_and_topk_kernels_survive_tiny_arrow_batches(spark):
    """Force pathological Arrow batching (5 rows/batch) so buckets span
    batch boundaries and per-batch local top-k runs dozens of times:
    the carry-buffer stitching in srp_near_dup and the local-top-k
    merge argument in cosine_topk must still produce bit-identical
    results."""
    from real_time_trip_processing_spark.functions.similarity import (
        cosine_topk, srp_near_dup,
    )
    from real_time_trip_processing_spark.sources import table

    key = "spark.sql.execution.arrow.maxRecordsPerBatch"
    old = spark.conf.get(key, None)
    try:
        spark.conf.set(key, "5")
        emb = table(spark, "/root/testdata/sf0.001", "embeddings")
        queries = emb.filter(F.col("vec_id") < 5)
        a = sorted(map(tuple, srp_near_dup(emb, 96, 16, 0.4, impl="arrow").collect()))
        t = sorted(map(tuple, cosine_topk(emb, queries, k=4, impl="arrow").collect()))
    finally:
        if old is not None:
            spark.conf.set(key, old)
        else:
            spark.conf.unset(key)
    b = sorted(map(tuple, srp_near_dup(emb, 96, 16, 0.4, impl="builtin").collect()))
    u = sorted(map(tuple, cosine_topk(emb, queries, k=4, impl="builtin").collect()))
    assert a == b
    assert t == u


def test_shingle_rows_arrow_matches_builtin(spark):
    """Row-local kernel shingling vs the window flavor: identical
    (doc, sh) multiset — including short docs (single truncated gram),
    empty and whitespace-only texts."""
    from real_time_trip_processing_spark.functions.text import shingle_rows

    df = spark.createDataFrame(
        [(1, "a b c d e"), (2, "x y"), (3, ""), (4, "   "), (5, "only"),
         (6, "w1 w2 w3")],
        "doc_id long, text string",
    )
    for n in (1, 3, 8):
        a = sorted(map(tuple, shingle_rows(df, n, impl="arrow").collect()))
        b = sorted(map(tuple, shingle_rows(df, n, impl="builtin").collect()))
        assert a == b, (n, a, b)


def test_shingle_count_rows_matches_shingle_rows_counts(spark):
    """Round-11: the map-side within-doc-collapsed counter
    (`shingle_count_rows`, the single-exchange core of
    `repeated_ngrams`) must agree with `shingle_rows` grouped by
    (doc, sh) — same gram universe (short docs' truncated gram,
    empty/whitespace texts, null texts dropped) and exact per-(doc, sh)
    occurrence counts, with every output row globally unique."""
    from real_time_trip_processing_spark.functions.text import (
        shingle_count_rows,
        shingle_rows,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e a b c"), (2, "x y"), (3, ""), (4, "   "),
         (5, "only"), (6, "w1 w2 w3 w1 w2 w3 w1 w2 w3"), (7, None)],
        "doc_id long, text string",
    )
    for n in (1, 3, 8):
        want = {}
        for doc, sh in map(tuple, shingle_rows(df, n).collect()):
            want[(doc, sh)] = want.get((doc, sh), 0) + 1
        rows = shingle_count_rows(df, n).collect()
        got = {(r.doc, r.sh): r.occ for r in rows}
        assert len(rows) == len(got), (n, "duplicate (doc, sh) rows")
        assert got == want, (n, got, want)


def test_shingle_set_rows_flavors_match_shingle_rows(spark):
    """Round-11: the map-side distinct-postings builder
    (`shingle_set_rows`, the inverted-index core's new shape) must
    agree with `shingle_rows(...).dropDuplicates` in BOTH impls —
    same (doc, sh) set, plus a correct per-doc distinct count and
    null-text docs dropped (the window flavor's posexplode behavior,
    which the arrow/builtin kernels must mirror explicitly)."""
    from real_time_trip_processing_spark.functions.text import (
        shingle_rows,
        shingle_set_rows,
    )

    df = spark.createDataFrame(
        [(1, "a b c d e a b c"), (2, "x y"), (3, ""), (4, "   "),
         (5, "only"), (6, "w1 w2 w3 w1 w2 w3 w1 w2 w3"), (7, None)],
        "doc_id long, text string",
    )
    for n in (1, 3, 8):
        want = sorted(
            map(
                tuple,
                shingle_rows(df, n)
                .dropDuplicates(["doc", "sh"])
                .collect(),
            )
        )
        sizes = {}
        for doc, _sh in want:
            sizes[doc] = sizes.get(doc, 0) + 1
        for impl in ("arrow", "builtin"):
            rows = shingle_set_rows(df, n, impl=impl).collect()
            got = sorted((r.doc, r.sh) for r in rows)
            assert got == want, (impl, n, got, want)
            assert all(r.sz == sizes[r.doc] for r in rows), (impl, n)


def test_persisted_ivf_index_prunes_partitions(spark, tmp_path):
    """The persisted-index story the IVF docstrings promise, executed:
    the assigned corpus written partitioned by cent_id is THE index,
    and a probe's bucket filter becomes scan-level partition pruning —
    a probed query reads only its nprobe directories, and scoring a
    probed bucket returns exactly the rows assignment put there."""
    from real_time_trip_processing_spark.functions.similarity import (
        _resolve_centroids, nearest_centroid_kernel,
    )
    from real_time_trip_processing_spark.sources import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    rows = _resolve_centroids(emb, None, 8, "vec_id", "embedding")
    assigned = emb.select(
        "vec_id",
        F.col("embedding").cast("array<double>").alias("v"),
        nearest_centroid_kernel(rows)(
            F.col("embedding").cast("array<double>")
        ).alias("cent_id"),
    )
    out = str(tmp_path / "ivf_index")
    assigned.write.partitionBy("cent_id").mode("overwrite").parquet(out)

    idx = spark.read.parquet(out)
    probed = idx.filter(F.col("cent_id").isin(1, 3))
    plan = probed._sc._jvm.PythonSQLUtils.explainString(
        probed._jdf.queryExecution(), "formatted"
    )
    assert "PartitionFilters" in plan and "cent_id" in plan
    # pruned read returns exactly the assignment's rows for those cells
    expect = assigned.filter(F.col("cent_id").isin(1, 3)).count()
    assert probed.count() == expect > 0
    # a cell that got no vectors prunes to zero files
    empty_cells = set(range(8)) - {
        r["cent_id"] for r in idx.select("cent_id").distinct().collect()
    }
    if empty_cells:
        c = next(iter(empty_cells))
        assert idx.filter(F.col("cent_id") == c).count() == 0


def test_gap_fill_daily_fills_gaps_and_flags(spark):
    """Gap days inherit the previous day's LAST value (ts then event_id
    tiebreak); observed marks real rows; spans are per-key."""
    import datetime as dt

    from real_time_trip_processing_spark.operators.asof import gap_fill_daily

    T = dt.datetime
    rows = [
        # user 1: day 1 has two events (later one wins), day 3 observed
        Row(event_id=1, ts=T(2024, 1, 1, 9), user_id=1, value=10.0),
        Row(event_id=2, ts=T(2024, 1, 1, 18), user_id=1, value=20.0),
        Row(event_id=3, ts=T(2024, 1, 3, 12), user_id=1, value=30.0),
        # user 2: single day — spine must not extend to user 1's span
        Row(event_id=4, ts=T(2024, 2, 5, 1), user_id=2, value=7.0),
        # exact-ts tie: higher event_id wins
        Row(event_id=6, ts=T(2024, 2, 5, 1), user_id=2, value=9.0),
    ]
    out = gap_fill_daily(spark.createDataFrame(rows)).collect()
    got = {(r.user_id, r.day.day): (r.value_filled, r.observed) for r in out}
    assert got[(1, 1)] == (20.0, 1)   # last event of the day wins
    assert got[(1, 2)] == (20.0, 0)   # gap day forward-filled
    assert got[(1, 3)] == (30.0, 1)
    assert got[(2, 5)] == (9.0, 1)    # event_id breaks the exact-ts tie
    assert len(out) == 4              # per-key spans, no cross-key bleed


def test_bloom_semi_join_exact_and_pruning(spark):
    """The Bloom prefilter must (a) never change the exact semi-join
    result, and (b) actually prune: rows surviving the bitmap test are
    a superset of true matches but far fewer than the whole probe."""
    from real_time_trip_processing_spark.operators.joins import (
        bloom_filtered_semi_join,
    )

    probe = spark.range(0, 20000).select(F.col("id").alias("pk"))
    build = spark.range(0, 20000, 397).select(F.col("id").alias("bk"))
    out = bloom_filtered_semi_join(probe, build, "pk", "bk")
    got = sorted(r.pk for r in out.collect())
    exact = sorted(
        r.pk
        for r in probe.join(
            build.select(F.col("bk").alias("pk")), "pk", "left_semi"
        ).collect()
    )
    assert got == exact

    # measure the prefilter alone (the bitmap-test stage, no verify
    # join): survivors must cover every true match yet be a small
    # fraction of the 20k probe — build has 51 keys, so even with Bloom
    # false positives the bitmap should kill >95% of probe rows
    from real_time_trip_processing_spark.operators.joins import (
        _bloom_prefilter,
    )

    survivors = _bloom_prefilter(probe, build, "pk", "bk").count()
    assert len(exact) <= survivors < 1000, survivors

    plan = out._jdf.queryExecution().executedPlan().toString()
    # the bitmap rides as a broadcast nested-loop join of a 1-row frame
    assert "BroadcastNestedLoopJoin" in plan
    # false-positive audit: run the operator with a build side whose
    # keys are disjoint from the probe — the exact verify must yield 0
    # even though the bloom may pass a few false positives
    disjoint = spark.range(10**9, 10**9 + 50).select(F.col("id").alias("bk"))
    assert bloom_filtered_semi_join(probe, disjoint, "pk", "bk").count() == 0


def test_ann_join_ivf_flavors_bit_equal(spark):
    """The cogroup bucket-matmul flavor and the pair-join flavor must
    emit identical rows (quantized integer math — no accumulation
    drift axis)."""
    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf,
    )
    from real_time_trip_processing_spark.sources.tables import table

    emb = table(spark, "/root/testdata/sf0.001", "embeddings")
    corpus = emb.filter(F.col("vec_id") % 2 == 0)
    qs = emb.filter(F.col("vec_id") % 2 == 1)
    cb = corpus.filter(F.col("vec_id") < 32).select(
        F.col("vec_id").alias("cent_id"),
        F.col("embedding").alias("centroid"),
    )
    a = ann_join_ivf(corpus, qs, k=3, nprobe=4, codebook=cb, impl="cogroup")
    b = ann_join_ivf(corpus, qs, k=3, nprobe=4, codebook=cb, impl="pairs")
    assert a.exceptAll(b).count() == 0 and b.exceptAll(a).count() == 0
    assert a.count() > 0


def test_ann_join_ivf_salted_hot_bucket_bit_equal(spark):
    """A hot centroid (here ~40% of the corpus clusters around one
    codebook direction) would land on ONE cogroup worker; max_bucket
    must split it into hash-salted sub-buckets WITHOUT changing a row —
    every (query, candidate) pair still meets exactly once and the
    final window merges sub-bucket top-ks."""
    import math

    from pyspark.sql import Row as R

    from real_time_trip_processing_spark.functions.similarity import (
        ann_join_ivf,
        nearest_centroid_kernel,
    )

    dim = 8
    rows = []
    for i in range(600):
        if i % 5 < 2:  # 40%: clustered near e0 (the hot centroid)
            v = [1.0] + [0.01 * ((i * 7 + j) % 5 - 2) for j in range(dim - 1)]
        else:  # spread across the other axes
            v = [0.0] * dim
            v[1 + (i % (dim - 1))] = 1.0
            v[(i * 3) % dim] += 0.1
        rows.append(R(vec_id=i, embedding=v))
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cb = [(c, [1.0 if j == c else 0.0 for j in range(dim)]) for c in range(4)]
    corpus = df.filter(F.col("vec_id") % 3 != 0)
    qs = df.filter(F.col("vec_id") % 3 == 0)

    plain = ann_join_ivf(corpus, qs, k=3, nprobe=2, codebook=cb,
                         impl="cogroup")
    salted = ann_join_ivf(corpus, qs, k=3, nprobe=2, codebook=cb,
                          impl="cogroup", max_bucket=40)
    assert plain.exceptAll(salted).count() == 0
    assert salted.exceptAll(plain).count() == 0
    assert salted.count() > 0

    # the skew is real, and the salt bounds sub-bucket width
    assign = nearest_centroid_kernel(cb)
    sizes = {
        r["cent_id"]: r["n"]
        for r in corpus.select(assign(F.col("embedding")).alias("cent_id"))
        .groupBy("cent_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    hot = max(sizes.values())
    assert hot > 2 * 40, sizes  # one bucket far over max_bucket
    widths = (
        corpus.select(
            F.col("vec_id").alias("cand_id"),
            assign(F.col("embedding")).alias("cent_id"),
        )
        .withColumn(
            "_salt",
            F.pmod(
                F.xxhash64("cand_id"),
                F.lit(math.ceil(hot / 40)),
            ).cast("int"),
        )
        .groupBy("cent_id", "_salt")
        .agg(F.count(F.lit(1)).alias("n"))
        .filter(F.col("cent_id") == max(sizes, key=sizes.get))
        .collect()
    )
    assert max(r["n"] for r in widths) <= int(40 * 1.6), widths


def test_gap_fill_null_valued_day_still_observed(spark):
    """A day whose last event carries a NULL value is an OBSERVED day
    (join-marker semantics); its value forward-fills past the null."""
    import datetime as dt

    from real_time_trip_processing_spark.operators.asof import gap_fill_daily

    T = dt.datetime
    rows = [
        Row(event_id=1, ts=T(2024, 1, 1, 9), user_id=1, value=5.0),
        Row(event_id=2, ts=T(2024, 1, 2, 9), user_id=1, value=None),
        Row(event_id=3, ts=T(2024, 1, 4, 9), user_id=1, value=7.0),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts timestamp, user_id long, value double")
    got = {(r.day.day): (r.value_filled, r.observed) for r in gap_fill_daily(df).collect()}
    assert got[1] == (5.0, 1)
    assert got[2] == (5.0, 1)   # observed day, null value — fill skips it
    assert got[3] == (5.0, 0)   # true gap day
    assert got[4] == (7.0, 1)


def test_shingle_rows_arrow_java_whitespace(spark):
    """The Arrow shingle kernel must tokenize with the JVM's EXACT
    semantics (round-6 review): SQL trim strips only spaces — a leading
    tab keeps its empty first token — and Java \\s is the ASCII class,
    so NBSP stays inside a token. A bare Python strip()/Unicode \\s
    kernel silently diverges the shingle multiset between the two
    documented impl dials on exactly these inputs."""
    from real_time_trip_processing_spark.functions.text import shingle_rows

    docs = spark.createDataFrame(
        [
            (1, "\tA B C"),          # leading tab: empty first token
            (2, "A B C D"),     # NBSP: NOT a separator in Java \s
            (3, "F\x0bG H I"),       # vertical tab: IS a separator
            (4, "  x y z  "),        # spaces: trimmed both sides
        ],
        "doc_id long, text string",
    )
    builtin = sorted(
        map(tuple, shingle_rows(docs, 3, impl="builtin").collect())
    )
    arrow = sorted(map(tuple, shingle_rows(docs, 3, impl="arrow").collect()))
    assert builtin == arrow
    # and the NBSP really stayed inside one token
    assert any("A B" in sh for _, sh in builtin)


def test_ngram_decontaminate_arrow_builtin_agree_on_whitespace(spark):
    """Same parity for the fused decontamination kernel: the bench gram
    set is built with Catalyst shingles(), the corpus side in Python —
    tab/NBSP corpora must produce identical n_hits on both impls."""
    from real_time_trip_processing_spark.functions.curation import (
        ngram_decontaminate,
    )
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [
            (1, "\tq w e r t"),           # bench doc with a leading tab
            (2, "\tq w e r t"),           # contaminated twin
            (3, "a b c d e"),        # bench doc with NBSP token
            (4, "a b c d e"),        # contaminated twin
            (5, "clean doc nothing here"),
        ],
        "doc_id long, text string",
    )
    pred = F.col("doc_id").isin([1, 3])
    got_a = sorted(
        map(tuple, ngram_decontaminate(docs, pred, n=4, impl="arrow").collect())
    )
    got_b = sorted(
        map(
            tuple,
            ngram_decontaminate(docs, pred, n=4, impl="builtin").collect(),
        )
    )
    assert got_a == got_b
    assert {d for d, _ in got_a} == {2, 4}  # both twins caught


def test_join_multiway_shared_key_name_keeps_fact_key(spark):
    """Round-6 review: drop-by-name after a fact-dim join removed BOTH
    copies of a shared key name (the normal star-schema case), deleting
    the join key from the output; the dim-side column must be dropped
    by reference."""
    from real_time_trip_processing_spark.operators.joins import join_multiway

    fact = spark.createDataFrame(
        [(1, 10.0), (2, 20.0)], "vendor_id long, amount double"
    )
    dim = spark.createDataFrame(
        [(1, "acme"), (2, "globex")], "vendor_id long, vendor_name string"
    )
    out = join_multiway(fact, [(dim, "vendor_id", "vendor_id")])
    assert "vendor_id" in out.columns
    got = {(r["vendor_id"], r["vendor_name"]) for r in out.collect()}
    assert got == {(1, "acme"), (2, "globex")}


def test_scd2_history_null_state_runs(spark):
    """Round-6 review: a NULL state is a real state run. The null-unsafe
    `prev != state` silently dropped every NULL-state transition and
    emitted adjacent same-state duplicate intervals around it."""
    from real_time_trip_processing_spark.operators.scd import scd2_history

    ev = spark.createDataFrame(
        [
            ("k", "A", 1, 1),
            ("k", None, 2, 2),
            ("k", "A", 3, 3),
        ],
        "user_id string, event_type string, ts long, event_id long",
    )
    out = sorted(
        (
            (r["state"], r["valid_from"], r["valid_to"])
            for r in scd2_history(ev).collect()
        ),
        key=lambda t: t[1],
    )
    assert out == [("A", 1, 2), (None, 2, 3), ("A", 3, None)]


def test_asof_join_ignores_null_ts_right_rows(spark):
    """Round-6 review: a NULL-ts right row sorts before everything and
    rode the running last() as a bogus 'before all time' payload; ASOF
    semantics (left.ts >= right.ts) can never match it."""
    from real_time_trip_processing_spark.operators.asof import asof_join

    left = spark.createDataFrame([("k", 5)], "key string, ts long")
    right = spark.createDataFrame(
        [("k", None, "X"), ("k", 10, "Y")],
        "key string, ts long, payload string",
    )
    out = asof_join(left, right, "key", "ts", ["payload"]).collect()
    assert len(out) == 1 and out[0]["payload"] is None  # no match at all


def test_connected_components_raises_on_nonconvergence(spark):
    """Round-6 review: exhausting max_iter used to return silently
    UNCONVERGED labels — one component split into several, duplicates
    surviving dedup with no signal. Now it fails loudly."""
    import pytest

    from real_time_trip_processing_spark.operators.graph import (
        connected_components,
    )

    chain = spark.createDataFrame(
        [(i, i + 1) for i in range(8)], "a long, b long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(chain, max_iter=2).collect()
    ok = connected_components(chain, max_iter=10)
    assert {r["component"] for r in ok.collect()} == {0}


def test_expire_partitions_hive_escaped_values(spark, tmp_path):
    """Round-6 review: partition directory names are Hive-escaped on
    disk (':' -> %3A); comparing raw keep_values against escaped names
    deleted partitions the caller asked to KEEP."""
    from real_time_trip_processing_spark.operators.maintenance import (
        expire_partitions,
    )

    lake = str(tmp_path / "lake")
    df = spark.createDataFrame(
        [("2024-01-01 00:00:00", 1), ("2024-01-02 00:00:00", 2)],
        "stamp string, v long",
    )
    df.write.partitionBy("stamp").parquet(lake)
    dropped = expire_partitions(
        spark, lake, "stamp", ["2024-01-01 00:00:00"]
    )
    assert dropped == 1
    back = spark.read.parquet(lake)
    # partition inference reads the kept value back as a timestamp
    assert [str(r["stamp"]) for r in back.collect()] == ["2024-01-01 00:00:00"]


def test_delete_keys_drops_escaped_doomed_partition(spark, tmp_path):
    """Round-6 review twin: a fully-doomed partition whose value needs
    Hive escaping must have its directory deleted (the unescaped path
    never existed, so the files holding exactly the erased keys
    survived silently)."""
    import os

    from real_time_trip_processing_spark.operators.maintenance import (
        delete_keys_from_lake,
    )

    lake = str(tmp_path / "lake2")
    df = spark.createDataFrame(
        [(1, "a:b"), (2, "plain")], "user_id long, city string"
    )
    df.write.partitionBy("city").parquet(lake)
    n = delete_keys_from_lake(spark, lake, "user_id", [1], ["city"])
    assert n == 1
    assert not any("a%3Ab" in d for d in os.listdir(lake))
    assert {r["user_id"] for r in spark.read.parquet(lake).collect()} == {2}


def test_zero_vectors_excluded_from_similarity(spark):
    """Round-6 review: a zero-quantized vector (all |x| below the
    quantization resolution — padding embeddings) has NO cosine
    direction; its score is NaN, which Spark orders GREATEST — the
    builtin flavors ranked it every query's top neighbor / paired it
    with its whole bucket, while the numpy kernels dropped it. Both
    impls now exclude zero vectors consistently."""
    from real_time_trip_processing_spark.functions.similarity import (
        cosine_topk, embedding_near_dup, srp_near_dup,
    )

    rows = [(i, [float(i + 1)] * 8 + [0.0] * 56) for i in range(6)]
    rows.append((99, [0.0] * 64))          # true zero vector
    rows.append((98, [1e-9] * 64))         # quantizes to zero
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")

    for impl in ("builtin", "arrow"):
        top = cosine_topk(
            emb, emb.filter("vec_id < 2"), k=3, impl=impl
        ).collect()
        assert all(r["cand_id"] not in (98, 99) for r in top), impl
        pairs = srp_near_dup(
            emb, num_bits=16, bands=4, threshold=0.5, impl=impl
        ).collect()
        assert all(
            98 not in (r["a"], r["b"]) and 99 not in (r["a"], r["b"])
            for r in pairs
        ), impl
    exact = embedding_near_dup(emb, threshold=0.5).collect()
    assert all(98 not in (r["a"], r["b"]) and 99 not in (r["a"], r["b"])
               for r in exact)
    # empty probe frame: returns empty instead of np.stack crashing
    assert cosine_topk(emb, emb.filter("vec_id < 0"), k=3).count() == 0


def test_has_quant_direction_matches_qdot_filter(spark):
    """The cheap two-scan zero-vector guard must keep EXACTLY the rows
    the exact-arithmetic form ``qdot(quant_vec(v), quant_vec(v)) > 0``
    keeps, including the three-valued-logic edges: NULL array, NULL
    element (even alongside nonzero elements — the integer fold is
    null-dominant), empty array, zero and sub-resolution vectors."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.functions.similarity import (
        has_quant_direction, qdot, quant_vec,
    )

    rows = [
        (0, [1.0, 2.0, 0.0]),      # normal
        (1, [0.0, 0.0, 0.0]),      # true zero
        (2, [1e-9, 1e-9, 1e-9]),   # quantizes to zero
        (3, None),                 # null array
        (4, [None, 5.0, 1.0]),     # null element + nonzero: null-dominant
        (5, [None, 0.0, 0.0]),     # null element, rest zero
        (6, []),                   # empty array
        (7, [-3.5, 0.0, 0.0]),     # negative nonzero
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    fast = {r["vec_id"] for r in
            df.filter(has_quant_direction(F.col("embedding"))).collect()}
    exact = {r["vec_id"] for r in df.filter(
        qdot(quant_vec(F.col("embedding")), quant_vec(F.col("embedding"))) > 0
    ).collect()}
    assert fast == exact == {0, 7}


def test_srp_builtin_honors_bucket_cap(spark):
    """Round-6 review: the builtin fallback silently ignored
    bucket_cap — setting the skew dial changed results between impls
    and left the O(m^2) hot bucket unbounded where the cap was asked
    for. Both flavors drop over-cap buckets identically now."""
    from real_time_trip_processing_spark.functions.similarity import (
        srp_near_dup,
    )

    # a pile of identical vectors lands in one bucket per band
    rows = [(i, [1.0] * 64) for i in range(12)]
    rows += [(100 + i, [float(i + 2)] * 32 + [1.0] * 32) for i in range(4)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    a = sorted(map(tuple, srp_near_dup(
        emb, num_bits=16, bands=4, threshold=0.9, impl="arrow", bucket_cap=4
    ).collect()))
    b = sorted(map(tuple, srp_near_dup(
        emb, num_bits=16, bands=4, threshold=0.9, impl="builtin", bucket_cap=4
    ).collect()))
    assert a == b
    assert not any(r[0] < 100 and r[1] < 100 for r in a)  # capped bucket dropped


def test_pq_train_guards(spark):
    """Round-6 review: pq_train on a corpus smaller than k raised a
    bare IndexError deep in the update loop; and the id column was
    hard-coded 'vec_id' while the search half takes id_col."""
    import pytest

    from real_time_trip_processing_spark.functions.pq import pq_train

    small = spark.createDataFrame(
        [(i, [float(i)] * 64) for i in range(5)],
        "doc_id long, embedding array<double>",
    )
    with pytest.raises(ValueError, match="at least k=16"):
        pq_train(small, id_col="doc_id")
    # and with a compatible k it trains on a doc_id frame at all
    books = pq_train(small, k=4, id_col="doc_id")
    assert len(books) == 8 and len(books[0]) == 4
