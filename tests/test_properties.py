"""Property-based tests (hypothesis) for the core operators.

The reference ships no property tests (SURVEY §5) and its matcher — the
heart of the pipeline — is entirely untested there. These properties
pin the operators against brute-force Python models on randomized
inputs: arbitrary duplicate/missing/out-of-order events for the
matcher, arbitrary corpora for shingle Jaccard, skewed keys for the
salted aggregation.

Each example round-trips through Spark, so example counts are kept
small; the generators bias toward collisions (tiny key domains) to
exercise the interesting paths, not the happy one.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import Row

from real_time_trip_processing_spark.functions.similarity import jaccard_pairs
from real_time_trip_processing_spark.operators.dedup import dedup_keyed
from real_time_trip_processing_spark.operators.joins import match_start_end
from real_time_trip_processing_spark.operators.skew import salted_agg

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)

# tiny domains → lots of duplicate keys, the case that matters
trip_ids = st.integers(min_value=0, max_value=6).map(lambda i: f"t{i}")
seqs = st.integers(min_value=0, max_value=9)

start_events = st.lists(st.tuples(trip_ids, seqs), min_size=0, max_size=15)
end_events = st.lists(st.tuples(trip_ids, seqs), min_size=0, max_size=15)


@settings(**SETTINGS)
@given(starts=start_events, ends=end_events)
def test_matcher_first_match_wins(spark, starts, ends):
    """match_start_end == brute force: one row per trip_id present on
    BOTH sides; the surviving start/end are each the first per key
    (min order column, ties broken arbitrarily but ties can't occur —
    order key is made unique); collision column renamed end_*."""
    s_rows = [
        Row(trip_id=t, pickup_datetime=f"{seq:02d}-{i:03d}", fare=float(i))
        for i, (t, seq) in enumerate(starts)
    ]
    e_rows = [
        Row(trip_id=t, dropoff_datetime=f"{seq:02d}-{i:03d}", fare=float(100 + i))
        for i, (t, seq) in enumerate(ends)
    ]
    s_schema = "trip_id string, pickup_datetime string, fare double"
    e_schema = "trip_id string, dropoff_datetime string, fare double"
    sdf = spark.createDataFrame(s_rows, schema=s_schema)
    edf = spark.createDataFrame(e_rows, schema=e_schema)
    got = {
        r["trip_id"]: r
        for r in match_start_end(sdf, edf, key="trip_id").collect()
    }

    first_start = {}
    for r in sorted(s_rows, key=lambda r: (r.trip_id, r.pickup_datetime)):
        first_start.setdefault(r.trip_id, r)
    first_end = {}
    for r in sorted(e_rows, key=lambda r: (r.trip_id, r.dropoff_datetime)):
        first_end.setdefault(r.trip_id, r)

    expect_keys = set(first_start) & set(first_end)
    assert set(got) == expect_keys
    for t in expect_keys:
        row = got[t]
        assert row["pickup_datetime"] == first_start[t].pickup_datetime
        assert row["dropoff_datetime"] == first_end[t].dropoff_datetime
        assert row["fare"] == first_start[t].fare  # start wins the name
        assert row["end_fare"] == first_end[t].fare  # end renamed
        assert row["status"] == "completed"


@settings(**SETTINGS)
@given(rows=st.lists(st.tuples(trip_ids, seqs, seqs), min_size=0, max_size=20))
def test_dedup_keyed_is_first_per_key_and_idempotent(spark, rows):
    df = spark.createDataFrame(
        [Row(k=t, o=f"{a:02d}-{b:02d}-{i:03d}", payload=i) for i, (t, a, b) in enumerate(rows)],
        schema="k string, o string, payload long",
    )
    out = dedup_keyed(df, ["k"], ["o"])
    got = {r["k"]: (r["o"], r["payload"]) for r in out.collect()}

    expect = {}
    for r in sorted(
        [(t, f"{a:02d}-{b:02d}-{i:03d}", i) for i, (t, a, b) in enumerate(rows)],
        key=lambda x: (x[0], x[1]),
    ):
        expect.setdefault(r[0], (r[1], r[2]))
    assert got == expect
    # idempotence: dedup of the dedup is itself
    again = {r["k"]: (r["o"], r["payload"]) for r in dedup_keyed(out, ["k"], ["o"]).collect()}
    assert again == got


@settings(**SETTINGS)
@given(
    rows=st.lists(
        st.tuples(st.integers(0, 2), st.integers(-50, 50)), min_size=1, max_size=30
    ),
    buckets=st.sampled_from([1, 4, 64]),
)
def test_salted_agg_equals_plain_groupby(spark, rows, buckets):
    """Salting is a pure physical rewrite: sum/count/min/max/avg per key
    must equal the plain groupBy exactly (integer values → no fp
    reassociation concerns for sum; avg checked with tolerance)."""
    df = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in rows], schema="k int, v long"
    )
    out = {
        r["k"]: r
        for r in salted_agg(
            df,
            ["k"],
            [("v", "sum", "s"), ("v", "count", "c"), ("v", "min", "lo"),
             ("v", "max", "hi"), ("v", "avg", "m")],
            buckets=buckets,
        ).collect()
    }
    keys = {k for k, _ in rows}
    assert set(out) == keys
    for k in keys:
        vs = [v for kk, v in rows if kk == k]
        r = out[k]
        assert r["s"] == sum(vs)
        assert r["c"] == len(vs)
        assert r["lo"] == min(vs)
        assert r["hi"] == max(vs)
        assert math.isclose(r["m"], sum(vs) / len(vs), rel_tol=1e-12)


words = st.sampled_from(["alpha", "beta", "gamma", "delta", "eps"])
docs_strategy = st.lists(
    st.lists(words, min_size=1, max_size=8).map(" ".join), min_size=0, max_size=8
)


def _brute_shingles(text: str, n: int) -> set[str]:
    toks = text.strip().split()
    if len(toks) >= n:
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}
    return {" ".join(toks)}


@settings(**SETTINGS)
@given(texts=docs_strategy, threshold=st.sampled_from([0.0, 0.3, 0.7]))
def test_jaccard_pairs_matches_brute_force(spark, texts, threshold):
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["inter"], r["sz_a"], r["sz_b"], r["jaccard"])
        for r in jaccard_pairs(df, n=3, threshold=threshold).collect()
    }

    sets = {i: _brute_shingles(t, 3) for i, t in enumerate(texts)}
    expect = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                union = len(sets[a] | sets[b])
                if union and inter and inter / union >= threshold:
                    expect[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert set(got) == set(expect)
    for pair, (inter, sz_a, sz_b) in expect.items():
        gi, ga, gb, gj = got[pair]
        assert (gi, ga, gb) == (inter, sz_a, sz_b)
        assert gj == pytest.approx(round(inter / (sz_a + sz_b - inter), 8))


@settings(**SETTINGS)
@given(texts=docs_strategy, threshold=st.sampled_from([0.0, 0.5, 0.9]))
def test_containment_pairs_matches_brute_force(spark, texts, threshold):
    from real_time_trip_processing_spark.functions.similarity import (
        containment_pairs,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["inter"], r["sz_a"], r["sz_b"], r["containment"])
        for r in containment_pairs(df, n=3, threshold=threshold).collect()
    }

    sets = {i: _brute_shingles(t, 3) for i, t in enumerate(texts)}
    expect = {}
    for a in sets:
        for b in sets:
            if a < b:
                inter = len(sets[a] & sets[b])
                lo = min(len(sets[a]), len(sets[b]))
                if inter and inter / lo >= threshold:
                    expect[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert set(got) == set(expect)
    for pair, (inter, sz_a, sz_b) in expect.items():
        gi, ga, gb, gc = got[pair]
        assert (gi, ga, gb) == (inter, sz_a, sz_b)
        assert gc == pytest.approx(round(inter / min(sz_a, sz_b), 8))


@settings(**SETTINGS)
@given(texts=docs_strategy, threshold=st.sampled_from([0.0, 0.5, 0.9]))
def test_containment_incremental_matches_brute_force(spark, texts, threshold):
    """Incremental = batch × corpus only (even ids batch, odd corpus):
    every cross-split pair at threshold, no within-split pair, same
    arithmetic as the batch screen."""
    from real_time_trip_processing_spark.functions.similarity import (
        containment_incremental_pairs,
    )

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["inter"], r["sz_a"], r["sz_b"], r["containment"])
        for r in containment_incremental_pairs(
            df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1"),
            n=3, threshold=threshold,
        ).collect()
    }

    sets = {i: _brute_shingles(t, 3) for i, t in enumerate(texts)}
    expect = {}
    for a in sets:
        for b in sets:
            if a % 2 == 0 and b % 2 == 1:
                inter = len(sets[a] & sets[b])
                lo = min(len(sets[a]), len(sets[b]))
                if inter and inter / lo >= threshold:
                    expect[(a, b)] = (inter, len(sets[a]), len(sets[b]))
    assert set(got) == set(expect)
    for pair, (inter, sz_a, sz_b) in expect.items():
        gi, ga, gb, gc = got[pair]
        assert (gi, ga, gb) == (inter, sz_a, sz_b)
        assert gc == pytest.approx(round(inter / min(sz_a, sz_b), 8))


def test_containment_incremental_broadcast_dial_identical(spark):
    """``broadcast_batch=False`` (r11 ADVICE: the escape for ingest
    cycles that outgrow the broadcast cap) must be a pure join-strategy
    change — identical rows to the default broadcast shape, on both the
    plain and the max_df stop-shingle paths."""
    from real_time_trip_processing_spark.functions.similarity import (
        containment_incremental_pairs,
    )

    texts = [
        "a b c d e f g h",
        "a b c d e f g h i j",
        "x y z w v u",
        "a b c x y z w v u t",
        "p q r s t u v w",
    ]
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    batch = df.filter("doc_id % 2 = 0")
    corpus = df.filter("doc_id % 2 = 1")

    def rows(**kw):
        return sorted(
            tuple(r) for r in containment_incremental_pairs(
                batch, corpus, n=3, threshold=0.0, **kw
            ).collect()
        )

    assert rows(broadcast_batch=False) == rows()
    assert rows(broadcast_batch=False, max_df=3) == rows(max_df=3)


@settings(**SETTINGS)
@given(texts=docs_strategy, threshold=st.sampled_from([0.0, 0.3]))
def test_jaccard_pairs_max_df_matches_brute_force(spark, texts, threshold):
    """The stop-shingle flavor (r11 rework: map-side distinct postings +
    shuffled-hash self-join): shingles in more than ``max_df`` docs are
    dropped BEFORE sizes and intersections, so sz_a/sz_b are the
    POST-filter (rare-shingle) counts — pinned against a brute-force
    model with the same semantics."""
    max_df = 2
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["inter"], r["sz_a"], r["sz_b"], r["jaccard"])
        for r in jaccard_pairs(
            df, n=3, threshold=threshold, max_df=max_df
        ).collect()
    }

    sets = {i: _brute_shingles(t, 3) for i, t in enumerate(texts)}
    dfreq: dict[str, int] = {}
    for s in sets.values():
        for sh in s:
            dfreq[sh] = dfreq.get(sh, 0) + 1
    rare = {sh for sh, k in dfreq.items() if k <= max_df}
    fsets = {i: s & rare for i, s in sets.items()}
    expect = {}
    for a in fsets:
        for b in fsets:
            if a < b:
                inter = len(fsets[a] & fsets[b])
                union = len(fsets[a] | fsets[b])
                if inter and inter / union >= threshold:
                    expect[(a, b)] = (inter, len(fsets[a]), len(fsets[b]))
    assert set(got) == set(expect)
    for pair, (inter, sz_a, sz_b) in expect.items():
        gi, ga, gb, gj = got[pair]
        assert (gi, ga, gb) == (inter, sz_a, sz_b)
        assert gj == pytest.approx(round(inter / (sz_a + sz_b - inter), 8))


@settings(**SETTINGS)
@given(texts=docs_strategy, threshold=st.sampled_from([0.0, 0.5]))
def test_containment_incremental_max_df_matches_brute_force(
    spark, texts, threshold
):
    """Stop-shingle flavor of the incremental screen (r11 rework:
    map-side batch postings + broadcast batch side): document frequency
    is measured on the CORPUS postings; the rare-shingle join then
    restricts BOTH sides to rare corpus shingles, so sz_a is
    |A ∩ rare| (batch-only shingles drop out too) and sz_b is
    |B ∩ rare| — the model pins exactly those semantics."""
    from real_time_trip_processing_spark.functions.similarity import (
        containment_incremental_pairs,
    )

    max_df = 2
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    got = {
        (r["a"], r["b"]): (r["inter"], r["sz_a"], r["sz_b"], r["containment"])
        for r in containment_incremental_pairs(
            df.filter("doc_id % 2 = 0"), df.filter("doc_id % 2 = 1"),
            n=3, threshold=threshold, max_df=max_df,
        ).collect()
    }

    sets = {i: _brute_shingles(t, 3) for i, t in enumerate(texts)}
    dfreq: dict[str, int] = {}
    for i, s in sets.items():
        if i % 2 == 1:  # df is corpus-side document frequency
            for sh in s:
                dfreq[sh] = dfreq.get(sh, 0) + 1
    rare = {sh for sh, k in dfreq.items() if k <= max_df}
    fsets = {i: s & rare for i, s in sets.items()}
    expect = {}
    for a in fsets:
        for b in fsets:
            if a % 2 == 0 and b % 2 == 1:
                inter = len(fsets[a] & fsets[b])
                if not inter:
                    continue
                lo = min(len(fsets[a]), len(fsets[b]))
                if inter / lo >= threshold:
                    expect[(a, b)] = (inter, len(fsets[a]), len(fsets[b]))
    assert set(got) == set(expect)
    for pair, (inter, sz_a, sz_b) in expect.items():
        gi, ga, gb, gc = got[pair]
        assert (gi, ga, gb) == (inter, sz_a, sz_b)
        assert gc == pytest.approx(round(inter / min(sz_a, sz_b), 8))


def test_containment_postings_path_equals_corpus_path(spark, tmp_path):
    """The persisted-postings dial: screening against a written-and-
    reread `corpus_postings_index` is row-identical to screening the
    raw corpus (postings are a pure function of content), and passing
    both or neither corpus flavor refuses."""
    from real_time_trip_processing_spark.functions.similarity import (
        containment_incremental_pairs, corpus_postings_index,
    )

    corpus = spark.createDataFrame(
        [Row(doc_id=i, text=" ".join(f"c{i}w{j}" for j in range(12)))
         for i in range(6)]
        + [Row(doc_id=6, text=" ".join(f"q{j}" for j in range(20)))],
        schema="doc_id long, text string",
    )
    batch = spark.createDataFrame(
        # 100: an excerpt of corpus doc 6 (containment 1.0); 101: novel
        [Row(doc_id=100, text=" ".join(f"q{j}" for j in range(5, 13))),
         Row(doc_id=101, text=" ".join(f"n{j}" for j in range(10)))],
        schema="doc_id long, text string",
    )
    post_dir = str(tmp_path / "postings")
    corpus_postings_index(corpus, n=3).write.parquet(post_dir)

    def rows(**kw):
        return sorted(
            tuple(r)
            for r in containment_incremental_pairs(
                batch, n=3, threshold=0.5, **kw
            ).collect()
        )

    via_corpus = rows(corpus=corpus)
    via_postings = rows(
        corpus=None, corpus_postings=spark.read.parquet(post_dir)
    )
    assert via_corpus == via_postings
    assert any(a == 100 and b == 6 and c == 1.0
               for (a, b, _i, _sa, _sb, c) in via_corpus)

    import pytest

    with pytest.raises(ValueError, match="exactly one"):
        containment_incremental_pairs(batch, None)
    with pytest.raises(ValueError, match="exactly one"):
        containment_incremental_pairs(
            batch, corpus, corpus_postings=spark.read.parquet(post_dir)
        )


def test_containment_catches_short_doc_in_long(spark):
    """The measure's reason to exist: a short doc fully embedded in a
    long one scores containment 1.0 while its Jaccard is far below any
    pair threshold — the symmetric screen structurally misses it."""
    from real_time_trip_processing_spark.functions.similarity import (
        containment_pairs, jaccard_pairs,
    )

    quote = " ".join(f"q{i}" for i in range(8))           # 6 3-shingles
    long_doc = (
        " ".join(f"pre{i}" for i in range(100))
        + " " + quote + " "
        + " ".join(f"post{i}" for i in range(100))
    )
    df = spark.createDataFrame(
        [Row(doc_id=0, text=quote), Row(doc_id=1, text=long_doc)],
        schema="doc_id long, text string",
    )
    c = containment_pairs(df, n=3, threshold=0.8).collect()
    assert len(c) == 1 and c[0]["containment"] == 1.0
    assert (c[0]["a"], c[0]["b"]) == (0, 1)
    # Jaccard at even a permissive 0.2 threshold sees nothing
    assert jaccard_pairs(df, n=3, threshold=0.2).collect() == []


@settings(**SETTINGS)
@given(
    big=st.lists(
        st.tuples(st.integers(0, 3), st.integers(-50, 50)), min_size=0, max_size=30
    ),
    small=st.lists(
        st.tuples(st.integers(0, 5), st.integers(0, 9)), min_size=0, max_size=8
    ),
    buckets=st.sampled_from([1, 3, 16]),
)
def test_salted_join_equals_plain_join(spark, big, small, buckets):
    """salted_join is a pure physical rewrite of the inner equi join:
    same multiset of output rows as the plain join, for any key overlap
    (including none), duplicate build keys included, any bucket count."""
    from real_time_trip_processing_spark.operators.skew import salted_join

    bdf = spark.createDataFrame(
        [Row(k=k, v=v) for k, v in big], schema="k int, v long"
    )
    sdf = spark.createDataFrame(
        [Row(sk=k, w=w) for k, w in small], schema="sk int, w long"
    )
    got = sorted(
        (r["k"], r["v"], r["sk"], r["w"])
        for r in salted_join(bdf, sdf, "k", "sk", buckets=buckets).collect()
    )
    expect = sorted(
        (k, v, sk, w) for k, v in big for sk, w in small if k == sk
    )
    assert got == expect


@settings(**SETTINGS)
@given(
    docs=st.lists(
        st.tuples(
            st.text(alphabet="ab c", min_size=0, max_size=30),
            st.sampled_from(["en", "de"]),
        ),
        min_size=0,
        max_size=15,
    ),
    budget=st.sampled_from([1, 3, 8]),
)
def test_pack_sequences_model(spark, docs, budget):
    """Sequence packing against a Python model: within each stream,
    offsets are the running token sum in doc_id order, seq_id is
    offset // budget, and chunk boundaries never reorder or drop docs."""
    from real_time_trip_processing_spark.functions.curation import pack_sequences

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t, lang=lang) for i, (t, lang) in enumerate(docs)],
        schema="doc_id long, text string, lang string",
    )
    got = {
        r["doc_id"]: (r["n_tokens"], r["tok_offset"], r["seq_id"])
        for r in pack_sequences(df, budget=budget, part_col="lang").collect()
    }
    # model: BPE-ish token count is opaque — reuse the operator's own
    # n_tokens and model ONLY the packing arithmetic on top of it
    by_lang: dict = {}
    for i, (t, lang) in enumerate(docs):
        by_lang.setdefault(lang, []).append(i)
    for ids in by_lang.values():
        off = 0
        for i in sorted(ids):
            n, got_off, got_seq = got[i]
            assert got_off == off
            assert got_seq == off // budget
            off += n
    assert len(got) == len(docs)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="abc xyz", min_size=0, max_size=40),
        min_size=0,
        max_size=12,
    ),
    n=st.sampled_from([2, 3]),
)
def test_decontaminate_model(spark, texts, n):
    """n-gram decontamination against a brute-force model: every doc
    sharing >=1 distinct word n-gram with the bench subset (doc_id % 3
    == 0) is reported with the exact distinct-shared-gram count."""
    from real_time_trip_processing_spark.functions.curation import (
        ngram_decontaminate,
    )
    from pyspark.sql import functions as F

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )

    def grams(t: str) -> set:
        toks = t.strip().split()
        if not toks:
            toks = [""]
        if len(toks) <= n:
            return {" ".join(toks)}
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    bench = set().union(*(grams(t) for i, t in enumerate(texts) if i % 3 == 0)) \
        if any(i % 3 == 0 for i in range(len(texts))) else set()
    expect = {}
    for i, t in enumerate(texts):
        if i % 3 == 0:
            continue
        hits = len(grams(t) & bench)
        if hits:
            expect[i] = hits

    got = {
        r["doc_id"]: r["n_hits"]
        for r in ngram_decontaminate(
            df, bench_pred=F.col("doc_id") % 3 == 0, n=n
        ).collect()
    }
    assert got == expect


@settings(**SETTINGS)
@given(
    hexes=st.lists(
        st.text(alphabet="0123456789abcdef", min_size=8, max_size=16),
        min_size=1,
        max_size=10,
    )
)
def test_hex_prefix_int_model(spark, hexes):
    """hex_prefix_int == int(hex[:8], 16) for any hex string — the
    shard-assignment primitive matches the Python model exactly."""
    from real_time_trip_processing_spark.functions.curation import hex_prefix_int

    df = spark.createDataFrame([(h,) for h in hexes], "hk string")
    got = [r[0] for r in df.select(hex_prefix_int("hk", 8)).collect()]
    assert got == [int(h[:8], 16) for h in hexes]


@settings(**SETTINGS)
@given(
    vals=st.lists(
        st.floats(min_value=0.0, max_value=500.0, allow_nan=False),
        min_size=1,
        max_size=60,
    ),
)
def test_quantile_sketch_within_half_bin(spark, vals):
    """Histogram-sketch quantile estimates must land within w/2 of a
    true rank-based quantile for ANY value multiset (the sketch's
    whole contract), and the two-batch merge must equal the one-shot
    histogram (mergeability)."""
    import datetime as dt

    rows = [
        Row(event_id=i, ts=dt.datetime(2024, 1, 1, 12), value=float(v))
        for i, v in enumerate(vals)
    ]
    df = spark.createDataFrame(rows)
    from pyspark.sql import functions as F

    w = 0.5
    binned = df.select(F.floor(F.col("value") / w).cast("long").alias("bin"))
    merged = (
        binned.withColumn("batch", F.lit(0))  # batch split is a no-op for counts
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .orderBy("bin")
        .collect()
    )
    n = sum(r.cnt for r in merged)
    for q in (0.5, 0.95):
        rank = math.ceil(q * n)
        cum = 0
        est = None
        for r in merged:
            cum += r.cnt
            if cum >= rank:
                est = (r.bin + 0.5) * w
                break
        exact = sorted(vals)[rank - 1]  # rank-based (disc) quantile
        assert est is not None and abs(est - exact) <= w / 2 + 1e-9


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),      # user
            st.integers(min_value=0, max_value=9),      # day offset
            st.integers(min_value=0, max_value=23),     # hour
            st.floats(min_value=-5, max_value=5, allow_nan=False),
        ),
        min_size=1,
        max_size=25,
    ),
)
def test_gap_fill_daily_model(spark, events):
    """gap_fill invariants on arbitrary event sets: (1) per key the
    output days are EXACTLY the contiguous span min..max active day;
    (2) observed rows carry that day's last value; (3) filled rows
    carry the most recent prior observed value."""
    import datetime as dt

    from real_time_trip_processing_spark.operators.asof import gap_fill_daily

    rows = [
        Row(
            event_id=i,
            ts=dt.datetime(2024, 3, 1 + d, h),
            user_id=u,
            value=round(float(v), 6),
        )
        for i, (u, d, h, v) in enumerate(events)
    ]
    out = gap_fill_daily(spark.createDataFrame(rows)).collect()

    # python model
    by_key: dict = {}
    for r in rows:
        day = r.ts.date()
        cur = by_key.setdefault(r.user_id, {})
        prev = cur.get(day)
        # last event of the day: later ts wins, event_id breaks ties
        if prev is None or (r.ts, r.event_id) > prev[0]:
            cur[day] = ((r.ts, r.event_id), r.value)
    expect = {}
    for u, days in by_key.items():
        d0, d1 = min(days), max(days)
        last = None
        d = d0
        while d <= d1:
            if d in days:
                last = days[d][1]
                expect[(u, d)] = (round(last, 6), 1)
            else:
                expect[(u, d)] = (round(last, 6), 0)
            d += dt.timedelta(days=1)
    got = {
        (r.user_id, r.day.date()): (r.value_filled, r.observed) for r in out
    }
    assert got == expect


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.lists(
            st.sampled_from(["a", "b", "c", "dd"]), min_size=0, max_size=6
        ).map(" ".join),
        min_size=1,
        max_size=8,
    ),
)
def test_doc_lm_score_matches_model(spark, texts):
    """doc_lm_score == a brute-force python bigram-LM model on arbitrary
    tiny corpora (tiny vocab → heavy count collisions on purpose)."""
    from collections import Counter

    from real_time_trip_processing_spark.functions.text import doc_lm_score

    rows = [Row(doc_id=i, text=t) for i, t in enumerate(texts)]
    got = {
        r.doc_id: (r.n_bigrams, r.avg_nll)
        for r in doc_lm_score(spark.createDataFrame(rows)).collect()
    }

    def toks(t):
        t = t.strip()
        return t.split() if t else [""]

    bigrams = {i: list(zip(toks(t), toks(t)[1:])) for i, t in enumerate(texts)}
    c = Counter(bg for bgs in bigrams.values() for bg in bgs)
    w1_tot = Counter()
    for (w1, _), n in c.items():
        w1_tot[w1] += n
    vocab = len({w2 for (_, w2) in c})
    expect = {}
    for i, bgs in bigrams.items():
        if not bgs:
            continue
        nlls = [
            -math.log((c[bg] + 1) / (w1_tot[bg[0]] + vocab)) for bg in bgs
        ]
        expect[i] = (len(bgs), round(sum(nlls) / len(nlls), 6))
    assert got == expect


@settings(**SETTINGS)
@given(
    probe=st.lists(st.integers(-1000, 1000), min_size=0, max_size=40),
    build=st.lists(st.integers(-1000, 1000), min_size=0, max_size=15),
)
def test_bloom_semi_join_equals_plain_semi(spark, probe, build):
    """For ANY key sets (negatives, overlaps, empty sides) the Bloom
    prefilter must be output-invisible: result == plain left-semi."""
    from real_time_trip_processing_spark.operators.joins import (
        bloom_filtered_semi_join,
    )

    p = spark.createDataFrame([Row(pk=x) for x in probe], "pk long")
    b = spark.createDataFrame([Row(bk=x) for x in build], "bk long")
    got = sorted(
        r.pk for r in bloom_filtered_semi_join(p, b, "pk", "bk").collect()
    )
    want = sorted(x for x in probe if x in set(build))
    assert got == want


@settings(**SETTINGS)
@given(
    events=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),   # user
            st.integers(min_value=0, max_value=20),  # hour offset
            st.sampled_from(["A", "B", "C"]),        # state
        ),
        min_size=1,
        max_size=30,
    ),
    split_hour=st.integers(min_value=0, max_value=21),
)
def test_scd2_merge_equals_full_rebuild(spark, events, split_hour):
    """Incremental SCD2 maintenance == full rebuild for ANY event set
    and ANY append-only split point (including empty halves)."""
    import datetime as dt

    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.operators.scd import (
        scd2_history,
        scd2_merge,
    )

    rows = [
        Row(
            event_id=i,
            ts=dt.datetime(2024, 6, 1) + dt.timedelta(hours=h),
            user_id=u,
            event_type=s,
        )
        for i, (u, h, s) in enumerate(events)
    ]
    df = spark.createDataFrame(rows)
    cutoff = dt.datetime(2024, 6, 1) + dt.timedelta(hours=split_hour)
    merged = scd2_merge(
        scd2_history(df.filter(F.col("ts") < F.lit(cutoff))),
        df.filter(F.col("ts") >= F.lit(cutoff)),
    )
    full = scd2_history(df)
    key = lambda r: (r.user_id, r.state, r.valid_from, r.valid_to)  # noqa: E731
    assert sorted(map(key, merged.collect())) == sorted(map(key, full.collect()))


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=40),
        min_size=0,
        max_size=12,
    ),
    sw=st.sampled_from([2, 4]),
)
def test_dedup_spans_matches_brute_force(spark, texts, sw):
    """dedup_spans vs a Python model: split on ASCII whitespace,
    non-overlapping sw-word spans, global first occurrence by
    (doc_id, position) wins, docs reassembled from survivors in
    position order — counts and rebuilt hashes must match exactly."""
    import hashlib
    import re as _re

    from real_time_trip_processing_spark.operators.dedup import dedup_spans

    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    got = {
        r["doc_id"]: (r["n_spans"], r["n_spans_removed"], r["rebuilt_sha"])
        for r in dedup_spans(df, span_words=sw).collect()
    }

    # model (JVM-exact tokenization: SQL trim strips ' ' only, Java \s)
    def spans_of(t):
        w = _re.split(r"[ \t\n\x0b\f\r]+", t.strip(" "))
        out = [" ".join(w[i : i + sw]) for i in range(0, max(len(w), 1), sw)]
        return [s for s in out if s != ""]

    seen = set()
    for i, t in enumerate(texts):
        sp = spans_of(t)
        kept = []
        for s in sp:
            if s not in seen:
                seen.add(s)
                kept.append(s)
        want_sha = hashlib.sha256(" ".join(kept).encode()).hexdigest()
        n, removed, sha = got[i]
        assert n == len(sp), (i, t, got[i], sp)
        assert removed == len(sp) - len(kept), (i, t, got[i], sp)
        assert sha == want_sha, (i, t)
    assert len(got) == len(texts)


@settings(**SETTINGS)
@given(
    texts=st.lists(
        st.text(alphabet="ab x", min_size=0, max_size=40),
        min_size=2,
        max_size=12,
    ),
    sw=st.sampled_from([2, 4]),
    split=st.integers(min_value=1, max_value=11),
)
def test_dedup_spans_incremental_equals_global(spark, texts, sw, split):
    """The incremental equivalence contract: when every corpus id
    orders before every batch id, dedup_spans_incremental(batch,
    corpus) == dedup_spans(corpus ∪ batch) restricted to batch docs —
    for ANY split point. The incremental path must never keep a span
    the global pass removes, or vice versa."""
    from pyspark.sql import functions as F

    from real_time_trip_processing_spark.operators.dedup import (
        dedup_spans,
        dedup_spans_incremental,
    )

    split = min(split, len(texts) - 1)
    df = spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in enumerate(texts)],
        schema="doc_id long, text string",
    )
    corpus = df.filter(F.col("doc_id") < split)
    batch = df.filter(F.col("doc_id") >= split)
    inc = dedup_spans_incremental(batch, corpus, span_words=sw)
    glob = dedup_spans(df, span_words=sw).filter(F.col("doc_id") >= split)
    key = lambda r: tuple(r)  # noqa: E731
    assert sorted(map(key, inc.collect())) == sorted(
        map(key, glob.collect())
    )
