"""Unit tests for the corpus-curation operators (functions/curation.py)
with planted micro-cases: decontamination hit/miss, packing boundary
arithmetic, quality-gate rules, repetition tie-break, mix-weight cap."""

from __future__ import annotations

from pyspark.sql import functions as F

from real_time_trip_processing_spark.functions import curation as C

DOCS_SCHEMA = "doc_id long, text string, lang string, source string"


def test_ngram_decontaminate_flags_only_overlap(spark):
    df = spark.createDataFrame(
        [
            (0, "alpha beta gamma delta epsilon", "en", "bench"),   # benchmark
            (1, "x alpha beta gamma delta y", "en", "web"),          # shares 4-gram
            (2, "alpha beta zeta delta epsilon", "en", "web"),       # no shared 4-gram
            (3, "alpha beta gamma delta epsilon zz", "en", "web"),   # shares two
        ],
        DOCS_SCHEMA,
    )
    out = C.ngram_decontaminate(df, bench_pred=F.col("doc_id") == 0, n=4)
    got = {r["doc_id"]: r["n_hits"] for r in out.collect()}
    assert got == {1: 1, 3: 2}


def test_pack_sequences_offsets_and_boundaries(spark):
    # token_count of "a b c" = 3; budget 5 → doc2 starts at offset 3 and
    # straddles into seq 0 (first token rule), doc3 starts at 8 → seq 1.
    df = spark.createDataFrame(
        [
            (1, "a b c", "en", "s"),
            (2, "d e f g h", "en", "s"),
            (3, "i j", "en", "s"),
            (10, "k k k k k k", "fr", "s"),  # separate stream restarts at 0
        ],
        DOCS_SCHEMA,
    )
    out = C.pack_sequences(df, budget=5, part_col="lang")
    rows = {r["doc_id"]: (r["n_tokens"], r["tok_offset"], r["seq_id"]) for r in out.collect()}
    assert rows[1] == (3, 0, 0)
    assert rows[2] == (5, 3, 0)
    assert rows[3] == (2, 8, 1)
    assert rows[10] == (6, 0, 0)


def test_quality_gate_rules(spark):
    good = "the quick brown fox jumps over the lazy dog again and again ok"
    short = "the cat"                                   # fails ok_len
    symbols = "the " + "@#$% " * 12                     # fails ok_sym (and mwl band ok)
    no_stop = "zzz " * 15                               # fails ok_stop and ok_ttr
    df = spark.createDataFrame(
        [(1, good, "en", "s"), (2, short, "en", "s"),
         (3, symbols.strip(), "en", "s"), (4, no_stop.strip(), "en", "s")],
        DOCS_SCHEMA,
    )
    out = {r["doc_id"]: r.asDict() for r in C.quality_gate(df).collect()}
    assert out[1]["keep"] is True
    assert out[2]["ok_len"] is False and out[2]["keep"] is False
    assert out[3]["ok_sym"] is False and out[3]["keep"] is False
    assert out[4]["ok_stop"] is False and out[4]["ok_ttr"] is False


def test_top_token_stats_tiebreak_deterministic(spark):
    df = spark.createDataFrame(
        [(1, "b a b a c", "en", "s"),      # a and b tie at 2 → 'b' (larger) wins
         (2, "x x x y", "en", "s")],
        DOCS_SCHEMA,
    )
    out = {r["doc_id"]: r.asDict() for r in C.top_token_stats(df).collect()}
    assert out[1]["top_token"] == "b" and out[1]["top_n"] == 2 and out[1]["n_tokens"] == 5
    assert out[2]["top_token"] == "x" and out[2]["top_ratio"] == 0.75
    assert out[2]["repetitive"] is True


def test_source_mix_weights_cap_and_share(spark):
    # source A: 9 tokens, source B: 1 token → shares 0.9/0.1; uniform
    # target 0.5 → raw weights 0.555…/5.0, B capped at 3.0.
    df = spark.createDataFrame(
        [(1, "a b c d e f g h i", "en", "A"), (2, "j", "en", "B")],
        DOCS_SCHEMA,
    )
    out = {r["source"]: r.asDict() for r in C.source_mix_weights(df, cap=3.0).collect()}
    assert out["A"]["tot_tokens"] == 9 and out["B"]["tot_tokens"] == 1
    assert abs(out["A"]["token_share"] - 0.9) < 1e-9
    assert abs(out["A"]["mix_weight"] - 0.5 / 0.9) < 1e-6
    assert out["B"]["mix_weight"] == 3.0


def test_redact_terms_counts_and_content(spark):
    df = spark.createDataFrame(
        [
            (1, "the customer met a customer near spark", "en", "s"),
            (2, "customers use sparkling vectors", "en", "s"),  # no word-boundary hits
            (3, "plain text", "en", "s"),
        ],
        DOCS_SCHEMA,
    )
    out = {
        r["doc_id"]: r.asDict()
        for r in C.redact_terms(df, ("customer", "spark", "vector")).collect()
    }
    assert out[1]["n_redacted"] == 3
    # "the <REDACTED> met a <REDACTED> near <REDACTED>"
    assert out[1]["redacted_len"] == len("the <REDACTED> met a <REDACTED> near <REDACTED>")
    assert out[2]["n_redacted"] == 0  # substrings must not match
    assert out[3]["n_redacted"] == 0
    # unredacted docs keep their original digest
    import hashlib
    assert out[3]["redacted_sha"] == hashlib.sha256(b"plain text").hexdigest()


def test_pii_scrub_classes_and_chain(spark):
    df = spark.createDataFrame(
        [
            (1, "mail bob.smith+x@example.co.uk now", "en", "s"),
            (2, "call +1 (555) 123-4567 or 555-987-6543", "en", "s"),
            (3, "host 192.168.0.1 and 10.0.0.255", "en", "s"),
            (4, "a@b.io from 8.8.8.8 at 555-111-2222", "en", "s"),
            (5, "clean", "en", "s"),
        ],
        DOCS_SCHEMA,
    )
    out = {r["doc_id"]: r.asDict() for r in C.pii_scrub(df).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 0, 0)
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 2, 0)
    assert (out[3]["n_email"], out[3]["n_phone"], out[3]["n_ipv4"]) == (0, 0, 2)
    assert (out[4]["n_email"], out[4]["n_phone"], out[4]["n_ipv4"]) == (1, 1, 1)
    import hashlib
    assert out[1]["scrubbed_sha"] == hashlib.sha256(b"mail <EMAIL> now").hexdigest()
    assert out[5]["scrubbed_sha"] == hashlib.sha256(b"clean").hexdigest()


def test_length_bucket_edges(spark):
    df = spark.createDataFrame(
        [(0,), (1,), (16,), (17,), (512,), (513,), (99999,)], "n long"
    )
    got = {
        r["n"]: r["b"]
        for r in df.select("n", C.length_bucket(F.col("n")).alias("b")).collect()
    }
    assert got == {0: 16, 1: 16, 16: 16, 17: 32, 512: 512, 513: 1024, 99999: 1024}


def test_shard_manifest_partitions_and_determinism(spark):
    df = spark.createDataFrame(
        [(i, f"doc {i}", "en", "s") for i in range(200)], DOCS_SCHEMA
    )
    out = C.shard_manifest(df, n_shards=8).collect()
    assert len(out) == 200
    assert {r["doc_id"] for r in out} == set(range(200))
    by_shard: dict[int, list] = {}
    for r in out:
        assert 0 <= r["shard_id"] < 8
        by_shard.setdefault(r["shard_id"], []).append(r)
    # positions are contiguous 0..n-1 per shard, ordered by shuffle_key
    for rows in by_shard.values():
        rows.sort(key=lambda r: r["pos_in_shard"])
        assert [r["pos_in_shard"] for r in rows] == list(range(len(rows)))
        keys = [(r["shuffle_key"], r["doc_id"]) for r in rows]
        assert keys == sorted(keys)
    # same salt → identical manifest; different salt → different order
    again = {r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
             for r in C.shard_manifest(df, n_shards=8).collect()}
    assert again == {r["doc_id"]: (r["shard_id"], r["pos_in_shard"]) for r in out}
    other = {r["doc_id"]: (r["shard_id"], r["pos_in_shard"])
             for r in C.shard_manifest(df, n_shards=8, salt="shuffle:v2").collect()}
    assert other != again


def test_hex_prefix_int_matches_python(spark):
    df = spark.createDataFrame([("deadbeef01",), ("00000001ff",)], "hk string")
    got = [r[0] for r in df.select(C.hex_prefix_int("hk", 8)).collect()]
    assert got == [0xDEADBEEF, 0x00000001]


def test_dedup_incremental_batch_vs_corpus(spark):
    from real_time_trip_processing_spark.operators.dedup import dedup_incremental

    corpus = spark.createDataFrame(
        [(1, "Known Doc", "en", "s"), (2, "other", "en", "s")], DOCS_SCHEMA
    )
    incoming = spark.createDataFrame(
        [
            (10, "known doc", "en", "s"),    # dup of corpus (normalized) → dropped
            (11, "fresh one", "en", "s"),    # survives
            (12, "Fresh One ", "en", "s"),   # batch dup of 11 → dropped, counted
            (13, "brand new", "en", "s"),    # survives
        ],
        DOCS_SCHEMA,
    )
    out = {r["doc_id"]: r["n_batch_dups"]
           for r in dedup_incremental(incoming, corpus).collect()}
    assert out == {11: 2, 13: 1}


def test_repeated_ngrams_planted_boilerplate(spark):
    footer = "this page is generated by the acme site builder v two"
    df = spark.createDataFrame(
        [
            (1, "unique alpha content one " + footer, "en", "a"),
            (2, "unique beta content two " + footer, "en", "b"),
            (3, "totally unrelated text with no overlap at all here", "en", "c"),
        ],
        DOCS_SCHEMA,
    )
    out = C.repeated_ngrams(df, n=11, min_docs=2).collect()
    grams = {r["gram"]: (r["n_docs"], r["n_occ"], r["first_doc"], r["last_doc"])
             for r in out}
    assert footer in grams
    assert grams[footer] == (2, 2, 1, 2)
    # nothing from doc 3 repeats
    assert all("unrelated" not in g for g in grams)


def test_chunk_documents_overlap_arithmetic(spark):
    df = spark.createDataFrame(
        [(1, " ".join(f"w{i}" for i in range(10)), "en", "s"),
         (2, "tiny", "en", "s")],
        DOCS_SCHEMA,
    )
    out = C.chunk_documents(df, chunk_tokens=4, overlap=2)
    rows = {(r["doc_id"], r["chunk_id"]): (r["start_tok"], r["n_tok"])
            for r in out.collect()}
    # doc 1: 10 tokens, chunks start at 1,3,5,7,9 (step 2), size 4 capped
    assert rows == {
        (1, 0): (1, 4), (1, 1): (3, 4), (1, 2): (5, 4),
        (1, 3): (7, 4), (1, 4): (9, 2),
        (2, 0): (1, 1),
    }


def test_chunk_documents_empty_doc_zero_tokens(spark):
    """An empty/whitespace-only document tokenizes to [''] — its single
    chunk must report n_tok=0, not 1."""
    df = spark.createDataFrame(
        [(1, "", "en", "s"), (2, "   ", "en", "s"), (3, "one two", "en", "s")],
        DOCS_SCHEMA,
    )
    out = {(r["doc_id"], r["chunk_id"]): r["n_tok"]
           for r in C.chunk_documents(df, chunk_tokens=4, overlap=2).collect()}
    assert out == {(1, 0): 0, (2, 0): 0, (3, 0): 2}


# ---- xxhash64-gram shuffle shrink (hash_grams) ----------------------

_HG_DOCS = [
    (1, "the quick brown fox jumps over the lazy dog", "en", "web"),
    (2, "the quick brown fox jumps over a sleeping cat", "en", "web"),
    (3, "a completely different sentence about nothing shared here", "en", "book"),
    (4, "the quick brown fox jumps over the lazy dog again", "en", "web"),
]


def test_repeated_ngrams_hash_grams_counts_identical(spark):
    """hash_grams=True must report the exact same (n_docs, n_occ,
    first/last doc) per gram — only the gram key changes (string →
    xxhash64 decimal string)."""
    df = spark.createDataFrame(_HG_DOCS, DOCS_SCHEMA)
    plain = C.repeated_ngrams(df, n=4, min_docs=2)
    hashed = C.repeated_ngrams(df, n=4, min_docs=2, hash_grams=True)
    keyed = plain.select(
        F.xxhash64("gram").cast("string").alias("gram"),
        "n_docs", "n_occ", "first_doc", "last_doc",
    )
    assert sorted(map(tuple, keyed.collect())) == sorted(
        map(tuple, hashed.collect())
    )
    assert hashed.count() > 0


def test_novelty_scores_hash_grams_identical(spark):
    """Novelty depends only on gram document-frequencies, so the hashed
    variant is bit-identical (modulo 64-bit collisions)."""
    df = spark.createDataFrame(_HG_DOCS, DOCS_SCHEMA)
    a = sorted(map(tuple, C.novelty_scores(df, 4).collect()))
    b = sorted(map(tuple, C.novelty_scores(df, 4, hash_grams=True).collect()))
    assert a == b
    assert len(a) == 4


def test_hash_grams_shrinks_the_shuffle_key(spark):
    """The gram exchange must move an 8-byte long, not the n-word
    string: xxhash64 is applied map-side (below the Exchange) and the
    aggregate's grouping key is bigint."""
    df = spark.createDataFrame(_HG_DOCS, DOCS_SCHEMA)
    hashed = C.repeated_ngrams(df, n=8, min_docs=2, hash_grams=True)
    plan = hashed._sc._jvm.PythonSQLUtils.explainString(
        hashed._jdf.queryExecution(), "formatted"
    )
    # xxhash64 is computed in a Project below the Exchange (map-side)
    assert "xxhash64" in plan
    # the gram exchange partitions on a LongType key (#..L suffix)
    import re as _re
    m = _re.search(r"hashpartitioning\(sh#\d+L", plan)
    assert m, plan


def test_ngram_decontaminate_arrow_matches_builtin(spark):
    """Fused-kernel flavor vs broadcast-join flavor on real corpus data:
    same contaminated docs, same distinct-hit counts."""
    from real_time_trip_processing_spark.sources import table

    docs = table(spark, "/root/testdata/sf0.001", "documents")
    pred = F.col("doc_id") % 97 == 0
    a = sorted(map(tuple, C.ngram_decontaminate(docs, pred, n=4, impl="arrow").collect()))
    b = sorted(map(tuple, C.ngram_decontaminate(docs, pred, n=4, impl="builtin").collect()))
    assert a == b
    assert len(a) > 0


def test_dataset_split_stable_under_corpus_growth(spark):
    """Split membership is a pure function of the doc key: adding new
    docs must not move any existing doc between splits (the property
    that makes the split leakage-proof under reprocessing)."""
    from real_time_trip_processing_spark.plans import REGISTRY  # noqa: F401
    from real_time_trip_processing_spark.sources import table  # noqa: F401

    def split_of(df):
        bucket = (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:v1:"), F.col("doc_id").cast("string"))),
                    1, 8,
                ), 16, 10,
            ).cast("long") % 100
        )
        s = (F.when(bucket < 96, "train").when(bucket < 98, "val")
             .otherwise("test"))
        return {r["doc_id"]: r["s"] for r in df.select("doc_id", s.alias("s")).collect()}

    small = spark.createDataFrame([(i, "t", "en", "s") for i in range(100)], DOCS_SCHEMA)
    big = spark.createDataFrame([(i, "t", "en", "s") for i in range(300)], DOCS_SCHEMA)
    a, b = split_of(small), split_of(big)
    assert all(b[k] == v for k, v in a.items())
    assert set(b.values()) == {"train", "val", "test"}


def test_pack_sequences_string_ids_bucketed_equals_single(spark):
    """The non-numeric id path: bucketing uses the byte-prefix proxy
    (monotone under binary string order), so the bucketed prefix sum
    must still be bit-identical to the single-window formulation."""
    from pyspark.sql import Row

    from real_time_trip_processing_spark.functions import curation as C

    rows = [
        Row(doc_id=f"doc_{i:04d}", text=" ".join(f"w{j}" for j in range(i % 7 + 1)),
            lang=["en", "de"][i % 2])
        for i in range(200)
    ]
    df = spark.createDataFrame(rows)
    a = C.pack_sequences(df, budget=5, n_buckets=1)
    b = C.pack_sequences(df, budget=5, n_buckets=4)
    cols = ["doc_id", "lang", "n_tokens", "tok_offset", "seq_id"]
    got_a = sorted(tuple(r) for r in a.select(cols).collect())
    got_b = sorted(tuple(r) for r in b.select(cols).collect())
    assert got_a == got_b
    assert len(got_a) == 200


def test_pack_sequences_variable_length_string_ids(spark):
    """The review-found monotonicity bug, pinned: VARIABLE-length ids
    ('b' vs 'ab') invert an un-padded hex-prefix proxy ('b'→0x62 <
    'ab'→0x6162 numerically, but 'ab' < 'b' in binary string order).
    The rpad'ed proxy must keep the bucketed path bit-identical to the
    single window."""
    from pyspark.sql import Row

    from real_time_trip_processing_spark.functions import curation as C

    ids = ["a", "aaa", "ab", "b", "ba", "c", "ca", "cc", "d", "z", "za",
           "zz", "m", "mm", "mmm", "x"]
    rows = [
        Row(doc_id=i, text=" ".join(f"w{j}" for j in range(n % 5 + 1)),
            lang="en")
        for n, i in enumerate(ids)
    ]
    df = spark.createDataFrame(rows)
    cols = ["doc_id", "n_tokens", "tok_offset", "seq_id"]
    a = sorted(tuple(r) for r in
               C.pack_sequences(df, budget=3, n_buckets=1).select(cols).collect())
    b = sorted(tuple(r) for r in
               C.pack_sequences(df, budget=3, n_buckets=4).select(cols).collect())
    assert a == b


def test_pack_sequences_date_ids(spark):
    """DateType id_col: the epoch-day proxy (DATE has no DOUBLE cast)
    must bucket without error and match the single-window path."""
    import datetime as dt

    from pyspark.sql import Row

    from real_time_trip_processing_spark.functions import curation as C

    rows = [
        Row(doc_id=dt.date(2024, 1, 1) + dt.timedelta(days=i),
            text=" ".join(f"w{j}" for j in range(i % 4 + 1)), lang="en")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows)
    cols = ["doc_id", "n_tokens", "tok_offset", "seq_id"]
    a = sorted(tuple(r) for r in
               C.pack_sequences(df, budget=4, n_buckets=1).select(cols).collect())
    b = sorted(tuple(r) for r in
               C.pack_sequences(df, budget=4, n_buckets=3).select(cols).collect())
    assert a == b


def test_redact_terms_escapes_metacharacters(spark):
    """Blocklist terms are literals, not regex fragments (round-6
    review): 'c++' must not be a dangling quantifier, 'a.b' must not
    match 'aXb', and an empty blocklist is rejected loudly instead of
    redacting every word boundary."""
    import pytest

    from real_time_trip_processing_spark.functions.curation import (
        redact_terms,
    )

    docs = spark.createDataFrame(
        [(1, "we use c++ and a.b daily but axb stays")],
        "doc_id long, text string",
    )
    # 'c++' compiles (escaped — raw it is a PatternSyntaxException) but
    # its trailing '+' has no word boundary against the following space
    # (\b needs a word-char edge; documented on blocklist_pattern), so
    # only 'a.b' hits — and 'axb' does NOT (the '.' is literal now)
    out = redact_terms(docs, ("c++", "a.b")).collect()[0]
    assert out["n_redacted"] == 1
    with pytest.raises(ValueError, match="empty blocklist"):
        redact_terms(docs, ())


def test_pii_scrub_counts_reconcile_with_replacements(spark):
    """Counts are progressive (round-6 review): digits inside an email
    are the one <EMAIL> hit — n_phone/n_ipv4 must NOT also claim them,
    so the class counts reconcile with the placeholders actually
    inserted."""
    from real_time_trip_processing_spark.functions.curation import pii_scrub

    docs = spark.createDataFrame(
        [
            (1, "reach me: 555.123.4567@mail.com thanks"),
            (2, "call 555-123-4567 or ping 10.0.0.1"),
        ],
        "doc_id long, text string",
    )
    rows = {r["doc_id"]: r for r in pii_scrub(docs).collect()}
    # doc 1: one email swallows the digits — no phone, no ip
    assert (rows[1]["n_email"], rows[1]["n_phone"], rows[1]["n_ipv4"]) == (1, 0, 0)
    # doc 2: genuinely a phone and an ip
    assert (rows[2]["n_email"], rows[2]["n_phone"], rows[2]["n_ipv4"]) == (0, 1, 1)


def test_chunk_documents_null_text_yields_no_chunks(spark):
    """NULL-text documents contribute no chunks (round-6 review): the
    phantom sha256('') chunk a null doc used to emit collided with
    genuinely empty chunks in downstream chunk-level dedup."""
    from real_time_trip_processing_spark.functions.curation import (
        chunk_documents,
    )

    docs = spark.createDataFrame(
        [(1, None), (2, "a b c d e")], "doc_id long, text string"
    )
    out = chunk_documents(docs, chunk_tokens=4, overlap=1).collect()
    assert {r["doc_id"] for r in out} == {2}


def test_dedup_incremental_null_text_consistent(spark):
    """NULL text hashes as empty content on BOTH checks (round-6
    review): previously the within-batch window grouped null hashes as
    duplicates while the anti-join's null key never matched the corpus,
    so a null-text survivor re-ingested every cycle."""
    from real_time_trip_processing_spark.operators.dedup import (
        dedup_incremental,
    )

    incoming = spark.createDataFrame(
        [(10, None), (11, None), (12, "real text")],
        "doc_id long, text string",
    )
    corpus = spark.createDataFrame(
        [(1, None), (2, "other")], "doc_id long, text string"
    )
    out = dedup_incremental(incoming, corpus).collect()
    # the null-text batch winner is now KILLED by the corpus's null-text
    # doc; only the real new text survives
    assert {r["doc_id"] for r in out} == {12}


def test_dedup_spans_semantics(spark):
    """C4-style span dedup: global first occurrence wins (lowest
    (doc, position)); later repeats across AND within docs are removed;
    NULL text = zero spans; rebuilt hash proves reassembly order."""
    import hashlib

    from real_time_trip_processing_spark.operators.dedup import dedup_spans

    rows = [
        (1, "a b c d e f g h"),    # owns both its spans
        (2, "x y z w a b c d"),    # 2nd span duplicates doc1's 1st
        (3, "a b c d a b c d"),    # both spans are doc1's — all removed
        (4, None),                  # null text: zero spans
        (5, "q r"),                 # short doc: one partial span
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r["doc_id"]: r for r in dedup_spans(df, span_words=4).collect()}

    def sha(s):
        return hashlib.sha256(s.encode()).hexdigest()

    assert (got[1]["n_spans"], got[1]["n_spans_removed"]) == (2, 0)
    assert got[1]["rebuilt_sha"] == sha("a b c d e f g h")
    assert (got[2]["n_spans"], got[2]["n_spans_removed"]) == (2, 1)
    assert got[2]["rebuilt_sha"] == sha("x y z w")
    assert (got[3]["n_spans"], got[3]["n_spans_removed"]) == (2, 2)
    assert got[3]["rebuilt_sha"] == sha("")
    assert (got[4]["n_spans"], got[4]["n_spans_removed"]) == (0, 0)
    assert got[4]["rebuilt_sha"] == sha("")
    assert (got[5]["n_spans"], got[5]["n_spans_removed"]) == (1, 0)
    assert got[5]["rebuilt_sha"] == sha("q r")
