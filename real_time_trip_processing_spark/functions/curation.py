"""Corpus-curation operators for the LLM-training-data extension surface
(SURVEY §2.12): benchmark decontamination, sequence packing, rule-based
quality gating, repetition screening, and domain-mix reweighting.

All deterministic, built-in-expression pipelines (no Python UDFs) so each
operator is both DuckDB-oracle-checkable and codegen'd at 100 TB.

Scale notes:
- ``ngram_decontaminate``: the benchmark side is tiny by construction
  (eval sets are MBs, the corpus is TBs), so its distinct n-gram set is
  broadcast and the contamination join is map-side — the corpus is
  scanned exactly once and never shuffled on the gram key.
- ``pack_sequences``: two-phase distributed prefix sum — no task ever
  sorts more than one id-range bucket of one stream; the only
  whole-stream state is a (streams × n_buckets)-row subtotal frame.
- ``top_token_stats``: two partial-aggregated shuffles (doc×token, then
  doc); token rows are (id, word) pairs — never the document body.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window as W, functions as F

from .text import LANG_MARKERS, token_count, tokens
from .text import shingle_count_rows, shingle_set_rows, shingles

__all__ = [
    "ngram_decontaminate", "pack_sequences", "quality_gate",
    "top_token_stats", "source_mix_weights", "ALL_MARKER_WORDS",
    "redact_terms", "pii_scrub", "length_bucket",
    "PII_PATTERNS", "LENGTH_BUCKETS",
    "hex_prefix_int", "shard_manifest", "repeated_ngrams", "chunk_documents",
]


def ngram_decontaminate(
    docs: DataFrame,
    bench_pred: Column,
    n: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
    impl: str = "arrow",
) -> DataFrame:
    """Benchmark decontamination: corpus documents sharing at least one
    distinct word ``n``-gram with the benchmark subset (rows where
    ``bench_pred`` holds), with the count of distinct shared grams.

    The standard pre-training hygiene step (filter training docs that
    textually overlap an eval set). Returns ``(doc_id, n_hits)`` for
    contaminated docs only.

    Scale shape exploits the same asymmetry as `semantic_decontaminate`:
    eval sets are thousands of documents while the corpus is billions.
    ``impl="arrow"`` (default) collects the DISTINCT benchmark grams
    driver-side (bounded by the eval set, the same discipline as the
    IVF codebook / probe collects) and fuses tokenize → shingle →
    membership → per-doc distinct-hit count into ONE ``mapInPandas``
    scan: the corpus never joins, never explodes into gram rows, and
    never shuffles AT ALL — the plan is scan → kernel, zero exchanges.
    Python does the gram slicing, but as C-level set ops per document
    (the interpreted-lambda flavor below pays a Catalyst eval per
    token·gram element, the same ~100× gap as every other HOF hot
    path here).

    ``impl="builtin"`` keeps the Python-free flavor as the
    fallback/cross-check: grams built row-locally with array
    expressions (the window-exec ``shingle_rows`` path would shuffle
    the token stream on doc just to build grams), probed against the
    broadcast benchmark set; ~every row dies in that map-side join, so
    per-doc gram dedup runs AFTER the kill-filter and the one corpus
    exchange carries hit rows, not the corpus.
    """
    gram_arr = shingles(F.col(text_col), n)
    bench_grams = (
        docs.filter(bench_pred).select(F.explode(gram_arr).alias("sh")).distinct()
    )
    if impl == "arrow":
        import pandas as pd

        from .text import py_tokens

        bench = frozenset(r[0] for r in bench_grams.collect())
        id_type = dict(docs.dtypes)[id_col]
        schema = f"{id_col} {id_type}, n_hits long"

        def scan(batches):
            for pdf in batches:
                ids_out, hits_out = [], []
                for did, txt in zip(
                    pdf[id_col].to_list(), pdf[text_col].to_list()
                ):
                    if txt is None:
                        continue
                    # replicate tokens()/shingles() exactly (py_tokens:
                    # Java \s + space-only trim); docs shorter than n
                    # yield their single truncated gram
                    toks = py_tokens(txt)
                    hi = max(len(toks) - n, 0)
                    grams = {
                        " ".join(toks[i : i + n]) for i in range(hi + 1)
                    }
                    c = len(grams & bench)
                    if c:
                        ids_out.append(did)
                        hits_out.append(c)
                if ids_out:
                    yield pd.DataFrame({id_col: ids_out, "n_hits": hits_out})

        return (
            docs.filter(~bench_pred)
            .select(id_col, text_col)
            .mapInPandas(scan, schema)
        )

    corpus = docs.filter(~bench_pred).select(
        F.col(id_col), F.explode(gram_arr).alias("sh")
    )
    return (
        corpus.join(F.broadcast(bench_grams), "sh")
        .groupBy(id_col)
        .agg(F.count_distinct(F.col("sh")).alias("n_hits"))
    )


#: measured crossover (tools/scale_pack.py, SCALE.md): below ~40k docs
#: in the largest stream, the bucketed two-phase prefix sum's fixed
#: overhead (eager percentile-ladder job + ledger persist + two extra
#: joins, ~+0.35 s at sf0.1) exceeds what it saves; above it, the
#: single-window path's one-task-per-stream sort is the 100 TB ceiling
#: the bucketed path removes (49.1 s -> 4.8 s at 8M docs/stream).
PACK_BUCKETED_CROSSOVER = 40_000


def pack_sequences(
    docs: DataFrame,
    budget: int = 512,
    part_col: str = "lang",
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int | str = "auto",
) -> DataFrame:
    """Concat-then-chunk sequence packing: within each ``part_col``
    stream, documents are concatenated in ``id_col`` order and split into
    fixed ``budget``-token training sequences; each doc is tagged with the
    sequence its first token lands in (docs may straddle a boundary,
    exactly like LLM pre-training context-window chunking).

    Adds ``n_tokens`` (BPE-ish count), ``tok_offset`` (tokens before this
    doc in its stream) and ``seq_id``.

    Scale shape — two-phase distributed prefix sum. A naive
    ``Window.partitionBy(part_col).orderBy(id_col)`` prefix sum forces
    ONE task to sort and scan an entire stream; at corpus scale a
    dominant language is a single executor sorting terabytes. Instead:

    1. Text is tokenized exactly ONCE into a narrow persisted ledger
       ``(part, id, n_tokens)`` — ~0.1% of corpus bytes, evictable and
       deterministic to recompute — so none of the prefix machinery
       ever touches the document bodies.
    2. A plan-build-time job collects an (streams x ``n_buckets``-1)
       percentile ladder over ``id_col`` (same bounded-collect
       discipline as ``zorder_key``'s min/max probe) and inlines it as
       literals, so bucket assignment is a deterministic pure function
       of the row even if the cached ledger is evicted and recomputed.
    3. Each ledger row maps into the id-range bucket the ladder assigns
       (order-preserving by construction), and the inclusive prefix sum
       runs per ``(part_col, bucket)`` — every sort task bounded by one
       bucket of one stream, ~1/``n_buckets`` of the old ceiling; raise
       ``n_buckets`` with the cluster.
    4. Per-bucket token subtotals (a tiny streams x buckets frame)
       cumulate over the bucket index and broadcast back; the global
       offset is ``bucket_base + local_prefix - n_tokens`` — exact long
       arithmetic, bit-identical to the single-window formulation —
       and the finished narrow offsets join back to the wide rows on
       ``(part_col, id_col)`` (null-safe), the one full-width shuffle,
       matching the single-window plan's one full-width exchange.

    Precondition: ``(part_col, id_col)`` identifies rows uniquely —
    already required for the packing order itself to be well-defined.

    The ledger cache is evictable (MEMORY_AND_DISK, deterministic to
    recompute) and ATTACHED to the returned frame (round 9 — the
    owned-cache contract of `functions/caching.py`, same as the
    minhash pair builders): long-lived sessions packing many corpora
    release each call's ledger with
    ``caching.release_owned_caches(packed)`` once the packed output is
    consumed, instead of a blanket ``spark.catalog.clearCache()``.

    ``n_buckets="auto"`` (default) picks the path itself: one narrow
    count job (``part_col`` only — column-pruned, partial-aggregated)
    sizes the largest stream and takes the single-window branch below
    `PACK_BUCKETED_CROSSOVER` rows, the 32-bucket branch above it —
    callers shouldn't have to know the crossover. Pass an explicit int
    to pin a path (tests and the scale harness do). Both branches are
    bit-identical by the exact-long-arithmetic argument above.
    """
    if n_buckets == "auto":
        mx = (
            docs.groupBy(part_col).count()
            .agg(F.max("count")).collect()[0][0]
        )
        n_buckets = 1 if (mx or 0) < PACK_BUCKETED_CROSSOVER else 32
    n_toks = token_count(F.col(text_col))
    if n_buckets <= 1:
        from .caching import attach_owned

        w = (
            W.partitionBy(part_col)
            .orderBy(id_col)
            .rowsBetween(W.unboundedPreceding, W.currentRow)
        )
        # attach_owned with nothing owned: the single-window path
        # persists no ledger, but the result still carries the handle
        # stamp so release_owned_caches can tell "builder result,
        # nothing to release" (0) from a derived-frame misuse (None)
        return attach_owned(
            docs.withColumn("n_tokens", n_toks)
            .withColumn(
                "tok_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
            )
            .withColumn("seq_id", F.floor(F.col("tok_offset") / budget)),
            [],
        )

    from pyspark.sql import types as T

    numeric = (
        T.ByteType, T.ShortType, T.IntegerType, T.LongType,
        T.FloatType, T.DoubleType, T.DecimalType, T.TimestampType,
    )
    id_type = docs.schema[id_col].dataType
    if isinstance(id_type, numeric):
        proxy = F.col(id_col).cast("double")
    elif isinstance(id_type, T.DateType):
        # DATE has no direct DOUBLE cast — epoch-day count is monotone
        proxy = F.unix_date(F.col(id_col)).cast("double")
    else:
        # Order-preserving numeric surrogate for non-numeric ids: the
        # first 7 UTF-8 bytes as a base-16 integer, RIGHT-PADDED to a
        # fixed 14 hex digits — without the pad, a short id's value
        # ('b' → 0x62) compares against a longer id's higher-place
        # digits ('ab' → 0x6162) and the proxy inverts binary string
        # order. Padded, it is monotone non-decreasing under Spark's
        # binary collation; ids that collide on the 7-byte prefix
        # simply share a bucket (slightly uneven buckets, never a
        # wrong offset).
        proxy = F.conv(
            F.rpad(
                F.substring(
                    F.hex(F.encode(F.col(id_col).cast("string"), "UTF-8")),
                    1,
                    14,
                ),
                14,
                "0",
            ),
            16,
            10,
        ).cast("double")

    # Phase 1: the narrow token ledger — the ONLY pass over the text.
    narrow = docs.select(
        F.col(part_col),
        F.col(id_col),
        n_toks.alias("n_tokens"),
        proxy.alias("_pv"),
    ).persist()

    # Eager, bounded: the percentile ladder (fills the ledger cache).
    qs = [i / n_buckets for i in range(1, n_buckets)]
    ladder = (
        narrow.groupBy(part_col)
        .agg(F.percentile_approx("_pv", qs, 10000).alias("_bounds"))
        .collect()
    )
    spark = docs.sparkSession
    part_field = docs.schema[part_col]
    bounds_df = spark.createDataFrame(
        # a stream whose proxy values are ALL NULL (every id null —
        # allowed by the (part,id)-uniqueness precondition) yields a
        # NULL percentile array; its rows all coalesce to proxy 0 on
        # the row side, so an empty ladder (single bucket) is correct
        [
            (
                r[part_col],
                [float(b) for b in (r["_bounds"] or [])],
            )
            for r in ladder
        ],
        T.StructType(
            [
                T.StructField(part_col, part_field.dataType, True),
                T.StructField("_bounds", T.ArrayType(T.DoubleType()), True),
            ]
        ),
    )

    # Phase 2: deterministic bucket, local inclusive prefix per bucket.
    bucketed = (
        narrow.join(F.broadcast(bounds_df), [part_col], "left")
        .withColumn(
            "_bkt",
            F.coalesce(
                F.size(F.filter("_bounds", lambda b: b < F.col("_pv"))),
                F.lit(0),
            ),
        )
        .drop("_pv", "_bounds")
    )
    w_loc = (
        W.partitionBy(part_col, "_bkt")
        .orderBy(id_col)
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )

    # Phase 3: tiny subtotal frame -> cumulative bucket bases, broadcast.
    sub = bucketed.groupBy(part_col, "_bkt").agg(
        F.sum("n_tokens").alias("_sub")
    )
    w_cum = (
        W.partitionBy(part_col)
        .orderBy("_bkt")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    base = sub.select(
        F.col(part_col),
        F.col("_bkt"),
        (F.sum("_sub").over(w_cum) - F.col("_sub")).alias("_base"),
    )
    offsets = (
        bucketed.withColumn("_loc", F.sum("n_tokens").over(w_loc))
        .join(F.broadcast(base), [part_col, "_bkt"], "left")
        .select(
            F.col(part_col),
            F.col(id_col),
            F.col("n_tokens"),
            (
                F.coalesce(F.col("_base"), F.lit(0).cast("long"))
                + F.col("_loc")
                - F.col("n_tokens")
            ).alias("tok_offset"),
        )
    )

    # Phase 4: the one full-width shuffle — wide rows meet their offsets.
    d, o = docs.alias("_d"), offsets.alias("_o")
    cond = F.col(f"_d.{part_col}").eqNullSafe(
        F.col(f"_o.{part_col}")
    ) & F.col(f"_d.{id_col}").eqNullSafe(F.col(f"_o.{id_col}"))
    base_cols = [
        c for c in docs.columns if c not in ("n_tokens", "tok_offset", "seq_id")
    ]
    from .caching import attach_owned

    return attach_owned(
        d.join(o, cond, "inner")
        .select(
            *[F.col(f"_d.{c}") for c in base_cols],
            F.col("_o.n_tokens").alias("n_tokens"),
            F.col("_o.tok_offset").alias("tok_offset"),
        )
        .withColumn("seq_id", F.floor(F.col("tok_offset") / budget)),
        [narrow],
    )


#: union of every language's marker words — the stopword probe for the
#: quality gate (a doc with zero stopwords in any language is suspect).
ALL_MARKER_WORDS: tuple[str, ...] = tuple(
    sorted({w for words in LANG_MARKERS.values() for w in words})
)


def quality_gate(
    docs: DataFrame,
    text_col: str = "text",
    min_words: int = 10,
    max_words: int = 2000,
    min_mwl: float = 2.0,
    max_mwl: float = 12.0,
    min_ttr: float = 0.2,
    max_symbol_ratio: float = 0.1,
) -> DataFrame:
    """Gopher-style rule filter: per-document boolean rule columns plus
    the conjunction ``keep``. Pure map-side arithmetic — at corpus scale
    this runs inside the scan stage.

    Rules: word-count band, mean-word-length band, type-token-ratio
    floor, symbol-to-char ratio cap, and a stopword-presence probe over
    the union of language marker words.
    """
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    n_chars = F.length(t)
    mwl = F.length(F.regexp_replace(t, r"\s+", "")) / n_words
    ttr = F.size(F.array_distinct(toks)) / n_words
    sym_ratio = F.length(F.regexp_replace(t, r"[a-zA-Z0-9\s]", "")) / F.greatest(
        n_chars, F.lit(1)
    )
    has_stop = (
        F.size(
            F.array_intersect(
                F.array_distinct(F.split(F.trim(F.lower(t)), r"\s+")),
                F.array(*[F.lit(w) for w in ALL_MARKER_WORDS]),
            )
        )
        > 0
    )
    rules = {
        "ok_len": (n_words >= min_words) & (n_words <= max_words),
        "ok_mwl": (mwl >= min_mwl) & (mwl <= max_mwl),
        "ok_ttr": ttr >= min_ttr,
        "ok_sym": sym_ratio <= max_symbol_ratio,
        "ok_stop": has_stop,
    }
    out = docs.withColumns(rules)
    keep = None
    for c in rules:
        keep = F.col(c) if keep is None else (keep & F.col(c))
    return out.withColumn("keep", keep)


def top_token_stats(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Repetition screen: per document, the most frequent whitespace
    token and its share of all tokens (ties broken toward the
    lexicographically largest token, deterministically).

    Shape: explode to (id, token) rows, partial-aggregated count per
    (id, token), then a per-id max over (count, token) structs — the
    document body itself is never shuffled.
    """
    tok = docs.select(
        F.col(id_col), F.explode(tokens(F.col(text_col))).alias("t")
    )
    cnt = tok.groupBy(id_col, "t").agg(F.count(F.lit(1)).alias("n"))
    return (
        cnt.groupBy(id_col)
        .agg(
            F.max(F.struct(F.col("n").alias("n"), F.col("t").alias("t"))).alias("top"),
            F.sum("n").alias("n_tokens"),
        )
        .select(
            id_col,
            F.col("top.t").alias("top_token"),
            F.col("top.n").alias("top_n"),
            F.col("n_tokens"),
            F.round(F.col("top.n") / F.col("n_tokens"), 8).alias("top_ratio"),
            (F.col("top.n") / F.col("n_tokens") > 0.1).alias("repetitive"),
        )
    )


def blocklist_pattern(terms: tuple[str, ...]) -> str:
    """The shared word-boundary alternation over ESCAPED terms —
    exported so the DuckDB oracle builds its pattern from the same
    function. Escaping matters: a raw term like 'c++' would be a
    dangling quantifier (PatternSyntaxException at execution) and 'a.b'
    would silently over-match 'aXb'; re.escape only backslash-escapes
    non-alphanumerics, which java.util.regex and RE2 both accept. An
    empty blocklist is rejected: '\\b(?:)\\b' matches the empty string
    at every word boundary and would 'redact' the gaps between words.

    Boundary caveat: \\b anchors bind at WORD-character edges, so a
    term that starts or ends with a non-word character ('c++', '.env')
    only matches where its non-word edge touches a word character —
    'use c++ now' has no boundary between '+' and ' '. Terms are
    expected to be word-ish; punctuation-edged terms need a custom
    pattern, not this helper."""
    if not terms:
        raise ValueError("redact_terms: empty blocklist")
    return r"\b(?:" + "|".join(re.escape(t) for t in terms) + r")\b"


def redact_terms(
    docs: DataFrame,
    terms: tuple[str, ...],
    placeholder: str = "<REDACTED>",
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Blocklist redaction: replace every word-boundary occurrence of a
    blocklisted term with ``placeholder`` and report the per-document hit
    count, redacted length, and a sha256 content digest of the redacted
    text (so downstream exact-dedup keys stay comparable).

    The blocklist compiles into ONE alternation regex evaluated map-side
    inside the scan stage — no joins, no shuffles, no per-term passes.
    The pattern sticks to the RE2-compatible subset (no backrefs or
    lookarounds) so the same regex runs in Spark (java.util.regex), RE2
    engines, and the DuckDB oracle byte-identically.
    """
    pat = blocklist_pattern(terms)
    t = F.col(text_col)
    red = F.regexp_replace(t, pat, placeholder)
    return docs.select(
        F.col(id_col),
        F.size(F.regexp_extract_all(t, F.lit(pat), 0)).alias("n_redacted"),
        F.length(red).alias("redacted_len"),
        F.sha2(red, 256).alias("redacted_sha"),
    )


#: PII patterns in the RE2-compatible regex subset (no backreferences,
#: no lookaround) so the identical pattern string runs in Spark's
#: java.util.regex AND the DuckDB oracle's RE2.  Order matters: emails
#: are scrubbed before phones (digits inside an email must not be
#: re-matched), phones before bare IPs.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"(?:\+?[0-9]{1,2}[-. ]?)?\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}", "<PHONE>"),
    ("ipv4", r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b", "<IP>"),
)


def pii_scrub(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """PII scrubbing: chained regexp_replace of emails → phone numbers →
    IPv4 addresses with typed placeholders, plus per-document counts of
    each PII class. Counts run PROGRESSIVELY — each class is counted on
    the text already scrubbed of the earlier classes — so they
    reconcile exactly with the replacements made: digits inside an
    email count as the one <EMAIL> hit, never additionally as a phone
    or IP (counting every class on the raw text would report n_phone=1
    for '555.123.4567@mail.com' while no <PHONE> was ever inserted).

    Pure map-side expression work — at corpus scale this fuses into the
    scan stage like every other row-local curation rule.  The pattern
    set is deliberately the high-precision core (formats that are
    near-unambiguous); recall-heavy patterns (names, addresses) need an
    NER pass, which belongs in the `multimodal`-style Arrow-UDF tier,
    not here.
    """
    scrubbed = F.col(text_col)
    counts = []
    for name, pat, token in PII_PATTERNS:
        counts.append(
            F.size(F.regexp_extract_all(scrubbed, F.lit(pat), 0)).alias(
                f"n_{name}"
            )
        )
        scrubbed = F.regexp_replace(scrubbed, pat, token)
    return docs.select(
        F.col(id_col),
        *counts,
        F.length(scrubbed).alias("scrubbed_len"),
        F.sha2(scrubbed, 256).alias("scrubbed_sha"),
    )


#: fixed power-of-two token-count boundaries for batch-shape bucketing.
#: Integer CASE comparisons, not log2 floats — the bucket edge must not
#: depend on the engine's last-ulp rounding of log2(2^k).
LENGTH_BUCKETS: tuple[int, ...] = (16, 32, 64, 128, 256, 512, 1024)


def length_bucket(n_tokens: Column) -> Column:
    """Smallest power-of-two boundary ≥ ``n_tokens`` (capped at the top
    bucket), as the bucket label for sequence-length batching."""
    out = F.lit(LENGTH_BUCKETS[-1])
    for b in reversed(LENGTH_BUCKETS):
        out = F.when(n_tokens <= b, F.lit(b)).otherwise(out)
    return out


def source_mix_weights(
    docs: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    cap: float = 3.0,
) -> DataFrame:
    """Domain-mix reweighting: per-source token share and the sampling
    weight that moves the mix toward uniform-over-sources, capped at
    ``cap`` (never upsample a tiny domain more than ``cap``×).

    One shuffle (groupBy source → ~#domains rows) then empty-frame
    window arithmetic over that tiny aggregate — free at any scale.
    """
    per = docs.groupBy(source_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(token_count(F.col(text_col))).alias("tot_tokens"),
    )
    all_w = W.partitionBy().rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    share = F.col("tot_tokens") / F.sum("tot_tokens").over(all_w)
    target = F.lit(1.0) / F.count(F.lit(1)).over(all_w)
    return per.select(
        source_col,
        "n_docs",
        "tot_tokens",
        F.round(share, 8).alias("token_share"),
        F.round(F.least(target / share, F.lit(cap)), 8).alias("mix_weight"),
    )


def hex_prefix_int(hex_col: str, n_nibbles: int = 8) -> Column:
    """First ``n_nibbles`` hex chars of a hex-string column as a BIGINT,
    via locate() arithmetic — portable to any engine with strpos, so an
    oracle can replay the value without a hex-cast builtin. 8 nibbles
    keeps the value < 2^32 (BIGINT-safe products with shard counts)."""
    terms = " + ".join(
        f"(CAST(locate(substr({hex_col}, {i + 1}, 1), '0123456789abcdef') AS BIGINT) - 1)"
        f" * {16 ** (n_nibbles - 1 - i)}"
        for i in range(n_nibbles)
    )
    return F.expr(f"CAST({terms} AS BIGINT)")


def shard_manifest(
    docs: DataFrame,
    n_shards: int = 16,
    id_col: str = "doc_id",
    salt: str = "shuffle:v1",
) -> DataFrame:
    """Deterministic training-order manifest: every document gets a
    pseudo-random (but replayable) shard and position, the op every
    training run needs between "corpus is curated" and "corpus is read
    in shuffled order".

    Scale shape — NO global sort: shard_id is parsed map-side from the
    md5 shuffle key (hash-uniform over ``n_shards``), and pos_in_shard
    is a row_number per shard — ONE hash-partition shuffle on shard_id
    and a per-shard local sort, exactly how a 1000-executor writer lays
    out shard files. A window ordered over the whole corpus (the naive
    form) would funnel 100 TB through a single range exchange.

    Re-keying on ``salt`` reshuffles every epoch without touching data:
    the manifest is (id, key, shard, pos) — the document bodies never
    move.
    """
    keyed = docs.select(
        F.col(id_col),
        F.md5(F.concat_ws(":", F.lit(salt), F.col(id_col).cast("string"))).alias(
            "shuffle_key"
        ),
    ).withColumn(
        "shard_id", (hex_prefix_int("shuffle_key", 8) % n_shards).cast("int")
    )
    w = W.partitionBy("shard_id").orderBy("shuffle_key", id_col)
    return keyed.withColumn(
        "pos_in_shard", (F.row_number().over(w) - 1).cast("long")
    )


def repeated_ngrams(
    docs: DataFrame,
    n: int = 8,
    min_docs: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Intra-corpus repeated-substring mining: word ``n``-gram windows
    that recur across ≥ ``min_docs`` distinct documents — the signal
    behind boilerplate/template removal and substring-level dedup
    (headers, footers, license blocks repeat verbatim across pages).

    Scale shape: windows come from ``shingle_count_rows``'s Arrow
    kernel — grams built ROW-LOCALLY with the within-doc collapse
    already COMPLETE (zero network bytes for gram construction; the
    window flavor's token-stream exchange + sort + 7-lead window
    disappear — r11). Because each ``(doc, sh)`` arrives globally
    unique, ``n_docs`` is a plain ``COUNT(*)`` and ``n_occ`` a
    ``SUM(occ)`` — Spark plans ONE partial-aggregated exchange on the
    gram instead of the two-exchange COUNT(DISTINCT doc) rewrite
    (partial-by-(sh,doc) → Exchange(sh,doc) → partial-by-(sh) →
    Exchange(sh)).
    With ``hash_grams=False`` the gram string itself is the shuffled
    payload (≈ n words per row). ``hash_grams=True`` xxhash64s each
    gram map-side BEFORE the exchange, so the shuffle key is a fixed
    8-byte long regardless of ``n`` — the dial for long-gram mining at
    100 TB, where the gram bytes dominate shuffle volume. Counts
    (n_docs, n_occ, first/last doc) are identical modulo 64-bit hash
    collisions (~N²/2⁶⁵ expected — negligible below ~10¹⁸ distinct
    grams; a within-doc collision would also nudge n_docs, the same
    caveat class); the literal gram text is traded for its hash in the
    report (``gram`` column: string vs signed-long decimal string)."""
    sh = shingle_count_rows(docs, n, id_col, text_col)
    if hash_grams:
        sh = sh.select("doc", F.xxhash64("sh").alias("sh"), "occ")
    out = (
        sh.groupBy("sh")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("occ").alias("n_occ"),
            F.min("doc").alias("first_doc"),
            F.max("doc").alias("last_doc"),
        )
        .filter(F.col("n_docs") >= min_docs)
        .withColumnRenamed("sh", "gram")
    )
    if hash_grams:
        out = out.withColumn("gram", F.col("gram").cast("string"))
    return out


def novelty_scores(
    docs: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
    hash_grams: bool = False,
) -> DataFrame:
    """Per-document novelty: the fraction of a doc's distinct word
    ``n``-grams that appear in NO other document — the data-valuation /
    memorization-risk signal that prioritizes what dedup should keep.

    Round-11 shape (guide §2.3/§2.4): a gram is novel iff its document
    frequency is 1, and a df-1 gram has exactly ONE owner — so per-doc
    novel counts can be attributed INSIDE the df aggregate
    (``min(doc)`` is the owner whenever ``df == 1``) instead of joining
    df back onto the posting stream. The postings now cross ONE
    partial-aggregated gram-keyed exchange (hot grams collapse
    map-side, so a boilerplate gram shared by millions of docs cannot
    skew a task); everything downstream — the df-1 owner counts, the
    per-doc gram totals (the kernel's map-side ``sz``), the final join
    — is doc-sized. The previous shape built the same distinct
    postings with a window + dedup exchange and then shuffled the FULL
    posting stream twice more (df join-back + doc-keyed re-aggregate).
    ``n_shared = sz − novel`` and ``novelty = 1 − shared/sz`` are the
    same integers and the same double division as before,
    bit-identical. ``hash_grams=True`` applies the same xxhash64
    map-side shrink as :func:`repeated_ngrams` (8-byte keys through
    the one exchange that remains); under a 64-bit collision it
    double-counts one df where the pre-r11 shape silently merged two
    grams — both ~N²/2⁶⁵ and inside the documented
    bit-identical-modulo-collisions tolerance."""
    posts = shingle_set_rows(docs, n, id_col, text_col)
    sh = posts.select("doc", "sh")
    if hash_grams:
        sh = sh.select("doc", F.xxhash64("sh").alias("sh"))
    # per-doc distinct-gram totals, map-side from the kernel; the
    # dropDuplicates collapses to one row per doc before its exchange
    # (each doc's rows are contiguous in one kernel partition)
    base = posts.select("doc", "sz").dropDuplicates(["doc"])
    novel = (
        sh.groupBy("sh")
        .agg(F.count(F.lit(1)).alias("df"), F.min("doc").alias("d1"))
        .filter(F.col("df") == 1)
        .groupBy(F.col("d1").alias("doc"))
        .agg(F.count(F.lit(1)).alias("nov"))
    )
    nov = F.coalesce("nov", F.lit(0))
    return base.join(novel, "doc", "left").select(
        F.col("doc").alias(id_col),
        F.col("sz").alias("n_grams"),
        (F.col("sz") - nov).cast("long").alias("n_shared"),
        F.round(F.lit(1.0) - (F.col("sz") - nov) / F.col("sz"), 8).alias(
            "novelty"
        ),
    )


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 64,
    overlap: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Fixed-size token chunking with overlap — the RAG / context-window
    splitter (pack_sequences concatenates docs into training rows; this
    splits one doc into retrieval units). Chunks start every
    ``chunk_tokens - overlap`` tokens; the last chunk may be short.

    Entirely row-local (token array slices inside the row, then one
    explode) — no shuffle at any scale; the sha256 digest pins chunk
    CONTENT for downstream exact-dedup of chunks with the same 32-byte
    shuffle-key discipline as document dedup.

    NULL-text documents contribute NO chunks (same convention as every
    other text operator here) — without the filter, size(NULL) → NULL
    → greatest(NULL,1)=1 would fabricate one phantom chunk per null doc
    whose chunk_sha is sha256('') and whose n_tok is NULL, colliding
    with genuinely-empty chunks in downstream chunk dedup.
    """
    step = chunk_tokens - overlap
    assert step > 0
    docs = docs.filter(F.col(text_col).isNotNull())
    toks = tokens(F.col(text_col))
    # n_tok counts NON-EMPTY tokens in the slice (an empty/whitespace-only
    # document tokenizes to [''] — re-splitting the joined chunk would
    # report n_tok=1 for a zero-token chunk).
    chunks = F.transform(
        F.sequence(F.lit(1), F.greatest(F.size(toks), F.lit(1)), F.lit(step)),
        lambda s: F.struct(
            s.alias("start_tok"),
            F.concat_ws(" ", F.slice(toks, s, chunk_tokens)).alias("chunk"),
            F.size(
                F.filter(F.slice(toks, s, chunk_tokens), lambda t: t != F.lit(""))
            ).alias("n_tok"),
        ),
    )
    return docs.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_id", "c")
    ).select(
        id_col,
        F.col("chunk_id").cast("long").alias("chunk_id"),
        F.col("c.start_tok").cast("long").alias("start_tok"),
        F.col("c.n_tok").cast("long").alias("n_tok"),
        F.sha2(F.col("c.chunk"), 256).alias("chunk_sha"),
    )
