"""Deduplication operators (SURVEY §2.3 + extension §2.12).

The reference dedups within a write batch by composite (PK, SK) key,
keeping the first occurrence (scripts/lambda1.py:119-150). At scale the
idiomatic Spark forms are:

- exact keyed dedup: window row_number over the key, ordered by a
  deterministic tiebreaker — a single shuffle on the key, partial-agg
  free, and (unlike ``dropDuplicates``) reproducible;
- exact content dedup: hash the normalized payload, dedup on the hash —
  the hash is computed map-side so the shuffle carries 32 bytes per row
  instead of the payload;
- near-dup: shingle → MinHash → LSH banding (see functions/minhash.py),
  which replaces the O(n²) pair space with per-band bucket joins.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame, Window, functions as F


def dedup_keyed(
    df: DataFrame, keys: Sequence[str], order_by: Sequence[str]
) -> DataFrame:
    """D1: keep the first row per key, "first" defined by ``order_by``
    (deterministic version of the reference's first-occurrence batch dedup,
    scripts/lambda1.py:119-150). One shuffle on ``keys``; at 100 TB this
    is the minimal-movement plan (row_number avoids a second agg-join
    pass that a groupBy(min)+join would need)."""
    w = Window.partitionBy(*keys).orderBy(*order_by)
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def dedup_exact_text(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_out: str = "text_hash",
) -> DataFrame:
    """X1: exact-content dedup by sha256 of the normalized text; the
    lowest id per hash survives. The 32-byte hash is the shuffle key, so
    the (potentially multi-KB) document body never moves twice."""
    hashed = df.withColumn(
        hash_out, F.sha2(F.lower(F.trim(F.col(text_col))), 256)
    )
    return dedup_keyed(hashed, [hash_out], [id_col])


def dedup_priority(
    df: DataFrame,
    priority_col: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_out: str = "text_hash",
) -> DataFrame:
    """X1 with source preference: among exact duplicates keep the row
    with the lowest (priority, id) — the corpus-curation rule "when the
    same document arrives from several feeds, keep the most trusted
    one". Adds ``dup_count`` (group size) for lineage reports.

    Same scale shape as dedup_exact_text: the 32-byte hash is the only
    shuffle key; ranking and group size share ONE window partitioning.
    """
    hashed = df.withColumn(
        hash_out, F.sha2(F.lower(F.trim(F.col(text_col))), 256)
    )
    w = Window.partitionBy(hash_out)
    rank = F.row_number().over(w.orderBy(priority_col, id_col))
    return (
        hashed.withColumn("__rn", rank)
        .withColumn("dup_count", F.count(F.lit(1)).over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def normalized_content_hash(col):
    """THE normalized exact-content formula — the single definition the
    whole exact family shares (round 10, from review: three independent
    copies of this expression is exactly the formula-drift hazard the
    ``EXACT_SIG_VERSION`` marker exists to catch; one definition makes
    the version label true). sha256 over lower(trim(coalesce(col, ''))):
    NULL hashes as empty content so window grouping and join matching
    answer "same content?" identically (see dedup_incremental's
    docstring for why a raw sha2(NULL)=NULL key diverges). Used by
    `dedup_incremental`, `exact_dedup_audit`, and the streaming module's
    `_content_hash` / `stream_dedup_exact_sink`. Bump EXACT_SIG_VERSION
    (streaming/dedup.py) on ANY change here — persisted exact indexes
    carry it. (`dedup_exact_text`/`dedup_priority` keep their own
    coalesce-free hash: it is a declared OUTPUT column with oracle
    parity pinned to the raw formula.)"""
    return F.sha2(F.lower(F.trim(F.coalesce(col, F.lit("")))), 256)


def dedup_incremental(
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    hash_out: str = "text_hash",
    corpus_hash_col: str | None = None,
) -> DataFrame:
    """X1, incremental flavor: dedup a NEW batch against an already-
    ingested corpus — the shape every continuously-fed training pipeline
    runs per ingest cycle. Survivors are incoming docs whose normalized-
    content hash (a) wins within the batch (lowest id) and (b) does not
    already exist in the corpus. ``n_batch_dups`` reports how many batch
    rows shared the hash (lineage for the drop report).

    NULL text hashes as empty content (coalesce to ''): the within-batch
    window and the corpus anti-join must answer "is this the same
    content?" the SAME way, and a raw sha2(NULL)=NULL key would say yes
    in the window (nulls group together) but no in the join (null keys
    never match) — a null-text survivor would then re-ingest every
    cycle.

    Scale shape: both sides hash map-side, so the within-batch window
    and the anti-join each shuffle 32-byte keys, never document bodies.
    At 100 TB pass the persisted hash index of prior ingests via
    ``corpus_hash_col`` (bucketed on the hash → co-located anti-join),
    which is what makes the incremental cost proportional to the BATCH;
    the default text-hashing corpus side re-scans the corpus each cycle
    and is the small-corpus convenience path (same dial as
    streaming/dedup.stream_dedup_incremental).
    """

    _h = normalized_content_hash

    hashed = incoming.withColumn(hash_out, _h(F.col(text_col)))
    w = Window.partitionBy(hash_out)
    batch_best = (
        hashed.withColumn("__rn", F.row_number().over(w.orderBy(id_col)))
        .withColumn("n_batch_dups", F.count(F.lit(1)).over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )
    if corpus_hash_col is not None:
        corpus_hashes = corpus.select(F.col(corpus_hash_col).alias(hash_out))
    else:
        corpus_hashes = corpus.select(_h(F.col(text_col)).alias(hash_out))
    return batch_best.join(corpus_hashes, hash_out, "left_anti")


def exact_dedup_audit(
    incoming: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """X1, audit flavor — the PER-DOC verdict frame `dedup_incremental`
    throws away: every incoming doc with its
    ``(doc, n_corpus_matches, n_prior_batch_matches, kept)`` row, the
    exact semantics `streaming/dedup.stream_dedup_exact_sink` records
    per micro-batch (this is its DuckDB-oracled batch twin — the drop
    REPORT a production ingest screen owes its operators, where the
    survivor frame alone can't answer "why was doc X dropped, and
    against what?").

    ``n_prior_batch_matches`` counts same-hash batch docs with a LOWER
    id (the deterministic lowest-id-wins rule); ``n_corpus_matches``
    counts corpus DOCS sharing the hash (the doc-keyed index ships one
    row per retained doc, so row count == doc count); ``kept`` iff both
    are zero — exactly `dedup_incremental`'s survivor set. Same
    null-as-empty content rule, same scale shape: both sides hash
    map-side, the window and the count-join shuffle 32-byte keys only.
    """

    _h = normalized_content_hash

    hashed = incoming.select(
        F.col(id_col).alias("doc"), _h(F.col(text_col)).alias("__th")
    )
    rn = F.row_number().over(Window.partitionBy("__th").orderBy("doc"))
    within = hashed.withColumn(
        "n_prior_batch_matches", (rn - F.lit(1)).cast("long")
    )
    corpus_counts = (
        corpus.select(_h(F.col(text_col)).alias("__th"))
        .groupBy("__th")
        .agg(F.count(F.lit(1)).alias("__cnt"))
    )
    return (
        within.join(corpus_counts, "__th", "left")
        .select(
            "doc",
            F.coalesce("__cnt", F.lit(0)).cast("long").alias(
                "n_corpus_matches"
            ),
            "n_prior_batch_matches",
        )
        .withColumn(
            "kept",
            (F.col("n_corpus_matches") == 0)
            & (F.col("n_prior_batch_matches") == 0),
        )
    )


def dedup_spans(
    docs: DataFrame,
    span_words: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """X1 at SUB-document granularity — C4-style span dedup: split each
    document into non-overlapping ``span_words``-word spans, keep only
    the globally FIRST occurrence of each exact span (lowest (doc, span
    position) — later repeats in other docs AND within the same doc are
    removed), and reassemble what survives. This is the technique that
    strips boilerplate/quotation duplication that whole-document dedup
    can't see (C4 did it at three-sentence spans; the reference has no
    text surface — mandated LLM-pipeline extension).

    Returns one row per input doc:
    ``(id, n_spans, n_spans_removed, rebuilt_sha)`` — the rebuilt text
    is hashed rather than emitted so the declared output stays compact
    and engine-comparable; callers wanting the text itself use the same
    ``rebuilt`` aggregation without the hash.

    Scale shape (r11 rework — guide §8's rule applied: every shuffle
    but the last moves a lightweight proxy, the payload moves once):
    the first-occurrence decision shuffles ONLY partial-aggregated
    ``(32-byte binary hash, min (id, idx))`` rows — the span TEXT
    never enters an exchange, and because the decision is a plain
    ``groupBy(hash).min(struct)`` the map side pre-collapses repeats
    (no sort, no window exec, no pinned repartition: the old
    compute-dense window stage that needed the width pin is gone —
    measured at sf0.1: window 0.92 s → groupBy 0.55 s, identical
    rows). Skew-safe: exact duplicates of one span all collapse into
    one group. Reassembly re-slices each doc's own token array AFTER
    a doc-keyed join of the bare ``(id, idx)`` decisions, so the
    document payload crosses the network once (or zero times when the
    decision frame broadcasts). The audit's ``n_spans`` is pure
    map-side arithmetic on the token-array length — the old second
    span-construction subtree + groupBy exchange are gone. NULL text
    = empty content (zero spans), the X1-family rule.
    """
    sw = int(span_words)
    meta = (
        _span_rows(docs, sw, id_col, text_col)
        .filter(F.col("span") != "")
        # binary, not hex: halves the decision shuffle's key bytes
        # (32 vs 64); purely plan-internal, never persisted (the
        # incremental flavor keeps hex — its hashes round-trip
        # through the persisted span index)
        .select(id_col, "idx", F.unhex(F.sha2(F.col("span"), 256)).alias("__h"))
    )
    kept = (
        meta.groupBy("__h")
        .agg(F.min(F.struct(F.col(id_col), F.col("idx"))).alias("__f"))
        .select(
            F.col(f"__f.{id_col}").alias(id_col),
            F.col("__f.idx").alias("idx"),
        )
    )
    return _span_audit(_base_words(docs, id_col, text_col), kept, id_col, sw)


#: Span-HASH formula version for persisted span indexes
#: (`streaming/dedup.seed_span_index` / `stream_dedup_spans_sink`
#: stamp it into the ``_SIG_FORMAT`` marker with the ``span_words``
#: parameter and assert it at index read — a seed at span_words=16
#: screened by a sink at span_words=32 would silently admit every
#: duplicate span). v1 = sha256 over whitespace-normalized
#: non-overlapping word spans (`_span_rows`).
SPAN_SIG_VERSION = 1


def _span_rows(
    docs: DataFrame, sw: int, id_col: str, text_col: str
) -> DataFrame:
    """(id, idx, span) rows — one per non-overlapping ``sw``-word span.

    EXPLODE-FIRST, build spans after: exploding a computed span array
    re-evaluates the whole construction expression once per OUTPUT
    row (Catalyst inlines the projection into Generate, and neither a
    post-projection exchange nor a nondeterministic sibling stops it
    — only a cache barrier did). Measured at 200k docs: explode of
    the span array 26 s vs 3 s for exploding the cheap INDEX sequence
    and slicing each span once per exploded row. The per-row __w copy
    the explode carries never shuffles — the hash exchange downstream
    projects it away first. Every doc emits ≥1 row (the sequence is
    never empty); empty/NULL text yields one empty-string span so the
    doc stays visible to audits."""
    base = _base_words(docs, id_col, text_col)
    return base.select(
        id_col,
        "__w",
        F.posexplode(
            F.expr(
                f"sequence(0, greatest(int(ceil(size(__w) / {sw}.0))"
                " - 1, 0))"
            )
        ).alias("idx", "_i"),
    ).select(
        id_col,
        "idx",
        F.expr(f"array_join(slice(__w, _i * {sw} + 1, {sw}), ' ')")
        .alias("span"),
    )


def _base_words(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(id, __w) rows — each doc's whitespace token array, the shared
    map-side base of span construction AND the audit's re-slice
    reassembly (both must tokenize identically or a rebuilt doc would
    hash differently from the spans that were kept from it)."""
    return docs.select(
        F.col(id_col),
        F.split(
            F.trim(F.coalesce(F.col(text_col), F.lit(""))), r"\s+"
        ).alias("__w"),
    )


def _span_audit(
    base: DataFrame, kept: DataFrame, id_col: str, sw: int
) -> DataFrame:
    """Audit frame ``(id, n_spans, n_spans_removed, rebuilt_sha)`` from
    the ``(id, __w)`` token base and bare ``(id, idx)`` keep decisions
    (r11 rework): the kept-idx list aggregates doc-keyed (tiny — two
    ints per surviving span; collect_list bounded by spans-per-doc,
    the bound the whole text suite carries), joins back to the base,
    and the surviving spans are re-sliced from the doc's OWN token
    array map-side — span text never shuffles. ``n_spans`` is array
    arithmetic on ``__w`` (ceil(len/sw); the single empty-token array
    a NULL/empty/whitespace-only text produces counts 0), exactly the
    count of non-empty spans `_span_rows` emits: the only empty token
    a Java-regex split can produce is a leading one, which lands in
    span 0 beside real tokens whenever the doc has any."""
    kept_agg = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_kept"),
        F.array_sort(F.collect_list("idx")).alias("__idxs"),
    )
    n_spans = (
        F.when(
            (F.size("__w") == 1) & (F.element_at("__w", 1) == F.lit("")),
            F.lit(0),
        )
        .otherwise(F.expr(f"int(ceil(size(__w) / {sw}.0))"))
        .cast("long")
    )
    rebuilt_sha = F.sha2(
        F.array_join(
            F.transform(
                F.col("__idxs"),
                lambda i: F.array_join(
                    F.slice(F.col("__w"), i * sw + 1, sw), " "
                ),
            ),
            " ",
        ),
        256,
    )
    empty_sha = F.sha2(F.lit(""), 256)
    return base.join(kept_agg, id_col, "left").select(
        id_col,
        n_spans.alias("n_spans"),
        (n_spans - F.coalesce(F.col("n_kept"), F.lit(0)))
        .cast("long")
        .alias("n_spans_removed"),
        F.coalesce(rebuilt_sha, empty_sha).alias("rebuilt_sha"),
    )


def dedup_spans_incremental(
    incoming: DataFrame,
    corpus: DataFrame,
    span_words: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
    corpus_span_hash_col: str | None = None,
) -> DataFrame:
    """`dedup_spans`, incremental flavor — the per-ingest-cycle shape of
    C4-style span dedup: spans of a NEW batch survive iff they (a) are
    the first occurrence within the batch (lowest (doc, position)) and
    (b) do not occur anywhere in the already-ingested corpus. Returns
    the same per-incoming-doc audit as `dedup_spans`.

    Equivalence contract (property-tested): when every corpus id orders
    before every batch id, this equals `dedup_spans(corpus ∪ batch)`
    restricted to the batch docs — the incremental path must never keep
    a span the global path would remove, or vice versa.

    Scale shape (r11 rework, same as `dedup_spans`): the batch side
    shuffles ONLY ``(id, idx, hash)`` metadata — span text never
    enters an exchange; window + anti-join share the hash key; the
    corpus side contributes only hashes; reassembly re-slices the
    incoming docs' own token arrays after a doc-keyed join of the
    keep decisions. At 100 TB pass the persisted span-hash index of
    prior ingests via ``corpus_span_hash_col`` (bucketed on the hash →
    co-located anti-join), making the cycle cost proportional to the
    BATCH; the default re-derives corpus spans each cycle — the
    small-corpus convenience path (same dial as `dedup_incremental`).
    """
    sw = int(span_words)
    kept = _kept_spans_incremental(
        incoming, corpus, span_words, id_col, text_col,
        corpus_span_hash_col,
    )
    return _span_audit(
        _base_words(incoming, id_col, text_col),
        kept.select(id_col, "idx"),
        id_col,
        sw,
    )


def _kept_spans_incremental(
    incoming: DataFrame,
    corpus: DataFrame,
    span_words: int,
    id_col: str,
    text_col: str,
    corpus_span_hash_col: str | None,
) -> DataFrame:
    """Surviving-span decisions ``(id, idx, __h)`` — the shared core of
    the batch audit and the streaming sink (which appends the
    survivors' hashes to its persisted index: kept spans are exactly
    the hashes the index does not yet contain, so appending them keeps
    index == every-span-hash-ever-seen). ``__h`` stays LOWERCASE HEX
    here — unlike `dedup_spans`' plan-internal binary hash — because
    these values round-trip through the persisted span index
    (`_SIG_FORMAT` v1 stores hex sha256 strings); span text is still
    projected away before the exchange, and the within-batch
    first-occurrence decision is the same partial-aggregated
    ``groupBy(hash).min(struct)`` as `dedup_spans` (r11) — the
    anti-join then reuses the groupBy's hash partitioning."""
    sw = int(span_words)
    meta = (
        _span_rows(incoming, sw, id_col, text_col)
        .filter(F.col("span") != "")
        .select(id_col, "idx", F.sha2(F.col("span"), 256).alias("__h"))
    )
    batch_first = (
        meta.groupBy("__h")
        .agg(F.min(F.struct(F.col(id_col), F.col("idx"))).alias("__f"))
        .select(
            "__h",
            F.col(f"__f.{id_col}").alias(id_col),
            F.col("__f.idx").alias("idx"),
        )
    )
    if corpus_span_hash_col is not None:
        corpus_hashes = corpus.select(
            F.col(corpus_span_hash_col).alias("__h")
        )
    else:
        corpus_hashes = (
            _span_rows(corpus, sw, id_col, text_col)
            .filter(F.col("span") != "")
            .select(F.sha2(F.col("span"), 256).alias("__h"))
        )
    return batch_first.join(corpus_hashes, "__h", "left_anti")
