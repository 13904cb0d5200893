"""Training-corpus curation queries over ``documents`` (SURVEY §2.12
extension surface): benchmark decontamination, sequence packing,
rule-based quality gating, repetition screening, domain-mix reweighting.

Tokenization contracts shared with the oracles:
- words: ``split(trim(text), '\\s+')`` == ``regexp_split_to_array``
- BPE-ish tokens: ``regexp_extract_all(text, BPE_ISH_PATTERN)`` both sides
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import curation as C
from ..operators.dedup import dedup_incremental
from ..functions.text import BPE_ISH_PATTERN, token_count
from ..sources import table
from .registry import declare

_PACK_BUDGET = 512


@declare(
    "decontaminate_ngrams",
    oracle="""
    WITH sh AS (
      SELECT doc_id AS doc, unnest(list_distinct(
        [array_to_string(toks[i:i+3], ' ')
         FOR i IN range(1, greatest(len(toks) - 3, 1) + 1)])) AS sh
      FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
            FROM documents) t),
    bench AS (SELECT DISTINCT sh FROM sh WHERE doc % 97 = 0)
    SELECT c.doc AS doc_id, COUNT(*) AS n_hits
    FROM sh c JOIN bench USING (sh)
    WHERE c.doc % 97 <> 0
    GROUP BY c.doc
    """,
)
def decontaminate_ngrams(spark, sf_dir):
    """Benchmark decontamination: training docs sharing any distinct word
    4-gram with the benchmark subset (doc_id % 97 == 0 stands in for the
    eval set). The benchmark gram set is broadcast — the corpus is
    scanned once and never shuffled on the gram key."""
    return C.ngram_decontaminate(
        table(spark, sf_dir, "documents"), bench_pred=F.col("doc_id") % 97 == 0, n=4
    )


@declare(
    "pack_sequences",
    oracle=rf"""
    WITH t AS (SELECT doc_id, lang,
                      CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
                        AS n_tokens
               FROM documents)
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                AS BIGINT) AS tok_offset,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                / {_PACK_BUDGET}) AS BIGINT) AS seq_id
    FROM t
    """,
)
def pack_sequences_q(spark, sf_dir):
    """Concat-then-chunk sequence packing: per-lang doc streams split
    into 512-token training sequences; each doc tagged with the sequence
    holding its first token (exactly LLM context-window chunking).
    ``n_buckets="auto"`` — the operator sizes the largest stream and
    picks the single-window path below the measured crossover (the
    test-sf case), the distributed two-phase prefix sum above it; the
    bucketed path stays on the correctness gate via
    `pack_sequences_bucketed` below."""
    return C.pack_sequences(
        table(spark, sf_dir, "documents"), budget=_PACK_BUDGET, part_col="lang"
    ).select("doc_id", "lang", "n_tokens", "tok_offset", "seq_id")


@declare(
    "pack_sequences_bucketed",
    oracle=rf"""
    WITH t AS (SELECT doc_id, lang,
                      CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
                        AS n_tokens
               FROM documents)
    SELECT doc_id, lang, n_tokens,
           CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens
                AS BIGINT) AS tok_offset,
           CAST(floor((SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) - n_tokens)
                / {_PACK_BUDGET}) AS BIGINT) AS seq_id
    FROM t
    """,
)
def pack_sequences_bucketed_q(spark, sf_dir):
    """The 100 TB path of `pack_sequences`, pinned explicitly on the
    correctness gate: n_buckets=32 forces the two-phase distributed
    prefix sum (percentile-ladder bucketing, per-(stream,bucket) local
    prefix, broadcast cumulative bases) regardless of corpus size. Same
    oracle as `pack_sequences` — the two paths are bit-identical by the
    exact-long-arithmetic argument in `functions/curation.py`."""
    return C.pack_sequences(
        table(spark, sf_dir, "documents"), budget=_PACK_BUDGET,
        part_col="lang", n_buckets=32,
    ).select("doc_id", "lang", "n_tokens", "tok_offset", "seq_id")


_BLOCKLIST = ("customer", "spark", "vector")
#: built by the SAME escaping helper redact_terms uses — the oracle
#: replays the escaped pattern, not a parallel hand-built one
_BLOCK_PAT = C.blocklist_pattern(_BLOCKLIST)


@declare(
    "redact_blocklist",
    oracle=f"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{_BLOCK_PAT}')) AS INT) AS n_redacted,
           CAST(length(regexp_replace(text, '{_BLOCK_PAT}', '<REDACTED>', 'g')) AS INT)
             AS redacted_len,
           sha256(regexp_replace(text, '{_BLOCK_PAT}', '<REDACTED>', 'g'))
             AS redacted_sha
    FROM documents
    """,
)
def redact_blocklist(spark, sf_dir):
    """Blocklist redaction: one alternation regex replaces every
    word-boundary blocklist hit with a placeholder, map-side; per-doc
    hit count plus a sha256 digest of the redacted text proves the
    rewrite content, not just its shape."""
    return C.redact_terms(table(spark, sf_dir, "documents"), _BLOCKLIST)


_PII_SCRUB_SQL = "text"
_PII_COUNT_PARTS = []
for _n, _pat, _tok in C.PII_PATTERNS:
    # PROGRESSIVE counts, mirroring pii_scrub exactly: each class is
    # counted on the text already scrubbed of the earlier classes
    _PII_COUNT_PARTS.append(
        f"CAST(len(regexp_extract_all({_PII_SCRUB_SQL}, '{_pat}')) AS INT)"
        f" AS n_{_n}"
    )
    _PII_SCRUB_SQL = f"regexp_replace({_PII_SCRUB_SQL}, '{_pat}', '{_tok}', 'g')"
_PII_COUNTS_SQL = ",\n           ".join(_PII_COUNT_PARTS)


@declare(
    "pii_scrub",
    oracle=f"""
    SELECT doc_id,
           {_PII_COUNTS_SQL},
           CAST(length({_PII_SCRUB_SQL}) AS INT) AS scrubbed_len,
           sha256({_PII_SCRUB_SQL}) AS scrubbed_sha
    FROM documents
    """,
)
def pii_scrub_q(spark, sf_dir):
    """PII scrubbing: chained email → phone → IPv4 redaction with typed
    placeholders and per-class counts. The synthetic corpus contains no
    PII (counts legitimately 0 here — value-level behavior is pinned by
    `tests/test_curation.py` micro-cases); the digest column still
    proves the full rewrite chain byte-for-byte on every row."""
    return C.pii_scrub(table(spark, sf_dir, "documents"))


_BUCKET_CASE = "CASE " + " ".join(
    f"WHEN n_tokens <= {b} THEN {b}" for b in C.LENGTH_BUCKETS[:-1]
) + f" ELSE {C.LENGTH_BUCKETS[-1]} END"


@declare(
    "doc_length_buckets",
    oracle=rf"""
    WITH t AS (SELECT lang,
                      CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
                        AS n_tokens
               FROM documents)
    SELECT lang, CAST({_BUCKET_CASE} AS INT) AS bucket,
           COUNT(*) AS n_docs, CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
    FROM t GROUP BY lang, bucket
    """,
)
def doc_length_buckets(spark, sf_dir):
    """Sequence-length batching profile: docs binned to the smallest
    power-of-two token boundary, per language — the shape a training
    loader needs to plan padding-efficient batches. Integer CASE edges
    (not log2 floats) so the bucket boundary can't drift with an
    engine's last-ulp log rounding."""
    d = table(spark, sf_dir, "documents").select(
        "lang", token_count(F.col("text")).alias("n_tokens")
    )
    return d.groupBy(
        "lang", C.length_bucket(F.col("n_tokens")).cast("int").alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("tot_tokens"),
    )


@declare(
    "weighted_sample",
    oracle=rf"""
    WITH d AS (SELECT doc_id, source,
                      CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
                        AS n_tokens,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 1000 AS bucket
               FROM documents),
    per AS (SELECT source, SUM(n_tokens) AS src_tokens FROM d GROUP BY source),
    tot AS (SELECT COUNT(*) AS n_src, SUM(src_tokens) AS total_tokens FROM per)
    SELECT d.source, COUNT(*) AS sampled_docs,
           CAST(SUM(d.n_tokens) AS BIGINT) AS sampled_tokens
    FROM d JOIN per USING (source) CROSS JOIN tot
    WHERE d.bucket * 3 * n_src * src_tokens < 1000 * total_tokens
    GROUP BY d.source
    """,
)
def weighted_sample(spark, sf_dir):
    """Domain-mix weighted sampling: each doc kept with probability
    proportional to its source's uniform-target mix weight (the
    `source_mix_weights` policy normalized by its cap), membership
    decided by an md5 bucket of the doc key — deterministic under
    reprocessing. The keep predicate is pure BIGINT arithmetic
    (`bucket·3·S·src_tokens < 1000·T`), never a float threshold, so
    engines can't disagree on a boundary bucket. Weights are a
    broadcast ~#sources-row aggregate; the filter is map-side."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        (
            F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
            .cast("long") % 1000
        ).alias("bucket"),
    )
    per = d.groupBy("source").agg(F.sum("n_tokens").alias("src_tokens"))
    tot = per.agg(
        F.count(F.lit(1)).alias("n_src"), F.sum("src_tokens").alias("total_tokens")
    )
    return (
        d.join(F.broadcast(per), "source")
        .join(F.broadcast(tot))
        .filter(
            F.col("bucket") * 3 * F.col("n_src") * F.col("src_tokens")
            < 1000 * F.col("total_tokens")
        )
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("sampled_docs"),
            F.sum("n_tokens").alias("sampled_tokens"),
        )
    )


_MARKERS_SQL = ", ".join(f"'{w}'" for w in C.ALL_MARKER_WORDS)


@declare(
    "quality_gate",
    oracle=f"""
    WITH t AS (
      SELECT doc_id,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(text) AS n_chars,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_sym,
             list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS ltoks
      FROM documents)
    SELECT doc_id,
           len(toks) >= 10 AND len(toks) <= 2000 AS ok_len,
           n_nonspace / len(toks) >= 2.0 AND n_nonspace / len(toks) <= 12.0 AS ok_mwl,
           len(list_distinct(toks)) / len(toks) >= 0.2 AS ok_ttr,
           n_sym / greatest(n_chars, 1) <= 0.1 AS ok_sym,
           len(list_intersect(ltoks, [{_MARKERS_SQL}])) > 0 AS ok_stop,
           (len(toks) >= 10 AND len(toks) <= 2000)
             AND (n_nonspace / len(toks) >= 2.0 AND n_nonspace / len(toks) <= 12.0)
             AND (len(list_distinct(toks)) / len(toks) >= 0.2)
             AND (n_sym / greatest(n_chars, 1) <= 0.1)
             AND (len(list_intersect(ltoks, [{_MARKERS_SQL}])) > 0) AS keep
    FROM t
    """,
)
def quality_gate_q(spark, sf_dir):
    """Gopher-style rule filter: word-count band, mean-word-length band,
    type-token-ratio floor, symbol-ratio cap, stopword probe — pure
    map-side arithmetic inside the scan stage."""
    return C.quality_gate(table(spark, sf_dir, "documents")).select(
        "doc_id", "ok_len", "ok_mwl", "ok_ttr", "ok_sym", "ok_stop", "keep"
    )


@declare(
    "repetition_screen",
    oracle="""
    WITH tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '\\s+')) AS t
                 FROM documents),
    cnt AS (SELECT doc_id, t, COUNT(*) AS n FROM tok GROUP BY doc_id, t),
    tot AS (SELECT doc_id, SUM(n) AS n_tokens FROM cnt GROUP BY doc_id),
    top AS (SELECT doc_id, t AS top_token, n AS top_n,
                   row_number() OVER (PARTITION BY doc_id ORDER BY n DESC, t DESC) AS rn
            FROM cnt)
    SELECT top.doc_id, top_token, top_n,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           ROUND(top_n / n_tokens, 8) AS top_ratio,
           top_n / n_tokens > 0.1 AS repetitive
    FROM top JOIN tot ON top.doc_id = tot.doc_id
    WHERE rn = 1
    """,
)
def repetition_screen(spark, sf_dir):
    """Repetition screen: each doc's most frequent token and its share of
    all tokens (deterministic tie-break toward the larger token). The
    document body is never shuffled — only (id, word, count) rows."""
    return C.top_token_stats(table(spark, sf_dir, "documents"))


@declare(
    "source_mix_weights",
    oracle=rf"""
    WITH per AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}'))) AS BIGINT)
               AS tot_tokens
      FROM documents GROUP BY source)
    SELECT source, n_docs, tot_tokens,
           ROUND(tot_tokens / SUM(tot_tokens) OVER (), 8) AS token_share,
           ROUND(LEAST((1.0 / COUNT(*) OVER ())
                       / (tot_tokens / SUM(tot_tokens) OVER ()), 3.0), 8) AS mix_weight
    FROM per
    """,
)
def source_mix_weights_q(spark, sf_dir):
    """Domain-mix reweighting: per-source token share and the capped
    sampling weight toward a uniform source mix — one tiny aggregate
    then empty-frame window arithmetic."""
    return C.source_mix_weights(table(spark, sf_dir, "documents"))


_SHARD_POWS = ", ".join(
    f"(strpos('0123456789abcdef', substr(shuffle_key, {i + 1}, 1)) - 1) * {16 ** (7 - i)}"
    for i in range(8)
)


@declare(
    "shard_manifest",
    oracle=f"""
    WITH h AS (SELECT doc_id,
                      md5('shuffle:v1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
               FROM documents),
    n AS (SELECT doc_id, shuffle_key,
                 CAST(({_SHARD_POWS.replace(', (', ' + (')}) AS BIGINT) AS hv
          FROM h)
    SELECT doc_id, shuffle_key,
           CAST(hv % 16 AS INT) AS shard_id,
           CAST(row_number() OVER (PARTITION BY hv % 16
                                   ORDER BY shuffle_key, doc_id) - 1 AS BIGINT)
             AS pos_in_shard
    FROM n
    """,
)
def shard_manifest_q(spark, sf_dir):
    """Deterministic training-order manifest: pseudo-random (salted-md5)
    but fully replayable shard + position per document. Map-side shard
    assignment (hex-prefix of the shuffle key, parsed with locate
    arithmetic so the oracle replays it) and ONE hash-partition shuffle
    for per-shard positions — no global sort anywhere."""
    return C.shard_manifest(
        table(spark, sf_dir, "documents"), n_shards=16, salt="shuffle:v1"
    )


@declare(
    "dedup_incremental",
    oracle="""
    WITH h AS (SELECT doc_id,
                      sha256(lower(trim(coalesce(text, '')))) AS text_hash
               FROM documents),
    inc AS (SELECT doc_id, text_hash,
                   row_number() OVER (PARTITION BY text_hash ORDER BY doc_id) AS rn,
                   COUNT(*) OVER (PARTITION BY text_hash) AS n_batch_dups
            FROM h WHERE doc_id % 7 = 0),
    cor AS (SELECT DISTINCT text_hash FROM h WHERE doc_id % 7 <> 0)
    SELECT doc_id, text_hash, CAST(n_batch_dups AS BIGINT) AS n_batch_dups
    FROM inc
    WHERE rn = 1 AND text_hash NOT IN (SELECT text_hash FROM cor)
    """,
)
def dedup_incremental_q(spark, sf_dir):
    """Incremental ingest dedup: the doc_id % 7 == 0 slice stands in for
    a newly-arrived batch, the rest for the already-ingested corpus.
    Batch rows survive if they win within the batch (lowest id per
    content hash) AND their hash is absent from the corpus — both checks
    shuffle 32-byte hashes, never document bodies."""
    docs = table(spark, sf_dir, "documents")
    out = dedup_incremental(
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
    )
    return out.select(
        "doc_id", "text_hash", F.col("n_batch_dups").cast("long").alias("n_batch_dups")
    )


@declare(
    "dedup_exact_audit",
    oracle="""
    WITH h AS (SELECT doc_id,
                      sha256(lower(trim(coalesce(text, '')))) AS th
               FROM documents),
    b AS (SELECT doc_id, th,
                 CAST(row_number() OVER (PARTITION BY th ORDER BY doc_id)
                      - 1 AS BIGINT) AS n_prior_batch_matches
          FROM h WHERE doc_id % 7 = 0),
    c AS (SELECT th, COUNT(*) AS cnt FROM h WHERE doc_id % 7 <> 0
          GROUP BY th)
    SELECT b.doc_id AS doc,
           CAST(coalesce(c.cnt, 0) AS BIGINT) AS n_corpus_matches,
           b.n_prior_batch_matches,
           (coalesce(c.cnt, 0) = 0 AND b.n_prior_batch_matches = 0) AS kept
    FROM b LEFT JOIN c ON b.th = c.th
    """,
)
def dedup_exact_audit_q(spark, sf_dir):
    """The per-doc verdict frame of the incremental exact-dedup screen
    (`operators/dedup.exact_dedup_audit`) — the DuckDB-oracled batch
    twin of `streaming/dedup.stream_dedup_exact_sink`'s audit output,
    so the sink's verdict semantics are driver-hash-checked every
    round, not only test-pinned. Same batch/corpus split as
    `dedup_incremental` (doc_id % 7); kept rows here == its
    survivors."""
    from ..operators.dedup import exact_dedup_audit

    docs = table(spark, sf_dir, "documents")
    return exact_dedup_audit(
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
    )


@declare(
    "repeated_substrings",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id AS doc, unnest(
             [array_to_string(toks[i:i+7], ' ')
              FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)]) AS sh
           FROM t)
    SELECT sh AS gram, COUNT(DISTINCT doc) AS n_docs,
           COUNT(*) AS n_occ,
           MIN(doc) AS first_doc, MAX(doc) AS last_doc
    FROM sh GROUP BY sh HAVING COUNT(DISTINCT doc) >= 2
    """,
)
def repeated_substrings(spark, sf_dir):
    """Intra-corpus repeated-substring mining: word 8-gram windows that
    recur across ≥ 2 distinct documents — the boilerplate/template
    signal substring-level dedup is built on (headers, footers, license
    blocks repeat verbatim). Grams are built row-locally by the Arrow
    shingle kernel (r11 — the token-stream window exchange is gone);
    ONE partial-aggregated shuffle on the gram."""
    return C.repeated_ngrams(table(spark, sf_dir, "documents"), n=8, min_docs=2)


@declare(
    "repeated_substrings_hashed",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents),
    sh AS (SELECT doc_id AS doc, unnest(
             [array_to_string(toks[i:i+7], ' ')
              FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)]) AS sh
           FROM t),
    g AS (SELECT COUNT(DISTINCT doc) AS n_docs, COUNT(*) AS n_occ
          FROM sh GROUP BY sh HAVING COUNT(DISTINCT doc) >= 2)
    SELECT n_docs, n_occ, COUNT(*) AS n_grams
    FROM g GROUP BY n_docs, n_occ
    """,
)
def repeated_substrings_hashed(spark, sf_dir):
    """The xxhash64-gram shuffle-shrink flavor of repeated_substrings:
    grams are hashed MAP-SIDE so the aggregation exchange moves 8-byte
    longs instead of 8-word strings — the dial for long-gram mining at
    100 TB, where gram bytes dominate shuffle volume.

    DuckDB has no xxhash64, so the declared output is the gram-count
    HISTOGRAM over (n_docs, n_occ) — invariant under hashing (modulo
    64-bit collisions, ~N²/2⁶⁵), computed by the oracle from the
    literal grams. A hash path that dropped, merged or double-counted
    grams shifts the histogram and hash-mismatches. The literal-gram
    equality per gram is pinned by
    tests/test_curation.py::test_repeated_ngrams_hash_grams_counts_identical."""
    hashed = C.repeated_ngrams(
        table(spark, sf_dir, "documents"), n=8, min_docs=2, hash_grams=True
    )
    return hashed.groupBy("n_docs", "n_occ").agg(
        F.count(F.lit(1)).alias("n_grams")
    )


@declare(
    "chunk_documents",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents WHERE text IS NOT NULL),
    c AS (SELECT doc_id,
                 unnest([struct_pack(start_tok := s,
                                     chunk := array_to_string(toks[s:s+63], ' '),
                                     n_tok := len(list_filter(toks[s:s+63],
                                                              t -> t <> '')))
                         FOR s IN range(1, greatest(len(toks), 1) + 1, 48)]) AS c,
                 generate_subscripts([s FOR s IN
                         range(1, greatest(len(toks), 1) + 1, 48)], 1) AS ord
          FROM t)
    SELECT doc_id, CAST(ord - 1 AS BIGINT) AS chunk_id,
           CAST(c.start_tok AS BIGINT) AS start_tok,
           CAST(c.n_tok AS BIGINT) AS n_tok,
           sha256(c.chunk) AS chunk_sha
    FROM c
    """,
)
def chunk_documents_q(spark, sf_dir):
    """RAG-style chunking: 64-token chunks starting every 48 tokens
    (16-token overlap), row-local slicing with a sha256 content digest
    per chunk — zero shuffle; downstream chunk-level dedup reuses the
    32-byte-hash discipline."""
    return C.chunk_documents(
        table(spark, sf_dir, "documents"), chunk_tokens=64, overlap=16
    )


@declare(
    "quality_by_source",
    oracle=f"""
    WITH t AS (
      SELECT doc_id, source,
             regexp_split_to_array(trim(text), '\\s+') AS toks,
             length(text) AS n_chars,
             length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace,
             length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g')) AS n_sym,
             list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS ltoks
      FROM documents),
    r AS (SELECT source,
                 CASE WHEN len(toks) >= 10 AND len(toks) <= 2000 THEN 1 ELSE 0 END AS ok_len,
                 CASE WHEN n_nonspace / len(toks) >= 2.0 AND n_nonspace / len(toks) <= 12.0 THEN 1 ELSE 0 END AS ok_mwl,
                 CASE WHEN len(list_distinct(toks)) / len(toks) >= 0.2 THEN 1 ELSE 0 END AS ok_ttr,
                 CASE WHEN n_sym / greatest(n_chars, 1) <= 0.1 THEN 1 ELSE 0 END AS ok_sym,
                 CASE WHEN len(list_intersect(ltoks, [{_MARKERS_SQL}])) > 0 THEN 1 ELSE 0 END AS ok_stop
          FROM t)
    SELECT source, COUNT(*) AS n_docs,
           CAST(SUM(ok_len) AS BIGINT) AS n_ok_len,
           CAST(SUM(ok_mwl) AS BIGINT) AS n_ok_mwl,
           CAST(SUM(ok_ttr) AS BIGINT) AS n_ok_ttr,
           CAST(SUM(ok_sym) AS BIGINT) AS n_ok_sym,
           CAST(SUM(ok_stop) AS BIGINT) AS n_ok_stop,
           CAST(SUM(ok_len * ok_mwl * ok_ttr * ok_sym * ok_stop) AS BIGINT) AS n_keep,
           ROUND(SUM(ok_len * ok_mwl * ok_ttr * ok_sym * ok_stop) / COUNT(*), 8)
             AS keep_rate
    FROM r GROUP BY source
    """,
)
def quality_by_source(spark, sf_dir):
    """Curation monitoring dashboard: per source, how many docs pass
    each quality rule and the overall keep rate — the view that decides
    which feeds to fix or drop. The rules run map-side (same exprs as
    quality_gate); the aggregate collapses to ~|sources| rows."""
    qg = C.quality_gate(table(spark, sf_dir, "documents"))
    rules = ["ok_len", "ok_mwl", "ok_ttr", "ok_sym", "ok_stop"]
    aggs = [F.count(F.lit(1)).alias("n_docs")] + [
        F.sum(F.col(r).cast("long")).alias(f"n_{r}") for r in rules
    ] + [F.sum(F.col("keep").cast("long")).alias("n_keep")]
    return (
        qg.groupBy("source")
        .agg(*aggs)
        .withColumn("keep_rate", F.round(F.col("n_keep") / F.col("n_docs"), 8))
    )


@declare(
    "doc_novelty",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
               FROM documents),
    sh AS (SELECT DISTINCT doc_id AS doc, sh FROM (
             SELECT doc_id, unnest(
               [array_to_string(toks[i:i+7], ' ')
                FOR i IN range(1, greatest(len(toks) - 7, 1) + 1)]) AS sh
             FROM t)),
    df AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh)
    SELECT doc AS doc_id, COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_shared,
           ROUND(1.0 - SUM(CASE WHEN df > 1 THEN 1 ELSE 0 END) / COUNT(*), 8)
             AS novelty
    FROM sh JOIN df USING (sh)
    GROUP BY doc
    """,
)
def doc_novelty(spark, sf_dir):
    """Per-document novelty score: the fraction of a doc's distinct word
    8-grams that appear in NO other document — the data-valuation /
    memorization-risk signal that prioritizes what dedup should keep.
    r11 shape: the posting stream crosses ONE partial-aggregated
    gram-keyed exchange; df-1 grams are attributed to their single
    owner inside that aggregate (min(doc)), so the df join-back and the
    doc-keyed re-aggregate of the full posting stream are gone — the
    oracle keeps the join formulation and hash-adjudicates the
    attribution identity (see novelty_scores)."""
    from ..functions.curation import novelty_scores

    # hash_grams: novelty depends only on gram document-frequencies, so
    # the xxhash64 shrink (8-byte keys through the one gram exchange)
    # leaves the output bit-identical — the oracle replays the literal
    # grams and still hash-matches (collision odds ~N²/2⁶⁵; pinned by
    # tests/test_curation.py::test_novelty_scores_hash_grams_identical)
    return novelty_scores(table(spark, sf_dir, "documents"), 8, hash_grams=True)


@declare(
    "dataset_split_by_source",
    oracle=rf"""
    WITH d AS (SELECT doc_id, source,
                      CAST(len(regexp_extract_all(text, '{BPE_ISH_PATTERN}')) AS BIGINT)
                        AS n_tokens,
                      CAST(('0x' || substr(md5('split:v1:' || CAST(doc_id AS VARCHAR)), 1, 8))
                           AS BIGINT) % 100 AS bucket
               FROM documents)
    SELECT CASE WHEN bucket < 96 THEN 'train'
                WHEN bucket < 98 THEN 'val'
                ELSE 'test' END AS split,
           source, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS tot_tokens
    FROM d GROUP BY 1, 2
    """,
)
def dataset_split_by_source(spark, sf_dir):
    """Deterministic train/val/test assignment (96/2/2), audited
    per-source: membership is a pure function of the salted doc key —
    an md5 bucket, the same engine-portable integer discipline as
    `weighted_sample` — so the split is stable under reprocessing, new
    data lands in splits without moving old docs, and val/test can
    never leak into train by a reshuffle. Re-salting (`split:v2:`)
    redraws the whole split without touching data. The simpler
    unsalted corpus-level audit is `dataset_split`
    (plans/text_queries.py); this is the production flavor the
    salted-stability test (tests/test_curation.py) pins.

    Scale shape: the bucket is one map-side md5 per row; the declared
    output is the per-(split, source) count/token audit — one partial
    aggregated shuffle of 6-ish groups. The full assignment frame
    (doc_id, split) is the same projection without the groupBy: pure
    map-side at any corpus size."""
    d = table(spark, sf_dir, "documents").select(
        "doc_id",
        "source",
        token_count(F.col("text")).alias("n_tokens"),
        (
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit("split:v1:"), F.col("doc_id").cast("string"))),
                    1,
                    8,
                ),
                16,
                10,
            ).cast("long")
            % 100
        ).alias("bucket"),
    )
    split = (
        F.when(F.col("bucket") < 96, "train")
        .when(F.col("bucket") < 98, "val")
        .otherwise("test")
    )
    return (
        d.groupBy(split.alias("split"), F.col("source"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").cast("long").alias("tot_tokens"),
        )
    )


_SPAN_W = 16

@declare(
    "dedup_spans_incremental",
    oracle=rf"""
    WITH toks AS (SELECT doc_id,
                         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w
                  FROM documents),
         sp AS (SELECT doc_id,
                       list_filter(
                         [array_to_string(w[i:i+{_SPAN_W - 1}], ' ')
                          FOR i IN range(1, greatest(len(w), 1) + 1, {_SPAN_W})],
                         s -> s <> '') AS spans
                FROM toks),
         ex AS (SELECT doc_id, u.idx AS idx, u.span AS span
                FROM (SELECT doc_id,
                             unnest([{{'idx': i - 1, 'span': spans[i]}}
                                     FOR i IN range(1, len(spans) + 1)]) AS u
                      FROM sp)),
         cx AS (SELECT DISTINCT sha256(span) AS h
                FROM ex WHERE doc_id % 7 <> 0),
         kept AS (SELECT doc_id, idx, span
                  FROM (SELECT doc_id, idx, span,
                               row_number() OVER (PARTITION BY sha256(span)
                                                  ORDER BY doc_id, idx) AS rn
                        FROM ex WHERE doc_id % 7 = 0)
                  WHERE rn = 1
                    AND sha256(span) NOT IN (SELECT h FROM cx)),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                        sha256(string_agg(span, ' ' ORDER BY idx)) AS rebuilt_sha
                 FROM kept GROUP BY doc_id)
    SELECT s.doc_id, CAST(len(s.spans) AS BIGINT) AS n_spans,
           CAST(len(s.spans) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_spans_removed,
           COALESCE(r.rebuilt_sha, sha256('')) AS rebuilt_sha
    FROM sp s LEFT JOIN reb r USING (doc_id)
    WHERE s.doc_id % 7 = 0
    """,
)
def _dedup_spans_incremental_q_impl(spark, sf_dir):
    """`dedup_spans`, incremental flavor
    (operators/dedup.dedup_spans_incremental): every-7th doc is the new
    ingest batch, the rest the already-ingested corpus — batch spans
    survive iff first within the batch AND absent from every corpus
    document. The per-ingest-cycle shape of C4-style span dedup; equals
    the global pass restricted to the batch when corpus ids order first
    (property-tested). The oracle replays split → span →
    batch-first-occurrence → corpus exclusion → reassembly bit-for-bit
    (sha256 both sides)."""
    from ..operators.dedup import dedup_spans_incremental

    docs = table(spark, sf_dir, "documents")
    return dedup_spans_incremental(
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
        span_words=_SPAN_W,
    )


@declare(
    "dedup_spans",
    oracle=rf"""
    WITH toks AS (SELECT doc_id,
                         regexp_split_to_array(trim(coalesce(text, '')), '\s+') AS w
                  FROM documents),
         sp AS (SELECT doc_id,
                       list_filter(
                         [array_to_string(w[i:i+{_SPAN_W - 1}], ' ')
                          FOR i IN range(1, greatest(len(w), 1) + 1, {_SPAN_W})],
                         s -> s <> '') AS spans
                FROM toks),
         ex AS (SELECT doc_id, u.idx AS idx, u.span AS span
                FROM (SELECT doc_id,
                             unnest([{{'idx': i - 1, 'span': spans[i]}}
                                     FOR i IN range(1, len(spans) + 1)]) AS u
                      FROM sp)),
         kept AS (SELECT doc_id, idx, span
                  FROM (SELECT doc_id, idx, span,
                               row_number() OVER (PARTITION BY sha256(span)
                                                  ORDER BY doc_id, idx) AS rn
                        FROM ex)
                  WHERE rn = 1),
         reb AS (SELECT doc_id, COUNT(*) AS n_kept,
                        sha256(string_agg(span, ' ' ORDER BY idx)) AS rebuilt_sha
                 FROM kept GROUP BY doc_id)
    SELECT s.doc_id, CAST(len(s.spans) AS BIGINT) AS n_spans,
           CAST(len(s.spans) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_spans_removed,
           COALESCE(r.rebuilt_sha, sha256('')) AS rebuilt_sha
    FROM sp s LEFT JOIN reb r USING (doc_id)
    """,
)
def dedup_spans_q(spark, sf_dir):
    """X1 at SUB-document granularity — C4-style span dedup
    (operators/dedup.dedup_spans): non-overlapping 16-word spans, keep
    each exact span's globally first occurrence (lowest (doc, position);
    later repeats across AND within docs are removed), reassemble, and
    emit the per-doc audit (span count, removals, sha256 of the rebuilt
    text). The technique that strips boilerplate/quotation duplication
    whole-document dedup can't see.

    Scale shape: span construction is map-side; the keep decision is
    ONE window over the 32-byte span hash (spans shuffle once, by
    content hash); reassembly is one doc-keyed aggregate. The oracle
    replays split → span → first-occurrence → reassembly bit-for-bit
    (sha256 on both sides)."""
    from ..operators.dedup import dedup_spans

    return dedup_spans(
        table(spark, sf_dir, "documents"), span_words=_SPAN_W
    )
