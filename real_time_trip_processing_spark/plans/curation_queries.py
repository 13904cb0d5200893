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
from ..functions.text import BPE_ISH_PATTERN
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
    holding its first token (exactly LLM context-window chunking)."""
    return C.pack_sequences(
        table(spark, sf_dir, "documents"), budget=_PACK_BUDGET, part_col="lang"
    ).select("doc_id", "lang", "n_tokens", "tok_offset", "seq_id")


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
