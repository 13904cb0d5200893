"""Extension queries over ``documents``: exact/near dedup, text stats,
quality scoring, fingerprinting (SURVEY §2.12, X1/X2/X4).

Tokenization contract shared with the oracle: whitespace split of
trimmed text (``regexp_split_to_array(trim(text), '\\s+')`` in DuckDB ==
``split(trim(text), '\\s+')`` in Spark).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as X
from ..functions.similarity import jaccard_pairs
from ..operators.dedup import dedup_exact_text
from ..sources import table
from .registry import declare


@declare(
    "dedup_exact_text",
    oracle="""
    SELECT doc_id, text_hash FROM (
      SELECT doc_id, sha256(lower(trim(text))) AS text_hash,
             row_number() OVER (PARTITION BY sha256(lower(trim(text))) ORDER BY doc_id) AS rn
      FROM documents) t
    WHERE rn = 1
    """,
)
def dedup_exact_text_q(spark, sf_dir):
    """X1: exact content dedup via sha256 of normalized text; lowest
    doc_id per hash survives. Shuffle key is the 32-byte hash, not the
    document body."""
    return dedup_exact_text(table(spark, sf_dir, "documents")).select(
        "doc_id", "text_hash"
    )


@declare(
    "text_stats",
    oracle="""
    SELECT doc_id, lang,
           CAST(length(text) AS INTEGER) AS char_count,
           CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS INTEGER) AS word_count,
           CAST(len(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS INTEGER) AS distinct_words
    FROM documents
    """,
)
def text_stats_q(spark, sf_dir):
    """X4: per-document char/word/distinct-word counts — pure map-side
    codegen'd expressions."""
    return X.text_stats(table(spark, sf_dir, "documents")).select(
        "doc_id", "lang", "char_count", "word_count", "distinct_words"
    )


@declare(
    "lang_profile",
    oracle="""
    SELECT lang, COUNT(*) AS n_docs, AVG(n_chars) AS avg_chars,
           MIN(n_chars) AS min_chars, MAX(n_chars) AS max_chars
    FROM documents GROUP BY lang
    """,
)
def lang_profile(spark, sf_dir):
    """X4 aggregate flavor: corpus language distribution."""
    return (
        table(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("n_chars").alias("avg_chars"),
            F.min("n_chars").alias("min_chars"),
            F.max("n_chars").alias("max_chars"),
        )
    )


@declare(
    "text_quality",
    oracle="""
    WITH t AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks,
                      length(regexp_replace(text, '\\s+', '', 'g')) AS n_nonspace
               FROM documents)
    SELECT doc_id, CAST(len(toks) AS INTEGER) AS n_words,
           n_nonspace / len(toks) AS mean_word_len,
           len(list_distinct(toks)) / len(toks) AS ttr
    FROM t
    """,
)
def text_quality(spark, sf_dir):
    """Quality-scoring heuristics (length, mean word length, type-token
    ratio) à la LLM-corpus filtering."""
    return X.quality_score(table(spark, sf_dir, "documents")).select(
        "doc_id", "n_words", "mean_word_len", "ttr"
    )


@declare(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           sha256(array_to_string(list_sort(list_distinct(
               regexp_split_to_array(trim(text), '\\s+'))), ' ')) AS fp
    FROM documents
    """,
)
def doc_fingerprint(spark, sf_dir):
    """Order-insensitive document fingerprint: sha256 of the sorted
    distinct token set — the cheap tier of near-dup detection."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", X.fingerprint(F.col("text")).alias("fp")
    )


@declare(
    "dedup_near_shingle",
    oracle="""
    WITH sh AS (
      SELECT doc_id AS doc, unnest(list_distinct(sh_list)) AS sh
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i:i+2], ' ')
                FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)] AS sh_list
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t0) t1),
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc),
    inter AS (
      SELECT a.doc AS a, b.doc AS b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
      GROUP BY a.doc, b.doc)
    SELECT a, b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
           ROUND(inter / (sa.sz + sb.sz - inter), 8) AS jaccard
    FROM inter
    JOIN sizes sa ON sa.doc = a
    JOIN sizes sb ON sb.doc = b
    WHERE inter / (sa.sz + sb.sz - inter) >= 0.2
    """,
)
def dedup_near_shingle(spark, sf_dir):
    """X2 exact flavor: near-dup pairs by 3-gram shingle Jaccard via an
    inverted-index self-join (no O(n²) cross join). The MinHash-LSH
    variant (rows-only checked) is dedup_near_minhash."""
    return jaccard_pairs(
        table(spark, sf_dir, "documents"), n=3, threshold=0.2
    )
