"""Extension queries over ``documents``: exact/near dedup, text stats,
quality scoring, fingerprinting (SURVEY §2.12, X1/X2/X4).

Tokenization contract shared with the oracle: whitespace split of
trimmed text (``regexp_split_to_array(trim(text), '\\s+')`` in DuckDB ==
``split(trim(text), '\\s+')`` in Spark).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..functions import text as X
from ..functions.simhash import simhash_fingerprints, simhash_pairs
from ..functions.similarity import (
    containment_incremental_pairs,
    containment_pairs,
    jaccard_pairs,
)
from ..operators.dedup import dedup_exact_text
from ..sources import table
from .registry import declare

#: shared DuckDB replay of the 3-gram shingle convention — distinct
#: shingles per doc plus per-doc set sizes, the prefix every exact
#: pairwise-screen oracle composes (round-11 review: five inline
#: copies of this block had accumulated; a shingle-convention change
#: must edit exactly one place).
_SHINGLE_SIZES_CTE = """
    sh AS (
      SELECT doc_id AS doc, unnest(list_distinct(sh_list)) AS sh
      FROM (
        SELECT doc_id,
               [array_to_string(toks[i:i+2], ' ')
                FOR i IN range(1, greatest(len(toks) - 2, 1) + 1)] AS sh_list
        FROM (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS toks
              FROM documents) t0) t1),
    sizes AS (SELECT doc, COUNT(*) AS sz FROM sh GROUP BY doc)"""

#: the symmetric (a < b) pair-intersection counts over the block above
_SHINGLE_INTER_CTE = """
    inter AS (
      SELECT a.doc AS a, b.doc AS b, COUNT(*) AS inter
      FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc < b.doc
      GROUP BY a.doc, b.doc)"""

#: the containment screens' shared verdict tail (inter / min size)
_CONTAINMENT_TAIL = """
    SELECT a, b, inter, sa.sz AS sz_a, sb.sz AS sz_b,
           ROUND(inter / least(sa.sz, sb.sz), 8) AS containment
    FROM inter
    JOIN sizes sa ON sa.doc = a
    JOIN sizes sb ON sb.doc = b
    WHERE inter / least(sa.sz, sb.sz) >= 0.8"""


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
    oracle=f"""
    WITH {_SHINGLE_SIZES_CTE},{_SHINGLE_INTER_CTE}
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


@declare(
    "dedup_containment",
    oracle=f"""
    WITH {_SHINGLE_SIZES_CTE},{_SHINGLE_INTER_CTE}
    {_CONTAINMENT_TAIL}
    """,
)
def dedup_containment(spark, sf_dir):
    """X2 asymmetric flavor: pairs by shingle-set CONTAINMENT
    (``inter / min(|A|,|B|)``) — catches a short doc embedded in a long
    one, which Jaccard structurally misses (a fully-contained
    20-shingle doc in a 400-shingle doc scores 1.0 here, 0.05 there).
    Same inverted-index join as dedup_near_shingle; only the final
    formula differs."""
    return containment_pairs(
        table(spark, sf_dir, "documents"), n=3, threshold=0.8
    )


@declare(
    "dedup_containment_incremental",
    oracle=f"""
    WITH {_SHINGLE_SIZES_CTE},
    inter AS (
      SELECT n.doc AS a, c.doc AS b, COUNT(*) AS inter
      FROM sh n JOIN sh c ON n.sh = c.sh
      WHERE n.doc % 7 = 0 AND c.doc % 7 <> 0
      GROUP BY 1, 2)
    {_CONTAINMENT_TAIL}
    """,
)
def dedup_containment_incremental(spark, sf_dir):
    """Incremental twin of dedup_containment: the NEW ingest batch (the
    doc_id % 7 == 0 slice, the family's split convention) screened for
    short-in-long embedding against the already-ingested corpus (the
    rest). Batch shingles × corpus shingles equi-join — small side vs
    postings, never a corpus self-join; at 100 TB the corpus side is a
    persisted (doc, sh) postings index reused across cycles."""
    docs = table(spark, sf_dir, "documents")
    return containment_incremental_pairs(
        docs.filter(F.col("doc_id") % 7 == 0),
        docs.filter(F.col("doc_id") % 7 != 0),
        n=3,
        threshold=0.8,
    )


@declare(
    "dedup_canonical_docs",
    oracle=f"""
    WITH RECURSIVE {_SHINGLE_SIZES_CTE},{_SHINGLE_INTER_CTE},
    pairs AS (
      SELECT a, b FROM inter
      JOIN sizes sa ON sa.doc = a
      JOIN sizes sb ON sb.doc = b
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.2),
    edges AS (SELECT a AS u, b AS v FROM pairs
              UNION SELECT b AS u, a AS v FROM pairs),
    reach(node, r) AS (
      SELECT u, u FROM edges
      UNION
      SELECT e.v, reach.r FROM reach JOIN edges e ON e.u = reach.node),
    cc AS (SELECT node, MIN(r) AS component FROM reach GROUP BY node)
    SELECT d.doc_id,
           COALESCE(cc.component, d.doc_id) AS canonical_id,
           (COALESCE(cc.component, d.doc_id) = d.doc_id) AS is_canonical
    FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
    """,
)
def dedup_canonical_docs(spark, sf_dir):
    """The step after near-dup pairs: connected components of the
    similarity graph (iterative min-label propagation,
    operators/graph.py) map every document to one canonical survivor.
    The oracle computes the same fixpoint as a recursive CTE — the one
    'iterative algorithm' query, still SQL-checkable."""
    from ..operators.graph import dedup_canonical

    docs = table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, n=3, threshold=0.2).select("a", "b")
    return dedup_canonical(docs, pairs)


@declare(
    "token_count",
    oracle=rf"""
    SELECT doc_id,
           CAST(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}')) AS BIGINT) AS n_tokens
    FROM documents
    """,
)
def token_count_q(spark, sf_dir):
    """LLM-style token counting: BPE-ish regex pre-tokenization
    (word pieces / digit runs / single symbols) — map-side only."""
    return table(spark, sf_dir, "documents").select(
        "doc_id", X.token_count(F.col("text")).alias("n_tokens")
    )


def _lang_score_sql(lang: str) -> str:
    words = ", ".join(f"'{w}'" for w in X.LANG_MARKERS[lang])
    return f"CAST(len(list_intersect(toks, [{words}])) AS INTEGER) AS s_{lang}"


_LANGS = sorted(X.LANG_MARKERS)

@declare(
    "lang_id",
    oracle=f"""
    WITH t AS (SELECT doc_id, lang,
                      list_distinct(regexp_split_to_array(trim(lower(text)), '\\s+')) AS toks
               FROM documents),
         s AS (SELECT doc_id, lang, {", ".join(_lang_score_sql(lang) for lang in _LANGS)} FROM t)
    SELECT doc_id, lang, {", ".join(f"s_{lang}" for lang in _LANGS)},
           CASE
             {" ".join(f"WHEN s_{lang} > 0 AND s_{lang} = greatest({', '.join('s_' + x for x in _LANGS)}) THEN '{lang}'" for lang in _LANGS)}
             ELSE 'und' END AS pred_lang
    FROM s
    """,
)
def lang_id_q(spark, sf_dir):
    """Language-ID heuristic: marker-word hit counts per language,
    argmax with alphabetical tie-break ('und' when nothing hits).
    Pure array arithmetic — runs inside the scan stage at any scale."""
    docs = table(spark, sf_dir, "documents")
    scores = X.lang_scores(F.col("text"))
    return docs.select(
        "doc_id",
        "lang",
        *[scores[lang].alias(f"s_{lang}") for lang in _LANGS],
        X.lang_id(F.col("text")).alias("pred_lang"),
    )


@declare(
    "dataset_split",
    oracle=rf"""
    WITH b AS (SELECT doc_id, text,
                      CAST(('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8)) AS BIGINT)
                        % 100 AS bucket
               FROM documents)
    SELECT CASE WHEN bucket < 80 THEN 'train'
                WHEN bucket < 90 THEN 'val'
                ELSE 'test' END AS split,
           COUNT(*) AS docs,
           CAST(SUM(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}'))) AS BIGINT)
             AS tokens
    FROM b GROUP BY 1
    """,
)
def dataset_split(spark, sf_dir):
    """Deterministic train/val/test assignment by md5 bucket of the
    document id — the standard leakage-safe split for training
    pipelines: stable under reprocessing, no RNG state, computable
    map-side on any engine (the oracle reproduces it bit-for-bit)."""
    docs = table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("long") % 100
    )
    split = (
        F.when(bucket < 80, "train").when(bucket < 90, "val").otherwise("test")
    )
    return docs.select(split.alias("split"), "text").groupBy("split").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(X.token_count(F.col("text"))).alias("tokens"),
    )


@declare(
    "corpus_prep",
    oracle=rf"""
    WITH q AS (SELECT doc_id, lang, text,
                      regexp_split_to_array(trim(text), '\s+') AS toks
               FROM documents),
         f AS (SELECT doc_id, lang, text FROM q
               WHERE len(toks) >= 20
                 AND len(list_distinct(toks)) / len(toks) >= 0.45),
         d AS (SELECT doc_id, lang, text,
                      row_number() OVER (PARTITION BY sha256(lower(trim(text)))
                                         ORDER BY doc_id) AS rn
               FROM f)
    SELECT lang, COUNT(*) AS docs,
           CAST(SUM(len(regexp_extract_all(text, '{X.BPE_ISH_PATTERN}'))) AS BIGINT)
             AS tokens
    FROM d WHERE rn = 1 GROUP BY lang
    """,
)
def corpus_prep(spark, sf_dir):
    """The composed training-data prep pipeline in one plan: quality
    filter (length + type-token ratio) → exact content dedup → per-
    language doc/token budget. The filter runs map-side before the
    dedup's hash shuffle, so junk never shuffles — the order that
    matters at 100 TB."""
    docs = X.quality_score(table(spark, sf_dir, "documents"))
    kept = docs.filter((F.col("n_words") >= 20) & (F.col("ttr") >= 0.45)).select(
        "doc_id", "lang", "text"
    )
    return dedup_exact_text(kept).groupBy("lang").agg(
        F.count(F.lit(1)).alias("docs"),
        F.sum(X.token_count(F.col("text"))).alias("tokens"),
    )


_SIMHASH_FP_SQL = f"""
    WITH tok AS (SELECT doc_id AS doc,
                        unnest(list_distinct(regexp_split_to_array(trim(text), '\\s+'))) AS t
                 FROM documents),
         h AS (SELECT doc, (('0x' || substr(sha256(t), 1, 8))::BIGINT & 2147483647) AS h31
               FROM tok),
         s AS (SELECT doc, {", ".join(f"SUM(((h31 >> {i}) & 1) * 2 - 1) AS s_{i}" for i in range(31))}
               FROM h GROUP BY doc)
    SELECT doc,
           CAST({" + ".join(f"(CASE WHEN s_{i} > 0 THEN (CAST(1 AS BIGINT) << {i}) ELSE 0 END)" for i in range(31))} AS BIGINT)
             AS simhash
    FROM s
"""


@declare(
    "top_terms_per_lang",
    oracle=r"""
    WITH tok AS (
      SELECT lang, unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents),
    cnt AS (SELECT lang, term, COUNT(*) AS n FROM tok GROUP BY lang, term),
    ranked AS (
      SELECT lang, term, n,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n DESC, term) AS rank
      FROM cnt)
    SELECT lang, term, n, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def top_terms_per_lang(spark, sf_dir):
    """Corpus term-frequency profile: top-5 terms per language.
    Explode is pipelined; the (lang, term) count is partial+final; the
    rank window partitions on lang so the top-k never converges on one
    partition (WindowGroupLimit prunes to 5 per partition pre-shuffle)."""
    from ..functions.text import tokens
    from ..operators.sorts import topk_per_group

    docs = table(spark, sf_dir, "documents")
    cnt = (
        docs.select("lang", F.explode(tokens(F.col("text"))).alias("term"))
        .groupBy("lang", "term")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = topk_per_group(cnt, ["lang"], [F.desc("n"), F.col("term")], 5)
    return top.select("lang", "term", "n", F.col("rank").cast("long").alias("rank"))


@declare("dedup_simhash_fp", oracle=_SIMHASH_FP_SQL)
def dedup_simhash_fp(spark, sf_dir):
    """X2 SimHash tier: 31-bit fingerprints from one codegen'd aggregate
    pass (sign of per-bit token-hash sums)."""
    return simhash_fingerprints(table(spark, sf_dir, "documents"))


@declare(
    "dedup_near_simhash",
    oracle=f"""
    WITH fp AS ({_SIMHASH_FP_SQL}),
         bands AS (SELECT doc, simhash, b.band, (simhash >> (b.band * 8)) & 255 AS bv
                   FROM fp, (VALUES (0), (1), (2), (3)) b(band)),
         pairs AS (SELECT DISTINCT l.doc AS a, r.doc AS b,
                          CAST(bit_count(xor(l.simhash, r.simhash)) AS BIGINT) AS hamming
                   FROM bands l JOIN bands r ON l.band = r.band AND l.bv = r.bv AND l.doc < r.doc)
    SELECT a, b, hamming FROM pairs WHERE hamming <= 3
    """,
)
def dedup_near_simhash(spark, sf_dir):
    """X2 SimHash pairs: byte-band bucketing (pigeonhole: Hamming ≤ 3
    over 4 bands guarantees a shared band) + bit_count verification —
    near-dup pair space without the O(n²) cross join."""
    return simhash_pairs(table(spark, sf_dir, "documents"), max_hamming=3)


@declare(
    "tfidf_top_terms",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             unnest(regexp_split_to_array(trim(text), '\s+')) AS term
      FROM documents),
    tf AS (SELECT lang, term, COUNT(*) AS tf FROM tok GROUP BY lang, term),
    df AS (SELECT term, COUNT(DISTINCT doc_id) AS df FROM tok GROUP BY term),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
      SELECT tf.lang, tf.term,
             ROUND(tf.tf * ln(n.n_docs / df.df), 6) AS score
      FROM tf JOIN df ON df.term = tf.term, n),
    ranked AS (
      SELECT lang, term, score,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY score DESC, term) AS rank
      FROM scored)
    SELECT lang, term, score, CAST(rank AS BIGINT) AS rank
    FROM ranked WHERE rank <= 5
    """,
)
def tfidf_top_terms(spark, sf_dir):
    """X4 term weighting: top-5 TF-IDF terms per language. Three
    aggregates over one explode: per-(lang,term) TF, per-term document
    frequency (distinct doc_id), and the corpus size scalar. The DF
    table is one row per distinct term — orders of magnitude smaller
    than the token stream — so it joins back by broadcast; the scalar
    N rides the same broadcast. The rank window partitions on lang
    (WindowGroupLimit prunes to 5 pre-shuffle)."""
    from ..functions.text import tokens
    from ..operators.sorts import topk_per_group

    docs = table(spark, sf_dir, "documents")
    tok = docs.select(
        "doc_id", "lang", F.explode(tokens(F.col("text"))).alias("term")
    )
    tf = tok.groupBy("lang", "term").agg(F.count(F.lit(1)).alias("tf"))
    df = tok.groupBy("term").agg(
        F.countDistinct("doc_id").alias("df")
    ).withColumnRenamed("term", "df_term")
    n_docs = docs.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(F.broadcast(df), tf.term == F.col("df_term"))
        .join(F.broadcast(n_docs))
        .select(
            "lang",
            "term",
            F.round(
                F.col("tf") * F.log(F.col("n_docs") / F.col("df")), 6
            ).alias("score"),
        )
    )
    top = topk_per_group(scored, ["lang"], [F.desc("score"), F.col("term")], 5)
    return top.select(
        "lang", "term", "score", F.col("rank").cast("long").alias("rank")
    )


@declare(
    "dup_rate_by_source",
    oracle="""
    SELECT source, COUNT(*) AS docs,
           COUNT(DISTINCT sha256(lower(trim(text)))) AS distinct_docs,
           ROUND(100.0 * (COUNT(*) - COUNT(DISTINCT sha256(lower(trim(text)))))
                 / COUNT(*), 6) AS dup_pct
    FROM documents GROUP BY source
    """,
)
def dup_rate_by_source(spark, sf_dir):
    """Corpus-quality report: exact-duplicate rate per source — the
    number a crawl pipeline watches to decide which feeds to throttle.
    The distinct count runs on 32-byte content hashes, not bodies, so
    the two-phase distinct expansion shuffles hashes only; text never
    leaves the first stage."""
    d = table(spark, sf_dir, "documents")
    h = F.sha2(F.lower(F.trim(F.col("text"))), 256)
    return (
        d.select("source", h.alias("h"))
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("docs"),
            F.countDistinct("h").alias("distinct_docs"),
        )
        .select(
            "source",
            "docs",
            "distinct_docs",
            F.round(
                100.0 * (F.col("docs") - F.col("distinct_docs")) / F.col("docs"), 6
            ).alias("dup_pct"),
        )
    )


_SHINGLE_PAIRS_CTE = f"""{_SHINGLE_SIZES_CTE},{_SHINGLE_INTER_CTE},
    pairs AS (
      SELECT a, b, inter / (sa.sz + sb.sz - inter) AS jaccard
      FROM inter
      JOIN sizes sa ON sa.doc = a
      JOIN sizes sb ON sb.doc = b
      WHERE inter / (sa.sz + sb.sz - inter) >= 0.2)
"""


@declare(
    "dedup_priority_source",
    oracle="""
    SELECT doc_id, source, CAST(cnt AS BIGINT) AS dup_count FROM (
      SELECT doc_id, source,
             row_number() OVER (PARTITION BY h ORDER BY pri, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY h) AS cnt
      FROM (SELECT doc_id, source,
                   sha256(lower(trim(text))) AS h,
                   CAST(substr(source, 4) AS INTEGER) AS pri
            FROM documents) t) r
    WHERE rn = 1
    """,
)
def dedup_priority_source(spark, sf_dir):
    """X1 flavor: exact dedup with source preference — among identical
    documents keep the one from the most-trusted feed (numeric source
    rank), then the lowest doc_id; report the duplicate-group size.
    One shuffle on the 32-byte content hash; rank and group size share
    the window partitioning (operators/dedup.py dedup_priority)."""
    from ..operators.dedup import dedup_priority

    docs = table(spark, sf_dir, "documents").withColumn(
        "pri", F.substring("source", 4, 10).cast("int")
    )
    return dedup_priority(docs, priority_col="pri").select(
        "doc_id", "source", F.col("dup_count").cast("long").alias("dup_count")
    )


@declare(
    "jaccard_top_neighbor",
    oracle=f"""
    WITH {_SHINGLE_PAIRS_CTE},
    sym AS (SELECT a AS doc, b AS neighbor, jaccard FROM pairs
            UNION ALL
            SELECT b AS doc, a AS neighbor, jaccard FROM pairs),
    ranked AS (SELECT doc, neighbor, jaccard,
                      row_number() OVER (PARTITION BY doc
                                         ORDER BY jaccard DESC, neighbor) AS rn
               FROM sym)
    SELECT doc, neighbor, ROUND(jaccard, 8) AS jaccard
    FROM ranked WHERE rn = 1
    """,
)
def jaccard_top_neighbor(spark, sf_dir):
    """Nearest-neighbor-by-content view: for every document with at
    least one near-dup candidate, its single most-similar neighbor
    (highest shingle Jaccard, ties to the lower id). The inverted-index
    pair join from jaccard_pairs symmetrized + one top-1 window —
    Jaccard values are exact rationals, so the ranking is engine-stable."""
    from ..functions.similarity import jaccard_pairs

    pairs = jaccard_pairs(table(spark, sf_dir, "documents"), n=3, threshold=0.2)
    # symmetrize by exploding each pair into both directions IN the one
    # pair stream — a self-union of `pairs` would execute the whole
    # inverted-index join twice (Spark does not reuse common subplans
    # across union branches)
    sym = pairs.select(
        F.explode(
            F.array(
                F.struct(F.col("a").alias("doc"), F.col("b").alias("neighbor")),
                F.struct(F.col("b").alias("doc"), F.col("a").alias("neighbor")),
            )
        ).alias("e"),
        "jaccard",
    ).select("e.doc", "e.neighbor", "jaccard")
    from pyspark.sql import Window

    w = Window.partitionBy("doc").orderBy(F.desc("jaccard"), "neighbor")
    return (
        sym.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc", "neighbor", F.round("jaccard", 8).alias("jaccard"))
    )


@declare(
    "near_dup_rate",
    oracle=f"""
    WITH {_SHINGLE_PAIRS_CTE},
    involved AS (SELECT DISTINCT doc FROM
                 (SELECT a AS doc FROM pairs UNION ALL SELECT b FROM pairs) u)
    SELECT (SELECT COUNT(*) FROM documents) AS docs_total,
           (SELECT COUNT(*) FROM involved) AS docs_with_neardup,
           ROUND((SELECT COUNT(*) FROM involved) * 1.0 /
                 (SELECT COUNT(*) FROM documents), 6) AS near_dup_rate
    """,
)
def near_dup_rate(spark, sf_dir):
    """Corpus-health KPI: what fraction of documents have at least one
    near-duplicate (shingle Jaccard ≥ 0.2)? The single-row rollup every
    training-data pipeline reports before/after dedup. Same bucketed
    pair generation; the involved-doc set is a cheap distinct over pair
    endpoints."""
    from ..functions.similarity import jaccard_pairs

    docs = table(spark, sf_dir, "documents")
    pairs = jaccard_pairs(docs, n=3, threshold=0.2)
    involved = (
        pairs.select(
            F.explode(F.array(F.col("a"), F.col("b"))).alias("doc")
        )  # one pass over the pair stream, not a plan-doubling self-union
        .distinct()
        .agg(F.count(F.lit(1)).alias("docs_with_neardup"))
    )
    total = docs.agg(F.count(F.lit(1)).alias("docs_total"))
    return total.join(involved).select(
        "docs_total",
        "docs_with_neardup",
        F.round(F.col("docs_with_neardup") / F.col("docs_total"), 6).alias(
            "near_dup_rate"
        ),
    )


@declare(
    "bigram_next_word",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                  FROM documents),
    bg AS (SELECT unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
           FROM toks),
    c AS (SELECT split_part(g, ' ', 1) AS w1, split_part(g, ' ', 2) AS w2,
                 COUNT(*) AS cnt
          FROM bg GROUP BY 1, 2),
    tot AS (SELECT w1, SUM(cnt) AS w1_total FROM c GROUP BY w1),
    r AS (SELECT c.w1, c.w2, c.cnt, tot.w1_total,
                 row_number() OVER (PARTITION BY c.w1
                                    ORDER BY c.cnt DESC, c.w2) AS rank
          FROM c JOIN tot ON c.w1 = tot.w1)
    SELECT w1, w2, CAST(cnt AS BIGINT) AS cnt,
           CAST(w1_total AS BIGINT) AS w1_total,
           ROUND(cnt / w1_total, 8) AS p,
           CAST(rank AS BIGINT) AS rank
    FROM r WHERE rank <= 3 AND w1_total >= 20
    """,
)
def bigram_next_word(spark, sf_dir):
    """Word-bigram conditional statistics — the vocab/LM-prior pass of a
    corpus pipeline: for each head word seen ≥ 20 times, its top-3 next
    words with conditional frequency. Classic wordcount shuffle shape:
    map-side partial agg on (w1, w2); the head-word totals reuse the
    same rows; skewed heads (stopwords) are exactly what AQE skew
    handling + partial aggregation absorb at corpus scale."""
    from ..operators.sorts import topk_per_group

    bg = X.bigram_rows(table(spark, sf_dir, "documents"))
    cnt = bg.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("cnt"))
    tot = cnt.groupBy("w1").agg(F.sum("cnt").alias("w1_total"))
    ranked = topk_per_group(cnt, ["w1"], [F.desc("cnt"), F.col("w2")], 3)
    return (
        ranked.join(tot, "w1")
        .filter(F.col("w1_total") >= 20)
        .select(
            "w1", "w2", "cnt",
            F.col("w1_total").cast("long").alias("w1_total"),
            F.round(F.col("cnt") / F.col("w1_total"), 8).alias("p"),
            F.col("rank").cast("long").alias("rank"),
        )
    )


@declare(
    "doc_lm_score",
    oracle="""
    WITH toks AS (SELECT doc_id, regexp_split_to_array(trim(text), '\\s+') AS t
                  FROM documents),
    bg AS (SELECT doc_id AS doc,
                  unnest([t[i] || ' ' || t[i+1] FOR i IN range(1, len(t))]) AS g
           FROM toks),
    pairs AS (SELECT doc, split_part(g, ' ', 1) AS w1,
                     split_part(g, ' ', 2) AS w2
              FROM bg),
    c AS (SELECT w1, w2, COUNT(*) AS cnt FROM pairs GROUP BY 1, 2),
    tot AS (SELECT w1, SUM(cnt) AS w1_total FROM c GROUP BY w1),
    v AS (SELECT COUNT(DISTINCT w2) AS v FROM c)
    SELECT p.doc AS doc_id, COUNT(*) AS n_bigrams,
           ROUND(AVG(-ln((c.cnt + 1.0) / (tot.w1_total + v.v))), 6) AS avg_nll
    FROM pairs p
    JOIN c ON c.w1 = p.w1 AND c.w2 = p.w2
    JOIN tot ON tot.w1 = p.w1
    CROSS JOIN v
    GROUP BY p.doc
    """,
)
def doc_lm_score(spark, sf_dir):
    """CCNet-style LM quality scoring: per-document mean −ln p under the
    corpus's own add-one-smoothed bigram model — the filter signal that
    separates fluent text from gibberish/boilerplate before training.
    Counts are vocabulary-sized (Zipf); the probe is the row-locally
    re-expanded bigram stream; V is a broadcast 1-row frame. The whole
    chain is count arithmetic + one ln, so the oracle replays it
    end-to-end (functions/text.doc_lm_score)."""
    return X.doc_lm_score(table(spark, sf_dir, "documents"))


@declare(
    "fuzzy_match_docs",
    oracle="""
    WITH t AS (SELECT doc_id AS doc, lower(trim(text)) AS nt FROM documents),
    k AS (SELECT doc, nt,
                 substr(nt, 1, 4) || '|' || CAST(length(nt) // 8 AS VARCHAR) AS blk,
                 substr(nt, 1, 32) AS head, length(nt) AS len
          FROM t)
    SELECT l.doc AS a, r.doc AS b,
           CAST(levenshtein(l.head, r.head) AS BIGINT) AS dist,
           CAST(l.len AS BIGINT) AS len_a, CAST(r.len AS BIGINT) AS len_b
    FROM k l JOIN k r ON l.blk = r.blk AND l.doc < r.doc
    WHERE levenshtein(l.head, r.head) <= 5
    """,
)
def fuzzy_match_docs(spark, sf_dir):
    """Blocked edit-distance fuzzy matching (record linkage): pairs
    sharing a (4-char prefix, length-bucket) block whose 32-char heads
    are within Levenshtein 5 — both engines share the exact edit
    distance, so the whole pipeline is hash-adjudicated. The quadratic
    verify runs only inside blocks."""
    return X.fuzzy_pairs(table(spark, sf_dir, "documents"))


@declare(
    "keyword_search",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                  FROM documents),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf
           FROM toks WHERE w IN ('vector', 'merge', 'stream')
           GROUP BY 1, 2),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    n AS (SELECT COUNT(*) AS n FROM documents),
    hits AS (SELECT t.doc_id,
                    COUNT(*) AS n_terms,
                    ROUND(SUM(t.tf * ln(n.n / d.df)), 6) AS score
             FROM tf t JOIN dfreq d ON d.w = t.w CROSS JOIN n
             GROUP BY t.doc_id, n.n
             HAVING COUNT(*) = 3)
    SELECT doc_id, n_terms, score
    FROM hits ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def keyword_search(spark, sf_dir):
    """Inverted-index keyword search: documents containing ALL query
    terms, ranked by summed tf·idf, top-20. The term filter lands ON
    the token stream before any aggregation, so the postings build is
    pruned to |query| terms — at 100 TB a persisted postings table
    makes this a 3-key lookup, here the scan-side filter is the same
    selectivity; document frequencies are |terms| rows, the corpus
    count rides as a 1-row broadcast frame, and the final top-20 is a
    TakeOrderedAndProject, never a global sort. The cut orders by the
    ROUNDED score (6 dp) so the LIMIT boundary is engine- and
    run-stable — the raw double sum of up to 3 tf·idf terms is exposed
    to aggregation-order nondeterminism at equal-score boundaries."""
    docs = table(spark, sf_dir, "documents")
    terms = ["vector", "merge", "stream"]
    toks = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("w")
    ).filter(F.col("w").isin(terms))
    # df as a WINDOW over the tf frame, not a groupBy+join back
    # (round 11, guide §2.4): a sibling `tf.groupBy("w")` branch
    # re-executed the whole pruned-postings subtree — a second corpus
    # scan + explode — because Spark shares no DAG between consumers;
    # the window pays one exchange of the TINY tf frame instead.
    # Measured at sf0.1: 0.49 s → 0.38 s, identical rows.
    from pyspark.sql import Window as _W

    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("df", F.count(F.lit(1)).over(_W.partitionBy("w")))
    )
    n = docs.agg(F.count(F.lit(1)).alias("n"))
    hits = (
        tf.join(n)
        .select(
            "doc_id",
            (F.col("tf") * F.log(F.col("n") / F.col("df"))).alias("tfidf"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("tfidf").alias("raw"),
        )
        .filter(F.col("n_terms") == 3)
    )
    return (
        hits.withColumn("score", F.round("raw", 6))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
        .select("doc_id", "n_terms", "score")
    )


@declare(
    "bm25_search",
    oracle="""
    WITH toks AS (SELECT doc_id,
                         unnest(regexp_split_to_array(trim(text), '\\s+')) AS w
                  FROM documents),
    dl AS (SELECT doc_id,
                  CAST(len(regexp_split_to_array(trim(text), '\\s+')) AS BIGINT) AS dl
           FROM documents),
    stats AS (SELECT COUNT(*) AS n, AVG(dl) AS avgdl FROM dl),
    tf AS (SELECT doc_id, w, COUNT(*) AS tf
           FROM toks WHERE w IN ('vector', 'merge', 'stream')
           GROUP BY 1, 2),
    dfreq AS (SELECT w, COUNT(*) AS df FROM tf GROUP BY w),
    hits AS (SELECT t.doc_id,
                    COUNT(*) AS n_terms,
                    ROUND(SUM(
                      ln((s.n - d.df + 0.5) / (d.df + 0.5) + 1)
                      * t.tf * 2.2
                      / (t.tf + 1.2 * (1 - 0.75 + 0.75 * l.dl / s.avgdl))
                    ), 6) AS score
             FROM tf t
             JOIN dfreq d ON d.w = t.w
             JOIN dl l ON l.doc_id = t.doc_id
             CROSS JOIN stats s
             GROUP BY t.doc_id)
    SELECT doc_id, n_terms, score
    FROM hits ORDER BY score DESC, doc_id LIMIT 20
    """,
)
def bm25_search(spark, sf_dir):
    """BM25 retrieval (k1=1.2, b=0.75, Lucene-style smoothed idf) —
    keyword_search's length-normalized, disjunctive sibling: ANY query
    term matches, term saturation via tf/(tf+k1·norm), and short docs
    outrank long ones at equal tf instead of tf·idf's length bias.
    Same pruned postings shape (the term filter lands on the token
    stream, so the build is |query| terms wide); dl is a map-side
    per-doc count, and N/avgdl ride as a 1-row broadcast frame. The
    final top-20 orders by the ROUNDED score (keyword_search's
    boundary-stability rule) via TakeOrderedAndProject — never a
    global sort."""
    docs = table(spark, sf_dir, "documents")
    terms = ["vector", "merge", "stream"]
    k1, b = 1.2, 0.75
    toks = docs.select(
        "doc_id", F.explode(X.tokens(F.col("text"))).alias("w")
    ).filter(F.col("w").isin(terms))
    # df via a window over tf — same corpus-scan removal as
    # keyword_search (round 11); measured 0.39 s → 0.35 s at sf0.1
    from pyspark.sql import Window as _W

    tf = (
        toks.groupBy("doc_id", "w")
        .agg(F.count(F.lit(1)).alias("tf"))
        .withColumn("df", F.count(F.lit(1)).over(_W.partitionBy("w")))
    )
    dl = docs.select(
        "doc_id", F.size(X.tokens(F.col("text"))).cast("long").alias("dl")
    )
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"), F.avg("dl").alias("avgdl")
    )
    hits = (
        tf.join(dl, "doc_id")
        .join(stats)
        .select(
            "doc_id",
            (
                F.log((F.col("n") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1)
                * F.col("tf") * (k1 + 1)
                / (
                    F.col("tf")
                    + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
                )
            ).alias("part"),
        )
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_terms"),
            F.sum("part").alias("raw"),
        )
    )
    return (
        hits.withColumn("score", F.round("raw", 6))
        .orderBy(F.desc("score"), "doc_id")
        .limit(20)
        .select("doc_id", "n_terms", "score")
    )


@declare(
    "corpus_drift_psi",
    oracle="""
    WITH b AS (
      SELECT CASE WHEN doc_id % 2 = 0 THEN 'ref' ELSE 'cur' END AS split,
             CAST(least(floor(n_chars / 100), 9) AS BIGINT) AS bucket
      FROM documents),
    c AS (SELECT split, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2),
    grid AS (SELECT s.split, CAST(b.bucket AS BIGINT) AS bucket
             FROM (SELECT 'ref' AS split UNION ALL SELECT 'cur') s
             CROSS JOIN (VALUES (0),(1),(2),(3),(4),(5),(6),(7),(8),(9))
                        AS b(bucket)),
    cd AS (SELECT g.split, g.bucket, COALESCE(c.n, 0) AS n
           FROM grid g LEFT JOIN c
             ON c.split = g.split AND c.bucket = g.bucket),
    t AS (SELECT split, SUM(n) AS tot FROM cd GROUP BY split),
    p AS (SELECT cd.bucket,
                 MAX(CASE WHEN cd.split = 'ref'
                     THEN (CAST(cd.n AS DOUBLE) + 0.5)
                          / (CAST(t.tot AS DOUBLE) + 5.0) END) AS p_ref,
                 MAX(CASE WHEN cd.split = 'cur'
                     THEN (CAST(cd.n AS DOUBLE) + 0.5)
                          / (CAST(t.tot AS DOUBLE) + 5.0) END) AS p_cur
          FROM cd JOIN t ON t.split = cd.split
          GROUP BY cd.bucket)
    SELECT bucket,
           ROUND(p_ref, 8) AS p_ref,
           ROUND(p_cur, 8) AS p_cur,
           ROUND((p_cur - p_ref) * ln(p_cur / p_ref), 8) AS psi_term
    FROM p
    """,
)
def corpus_drift_psi(spark, sf_dir):
    """Dataset drift monitor — Population Stability Index between a
    reference and a current ingest split, per length bucket: the
    ML-ops screen that catches a crawler or filter change shifting the
    corpus's length distribution before it shifts the model. The count
    grid is DENSIFIED to the full 2-split × 10-bucket literal frame
    (20 rows, no join against the fact stream) before smoothing, so a
    bucket absent from one split still gets the add-half probability
    0.5/(tot+5) — the true add-half PSI, finite everywhere, with no
    log-floor fudge for missing buckets. Σ psi_term > 0.2 is the
    conventional alarm. Two collapsed aggregates (≤ 20 rows/side) —
    the fact stream shuffles once at (split, bucket) grain."""
    docs = table(spark, sf_dir, "documents")
    b = docs.select(
        F.when(F.col("doc_id") % 2 == 0, "ref").otherwise("cur").alias("split"),
        F.least(F.floor(F.col("n_chars") / 100), F.lit(9))
        .cast("long")
        .alias("bucket"),
    )
    c = b.groupBy("split", "bucket").agg(F.count(F.lit(1)).alias("n"))
    grid = spark.createDataFrame(
        [(s, b) for s in ("ref", "cur") for b in range(10)],
        "split string, bucket long",
    )
    cd = grid.join(c, ["split", "bucket"], "left").select(
        "split", "bucket", F.coalesce(F.col("n"), F.lit(0)).alias("n")
    )
    t = cd.groupBy("split").agg(F.sum("n").alias("tot"))
    p = (
        cd.join(t, "split")
        .groupBy("bucket")
        .agg(
            F.max(
                F.when(
                    F.col("split") == "ref",
                    (F.col("n") + 0.5) / (F.col("tot") + 5.0),
                )
            ).alias("p_ref"),
            F.max(
                F.when(
                    F.col("split") == "cur",
                    (F.col("n") + 0.5) / (F.col("tot") + 5.0),
                )
            ).alias("p_cur"),
        )
    )
    return p.select(
        "bucket",
        F.round("p_ref", 8).alias("p_ref"),
        F.round("p_cur", 8).alias("p_cur"),
        F.round(
            (F.col("p_cur") - F.col("p_ref"))
            * F.log(F.col("p_cur") / F.col("p_ref")),
            8,
        ).alias("psi_term"),
    )
