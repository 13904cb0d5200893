"""Text-analysis operators for the LLM-data-pipeline extension surface
(SURVEY §2.12): tokenization, shingles, per-document stats, quality
scoring, fingerprinting. All built-in expressions (codegen'd, no UDFs) —
at 100 TB these run map-side inside the scan stage.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

#: whitespace tokenizer shared by stats / shingles / jaccard so every
#: operator agrees on what a "word" is.
def tokens(text: Column) -> Column:
    return F.split(F.trim(text), r"\s+")


def distinct_tokens(text: Column) -> Column:
    return F.array_distinct(tokens(text))


def shingles(text: Column, n: int = 3) -> Column:
    """Word n-gram shingles as strings ("a b c"). Expressed with
    transform over an index sequence — stays in codegen, no UDF."""
    toks = tokens(text)
    return F.transform(
        F.sequence(F.lit(0), F.greatest(F.size(toks) - n, F.lit(0))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )


def text_stats(df: DataFrame, text_col: str = "text") -> DataFrame:
    """X4: per-document char/word/distinct-word counts + avg word length."""
    t = F.col(text_col)
    toks = tokens(t)
    return df.withColumns(
        {
            "char_count": F.length(t),
            "word_count": F.size(toks),
            "distinct_words": F.size(F.array_distinct(toks)),
        }
    )


def quality_score(df: DataFrame, text_col: str = "text") -> DataFrame:
    """Quality heuristics à la LLM-corpus filtering: length, mean word
    length, lexical diversity (type-token ratio). Deterministic,
    oracle-able arithmetic only."""
    t = F.col(text_col)
    toks = tokens(t)
    n_words = F.size(toks)
    return df.withColumns(
        {
            "n_words": n_words,
            "mean_word_len": (F.length(F.regexp_replace(t, r"\s+", "")) / n_words),
            "ttr": F.size(F.array_distinct(toks)) / n_words,
        }
    )


def fingerprint(text: Column) -> Column:
    """Document fingerprint: sha256 over the sorted distinct token set —
    robust to word order, the cheap tier of near-dup detection."""
    return F.sha2(F.concat_ws(" ", F.array_sort(distinct_tokens(text))), 256)
