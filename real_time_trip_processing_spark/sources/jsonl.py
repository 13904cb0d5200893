"""JSONL corpus source — the de-facto interchange format for training
corpora (one JSON document per line, usually gzip parts).

Replaces hand-rolled line loops with Spark's JSON source: explicit
schema (no sampling pass over 100 TB), PERMISSIVE parsing with corrupt
lines captured instead of killing the job, and the same partitioned,
predicate-pushed scan the parquet tables get. Gzip parts are
line-splittable only per file — at scale keep parts ≤ a few hundred MB
so file-level parallelism stands in for split-level.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F, types as T

CORRUPT_COL = "_corrupt_record"


def scan_jsonl(
    spark: SparkSession, path: str, schema: T.StructType
) -> DataFrame:
    """Schema-first JSONL scan; malformed lines land in
    ``_corrupt_record`` (every declared column null) rather than
    failing the read — the corpus-scale contract where a 100 TB crawl
    always contains some garbage lines."""
    if CORRUPT_COL not in schema.fieldNames():
        schema = T.StructType(
            list(schema.fields) + [T.StructField(CORRUPT_COL, T.StringType())]
        )
    return (
        spark.read.schema(schema)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", CORRUPT_COL)
        .json(path)
    )


def split_corrupt(
    df: DataFrame, cache: bool = True
) -> tuple[DataFrame, DataFrame]:
    """(clean, quarantine): parsed rows without the corrupt column, and
    the full dead-letter rows (raw line in ``_corrupt_record``, declared
    columns null).

    The scan is cached first (``cache=True``, MEMORY_AND_DISK so a
    corpus-scale scan spills instead of evicting the executors):
    Spark rejects JSON-scan plans whose column-pruned reference set is
    the internal corrupt column alone
    (QUERY_ONLY_CORRUPT_RECORD_COLUMN) — and keeping every column in
    the projection does NOT survive pruning for aggregate-only actions
    like ``bad.count()``, the standard dead-letter monitoring metric
    (Catalyst prunes to what the AGGREGATE needs, not what the select
    lists). Caching materializes the scan once with the full schema, so
    both sides — and any count over them — are served from the cached
    relation.

    The CALLER owns the cache: ``clean.unpersist()`` (either returned
    frame releases the shared relation) once both sides are consumed.
    Pass ``cache=False`` to opt out — each side then re-scans the JSON,
    and corrupt-only aggregates over ``bad`` must keep a declared
    column referenced (e.g. count(doc_id IS NULL)) to stay plannable.
    (Round-6 ADVICE: the unconditional cache was an unbounded
    deserialized footprint the caller could not opt out of.)"""
    if cache:
        from pyspark import StorageLevel

        df = df.persist(StorageLevel.MEMORY_AND_DISK)
    clean = df.filter(F.col(CORRUPT_COL).isNull()).drop(CORRUPT_COL)
    bad = df.filter(F.col(CORRUPT_COL).isNotNull())
    return clean, bad
