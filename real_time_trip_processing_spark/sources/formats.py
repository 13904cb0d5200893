"""Multi-format lake source: one scan/convert surface over the columnar
and interchange formats Spark ships natively (parquet, ORC, JSON, CSV).

Why this exists: a 100 TB lake is never one format — ORC arrives from
Hive-era pipelines, JSONL from crawls, CSV from exports — and the
engine's contract is that EVERY declared query runs identically over
any of them. `scan_lake` normalizes the read (schema-first for the
text formats — no sampling pass over 100 TB; native footer schema for
the columnar ones) and `convert_lake` is the migration op (rewrite a
directory into a columnar format, preserving Hive partitioning).

Columnar formats keep their scan-level powers: predicate pushdown and
column pruning reach both parquet AND ORC scans (pinned by
tests/test_sources.py::test_orc_scan_pushes_filters); the text formats
parse schema-first, with opt-in PERMISSIVE corruption capture
(``corrupt_capture=True`` adds the ``_corrupt_record`` quarantine
column; without it corrupt lines parse to all-null rows).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

#: formats with embedded schema + pushdown-capable scans
COLUMNAR = ("parquet", "orc")
#: schema-first text formats
TEXT = ("json", "csv")


def scan_lake(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema: T.StructType | None = None,
    corrupt_capture: bool = False,
    **options: str,
) -> DataFrame:
    """Uniform scan over any supported lake format.

    Columnar formats read their own schema (passing one anyway enables
    scan-level projection enforcement); text formats REQUIRE one — an
    inference pass over a 100 TB directory is a full extra read.

    ``corrupt_capture=True`` (text formats): malformed lines surface in
    a ``_corrupt_record`` column (same convention as
    `sources/jsonl.scan_jsonl` — quarantine via `jsonl.split_corrupt`)
    instead of parsing to all-null rows indistinguishable from
    legitimately-null records. Off by default: the extra column changes
    the scan's schema, and the declared queries scan pre-validated
    testdata.
    """
    fmt = fmt.lower()
    if fmt not in COLUMNAR + TEXT:
        raise ValueError(f"unsupported lake format: {fmt!r}")
    reader = spark.read.format(fmt)
    if fmt in TEXT:
        if schema is None:
            raise ValueError(
                f"{fmt} scans are schema-first: pass an explicit schema "
                "(schema inference would re-read the whole directory)"
            )
        reader = reader.option("mode", "PERMISSIVE")
        if corrupt_capture:
            from .jsonl import CORRUPT_COL

            if CORRUPT_COL not in schema.fieldNames():
                schema = T.StructType(
                    list(schema.fields)
                    + [T.StructField(CORRUPT_COL, T.StringType())]
                )
            reader = reader.option("columnNameOfCorruptRecord", CORRUPT_COL)
    if fmt == "csv":
        reader = reader.option("header", "true")
    if schema is not None:
        reader = reader.schema(schema)
    for key, val in options.items():
        reader = reader.option(key, val)
    return reader.load(path)


def convert_lake(
    df: DataFrame,
    dst: str,
    fmt: str = "orc",
    partition_by: list[str] | None = None,
    compression: str | None = None,
) -> None:
    """Format migration: materialize ``df`` as a columnar lake directory
    (e.g. parquet → ORC for a Hive-consumer handoff). Partition columns
    become Hive-style directories so downstream scans partition-prune
    identically in either format. The write is a plain distributed
    sink — no repartition is forced here; callers control layout
    (bucketing/Z-order live in operators/maintenance.py)."""
    if fmt not in COLUMNAR:
        raise ValueError(f"convert_lake targets columnar formats, got {fmt!r}")
    w = df.write.mode("overwrite").format(fmt)
    if compression:
        w = w.option("compression", compression)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.save(dst)
