"""Lake maintenance: small-file compaction and sort-clustered rewrite.

The reference never manages its storage layout (DynamoDB does it for
them); a parquet lake at 100 TB lives or dies by it. Streaming sinks
and over-parallel writers produce thousands of KB-sized files per
partition; every downstream scan then pays file-open + footer-read +
task-schedule per file. The standard fix is a periodic rewrite into
target-sized files, optionally range-clustered on a filter column so
parquet row-group min/max statistics (and partition-level file
pruning) actually skip data.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, SparkSession


def dir_bytes(spark: SparkSession, path: str) -> int:
    """Total bytes under ``path`` via the Hadoop FileSystem API — works
    for any supported scheme (file://, hdfs://, s3a://), not just the
    local disk the tests use."""
    jvm = spark._jvm
    hpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark._jsc.hadoopConfiguration())
    return fs.getContentSummary(hpath).getLength()


def compact_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    target_file_bytes: int = 128 * 1024 * 1024,
    cluster_by: list[str] | None = None,
) -> int:
    """Rewrite a parquet directory into ~``target_file_bytes`` files.

    Returns the number of output files requested. File count is sized
    from the SOURCE's physical bytes (compression-representative,
    unlike row counts), so the rewrite is one pass: no count() job.
    With ``cluster_by``, rows are range-partitioned and sorted on those
    columns — each output file then covers a disjoint value range, so
    min/max row-group stats prune whole files for point/range filters.
    """
    n = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    df = spark.read.parquet(src)
    if cluster_by:
        out = df.repartitionByRange(n, *cluster_by).sortWithinPartitions(*cluster_by)
    else:
        out = df.repartition(n)
    out.write.mode("overwrite").parquet(dst)
    return n


def write_bucketed(
    df: DataFrame,
    name: str,
    buckets: int,
    bucket_cols: list[str],
    sort_cols: list[str] | None = None,
    path: str | None = None,
) -> None:
    """Persist ``df`` as a bucketed (and optionally sort-clustered)
    parquet table.

    Bucketing is THE shuffle eliminator for repeated large-×-large
    joins: two tables bucketed on their join key with the same bucket
    count join bucket-to-bucket with ZERO Exchange — the hash
    partitioning is baked into the storage layout once at write time
    instead of re-paid at every query (pinned by
    tests/test_plan_shapes.py::test_bucketed_join_no_shuffle).
    ``sort_cols`` additionally pre-sorts each bucket file so sort-merge
    joins can skip the per-task Sort. At 100 TB this converts the
    fact-×-fact join (e.g. lineitem × orders on the order key) from the
    plan's dominant shuffle into a pure map-side zip.
    """
    w = df.write.mode("overwrite").format("parquet").bucketBy(buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    if path:
        w = w.option("path", path)
    w.saveAsTable(name)
