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
