"""Lake maintenance: small-file compaction and sort-clustered rewrite.

The reference never manages its storage layout (DynamoDB does it for
them); a parquet lake at 100 TB lives or dies by it. Streaming sinks
and over-parallel writers produce thousands of KB-sized files per
partition; every downstream scan then pays file-open + footer-read +
task-schedule per file. The standard fix is a periodic rewrite into
target-sized files, optionally range-clustered on a filter column so
parquet row-group min/max statistics (and partition-level file
pruning) actually skip data.

Concurrency contract: every op here is SINGLE-WRITER per directory —
an in-place rewrite (compaction, purge, retention) racing another
writer on the same partition can interleave file sets with no
transaction log to arbitrate. The IN-PLACE mutators
(`delete_keys_from_lake`, `expire_partitions`) hold the lake root's
single-writer lock for their rewrite window — the same
re-read-inside-the-critical-section discipline as the persisted ANN
index lifecycle, and since round 7 the same DUAL-MODE lock: kernel
flock for local roots (plain paths and decoded file: URIs), the
create-exclusive CAS lease (`fsio.fs_cas_write_lock`) for remote
(s3a://…/hdfs://…) roots when the caller supplies the session (the
pre-r7 degrade-to-UNLOCKED-with-warning remains only for the
no-session case, where a lease cannot be taken); copy-rewrites
(`compact_parquet_dir`, `zorder_parquet_dir`) write to a NEW directory
and need no lock on the source. At 100 TB under a real multi-writer
scheduler, put a table format with a transaction log (manifest
compare-and-swap) under these ops instead of raw parquet dirs.
"""

from __future__ import annotations

import contextlib
import math
import warnings

from pyspark.sql import DataFrame, SparkSession

from ..locking import dir_write_lock


@contextlib.contextmanager
def _lake_write_lock(path: str, spark: SparkSession | None = None):
    """Single-writer lock for a lake root — dual-mode since round 7
    (pre-r7: remote schemes ran UNLOCKED with a warning). Local roots —
    plain paths and decoded ``file:`` URIs, so a ``file:///data/lake``
    writer and a ``/data/lake`` writer exclude each other — take the
    kernel flock; remote Hadoop-FS roots take the create-exclusive CAS
    lease (``fsio.fs_cas_write_lock``, the same object-store lease the
    persisted-index mutators use; a crashed holder is cleared
    explicitly via ``fsio.fs_force_unlock``). Callers must pass the
    session EXPLICITLY to get the remote lease — without one the old
    degrade-with-warning path remains (a lock that cannot exist must
    never LOOK held, and an implicit getActiveSession() would make the
    locked-or-not outcome depend on ambient process state). Under a
    real multi-writer scheduler, a transactional table format is still
    the right tool for lake mutations."""
    from ..fsio import fs_cas_write_lock, local_form

    local = local_form(path)
    if local is not None:
        with dir_write_lock(local):
            yield
        return
    if spark is None:
        warnings.warn(
            f"lake root {path!r} is on a Hadoop filesystem and no "
            "SparkSession is active to resolve it: the single-writer "
            "lease cannot be taken, so this mutation runs UNLOCKED. "
            "Ensure no concurrent writer.",
            stacklevel=3,
        )
        yield
        return
    with fs_cas_write_lock(spark, path):
        yield


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


def zorder_key(
    df: DataFrame,
    cols: list[str],
    bits_per_dim: int = 8,
) -> tuple[DataFrame, str]:
    """Append a Morton (Z-order) key column interleaving ``cols``.

    Each column is normalized to a ``2^bits_per_dim``-bucket id over its
    observed [min, max] (one tiny agg job — the only driver action),
    then the ids' bits are interleaved with shift/and/or built-ins —
    pure codegen'd map-side arithmetic. Clustering files by the
    resulting key gives row-group/file min-max pruning on EVERY
    participating column, where single-column sort-clustering only
    prunes its leading column — the standard multi-dimensional layout
    for a 100 TB lake (Delta/Iceberg OPTIMIZE ZORDER do the same
    bucket-then-interleave).

    Returns (df_with_key, key_col_name).
    """
    from pyspark.sql import functions as F

    n_buckets = 1 << bits_per_dim
    stats = df.agg(
        *[F.min(F.col(c).cast("double")).alias(f"mn_{c}") for c in cols],
        *[F.max(F.col(c).cast("double")).alias(f"mx_{c}") for c in cols],
    ).first()

    bucket_ids = []
    for c in cols:
        mn, mx = stats[f"mn_{c}"], stats[f"mx_{c}"]
        if mn is None or mx is None:
            # all-NULL / non-castable column (or an empty input): no
            # spread to cluster on — contribute a constant bucket
            # instead of crashing the driver on None arithmetic
            bucket_ids.append(F.lit(0).cast("long"))
            continue
        span = (mx - mn) or 1.0
        b = F.least(
            F.lit(n_buckets - 1),
            F.coalesce(
                F.floor(
                    (F.col(c).cast("double") - F.lit(mn))
                    / F.lit(span) * n_buckets
                ),
                F.lit(0),  # NULL values in a mixed column → bucket 0
            ),
        ).cast("long")
        bucket_ids.append(b)

    k = len(cols)
    zval = F.lit(0).cast("long")
    for bit in range(bits_per_dim):
        for ci, b in enumerate(bucket_ids):
            zval = zval.bitwiseOR(
                F.shiftleft(
                    F.shiftrightunsigned(b, bit).bitwiseAND(F.lit(1)),
                    bit * k + ci,
                )
            )
    return df.withColumn("__zkey", zval), "__zkey"


def zorder_parquet_dir(
    spark: SparkSession,
    src: str,
    dst: str,
    zorder_by: list[str],
    target_file_bytes: int = 128 * 1024 * 1024,
    bits_per_dim: int = 8,
) -> int:
    """Rewrite a parquet directory Z-order-clustered on ``zorder_by``:
    each output file covers a compact hyper-rectangle of the key space,
    so selective filters on ANY clustered column skip whole files via
    parquet min/max stats. Same one-pass sizing discipline as
    ``compact_parquet_dir``."""
    n = max(1, math.ceil(dir_bytes(spark, src) / target_file_bytes))
    df, key = zorder_key(spark.read.parquet(src), zorder_by, bits_per_dim)
    (
        df.repartitionByRange(n, key)
        .sortWithinPartitions(key)
        .drop(key)
        .write.mode("overwrite")
        .parquet(dst)
    )
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


def write_training_shards(
    docs: DataFrame,
    out_dir: str,
    n_shards: int = 16,
    salt: str = "shuffle:v1",
    id_col: str = "doc_id",
) -> None:
    """Materialize the training layout: documents written to
    ``out_dir/shard_id=K/`` in deterministic pseudo-random order
    (``functions/curation.shard_manifest`` semantics) — the artifact a
    trainer streams sequentially per worker.

    Scale shape: the manifest join is on ``id_col`` (ids + manifest
    columns move, bodies move once into their shard), then ONE
    repartition on shard_id with a per-shard sort on position. With
    n_shards ≈ trainer world size, each output directory is one
    worker's epoch stream; re-salting re-deals the epoch without
    rewriting bodies anywhere else.
    """
    from ..functions.curation import shard_manifest

    manifest = shard_manifest(docs, n_shards=n_shards, salt=salt, id_col=id_col)
    (
        # shuffle_key is the manifest's INTERNAL md5 plumbing — joining
        # it into every written row would inflate the artifact with a
        # 32-char column trainers must know to ignore
        docs.join(manifest.drop("shuffle_key"), id_col)
        .repartition(n_shards, "shard_id")
        .sortWithinPartitions("shard_id", "pos_in_shard")
        .write.mode("overwrite")
        .partitionBy("shard_id")
        .parquet(out_dir)
    )


def delete_keys_from_lake(
    spark: SparkSession,
    path: str,
    key_col: str,
    keys: list,
    partition_cols: list[str],
) -> int:
    """Targeted deletion (right-to-be-forgotten / retention purge) from
    a Hive-partitioned parquet lake: rewrite ONLY the partitions that
    contain the doomed keys, leave every other partition's files
    untouched. Returns the number of affected partitions.

    Scale shape: discovery scans just (key, partition) columns with the
    key predicate pushed down; the rewrite reads back only the affected
    partitions (partition-pruned scan) and overwrites them via dynamic
    partition overwrite — at 100 TB a single user's erasure touches the
    handful of date partitions they appear in, not the lake.

    ``keys`` may be a plain list (the single-user convenience — the
    predicate becomes an IN literal, pushed down to the scan) or a
    DataFrame of keys (the batched-retention 100 TB shape: a
    million-key purge must not inline a million literals into the
    plan, so discovery and the survivor filter become semi/anti
    joins — Catalyst broadcasts or shuffles the key side as it sees
    fit, and NULL-key rows survive by join semantics exactly as the
    literal path keeps them explicitly). Same batching advice as the
    ANN index's delete: one call with all keys = one discovery scan +
    one rewrite per affected partition.

    Holds the lake root's single-writer lock for the whole
    discover-rewrite-drop window (module concurrency contract) —
    discovery re-reads the lake INSIDE the lock, so a purge never
    rewrites partitions from a view another writer has since replaced.
    On a remote (hdfs://, s3a://) lake the single-writer guarantee
    comes from the create-exclusive CAS lease (round 7) — see
    `_lake_write_lock`.

    Crash atomicity is PER-SCHEME (round 9 — stated here the way
    fsio.py states its rename semantics): the dynamic partition
    overwrite commits through Spark's file committer, so a crash
    mid-purge inherits the committer's rename story. On rename-atomic
    filesystems (``file:``, HDFS, the test ``mock://`` scheme) a crash
    leaves the OLD partition content plus ``_temporary`` staging
    debris that readers ignore (the ``_``-prefix listing rule) and the
    next successful overwrite clears — re-running the same purge is
    the recovery, and a re-run whose keys are already gone returns 0
    touching nothing (both test-pinned, incl. on ``mock://``). On
    copy+delete object stores (raw S3A with the classic
    FileOutputCommitter) the commit window is not atomic: a crash
    inside it can leave a partition holding old AND new files
    together, which a naive re-run would double-count — there, pair
    the purge with an atomic-commit committer (e.g. the S3A committers
    on Hadoop ≥ 3.1) or a transactional table format; this op does not
    paper over a non-atomic commit.
    """
    with _lake_write_lock(path, spark):
        return _delete_keys_locked(spark, path, key_col, keys, partition_cols)


def _delete_keys_locked(
    spark, path, key_col, keys, partition_cols
) -> int:
    from pyspark.sql import functions as F

    # Partition values must round-trip EXACTLY (day=01 inferred as int 1
    # would rewrite into a NEW day=1 directory, orphaning the old one) —
    # read them as strings for the duration of the rewrite.
    infer_key = "spark.sql.sources.partitionColumnTypeInference.enabled"
    old_infer = spark.conf.get(infer_key)
    spark.conf.set(infer_key, "false")
    try:
        df = spark.read.parquet(path)
        if isinstance(keys, DataFrame):
            kcol = key_col if key_col in keys.columns else keys.columns[0]
            kdf = keys.select(F.col(kcol).alias(key_col)).distinct()
            doomed = df.join(kdf, key_col, "left_semi")
            # left_anti keeps NULL-key rows by join semantics (NULL
            # never equals), matching the literal path's explicit rule
            keep_filter = lambda part: part.join(  # noqa: E731
                kdf, key_col, "left_anti"
            )
        else:
            hit = F.col(key_col).isin(keys)
            doomed = df.filter(hit)
            keep_filter = lambda part: part.filter(  # noqa: E731
                (~hit) | F.col(key_col).isNull()
            )
        affected = doomed.select(*partition_cols).distinct().collect()
        if not affected:
            return 0
        part_pred = None
        for r in affected:
            p = None
            for c in partition_cols:
                e = F.col(c) == r[c]
                p = e if p is None else (p & e)
            part_pred = p if part_pred is None else (part_pred | p)
        # Materialize survivors BEFORE the overwrite — the rewrite reads
        # the same files it replaces; the checkpoint is proportional to
        # the affected partitions only, which is the whole point.
        # NULL-key rows are not targets: isin() yields NULL for them and
        # a bare ~hit filter would silently destroy them in the rewrite,
        # so the literal path keeps them explicitly (the DataFrame path
        # keeps them by anti-join semantics).
        survivors = keep_filter(df.filter(part_pred)).localCheckpoint(
            eager=True
        )
        (
            survivors.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy(*partition_cols)
            .parquet(path)
        )
        # Dynamic partition overwrite only replaces partitions PRESENT in
        # the written data: an affected partition whose rows ALL matched
        # the doomed keys has zero survivors, is absent from the write,
        # and its old files (holding exactly the keys being erased) would
        # silently remain on disk. Drop those directories outright.
        alive = {
            tuple(str(r[c]) for c in partition_cols)
            for r in survivors.select(*partition_cols).distinct().collect()
        }
        jvm = spark._jvm
        fs = jvm.org.apache.hadoop.fs.Path(path).getFileSystem(
            spark._jsc.hadoopConfiguration()
        )
        # directory names are HIVE-ESCAPED on disk (':' → %3A etc.) —
        # building the path from raw values would miss any special-char
        # partition and silently leave the files holding exactly the
        # keys being erased
        esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
        for r in affected:
            if tuple(str(r[c]) for c in partition_cols) in alive:
                continue
            sub = "/".join(
                f"{c}={esc.escapePathName(str(r[c]))}" for c in partition_cols
            )
            dead = jvm.org.apache.hadoop.fs.Path(f"{path}/{sub}")
            if fs.exists(dead):
                fs.delete(dead, True)
        return len(affected)
    finally:
        spark.conf.set(infer_key, old_infer)


def expire_partitions(
    spark: SparkSession,
    path: str,
    partition_col: str,
    keep_values: list[str],
) -> int:
    """Retention purge: DROP whole partitions whose value is not in
    ``keep_values`` — directory deletes via the Hadoop FileSystem API,
    no data rewrite at all (the cheap half of lake lifecycle; targeted
    in-partition erasure is `delete_keys_from_lake`). Returns the
    number of partitions dropped. Works on any supported scheme
    (file://, hdfs://, s3a://). Holds the lake root's single-writer
    lock across the list-and-delete window so a concurrent
    purge/rewrite can't interleave with the directory drops; on a
    remote scheme exclusion comes from the CAS lease (round 7,
    `_lake_write_lock`)."""
    jvm = spark._jvm
    root = jvm.org.apache.hadoop.fs.Path(path)
    fs = root.getFileSystem(spark._jsc.hadoopConfiguration())
    # compare UNESCAPED values: directory names are Hive-escaped on
    # disk (a timestamp partition is ts=...%3A...), so matching the
    # caller's raw keep_values against raw names would read a kept
    # partition as droppable — silent data loss on any special-char
    # partition value
    esc = jvm.org.apache.spark.sql.catalyst.catalog.ExternalCatalogUtils
    keep = {str(v) for v in keep_values}
    prefix = f"{partition_col}="
    dropped = 0
    with _lake_write_lock(path, spark):
        for status in fs.listStatus(root):
            name = status.getPath().getName()
            if (
                status.isDirectory()
                and name.startswith(prefix)
                and esc.unescapePathName(name[len(prefix):]) not in keep
            ):
                fs.delete(status.getPath(), True)
                dropped += 1
    return dropped
