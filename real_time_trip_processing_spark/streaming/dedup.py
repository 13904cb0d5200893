"""Streaming incremental dedup — the continuous-ingest twin of
``operators/dedup.dedup_incremental``: a document stream is cleaned
against the already-ingested corpus while it arrives, instead of in a
nightly batch.

Scale shape mirrors the batch op: hashes are computed map-side in the
stream (32-byte state keys, never document bodies); the corpus side is
a static hash index (at 100 TB: the persisted, bucketed index of prior
ingests, refreshed per ingest cycle); the stream-static anti-join
probes it without shuffling the stream.

Writer contract for the ``__batch_id``-partitioned index sinks (exact /
span / near / embed): ONE checkpointed stream per index dir. The
exactly-once mechanism is the checkpoint's batch-id sequence — two
streams would collide on partition ids and each would screen against
the other's half-written state. The maintenance ops
(`delete_docs_from_dedup_index`, `compact_dedup_index`,
`rebuild_span_index_after_purge`) serialize against EACH OTHER via the
index dir's single-writer lock, but the sinks do not take it (a
per-batch lock would put a lease round-trip in the hot path for a
writer that is already unique by contract) — so stop the stream before
running them, as each op's docstring states.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F

from ..fsio import fs_read_text, fs_write_text


def _content_hash(text_col: str):
    # THE shared exact-family formula (operators/dedup: one definition,
    # round-10 review — independent copies are the formula-drift hazard
    # EXACT_SIG_VERSION exists to catch). NULL coalesces to '' so
    # within-stream dedup state and the corpus anti-join answer content
    # equality consistently.
    from ..operators.dedup import normalized_content_hash

    return normalized_content_hash(F.col(text_col))


def corpus_hash_index(
    corpus: DataFrame,
    text_col: str = "text",
    corpus_hash_col: str | None = None,
) -> DataFrame:
    """Distinct content-hash index over the ingested corpus, persisted
    (MEMORY_AND_DISK) for reuse across micro-batches — the static side
    of a stream-static join is re-evaluated EVERY trigger, so an
    unpersisted corpus would be re-scanned and re-hashed per batch.

    The CALLER owns the cache lifecycle: ``unpersist()`` it when the
    stream stops, and rebuild-then-swap it per ingest cycle — a
    persisted static side also FREEZES the corpus snapshot for as long
    as it stays cached, which is the intended refresh unit, not an
    accident. (Round-6 ADVICE: the old internal persist leaked one
    cached relation per stream (re)build with no handle to release it.)
    This convention predates — and is the origin of — the shared
    owned-cache contract in `functions/caching.py`: builders that
    persist INTERNAL frames attach them to the result for
    `release_owned_caches`; frames the caller hands in (like this
    index) are never attached, exactly because their lifecycle is the
    caller's, as described above.

    At 100 TB pass ``corpus_hash_col`` pointing at a pre-hashed index
    column so raw document bodies never ship through here at all.
    """
    if corpus_hash_col is not None:
        idx = corpus.select(F.col(corpus_hash_col).alias("text_hash"))
    else:
        idx = corpus.select(_content_hash(text_col).alias("text_hash"))
    return idx.distinct().persist(StorageLevel.MEMORY_AND_DISK)


def stream_dedup_incremental(
    stream: DataFrame,
    corpus: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    corpus_hash_col: str | None = None,
    corpus_index: DataFrame | None = None,
) -> DataFrame:
    """Survivors of a streaming document batch vs (a) itself and (b) the
    static corpus.

    Within-stream dedup state is keyed on the 32-byte content hash.
    With ``ts_col`` the state is bounded by
    ``dropDuplicatesWithinWatermark`` (duplicates are only expected
    within the re-delivery horizon — the Kafka/Kinesis at-least-once
    case); without it ``dropDuplicates`` keeps every seen hash (exact
    semantics, unbounded state — fine for availableNow backfills, not
    for a forever-running query).

    Corpus side: pass ``corpus_index=corpus_hash_index(...)`` for a
    long-lived stream — the caller then owns the persisted index (and
    its unpersist/refresh cycle; see corpus_hash_index). Passing a raw
    ``corpus`` builds the hash set inline WITHOUT caching it: correct,
    and leak-free, but the corpus is re-scanned every micro-batch — a
    convenience for bounded availableNow backfills only.

    This is the TRANSFORMATION shape (compose it into a streaming
    query; the corpus snapshot is the caller's). For the production
    ingest screen — a sink that also MAINTAINS the retained-corpus
    index on disk, records per-doc audit verdicts, and participates in
    GDPR erasure and batch compaction — use `stream_dedup_exact_sink`
    (round 10), the exact family's member of the span/near/embed sink
    quartet.
    """
    hashed = stream.withColumn("text_hash", _content_hash(text_col))
    if ts_col is not None:
        hashed = hashed.withWatermark(ts_col, watermark)
        hashed = hashed.dropDuplicatesWithinWatermark(["text_hash"])
    else:
        hashed = hashed.dropDuplicates(["text_hash"])
    if corpus_index is not None:
        corpus_hashes = corpus_index
    elif corpus is not None:
        if corpus_hash_col is not None:
            corpus_hashes = corpus.select(
                F.col(corpus_hash_col).alias("text_hash")
            ).distinct()
        else:
            corpus_hashes = corpus.select(
                _content_hash(text_col).alias("text_hash")
            ).distinct()
    else:
        raise ValueError("pass corpus or corpus_index")
    return hashed.join(corpus_hashes, "text_hash", "left_anti")


#: Marker file every persisted dedup signature index carries at its
#: root (round-10, closing the round-9 medium ADVICE): the MinHash
#: class-domain change shifted every persisted signature, and the
#: documented failure mode — a stale-formula index makes the vs-corpus
#: screen silently collapse to zero candidates, admitting every
#: near-dup as novel — had NO runtime guard. The marker records the
#: formula version plus every parameter that shifts persisted values
#: (shingle width, permutation count, det flavor, SRP bits/dim, span
#: width, id column type); seeds and sinks assert it at index read and
#: FAIL THE BATCH on mismatch or absence. The ``_`` prefix keeps it
#: invisible to parquet listing (the same hidden-file rule _SUCCESS
#: rides), and dynamic partition overwrite never touches root files,
#: so the marker survives every per-batch append, erasure rewrite and
#: re-seed.
SIG_MARKER_NAME = "_SIG_FORMAT"


def _canonical_id_type(id_type: str) -> str:
    """DDL type string → canonical simpleString (``long`` and
    ``bigint`` must compare equal)."""
    from pyspark.sql.types import _parse_datatype_string

    return _parse_datatype_string(id_type).simpleString()


def _minhash_sig_token(n: int, num_perm: int, det: bool, id_type: str) -> str:
    from ..functions.minhash import MINHASH_SIG_VERSION

    return (
        f"minhash/v{MINHASH_SIG_VERSION};n={int(n)};num_perm={int(num_perm)};"
        f"det={'true' if det else 'false'};id={_canonical_id_type(id_type)}"
    )


def _srp_sig_token(num_bits: int, dim: int, id_type: str) -> str:
    from ..functions.similarity import SRP_SIG_VERSION

    return (
        f"srp/v{SRP_SIG_VERSION};num_bits={int(num_bits)};dim={int(dim)};"
        f"id={_canonical_id_type(id_type)}"
    )


def _span_sig_token(span_words: int) -> str:
    from ..operators.dedup import SPAN_SIG_VERSION

    return f"spans/v{SPAN_SIG_VERSION};span_words={int(span_words)}"


def _batch_partitions(fs, root) -> list:
    """``(bid, Path)`` for every ``__batch_id=<int>`` child of ``root``
    — THE parser of the layout's one partition level, shared by the
    maintenance ops (`compact_dedup_index`,
    `rebuild_span_index_after_purge`) and `dedup_index_stats` so the
    naming scheme lives in one place (round-11 review: three hand-
    rolled copies had started to drift). A non-integer suffix (e.g.
    Hive's ``__HIVE_DEFAULT_PARTITION__`` null dir) is ignored rather
    than crashed on: the sinks only ever write integer batch ids, so
    anything else is foreign debris the readers partition-prune away."""
    out = []
    for st in fs.listStatus(root):
        name = str(st.getPath().getName())
        if not (st.isDirectory() and name.startswith("__batch_id=")):
            continue
        suffix = name.split("=", 1)[1]
        if suffix.lstrip("-").isdigit():
            out.append((int(suffix), st.getPath()))
    return out


def _sig_marker_path(index_dir: str) -> str:
    return index_dir.rstrip("/") + "/" + SIG_MARKER_NAME


def write_sig_format(spark, index_dir: str, token: str) -> None:
    fs_write_text(spark, _sig_marker_path(index_dir), token + "\n")


def check_sig_format(
    spark, index_dir: str, token: str, rebuild_with: str,
    claim_fresh: bool = True,
) -> None:
    """Assert a persisted signature index is usable by the CURRENT
    formula/parameters, or (sinks) claim it if it's verifiably fresh:

    - marker present and equal → pass;
    - marker present and DIFFERENT → raise (failing the seed or
      micro-batch — loud, at the read site — instead of letting a
      stale or misparameterized index silently screen nothing);
    - marker absent but the dir holds parquet data → raise: the index
      predates the format-versioned writers (or was written by other
      code) and its formula cannot be verified — exactly the
      pre-round-10 silent-admit hazard. This includes a seed that
      crashed between its data write and its marker write: recovery
      is delete-and-reseed, stated in the error;
    - marker absent and NO data files (nonexistent dir, or one holding
      only locks/_SUCCESS — e.g. mid `rebuild_span_index_after_purge`)
      → with ``claim_fresh`` (the SINK flavor) stamp the marker and
      proceed: a first batch's index is legitimately empty, and
      stamping BEFORE its first write keeps a crash-then-replay
      readable. The SEEDS pass ``claim_fresh=False`` and stamp AFTER
      their data write instead — a seed that crashes mid-write must
      read as loudly-unverifiable, never as a validly-empty index that
      silently screens nothing.

    Both seeds and sinks route through this, so re-seeding over a
    format-mismatched index also refuses (dynamic overwrite would
    replace only the ``-1`` partition, leaving stale streamed
    partitions mixed with fresh seed rows)."""
    found = fs_read_text(spark, _sig_marker_path(index_dir))
    if found is not None:
        if found.strip() != token:
            raise ValueError(
                f"{index_dir}: signature-format mismatch — index was "
                f"written as {found.strip()!r} but this reader computes "
                f"{token!r}. Signatures never mix formula versions or "
                f"parameters; delete the index dir and rebuild it with "
                f"{rebuild_with}."
            )
        return
    from ..fsio import fs_count_files

    if fs_count_files(spark, index_dir, suffix=".parquet") > 0:
        raise ValueError(
            f"{index_dir}: persisted signature index has no "
            f"{SIG_MARKER_NAME} marker — it predates the format-versioned "
            f"writers (or was written by other code), so its signature "
            f"formula cannot be verified, and screening against a "
            f"stale-formula index silently admits every near-dup as novel. "
            f"Delete the index dir and rebuild it with {rebuild_with} "
            f"(current format: {token!r})."
        )
    if claim_fresh:
        write_sig_format(spark, index_dir, token)


def _check_batch_id_type(
    batch_df: DataFrame, id_col: str, id_type: str, sink: str
) -> None:
    """Fail at the FIRST batch, at the misconfiguration site, when the
    stream's id column doesn't match the sink's ``id_type`` (round-9
    ADVICE: the explicit-schema index read otherwise fails — or
    miscasts — only at the SECOND batch, far from the cause)."""
    from pyspark.sql.types import _parse_datatype_string

    actual = batch_df.schema[id_col].dataType
    expected = _parse_datatype_string(id_type)
    if actual != expected:
        raise ValueError(
            f"{sink}: stream column {id_col!r} is "
            f"{actual.simpleString()}, but id_type={id_type!r} "
            f"({expected.simpleString()}) — the persisted-index read "
            f"schema would miscast or fail on a later batch; pass "
            f"id_type matching the stream schema."
        )


#: Exact-dedup signature-formula version for persisted exact-hash
#: indexes (`seed_exact_index` / `stream_dedup_exact_sink`): v1 =
#: sha256 over lower(trim(coalesce(text, ''))) — the `_content_hash`
#: null-as-empty rule shared with `stream_dedup_incremental` and the
#: batch `operators/dedup.dedup_incremental`. Bump on any change that
#: shifts persisted hash values.
EXACT_SIG_VERSION = 1


def _exact_sig_token(id_type: str) -> str:
    return f"exact/v{EXACT_SIG_VERSION};id={_canonical_id_type(id_type)}"


def seed_exact_index(
    corpus: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Bootstrap an exact-content hash index from an already-ingested
    corpus so an exact-dedup stream starts screening against it:
    per-doc ``(doc, text_hash)`` rows land in the reserved
    ``__batch_id = -1`` partition (stream batch ids start at 0, so the
    seed is always visible to `stream_dedup_exact_sink`'s
    own-batch-excluding read). Rows are DOC-keyed — unlike the bare
    hash set `corpus_hash_index` builds for the transformation-shaped
    `stream_dedup_incremental` — precisely so the index participates
    in the per-doc lifecycle the other families have:
    `delete_docs_from_dedup_index` (GDPR erasure) and
    `compact_dedup_index` apply unchanged."""
    token = _exact_sig_token(corpus.schema[id_col].dataType.simpleString())
    check_sig_format(
        corpus.sparkSession, index_dir, token, "seed_exact_index",
        claim_fresh=False,
    )
    (
        corpus.select(
            F.col(id_col).alias("doc"),
            _content_hash(text_col).alias("text_hash"),
        )
        .withColumn("__batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(index_dir)
    )
    write_sig_format(corpus.sparkSession, index_dir, token)


def stream_dedup_exact_sink(
    index_dir: str,
    audit_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    id_type: str = "long",
):
    """Streaming EXACT-content dedup with a SELF-MAINTAINING persisted
    index — the fourth family member (round 10), completing the
    symmetry: span, MinHash near-dup and SRP embedding near-dup each
    have a foreachBatch sink that screens against, and appends to, a
    ``__batch_id``-partitioned index; exact dedup previously had only
    the transformation shape (`stream_dedup_incremental`), which
    screens against a CALLER-managed static snapshot — correct for an
    in-flight query, but the caller owns index refresh, nothing
    records per-doc verdicts, and the retained corpus is implicit.
    This sink is the production ingest screen: each micro-batch's docs
    are screened against (a) earlier docs of the SAME batch (lowest
    ``id_col`` per content hash wins — the batch op
    `dedup_exact_text`'s deterministic rule) and (b) every doc
    RETAINED by prior batches via the persisted ``(doc, text_hash)``
    index. The per-doc audit
    ``(doc, n_corpus_matches, n_prior_batch_matches, kept)`` lands
    under ``audit_dir``; only KEPT docs join the index.

    Because the index is doc-keyed, the whole per-doc lifecycle
    applies unchanged: `delete_docs_from_dedup_index` erases a doc's
    hash row (exact re-uploads of erased content are subsequently
    ADMITTED — erasure really forgets, same contract and the same
    purge-source-first replay ordering), and `compact_dedup_index`
    folds committed batch partitions.

    Exactly-once under replay WITHOUT a ledger — the
    `stream_dedup_spans_sink` mechanism verbatim: both writes are
    ``__batch_id``-partitioned with dynamic overwrite and the index
    read EXCLUDES the running batch's own partition. Format marker:
    `EXACT_SIG_VERSION` + the id type, asserted per batch.

    Scale shape per batch: ONE hash pass map-side (32-byte keys — the
    document body never shuffles), one count aggregate on the hash for
    the within-batch rule, one hash-keyed join against the index; the
    index ships (doc, 32-byte hash) only. At 100 TB bucket the index
    parquet on ``text_hash`` for a co-located probe."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_batch_id_type(batch_df, id_col, id_type, "stream_dedup_exact_sink")
        if batch_df.isEmpty():
            # emptiness is deterministic from source offsets -> replay
            # skips identically (streaming_index_append's rule)
            return
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        schema = f"doc {id_type}, text_hash string, __batch_id int"
        token = _exact_sig_token(id_type)
        if fs.exists(hpath):
            # explicit existence gate + explicit schema + format marker
            # (the read_index_cells rule): a genuine read failure or a
            # stale-formula index must fail the micro-batch, not
            # silently admit every duplicate as novel
            check_sig_format(spark, index_dir, token, "seed_exact_index")
            idx = (
                spark.read.schema(schema)
                .parquet(index_dir)
                .filter(F.col("__batch_id") < int(batch_id))
                .drop("__batch_id")
            )
        else:  # first batch, nothing seeded — stamp the format marker
            # BEFORE the first index write (crash-then-replay reads a
            # marked, empty dir)
            write_sig_format(spark, index_dir, token)
            idx = spark.createDataFrame([], schema).drop("__batch_id")

        from pyspark.sql import Window as W

        hashed = batch_df.select(
            F.col(id_col).alias("doc"),
            _content_hash(text_col).alias("text_hash"),
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            # within-batch: lower-id-wins — a doc's prior-batch match
            # count is how many SAME-hash docs precede it in id order
            rn = F.row_number().over(
                W.partitionBy("text_hash").orderBy("doc")
            )
            within = hashed.withColumn(
                "n_prior_batch_matches", (rn - F.lit(1)).cast("long")
            )
            corpus_hits = (
                hashed.join(
                    idx.select(F.col("text_hash").alias("th")),
                    F.col("text_hash") == F.col("th"),
                )
                .groupBy("doc")
                .agg(F.count(F.lit(1)).alias("n_corpus_matches"))
            )
            audit = (
                within.join(corpus_hits, "doc", "left")
                .select(
                    "doc",
                    "text_hash",
                    F.coalesce("n_corpus_matches", F.lit(0))
                    .cast("long")
                    .alias("n_corpus_matches"),
                    "n_prior_batch_matches",
                )
                .withColumn(
                    "kept",
                    (F.col("n_corpus_matches") == 0)
                    & (F.col("n_prior_batch_matches") == 0),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                (
                    audit.drop("text_hash")
                    .withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(audit_dir)
                )
                (
                    audit.filter("kept")
                    .select("doc", "text_hash")
                    .withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(index_dir)
                )
            finally:
                audit.unpersist()
        finally:
            hashed.unpersist()

    return apply


def seed_span_index(
    corpus: DataFrame,
    index_dir: str,
    span_words: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """Bootstrap a span-hash index from an already-ingested corpus so a
    span-dedup stream starts excluding against it: every distinct span
    hash of the corpus lands in the reserved ``__batch_id = -1``
    partition (stream batch ids start at 0, so the seed is always
    visible to `stream_dedup_spans_sink`'s own-batch-excluding read)."""
    from ..operators.dedup import _span_rows

    token = _span_sig_token(span_words)
    check_sig_format(
        corpus.sparkSession, index_dir, token, "seed_span_index", claim_fresh=False
    )
    (
        _span_rows(corpus, int(span_words), id_col, text_col)
        .filter(F.col("span") != "")
        .select(F.sha2(F.col("span"), 256).alias("span_hash"))
        .distinct()
        .withColumn("__batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(index_dir)
    )
    write_sig_format(corpus.sparkSession, index_dir, token)


def _sig_index_schema(num_perm: int, id_type: str) -> str:
    """Explicit read schema for the persisted signature index — the
    read_index_cells rule: no schema inference over a dir that may hold
    only _SUCCESS (empty seed), no silent drift if a stray file lands."""
    sig_cols = ", ".join(f"sig_{i} long" for i in range(num_perm))
    return f"doc {id_type}, {sig_cols}, hs array<long>, __batch_id int"


def seed_minhash_index(
    corpus: DataFrame,
    index_dir: str,
    n: int = 3,
    num_perm: int = 32,
    id_col: str = "doc_id",
    text_col: str = "text",
    det: bool = False,
) -> None:
    """Bootstrap a MinHash signature index from an already-ingested
    corpus so a near-dup stream starts screening against it: per-doc
    signatures + hashed shingle sets land in the reserved
    ``__batch_id = -1`` partition (stream batch ids start at 0, so the
    seed is always visible to `stream_dedup_near_sink`'s
    own-batch-excluding read). Signatures are a pure per-doc function
    of the text, so seeded and streamed entries agree bit-for-bit with
    recomputation — the `minhash_incremental_pairs(corpus_sigs=...)`
    contract."""
    from ..functions.minhash import minhash_signatures

    token = _minhash_sig_token(
        n, num_perm, det, corpus.schema[id_col].dataType.simpleString()
    )
    check_sig_format(
        corpus.sparkSession, index_dir, token, "seed_minhash_index", claim_fresh=False
    )
    (
        minhash_signatures(corpus, n, num_perm, id_col, text_col, det)
        .withColumn("__batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(index_dir)
    )
    write_sig_format(corpus.sparkSession, index_dir, token)


def stream_dedup_near_sink(
    index_dir: str,
    audit_dir: str,
    n: int = 3,
    num_perm: int = 32,
    bands: int = 8,
    threshold: float = 0.2,
    id_col: str = "doc_id",
    text_col: str = "text",
    det: bool = False,
    id_type: str = "long",
    max_bucket: int | None = None,
):
    """Streaming NEAR-dup screening — the continuous-ingest twin of
    `functions/minhash.minhash_incremental_pairs`, as a ``foreachBatch``
    sink, completing the near-dup family's batch → incremental →
    streaming progression (exact dedup and span dedup already have all
    three shapes). Each micro-batch's docs are screened against (a)
    earlier docs of the SAME batch (lower ``id_col`` wins — the
    deterministic greedy rule; near-dup similarity is not transitive,
    so a doc is removed iff it pairs with ANY lower batch id or any
    index doc, the same min-id-canonical convention as the capped
    star/hub construction) and (b) every doc RETAINED by prior batches
    via the persisted signature index at ``index_dir``. The per-doc
    audit ``(id, n_corpus_matches, n_prior_batch_matches, kept)`` lands
    under ``audit_dir``.

    Only KEPT (novel) docs join the index — the index is the canonical
    deduplicated corpus, so near-dups of retained content never
    accumulate redundant signatures (the standard production ingest
    screen; documented nuance: a doc near two different retained docs
    is dropped against either, and gradual drift across a chain of
    batches can admit pairs a single global pass would remove — the
    family-wide incremental-vs-global trade, same as
    dedup_spans_incremental's).

    Exactly-once under replay WITHOUT a ledger — the
    stream_dedup_spans_sink mechanism verbatim: both writes are
    partitioned by ``__batch_id`` with dynamic overwrite, and the index
    read EXCLUDES the running batch's own partition
    (``__batch_id < batch_id``, partition-pruned), so a replayed batch
    sees exactly the index state its first attempt saw and overwrites
    exactly its own output partitions. ``hs`` set ORDER inside a row is
    collect_set-nondeterministic; every consumer (array_intersect
    verification) is order-independent, so replays are row-equal with
    possibly permuted ``hs`` — semantics identical.

    Scale shape per batch: batch signatures are ONE doc-keyed shuffle
    computed once and shared by the self-join and the corpus screen;
    the index ships (doc, 32 longs, hashed shingle set) — never
    document bodies (the ``hs`` arrays are the exact-verification
    storage cost; at 100 TB bucket the index on a band key for
    co-located probes, and pass ``max_bucket`` to bound hot corpus
    buckets — the `minhash_incremental_pairs` dial, plumbed through)."""
    from ..functions.minhash import (
        _incremental_pairs_from_sigs,
        minhash_lsh_pairs,
        minhash_signatures,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_batch_id_type(batch_df, id_col, id_type, "stream_dedup_near_sink")
        if batch_df.isEmpty():
            # emptiness is deterministic from source offsets → replay
            # skips identically (streaming_index_append's rule)
            return
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        schema = _sig_index_schema(num_perm, id_type)
        token = _minhash_sig_token(n, num_perm, det, id_type)
        if fs.exists(hpath):
            # explicit existence gate + explicit schema (the
            # read_index_cells rule): a genuine read failure must fail
            # the micro-batch, not silently screen against an EMPTY
            # index and admit every near-dup as novel — and the format
            # marker must match, or the screen is vs stale signatures
            check_sig_format(spark, index_dir, token, "seed_minhash_index")
            idx = (
                spark.read.schema(schema)
                .parquet(index_dir)
                .filter(F.col("__batch_id") < int(batch_id))
                .drop("__batch_id")
            )
        else:  # first batch, nothing seeded — stamp the format marker
            # BEFORE the first index write so a crash between them
            # leaves a marked (empty) dir the replay reads cleanly
            write_sig_format(spark, index_dir, token)
            idx = spark.createDataFrame([], schema).drop("__batch_id")

        sigs = minhash_signatures(
            batch_df, n, num_perm, id_col, text_col, det
        ).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            vs_corpus = _incremental_pairs_from_sigs(
                sigs, idx, num_perm, bands, threshold, det, max_bucket
            )
            within = minhash_lsh_pairs(
                batch_df, n, num_perm, bands, threshold,
                det=det, max_bucket=max_bucket, sigs=sigs,
            )
            corpus_hits = vs_corpus.groupBy("b").agg(
                F.count(F.lit(1)).alias("n_corpus_matches")
            )
            # self-join pairs come oriented a < b: doc b has a lower-id
            # partner a, so b is the drop side under the greedy rule
            batch_hits = within.groupBy("b").agg(
                F.count(F.lit(1)).alias("n_prior_batch_matches")
            )
            audit = (
                sigs.select(F.col("doc"))
                .join(corpus_hits, F.col("doc") == corpus_hits["b"], "left")
                .drop("b")
                .join(batch_hits, F.col("doc") == batch_hits["b"], "left")
                .drop("b")
                .select(
                    "doc",
                    F.coalesce("n_corpus_matches", F.lit(0))
                    .cast("long")
                    .alias("n_corpus_matches"),
                    F.coalesce("n_prior_batch_matches", F.lit(0))
                    .cast("long")
                    .alias("n_prior_batch_matches"),
                )
                .withColumn(
                    "kept",
                    (F.col("n_corpus_matches") == 0)
                    & (F.col("n_prior_batch_matches") == 0),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                (
                    audit.withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(audit_dir)
                )
                (
                    sigs.join(
                        audit.filter("kept").select("doc"), "doc", "left_semi"
                    )
                    .withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(index_dir)
                )
            finally:
                audit.unpersist()
        finally:
            sigs.unpersist()

    return apply


def stream_dedup_spans_sink(
    index_dir: str,
    audit_dir: str,
    span_words: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
):
    """Streaming SPAN-level dedup — the continuous-ingest twin of
    ``operators/dedup.dedup_spans_incremental``, as a ``foreachBatch``
    sink: each micro-batch's spans are deduped against (a) the batch
    itself (lowest (doc, position) wins — the batch op's deterministic
    rule, which streaming ``dropDuplicates`` on span rows could not
    give) and (b) every span seen by PRIOR batches via the persisted
    span-hash index at ``index_dir``; the per-doc audit
    ``(id, n_spans, n_spans_removed, rebuilt_sha)`` lands under
    ``audit_dir``.

    Exactly-once under replay WITHOUT a ledger: both writes are
    partitioned by ``__batch_id`` with dynamic overwrite (the
    `upsert_foreach_batch` trick), and the index read EXCLUDES the
    running batch's own partition (``__batch_id < batch_id`` — a
    partition-pruned filter). A replayed batch therefore sees exactly
    the index state its first attempt saw and overwrites exactly its
    own output partitions — bit-identical rerun, no double-exclusion
    of its own spans and no duplicate hashes.

    The index stays minimal by construction: kept spans are precisely
    the hashes the index lacks, so appending them maintains
    index == {every span hash ever seen}, one row per hash. Seed it
    from an existing corpus with `seed_span_index`. Scale shape per
    batch: the batch's span rows shuffle once by 32-byte hash; the
    index side ships hashes only (at 100 TB, bucket the index on
    span_hash for a co-located anti-join).
    """
    from ..operators.dedup import (
        _base_words,
        _kept_spans_incremental,
        _span_audit,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if batch_df.isEmpty():
            # nothing to audit, nothing to record — and emptiness is a
            # deterministic function of the source offsets, so a
            # replay of this batch skips identically (same rule as
            # streaming_index_append's empty-batch skip)
            return
        # EXPLICIT existence gate + EXPLICIT schema, not a blanket
        # try/except: the repo rule from read_index_cells — swallowing
        # a genuine read failure (corrupt parquet, permissions,
        # transient FS error) here would silently dedup against an
        # EMPTY index, admitting every duplicate span in the batch as
        # novel; a real error must fail the micro-batch so the stream
        # retries it. The fixed schema also keeps an index dir holding
        # only _SUCCESS (an empty seed corpus) readable — schema
        # inference would die on it.
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = hpath.getFileSystem(
            spark.sparkContext._jsc.hadoopConfiguration()
        )
        token = _span_sig_token(span_words)
        if fs.exists(hpath):
            # the own-batch exclusion ALSO makes cache-eviction
            # recomputes safe: if `kept` is recomputed after this
            # batch's index partition landed, the re-read still
            # excludes it — the lineage sees the same index state as
            # the first evaluation. Format marker asserted first: a
            # span_words-mismatched index admits every duplicate span.
            check_sig_format(spark, index_dir, token, "seed_span_index")
            idx = spark.read.schema(
                "span_hash string, __batch_id int"
            ).parquet(index_dir).filter(
                F.col("__batch_id") < int(batch_id)
            )
        else:  # first batch, nothing seeded — stamp the format marker
            # BEFORE the first index write (crash-safe: replay reads a
            # marked, empty dir), screen vs an empty index
            write_sig_format(spark, index_dir, token)
            idx = spark.createDataFrame([], "span_hash string")
        kept = _kept_spans_incremental(
            batch_df, idx, span_words, id_col, text_col,
            corpus_span_hash_col="span_hash",
        )
        kept = kept.persist(StorageLevel.MEMORY_AND_DISK)
        try:
            audit = _span_audit(
                _base_words(batch_df, id_col, text_col),
                kept.select(id_col, "idx"),
                id_col,
                int(span_words),
            )
            (
                audit.withColumn("__batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_id")
                .parquet(audit_dir)
            )
            (
                kept.select(F.col("__h").alias("span_hash"))
                .withColumn("__batch_id", F.lit(int(batch_id)))
                .write.mode("overwrite")
                .option("partitionOverwriteMode", "dynamic")
                .partitionBy("__batch_id")
                .parquet(index_dir)
            )
        finally:
            kept.unpersist()

    return apply


def rebuild_span_index_after_purge(
    spark,
    lake_dir: str,
    index_dir: str,
    span_words: int = 16,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> None:
    """The executable form of the span-index erasure story (round-9
    verdict #5): `delete_docs_from_dedup_index` deliberately excludes
    the span-hash index — its rows are bare one-way content hashes not
    keyed to any document, so per-doc erasure is ill-posed there and
    the documented recovery is a REBUILD over the purged corpus. This
    is that recovery as one call: after
    `operators.maintenance.delete_keys_from_lake` has purged the lake,
    rebuild the span index from what survives. Spans unique to purged
    docs vanish; spans shared with surviving docs remain (their
    hashes are still derivable from retained content — nothing about
    the erased docs is recoverable from them).

    Lock discipline matches the erasure path: the index dir's
    single-writer lock is held across the delete-and-reseed window
    (`_lake_write_lock` — the same lease `delete_keys_from_lake` takes
    on the lake root), so no concurrent seeder/eraser interleaves. A
    plain re-seed is NOT enough: `seed_span_index`'s dynamic overwrite
    replaces only the ``-1`` partition, leaving streamed partitions
    (``__batch_id >= 0``) still holding the purged docs' hashes — the
    whole dir is deleted first, collapsing the rebuilt index into the
    seed partition. STOP any running span-dedup stream first (the
    foreachBatch sink does not take this lock; its next batch then
    resumes against the rebuilt index, which the own-batch-excluding
    read handles — ``-1`` precedes every batch id). That convention is
    fail-fast-backed (round-10 ADVICE): after the re-seed, the window
    re-lists the partition level, and any ``__batch_id >= 0`` partition
    — impossible unless a live sink wrote DURING the rebuild, since the
    window starts by deleting everything — raises loudly. Best effort
    (a batch can still land after the check), but the common misuse is
    a running stream throughout, which this catches; recovery is
    stated in the error: stop the stream, re-run the rebuild."""
    from ..fsio import _fs_path
    from ..operators.maintenance import _lake_write_lock

    with _lake_write_lock(index_dir, spark):
        corpus = spark.read.parquet(lake_dir)
        # delete the index CONTENTS, not the dir: both lock flavors
        # (.write_lock flock / .write_lock.cas lease) live INSIDE the
        # locked dir — a recursive dir delete would destroy the very
        # lock this window holds, letting a contender acquire mid-rebuild
        fs, p, _jvm = _fs_path(spark, index_dir)
        if fs.exists(p):
            for st in fs.listStatus(p):
                if str(st.getPath().getName()).startswith(".write_lock"):
                    continue
                fs.delete(st.getPath(), True)
        seed_span_index(corpus, index_dir, span_words, id_col, text_col)
        streamed = sorted(
            bid for bid, _path in _batch_partitions(fs, p) if bid >= 0
        )
        if streamed:
            raise RuntimeError(
                f"{index_dir}: streamed partitions __batch_id="
                f"{streamed} appeared DURING the rebuild window — a "
                f"span-dedup stream is still running (its foreachBatch "
                f"sink takes no lock), and its batches screened "
                f"against a partially-rebuilt index. Stop the stream "
                f"and re-run rebuild_span_index_after_purge; the "
                f"rebuild is idempotent over the purged lake."
            )


def seed_srp_index(
    corpus: DataFrame,
    index_dir: str,
    num_bits: int = 16,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    impl: str = "arrow",
) -> None:
    """Bootstrap an SRP signature index from an already-ingested vector
    corpus so an embedding near-dup stream starts screening against it:
    `similarity.srp_corpus_index` rows ``(vid, sig, vec)`` land in the
    reserved ``__batch_id = -1`` partition (stream batch ids start at
    0, so the seed is always visible to `stream_embed_near_sink`'s
    own-batch-excluding read). SRP signatures are a pure per-row
    function of the vector (deterministic ±1 planes, integer sums), so
    seeded and streamed entries agree bit-for-bit with recomputation —
    the `srp_incremental_pairs(corpus_index=...)` contract."""
    from ..functions.similarity import srp_corpus_index

    token = _srp_sig_token(
        num_bits, dim, corpus.schema[id_col].dataType.simpleString()
    )
    check_sig_format(
        corpus.sparkSession, index_dir, token, "seed_srp_index", claim_fresh=False
    )
    (
        srp_corpus_index(corpus, num_bits, dim, id_col, vec_col, impl)
        .withColumn("__batch_id", F.lit(-1))
        .write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("__batch_id")
        .parquet(index_dir)
    )
    write_sig_format(corpus.sparkSession, index_dir, token)


def stream_embed_near_sink(
    index_dir: str,
    audit_dir: str,
    num_bits: int = 16,
    bands: int = 8,
    threshold: float = 0.4,
    dim: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    bucket_cap: int | None = None,
    impl: str = "arrow",
    id_type: str = "long",
):
    """Streaming EMBEDDING near-dup screening — the continuous-ingest
    twin of `similarity.srp_incremental_pairs`, as a ``foreachBatch``
    sink, completing the embedding near-dup family's batch →
    incremental → streaming progression (the text family has all three
    via `stream_dedup_near_sink`; round 9 closes the embedding side).
    Each micro-batch's vectors are screened against (a) earlier
    vectors of the SAME batch (lower ``id_col`` wins — the greedy
    min-id-canonical rule shared family-wide) and (b) every vector
    RETAINED by prior batches via the persisted SRP index at
    ``index_dir`` (`srp_corpus_index` rows — band keys are substrings
    of the stored bit string, verification reads the stored vector, so
    the corpus is never re-read or re-signed per batch). The per-doc
    audit ``(vid, n_corpus_matches, n_prior_batch_matches, kept)``
    lands under ``audit_dir``; only KEPT vectors join the index (the
    canonical-corpus semantics, with the same documented chain-drift
    nuance as the text sink).

    Vectors with no quantized direction are EXCLUDED from screening
    and from the index at the entry point (every cosine entry point's
    rule) — they appear in the audit as kept with zero matches, so no
    streamed row silently vanishes from the accounting.

    Exactly-once under replay WITHOUT a ledger — the
    `stream_dedup_spans_sink` mechanism verbatim: both writes are
    partitioned by ``__batch_id`` with dynamic overwrite, and the
    index read EXCLUDES the running batch's own partition
    (``__batch_id < batch_id``, partition-pruned), so a replayed batch
    sees exactly the index state its first attempt saw and overwrites
    exactly its own output partitions.

    Scale shape per batch: the batch signature pass is row-local (one
    Arrow matmul per batch by default); candidates are batch-bands ×
    index-bands equi-joins — never an index self-join; the index ships
    (vid, num_bits-char sig, float64 vec). ``bucket_cap`` bounds hot
    index buckets (the `srp_incremental_pairs` dial, plumbed through);
    at 100 TB bucket the index parquet on a band key for co-located
    probes."""
    from ..functions.similarity import (
        has_quant_direction,
        srp_corpus_index,
        srp_incremental_pairs,
    )

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        _check_batch_id_type(batch_df, id_col, id_type, "stream_embed_near_sink")
        if batch_df.isEmpty():
            # emptiness is deterministic from source offsets → replay
            # skips identically (streaming_index_append's rule)
            return
        jvm = spark.sparkContext._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(index_dir)
        fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
        schema = f"vid {id_type}, sig string, vec array<double>, __batch_id int"
        token = _srp_sig_token(num_bits, dim, id_type)
        if fs.exists(hpath):
            # explicit existence gate + explicit schema (the
            # read_index_cells rule): a genuine read failure must fail
            # the micro-batch, not silently admit every near-dup —
            # and the format marker must match (stale SRP planes/bits
            # screen nothing)
            check_sig_format(spark, index_dir, token, "seed_srp_index")
            idx = (
                spark.read.schema(schema)
                .parquet(index_dir)
                .filter(F.col("__batch_id") < int(batch_id))
                .drop("__batch_id")
            )
        else:  # first batch, nothing seeded — stamp the format marker
            # BEFORE the first index write (crash-safe: replay reads a
            # marked, empty dir)
            write_sig_format(spark, index_dir, token)
            idx = spark.createDataFrame([], schema).drop("__batch_id")

        # one row-local signature pass per batch, shared by the
        # self-screen, the corpus screen and the index append
        bidx = srp_corpus_index(
            batch_df, num_bits, dim, id_col, vec_col, impl
        ).persist(StorageLevel.MEMORY_AND_DISK)
        kw = dict(
            num_bits=num_bits, bands=bands, threshold=threshold,
            id_col=id_col, vec_col=vec_col, dim=dim,
            bucket_cap=bucket_cap, impl=impl,
        )
        try:
            # both screens ride the ONE persisted batch index frame
            # (batch_index=bidx): band rows are substrings of its stored
            # sigs and verification reads its stored vectors, so the
            # row-local signature pass really is paid once per batch —
            # passing batch_df here instead would re-sign and re-scan it
            # per screen (3x the dominant per-batch cost, the round-9
            # review finding)
            vs_corpus = srp_incremental_pairs(
                None, corpus_index=idx, batch_index=bidx, **kw
            )
            # within-batch: the batch screened against its OWN index
            # rows, oriented a < b so b is the drop side (the greedy
            # lower-id-wins rule); a == b self-pairs fall out of the
            # strict inequality
            within = srp_incremental_pairs(
                None, corpus_index=bidx, batch_index=bidx, **kw
            ).filter(F.col("a") < F.col("b"))
            corpus_hits = vs_corpus.groupBy("b").agg(
                F.count(F.lit(1)).alias("n_corpus_matches")
            )
            batch_hits = within.groupBy("b").agg(
                F.count(F.lit(1)).alias("n_prior_batch_matches")
            )
            audit = (
                batch_df.select(F.col(id_col).alias("vid"))
                .join(corpus_hits, F.col("vid") == corpus_hits["b"], "left")
                .drop("b")
                .join(batch_hits, F.col("vid") == batch_hits["b"], "left")
                .drop("b")
                .select(
                    "vid",
                    F.coalesce("n_corpus_matches", F.lit(0))
                    .cast("long")
                    .alias("n_corpus_matches"),
                    F.coalesce("n_prior_batch_matches", F.lit(0))
                    .cast("long")
                    .alias("n_prior_batch_matches"),
                )
                .withColumn(
                    "kept",
                    (F.col("n_corpus_matches") == 0)
                    & (F.col("n_prior_batch_matches") == 0),
                )
                .persist(StorageLevel.MEMORY_AND_DISK)
            )
            try:
                (
                    audit.withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(audit_dir)
                )
                (
                    bidx.join(
                        audit.filter("kept").select("vid"), "vid", "left_semi"
                    )
                    .withColumn("__batch_id", F.lit(int(batch_id)))
                    .write.mode("overwrite")
                    .option("partitionOverwriteMode", "dynamic")
                    .partitionBy("__batch_id")
                    .parquet(index_dir)
                )
            finally:
                audit.unpersist()
        finally:
            bidx.unpersist()

    return apply


def delete_docs_from_dedup_index(
    spark,
    index_dir: str,
    ids,
    id_col: str = "doc",
) -> int:
    """GDPR-targeted erasure from a PER-DOC dedup signature index — the
    round-9 completion of the erasure story (the lake has
    `delete_keys_from_lake`, the ANN indexes have
    `ivf_index_delete`/`ivfpq_index_delete`; the dedup corpus indexes
    were the remaining surface). Applies to any ``__batch_id``-
    partitioned index whose rows are keyed by a document id: the
    MinHash signature index (`seed_minhash_index` /
    `stream_dedup_near_sink`, ``doc``) and the SRP index
    (`seed_srp_index` / `stream_embed_near_sink`, ``vid`` — pass
    ``id_col="vid"``). Audit directories are the same shape (``doc`` /
    ``vid`` keyed, ``__batch_id``-partitioned), so a full erasure
    calls this once per directory.

    Semantics: signature rows are a pure per-doc function of the
    content, so deleting a doc's row IS the rebuild-over-purged-corpus
    index (bit-identical rows — test-pinned), and content near-duping
    the erased doc is subsequently ADMITTED as novel unless it also
    matches other retained docs — erasure really forgets. Partition-
    scoped rewrite, single-writer locked, idempotent re-run: all
    inherited from `delete_keys_from_lake` (including its per-scheme
    crash-atomicity caveat — read it for object-store lakes).

    ORDERING vs the sinks' replay semantics (round-9 review): the
    sinks are exactly-once BY REPLAY — a re-delivered batch rewrites
    its own ``__batch_id`` partition from SOURCE data. An index
    erasure alone can therefore be silently undone: if batch 7 kept
    doc X, the stream crashes pre-checkpoint, X is erased here, and
    batch 7 replays from an unpurged source, the dynamic overwrite
    rewrites partition 7 WITH X's signature resurrected. The erasure
    contract is PURGE THE SOURCE FIRST (the feed/lake the stream
    reads — `operators.maintenance.delete_keys_from_lake`), then this
    index (and the audit dir): a replay then recomputes from the
    purged source and cannot resurrect the row — test-pinned in both
    directions (purged-source replay stays erased; unpurged-source
    replay demonstrates the resurrection this paragraph exists to
    warn about). After any replay that may have raced an erasure,
    re-run the erasure — it is idempotent.

    The SPAN-hash index (`seed_span_index` / `stream_dedup_spans_sink`)
    is deliberately NOT covered: its rows are bare one-way content
    hashes of 16-word spans, not keyed to any document (a hash is
    shared by every doc that ever contained the span, and nothing maps
    it back), so per-doc erasure is ill-posed there — the honest
    operation for a span-index purge is a rebuild over the purged
    corpus (`seed_span_index` on the post-erasure lake), and the
    index's one-way-hash construction is itself the minimization
    argument. Stated here rather than papered over.

    Returns the number of affected ``__batch_id`` partitions."""
    from ..operators.maintenance import delete_keys_from_lake

    return delete_keys_from_lake(
        spark, index_dir, id_col, ids, ["__batch_id"]
    )


def compact_dedup_index(
    spark,
    index_dir: str,
    through_batch: int,
) -> int:
    """Fold the streamed partitions of a dedup signature index into its
    seed partition — the small-files lifecycle the ``__batch_id``
    layout otherwise lacks (round 10): every micro-batch appends one
    partition, so a long-running ingest stream turns the index into
    thousands of tiny directories, and at 100 TB the per-batch index
    scan pays file-listing + open overhead proportional to STREAM AGE
    instead of index size. This folds every partition with
    ``-1 <= __batch_id <= through_batch`` into a single rewritten
    ``__batch_id = -1`` partition and drops the folded originals.
    Applies to the INDEX shapes (exact ``(doc, text_hash)``, MinHash
    ``doc``-keyed, SRP ``vid``-keyed, span-hash) — their rows are
    unique by construction (only novel docs join; a re-delivered
    duplicate matches the corpus and never re-inserts), so the
    crash-heal ``dropDuplicates`` in the fold only ever removes
    crash copies. Do NOT point it at the AUDIT dirs (round-10 review):
    audit rows are per-batch EVENTS, and identical verdict rows from
    different batches (the same doc re-streamed and re-screened) are
    legitimate history that the fold's dedup would merge — for audit
    small-files use `operators.maintenance.compact_parquet_dir`, the
    row-preserving rewrite.

    Read-equivalence: the sinks' own-batch-excluding read is
    ``__batch_id < current_batch``, and every folded row moves to
    ``-1``, which precedes every real batch id — so any FUTURE batch
    sees exactly the same row set before and after compaction
    (test-pinned: verdicts of a post-compaction batch equal a
    never-compacted twin's).

    ORDERING vs replay (the erasure contract's sibling, stated the
    same way): only compact batches the stream's CHECKPOINT has
    committed. A replay of batch ``b <= through_batch`` after
    compaction sees its own first attempt's rows in the folded ``-1``
    partition (``-1 < b``), screens the replayed docs against
    THEMSELVES, and rewrites partition ``b`` with everything marked
    duplicate — replay bit-identity breaks (test-pinned as the hazard
    twin). Spark's checkpoint never replays below the committed
    offset, so "committed through" is an available, safe watermark.

    Crash shape (staged — the fold never reads and overwrites the same
    files in one job): (1) the fold window is written to an
    underscore-prefixed staging dir under the index root (invisible to
    parquet listing, like ``_SIG_FORMAT``); (2) the staging is read
    back and dynamic-overwrites the ``-1`` partition; (3) the folded
    originals are deleted; (4) the staging is deleted. A crash after
    (2) leaves rows duplicated across ``-1`` and their original
    partitions — which the sinks tolerate (candidate counts inflate;
    ``kept`` verdicts are >=1 threshold tests and anti-joins, so no
    verdict flips) — and a RE-RUN converges: the fold reads through a
    ``dropDuplicates()``, so re-folding de-duplicates, and the deletes
    are idempotent. Single-writer locked for the whole window (the
    erasure's `_lake_write_lock` on the index dir); the ``_SIG_FORMAT``
    marker is a root file and is never touched. STOP the stream first,
    same as `rebuild_span_index_after_purge` — and (round-10 ADVICE)
    that convention is now backed by a fail-fast: snapshotted at entry
    and re-checked after the staging write are BOTH the ``__batch_id``
    partition-id set (a sink batch landing or vanishing, any id) AND a
    per-file ``(name, size)`` fingerprint of the FOLD-WINDOW
    partitions (a replay dynamic-REWRITING a partition being folded
    writes new part files — round-11 review: the id set alone missed
    exactly that case); any change aborts BEFORE the reader-visible
    index is touched — staging deleted, RuntimeError raised, index
    bit-untouched. A rewrite of a partition ABOVE the fold window is
    deliberately not fingerprinted: the fold doesn't touch it, and a
    replayed batch ``b > through_batch`` sees folded ``-1`` + the same
    sub-``b`` row set as before compaction, so its verdicts are
    unchanged. Best effort by nature (a batch can still land between
    the check and the commit — the foreachBatch sinks take no lock),
    but it converts the common stream-still-running misuse from
    silent divergence into a loud abort. Also refused up front: an
    index holding parquet data
    but no ``_SIG_FORMAT`` marker (pre-marker or foreign-written — the
    same unverifiable state `check_sig_format` refuses; folding it
    would launder unverifiable rows into the seed partition that later
    reads still refuse anyway).

    Returns the number of partitions folded away (0 = nothing to do).
    """
    from ..fsio import _fs_path, fs_count_files
    from ..operators.maintenance import _lake_write_lock

    with _lake_write_lock(index_dir, spark):
        fs, root, jvm = _fs_path(spark, index_dir)
        if not fs.exists(root):
            return 0
        if fs_read_text(spark, _sig_marker_path(index_dir)) is None and \
                fs_count_files(spark, index_dir, suffix=".parquet") > 0:
            raise ValueError(
                f"{index_dir}: refusing to compact — the index holds "
                f"parquet data but no {SIG_MARKER_NAME} marker, so its "
                f"signature formula cannot be verified (pre-marker or "
                f"foreign-written; the sinks' check_sig_format refuses "
                f"the same state at read time). Delete and rebuild the "
                f"index with its seed function instead of compacting it."
            )
        staging = index_dir.rstrip("/") + "/_compact_staging"
        staging_p = jvm.org.apache.hadoop.fs.Path(staging)
        # a crash after step (3) (originals deleted) but before (4)
        # leaves stale staging that the not-folded early exit below
        # would otherwise never reclaim (round-10 ADVICE) — clear it
        # first; it is always re-derivable from the live partitions
        if fs.exists(staging_p):
            fs.delete(staging_p, True)

        def fold_fingerprint(parts) -> dict:
            # bid -> frozenset of (part-file name, length) for the
            # partitions being folded: a dynamic-overwrite replay
            # writes NEW part files, so a rewrite changes this even
            # when the partition-id set does not
            return {
                bid: frozenset(
                    (str(f.getPath().getName()), int(f.getLen()))
                    for f in fs.listStatus(path)
                    if not str(f.getPath().getName()).startswith((".", "_"))
                )
                for bid, path in parts
                if 0 <= bid <= int(through_batch)
            }

        entry_parts = _batch_partitions(fs, root)
        entry_bids = {bid for bid, _p in entry_parts}
        entry_fp = fold_fingerprint(entry_parts)
        folded = [
            (bid, path)
            for bid, path in entry_parts
            if 0 <= bid <= int(through_batch)
        ]
        if not folded:
            return 0
        # one partition-pruned read of the fold window into staging;
        # dropDuplicates makes a crashed previous fold converge
        # instead of doubling rows
        (
            spark.read.parquet(index_dir)
            .filter(F.col("__batch_id") <= int(through_batch))
            .drop("__batch_id")
            .dropDuplicates()
            .write.mode("overwrite")
            .parquet(staging)
        )
        # fail-fast on the stop-the-stream-first contract: the staging
        # read is the window where a live stream's write (a new batch,
        # or a replay rewriting a fold-window partition) can diverge
        # from what the fold captured — abort pre-commit, index
        # untouched
        cur_parts = _batch_partitions(fs, root)
        cur_bids = {bid for bid, _p in cur_parts}
        cur_fp = fold_fingerprint(cur_parts)
        if cur_bids != entry_bids or cur_fp != entry_fp:
            fs.delete(staging_p, True)
            raise RuntimeError(
                f"{index_dir}: __batch_id partitions changed while "
                f"compacting (ids {sorted(entry_bids)} -> "
                f"{sorted(cur_bids)}; fold-window files "
                f"{'unchanged' if cur_fp == entry_fp else 'REWRITTEN'}) "
                f"— a stream is still writing this index. "
                f"compact_dedup_index requires the stream stopped (its "
                f"foreachBatch sink takes no lock); the index is "
                f"untouched — stop the stream and re-run."
            )
        (
            spark.read.parquet(staging)
            .withColumn("__batch_id", F.lit(-1))
            .write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("__batch_id")
            .parquet(index_dir)
        )
        for _bid, path in folded:
            fs.delete(path, True)
        fs.delete(staging_p, True)
        return len(folded)


def compact_dedup_index_committed(
    spark,
    index_dir: str,
    checkpoint_dir: str,
) -> int:
    """`compact_dedup_index` with the watermark taken from the place
    the ordering contract demands: the stream's OWN checkpoint
    (``sinks.stream_committed_watermark`` — max id in the checkpoint's
    ``commits/`` log, which Spark never replays below). This closes
    the gap `dedup_index_stats` documents: its ``max_batch_id`` is an
    FS observation that may include a written-but-uncommitted batch
    whose replay after folding triggers the self-screen divergence
    `test_compact_dedup_index_replay_hazard` pins; the commit log
    cannot. Pass the SAME ``checkpointLocation`` the sink's query
    uses. No-op (0) when nothing has committed yet.

    Still run it with the stream stopped: the committed watermark
    makes the fold REPLAY-safe, but a concurrently running batch can
    race the listing/rewrite itself — the partition-set fail-fast in
    `compact_dedup_index` aborts loudly if that happens."""
    from .sinks import stream_committed_watermark

    committed = stream_committed_watermark(spark, checkpoint_dir)
    if committed is None:
        return 0
    return compact_dedup_index(spark, index_dir, through_batch=committed)


def dedup_index_stats(spark, index_dir: str) -> dict:
    """FS-level health report for a ``__batch_id``-partitioned dedup
    index — the inputs to the lifecycle decisions this module's ops
    act on (round 10): WHEN to `compact_dedup_index` (partition and
    file counts are the stream-age cost), what format the index is
    (the ``_SIG_FORMAT`` token, or None for a pre-marker/foreign dir —
    the state `check_sig_format` would refuse), and the batch-id
    extent (``-1`` in ``min_batch_id`` means a seed is present).

    ``max_batch_id`` is an FS OBSERVATION, not checkpoint commitment
    (round-10 review): a stream stopped between its foreachBatch write
    and its checkpoint commit leaves a partition whose batch WILL
    replay on restart — compacting through it triggers exactly the
    self-screen divergence `test_compact_dedup_index_replay_hazard`
    pins. The compaction watermark must come from the stream's own
    CHECKPOINT — `sinks.stream_committed_watermark` reads it, and
    `compact_dedup_index_committed` wires the two together; use this
    value only as the upper bound / diagnostic it is.

    The report sees the index the way READERS do: ``_``/``.``-prefixed
    names are skipped (the parquet hidden-file rule), so committer
    debris (``_temporary``, ``.spark-staging-*``) and lock/marker files
    never inflate partitions, files or bytes — a crashed write cannot
    make the extent claim batches that never committed. Deliberately
    FS-only — no data scan, no row counts: at 100 TB the health check
    must cost a listing, not a job. Partition ids are read from ROOT
    children only (the layout's one partition level). Returns::

        {exists, format, n_partitions, min_batch_id, max_batch_id,
         n_files, bytes}

    with None extents for an empty/partition-less dir."""
    from ..fsio import _fs_path

    fs, root, _jvm = _fs_path(spark, index_dir)
    if not fs.exists(root):
        return {"exists": False, "format": None, "n_partitions": 0,
                "min_batch_id": None, "max_batch_id": None,
                "n_files": 0, "bytes": 0}
    def hidden(name: str) -> bool:
        # Spark's listing rule (shouldFilterOutPathName), replicated so
        # the report counts exactly what a reader would scan: '.'-
        # prefixed names are hidden UNCONDITIONALLY; the '=' carve-out
        # (partition dirs like __batch_id=0 must survive) applies only
        # to the '_' prefix (round-10 ADVICE — a '.x=y' entry is
        # reader-invisible and must not count here either)
        return name.startswith(".") or (
            name.startswith("_") and "=" not in name
        )

    bids = [bid for bid, _path in _batch_partitions(fs, root)]
    n_files = 0
    n_bytes = 0
    for st in fs.listStatus(root):
        name = str(st.getPath().getName())
        if hidden(name):
            continue  # debris (_temporary, .spark-staging-*), locks, marker
        if st.isDirectory():
            stack = [st.getPath()]
            while stack:
                for sub in fs.listStatus(stack.pop()):
                    if hidden(str(sub.getPath().getName())):
                        continue
                    if sub.isDirectory():
                        stack.append(sub.getPath())
                    else:
                        n_files += 1
                        n_bytes += int(sub.getLen())
        else:
            n_files += 1
            n_bytes += int(st.getLen())
    token = fs_read_text(spark, _sig_marker_path(index_dir))
    return {
        "exists": True,
        "format": token.strip() if token is not None else None,
        "n_partitions": len(bids),
        "min_batch_id": min(bids) if bids else None,
        "max_batch_id": max(bids) if bids else None,
        "n_files": n_files,
        "bytes": n_bytes,
    }
