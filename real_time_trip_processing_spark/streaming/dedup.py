"""Streaming incremental dedup — the continuous-ingest twin of
``operators/dedup.dedup_incremental``: a document stream is cleaned
against the already-ingested corpus while it arrives, instead of in a
nightly batch.

Scale shape mirrors the batch op: hashes are computed map-side in the
stream (32-byte state keys, never document bodies); the corpus side is
a static hash index (at 100 TB: the persisted, bucketed index of prior
ingests, refreshed per ingest cycle); the stream-static anti-join
probes it without shuffling the stream.
"""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import DataFrame, functions as F


def _content_hash(text_col: str):
    # coalesce NULL text to '' — same null-as-empty-content rule as the
    # batch dedup_incremental, so within-stream dedup state and the
    # corpus anti-join answer content equality consistently
    return F.sha2(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), 256)


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
