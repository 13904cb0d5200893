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

from pyspark.sql import DataFrame, functions as F


def stream_dedup_incremental(
    stream: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ts_col: str | None = None,
    watermark: str = "1 hour",
    corpus_hash_col: str | None = None,
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
    """
    # coalesce NULL text to '' — same null-as-empty-content rule as the
    # batch dedup_incremental, so within-stream dedup state and the
    # corpus anti-join answer content equality consistently
    hashed = stream.withColumn(
        "text_hash",
        F.sha2(F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), 256),
    )
    if ts_col is not None:
        hashed = hashed.withWatermark(ts_col, watermark)
        hashed = hashed.dropDuplicatesWithinWatermark(["text_hash"])
    else:
        hashed = hashed.dropDuplicates(["text_hash"])
    # the static side of a stream-static join is re-evaluated EVERY
    # micro-batch: persist the distinct hash set so the corpus is
    # scanned and hashed once, not once per trigger (at 100 TB, pass a
    # PRE-HASHED index via corpus_hash_col and refresh it per ingest
    # cycle instead of shipping raw text here at all)
    if corpus_hash_col is not None:
        corpus_hashes = corpus.select(
            F.col(corpus_hash_col).alias("text_hash")
        ).distinct().persist()
    else:
        corpus_hashes = corpus.select(
            F.sha2(
                F.lower(F.trim(F.coalesce(F.col(text_col), F.lit("")))), 256
            ).alias("text_hash")
        ).distinct().persist()
    return hashed.join(corpus_hashes, "text_hash", "left_anti")
