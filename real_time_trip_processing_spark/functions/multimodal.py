"""Multimodal columns (SURVEY §2.12 X6): image/audio/video as opaque
``binary`` columns with typed metadata, processed by Arrow-batched
pandas UDFs.

The Spark-side plumbing is real and tested: schema contract, binary
payload column, metadata struct, ``mapInPandas`` batch iteration (one
Arrow batch in, one out — no per-row Python), and partition-count
preservation. The *codec* itself is stubbed: this environment ships no
image/audio libraries, so ``decode_media`` either raises a
clearly-marked NotImplementedError (real codecs) or runs the
deterministic fake codec used by the test suite. Swapping in Pillow/
torchaudio/pyav later changes ONE function — none of the Spark plumbing.

At 100 TB: binary payloads live in parquet next to their metadata;
filters on metadata (media_type, width) push down to the scan WITHOUT
touching the blob column (columnar pruning), and the expensive decode
runs only on the pruned rows, inside the scan stage's partitions.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame, functions as F

#: output contract of the feature extractor
FEATURE_SCHEMA = (
    "doc_id bigint, media_type string, byte_len bigint, "
    "byte_mean double, features array<double>"
)

N_FEATURE_BINS = 8

REAL_CODECS = ("image/jpeg", "image/png", "audio/wav", "video/mp4")


def synth_media(docs: DataFrame) -> DataFrame:
    """Deterministic fake media assets from the documents table: the
    utf-8 bytes of the text stand in for an encoded payload; n_chars
    derives fake raster metadata. Stands in for `spark.read.parquet` of
    a real asset table with the same schema."""
    return docs.select(
        "doc_id",
        F.encode("text", "utf-8").alias("media"),
        F.lit("application/x-fake").alias("media_type"),
        (F.col("n_chars") % 64 + 1).cast("int").alias("width"),
        (F.col("n_chars") / 64 + 1).cast("int").alias("height"),
    )


def decode_media(payload: bytes, media_type: str) -> bytes:
    """STUB: real codecs are not available in this environment.

    ``application/x-fake`` passes the payload through (the deterministic
    fake codec); anything else is a genuine decode we cannot perform
    here — marked loudly rather than silently faked.
    """
    if media_type == "application/x-fake":
        return payload
    raise NotImplementedError(
        f"decode_media: no codec for {media_type} in this environment "
        "(install Pillow/pyav and replace this stub; all Spark plumbing "
        "stays unchanged)"
    )


def _feature_batches(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow batch in → Arrow batch out. numpy-vectorized within the
    batch; nothing crosses to the driver."""
    import numpy as np

    for pdf in batches:
        decoded = [
            decode_media(m, t) for m, t in zip(pdf["media"], pdf["media_type"])
        ]
        lens = np.array([len(b) for b in decoded], dtype="int64")
        means = np.array(
            [np.frombuffer(b, dtype="uint8").mean() if len(b) else 0.0 for b in decoded]
        )
        feats = [
            (
                np.bincount(
                    np.frombuffer(b, dtype="uint8") % N_FEATURE_BINS,
                    minlength=N_FEATURE_BINS,
                )
                / max(len(b), 1)
            ).tolist()
            for b in decoded
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "byte_len": lens,
                "byte_mean": means,
                "features": feats,
            }
        )


def extract_features(assets: DataFrame) -> DataFrame:
    """X6 feature extraction over binary media columns via mapInPandas:
    byte length, mean byte value, and an 8-bin byte histogram as the
    deterministic stand-in for a real embedding."""
    return assets.mapInPandas(_feature_batches, schema=FEATURE_SCHEMA)
