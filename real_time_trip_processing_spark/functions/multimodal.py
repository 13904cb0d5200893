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


FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame binary, frame_len bigint"


def sample_frames(
    assets: DataFrame, frame_bytes: int = 16, stride: int = 4
) -> DataFrame:
    """Video frame sampling over opaque payloads: split each payload
    into fixed-size frames, keep every ``stride``-th (the every-k-th-
    frame pattern of a real pyav sampler — which would replace only the
    slicing below). One input row fans out to many frame rows INSIDE
    the Arrow batch: no explode shuffle, no driver involvement, and the
    blob column is read once per partition."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, idxs, frames = [], [], []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                buf = decode_media(bytes(payload), mtype)
                n = (len(buf) + frame_bytes - 1) // frame_bytes
                for i in range(0, n, stride):
                    ids.append(doc_id)
                    idxs.append(i)
                    frames.append(buf[i * frame_bytes : (i + 1) * frame_bytes])
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "frame_idx": pd.Series(idxs, dtype="int64"),
                    "frame": frames,
                    "frame_len": pd.Series(
                        [len(f) for f in frames], dtype="int64"
                    ),
                }
            )

    return assets.mapInPandas(batches, schema=FRAME_SCHEMA)


def resize_media(assets: DataFrame, factor: int = 4) -> DataFrame:
    """Thumbnail/downsample: keep every ``factor``-th byte of the
    decoded payload (a real resampler — Pillow's ``Image.resize`` —
    swaps in here; metadata is scaled the same way). Same mapInPandas
    contract as the extractor: Arrow batch in/out, schema preserved."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            out = pdf.copy()
            out["media"] = [
                decode_media(bytes(m), t)[::factor]
                for m, t in zip(pdf["media"], pdf["media_type"])
            ]
            out["width"] = (pdf["width"] // factor).clip(lower=1).astype("int32")
            yield out

    return assets.mapInPandas(batches, schema=assets.schema)


AUDIO_WINDOW_SCHEMA = (
    "doc_id bigint, win_idx bigint, n_samples bigint, "
    "rms double, zero_crossings bigint, peak bigint"
)


def audio_window_energy(
    assets: DataFrame, window_samples: int = 8, hop: int = 8
) -> DataFrame:
    """Windowed audio features over opaque payloads: the payload is
    interpreted as little-endian int16 PCM and each ``hop``-strided
    window of ``window_samples`` samples yields RMS energy, zero
    crossings and peak amplitude — the deterministic stand-in for a
    torchaudio spectrogram stage (which would replace only the numpy
    body; the Arrow plumbing, schema and fan-out stay).

    Same scale shape as ``sample_frames``: windows fan out INSIDE the
    Arrow batch (no explode shuffle), the blob is decoded once per row,
    and everything downstream sees narrow numeric rows.
    """
    import numpy as np

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            ids, widx, ns, rms, zc, peak = [], [], [], [], [], []
            for doc_id, payload, mtype in zip(
                pdf["doc_id"], pdf["media"], pdf["media_type"]
            ):
                buf = decode_media(bytes(payload), mtype)
                pcm = np.frombuffer(buf[: len(buf) - (len(buf) % 2)], dtype="<i2")
                for w, start in enumerate(range(0, len(pcm), hop)):
                    win = pcm[start : start + window_samples]
                    if len(win) == 0:
                        continue
                    f = win.astype("float64")
                    ids.append(doc_id)
                    widx.append(w)
                    ns.append(len(win))
                    rms.append(float(np.sqrt(np.mean(f * f))))
                    zc.append(int(np.sum(np.signbit(f[1:]) != np.signbit(f[:-1]))))
                    peak.append(int(np.max(np.abs(f))))
            yield pd.DataFrame(
                {
                    "doc_id": pd.Series(ids, dtype="int64"),
                    "win_idx": pd.Series(widx, dtype="int64"),
                    "n_samples": pd.Series(ns, dtype="int64"),
                    "rms": pd.Series(rms, dtype="float64"),
                    "zero_crossings": pd.Series(zc, dtype="int64"),
                    "peak": pd.Series(peak, dtype="int64"),
                }
            )

    return assets.mapInPandas(batches, schema=AUDIO_WINDOW_SCHEMA)
