"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched ``mapInPandas``.

The decode libraries (PIL/librosa/ffmpeg) are not available in this
container, so the *decode kernels* are stubbed: ``decode_image`` raises
``NotImplementedError`` unless ``fake=True``, in which case a deterministic
fake decoder (seeded by content hash) stands in so the Spark-side plumbing —
schema, batch iteration, partition sizing, UDF signatures — is fully real
and testable. Swapping in a real decoder touches ONLY the kernel function.

Scale notes: binary payloads ride in their own column so Parquet keeps them
out of metadata-only scans (column pruning); feature extraction is
``mapInPandas`` over batches whose size is bounded by
``spark.sql.execution.arrow.maxRecordsPerBatch`` to cap executor memory.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("kind", T.StringType(), False),  # image|audio|video
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("mime", T.StringType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("mean_luma", T.DoubleType(), True),
        T.StructField("phash", T.StringType(), True),
    ]
)


def decode_image(payload: bytes, *, fake: bool = False) -> dict:
    """Decode kernel. Real implementation requires an image library that is
    not present in this environment — STUB. The fake path is deterministic
    in the payload bytes so tests are reproducible."""
    if not fake:
        raise NotImplementedError(
            "image decoding requires an image library not present in this "
            "container; run with fake=True for the deterministic test kernel"
        )
    digest = hashlib.md5(payload or b"").digest()
    return {
        "mean_luma": digest[0] / 255.0,
        "phash": digest.hex()[:16],
    }


def extract_image_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas feature extraction over the binary payload column.

    Batch-at-a-time: each Arrow batch is decoded in one Python call; only
    the small feature frame crosses back to the JVM.
    """

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_image(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    "mean_luma": [f["mean_luma"] for f in feats],
                    "phash": [f["phash"] for f in feats],
                }
            )

    return df.select("media_id", "payload").mapInPandas(
        batches, schema=IMAGE_FEATURES_SCHEMA
    )


AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("n_bytes", T.IntegerType(), True),
        T.StructField("duration_s", T.DoubleType(), True),
        T.StructField("rms", T.DoubleType(), True),
        T.StructField("clipped", T.BooleanType(), True),
    ]
)


def decode_audio(payload: bytes, *, fake: bool = False) -> dict:
    """Audio decode kernel — STUB (no audio library in this container).
    The fake path derives rms/clipping deterministically from the payload
    digest so the plumbing is testable."""
    if not fake:
        raise NotImplementedError(
            "audio decoding requires an audio library not present in this "
            "container; run with fake=True for the deterministic test kernel"
        )
    digest = hashlib.md5(payload or b"").digest()
    return {"rms": digest[1] / 255.0, "clipped": digest[2] > 240}


def extract_audio_features(df: DataFrame, *, fake: bool = True) -> DataFrame:
    """mapInPandas audio features over the binary payload column (same
    Arrow-batch contract as the image kernel); rows of other kinds are
    filtered before the Python boundary so only audio bytes cross it."""

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            feats = [decode_audio(p, fake=fake) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"].values,
                    "n_bytes": [len(p) if p is not None else None for p in pdf["payload"]],
                    "duration_s": pdf["duration_s"].values,
                    "rms": [f["rms"] for f in feats],
                    "clipped": [f["clipped"] for f in feats],
                }
            )

    return (
        df.filter("kind = 'audio'")
        .select("media_id", "payload", "duration_s")
        .mapInPandas(batches, schema=AUDIO_FEATURES_SCHEMA)
    )


def sample_frames(df: DataFrame, every_s: float = 1.0, *, fake: bool = True) -> DataFrame:
    """Frame-sampling plumbing for video rows: one output row per sampled
    timestamp. The frame grab itself is the stubbed kernel; the row fan-out,
    schema, and batching are real."""
    out_schema = T.StructType(
        [
            T.StructField("media_id", T.StringType(), False),
            T.StructField("frame_ts", T.DoubleType(), False),
            T.StructField("frame_phash", T.StringType(), True),
        ]
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = {"media_id": [], "frame_ts": [], "frame_phash": []}
            for _, r in pdf.iterrows():
                dur = r["duration_s"] or 0.0
                n = int(dur / every_s)
                for i in range(n):
                    ts = i * every_s
                    feat = decode_image(
                        (r["payload"] or b"") + str(ts).encode(), fake=fake
                    )
                    rows["media_id"].append(r["media_id"])
                    rows["frame_ts"].append(ts)
                    rows["frame_phash"].append(feat["phash"])
            yield pd.DataFrame(rows)

    return df.filter("kind = 'video'").mapInPandas(batches, schema=out_schema)
