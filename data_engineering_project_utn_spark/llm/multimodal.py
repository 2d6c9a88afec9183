"""Multimodal column plumbing — image/audio/video as opaque binary columns.

The container has no image/audio codecs, so the *decode kernels* are stubs:
``fake_decode_image`` derives deterministic metadata from the byte stream
(so the full pipeline — schema, partitioning, Arrow batch shape, UDF
signature — is real and oracle-testable), and ``decode_image_real`` raises
``NotImplementedError`` with the intended integration point documented.

Scale design: all decode/feature work runs inside ``mapInPandas`` — Arrow
batches in, Arrow batches out, no row-at-a-time Python, no shuffle.  Binary
payloads stay columnar; metadata extraction is projection-only.  On a real
cluster, set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound
decoded-frame memory per batch.
"""

from __future__ import annotations

import math
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("mean_byte", T.DoubleType()),
    ]
)


def decode_image_real(payload: bytes) -> dict:
    """Real decode hook — requires an image codec (PIL / cv2), absent here.

    Integration point: replace ``fake_decode_image`` with this in
    ``image_metadata`` once codecs are available; the Spark-side plumbing is
    unchanged.
    """
    raise NotImplementedError(
        "image codecs not available in this environment; "
        "wire PIL.Image.open(io.BytesIO(payload)) here"
    )


def fake_decode_image(payload: bytes) -> tuple[int, int, int, float]:
    """Deterministic stand-in decode: metadata derived from byte content.

    width/height/channels from length arithmetic; mean_byte from the first
    64 bytes (sequential integer sum — exact, oracle-reproducible).
    """
    n = len(payload)
    width = n % 64 + 1
    height = (n * 7) % 64 + 1
    channels = 3
    head = payload[:64]
    mean_byte = float(sum(head)) / len(head) if head else 0.0
    return width, height, channels, mean_byte


AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_bytes", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("n_samples", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
    ]
)


def decode_audio_real(payload: bytes) -> dict:
    """Real audio decode hook — requires a codec (soundfile / librosa),
    absent here.  Wire ``soundfile.read(io.BytesIO(payload))`` when
    available; Spark-side plumbing is unchanged."""
    raise NotImplementedError(
        "audio codecs not available in this environment; "
        "wire soundfile.read(io.BytesIO(payload)) here"
    )


def fake_decode_audio(payload: bytes) -> tuple[int, int, float, float]:
    """Deterministic stand-in decode: sample_rate/samples from length
    arithmetic; RMS of the first 64 bytes (exact integer sum of squares —
    oracle-reproducible)."""
    n = len(payload)
    sample_rate = 8000 + (n % 8) * 1000
    n_samples = n * 4
    duration_s = float(n_samples) / sample_rate
    head = payload[:64]
    # math.sqrt (not ** 0.5): correctly-rounded IEEE sqrt, matching the
    # oracle's sqrt() bit-for-bit
    rms = math.sqrt(float(sum(b * b for b in head)) / len(head)) if head else 0.0
    return sample_rate, n_samples, duration_s, rms


def audio_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched audio metadata over the binary column (same
    ``mapInPandas`` shape as ``image_metadata``)."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_audio(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "sample_rate": [m[0] for m in metas],
                    "n_samples": [m[1] for m in metas],
                    "duration_s": [m[2] for m in metas],
                    "rms": [m[3] for m in metas],
                }
            )

    return docs_with_payload.mapInPandas(extract, AUDIO_META_SCHEMA)


def with_binary_payload(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Simulate a multimodal table: utf-8 bytes of the text as the binary
    payload column (the driver tables have no real media blobs)."""
    return docs.withColumn("payload", F.encode(F.col(text_col), "utf-8"))


def image_metadata(docs_with_payload: DataFrame) -> DataFrame:
    """Arrow-batched metadata extraction over the binary column."""

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [fake_decode_image(p) for p in pdf["payload"]]
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"].astype("int64"),
                    "n_bytes": [len(p) for p in pdf["payload"]],
                    "width": [m[0] for m in metas],
                    "height": [m[1] for m in metas],
                    "channels": [m[2] for m in metas],
                    "mean_byte": [m[3] for m in metas],
                }
            )

    return docs_with_payload.mapInPandas(extract, IMAGE_META_SCHEMA)


def frame_sample(docs_with_payload: DataFrame, every_n: int = 16) -> DataFrame:
    """Video-style frame sampling stub: slice the payload into fixed-size
    'frames' and keep every n-th — demonstrates the explode-and-sample shape
    used for video corpora (payload → array of frame offsets, narrow op)."""
    n = F.length("payload")
    offsets = F.sequence(
        F.lit(0), F.greatest(F.floor((n - 1) / F.lit(256.0)), F.lit(0)).cast("int")
    )
    sampled = F.filter(offsets, lambda i: i % every_n == 0)
    return docs_with_payload.select(
        "doc_id", F.explode(sampled).alias("frame_idx"), n.alias("n_bytes")
    )
