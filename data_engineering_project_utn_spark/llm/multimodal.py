"""Multimodal column plumbing — image/audio/video as opaque binary columns.

Two decode paths share one Arrow-batched pipeline:

* ``decoder="fake"`` (default): deterministic metadata derived from the
  byte stream — the oracle-gated path (the driver's tables carry text
  payloads, not media), exercising the full Spark plumbing: schema,
  partitioning, Arrow batch shape, UDF signature.
* ``decoder="real"``: actual media decoding.  Prefers PIL / soundfile when
  importable; without them falls back to built-in decoders — PNG
  (pure-Python chunk parse + zlib inflate + scanline un-filtering, 8-bit
  non-interlaced), BMP (uncompressed 24/32-bit), and WAV (stdlib ``wave``,
  PCM16 RMS).  Unknown formats raise ``ValueError`` naming the codec to
  install — no silent wrong answers.

Scale design: all decode/feature work runs inside ``mapInPandas`` — Arrow
batches in, Arrow batches out, no row-at-a-time Python, no shuffle.  Binary
payloads stay columnar; metadata extraction is projection-only.  On a real
cluster, set ``spark.sql.execution.arrow.maxRecordsPerBatch`` to bound
decoded-frame memory per batch.
"""

from __future__ import annotations

import io
import math
import struct
import zlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

try:  # optional: real image codec
    from PIL import Image as _PIL_Image
except ImportError:
    _PIL_Image = None

try:  # optional: real audio codec
    import soundfile as _soundfile
except ImportError:
    _soundfile = None

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


_PNG_SIG = b"\x89PNG\r\n\x1a\n"
# color_type → channels.  Palette images (type 3) are deliberately absent:
# without applying PLTE the "pixels" would be palette indices and mean_byte
# a mean of indices — a silent wrong answer.  They raise the named
# ValueError instead (PIL handles them on the real path).
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _png_unfilter(raw: bytes, width: int, height: int, channels: int) -> bytearray:
    """Reverse PNG scanline filtering (spec §9: None/Sub/Up/Average/Paeth)."""
    stride = width * channels
    out = bytearray()
    prev = bytearray(stride)
    pos = 0
    for _ in range(height):
        ftype = raw[pos]
        line = bytearray(raw[pos + 1 : pos + 1 + stride])
        pos += 1 + stride
        if ftype == 1:  # Sub
            for i in range(channels, stride):
                line[i] = (line[i] + line[i - channels]) & 0xFF
        elif ftype == 2:  # Up
            for i in range(stride):
                line[i] = (line[i] + prev[i]) & 0xFF
        elif ftype == 3:  # Average
            for i in range(stride):
                left = line[i - channels] if i >= channels else 0
                line[i] = (line[i] + (left + prev[i]) // 2) & 0xFF
        elif ftype == 4:  # Paeth
            for i in range(stride):
                a = line[i - channels] if i >= channels else 0
                b = prev[i]
                c = prev[i - channels] if i >= channels else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if pa <= pb and pa <= pc else (b if pb <= pc else c)
                line[i] = (line[i] + pred) & 0xFF
        out += line
        prev = line
    return out


def _decode_png(payload: bytes) -> tuple[int, int, int, float]:
    """Pure-Python PNG decode (8-bit depth, non-interlaced, color types
    0/2/4/6): chunk walk → IHDR dims → zlib-inflate IDAT → un-filter →
    mean pixel byte.  Standard algorithm from the PNG specification."""
    pos = len(_PNG_SIG)
    width = height = channels = None
    idat = bytearray()
    while pos + 8 <= len(payload):
        (length,) = struct.unpack(">I", payload[pos : pos + 4])
        ctype = payload[pos + 4 : pos + 8]
        data = payload[pos + 8 : pos + 8 + length]
        pos += 12 + length  # length + type + data + crc
        if ctype == b"IHDR":
            width, height, bit_depth, color_type, _, _, interlace = struct.unpack(
                ">IIBBBBB", data
            )
            if bit_depth != 8 or interlace != 0 or color_type not in _PNG_CHANNELS:
                raise ValueError(
                    f"unsupported PNG (bit_depth={bit_depth}, "
                    f"color_type={color_type}, interlace={interlace}); install PIL"
                )
            channels = _PNG_CHANNELS[color_type]
        elif ctype == b"IDAT":
            idat += data
        elif ctype == b"IEND":
            break
    if width is None or not idat:
        raise ValueError("malformed PNG: missing IHDR/IDAT")
    pixels = _png_unfilter(zlib.decompress(bytes(idat)), width, height, channels)
    mean = float(sum(pixels)) / len(pixels) if pixels else 0.0
    return width, height, channels, mean


def _decode_bmp(payload: bytes) -> tuple[int, int, int, float]:
    """Uncompressed 24/32-bit BMP: BITMAPINFOHEADER dims + raw pixel mean
    (rows padded to 4 bytes, stored bottom-up — padding excluded)."""
    if len(payload) < 54:
        raise ValueError("malformed BMP: truncated header")
    (data_offset,) = struct.unpack("<I", payload[10:14])
    width, height = struct.unpack("<ii", payload[18:26])
    (bpp,) = struct.unpack("<H", payload[28:30])
    (compression,) = struct.unpack("<I", payload[30:34])
    if bpp not in (24, 32) or compression != 0:
        raise ValueError(f"unsupported BMP (bpp={bpp}, compression={compression})")
    channels = bpp // 8
    height = abs(height)
    row_bytes = width * channels
    stride = (row_bytes + 3) & ~3
    total = 0
    count = 0
    for r in range(height):
        row = payload[data_offset + r * stride : data_offset + r * stride + row_bytes]
        total += sum(row)
        count += len(row)
    return width, height, channels, (float(total) / count if count else 0.0)


def decode_image_real(payload: bytes) -> tuple[int, int, int, float]:
    """Real image decode: (width, height, channels, mean_pixel_byte).

    PIL when importable; otherwise the built-in PNG/BMP decoders above.
    Raises ``ValueError`` for formats neither path handles — callers see a
    named failure, never fake numbers."""
    if _PIL_Image is not None:
        from PIL import ImageStat

        img = _PIL_Image.open(io.BytesIO(payload))
        if img.mode == "P":  # palette → real pixel values, not indices
            img = img.convert("RGB")
        channels = len(img.getbands())
        # C-side histogram sums — O(pixels) stays out of interpreted Python.
        # Σ per-band sums / (pixels·bands) is exactly the byte mean the old
        # Python fold computed for 8-bit modes (band sums are integral).
        stat = ImageStat.Stat(img)
        count = img.width * img.height * channels
        mean = float(sum(stat.sum)) / count if count else 0.0
        return img.width, img.height, channels, mean
    if payload[: len(_PNG_SIG)] == _PNG_SIG:
        return _decode_png(payload)
    if payload[:2] == b"BM":
        return _decode_bmp(payload)
    raise ValueError(
        "unrecognized image format (built-in decoders: PNG, BMP); install PIL"
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


def decode_audio_real(payload: bytes) -> tuple[int, int, float, float]:
    """Real audio decode: (sample_rate, n_samples, duration_s, rms).

    soundfile when importable; otherwise stdlib ``wave`` for RIFF/WAV
    (PCM16 RMS, normalized to [-1, 1]).  Raises ``ValueError`` for other
    formats."""
    if _soundfile is not None:
        data, rate = _soundfile.read(io.BytesIO(payload))
        n = len(data)
        flat = data.flatten() if hasattr(data, "flatten") else data
        rms = math.sqrt(float((flat**2).mean())) if n else 0.0
        return rate, n, float(n) / rate if rate else 0.0, rms
    if payload[:4] != b"RIFF" or payload[8:12] != b"WAVE":
        raise ValueError(
            "unrecognized audio format (built-in decoder: WAV); install soundfile"
        )
    import wave

    with wave.open(io.BytesIO(payload), "rb") as w:
        rate = w.getframerate()
        n_frames = w.getnframes()
        sampwidth = w.getsampwidth()
        n_channels = w.getnchannels()
        frames = w.readframes(n_frames)
    if sampwidth != 2:
        raise ValueError(f"unsupported WAV sample width {sampwidth}; install soundfile")
    samples = struct.unpack(f"<{n_frames * n_channels}h", frames)
    if samples:
        rms = math.sqrt(sum((s / 32768.0) ** 2 for s in samples) / len(samples))
    else:
        rms = 0.0
    return rate, n_frames, float(n_frames) / rate if rate else 0.0, rms


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


def audio_metadata(docs_with_payload: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched audio metadata over the binary column (same
    ``mapInPandas`` shape as ``image_metadata``).  ``decoder="real"``
    decodes actual audio (soundfile or stdlib WAV); the default keeps the
    deterministic oracle path for non-media payloads."""
    decode = decode_audio_real if decoder == "real" else fake_decode_audio

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
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


def image_metadata(docs_with_payload: DataFrame, decoder: str = "fake") -> DataFrame:
    """Arrow-batched metadata extraction over the binary column.
    ``decoder="real"`` decodes actual images (PIL or built-in PNG/BMP);
    the default keeps the deterministic oracle path."""
    decode = decode_image_real if decoder == "real" else fake_decode_image

    def extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            metas = [decode(p) for p in pdf["payload"]]
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
