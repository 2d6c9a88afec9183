"""Multimodal plan family (binary payload metadata, frame sampling)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.llm import multimodal as mm
from data_engineering_project_utn_spark.llm.compute import parallelize_compute
from data_engineering_project_utn_spark.plans.registry import register
from data_engineering_project_utn_spark.tables import load_table

@register(
    "llm_image_metadata",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
                      substring(text, 1, 64) AS head
               FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(n % 64 + 1 AS INTEGER) AS width,
           CAST((n * 7) % 64 + 1 AS INTEGER) AS height,
           CAST(3 AS INTEGER) AS channels,
           CAST(list_sum(list_transform(string_split(head, ''), c -> ascii(c))) AS DOUBLE)
               / len(string_split(head, '')) AS mean_byte
    FROM b
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def llm_image_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing end-to-end: binary payload column →
    ``mapInPandas`` Arrow-batched decode (deterministic fake codec — see
    llm/multimodal.py) → typed metadata.  The oracle reproduces the fake
    codec's integer arithmetic, so the whole Python-batch path is
    value-checked, not just row-counted.  (Payload = utf-8 text bytes; the
    corpus is ASCII so bytes ≡ chars in the oracle.)"""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return mm.image_metadata(mm.with_binary_payload(d))


@register(
    "llm_audio_metadata",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n,
                      substring(text, 1, 64) AS head
               FROM documents)
    SELECT doc_id,
           CAST(n AS BIGINT) AS n_bytes,
           CAST(8000 + (n % 8) * 1000 AS INTEGER) AS sample_rate,
           CAST(n * 4 AS BIGINT) AS n_samples,
           CAST(n * 4 AS DOUBLE) / (8000 + (n % 8) * 1000) AS duration_s,
           sqrt(CAST(list_sum(list_transform(string_split(head, ''),
                                             c -> ascii(c) * ascii(c))) AS DOUBLE)
                / len(string_split(head, ''))) AS rms
    FROM b
    """,
    tags=("llm", "multimodal", "pandas-udf"),
)
def llm_audio_metadata(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Audio plumbing end-to-end: binary payload → Arrow-batched
    ``mapInPandas`` decode (deterministic fake codec; ``decoder="real"``
    switches to soundfile / stdlib-WAV decoding, see llm/multimodal.py) →
    sample-rate/duration/RMS metadata, value-checked against the oracle's
    integer arithmetic."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return mm.audio_metadata(mm.with_binary_payload(d))


@register(
    "llm_frame_sample",
    oracle="""
    WITH b AS (SELECT doc_id, octet_length(encode(text)) AS n FROM documents)
    SELECT doc_id, i AS frame_idx, CAST(n AS BIGINT) AS n_bytes
    FROM b, LATERAL unnest(range(0, GREATEST(CAST(FLOOR((n - 1) / 256.0) AS INTEGER), 0) + 1)) t(i)
    WHERE i % 16 = 0
    """,
    tags=("llm", "multimodal"),
)
def llm_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling shape: payload → frame offsets → keep
    every 16th (explode of a generated sequence; narrow, scan-speed)."""
    d = parallelize_compute(load_table(spark, sf_dir, "documents"))
    return mm.frame_sample(mm.with_binary_payload(d), every_n=16)
