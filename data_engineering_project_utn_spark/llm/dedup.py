"""Deduplication operators for training-data pipelines.

Scale design: every method is blocking-based — no all-pairs comparison ever
materializes.

* exact / normalized: hash-groupBy (one shuffle on the 128-bit digest).
* MinHash + LSH: per-row signature (narrow) → explode k/r bands (narrow,
  ×bands) → groupBy (band_idx, band_hash) — one shuffle whose key space is
  the band buckets; only same-bucket docs ever meet.  Candidate pairs then
  get exact Jaccard verification.  This is the standard
  shingle→minhash→band→bucket-join pipeline (Broder '97 / MMDS ch.3).
* SimHash: per-row 16-bit signature; duplicates = equal signatures
  (groupBy), near-duplicates = signatures within Hamming distance d via
  bit-mask band exploding.

All hashing uses md5 (lexicographic min over hex = a uniform-order MinHash
family) so DuckDB oracles reproduce values exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.llm.text import shingles, tokens


def content_hash(text: Column | str) -> Column:
    """Exact-dup key: md5 of raw content."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def normalized_hash(text: Column | str) -> Column:
    """Dup key invariant to token order & case: md5 of the sorted token set."""
    return F.md5(F.concat_ws(" ", F.array_sort(F.array_distinct(tokens(text)))))


def minhash_signature(text: Column | str, k: int = 8, n: int = 5) -> Column:
    """k-perm MinHash signature over n-gram shingles.

    Each permutation i is the lexicographic order of ``md5(i || ':' ||
    md5(shingle))`` — shingle digests are computed once, then k cheap
    re-hashes.  Returns array<string> of length k.
    """
    sh_digests = F.transform(shingles(text, n), F.md5)
    return F.transform(
        F.sequence(F.lit(0), F.lit(k - 1)),
        lambda i: F.array_min(
            F.transform(
                sh_digests, lambda h: F.md5(F.concat(i.cast("string"), F.lit(":"), h))
            )
        ),
    )


def lsh_bands(signature: Column, bands: int, rows: int) -> Column:
    """Band the signature: array of (band_idx, band_hash) structs."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(bands - 1)),
        lambda b: F.struct(
            b.alias("band_idx"),
            F.md5(F.concat_ws("|", F.slice(signature, b * rows + 1, rows))).alias(
                "band_hash"
            ),
        ),
    )


def minhash_candidates(
    docs: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    k: int = 8,
    bands: int = 4,
    n: int = 5,
) -> DataFrame:
    """LSH candidate pairs (id_a < id_b): docs sharing ≥1 band bucket."""
    rows = k // bands
    banded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(lsh_bands(minhash_signature(text_col, k, n), bands, rows)).alias("b"),
    ).select("doc_id", "b.band_idx", "b.band_hash")
    a = banded.alias("a")
    b = banded.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def shingle_jaccard(text_a: Column, text_b: Column, n: int = 5) -> Column:
    """Exact Jaccard over distinct n-gram shingle sets."""
    sa = F.array_distinct(shingles(text_a, n))
    sb = F.array_distinct(shingles(text_b, n))
    inter = F.size(F.array_intersect(sa, sb)).cast("double")
    union = (F.size(sa) + F.size(sb)).cast("double") - inter
    return inter / union


def simhash16(text: Column | str) -> Column:
    """16-bit SimHash over tokens (near-dup key; Charikar '02).

    Bit b of the signature is the sign of Σ_tokens (±1 depending on bit b of
    the token digest).  Uses the first 4 hex chars of md5 per token.
    Spark-only (no SQL oracle — conv() has no cheap DuckDB twin); verified
    by pytest property tests instead.
    """
    toks = F.array_distinct(tokens(text))
    tok_bits = F.transform(
        toks, lambda t: F.conv(F.substring(F.md5(t), 1, 4), 16, 10).cast("long")
    )

    def bit_of(v: Column, b: Column) -> Column:
        # (v >> b) & 1 arithmetically — shift builtins need literal counts
        return F.floor(v / F.pow(F.lit(2.0), b)).cast("long") % 2

    return F.aggregate(
        F.sequence(F.lit(0), F.lit(15)),
        F.lit(0).cast("long"),
        lambda acc, b: acc
        + F.when(
            F.aggregate(
                tok_bits,
                F.lit(0).cast("long"),
                lambda s, v: s + F.when(bit_of(v, b) == 1, 1).otherwise(-1),
            )
            > 0,
            F.pow(F.lit(2.0), b).cast("long"),
        ).otherwise(0),
    )
