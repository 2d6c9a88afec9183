"""Mergeable sketches for petabyte-scale approximate aggregation.

Count-min (Cormode-Muthukrishnan): D hash rows of W counters.  In
DataFrame terms the sketch IS a grouped aggregation on (d, hash_d(item) %
W) — partial aggregation map-side is exactly the sketch-merge property,
so counters never exceed D·W rows (model-size) no matter the corpus, and
two corpora's sketches merge by summing counters.  Estimates are
min-over-rows and can only OVERcount (≤ true + εN with ε ≈ e/W at
standard depth) — the documented swap for exact heavy-hitter counts at
scans where a full groupBy's key space is the bottleneck (SCALE.md).

Hashing is md5-derived (seeded by row index), so the whole sketch —
build, estimate, error — is reproducible in SQL oracles via the same
hex-char fold the SimHash gate uses.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def cm_hash(item: Column, seed: int, width: int) -> Column:
    """Row-``seed`` bucket for ``item``: first 8 md5 hex chars as an int,
    mod ``width`` — deterministic, engine-reproducible."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{seed}:"), item)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cm_counters(
    items: DataFrame, item_col: str, depth: int = 3, width: int = 512
) -> DataFrame:
    """Build the sketch: (d, bucket, cnt) counters, ≤ depth·width rows."""
    c = F.col(item_col)
    rows = items.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_hash(c, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s")
    ).select("s.d", "s.bucket")
    return rows.groupBy("d", "bucket").agg(F.count(F.lit(1)).alias("cnt"))


def cm_estimates(
    counters: DataFrame,
    queries: DataFrame,
    item_col: str,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Point estimates for the query items: min over the D counters each
    item hashes to.  ``counters`` is model-size → broadcast join.

    The join is LEFT with ``coalesce(cnt, 0)``: canonical count-min reads
    an empty bucket as 0, so an item absent from the corpus estimates 0
    instead of disappearing (or worse, taking an inflated min over only
    its populated buckets)."""
    c = F.col(item_col)
    q = queries.select(
        item_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(d).alias("d"), cm_hash(c, d, width).alias("bucket")
                    )
                    for d in range(depth)
                ]
            )
        ).alias("s"),
    ).select(item_col, "s.d", "s.bucket")
    return (
        q.join(F.broadcast(counters), ["d", "bucket"], "left")
        .groupBy(item_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cm_estimate"))
    )


def cm_merge(*counter_frames: DataFrame) -> DataFrame:
    """Merge sketches built with identical (depth, width, seeds): counters
    sum per (d, bucket).  This is the union-then-groupBy spelling of the
    same merge the map-side partial aggregation performs inside one build —
    merged(A) ⊎ merged(B) ≡ sketch(A ∪ B) exactly, which is what makes the
    sketch shard-parallel at any scale (per-shard sketches, model-size
    merge; the cross-engine gate ``llm_cm_extract`` proves it bit-exactly
    against a single-pass oracle sketch)."""
    from functools import reduce

    u = reduce(lambda a, b: a.unionByName(b), counter_frames)
    return u.groupBy("d", "bucket").agg(F.sum("cnt").alias("cnt"))


def cm_heavy_hitters(
    counters: DataFrame,
    candidates: DataFrame,
    item_col: str,
    epsilon: float,
    depth: int = 3,
    width: int = 512,
) -> DataFrame:
    """Heavy-hitter extraction: candidates whose estimate ≥ ε·N, with N
    (the stream length) read from the sketch itself — row 0's counters sum
    to N, so no second pass over the data.  One-sided: every item with
    true count ≥ ε·N is guaranteed in the output (CM never undercounts);
    false positives are bounded by the e/W overcount.  ``candidates`` is
    the item domain to probe (CM is not invertible — at scale keep the
    candidate set alongside the sketch, e.g. per-shard local top-k).

    Output: item, cm_estimate, threshold (ε·N as double — use an exactly
    representable ε like 1/256 for cross-engine bit-parity)."""
    n_total = counters.filter(F.col("d") == 0).agg(F.sum("cnt").alias("_n"))
    est = cm_estimates(counters, candidates, item_col, depth, width)
    thresh = F.lit(epsilon) * F.col("_n").cast("double")
    return (
        est.crossJoin(F.broadcast(n_total))
        .filter(F.col("cm_estimate").cast("double") >= thresh)
        .select(item_col, "cm_estimate", thresh.alias("threshold"))
    )
