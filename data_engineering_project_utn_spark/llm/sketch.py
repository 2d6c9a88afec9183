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
