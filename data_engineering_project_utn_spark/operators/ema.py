"""Exponential moving average — the reference's only genuinely stateful op.

Reference: per-message Python recurrence ``avg = α·x + (1-α)·avg`` with
short/long factors (`Real Final APP/Dashboard_Live_Final.py:577-624`,
`Kafka/ddb_wrappers.py:47-88`; α ∈ {0.02, 0.005, 0.0002}).

Batch form here: order-sensitive fold per key.  Spark has no built-in
running-EMA aggregate, so we use ``aggregate()`` (a Catalyst fold expression)
over ``collect_list`` of (ts-sorted) structs — stays JVM-side, no Python.
This is exact and deterministic; state per key is O(rows-per-key), so at
100 TB keys must be bounded (instance_id / user_id are — small domains).
For hot keys, ``ema_scan`` (one global series) and ``ema_scan_by_key``
(every key at once) bound state to rows/segments via parallel affine
composition; the trailing-window variant bounds state for unbounded keys.

Streaming form: ``streaming.stateful_ema`` (applyInPandasWithState).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def ema_expr(values_sorted: Column, alpha: float) -> Column:
    """Fold EMA over an array column (already event-time-ordered).

    y_0 = x_0;  y_i = α·x_i + (1-α)·y_{i-1}  — matches the reference's
    initialisation (first observation seeds the average,
    `Kafka/ddb_wrappers.py:56-60`).

    Null elements are skipped (the accumulator carries through unchanged);
    the first non-null observation seeds the fold.  Without the explicit
    null guard, a null x would null the affine step and the coalesce would
    silently *re-seed* from the next observation, discarding history.
    """
    a = F.lit(float(alpha))
    return F.aggregate(
        values_sorted,
        F.lit(None).cast("double"),
        lambda acc, x: F.when(x.isNull(), acc).otherwise(
            F.coalesce(a * x + (F.lit(1.0) - a) * acc, x.cast("double"))
        ),
    )


def ema_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ema",
) -> DataFrame:
    """Final EMA value per key after folding all rows in ``order_col`` order.

    One shuffle on the key; the sort happens inside ``array_sort`` on the
    collected (order, value) structs, i.e. within each group.
    """
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v")))
    )
    values = F.transform(pairs, lambda s: s["v"].cast("double"))
    return df.groupBy(*[F.col(c) for c in key_cols]).agg(
        ema_expr(values, alpha).alias(out_col),
        F.count(F.lit(1)).alias("n_obs"),
    )


def ema_scan(
    df: DataFrame,
    order_col: str,
    value_col: str,
    alpha: float,
    num_partitions: int | None = None,
) -> float | None:
    """Parallel segmented-scan EMA for one (hot-key) series.

    ``ema_by_key`` folds a key's whole series in one task — fine for the
    reference's bounded key domains, a bottleneck for one key with 10¹⁰
    rows.  The EMA step e ← α·x + (1-α)·e is an *affine map*, and affine
    maps compose:  a partition covering rows with values x₁..x_n acts on
    the incoming state as  e_out = A·e_in + B  with  A = (1-α)ⁿ  and
    B = the fold seeded from 0.  So: range-partition by event time, fold
    every partition in parallel (each a JVM ``aggregate`` expression), then
    compose the P (A, B) pairs in order on the driver — P scalar pairs,
    a model-size quantity.

    Floating-point caveat: the regrouped arithmetic differs from the
    sequential fold in the last ulps (binary-fold error O(log n) vs
    sequential O(n) — typically *more* accurate).  The oracle-gated EMA
    queries therefore keep the sequential ``ema_by_key``; use this beyond
    ~10⁷ rows per key, where bit-parity with a single-threaded oracle
    stops being meaningful.

    Returns the final EMA as a Python float (None on empty input).
    """
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    a = F.lit(float(alpha))
    ranged = df.repartitionByRange(p, F.col(order_col)).select(
        F.spark_partition_id().alias("_pid"),
        F.col(order_col).alias("o"),
        F.col(value_col).cast("double").alias("v"),
    )
    values = F.transform(
        F.array_sort(F.collect_list(F.struct("o", "v"))), lambda s: s["v"]
    )
    per_part = (
        ranged.groupBy("_pid")
        .agg(
            # B: fold seeded from 0 (pure affine offset of the segment).
            # Nulls skip (state unchanged) exactly like ema_expr — and must
            # therefore also not count into the decay exponent n below.
            F.aggregate(
                values,
                F.lit(0.0),
                lambda acc, x: F.when(x.isNull(), acc).otherwise(
                    a * x + (F.lit(1.0) - a) * acc
                ),
            ).alias("b"),
            # seeded fold (y0 = x0) — the true EMA if this is the first segment
            ema_expr(values, alpha).alias("seeded"),
            F.count(F.col("v")).alias("n"),
        )
        .orderBy("_pid")
        .collect()
    )
    if not per_part:
        return None
    ema: float | None = None
    for row in per_part:
        if ema is None:
            ema = row["seeded"]
        else:
            ema = ((1.0 - alpha) ** row["n"]) * ema + row["b"]
    return ema


def ema_scan_by_key(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    alpha: float,
    out_col: str = "ema",
    num_segments: int = 32,
) -> DataFrame:
    """Per-key parallel segmented-scan EMA — ``ema_scan`` generalized from
    one global series to every key at once, removing ``ema_by_key``'s
    O(rows-per-key) single-task state.

    Same affine-composition identity as ``ema_scan`` (a segment acts on
    incoming state as e_out = (1-α)ⁿ·e_in + B), but both levels stay
    distributed JVM folds — nothing per-key ever reaches the driver:

    1. segment id: a deterministic range bucket of ``order_col`` within
       the key's [min, max] span (monotone in the order value, so segment
       order ≡ event order; equal order values land in one segment, so the
       within-segment (o, v) struct sort reproduces ``ema_by_key``'s exact
       total order);
    2. per (key, segment): zero-seeded fold B, seeded fold, and non-null
       count n — ``aggregate`` expressions over a collect_list bounded by
       rows-per-key / num_segments instead of rows-per-key;
    3. per key: compose the ≤num_segments (n, B, seeded) summaries in
       segment order with a second ``aggregate`` fold (null state = not
       yet seeded; an all-null segment is the identity map n=0, B=0).

    Floating-point caveat as in ``ema_scan``: the regrouped arithmetic
    (and JVM ``pow``) differs from the sequential fold in the last ulps,
    so the gated query tolerance-checks against ``ema_by_key`` instead of
    bit-matching an oracle.  Scale knob: state per task is
    rows-per-key / num_segments — raise ``num_segments`` for hotter keys.
    """
    a = float(alpha)
    keys = list(key_cols)
    o_num = F.col(order_col).cast("double")
    spans = df.groupBy(*keys).agg(F.min(o_num).alias("_mn"), F.max(o_num).alias("_mx"))
    seg = (
        F.when(F.col("_mx") == F.col("_mn"), F.lit(0))
        .otherwise(
            F.least(
                F.lit(num_segments - 1),
                F.floor(
                    (o_num - F.col("_mn"))
                    / ((F.col("_mx") - F.col("_mn")) / F.lit(float(num_segments)))
                ),
            )
        )
        .cast("int")
    )
    with_seg = df.join(spans, keys).withColumn("_seg", seg)
    al = F.lit(a)
    pairs = F.array_sort(
        F.collect_list(
            F.struct(F.col(order_col).alias("o"), F.col(value_col).alias("v"))
        )
    )
    values = F.transform(pairs, lambda s: s["v"].cast("double"))
    seg_stats = with_seg.groupBy(*keys, F.col("_seg")).agg(
        F.aggregate(
            values,
            F.lit(0.0),
            lambda acc, x: F.when(x.isNull(), acc).otherwise(
                al * x + (F.lit(1.0) - al) * acc
            ),
        ).alias("_b"),
        ema_expr(values, alpha).alias("_seeded"),
        F.count(F.col(value_col)).alias("_n"),
        F.count(F.lit(1)).alias("_rows"),
    )
    segs = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("_seg").alias("g"),
                F.col("_n").alias("n"),
                F.col("_b").alias("b"),
                F.col("_seeded").alias("s"),
            )
        )
    )
    composed = F.aggregate(
        segs,
        F.lit(None).cast("double"),
        lambda acc, s: F.when(acc.isNull(), s["s"]).otherwise(
            F.pow(F.lit(1.0 - a), s["n"]) * acc + s["b"]
        ),
    )
    return seg_stats.groupBy(*keys).agg(
        composed.alias(out_col), F.sum("_rows").alias("n_obs")
    )


def stress_index(
    stress: DataFrame,
    order_col: str = "arrival_timestamp",
    alpha_short: float = 0.02,
    alpha_long: float = 0.005,
) -> DataFrame:
    """Short/long EMA of (execution_duration_ms + mbytes_spilled) pressure —
    the live stress index (`Dashboard_Live_Final.py:596-618`).  Global fold
    (single group) exactly like the reference's single consumer loop."""
    pressure = (
        F.col("execution_duration_ms").cast("double")
        + F.coalesce(F.col("mbytes_spilled"), F.lit(0.0)).cast("double")
    )
    with_p = stress.withColumn("_pressure", pressure)
    pairs = F.array_sort(
        F.collect_list(F.struct(F.col(order_col).alias("o"), F.col("_pressure").alias("v")))
    )
    values = F.transform(pairs, lambda s: s["v"])
    return with_p.agg(
        ema_expr(values, alpha_short).alias("ema_short"),
        ema_expr(values, alpha_long).alias("ema_long"),
        F.count(F.lit(1)).alias("n_obs"),
    )
