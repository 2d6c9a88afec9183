"""Relative-ingestion-position decile histogram.

Reproduces `Real Final APP/Dashboard_Historical_Final.py:428-528`:
for selects on analytical tables, the position of each query inside its
ingestion interval (0 = just after ingest, 1 = just before next), binned
into NTILE(10) deciles over a *global* ordering, counted per
(instance_id, read_table_id, bin).

Scale note (SURVEY.md §7.2): ``F.ntile`` over a global ORDER BY is a
single-partition window — the one-reducer bottleneck at 100 TB.
``distributed_ntile`` reproduces NTILE *exactly* without it: range-partition
on the sort key (equal keys co-locate; partition i's keys all precede
partition i+1's), collect only the P per-partition counts to the driver,
convert them to global rank offsets, then assign bins arithmetically from
the closed-form NTILE definition.  Two jobs, no single-partition stage,
bit-identical to the window version (asserted in tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.functions.scalar import epoch_ms
from data_engineering_project_utn_spark.persist import pin_for_correctness, track_persist


def with_global_rank(
    df: DataFrame,
    order_cols: list[str],
    num_partitions: int | None = None,
) -> DataFrame:
    """Attach a 0-based global rank over a total order, computed distributed:
    range-partition on the sort key, collect only the P per-partition counts
    (model-size, like IVF centroids — never rows), turn them into rank
    offsets, broadcast them back.  No single-partition stage anywhere.
    Output columns: input + ``_rank0`` (bigint), ``_total`` (bigint).

    ``order_cols`` must define a total order (add tiebreakers) for the
    assignment to be deterministic.
    """
    p = num_partitions or df.sparkSession.sparkContext.defaultParallelism
    cols = [F.col(c) for c in order_cols]
    # persist is CORRECTNESS here, not caching: repartitionByRange samples
    # its boundaries, and the offsets branch and the rank branch would
    # otherwise each evaluate the exchange — with possibly different
    # sampled boundaries, desynchronizing offsets from partition contents
    # (caught by the sf0.1 oracle gate; ReuseExchange is not guaranteed
    # under AQE).  One materialization pins one partitioning for both.
    # pin, don't track: release_persisted() must never free this (recompute
    # would resample range boundaries and desync the offsets — see persist.py)
    ranged = pin_for_correctness(
        df.repartitionByRange(p, *cols).withColumn("_pid", F.spark_partition_id())
    )
    # Per-partition counts → rank offsets + grand total.  The P counts are
    # collected to the driver (model-size: one long per partition) and the
    # prefix sum computed there — a declarative window over the count frame
    # would plan an Exchange SinglePartition, and the benched headline
    # asserts no such stage exists anywhere in its plan.
    cnt_rows = ranged.groupBy("_pid").agg(F.count(F.lit(1)).alias("_cnt")).collect()
    counts = {int(r["_pid"]): int(r["_cnt"]) for r in cnt_rows}
    total = sum(counts.values())
    acc = 0
    rows = []
    for pid in sorted(counts):
        rows.append((pid, acc, total))
        acc += counts[pid]
    offsets = ranged.sparkSession.createDataFrame(
        rows, schema="_pid int, _offset bigint, _total bigint"
    )
    w = Window.partitionBy("_pid").orderBy(*cols)
    rank0 = (F.row_number().over(w) + F.col("_offset") - 1).cast("bigint")
    return (
        ranged.join(F.broadcast(offsets), "_pid")
        .withColumn("_rank0", rank0)
        .drop("_pid", "_offset")
    )


def distributed_ntile(
    df: DataFrame,
    order_cols: list[str],
    n_bins: int,
    bin_col: str = "bin",
    num_partitions: int | None = None,
) -> DataFrame:
    """Exact NTILE(n) over a global total order, computed distributed
    (see ``with_global_rank``): closed-form bin arithmetic over the global
    rank — N rows into n bins → the first r = N mod n bins hold q+1 rows
    (q = N div n), the rest hold q rows."""
    ranked = with_global_rank(df, order_cols, num_partitions)
    rank0 = F.col("_rank0")
    q = F.floor(F.col("_total") / n_bins)
    r = F.col("_total") % n_bins
    bin_expr = (
        F.when(q == 0, rank0 + 1)  # fewer rows than bins: row i → bin i+1
        .when(rank0 < r * (q + 1), F.floor(rank0 / (q + 1)) + 1)
        .otherwise(r + F.floor((rank0 - r * (q + 1)) / q) + 1)
    ).cast("int")
    return ranked.withColumn(bin_col, bin_expr).drop("_rank0", "_total")


def relative_to_next(output_table: DataFrame, analytical: DataFrame) -> DataFrame:
    """DISTINCT (instance, query, table, relative position) for selects in
    analytical tables (`Dashboard_Historical_Final.py:438-453`)."""
    keys = analytical.select(F.col("table_id").alias("read_table_id")).distinct()
    num = epoch_ms(F.col("arrival_timestamp"), F.col("last_write_table_insert"))
    den = epoch_ms(F.col("next_write_table_insert"), F.col("last_write_table_insert"))
    return (
        output_table.filter(F.col("query_type") == "select")
        .join(F.broadcast(keys), on="read_table_id", how="left_semi")
        .select(
            "instance_id",
            "query_id",
            "read_table_id",
            (num / den).alias("relative_to_next"),
        )
        .dropDuplicates()
    )


# Below this many rel rows the one-reducer window NTILE beats the two-job
# distributed plan (fixed job overhead dominates); above it the single
# sort task becomes the bottleneck.  Rough local[32] measurement — the
# exact value matters little because both strategies are bit-identical.
DECILE_AUTO_CROSSOVER_ROWS = 10_000_000


def decile_histogram(
    rel: DataFrame, n_bins: int = 10, distributed: bool | str = True
) -> DataFrame:
    """NTILE(n) over global ORDER BY relative_to_next → counts per
    (instance_id, read_table_id, bin) (`Dashboard_Historical_Final.py:455-463`).

    Tiebreakers (query ids) make the global ordering total, so bucket
    assignment is deterministic and oracle-reproducible.

    Strategy: the default (``distributed=True``) is ``distributed_ntile`` —
    no single-partition stage anywhere, the plan that survives a 100×
    scale-up, and the one the headline bench runs.  ``distributed=False``
    is the plain global-window NTILE — one reducer sorts the (already
    heavily reduced) rel rows, which wins below the ~10M-row crossover;
    both strategies are bit-identical (same oracle, asserted in tests), so
    small-data callers may pin it as a measured optimization.
    ``distributed="auto"`` spends one count job on the (already reduced)
    rel frame and picks the strategy by ``DECILE_AUTO_CROSSOVER_ROWS`` —
    the stats-driven selection the reference's fixed SQL can't make.
    """
    if distributed == "auto":
        # the count and the chosen strategy share one scan; released via
        # persist.release_persisted() in long-lived sessions (safe: either
        # strategy recomputes rel to the same rows)
        rel = track_persist(rel)
        distributed = rel.count() >= DECILE_AUTO_CROSSOVER_ROWS
    if distributed:
        binned = distributed_ntile(
            rel,
            ["relative_to_next", "instance_id", "query_id", "read_table_id"],
            n_bins,
        )
    else:
        w = Window.orderBy(
            "relative_to_next", "instance_id", "query_id", "read_table_id"
        )
        binned = rel.withColumn("bin", F.ntile(n_bins).over(w))
    return (
        binned.groupBy("instance_id", "read_table_id", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("instance_id", "read_table_id", "bin")
    )


def decile_by_percent_rank(rel: DataFrame, n_bins: int = 10) -> DataFrame:
    """Percent-rank decile binning, computed distributed.

    Bucket = floor(percent_rank · n) + 1 clipped to n, with
    percent_rank = rank0 / (N − 1) over the global total order — the exact
    arithmetic SQL ``percent_rank()`` defines, but via ``with_global_rank``
    (range partition + broadcast offsets) instead of an empty-partition
    window, which Spark would plan as Exchange SinglePartition.  Differs
    from NTILE at bucket boundaries when group sizes don't divide evenly —
    a different (equally standard) quantile convention, value-checked by
    its own percent_rank oracle (``ri_decile_percentrank``)."""
    ranked = with_global_rank(
        rel, ["relative_to_next", "instance_id", "query_id", "read_table_id"]
    )
    # single-row edge: SQL percent_rank defines 0 when N == 1 (0/0 → NaN here)
    pct = F.when(F.col("_total") == 1, F.lit(0.0)).otherwise(
        F.col("_rank0") / (F.col("_total") - 1)
    )
    bucket = F.least(F.floor(pct * n_bins) + 1, F.lit(n_bins))
    return (
        ranked.withColumn("bin", bucket.cast("int"))
        .groupBy("instance_id", "read_table_id", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("instance_id", "read_table_id", "bin")
    )
