"""Ingestion-interval / data-freshness core — the historical plane's heart.

Reference semantics (two variants, which disagree — SURVEY.md §7.2):

* J1: self left-join to *all* later events + DISTINCT
  (`Real Final APP/Dashboard_Historical_Final.py:216-238`) — fans out one row
  per later ingestion, O(n²) per key.
* J2: correlated MIN subquery = *next* ingestion
  (`Dashboard/update_tables.py:55-78`, comments :53-54 state this as intent).

We build to the J2/as-of intent with ``lead()`` over
``Window.partitionBy(instance_id, write_table_id).orderBy(arrival_timestamp)``
— one shuffle on the partition keys, no self-join, no fan-out, linear work.
At 100 TB this is the difference between a sort within each (instance, table)
partition and a quadratic blow-up; with AQE skew-join handling the hot
instance keys split automatically.

``output_table`` reproduces
`Dashboard_Historical_Final.py:241-312`: annotate every query with its
bracketing ingestion interval via an interval/theta join whose equality arms
(instance_id + table_id) keep it a hash join with a range post-filter —
verified via ``.explain()`` (SortMergeJoin/ShuffledHashJoin on the equi-keys,
never BroadcastNestedLoopJoin).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.functions.scalar import epoch_ms
from data_engineering_project_utn_spark.schema import INGESTION_QUERY_TYPES


def ingestion_intervals(
    flat: DataFrame,
    ingestion_types: tuple[str, ...] = INGESTION_QUERY_TYPES,
) -> DataFrame:
    """Next-ingestion interval per (instance_id, write_table_id).

    Input: FLATTENED_SCHEMA rows.  Output columns: instance_id, query_id,
    write_table_id, current_timestamp, next_timestamp — matching the
    reference DDL (`Dashboard_Historical_Final.py:41-48`).

    The flattened input carries one row per exploded read_table_id, so an
    ingestion *event* appears multiple times; intervals are computed over
    distinct events (the reference's SELECT DISTINCT does the same dedup).
    """
    # one exchange, not two: partitioning on the WINDOW key first lets the
    # dedup aggregate ride it (HashPartitioning on a subset of the dedup
    # keys satisfies its ClusteredDistribution — duplicates of a group
    # share (instance, table), so they co-locate), and the lead() window
    # then reuses the same partitioning.  Without this, dropDuplicates
    # plans its own full-key shuffle below the window's shuffle.
    events = (
        flat.filter(F.col("query_type").isin(*ingestion_types))
        .select("instance_id", "query_id", "write_table_id", "arrival_timestamp")
        .repartition("instance_id", "write_table_id")
        .dropDuplicates(["instance_id", "query_id", "write_table_id", "arrival_timestamp"])
    )
    w = Window.partitionBy("instance_id", "write_table_id").orderBy(
        "arrival_timestamp", "query_id"
    )
    return events.select(
        "instance_id",
        "query_id",
        "write_table_id",
        F.col("arrival_timestamp").alias("current_timestamp"),
        F.lead("arrival_timestamp").over(w).alias("next_timestamp"),
    )


def ingestion_intervals_salted(
    flat: DataFrame,
    ingestion_types: tuple[str, ...] = INGESTION_QUERY_TYPES,
    salt_interval: str = "1 day",
) -> DataFrame:
    """Skew-safe variant of ``ingestion_intervals`` for hot keys.

    A (instance, table) key with billions of ingestions serializes in one
    task under the plain window.  Salting by a time bucket splits the key:
    the window runs per (instance, table, bucket) — parallel across
    buckets — and the one row per bucket whose ``lead`` is NULL (the
    bucket's last event) is repaired from a second, *tiny* window over the
    per-bucket minima (one row per non-empty bucket, not per event).

    Exactly equivalent to the unsalted operator (tested), because
    intervals never cross more than one bucket boundary chain: the last
    event of bucket b's next ingestion is the first event of the next
    non-empty bucket.
    """
    events = (
        flat.filter(F.col("query_type").isin(*ingestion_types))
        .select("instance_id", "query_id", "write_table_id", "arrival_timestamp")
        .dropDuplicates(["instance_id", "query_id", "write_table_id", "arrival_timestamp"])
        .withColumn(
            "_bucket", F.window(F.col("arrival_timestamp"), salt_interval)["start"]
        )
    )
    w = Window.partitionBy("instance_id", "write_table_id", "_bucket").orderBy(
        "arrival_timestamp", "query_id"
    )
    within = events.select(
        "instance_id",
        "query_id",
        "write_table_id",
        "_bucket",
        F.col("arrival_timestamp").alias("current_timestamp"),
        F.lead("arrival_timestamp").over(w).alias("next_timestamp"),
    )
    # boundary repair: first event per (key, bucket) → lead over buckets
    wb = Window.partitionBy("instance_id", "write_table_id").orderBy("_bucket")
    bucket_firsts = (
        events.groupBy("instance_id", "write_table_id", "_bucket")
        .agg(F.min(F.struct("arrival_timestamp", "query_id")).alias("first_ev"))
        .select(
            "instance_id",
            "write_table_id",
            "_bucket",
            F.lead("first_ev.arrival_timestamp").over(wb).alias("_next_bucket_first"),
        )
    )
    return (
        within.join(
            bucket_firsts, ["instance_id", "write_table_id", "_bucket"], "left"
        )
        .select(
            "instance_id",
            "query_id",
            "write_table_id",
            "current_timestamp",
            F.coalesce("next_timestamp", "_next_bucket_first").alias("next_timestamp"),
        )
    )


def output_table(flat: DataFrame, intervals: DataFrame) -> DataFrame:
    """Annotate queries with bracketing ingestion windows + freshness deltas.

    Reproduces `Dashboard_Historical_Final.py:241-312` (with the as-of
    interval semantics of `Dashboard/update_tables.py:103-166`):

    * non-ingestion queries pick up the ingestion interval that brackets
      their arrival, matching on read_table_id for selects and
      write_table_id otherwise;
    * ingestion queries are appended back untouched (UNION ALL add-back,
      time_since_last = 0 relative to their own interval).

    Scale design — **as-of merge, not a join**.  Lead-based intervals are
    non-overlapping per (instance, table), so "the bracketing interval" is
    simply the last ingestion at-or-before each query's timestamp.  A
    bracket equi-join on (instance, table) + time filter materializes
    |queries_k|×|intervals_k| rows per key (quadratic — ~100 M intermediate
    rows already at sf0.1); instead we union boundary and query rows and
    carry the latest interval forward with one window pass: one shuffle,
    one in-partition sort, linear output.  Boundary rows sort before query
    rows at equal timestamps (kind 0 < 1), so a query exactly at an
    ingestion timestamp lands in the *newer* interval (the reference's
    BETWEEN would duplicate such a row into both intervals; measure-zero
    tie divergence, documented per SURVEY.md §7.2).
    """
    iv_struct_type = "struct<l:timestamp,n:timestamp>"

    non_ing = flat.filter(~F.col("query_type").isin(*INGESTION_QUERY_TYPES))
    match_table = F.when(
        F.col("query_type") == "select", F.col("read_table_id")
    ).otherwise(F.col("write_table_id"))

    q = non_ing.select(
        "instance_id",
        match_table.alias("match_table"),
        F.col("arrival_timestamp").alias("ts"),
        F.lit(1).alias("kind"),
        "query_id",
        "query_type",
        "write_table_id",
        "read_table_id",
        F.lit(None).cast(iv_struct_type).alias("iv"),
    )
    b = intervals.select(
        "instance_id",
        F.col("write_table_id").alias("match_table"),
        F.col("current_timestamp").alias("ts"),
        F.lit(0).alias("kind"),
        F.lit(None).cast("long").alias("query_id"),
        F.lit(None).cast("string").alias("query_type"),
        F.lit(None).cast("long").alias("write_table_id"),
        F.lit(None).cast("long").alias("read_table_id"),
        F.struct(
            F.col("current_timestamp").alias("l"), F.col("next_timestamp").alias("n")
        ).alias("iv"),
    )

    w = (
        Window.partitionBy("instance_id", "match_table")
        .orderBy("ts", "kind")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    ann = q.unionByName(b).withColumn("biv", F.last("iv", ignorenulls=True).over(w))

    # Dedup (the reference's replay-absorbing DISTINCT) *before* projecting
    # match_table away: the window's HashPartitioning(instance_id,
    # match_table) already clusters every duplicate group, so Catalyst
    # needs no extra exchange here — dropping match_table first would force
    # a second full shuffle (measured 1.6× on the whole operator).
    # match_table is functionally determined by (query_type, read/write), so
    # the dedup key set is equivalent to the reference's DISTINCT.
    matched = (
        ann.filter((F.col("kind") == 1) & F.col("biv").isNotNull())
        .dropDuplicates(
            ["instance_id", "match_table", "ts", "query_id", "query_type",
             "write_table_id", "read_table_id", "biv"]
        )
        .select(
            "instance_id",
            "query_id",
            "query_type",
            "write_table_id",
            "read_table_id",
            F.col("ts").alias("arrival_timestamp"),
            F.col("biv.l").alias("last_write_table_insert"),
            F.col("biv.n").alias("next_write_table_insert"),
        )
    )

    ing = (
        flat.filter(F.col("query_type").isin(*INGESTION_QUERY_TYPES))
        .join(
            intervals.select(
                "instance_id",
                "query_id",
                "write_table_id",
                F.col("current_timestamp").alias("last_write_table_insert"),
                F.col("next_timestamp").alias("next_write_table_insert"),
            ),
            on=["instance_id", "query_id", "write_table_id"],
            how="left",
        )
        .select(
            "instance_id",
            "query_id",
            "query_type",
            "write_table_id",
            "read_table_id",
            "arrival_timestamp",
            "last_write_table_insert",
            "next_write_table_insert",
        )
    )

    out = matched.unionByName(ing)
    return out.select(
        "*",
        epoch_ms(F.col("arrival_timestamp"), F.col("last_write_table_insert")).alias(
            "time_since_last_ingest_ms"
        ),
        epoch_ms(F.col("next_write_table_insert"), F.col("arrival_timestamp")).alias(
            "time_to_next_ingest_ms"
        ),
    )
