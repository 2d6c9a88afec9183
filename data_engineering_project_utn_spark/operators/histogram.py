"""Relative-ingestion-position decile histogram.

Reproduces `Real Final APP/Dashboard_Historical_Final.py:428-528`:
for selects on analytical tables, the position of each query inside its
ingestion interval (0 = just after ingest, 1 = just before next), binned
into NTILE(10) deciles over a *global* ordering, counted per
(instance_id, read_table_id, bin).

Scale note (SURVEY.md §7.2): a global NTILE is a single-partition window.
``ntile_global`` keeps the faithful semantics; at 100 TB use
``decile_by_percent_rank`` — rank via a range-partitioned global sort
(Spark's ``orderBy`` does a distributed range sort) and derive the bucket
arithmetically, avoiding the one-reducer window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.functions.scalar import epoch_ms


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


def decile_histogram(rel: DataFrame, n_bins: int = 10) -> DataFrame:
    """NTILE(n) over global ORDER BY relative_to_next → counts per
    (instance_id, read_table_id, bin) (`Dashboard_Historical_Final.py:455-463`).

    Tiebreakers (query ids) make the global ordering total, so bucket
    assignment is deterministic and oracle-reproducible.
    """
    w = Window.orderBy("relative_to_next", "instance_id", "query_id", "read_table_id")
    return (
        rel.withColumn("bin", F.ntile(n_bins).over(w))
        .groupBy("instance_id", "read_table_id", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("instance_id", "read_table_id", "bin")
    )


def decile_by_percent_rank(rel: DataFrame, n_bins: int = 10) -> DataFrame:
    """Scale-path decile binning: distributed range sort + arithmetic bucket.

    ``percent_rank`` still uses a window but the heavy lifting (global sort)
    is a range-partitioned exchange; bucket = floor(pct * n) + 1 clipped to n.
    Matches NTILE exactly when group sizes divide evenly; at histogram scale
    the boundary drift is immaterial (documented divergence for the 100 TB
    path — the faithful ``decile_histogram`` remains the oracle-checked one).
    """
    w = Window.orderBy("relative_to_next", "instance_id", "query_id", "read_table_id")
    pct = F.percent_rank().over(w)
    bucket = F.least(F.floor(pct * n_bins) + 1, F.lit(n_bins))
    return (
        rel.withColumn("bin", bucket.cast("int"))
        .groupBy("instance_id", "read_table_id", "bin")
        .agg(F.count(F.lit(1)).alias("count"))
        .orderBy("instance_id", "read_table_id", "bin")
    )
