"""Workload classification + ingestion-freshness analytics.

Reproduces the reference's ``tables_workload_count`` view
(`Real Final APP/Dashboard_Historical_Final.py:66-99`), the >80 %-select
``analytical_tables`` classifier and the per-(instance, table) freshness
averages (`:338-412`), and the HAVING freshness-alarm variant
(`Dashboard/update_tables.py:242-264`).

Scale notes: both sides of the FULL OUTER JOIN are already aggregated
(small — one row per (instance, table)), so the join is cheap and
broadcast-able when one workload class is rare; the freshness aggregation
shuffles once on (instance_id, read_table_id).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.functions.scalar import davg, safe_div


def tables_workload_count(output_table: DataFrame) -> DataFrame:
    """select_count vs transform_count per table.

    Faithful to the reference view: selects counted by read_table_id,
    update/delete counted by write_table_id, FULL OUTER JOIN on the table id
    *and instance* with COALESCE'd keys.  (The reference joins on table_id
    only — `Dashboard_Historical_Final.py:96-97` — which cross-multiplies
    instances; we join on both keys, the stated GROUP BY intent.  Divergence
    documented per SURVEY.md §7.2.)
    Null counts mean "absent from that side", never 0 (FIXTURES.md F4).
    """
    selects = (
        output_table.filter(F.col("query_type") == "select")
        .groupBy("instance_id", F.col("read_table_id").alias("table_id"))
        .agg(F.count(F.lit(1)).alias("select_count"))
    )
    transforms = (
        output_table.filter(F.col("query_type").isin("update", "delete"))
        .groupBy("instance_id", F.col("write_table_id").alias("table_id"))
        .agg(F.count(F.lit(1)).alias("transform_count"))
    )
    return (
        selects.alias("s")
        .join(transforms.alias("t"), on=["instance_id", "table_id"], how="full_outer")
        .select(
            "instance_id",
            "table_id",
            F.col("transform_count"),
            F.col("select_count"),
        )
    )


def analytical_tables(workload: DataFrame, threshold: float = 0.80) -> DataFrame:
    """Tables whose select share exceeds ``threshold``
    (`Dashboard_Historical_Final.py:354-366`)."""
    share = safe_div(
        F.col("select_count").cast("double"),
        (F.coalesce(F.col("transform_count"), F.lit(0)) + F.col("select_count")).cast(
            "double"
        ),
    )
    return workload.withColumn("percentage_select_queries", share).filter(
        F.col("percentage_select_queries") > threshold
    )


def analytical_table_keys(
    output_table: DataFrame, threshold: float = 0.80
) -> DataFrame:
    """The analytical-table id set (column ``table_id``) in ONE
    conditional aggregation instead of ``tables_workload_count``'s
    two-aggregate FULL OUTER JOIN — for consumers that only need the
    keys (the decile family semi-joins on table_id alone).  Equivalent
    set: the outer join's NULL counts and the conditional sums' zeros
    land on the same side of the share > threshold cut (NULL select
    share filters false, as does 0; absent transforms COALESCE to 0 in
    the anchor and sum to 0 here), verified by the shared decile
    oracles.  One shuffle on (instance, table) and a model-size
    result."""
    key = F.when(
        F.col("query_type") == "select", F.col("read_table_id")
    ).otherwise(F.col("write_table_id"))
    wl = (
        output_table.filter(
            F.col("query_type").isin("select", "update", "delete")
        )
        .groupBy("instance_id", key.alias("table_id"))
        .agg(
            F.sum(
                F.when(F.col("query_type") == "select", 1).otherwise(0)
            ).alias("select_count"),
            F.sum(
                F.when(F.col("query_type") != "select", 1).otherwise(0)
            ).alias("transform_count"),
        )
    )
    share = F.col("select_count").cast("double") / (
        F.col("transform_count") + F.col("select_count")
    ).cast("double")
    return wl.filter(share > threshold).select("table_id")


def ingestion_freshness(
    output_table: DataFrame, analytical: DataFrame, limit: int = 12
) -> DataFrame:
    """Average time since/to ingestion for analytical tables
    (`Dashboard_Historical_Final.py:359-371`).

    The semi-join is on the (small) aggregated classifier output —
    broadcast-able; the aggregation shuffles on (instance_id, read_table_id).
    """
    keys = analytical.select(F.col("table_id").alias("read_table_id")).distinct()
    return (
        output_table.filter(F.col("query_type") == "select")
        .join(F.broadcast(keys), on="read_table_id", how="left_semi")
        .groupBy("instance_id", "read_table_id")
        .agg(
            (davg("time_since_last_ingest_ms", scale=6) / 1000.0).alias(
                "average_time_since_last_ingest_s"
            ),
            (davg("time_to_next_ingest_ms", scale=6) / 1000.0).alias(
                "average_time_to_next_ingest_s"
            ),
        )
        .orderBy("read_table_id", "instance_id")
        .limit(limit)
    )


def freshness_alarm(output_table: DataFrame) -> DataFrame:
    """Tables whose average staleness exceeds their average lead time —
    the HAVING variant (`Dashboard/update_tables.py:242-264`)."""
    return (
        output_table.filter(F.col("query_type") == "select")
        .groupBy("instance_id", "read_table_id")
        .agg(
            davg("time_since_last_ingest_ms", scale=6).alias("avg_since_ms"),
            davg("time_to_next_ingest_ms", scale=6).alias("avg_to_next_ms"),
        )
        .filter(F.col("avg_since_ms") > F.col("avg_to_next_ms"))
    )
