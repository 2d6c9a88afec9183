"""Explode CSV-encoded table-id lists → one row per referenced table.

Reference: ``str.split(",")`` + ``DataFrame.explode`` + ``to_numeric
(errors='coerce')`` + nullable Int64
(`Real Final APP/Dashboard_Live_Final.py:680-689` and the identical
historical-plane copy `Dashboard_Historical_Final.py:683-692`).

Spark-first: ``explode_outer(split(...))`` + ``try_cast`` — stays in
whole-stage codegen, preserves rows with no ids (pandas ``explode`` keeps a
NaN row for empty input, hence ``explode_outer``), bad tokens → null exactly
like ``errors='coerce'``.

Scale note: explode is a narrow transformation (no shuffle); output row count
is bounded by total id occurrences, and downstream aggregations shuffle on
(instance_id, table_id) which is the natural key for everything in the
historical plane.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.schema import FLATTENED_COLUMNS


def parse_id_list(col: Column | str) -> Column:
    """CSV string → array<long> (bad tokens → null elements)."""
    c = F.col(col) if isinstance(col, str) else col
    no_brackets = F.regexp_replace(c.cast("string"), r"[\[\]\s]", "")
    return F.transform(
        F.split(no_brackets, ","), lambda x: x.try_cast("long")
    )


def flatten_table_ids(
    df: DataFrame,
    read_col: str = "read_table_ids",
    write_col: str = "write_table_ids",
) -> DataFrame:
    """Producer's "flattened" topic: one row per read_table_id, single
    write_table_id (first id of the write list, as the reference's producer
    emits single-id write lists — `producer_Final.py:237-287`)."""
    keep = [c for c in FLATTENED_COLUMNS if c not in (read_col, write_col) and c in df.columns]
    return df.select(
        *keep,
        F.element_at(parse_id_list(write_col), 1).alias("write_table_id"),
        F.explode_outer(parse_id_list(read_col)).alias("read_table_id"),
    )
