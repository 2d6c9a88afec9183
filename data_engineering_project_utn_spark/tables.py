"""Loaders for the driver-provided parquet tables (TESTDATA.md).

All loads are plain ``spark.read.parquet`` — schema lives in the files,
Catalyst handles column pruning / predicate pushdown into the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def _ensure_session_confs(spark: SparkSession) -> None:
    """Engine contract confs, applied even when the caller (e.g. the
    driver's verify harness) built the session without session.py:

    * nanosAsLong — the driver testdata stores ns timestamps, which Spark
      otherwise refuses to scan (converted to µs below, matching DuckDB).
    * UTC session TZ — timestamp values are defined as naive-UTC
      (SURVEY.md §7.2); both runtime-settable SQL confs.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    _ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{name}.parquet")
    # Nanosecond-timestamp columns surface as long (see session.py conf);
    # truncate ns→µs exactly like DuckDB does when reading the same file.
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
    # µs isAdjustedToUTC=false columns surface as TIMESTAMP_NTZ (driver
    # testdata switched ns→µs-NTZ in round 4); normalize to TIMESTAMP —
    # value-identical under the pinned UTC session TZ and exactly DuckDB's
    # naive read — so unix_micros()/unix_millis() downstream keep working.
    for field in df.schema.fields:
        if isinstance(field.dataType, T.TimestampNTZType):
            df = df.withColumn(field.name, F.col(field.name).cast("timestamp"))
    return df


def load_all(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES}


def register_views(spark: SparkSession, sf_dir: str) -> None:
    """Register every driver table as a temp view for spark.sql queries."""
    for name in TABLE_NAMES:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
