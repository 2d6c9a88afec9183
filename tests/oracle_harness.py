"""Local clone of the driver's DuckDB-oracle comparison.

Compares a Spark query result against its DuckDB oracle on the same parquet
tables: row count, column names, and an order-insensitive value hash
(columns sorted by name, rows sorted by their string representation).
Mirrors the contract described in ``__spark_entry__.py``.
"""

from __future__ import annotations

import math
from typing import Any

import duckdb
import pandas as pd

from data_engineering_project_utn_spark.tables import TABLE_NAMES


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for name in TABLE_NAMES:
        con.execute(
            f"CREATE OR REPLACE VIEW {name} AS SELECT * FROM '{sf_dir}/{name}.parquet'"
        )
    return con


def _canon_cell(v: Any) -> str:
    if v is None or (isinstance(v, float) and math.isnan(v)):
        return "∅"
    if isinstance(v, float):
        if math.isinf(v):
            return "inf" if v > 0 else "-inf"
        return repr(v)  # full precision — bit-exactness is the contract
    if isinstance(v, pd.Timestamp):
        return v.isoformat()
    return str(v)


def canonicalize(df: pd.DataFrame) -> list[tuple[str, ...]]:
    cols = sorted(df.columns)
    rows = [tuple(_canon_cell(v) for v in row) for row in df[cols].itertuples(index=False)]
    return sorted(rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> dict:
    spark_pdf = spark_df.toPandas()
    con = duckdb_con(sf_dir)
    oracle_pdf = con.execute(oracle_sql).df()

    result = {
        "spark_rows": len(spark_pdf),
        "oracle_rows": len(oracle_pdf),
        "spark_cols": sorted(spark_pdf.columns),
        "oracle_cols": sorted(oracle_pdf.columns),
        "rows_match": len(spark_pdf) == len(oracle_pdf),
        "cols_match": sorted(spark_pdf.columns) == sorted(oracle_pdf.columns),
        "values_match": False,
        "first_diff": None,
    }
    if result["rows_match"] and result["cols_match"]:
        s_rows = canonicalize(spark_pdf)
        o_rows = canonicalize(oracle_pdf)
        result["values_match"] = s_rows == o_rows
        if not result["values_match"]:
            for i, (a, b) in enumerate(zip(s_rows, o_rows)):
                if a != b:
                    result["first_diff"] = {"row": i, "spark": a, "oracle": b}
                    break
    return result
