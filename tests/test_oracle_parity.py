"""The primary gate: every registered query with an oracle must hash-match
DuckDB on the driver tables — the same check the driver runs at sf=0.01."""

from __future__ import annotations

import pytest

from data_engineering_project_utn_spark.plans import all_queries
from tests.oracle_harness import compare

QUERIES = all_queries()
WITH_ORACLE = sorted(n for n, q in QUERIES.items() if q.oracle is not None)
ROWS_ONLY = sorted(n for n, q in QUERIES.items() if q.oracle is None)


@pytest.mark.parametrize("name", WITH_ORACLE)
def test_oracle_parity(spark, sf_dir, name):
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    result = compare(df, q.oracle, sf_dir)
    assert result["cols_match"], f"{name}: columns {result['spark_cols']} != {result['oracle_cols']}"
    assert result["rows_match"], f"{name}: rows {result['spark_rows']} != {result['oracle_rows']}"
    assert result["values_match"], f"{name}: value mismatch, first diff {result['first_diff']}"


@pytest.mark.parametrize("name", ROWS_ONLY or ["<all queries have oracles>"])
def test_rows_only_runs(spark, sf_dir, name):
    if name == "<all queries have oracles>":
        assert ROWS_ONLY == []
        return
    q = QUERIES[name]
    df = q.build(spark, sf_dir)
    assert df.count() >= 0
    assert len(df.schema.fields) > 0


def test_entry_smoke(spark):
    import __spark_entry__ as se

    df = se.entry(spark)
    assert df.count() > 0
    keys = set(se.queries())
    oracle_keys = set(se.oracle_sql())
    assert oracle_keys <= keys


def test_plog2_cross_engine_parity_and_bound(spark):
    """functions/scalar.plog2_sql ≡ plans/llm_shared._plog2_sql on both
    engines for a sweep of magnitudes, and the piecewise-linear value
    underestimates true log₂ by < 0.09 bits (chord under a concave
    curve), exact at powers of two."""
    import math

    import duckdb

    from data_engineering_project_utn_spark.functions.scalar import plog2_sql
    from data_engineering_project_utn_spark.plans.llm_shared import _plog2_sql

    vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 100, 1023, 1024, 1025, 999999, 2**40, 3**20]
    srow = spark.sql(
        "SELECT " + ", ".join(f"{plog2_sql(str(v))} AS v{i}" for i, v in enumerate(vals))
    ).collect()[0]
    drow = duckdb.connect().execute(
        "SELECT " + ", ".join(f"{_plog2_sql(str(v))} AS v{i}" for i, v in enumerate(vals))
    ).fetchone()
    for i, v in enumerate(vals):
        assert srow[i] == drow[i], (v, srow[i], drow[i])
        err = srow[i] / 65536 - math.log2(v)
        assert -0.09 < err <= 0, (v, err)
        if v & (v - 1) == 0:
            assert err == 0, v
