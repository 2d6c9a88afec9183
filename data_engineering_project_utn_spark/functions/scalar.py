"""Scalar expression helpers (SURVEY.md §2.7).

Everything here is a *native Spark Column expression* — no Python UDFs —
so it stays inside whole-stage codegen on the JVM hot path.  The reference
implements these as Python lambdas or DuckDB SQL snippets; each helper's
docstring cites the reference site it reproduces.

Deterministic-FP aggregates
---------------------------
``dsum`` / ``davg`` route floating-point sums through exact DECIMAL
arithmetic and cast the final value back to double.  Summation of doubles is
order-dependent (and Spark's partial aggregation order is nondeterministic
across partitionings), so a plain ``sum(double)`` can differ in the last ulp
between runs and engines.  Decimal accumulation is exact, making results
bit-identical to a DuckDB oracle computing the same decimal sum — this is
what lets every aggregate query hash-match the driver's oracle at any
parallelism, 32 threads or 1000 executors.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dsum(col: Column | str, scale: int = 2, precision: int = 30) -> Column:
    """Order-independent double sum via exact decimal accumulation."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")


def davg(col: Column | str, scale: int = 4, precision: int = 30) -> Column:
    """Order-independent double average: exact decimal sum / count."""
    c = F.col(col) if isinstance(col, str) else col
    total = F.sum(c.cast(f"decimal({precision},{scale})")).cast("double")
    return total / F.count(c)


def unix_us(ts: Column | str) -> Column:
    """Microseconds since epoch; accepts TIMESTAMP or TIMESTAMP_NTZ (the
    session TZ is pinned to UTC, so the NTZ→TZ cast is value-preserving)."""
    c = F.col(ts) if isinstance(ts, str) else ts
    return F.unix_micros(c.cast("timestamp"))


def epoch_ms(ts_end: Column, ts_start: Column) -> Column:
    """Interval→milliseconds: DuckDB ``EPOCH_MS(ts2 - ts1)``
    (`Real Final APP/Dashboard_Historical_Final.py:281-282,307-308`)."""
    return (unix_us(ts_end) - unix_us(ts_start)) / F.lit(1000.0)


def mmss(duration_ms: Column | str) -> Column:
    """Format milliseconds as ``m:ss``.

    Reference has two implementations: SQL FLOOR/LPAD concat
    (`Kafka/ddb_wrappers.py:354-361`) and a Python lambda
    (`Real Final APP/Dashboard_Live_Final.py:352-354`).
    """
    c = F.col(duration_ms) if isinstance(duration_ms, str) else duration_ms
    mins = F.floor(c / 60000).cast("long")
    secs = F.floor((c % 60000) / 1000).cast("long")
    return F.concat(mins.cast("string"), F.lit(":"), F.lpad(secs.cast("string"), 2, "0"))


def safe_div(num: Column, den: Column) -> Column:
    """``num / NULLIF(den, 0)`` (`Dashboard_Historical_Final.py:356,442-444`)."""
    return num / F.nullif(den, F.lit(0))


def pct_ratio(part: Column, whole: Column) -> Column:
    """Percentage with NULLIF(0) guard, as in the reference's select-share
    classifier (`Dashboard_Historical_Final.py:354-357`)."""
    return safe_div(part * F.lit(100.0), whole)


def categorize_cluster(cluster_count: Column | str) -> Column:
    """Instance category from distinct cluster count: ≤2 Local, ≤5 Regional,
    else Global (`live_updates_duckdb.py:128-136` — a Python row-UDF there;
    a codegen'd CASE WHEN here)."""
    c = F.col(cluster_count) if isinstance(cluster_count, str) else cluster_count
    return (
        F.when(c <= 2, F.lit("Local"))
        .when(c <= 5, F.lit("Regional"))
        .otherwise(F.lit("Global"))
    )


def bucket_duration(duration_ms: Column | str) -> Column:
    """Execution-time bucket [0,100) Short / [100,1000) Medium / ≥1000 Long —
    the reference's ``pd.cut`` path (`Dashboard/Dashboard_updated.py:181-184`)."""
    c = F.col(duration_ms) if isinstance(duration_ms, str) else duration_ms
    return (
        F.when(c < 100, F.lit("Short"))
        .when(c < 1000, F.lit("Medium"))
        .otherwise(F.lit("Long"))
    )


def plog2_sql(xs: str, frac_bits: int = 16) -> str:
    """Spark-SQL expression string: piecewise-linear fixed-point log₂ of
    the positive-BIGINT expression ``xs``, at ``frac_bits`` fractional
    bits — e·2^K + (x·2^K div 2^e) − 2^K with e = ⌊log₂ x⌋ from the
    integer bit length.  Exponent exact, mantissa linearly interpolated
    (a chord under the concave log₂: underestimates by < 0.09 bits,
    monotone, exact at powers of two), pure integer
    arithmetic (bit length, shift, truncating div) so Spark and the
    DuckDB oracle (``plans/llm_shared._plog2_sql`` — same formula over
    format('{:b}') and //) produce the identical BIGINT.  The
    engine-reproducible replacement for ln()/log2() wherever a gate
    needs SUB-bit log resolution (whole-bit floor-log₂ collapses
    likelihood ratios like 3/4 vs 1/2 into one bucket).  Caller
    contract: x ≥ 1 and x·2^K < 2⁶³ (x ≤ ~2⁴⁶ at K = 16).  Returned as
    a string (not a Column) so call sites can inline it into F.expr
    with ``xs`` itself an arithmetic subexpression."""
    k = 1 << frac_bits
    e_int = f"CAST(length(bin({xs})) - 1 AS INT)"
    return (
        f"(CAST(length(bin({xs})) - 1 AS BIGINT) * {k} "
        f"+ (({xs}) * CAST({k} AS BIGINT)) div shiftleft(CAST(1 AS BIGINT), {e_int}) "
        f"- {k})"
    )
