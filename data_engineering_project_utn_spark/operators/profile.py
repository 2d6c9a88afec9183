"""One-pass table profiling — the data-quality summary every ingest
pipeline publishes (row counts, null rates, cardinalities, extremes).

The reference eyeballs this via ``check_duckdb_table()`` previews
(`Real Final APP/Dashboard_Historical_Final.py:707-755`); here it's a
single aggregation job built by schema introspection: all per-column
aggregates evaluate in one pass over the data (Spark plans the multiple
DISTINCT aggregates via one Expand — rows multiply by the distinct-column
count map-side, but the scan still happens once and nothing shuffles but
partial aggregates), then one ``stack`` unpivots the single result row to
one row per column.

At 100 TB swap ``exact_distinct=False`` to use ``approx_count_distinct``
(±~2 % HLL) — multiple exact DISTINCTs over a petabyte scan is the one
part of this that gets expensive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Types whose min/max cast to string identically across engines (integer
# text is canonical; ASCII string ordering is binary in both).  Doubles and
# timestamps render differently engine-to-engine, so their extremes are
# omitted rather than risk a formatting-dependent "value".
_EXTREME_TYPES = ("bigint", "int", "smallint", "tinyint", "string")


def profile_columns(
    df: DataFrame,
    columns: list[str] | None = None,
    exact_distinct: bool = True,
) -> DataFrame:
    """Per-column profile: n_rows, n_nonnull, n_null, n_distinct, and (for
    integer/string columns) min/max as strings.  One aggregation job.
    Output: one row per column, ordered by column name."""
    dtypes = dict(df.dtypes)
    cols = columns if columns is not None else list(dtypes)
    distinct = (
        (lambda c: F.countDistinct(F.col(c)))
        if exact_distinct
        else (lambda c: F.approx_count_distinct(F.col(c)))
    )
    aggs = [F.count(F.lit(1)).alias("__rows")]
    for c in cols:
        aggs.append(F.count(F.col(c)).alias(f"{c}__nonnull"))
        aggs.append(distinct(c).alias(f"{c}__distinct"))
        if dtypes[c] in _EXTREME_TYPES:
            aggs.append(F.min(F.col(c)).cast("string").alias(f"{c}__min"))
            aggs.append(F.max(F.col(c)).cast("string").alias(f"{c}__max"))
        else:
            aggs.append(F.lit(None).cast("string").alias(f"{c}__min"))
            aggs.append(F.lit(None).cast("string").alias(f"{c}__max"))
    row = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', `{c}__nonnull`, `{c}__distinct`, `{c}__min`, `{c}__max`"
        for c in cols
    )
    return (
        row.selectExpr(
            "__rows",
            f"stack({len(cols)}, {stack_args}) AS "
            "(column, n_nonnull, n_distinct, min_value, max_value)",
        )
        .select(
            "column",
            F.col("__rows").alias("n_rows"),
            "n_nonnull",
            (F.col("__rows") - F.col("n_nonnull")).alias("n_null"),
            "n_distinct",
            "min_value",
            "max_value",
        )
        .orderBy("column")
    )


def value_outliers(
    df: DataFrame,
    group_col: str,
    value_col: str,
    id_col: str,
    z_thresh: float = 3.0,
    top_n: int = 20,
    scale: float = 10000.0,
) -> DataFrame:
    """Grouped z-score anomaly detection: per-group mean/std from exact
    fixed-point sums (values floored to a 1/``scale`` grid — 1e-4 at the
    default ``scale=10000`` — the same tie-free quantization idea as
    ``llm.similarity.embedding_dim_stats``, so the stats are bit-identical
    at any partitioning and in any engine), then the top-N rows whose
    value exceeds mean + z·std, ranked by z.

    The square is taken in decimal, not int64: ``iv*iv`` as LongType wraps
    silently past 2^63 (|value| ≳ 9.6e5 at the default scale), so each
    factor is cast to decimal(18,0) first — exact for |value| up to
    1e14/scale, which covers e.g. microsecond durations.

    One aggregation (group cardinality output) broadcast back over one
    scan — the data-quality monitor every ingest pipeline runs; no second
    shuffle of the fact table.
    """
    x = F.col(value_col).cast("double")
    iv = F.floor(x * F.lit(scale))
    ivd = iv.cast("decimal(18,0)")
    sq_scale = scale * scale
    stats = (
        df.groupBy(group_col)
        .agg(
            F.count(F.lit(1)).alias("_n"),
            F.sum(ivd).alias("_s"),
            F.sum(ivd * ivd).alias("_sq"),
        )
        .select(
            group_col,
            (
                (F.col("_s").cast("double") / F.lit(scale))
                / F.col("_n").cast("double")
            ).alias("_mean"),
            F.sqrt(
                (F.col("_sq").cast("double") / F.lit(sq_scale))
                / F.col("_n").cast("double")
                - (
                    (F.col("_s").cast("double") / F.lit(scale))
                    / F.col("_n").cast("double")
                )
                * (
                    (F.col("_s").cast("double") / F.lit(scale))
                    / F.col("_n").cast("double")
                )
            ).alias("_std"),
        )
    )
    z = (x - F.col("_mean")) / F.col("_std")
    return (
        df.join(F.broadcast(stats), group_col)
        # std > 0 guard: a zero-variance group would make z NaN, and NaN
        # comparison semantics differ between engines (Spark orders NaN
        # greatest; IEEE says false) — excluded identically on both sides
        .filter((F.col("_std") > 0) & (z > F.lit(z_thresh)))
        .select(
            F.col(id_col),
            F.col(group_col),
            x.alias(value_col),
            F.col("_mean").alias("group_mean"),
            z.alias("zscore"),
        )
        .orderBy(F.desc("zscore"), id_col)
        .limit(top_n)
    )
