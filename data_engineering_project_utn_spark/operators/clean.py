"""Redset log cleaning — the reference's three cleaning layers folded into one.

Reference sites reproduced:
* ``type_cast_batch`` dtype coercion (`Real Final APP/producer_Final.py:198-233`)
* ``Historical_data_cleaning.py:35-66`` — literal ``"NULL"``/``""``/None → NA,
  numeric ``to_numeric(errors='coerce').fillna(0)``, text default ``'UNKNOWN'``,
  bool ``fillna(False)``, timestamp default epoch
* drop rows whose list columns are empty/``'[]'``/``'<NA>'``
  (`Historical_data_cleaning.py:55-60`)

Design: one declarative ``select`` over the raw frame — every coercion is a
native expression (``try_cast`` gives the pandas ``errors='coerce'``
null-on-failure semantics under ANSI mode), so the whole cleaning pass is a
single narrow, codegen'd projection with no shuffle and no Python.  At 100 TB
this runs at scan speed and pushes column pruning into the parquet reader.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from data_engineering_project_utn_spark.schema import REDSET_SCHEMA

# Defaults per the cleaned-table DDL (`Historical_data_cleaning.py:70-97`).
_TEXT_DEFAULT = "UNKNOWN"
_EPOCH_DEFAULT = "1970-01-01 00:00:00"
_LIST_DEFAULT = "[]"


def _null_if_missing(c: Column) -> Column:
    """Literal "NULL"/"" → null (`Historical_data_cleaning.py:35`)."""
    return F.when(F.trim(c).isin("NULL", "", "<NA>", "None", "nan"), F.lit(None)).otherwise(c)


def clean_redset(raw: DataFrame, drop_empty_lists: bool = False) -> DataFrame:
    """Coerce an arbitrarily-typed raw Redset frame to REDSET_SCHEMA.

    Accepts string-typed or mixed-typed input (e.g. JSON-decoded Kafka rows)
    and emits the canonical schema with the reference's default-fill rules.

    ``drop_empty_lists=True`` additionally keeps only rows where BOTH
    ``read_table_ids`` AND ``write_table_ids`` are non-empty — the
    historical cleaning path applies two sequential filters, each dropping
    rows whose list is ``'[]'``/``'<NA>'`` (`Historical_data_cleaning.py:
    59-60`), despite its comment saying "both ... empty".  We match the
    code's behavior, not the comment.  (``'<NA>'``/``''`` were already
    null-coerced to ``'[]'`` by the default fill above, so one membership
    test per column covers the reference's full empties set.)
    """
    cols: list[Column] = []
    for field in REDSET_SCHEMA.fields:
        name = field.name
        if name not in raw.columns:
            cols.append(F.lit(None).cast(field.dataType).alias(name))
            continue
        base = _null_if_missing(raw[name].cast("string"))
        if isinstance(field.dataType, T.TimestampType):
            # the reference's pd.to_datetime(errors='coerce') NaT-coerces
            # values outside the ns-representable range (1677..2262); match
            # it, or downstream Arrow/pandas interop overflows
            ts = F.try_to_timestamp(base)
            in_range = ts.between(
                F.lit("1677-09-22").cast("timestamp"),
                F.lit("2262-04-11").cast("timestamp"),
            )
            out = F.coalesce(
                F.when(in_range, ts), F.lit(_EPOCH_DEFAULT).cast("timestamp")
            )
        elif isinstance(field.dataType, T.BooleanType):
            out = F.coalesce(
                F.when(F.lower(base).isin("true", "1", "t"), F.lit(True))
                .when(F.lower(base).isin("false", "0", "f"), F.lit(False))
                .otherwise(F.lit(None).cast("boolean")),
                F.lit(False),
            )
        elif isinstance(field.dataType, (T.LongType, T.DoubleType)):
            # -1 for *_id columns follows the cleaned-table DDL defaults
            # (`Historical_data_cleaning.py:73-97`), chosen over the pandas
            # layer's blanket fillna(0) (`:52`) — the two reference layers
            # disagree; the DDL is what downstream queries actually read
            # (documented divergence per SURVEY §7.2).
            default = F.lit(-1 if name.endswith("_id") else 0)
            out = F.coalesce(
                base.try_cast(field.dataType.simpleString()),
                default.cast(field.dataType),
            )
        elif name in ("read_table_ids", "write_table_ids"):
            out = F.coalesce(base, F.lit(_LIST_DEFAULT))
        else:  # plain text
            out = F.coalesce(base, F.lit(_TEXT_DEFAULT))
        cols.append(out.alias(name))

    cleaned = raw.select(*cols)
    if drop_empty_lists:
        cleaned = cleaned.filter(
            (~F.col("read_table_ids").isin("[]", "")) & (~F.col("write_table_ids").isin("[]", ""))
        )
    return cleaned


def drop_bad_timestamps(df: DataFrame, ts_col: str = "arrival_timestamp") -> DataFrame:
    """Data hygiene: drop NULL/epoch-default timestamps
    (`live_updates_duckdb.py:161-168`)."""
    return df.filter(
        F.col(ts_col).isNotNull() & (F.col(ts_col) != F.lit(_EPOCH_DEFAULT).cast("timestamp"))
    )
