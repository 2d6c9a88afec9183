"""distributed_ntile must be bit-identical to F.ntile over a global window
— it's the 100 TB replacement for the single-partition NTILE (W1)."""

from __future__ import annotations

import pandas as pd
import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from data_engineering_project_utn_spark.operators.histogram import distributed_ntile


def _compare(spark, pdf, order_cols, n_bins, parts):
    df = spark.createDataFrame(pdf)
    got = (
        distributed_ntile(df, order_cols, n_bins, num_partitions=parts)
        .select(*order_cols, "bin")
        .toPandas()
        .sort_values(order_cols)
        .reset_index(drop=True)
    )
    w = Window.orderBy(*order_cols)
    exp = (
        df.withColumn("bin", F.ntile(n_bins).over(w))
        .select(*order_cols, "bin")
        .toPandas()
        .sort_values(order_cols)
        .reset_index(drop=True)
    )
    assert got["bin"].tolist() == exp["bin"].tolist()


@pytest.mark.parametrize("n,bins,parts", [(1000, 10, 8), (97, 10, 4), (1000, 7, 16)])
def test_matches_window_ntile(spark, n, bins, parts):
    pdf = pd.DataFrame({"v": [((i * 7919) % n) / n for i in range(n)], "id": range(n)})
    _compare(spark, pdf, ["v", "id"], bins, parts)


def test_fewer_rows_than_bins(spark):
    pdf = pd.DataFrame({"v": [0.3, 0.1, 0.9], "id": [1, 2, 3]})
    _compare(spark, pdf, ["v", "id"], 10, 4)


def test_heavy_ties(spark):
    """Equal sort keys must co-locate (RangePartitioner contract); with a
    total order via the id tiebreaker the assignment is still exact."""
    pdf = pd.DataFrame({"v": [0.5] * 50 + [0.2] * 30 + [0.8] * 20, "id": range(100)})
    _compare(spark, pdf, ["v", "id"], 10, 8)


def test_more_partitions_than_rows(spark):
    pdf = pd.DataFrame({"v": [0.1, 0.2], "id": [1, 2]})
    _compare(spark, pdf, ["v", "id"], 2, 32)
