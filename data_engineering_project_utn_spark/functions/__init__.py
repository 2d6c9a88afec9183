from data_engineering_project_utn_spark.functions.scalar import (  # noqa: F401
    categorize_cluster,
    dsum,
    davg,
    epoch_ms,
    mmss,
    pct_ratio,
    safe_div,
)
