"""Sources / sinks / catalog operations (SURVEY.md §2.1)."""

from data_engineering_project_utn_spark.sources import io  # noqa: F401
