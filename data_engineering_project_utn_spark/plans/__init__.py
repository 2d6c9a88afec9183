"""Query registry — every implemented operator exposed as a named query.

Import side effect: importing this package registers all query plans.
"""

from data_engineering_project_utn_spark.plans.registry import (  # noqa: F401
    Query,
    all_queries,
    get_query,
    register,
)
from data_engineering_project_utn_spark.plans import relational  # noqa: F401
from data_engineering_project_utn_spark.plans import reference_events  # noqa: F401
from data_engineering_project_utn_spark.plans import llm  # noqa: F401
