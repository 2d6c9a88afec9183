"""LLM-pipeline plan families — split by family so the staleness ledger
(plans/staleness.py) fingerprints each family independently: editing one
family's module no longer marks all ~60 llm queries stale at once (which
blew the driver's 50-query re-verification budget in round 5).

Importing this module registers every family (kept as the single import
point ``plans/__init__`` uses; shared SQL fragments live in
``plans.llm_shared``).
"""

from data_engineering_project_utn_spark.plans import llm_shared  # noqa: F401
from data_engineering_project_utn_spark.plans import llm_text_plans  # noqa: F401
from data_engineering_project_utn_spark.plans import llm_dedup_plans  # noqa: F401
from data_engineering_project_utn_spark.plans import llm_similarity_plans  # noqa: F401
from data_engineering_project_utn_spark.plans import llm_multimodal_plans  # noqa: F401
from data_engineering_project_utn_spark.plans import llm_curation_plans  # noqa: F401
from data_engineering_project_utn_spark.plans import llm_classify_plans  # noqa: F401
