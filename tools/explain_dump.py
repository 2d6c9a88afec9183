#!/usr/bin/env python
"""Dump .explain("formatted") for registry queries to plans/<round>/<q>_<tag>.txt
(round dir from $SPARK_GRAFT_PLAN_DIR, default r15).

Usage::

    python tools/explain_dump.py before q1 q2 ...     # named queries
    python tools/explain_dump.py before --bench       # the headline set
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from data_engineering_project_utn_spark.plans import all_queries  # noqa: E402
from data_engineering_project_utn_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "plans",
    os.environ.get("SPARK_GRAFT_PLAN_DIR", "r15"),
)


def main() -> None:
    tag = sys.argv[1]
    names = sys.argv[2:]
    queries = all_queries()
    if names == ["--bench"]:
        names = [n for n, q in sorted(queries.items()) if "bench" in q.tags]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="utn-explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = queries[name].build(spark, SF_DIR)
        plan = df._sc._jvm.PythonSQLUtils.explainString(
            df._jdf.queryExecution(), "formatted"
        )
        path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
        with open(path, "w", encoding="utf-8") as fh:
            fh.write(plan)
        print(f"# wrote {path} ({plan.count('Exchange')} Exchange refs)", file=sys.stderr)


if __name__ == "__main__":
    main()
