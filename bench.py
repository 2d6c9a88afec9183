#!/usr/bin/env python
"""Benchmark harness — runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line:  {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is executed with a count-consuming action (results fully
materialized, nothing collected to the driver beyond the count) after a
small warm-up query so JVM/codegen startup isn't billed to the first query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from data_engineering_project_utn_spark.plans import all_queries  # noqa: E402
from data_engineering_project_utn_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: tagged "bench" in the registry — covers scan+agg, joins,
# the interval-join core, window/ntile, dedup, similarity.
BENCH_QUERIES = [
    name for name, q in sorted(all_queries().items()) if "bench" in q.tags
]


def main() -> None:
    spark = get_spark(app_name="utn-bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # Warm-up: touch every input table + JIT the scan path.
    from data_engineering_project_utn_spark.tables import TABLE_NAMES, load_table

    for t in TABLE_NAMES:
        load_table(spark, SF_DIR, t).count()

    # best-of-2 per query with the DataFrame cache cleared between runs:
    # removes scheduler/JIT noise without letting a repeat ride persisted
    # frames (which would measure cache hits, not query cost)
    from data_engineering_project_utn_spark.plans import reference_events as _re

    timings: dict[str, float] = {}
    for name in BENCH_QUERIES:
        q = queries[name]
        best, n = float("inf"), 0
        for _ in range(2):
            spark.catalog.clearCache()
            _re._OUTPUT_TABLE_CACHE.clear()
            t0 = time.perf_counter()
            df = q.build(spark, SF_DIR)
            n = df.count()
            best = min(best, time.perf_counter() - t0)
        timings[name] = round(best, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    print(
        json.dumps(
            {
                "metric": "headline_queries_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
            }
        )
    )


if __name__ == "__main__":
    main()
