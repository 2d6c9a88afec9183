#!/usr/bin/env python
"""Dump .explain("formatted") for the INTERNAL operator frames touched in
r15 whose registry queries end in a trivial createDataFrame (driver-loop
composites), so the judge can check plan claims: the residual-bcast PQ
encode (interpreted-HOF removal) and the OPQ encode arm (cached-residual
reuse).  Writes plans/r15/<name>_<tag>.txt.

Usage::

    python tools/frame_dump_r15.py before|after
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_project_utn_spark.llm import similarity as sim2  # noqa: E402
from data_engineering_project_utn_spark.llm.compute import (  # noqa: E402
    parallelize_compute,
)
from data_engineering_project_utn_spark.persist import track_persist  # noqa: E402
from data_engineering_project_utn_spark.session import get_spark  # noqa: E402
from data_engineering_project_utn_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def dump(df, name: str, tag: str) -> None:
    plan = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    path = os.path.join(OUT_DIR, f"{name}_{tag}.txt")
    with open(path, "w", encoding="utf-8") as fh:
        fh.write(plan)
    print(
        f"# wrote {path}: {plan.count('Exchange')} Exchange refs, "
        f"{plan.count('aggregate(')} aggregate-lambda refs, "
        f"{plan.count('zip_with(')} zip_with refs",
        file=sys.stderr,
    )


def main() -> None:
    tag = sys.argv[1]
    os.makedirs(OUT_DIR, exist_ok=True)
    spark = get_spark(app_name="utn-frame-dump")
    spark.sparkContext.setLogLevel("ERROR")
    e = parallelize_compute(load_table(spark, SF_DIR, "embeddings"))
    small = {
        int(r["vec_id"]): list(r["embedding"])
        for r in e.filter(F.col("vec_id") < 32).select("vec_id", "embedding").collect()
    }
    cents = [(j, small[j]) for j in range(8)]
    qv = small[0]

    # residual-bcast encode frame (VERDICT r14 #3): quantizer as a
    # DataFrame; before = m*k interpreted aggregate folds in the ADC
    # table + zip_with residual; after = codegen explode-join-aggregate
    cdf = e.filter(F.col("vec_id") < 8).select(
        F.col("vec_id").alias("cid"), F.col("embedding").alias("cv")
    )
    res_cb = sim2.residual_codebook(e, cents, lo=16, hi=32)
    bcast = sim2.pq_encode_adc_residual_bcast(e, qv, cdf, res_cb, m=2)
    dump(bcast, "pq_encode_adc_residual_bcast_frame", tag)

    # OPQ natural encode arm (VERDICT r14 #1): before = re-derived
    # residual_frame inlined (coarse-assignment scoring subplan repeats
    # per arm); after = InMemoryTableScan of the one persisted frame.
    # Signature-probe WITHOUT creating the persist first: a cached
    # residual frame would be auto-substituted into the before-plan by
    # the CacheManager and fake the win.
    import inspect

    has_residuals = "residuals" in inspect.signature(
        sim2.pq_encode_adc_residual
    ).parameters
    if has_residuals:
        rf = track_persist(sim2.residual_frame(e, cents))
        rf.count()
        arm = sim2.pq_encode_adc_residual(
            e, qv, cents, res_cb, m=2, with_enc_dist=True, residuals=rf
        )
    else:
        arm = sim2.pq_encode_adc_residual(
            e, qv, cents, res_cb, m=2, with_enc_dist=True
        )
    dump(arm, "pq_encode_adc_residual_opq_arm", tag)


if __name__ == "__main__":
    main()
