#!/usr/bin/env python
"""Nightly-sequence timing probe (VERDICT r13 #7): time the composed
'day in the life' nightly jobs at a scaled SF — compaction of a
delta'd corpus + band index, band-stats refresh, SNM rank rebuild,
ensemble dedup, golden record, surviving-corpus write-back.

Usage::

    python tools/nightly_probe.py [sf_dir] [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_project_utn_spark.llm import dedup as dd  # noqa: E402
from data_engineering_project_utn_spark.session import get_spark  # noqa: E402
from data_engineering_project_utn_spark.sources.io import (  # noqa: E402
    append_bucketed_table,
    compact_bucketed_table,
    write_bucketed_table,
)
from data_engineering_project_utn_spark.tables import load_table  # noqa: E402


def main(sf_dir: str, out_path: str | None) -> None:
    spark = get_spark(app_name="utn-nightly-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    ct, it, st = "nightly_corpus", "nightly_bandidx", "nightly_stats"
    for t in (ct, it, st, f"{ct}_surviving"):
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")
    write_bucketed_table(spark, docs, ct, 32, "doc_id")
    write_bucketed_table(
        spark, dd._banded(dd.shingle_frame(docs, "doc_id", "text", 5), 8, 4),
        it, 32, "band_hash", "band_idx",
    )
    # a day of deltas: 10 appended batches of 50 docs each
    mx = docs.agg(F.max("doc_id")).first()[0]
    for i in range(10):
        b = spark.range(mx + 1 + i * 50, mx + 1 + (i + 1) * 50).select(
            F.col("id").alias("doc_id"),
            F.concat(F.lit(f"delta doc batch {i} body "),
                     F.col("id").cast("string")).alias("text"),
        )
        append_bucketed_table(spark, b, ct, 32, "doc_id")
        append_bucketed_table(
            spark, dd._banded(dd.shingle_frame(b, "doc_id", "text", 5), 8, 4),
            it, 32, "band_hash", "band_idx",
        )

    timings: dict[str, float] = {}

    def step(name, fn):
        t0 = time.perf_counter()
        r = fn()
        timings[name] = round(time.perf_counter() - t0, 2)
        print(f"# {name}: {timings[name]}s", file=sys.stderr, flush=True)
        return r

    step("compact_corpus", lambda: compact_bucketed_table(spark, ct, 32, "doc_id"))
    step("compact_index",
         lambda: compact_bucketed_table(spark, it, 32, "band_hash", "band_idx"))
    step("refresh_band_stats", lambda: dd.refresh_band_stats(spark, it, st))
    step("snm_rank_rebuild",
         lambda: dd.snm_ranked_corpus(spark.table(ct)).count())
    corpus = spark.table(ct)
    pairs = step("ensemble_pairs",
                 lambda: dd.minhash_neardup(corpus, threshold=0.5))
    labels = step("clusters", lambda: dd.dedup_clusters(pairs))
    golden = step("golden_record", lambda: dd.golden_record(labels, corpus))
    step("surviving_writeback", lambda: write_bucketed_table(
        spark, dd.surviving_corpus(labels, golden, corpus),
        f"{ct}_surviving", 32, "doc_id"))
    timings["total"] = round(sum(timings.values()), 2)
    timings["surviving_rows"] = spark.table(f"{ct}_surviving").count()

    line = json.dumps({"sf_dir": sf_dir, "timings": timings})
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    for t in (ct, it, st, f"{ct}_surviving"):
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")


if __name__ == "__main__":
    main(
        sys.argv[1] if len(sys.argv) > 1 else "/tmp/sf2",
        sys.argv[2] if len(sys.argv) > 2 else None,
    )
