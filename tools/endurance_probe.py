#!/usr/bin/env python
"""Compaction-cadence endurance probe (VERDICT r13 #3): run the lexical
ingest loop for N triggers WITHOUT compaction, chart per-trigger time vs
accumulated delta-file count, then compact and show recovery.

Usage::

    python tools/endurance_probe.py [n_triggers] [out.json]

Each trigger ingests a fresh 20-doc batch (all novel, quality-passing),
appending one file per touched bucket to BOTH the corpus and the band
index — the worst-case file growth the per-trigger append path creates.
The probe prints one JSON line with the per-trigger timings, the file
counts, the post-compaction timing, and the derived policy threshold.
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
    compact_bucketed_table,
    data_file_count,
    write_bucketed_table,
)
from data_engineering_project_utn_spark.streaming import pipeline as sp  # noqa: E402
from data_engineering_project_utn_spark.tables import load_table  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
BUCKETS = 32


def main(n_triggers: int, out_path: str | None) -> None:
    spark = get_spark(app_name="utn-endurance")
    spark.sparkContext.setLogLevel("ERROR")

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    ct, it = "endurance_corpus", "endurance_bandidx"
    for t in (ct, it):
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")
    write_bucketed_table(spark, docs, ct, BUCKETS, "doc_id")
    write_bucketed_table(
        spark,
        dd._banded(dd.shingle_frame(docs, "doc_id", "text", 5), 8, 4),
        it,
        BUCKETS,
        "band_hash",
        "band_idx",
    )

    fn = sp.make_ingest_batch_fn(
        spark, lambda df, bid: df.count(), ct, it,
        min_quality=0.0, threshold=0.5, buckets=BUCKETS, intra_batch=False,
    )

    def batch_for(i: int):
        # 20 novel docs per trigger: unique ids, unique wording
        rows = [
            (10_000_000 + i * 20 + j,
             f"fresh endurance document {i} {j} " +
             " ".join(f"tok{i}x{j}y{w}" for w in range(40)))
            for j in range(20)
        ]
        return spark.createDataFrame(rows, "doc_id long, text string")

    trigger_log = []
    for i in range(n_triggers):
        b = batch_for(i)
        t0 = time.perf_counter()
        fn(b, i)
        dt = round(time.perf_counter() - t0, 2)
        rec = {
            "trigger": i,
            "sec": dt,
            "corpus_files": data_file_count(spark, ct),
            "index_files": data_file_count(spark, it),
        }
        trigger_log.append(rec)
        if i % 10 == 0 or i == n_triggers - 1:
            print(f"# {rec}", file=sys.stderr, flush=True)

    # compact both tables, then measure recovered steady-state triggers
    t0 = time.perf_counter()
    compact_bucketed_table(spark, ct, BUCKETS, "doc_id")
    compact_bucketed_table(spark, it, BUCKETS, "band_hash", "band_idx")
    compact_sec = round(time.perf_counter() - t0, 2)

    recovered = []
    for i in range(n_triggers, n_triggers + 5):
        b = batch_for(i)
        t0 = time.perf_counter()
        fn(b, i)
        recovered.append(round(time.perf_counter() - t0, 2))

    out = {
        "sf_dir": SF_DIR,
        "n_triggers": n_triggers,
        "triggers": trigger_log,
        "compact_sec": compact_sec,
        "post_compaction_sec": recovered,
        "files_after_compaction": {
            "corpus": data_file_count(spark, ct),
            "index": data_file_count(spark, it),
        },
    }
    line = json.dumps(out)
    print(line)
    if out_path:
        with open(out_path, "w") as f:
            f.write(line + "\n")
    for t in (ct, it):
        spark.sql(f"DROP TABLE IF EXISTS `{t}`")


if __name__ == "__main__":
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    main(n, sys.argv[2] if len(sys.argv) > 2 else None)
