"""Bucketed-at-rest ANN probe benchmark.

SCALE.md claims the embedding corpus should be written partitioned by IVF
cell so a probe reads one cell's files instead of the corpus.  The plan
evidence exists (`tests/test_bucketed_join.py::test_ivf_at_rest_partition_
pruning`: the cell predicate lands in the scan's PartitionFilters); this
tool attaches a NUMBER to it: the same single-cell probe (filter to the
query's cell → exact cosine top-k inside it) timed against

* the cell-partitioned corpus (partition pruning — reads ~1/k of files), vs
* the flat corpus (row filter — full scan, same rows survive).

Both paths score identical rows with identical expressions, so the delta is
purely the at-rest layout.  Usage::

    python tools/ann_at_rest_bench.py /tmp/sf1 1.0 BENCH_ann_at_rest.json [factor]

``factor`` (default 25) replicates the corpus with vec_id offsets before
writing, because at the raw test sizes (20k × 64 dims ≈ 10 MB) a probe is
pure fixed job overhead and the layouts tie — the scan term the layout
changes must be visible to be measured.  Writes one JSON line with median
probe times over N reps, the measured speedup, AND the at-rest bytes under
each path's pruned/total scan (the quantity that actually scales: flat
reads all bytes, pruned reads one cell's files).  At 100 TB the local
speedup still understates the cluster ratio — the local scan is
page-cache-warm NVMe, not object-store reads.
"""

from __future__ import annotations

import json
import os
import sys
import time
from statistics import median

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from data_engineering_project_utn_spark.llm import similarity as sim  # noqa: E402
from data_engineering_project_utn_spark.session import get_spark  # noqa: E402
from data_engineering_project_utn_spark.tables import load_table  # noqa: E402


def _tree_bytes(path: str) -> int:
    total = 0
    for root, _dirs, files in os.walk(path):
        total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
    return total


def main(
    sf_dir: str,
    sf_label: float,
    out_path: str,
    factor: int = 25,
    k: int = 16,
    reps: int = 5,
) -> None:
    spark = get_spark(app_name="utn-ann-at-rest")
    spark.sparkContext.setLogLevel("ERROR")

    e = load_table(spark, sf_dir, "embeddings")
    cents = sim.train_ivf_centroids(e, k=k, n_iter=1)
    # train the PCA directions on the UN-replicated corpus too: replication
    # multiplies the Gram matrix by the factor, and power iteration
    # renormalizes each round, so the directions are identical — at 1/factor
    # the scan cost (same reasoning as training centroids pre-replication)
    v1, v2 = sim.principal_directions(e, k=2, iters=4)
    if factor > 1:
        # replicate with vec_id offsets: same vectors → same cells, so the
        # cell SIZES scale with the corpus exactly (what the probe scans)
        e = e.select(
            F.explode(F.sequence(F.lit(0), F.lit(factor - 1))).alias("_r"),
            "vec_id",
            "embedding",
        ).select(
            (F.col("vec_id") + F.col("_r") * F.lit(10_000_000)).alias("vec_id"),
            "embedding",
        )
    cells = sim.ivf_cells(e, cents)
    n_rows = e.count()

    base = f"/tmp/ann_at_rest_sf{sf_label}_x{factor}"
    part_path, flat_path = f"{base}/by_cell", f"{base}/flat"
    if not os.path.exists(part_path):
        cells.write.mode("overwrite").partitionBy("cell").parquet(part_path)
    if not os.path.exists(flat_path):
        cells.write.mode("overwrite").parquet(flat_path)

    # deterministic query: the corpus vector with the smallest vec_id
    qrow = e.orderBy("vec_id").select("embedding").first()
    query = spark.createDataFrame([(qrow["embedding"],)], "qv array<double>")
    q_cell = int(
        sim.with_probe_cells(query, cents, nprobe=1).first()["q_cell"]
    )

    def probe(path: str, cell_id: int) -> float:
        spark.catalog.clearCache()
        t0 = time.perf_counter()
        corpus = spark.read.parquet(path).filter(F.col("cell") == cell_id)
        top = sim.knn_brute(corpus, query, k=10)
        rows = top.collect()
        assert len(rows) == 10
        return round(time.perf_counter() - t0, 3)

    pruned = [probe(part_path, q_cell) for _ in range(reps)]
    flat = [probe(flat_path, q_cell) for _ in range(reps)]

    # plan evidence inline: the partitioned path must prune at the scan
    plan = (
        spark.read.parquet(part_path)
        .filter(F.col("cell") == q_cell)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    scan_line = next(ln for ln in plan.splitlines() if "FileScan" in ln)
    partition_pruned = (
        "PartitionFilters" in scan_line
        and "cell" in scan_line.split("PartitionFilters", 1)[1]
    )

    flat_bytes = _tree_bytes(flat_path)
    cell_bytes = _tree_bytes(os.path.join(part_path, f"cell={q_cell}"))
    record = {
        "metric": "ann_probe_bucketed_vs_flat",
        "sf": sf_label,
        "rows": n_rows,
        "replication_factor": factor,
        "ivf_k": k,
        "probe_cell": q_cell,
        "scan_bytes_flat": flat_bytes,
        "scan_bytes_pruned": cell_bytes,
        "bytes_ratio": round(flat_bytes / max(cell_bytes, 1), 1),
        "probe_pruned_sec": round(median(pruned), 3),
        "probe_flat_sec": round(median(flat), 3),
        "pruned_reps": pruned,
        "flat_reps": flat,
        "speedup": round(median(flat) / median(pruned), 2),
        "partition_filters_in_plan": partition_pruned,
    }

    # --- PCA-grid layout: the same probe question against cells derived
    # from the corpus's own top-2 principal directions (llm_pca_components
    # machinery) instead of IVF centroids — grid² cells chosen to match
    # the IVF cell count so the two layouts' pruning ratios are comparable.
    grid = max(2, int(round(k ** 0.5)))
    pcells, layout = sim.pca_cells(e, v1, v2, grid=grid)
    pca_path, pca_flat_path = f"{base}/by_pca_cell", f"{base}/flat_pca"
    if not os.path.exists(pca_path):
        pcells.write.mode("overwrite").partitionBy("cell").parquet(pca_path)
    if not os.path.exists(pca_flat_path):
        pcells.write.mode("overwrite").parquet(pca_flat_path)
    pq_cell = sim.pca_cell_of(list(qrow["embedding"]), v1, v2, layout)

    pca_pruned = [probe(pca_path, pq_cell) for _ in range(reps)]
    pca_flat = [probe(pca_flat_path, pq_cell) for _ in range(reps)]

    pplan = (
        spark.read.parquet(pca_path)
        .filter(F.col("cell") == pq_cell)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    pscan = next(ln for ln in pplan.splitlines() if "FileScan" in ln)
    pca_record = {
        "metric": "ann_probe_pca_grid_vs_flat",
        "sf": sf_label,
        "rows": n_rows,
        "replication_factor": factor,
        "pca_grid": grid,
        "probe_cell": pq_cell,
        "scan_bytes_flat": _tree_bytes(pca_flat_path),
        "scan_bytes_pruned": _tree_bytes(os.path.join(pca_path, f"cell={pq_cell}")),
        "probe_pruned_sec": round(median(pca_pruned), 3),
        "probe_flat_sec": round(median(pca_flat), 3),
        "pruned_reps": pca_pruned,
        "flat_reps": pca_flat,
        "speedup": round(median(pca_flat) / median(pca_pruned), 2),
        "partition_filters_in_plan": (
            "PartitionFilters" in pscan
            and "cell" in pscan.split("PartitionFilters", 1)[1]
        ),
    }
    pca_record["bytes_ratio"] = round(
        pca_record["scan_bytes_flat"] / max(pca_record["scan_bytes_pruned"], 1), 1
    )

    # --- balanced (equal-frequency) PCA grid: order-statistic boundaries
    # instead of equal-width bins — the skew fix the equal-width record
    # motivates (its probed cell holds ~2× the ideal share on a Gaussian
    # projection; exact-rank boundaries pin every stripe at N/grid).
    bcells, blayout = sim.pca_cells_balanced(e, v1, v2, grid=grid)
    bal_path = f"{base}/by_pca_balanced"
    if not os.path.exists(bal_path):
        bcells.write.mode("overwrite").partitionBy("cell").parquet(bal_path)
    bq_cell = sim.pca_cell_of_balanced(list(qrow["embedding"]), v1, v2, blayout)
    bal_pruned = [probe(bal_path, bq_cell) for _ in range(reps)]
    bal_record = {
        "metric": "ann_probe_pca_balanced_vs_flat",
        "sf": sf_label,
        "rows": n_rows,
        "replication_factor": factor,
        "pca_grid": grid,
        "probe_cell": bq_cell,
        "scan_bytes_flat": _tree_bytes(pca_flat_path),
        "scan_bytes_pruned": _tree_bytes(os.path.join(bal_path, f"cell={bq_cell}")),
        "probe_pruned_sec": round(median(bal_pruned), 3),
        "probe_flat_sec": round(median(pca_flat), 3),
        "pruned_reps": bal_pruned,
        "speedup": round(median(pca_flat) / median(bal_pruned), 2),
    }
    bal_record["bytes_ratio"] = round(
        bal_record["scan_bytes_flat"] / max(bal_record["scan_bytes_pruned"], 1), 1
    )

    with open(out_path, "w") as f:
        f.write(json.dumps(record) + "\n")
        f.write(json.dumps(pca_record) + "\n")
        f.write(json.dumps(bal_record) + "\n")
    print(json.dumps(record))
    print(json.dumps(pca_record))
    print(json.dumps(bal_record))


if __name__ == "__main__":
    main(
        sys.argv[1],
        float(sys.argv[2]),
        sys.argv[3],
        *(int(a) for a in sys.argv[4:6]),
    )
