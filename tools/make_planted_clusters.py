"""Planted-cluster embeddings fixture for the residual-PQ recall gate.

The driver's synthetic embeddings are near-isotropic, so PQ recall gates
honestly measure LOW there (``llm_pq_recall`` docstring) — residuals of an
isotropic cloud are still isotropic and the coarse quantizer has nothing
to strip.  This fixture plants the structure residual encoding exists for
(VERDICT r07 #4), entirely deterministic (no RNG):

* 8 well-separated cluster centers (orthogonal one-hot blocks of 1.0 over
  d/8 dims) — cosine coarse assignment is unambiguous;
* vec_id 0..7 are the PURE centers, so the gate's ids-<-8 centroid
  convention gives a perfect coarse quantizer and the query (vec 0) has
  residual exactly 0;
* every other vector = its cluster center + a two-level displacement:
  a per-subspace PATTERN (16 first-half u-patterns × 16 second-half
  w-patterns at 0.08 amplitude — the product structure PQ's independent
  subspaces can represent exactly) + tiny per-(id, dim) noise (0.004);
* the codebook seed ids 16..31 cover ALL 16 u-patterns and ALL 16
  w-patterns, so the RESIDUAL codebook spans the displacement space —
  while the FLAT codebook spends the same 16 codewords dragging cluster
  centers along and can only represent half the w-patterns uncoupled.

Expected outcome (asserted by ``TestPQResidual``): recall@10 of the
residual arm ≫ the flat arm on this corpus, the positive number that
complements the honest flat one on driver data.

Other tables are copied from the source sf dir unchanged so the oracle
harness's per-table views still bind.

Usage::

    python tools/make_planted_clusters.py /root/testdata/sf0.01 /tmp/planted
"""

from __future__ import annotations

import os
import shutil
import sys

N_CLUSTERS = 8
N_PATTERNS = 16
CENTER_AMP = 1.0
PATTERN_AMP = 0.08
NOISE_AMP = 0.004

OTHER_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
)


def planted_embedding(vec_id: int, d: int = 64) -> "list[float]":
    """One deterministic planted vector (see module docstring)."""
    c = vec_id % N_CLUSTERS
    blk = d // N_CLUSTERS
    vec = [CENTER_AMP if (dim // blk) == c else 0.0 for dim in range(d)]
    if vec_id < N_CLUSTERS:
        return vec  # pure centers: the coarse quantizer rows
    u_i = vec_id % N_PATTERNS
    w_i = (vec_id // N_PATTERNS * 7 + vec_id) % N_PATTERNS
    half = d // 2
    for dim in range(d):
        if dim < half:
            pat = ((u_i * (dim + 3) + 5 * dim + u_i * u_i) % 13 - 6) / 6.0
        else:
            pat = ((w_i * (dim + 5) + 3 * dim + w_i * w_i) % 13 - 6) / 6.0
        tiny = (((vec_id * 13 + dim * 7) % 11) - 5) / 5.0
        vec[dim] += PATTERN_AMP * pat + NOISE_AMP * tiny
    return vec


def write_planted_embeddings(dst_dir: str, n: int = 512, d: int = 64) -> None:
    import pandas as pd

    os.makedirs(dst_dir, exist_ok=True)
    pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [planted_embedding(i, d) for i in range(n)],
        }
    ).to_parquet(f"{dst_dir}/embeddings.parquet", index=False)


def main(src: str, dst: str, n: int = 512, d: int = 64) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in OTHER_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    write_planted_embeddings(dst, n=n, d=d)
    print(f"planted {n} vectors ({N_CLUSTERS} clusters) at {dst}")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    main(src, dst, n)
