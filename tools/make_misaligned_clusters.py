"""Variance-misaligned planted-cluster fixture for the OPQ rotation gate.

``make_planted_clusters.py``'s displacement structure is deliberately
second-moment-INVISIBLE (its two pattern families are genuinely
cross-correlated — the r09 eigen-analysis measured 39/61 eigenvector
energy mixing), so no rotation learned from covariance can beat the
natural subspace split there; that fixture pins the SELECTION side of
OPQ-lite (keep the natural layout when it is already aligned).  This
fixture pins the PAYOFF side: the displacement families are rank-1
(per-vector scalar × fixed ±1 base vector), INTERLEAVED across the
natural split (u on even dims at 0.12 amplitude, w on odd dims at 0.03),
and zero-mean with near-cancelling cross-correlation — so the residual
cloud's top principal direction is supported on the even dims, the
learned permutation groups evens|odds into the two subspaces, and the
16-codeword seeds (which span both scalar families) encode each subspace
almost exactly, while the natural first-half/second-half split mixes
16×16 scalar combinations into 16 codewords.

Measured by the r09 numpy prototype (n=512, d=64): rotated encode
distortion 0.12e12 vs natural 7.6e12 (64x), recall@10 9 vs 3.

Deterministic (no RNG); same conventions as make_planted_clusters.py:
vec_id 0..7 pure one-hot-block centers (perfect coarse quantizer, query
vec 0 has residual 0), codebook seeds ids 16..31.

Usage::

    python tools/make_misaligned_clusters.py /root/testdata/sf0.01 /tmp/misaligned
"""

from __future__ import annotations

import os
import shutil
import sys

from make_planted_clusters import OTHER_TABLES

N_CLUSTERS = 8
N_PATTERNS = 16
CENTER_AMP = 1.0
U_AMP = 0.12
W_AMP = 0.03
NOISE_AMP = 0.002


def _su(i: int) -> float:
    """Zero-mean scalar family: (-15, -13, ..., 15)/16 over 16 indices."""
    return (2 * (i % N_PATTERNS) + 1 - N_PATTERNS) / float(N_PATTERNS)


def _bu(dim: int) -> float:
    return 1.0 if ((dim * 11 + 7) % 13) % 2 == 0 else -1.0


def _bw(dim: int) -> float:
    return 1.0 if ((dim * 7 + 5) % 11) % 2 == 0 else -1.0


def misaligned_embedding(vec_id: int, d: int = 64) -> "list[float]":
    c = vec_id % N_CLUSTERS
    blk = d // N_CLUSTERS
    vec = [CENTER_AMP if (dim // blk) == c else 0.0 for dim in range(d)]
    if vec_id < N_CLUSTERS:
        return vec  # pure centers: the coarse quantizer rows
    u_i = vec_id % N_PATTERNS
    # same spanning index walk as make_planted_clusters: seeds 16..31
    # cover all 16 w scalars, cross-correlation sums nearly cancel
    w_i = (vec_id // N_PATTERNS * 7 + vec_id) % N_PATTERNS
    for dim in range(d):
        if dim % 2 == 0:
            vec[dim] += U_AMP * _su(u_i) * _bu(dim)
        else:
            vec[dim] += W_AMP * _su(w_i) * _bw(dim)
        tiny = (((vec_id * 13 + dim * 7) % 11) - 5) / 5.0
        vec[dim] += NOISE_AMP * tiny
    return vec


def write_misaligned_embeddings(dst_dir: str, n: int = 512, d: int = 64) -> None:
    import pandas as pd

    os.makedirs(dst_dir, exist_ok=True)
    pd.DataFrame(
        {
            "vec_id": range(n),
            "embedding": [misaligned_embedding(i, d) for i in range(n)],
        }
    ).to_parquet(f"{dst_dir}/embeddings.parquet", index=False)


def main(src: str, dst: str, n: int = 512, d: int = 64) -> None:
    os.makedirs(dst, exist_ok=True)
    for t in OTHER_TABLES:
        shutil.copyfile(f"{src}/{t}.parquet", f"{dst}/{t}.parquet")
    write_misaligned_embeddings(dst, n=n, d=d)
    print(f"planted {n} misaligned vectors ({N_CLUSTERS} clusters) at {dst}")


if __name__ == "__main__":
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 512
    main(src, dst, n)
