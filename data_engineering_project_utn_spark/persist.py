"""Tracked DataFrame persists — a release hook for operator-internal caches.

Two classes of pin, with different release rules:

* **Perf persists** (``track_persist``): avoid recomputing expensive
  intermediates (shingle frames, blocked projections).  Releasing them is
  always safe — materialized results keep their values; un-materialized
  results silently recompute from lineage to the same answer.
  ``release_persisted()`` frees these.
* **Correctness persists** (``pin_for_correctness``): the computation is
  only correct while the pinned blocks exist.  The one case today:
  ``with_global_rank`` collects per-partition counts from a
  ``repartitionByRange`` whose boundary *sampling* is not stable across
  re-evaluation — recompute could resample different boundaries and
  desynchronize the broadcast offsets from partition contents (silently
  wrong ranks).  These are NEVER released by ``release_persisted()``;
  ``release_all()`` frees them too and must only run when no result built
  on them will be used again (session teardown, or a foreachBatch loop
  that fully materializes each batch's outputs — note the streaming
  incremental-dedup hook releases only perf pins for exactly this reason).

Both registries are thread-safe (foreachBatch sinks run on stream
execution threads).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_PERSISTED: list[DataFrame] = []
_PINNED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` as a releasable perf cache (see module docstring)."""
    handle = df.persist()
    with _LOCK:
        _PERSISTED.append(handle)
    return handle


def pin_for_correctness(df: DataFrame) -> DataFrame:
    """Persist ``df`` as a correctness pin: excluded from
    ``release_persisted()`` because recomputing it could change the answer
    (e.g. resampled range-partition boundaries)."""
    handle = df.persist()
    with _LOCK:
        _PINNED.append(handle)
    return handle


def release_persisted() -> None:
    """Unpersist every releasable perf intermediate.  Correctness pins stay."""
    with _LOCK:
        handles = _PERSISTED[:]
        _PERSISTED.clear()
    for h in handles:
        h.unpersist()


def release_all() -> None:
    """Unpersist everything, including correctness pins.  Only call when no
    DataFrame built on a pinned frame will be evaluated again."""
    release_persisted()
    with _LOCK:
        handles = _PINNED[:]
        _PINNED.clear()
    for h in handles:
        h.unpersist()
