"""Tracked DataFrame persists — a release hook for operator-internal caches.

Several operators persist intermediates whose lifetime must outlive the
function call (the returned frame reads them lazily): LSH blocked
projections, shingle frames, the range-partitioned frame inside
``with_global_rank`` (a CORRECTNESS persist — it pins one sampled
partitioning for both consumers).  None of them can unpersist before
returning, so long-lived sessions (dashboard serving, notebooks, streaming
foreachBatch loops) need an explicit release point or executor storage
grows by one pinned frame per call.

``track(df.persist())`` registers a handle; ``release_persisted()``
unpersists everything tracked.  Releasing is always safe: materialized
results keep their values; un-materialized results silently recompute from
lineage.  Thread-safe (foreachBatch sinks run on stream execution threads).
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame

_LOCK = threading.Lock()
_PERSISTED: list[DataFrame] = []


def track_persist(df: DataFrame) -> DataFrame:
    """Persist ``df`` and register the handle for ``release_persisted``."""
    handle = df.persist()
    with _LOCK:
        _PERSISTED.append(handle)
    return handle


def release_persisted() -> None:
    """Unpersist every tracked intermediate (see module docstring)."""
    with _LOCK:
        handles = _PERSISTED[:]
        _PERSISTED.clear()
    for h in handles:
        h.unpersist()
