"""TTL result caching (T10).

The reference caches rendered query results with Streamlit's
``@st.cache_data(ttl=600)`` (`Real Final APP/Dashboard_Historical_Final.py:
427`) and keeps per-table "last updated" stamps (`live_updates_duckdb.py:
171-209`) so repeated dashboard hits don't recompute.  The Spark-native
analogue is a TTL memo over *materialized* results: within the TTL every
caller gets the persisted snapshot (jobs read cached blocks — no recompute,
no rescan); after expiry the next call rebuilds, swaps the snapshot in, and
unpersists the stale one.

Scale note: the cache holds DataFrame *handles*, not driver-side rows —
a cached result occupies executor storage memory (spill-to-disk persist
level), so cache entries should be dashboard-sized aggregates (the same
things the reference cached), never raw scans.
"""

from __future__ import annotations

import time
from collections.abc import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame


class ResultCache:
    """TTL-bounded memo of materialized query results.

    ``clock`` is injectable (tests use a fake clock; production uses
    ``time.monotonic`` — wall-clock jumps must not mass-expire entries).
    """

    def __init__(
        self,
        ttl_seconds: float = 600.0,
        clock: Callable[[], float] = time.monotonic,
    ):
        self.ttl = ttl_seconds
        self._clock = clock
        self._entries: dict[str, tuple[float, DataFrame]] = {}

    def get(self, key: str, build: Callable[[], DataFrame]) -> DataFrame:
        """The cached snapshot for ``key``, rebuilding if absent/expired.

        The fresh result is persisted (MEMORY_AND_DISK — dashboard results
        must not silently recompute when storage is tight) and eagerly
        materialized, so every consumer within the TTL reads cached blocks.
        """
        now = self._clock()
        hit = self._entries.get(key)
        if hit is not None and now - hit[0] < self.ttl:
            return hit[1]
        fresh = build().persist(StorageLevel.MEMORY_AND_DISK)
        fresh.count()  # materialize once, at refresh time
        if hit is not None:
            hit[1].unpersist()
        self._entries[key] = (now, fresh)
        return fresh

    def invalidate(self, key: str | None = None) -> None:
        """Drop one entry (or all), unpersisting snapshots immediately."""
        keys = [key] if key is not None else list(self._entries)
        for k in keys:
            entry = self._entries.pop(k, None)
            if entry is not None:
                entry[1].unpersist()
