"""Result cache with TTL + explicit invalidation (SURVEY §2 S10).

Reference behavior: the dashboard serves four tabs off ONE cached
filtered frame with a 300 s TTL (streamlit/utils/data_loader.py:6,15,37
``@st.cache_data(ttl=300)``; app.py:95-112 builds the filtered base
frame once per interaction), and a manual refresh clears the cache
(app.py:129-131 ``st.cache_data.clear()``).

Spark-first translation: ``DataFrame.persist`` registers the plan with
the cluster-wide CacheManager — every later query whose plan contains
the cached subtree reads InMemoryRelation column batches instead of
re-scanning parquet. That is exactly the "four tabs, one scan" contract,
but distributed: the cached batches live on the executors
(MEMORY_AND_DISK, spills instead of OOM at 100 TB working sets), not on
the driver.

The TTL is driver-side bookkeeping (Spark has no native cache TTL):
an expired or invalidated entry is ``unpersist``-ed — freeing executor
memory — and the next ``get`` rebuilds and re-persists. The clock is
injectable so tests can pin expiry deterministically.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark import StorageLevel
from pyspark.sql import DataFrame


@dataclass
class _Entry:
    df: DataFrame
    built_at: float
    hits: int = 0
    builds: int = 1


@dataclass
class ResultCache:
    """Keyed cache of persisted DataFrames with a TTL.

    ``get(key, build)`` returns the cached frame while fresh; otherwise
    it unpersists the stale frame, calls ``build()``, persists the
    result, and caches it. ``invalidate()`` mirrors the reference's
    manual cache-clear button.
    """

    ttl_seconds: float = 300.0
    storage_level: StorageLevel = field(
        default_factory=lambda: StorageLevel.MEMORY_AND_DISK
    )
    clock: Callable[[], float] = time.monotonic
    _entries: dict[str, _Entry] = field(default_factory=dict)

    def get(self, key: str, build: Callable[[], DataFrame]) -> DataFrame:
        entry = self._entries.get(key)
        now = self.clock()
        if entry is not None and now - entry.built_at < self.ttl_seconds:
            entry.hits += 1
            return entry.df
        builds, hits = 1, 0
        if entry is not None:
            entry.df.unpersist()
            builds, hits = entry.builds + 1, entry.hits
        df = build().persist(self.storage_level)
        self._entries[key] = _Entry(df=df, built_at=now, hits=hits, builds=builds)
        return df

    def invalidate(self, key: str | None = None) -> None:
        """Drop one entry (or all, key=None) and free executor memory.

        The next ``get`` re-scans the source — the reference's refresh
        semantics (app.py:129-131).
        """
        keys = [key] if key is not None else list(self._entries)
        for k in keys:
            entry = self._entries.pop(k, None)
            if entry is not None:
                entry.df.unpersist()

    def stats(self, key: str) -> tuple[int, int]:
        """(hits, builds) for observability/tests."""
        entry = self._entries[key]
        return entry.hits, entry.builds
