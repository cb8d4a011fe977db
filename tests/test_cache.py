"""S10 result-cache tests: InMemoryRelation reuse, TTL expiry, and
invalidation-forced re-scan, asserted at the physical-plan level."""

from __future__ import annotations

from pyspark import StorageLevel
from pyspark.sql import functions as F

from etl_mudah_spark.operators.cache import ResultCache
from etl_mudah_spark.tables import load
from tests.conftest import SF_SMOKE


def _executed_plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_second_consumer_reuses_inmemory_relation(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return load(spark, SF_SMOKE, "orders").where(F.col("o_totalprice") > 1000)

    cache = ResultCache(ttl_seconds=300)
    first = cache.get("base", build)
    first.count()  # materialize the cached batches
    second = cache.get("base", build)
    assert calls["n"] == 1  # the second consumer did not rebuild
    assert second is first
    assert second.storageLevel.useMemory
    # downstream plans over the cached frame read InMemoryRelation
    # column batches, not the parquet scan
    downstream = second.groupBy("o_orderstatus").count()
    assert "InMemoryTableScan" in _executed_plan(downstream)
    cache.invalidate()


def test_ttl_expiry_rebuilds_and_unpersists(spark):
    now = {"t": 0.0}
    calls = {"n": 0}

    def build():
        # distinct plan per build: storageLevel lookups are plan-keyed,
        # so an identical rebuilt plan would mask the old unpersist
        calls["n"] += 1
        return load(spark, SF_SMOKE, "orders").limit(10 + calls["n"])

    cache = ResultCache(ttl_seconds=300, clock=lambda: now["t"])
    first = cache.get("base", build)
    now["t"] = 299.0
    assert cache.get("base", build) is first and calls["n"] == 1
    now["t"] = 301.0
    third = cache.get("base", build)
    assert calls["n"] == 2 and third is not first
    # the stale frame's executor memory was released
    assert first.storageLevel == StorageLevel.NONE
    assert cache.stats("base") == (1, 2)
    cache.invalidate()


def test_invalidate_forces_rescan(spark):
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return load(spark, SF_SMOKE, "orders").limit(10 + calls["n"])

    cache = ResultCache(ttl_seconds=10_000)
    first = cache.get("base", build)
    first.count()
    cache.invalidate("base")
    assert first.storageLevel == StorageLevel.NONE  # memory freed
    second = cache.get("base", build)
    assert calls["n"] == 2 and second is not first
    # the rebuilt frame is a fresh persisted scan, not the dropped cache
    assert second.storageLevel.useMemory
    cache.invalidate()
