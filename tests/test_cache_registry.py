"""Cache registry: session-keyed persist dedup, byte budget with LRU
unpersist, rebuild-on-next-use after eviction, on_evict callbacks."""

from __future__ import annotations

from fluss_spark import cache_registry as CR


def _storage_level_cached(df) -> bool:
    return df.storageLevel.useMemory or df.storageLevel.useDisk


def test_cache_df_dedups_and_reuses(spark):
    calls = []

    def builder():
        calls.append(1)
        return spark.range(100).selectExpr("id", "id * 2 AS y")

    key = ("test", "dedup")
    try:
        a = CR.cache_df(spark, key, builder)
        b = CR.cache_df(spark, key, builder)
        assert a is b
        assert len(calls) == 1
        assert _storage_level_cached(a)
        assert a.count() == 100
    finally:
        CR.release(spark, key)
    assert key not in CR.stats(spark)


def test_budget_lru_eviction_and_rebuild(spark, monkeypatch):
    # force a tiny budget so the second insert evicts the first
    monkeypatch.setenv("FLUSS_CACHE_BUDGET_BYTES", "1")
    evicted = []
    k1, k2 = ("test", "lru1"), ("test", "lru2")
    try:
        d1 = CR.cache_df(
            spark, k1, lambda: spark.range(1000).selectExpr("id"),
            on_evict=lambda: evicted.append(k1),
        )
        assert k1 in CR.stats(spark)
        CR.cache_df(spark, k2, lambda: spark.range(500).selectExpr("id"))
        # k1 evicted (LRU, over budget), its callback fired, k2 kept
        assert k1 not in CR.stats(spark) and k2 in CR.stats(spark)
        assert evicted == [k1]
        assert not _storage_level_cached(d1)
        # next use of k1 rebuilds (evicting k2 in turn)
        d1b = CR.cache_df(spark, k1, lambda: spark.range(1000).selectExpr("id"))
        assert d1b.count() == 1000
        assert k1 in CR.stats(spark) and k2 not in CR.stats(spark)
    finally:
        CR.release(spark, k1)
        CR.release(spark, k2)


def test_release_is_idempotent(spark):
    CR.release(spark, ("test", "never-registered"))  # no-op, no raise
