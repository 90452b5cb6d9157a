"""Session stage-cache contract (operators/stage_cache.py): memoization,
LRU bound, dead-session eviction, explicit clear — the ADVICE r4
leak-scenario guarantees, asserted."""

from __future__ import annotations

from decisions_kinesis_spark.operators import stage_cache


def test_stage_cache_memoizes_per_key(spark):
    stage_cache.clear()
    calls = {"n": 0}

    def build():
        calls["n"] += 1
        return spark.range(5).localCheckpoint(eager=True)

    a = stage_cache.get_or_build(spark, "t", "k1", build)
    b = stage_cache.get_or_build(spark, "t", "k1", build)
    assert a is b and calls["n"] == 1
    c = stage_cache.get_or_build(spark, "t", "k2", build)
    assert c is not a and calls["n"] == 2
    stage_cache.clear()


def test_stage_cache_lru_bound(spark):
    stage_cache.clear()
    for i in range(stage_cache._MAX_ENTRIES + 5):
        stage_cache.get_or_build(spark, "bound", f"k{i}", lambda: object())
    assert len(stage_cache._CACHE) <= stage_cache._MAX_ENTRIES
    # the OLDEST keys were evicted, the newest retained
    app = spark.sparkContext.applicationId
    assert (app, "bound", "k0") not in stage_cache._CACHE
    assert (
        app,
        "bound",
        f"k{stage_cache._MAX_ENTRIES + 4}",
    ) in stage_cache._CACHE
    stage_cache.clear()


def test_stage_cache_evicts_dead_session_entries(spark):
    stage_cache.clear()
    stage_cache._CACHE[("dead-app-id", "x", "y")] = "stale"
    stage_cache.get_or_build(spark, "t", "k1", lambda: object())
    assert ("dead-app-id", "x", "y") not in stage_cache._CACHE
    stage_cache.clear()
    assert not stage_cache._CACHE
