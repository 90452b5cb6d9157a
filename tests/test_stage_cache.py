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


def test_build_many_returns_spec_order_and_builds_once(spark):
    """build_many (guide §2.6 concurrent stage builds): results come
    back in spec order, each missing key's builder runs exactly once
    even when the same key appears twice in one call, and hits skip
    the pool entirely."""
    import threading

    stage_cache.clear()
    calls: dict[str, int] = {"a": 0, "b": 0, "c": 0}
    lock = threading.Lock()

    def mk(name):
        def build():
            with lock:
                calls[name] += 1
            return f"built:{name}"

        return build

    out = stage_cache.build_many(
        spark,
        [
            ("bm", "a", mk("a")),
            ("bm", "b", mk("b")),
            ("bm", "a", mk("a")),  # duplicate key in one call
            ("bm", "c", mk("c")),
        ],
    )
    assert out == ["built:a", "built:b", "built:a", "built:c"]
    assert calls == {"a": 1, "b": 1, "c": 1}
    # second call: all hits, no builder runs
    out2 = stage_cache.build_many(
        spark, [("bm", n, mk(n)) for n in ("a", "b", "c")]
    )
    assert out2 == ["built:a", "built:b", "built:c"]
    assert calls == {"a": 1, "b": 1, "c": 1}
    stage_cache.clear()


def test_build_many_propagates_builder_error(spark):
    stage_cache.clear()

    def boom():
        raise ValueError("stage exploded")

    import pytest

    with pytest.raises(ValueError, match="stage exploded"):
        stage_cache.build_many(
            spark,
            [("bmerr", "ok", lambda: 1), ("bmerr", "bad", boom)],
        )
    stage_cache.clear()


def test_checkpoint_parallel_matches_sequential(spark):
    """checkpoint_parallel returns frames with the same rows as
    sequential localCheckpoints (only job overlap changes)."""
    from decisions_kinesis_spark.functions.parallel import (
        checkpoint_parallel,
    )

    a = spark.range(10).selectExpr("id", "id * 2 as two")
    b = spark.range(5).selectExpr("id", "id * 3 as three")
    ca, cb = checkpoint_parallel(a, b)
    assert sorted(map(tuple, ca.collect())) == sorted(
        map(tuple, a.collect())
    )
    assert sorted(map(tuple, cb.collect())) == sorted(
        map(tuple, b.collect())
    )
