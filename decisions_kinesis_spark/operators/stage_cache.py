"""Session-scoped memo for expensive stage outputs shared by
composition queries (VERDICT r4 "what's wrong" #1/#2).

Composition queries (``corpus_funnel_report``, ``dedup_cluster_stats``,
``ann_recall_at_k``) re-run their stage pipelines on every call — the
single-source-of-truth design keeps one definition per stage, but a
bench or report session that constructs the same composition twice pays
the full stage cost each time.  This memo keys a builder's result by
(applicationId, stage name, dataset key) so repeated constructions in
one session reuse the materialized stage.

Contract and bounds:

- Builders materialize their own result (``localCheckpoint(eager=True)``
  on the frame they return), so cache hits are scan-only; this means a
  cache MISS runs Spark jobs at DataFrame-CONSTRUCTION time (the same
  documented side effect the decontam eval-gram probe has had since
  round 4).
- Entries from other sessions (different applicationId) are evicted on
  every access: their checkpoint RDDs died with the session, and
  dropping the Python refs lets the ContextCleaner reclaim anything
  still live.  A stopped-and-restarted session therefore never serves
  stale frames.
- The memo is LRU-bounded at ``_MAX_ENTRIES``; a long-lived session
  sweeping many sf_dirs (the ADVICE r4 leak scenario for the old
  ``_EVAL_GRAMS_CACHE``) tops out at 24 pinned stage frames instead of
  growing without bound.  ``clear()`` drops everything explicitly.

Standalone stage queries do NOT consult this cache: each direct call to
e.g. ``quality_gopher_flags`` recomputes, so bench per-query numbers
keep measuring the operator, not the memo.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from collections.abc import Callable, Sequence

from pyspark.sql import SparkSession

_CACHE: OrderedDict[tuple[str, str, str], object] = OrderedDict()
_MAX_ENTRIES = 24

#: bookkeeping lock (cache dict + key-lock table); never held while a
#: builder runs, so concurrent builds of DIFFERENT keys proceed freely
_LOCK = threading.Lock()
#: per-key build locks: two threads asking for the SAME missing key run
#: the builder once (the second blocks, then reads the memo)
_KEY_LOCKS: dict[tuple[str, str, str], threading.Lock] = {}


def _lookup(key: tuple[str, str, str]) -> tuple[bool, object]:
    with _LOCK:
        app = key[0]
        for k in [k for k in _CACHE if k[0] != app]:
            del _CACHE[k]
            _KEY_LOCKS.pop(k, None)
        if key in _CACHE:
            _CACHE.move_to_end(key)
            return True, _CACHE[key]
        return False, None


def get_or_build(
    spark: SparkSession, name: str, dataset_key: str, builder: Callable[[], object]
) -> object:
    """Return the memoized value for (current session, name, dataset_key),
    building (and thereby materializing) it on first use."""
    key = (spark.sparkContext.applicationId, name, dataset_key)
    hit, val = _lookup(key)
    if hit:
        return val
    with _LOCK:
        key_lock = _KEY_LOCKS.setdefault(key, threading.Lock())
    with key_lock:
        hit, val = _lookup(key)  # built while we waited for the lock
        if hit:
            return val
        val = builder()
        with _LOCK:
            _CACHE[key] = val
            # key locks OUTLIVE LRU eviction (ADVICE r13): popping a
            # lock another thread still waits on would let two builders
            # run concurrently for one key after re-request.  Locks are
            # dropped only by clear() and cross-session eviction (the
            # old app's builders are gone with its JVM).
            while len(_CACHE) > _MAX_ENTRIES:
                _CACHE.popitem(last=False)
    return val


def build_many(
    spark: SparkSession,
    specs: Sequence[tuple[str, str, Callable[[], object]]],
    max_workers: int = 6,
) -> list[object]:
    """get_or_build every (name, dataset_key, builder) spec, running the
    cache MISSES concurrently from a small driver thread pool (guide
    §2.6 — overlap independent jobs): each builder eager-materializes
    its own frame, and Spark back-fills one stage's straggler tail with
    the next stage's tasks instead of serializing whole jobs.  Results
    come back in spec order; values are identical to sequential builds
    (each stage is an independent pipeline — only the job overlap
    changes).  A handful of in-flight jobs is plenty; more just fight
    for executor slots.  Width 6 (r14): at 4, the 5-gate funnel and the
    8-tail recall composition serialized their overflow specs behind
    the pool — measured interleaved ×4, corpus_funnel_report best
    3.30 → 3.03 s and spread 3.3-4.6 → 3.0-3.2 at width 6."""
    from concurrent.futures import ThreadPoolExecutor

    from pyspark import inheritable_thread_target

    missing = [
        i
        for i, (name, dkey, _) in enumerate(specs)
        if not _lookup((spark.sparkContext.applicationId, name, dkey))[0]
    ]
    if len(missing) > 1:
        wrap = inheritable_thread_target(spark)  # session form inherits tags
        if not callable(wrap):  # classic mode returns the session itself
            wrap = lambda f: f
        with ThreadPoolExecutor(
            max_workers=min(len(missing), max_workers)
        ) as pool:
            futures = [
                pool.submit(
                    wrap(
                        lambda s=specs[i]: get_or_build(spark, s[0], s[1], s[2])
                    )
                )
                for i in missing
            ]
            for f in futures:  # surface the first builder error verbatim
                f.result()
    return [get_or_build(spark, n, d, b) for n, d, b in specs]


def clear() -> None:
    """Drop every memoized stage frame (checkpoint RDDs are reclaimed by
    the ContextCleaner once the refs drop)."""
    with _LOCK:
        _CACHE.clear()
        _KEY_LOCKS.clear()
