"""Per-query profiling harness (optimization round): decomposes one
query's wall time into plan-construction (Python + analysis), and
execution (noop sink), and counts the Spark jobs/stages/tasks the run
launched.  Usage:

    python tools/profile_query.py q1_pricing_summary ann_recall_at_k ...
    python tools/profile_query.py --all          # every registered query
    python tools/profile_query.py --repeat 3 name

Prints one line per query:
    name  build_s  exec_cold_s  exec_warm_s  jobs  stages  tasks

Methodology follows the bench: memo caches cleared before every pass so
the numbers measure operators, not memos; noop sink per guide §1.4.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    do_all = "--all" in sys.argv
    repeat = 1
    if "--repeat" in sys.argv:
        repeat = int(sys.argv[sys.argv.index("--repeat") + 1])
        args.remove(str(repeat))

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.environ.setdefault("SPARK_GRAFT_QUIET_WINDOWEXEC", "1")

    import __spark_entry__ as entry_mod
    from decisions_kinesis_spark.session import get_session

    spark = get_session(app_name="dks-profile")
    sc = spark.sparkContext
    spark.range(1000).selectExpr("sum(id)").collect()

    qs = entry_mod.queries()
    names = list(qs) if do_all else args

    def _clear_memos() -> None:
        from decisions_kinesis_spark.operators import stage_cache
        from decisions_kinesis_spark.operators.clustering import _KM_LOOP_CACHE

        stage_cache.clear()
        _KM_LOOP_CACHE.clear()

    tracker = sc.statusTracker()

    # stream-bandwidth gauge (bench.py's certifying probe): prints with
    # every row so stall-poisoned measurements are visible
    import array as _array

    _n = 64 * 1024 * 1024
    _src = bytes(_n)
    _dst = memoryview(bytearray(_n))
    _dst[:] = _src

    def _bw() -> float:
        t0 = time.perf_counter()
        for _ in range(3):
            _dst[:] = _src
        return round(3 * 2 * _n / (time.perf_counter() - t0) / 1e9, 1)

    # untimed warm-up at the smallest fixture (the bench protocol):
    # JIT/codegen/Arrow/worker-pool costs stay out of the timed passes
    warm_dir = "/root/testdata/sf0.001"

    def _job_info(group):
        ids = tracker.getJobIdsForGroup(group)
        stages = 0
        tasks = 0
        for jid in ids:
            ji = tracker.getJobInfo(jid)
            if ji is None:
                continue
            stages += len(ji.stageIds)
            for sid in ji.stageIds:
                si = tracker.getStageInfo(sid)
                if si is not None:
                    tasks += si.numTasks
        return len(ids), stages, tasks

    print(
        f"{'query':44s} {'build':>7} {'cold':>7} {'warm':>7}"
        f" {'jobs':>5} {'stage':>5} {'tasks':>6}"
    )
    results = {}
    for name in names:
        fn = qs[name]
        try:
            if os.path.isdir(warm_dir) and os.path.abspath(
                warm_dir
            ) != os.path.abspath(sf_dir):
                try:
                    _clear_memos()
                    fn(spark, warm_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                except Exception:  # noqa: BLE001 - warm-up must never sink
                    pass
            # --- build + cold exec (separate job group so counts are ours)
            _clear_memos()
            sc.setJobGroup(f"prof:{name}", f"{name}:cold")
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t_build = time.perf_counter() - t0
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            t_cold = time.perf_counter() - t0
            # --- warm pass with job counting (fresh group id per pass)
            best_warm = None
            for _ in range(repeat):
                _clear_memos()
                sc.setJobGroup("prof2", f"{name}:warm")
                sc.setJobDescription(name)
                t0 = time.perf_counter()
                df2 = fn(spark, sf_dir)
                df2.write.format("noop").mode("overwrite").save()
                w = time.perf_counter() - t0
                if best_warm is None or w < best_warm:
                    best_warm = w
            # job counts from the COLD pass group (includes build-time jobs)
            jobs, stages, tasks = _job_info(f"prof:{name}")
        except Exception as exc:  # noqa: BLE001
            print(f"{name:44s} ERROR {type(exc).__name__}: {exc}", flush=True)
            continue
        print(
            f"{name:44s} {t_build:7.3f} {t_cold:7.3f} {best_warm:7.3f}"
            f" {jobs:5d} {stages:5d} {tasks:6d}  bw={_bw()}",
            flush=True,
        )
        results[name] = {
            "build": round(t_build, 3),
            "cold": round(t_cold, 3),
            "warm": round(best_warm, 3),
            "jobs": jobs,
            "stages": stages,
            "tasks": tasks,
        }
    with open("/tmp/profile_results.json", "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
