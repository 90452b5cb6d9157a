"""Interleaved A/B for queries whose ONLY change this session was
added localCheckpoint materialization: arm A monkeypatches
DataFrame.localCheckpoint to identity (reproducing the old lazy code
exactly — valid only for queries that had no checkpoints before), arm
B runs the real code.

    python tools/ab_ckpt.py [--n 3] query [query ...]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("--")]
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])
        names.remove(str(n))

    os.environ.setdefault("SPARK_GRAFT_QUIET_WINDOWEXEC", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import DataFrame

    import __spark_entry__ as entry_mod
    from decisions_kinesis_spark.session import get_session

    spark = get_session(app_name="dks-ab-ckpt")
    spark.range(1000).selectExpr("sum(id)").collect()
    qs = entry_mod.queries()

    real_lc = DataFrame.localCheckpoint

    def run(fn, lazy: bool) -> float:
        if lazy:
            DataFrame.localCheckpoint = lambda self, eager=True: self
        try:
            t0 = time.perf_counter()
            fn(spark, sf_dir).write.format("noop").mode("overwrite").save()
            return time.perf_counter() - t0
        finally:
            DataFrame.localCheckpoint = real_lc

    for name in names:
        fn = qs[name]
        try:
            DataFrame.localCheckpoint = lambda self, eager=True: self
            ra = sorted(map(tuple, fn(spark, sf_dir).collect()))
        finally:
            DataFrame.localCheckpoint = real_lc
        rb = sorted(map(tuple, fn(spark, sf_dir).collect()))
        assert ra == rb, f"{name}: values differ between arms!"
        lazy_t, ckpt_t = [], []
        for _ in range(n):
            lazy_t.append(run(fn, True))
            ckpt_t.append(run(fn, False))
        print(
            f"{name:34s} rows ok ({len(ra)})  "
            f"lazy best {min(lazy_t):6.3f} {[round(x,2) for x in lazy_t]}  "
            f"ckpt best {min(ckpt_t):6.3f} {[round(x,2) for x in ckpt_t]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
