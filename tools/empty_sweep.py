"""Empty-input robustness sweep: run every registered query against a
0-row copy of all ten tables (schemas preserved, incl. the NANOS ts)
and report which queries crash instead of returning an empty (or
well-defined) result.

Empty inputs are the realistic degenerate at scale — a filter that
eliminates everything, a partition with no data, a type absent from a
slice — so a query that throws on 0 rows hides a production failure
mode.  Usage: python tools/empty_sweep.py [empty_sf_dir]
"""

from __future__ import annotations

import os
import sys
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    empty_dir = (
        sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.empty_sf"
    )
    import __spark_entry__ as entry
    from decisions_kinesis_spark.session import get_session

    spark = get_session(app_name="empty-sweep")
    ok, failed = [], {}
    for name, fn in entry.queries().items():
        try:
            n = fn(spark, empty_dir).count()
            ok.append((name, n))
        except Exception as e:
            failed[name] = f"{type(e).__name__}: {str(e).splitlines()[0][:160]}"
        sys.stdout.write(".")
        sys.stdout.flush()
    print()
    for name, err in sorted(failed.items()):
        print(f"✗ {name}: {err}")
    nonzero = [(n, c) for n, c in ok if c > 0]
    print(f"\nok={len(ok)} (nonzero-rows: {nonzero}) failed={len(failed)}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
