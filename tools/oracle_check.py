"""Local mimic of the driver's correctness gate.

For each declared query: run the Spark DataFrame and the DuckDB oracle
SQL on the same parquet tables, then compare row count, column names,
and the order-insensitive multiset of values (exact — floats included,
which is why every query rounds double aggregates on both sides).

Usage:  python tools/oracle_check.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
from collections import Counter

import duckdb

sys.path.insert(0, "/root/repo")

TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def duck_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'"
        )
    return con


def norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 9)
    return v


def norm_row(row, cols, order):
    return tuple(norm(row[cols.index(c)]) for c in order)


def compare(name: str, spark_df, con, sql: str) -> list[str]:
    errors = []
    s_cols = list(spark_df.columns)
    s_rows = [tuple(r) for r in spark_df.collect()]
    rel = con.execute(sql)
    d_cols = [c[0] for c in rel.description]
    d_rows = rel.fetchall()
    if sorted(s_cols) != sorted(d_cols):
        errors.append(f"columns differ: spark={sorted(s_cols)} duck={sorted(d_cols)}")
        return errors
    if len(s_rows) != len(d_rows):
        errors.append(f"row count differs: spark={len(s_rows)} duck={len(d_rows)}")
    order = sorted(s_cols)
    s_set = Counter(norm_row(r, s_cols, order) for r in s_rows)
    d_set = Counter(norm_row(r, d_cols, order) for r in d_rows)
    if s_set != d_set:
        only_s = list((s_set - d_set).items())[:3]
        only_d = list((d_set - s_set).items())[:3]
        errors.append(f"values differ; spark-only={only_s} duck-only={only_d} (cols {order})")
    return errors


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import __spark_entry__ as entry_mod
    from decisions_kinesis_spark.session import get_session

    spark = get_session(app_name="oracle-check")
    queries = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    only = set(sys.argv[2:])
    con = duck_con(sf_dir)
    n_fail = 0
    for name, fn in queries.items():
        if only and name not in only:
            continue
        if name not in oracles:
            try:
                n = fn(spark, sf_dir).count()
                print(f"  {name}: NO-ORACLE rows={n}")
            except Exception as e:
                n_fail += 1
                print(f"✗ {name}: NO-ORACLE FAILED {e}")
            continue
        try:
            errs = compare(name, fn(spark, sf_dir), con, oracles[name])
        except Exception as e:
            errs = [f"exception: {type(e).__name__}: {str(e)[:300]}"]
        if errs:
            n_fail += 1
            print(f"✗ {name}:")
            for e in errs:
                print(f"    {e}")
        else:
            print(f"✓ {name}")
    print(f"\n{'FAIL' if n_fail else 'OK'} ({n_fail} failures)")
    return 1 if n_fail else 0


if __name__ == "__main__":
    raise SystemExit(main())
