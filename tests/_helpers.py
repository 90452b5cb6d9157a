"""Shared pure-python reference implementations for differential
tests (importable because pytest puts the tests/ directory on
sys.path via rootdir insertion — no package needed).

These deliberately use python's arbitrary-precision integers so they
are INDEPENDENT of both engines; keep them dumb and textbook-shaped.
"""

from __future__ import annotations

import duckdb


def tdiv(a: int, b: int) -> int:
    """Truncate-toward-zero integer division — the semantics BOTH
    engines use (Spark ``div``, DuckDB ``//``; verified −7/2 → −3),
    correct for either operand sign."""
    q = abs(a) // abs(b)
    return -q if (a < 0) != (b < 0) else q


def hourly_counts(sf_dir: str) -> dict[str, list[int]]:
    """Per event type, the hourly count series in bucket order."""
    con = duckdb.connect()
    rows = con.execute(
        f"""
        SELECT event_type, date_trunc('hour', ts) AS b,
               count(*)::BIGINT AS n
        FROM read_parquet('{sf_dir}/events.parquet')
        GROUP BY 1, 2 ORDER BY 1, 2
        """
    ).fetchall()
    series: dict[str, list[int]] = {}
    for etype, _b, n in rows:
        series.setdefault(etype, []).append(n)
    return series


def cusum_fold(xs: list[int]) -> tuple[int, int, int, int, bool]:
    """Textbook one-sided CUSUM recursion with the engine's target/
    slack/threshold policy; returns (n_buckets, tgt, final, max,
    breached)."""
    tgt = sum(xs) // len(xs)
    slack = tgt // 10
    s = m = 0
    for x in xs:
        s = max(0, s + x - tgt - slack)
        m = max(m, s)
    return len(xs), tgt, s, m, m >= 3 * tgt
