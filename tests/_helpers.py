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


def acf_from_state(state: dict, types, max_lag: int) -> dict:
    """Independent ACF derivation from accumulated (type, hour) → n
    state (nonzero counts only): densify on the declared-∪-observed
    type axis over the global observed hour span, then the textbook
    mean-centered estimator in exact integer arithmetic
    (d_t = n·c_t − S; ppm via tdiv) — independent of the DataFrame
    formulation's n-scaling algebra."""
    import datetime as dt

    hours = sorted({b for (_t, b) in state})
    if not hours:
        return {}
    span = [hours[0]]
    while span[-1] < hours[-1]:
        span.append(span[-1] + dt.timedelta(hours=1))
    axis = sorted(set(types) | {t for (t, _b) in state})
    out: dict = {}
    for t in axis:
        cs = [state.get((t, b), 0) for b in span]
        n = len(cs)
        s = sum(cs)
        d = [n * c - s for c in cs]
        den = sum(x * x for x in d)
        for k in range(1, max_lag + 1):
            if n <= k:
                continue  # no (t, t−k) pairs -> the engines emit no row
            if den == 0:
                out[(t, k)] = None
            else:
                out[(t, k)] = tdiv(
                    sum(d[i] * d[i - k] for i in range(k, n)) * 1_000_000,
                    den,
                )
    return out


def stage_file(df, src_dir: str, name: str, mtime: float) -> None:
    """Write a single-file parquet micro-batch into a stream source
    dir with a controlled mtime (shared by every streaming
    equivalence-proof test)."""
    import os
    import shutil

    tmp = os.path.join(src_dir, f"_tmp_{name}")
    df.coalesce(1).write.parquet(tmp)
    part = next(f for f in os.listdir(tmp) if f.endswith(".parquet"))
    dest = os.path.join(src_dir, name)
    shutil.move(os.path.join(tmp, part), dest)
    shutil.rmtree(tmp)
    os.utime(dest, (mtime, mtime))


def ccf_from_state(state: dict, types, max_lag: int) -> dict:
    """Independent CCF derivation from accumulated (type, hour) → n
    state: the same densified n-scale-centered series as
    ``acf_from_state``, then for every ORDERED pair (lead, lag) and
    k, ``floor(num/√(den_a·den_b)·10⁶ + 0.5)`` replayed with the
    engines' exact double op sequence (int→float casts, product,
    sqrt, division, floor — each correctly rounded)."""
    import datetime as dt
    import math

    hours = sorted({b for (_t, b) in state})
    if not hours:
        return {}
    span = [hours[0]]
    while span[-1] < hours[-1]:
        span.append(span[-1] + dt.timedelta(hours=1))
    axis = sorted(set(types) | {t for (t, _b) in state})
    d: dict = {}
    den: dict = {}
    for t in axis:
        cs = [state.get((t, b), 0) for b in span]
        n = len(cs)
        s = sum(cs)
        d[t] = [n * c - s for c in cs]
        den[t] = sum(x * x for x in d[t])
    out: dict = {}
    n = len(span)
    for a in axis:
        for b in axis:
            if a == b:
                continue
            for k in range(0, max_lag + 1):
                if n <= k:
                    continue
                if den[a] == 0 or den[b] == 0:
                    out[(a, b, k)] = None
                    continue
                num = sum(
                    d[a][i - k] * d[b][i] for i in range(k, n)
                )
                out[(a, b, k)] = int(
                    math.floor(
                        float(num)
                        / math.sqrt(float(den[a]) * float(den[b]))
                        * 1000000
                        + 0.5
                    )
                )
    return out


def tdigest_recluster(cents: list[tuple]) -> list[tuple]:
    """Pure-python reference for the log₂-tail recluster rule
    (sketches_ext._recluster): centroids (w, vs, vmin, vmax) sorted by
    full payload in mean order, bucketed by the tail-distance level of
    twice-the-midpoint-rank.  Returns [(bkey, w, vs, vmin, vmax)]
    sorted by bkey.  Raw rows enter as weight-1 centroids, so this one
    function is both "build digest" and "merge digests"."""
    if not cents:
        return []
    order = sorted(
        cents, key=lambda c: (tdiv(c[1], c[0]), c[2], c[3], c[1], c[0])
    )
    nn = sum(c[0] for c in order)
    lmax = ((nn - 1) // 2 + 1).bit_length() - 1
    out: dict[int, list[int]] = {}
    wb = 0
    for w, vs, vmin, vmax in order:
        rm2 = 2 * wb + w - 1
        d = min(rm2, 2 * nn - 2 - rm2) // 2
        lvl = (d + 1).bit_length() - 1
        bkey = lvl if rm2 <= nn - 1 else 2 * lmax - lvl
        b = out.setdefault(bkey, [0, 0, vmin, vmax])
        b[0] += w
        b[1] += vs
        b[2] = min(b[2], vmin)
        b[3] = max(b[3], vmax)
        wb += w
    return [(k, b[0], b[1], b[2], b[3]) for k, b in sorted(out.items())]


def tdigest_quantile_rows(
    hour_digests: dict, exact_vals: dict, pcts=(1, 5, 25, 50, 75, 95, 99)
) -> dict:
    """Reference read path: merge per-hour digests (values of
    ``hour_digests[group] = {hr: [(bkey, w, vs, vmin, vmax)]}``) with
    one recluster pass, then the rank-covering quantile estimates plus
    the exact calibration from ``exact_vals[group]`` (the full value
    multiset).  Returns {(group, pct): (n_rows, n_centroids, est_cents,
    exact_cents, err_ppm)} matching sketch_tdigest_quantiles rows."""
    out = {}
    for g, by_hr in hour_digests.items():
        flat = [
            (w, vs, vmin, vmax)
            for cl in by_hr.values()
            for _bk, w, vs, vmin, vmax in cl
        ]
        merged = tdigest_recluster(flat)
        n = sum(w for _bk, w, *_ in merged)
        full = sorted(exact_vals[g])
        assert n == len(full)
        for p in pcts:
            t = ((n - 1) * p) // 100
            wb = 0
            for _bk, w, vs, _vmin, _vmax in merged:
                if wb <= t < wb + w:
                    est = tdiv(vs, w)
                    break
                wb += w
            exact = full[t]
            err = None if exact == 0 else tdiv((est - exact) * 1_000_000, exact)
            out[(g, p)] = (n, len(merged), est, exact, err)
    return out
