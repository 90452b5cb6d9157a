"""Whole-query hypothesis differential for ``events_cuped_ab``: random
event streams (quarter-valued metrics so the decimal sums are exact)
run through the operator and an independent pure-Python reference that
replays the µs-midpoint cutover, per-(user, period) quantized means,
pooled-θ moments, per-user adjustment, and per-arm readout with the
identical truncating-division sites — including the degenerate cases
(no user with both periods → empty; zero pre-period variance → θ=0;
single-user arms → NULL variance reduction)."""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.analytics_ext import events_cuped_ab

_T0 = dt.datetime(2026, 7, 1)
_US0 = int(_T0.timestamp() * 1_000_000)

_values = st.integers(min_value=-4000, max_value=4000).map(lambda i: i / 4)
_event = st.tuples(
    st.integers(min_value=1, max_value=3),
    st.integers(min_value=0, max_value=1000),
    _values,
)


def _arm(user: int) -> str:
    h = int(hashlib.md5(str(user).encode()).hexdigest()[:15], 16)
    return "A" if h % 2 == 0 else "B"


def _ref(rows):
    us = [_US0 + off * 1_000_000 for _u, off, _v in rows]
    cut = tdiv(min(us) + max(us), 2)
    per: dict = {}
    for (u, off, v), t in zip(rows, us):
        key = (u, t < cut)
        n, s = per.get(key, (0, 0.0))
        per[key] = (n + 1, s + v)  # quarters: float sum is exact

    def q(key):
        n, s = per[key]
        return int(math.floor(s / n * 10000 + 0.5))

    xy = [
        (u, q((u, True)), q((u, False)))
        for u in {u for u, _o, _v in rows}
        if (u, True) in per and (u, False) in per
    ]
    if not xy:
        return {}
    n = len(xy)
    sx = sum(x for _u, x, _y in xy)
    sy = sum(y for _u, _x, y in xy)
    sxy = sum(x * y for _u, x, y in xy)
    sxx = sum(x * x for _u, x, _y in xy)
    var_n = n * sxx - sx * sx
    theta = 0 if var_n == 0 else tdiv((n * sxy - sx * sy) * 1_000_000, var_n)
    xbar = tdiv(sx * 1_000_000, n)
    arms: dict = {}
    for u, x, y in xy:
        yu = y * 1_000_000
        adj = yu - tdiv(theta * (x * 1_000_000 - xbar), 1_000_000)
        arms.setdefault(_arm(u), []).append((yu, adj))
    out = {}
    for a, vals in arms.items():
        m = len(vals)
        syu = sum(v[0] for v in vals)
        sau = sum(v[1] for v in vals)
        vy = m * sum(v[0] * v[0] for v in vals) - syu * syu
        va = m * sum(v[1] * v[1] for v in vals) - sau * sau
        red = None if vy == 0 else tdiv((vy - va) * 1_000_000, vy)
        out[a] = (m, tdiv(syu, m), tdiv(sau, m), red)
    return out


@settings(max_examples=6, deadline=None)
@given(items=st.lists(_event, min_size=2, max_size=30))
def test_cuped_matches_python_reference(spark, tmp_path_factory, items):
    d = tmp_path_factory.mktemp("cupedfix")
    pq.write_table(
        pa.table(
            {
                "user_id": pa.array([u for u, _o, _v in items], pa.int64()),
                "ts": pa.array(
                    [
                        _T0 + dt.timedelta(seconds=o)
                        for _u, o, _v in items
                    ],
                    pa.timestamp("us"),
                ),
                "value": pa.array([v for _u, _o, v in items], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = {
        r["arm"]: (
            r["n_users"],
            r["mean_y_uppm"],
            r["mean_adj_uppm"],
            r["var_reduction_ppm"],
        )
        for r in events_cuped_ab(spark, str(d)).collect()
    }
    assert got == _ref(items)
