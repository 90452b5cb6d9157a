"""Whole-query hypothesis differential for ``orders_km_logrank``:
random two-arm order/lineitem tables through the operator vs an
independent pure-Python reference of the censoring contract and the
hypergeometric O/E/V accumulation with the identical truncating
division sites — including exhausted-arm days (n_A = 0 → E = V = 0),
the n ≥ 2 variance guard, and the V = 0 → NULL χ² degenerate."""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.analytics_ext import (
    _KM_CENSOR_DAYS,
    _LOGRANK_A,
    _LOGRANK_B,
    orders_km_logrank,
)

_T0 = dt.datetime(2026, 9, 1)

_order = st.tuples(
    st.sampled_from([_LOGRANK_A, _LOGRANK_B, "3-MEDIUM"]),
    st.integers(min_value=0, max_value=30),
    st.lists(
        st.integers(min_value=-10, max_value=100), min_size=1, max_size=3
    ),
)


def _ref(items):
    ship0 = {k: min(s) for k, (_p, _od, s) in enumerate(items)}
    cut = max(s for _p, _od, ss in items for s in ss) - _KM_CENSOR_DAYS
    days: dict = {}
    na0 = nb0 = 0
    for k, (p, od, _s) in enumerate(items):
        if p not in (_LOGRANK_A, _LOGRANK_B) or od > cut:
            continue
        arm_a = p == _LOGRANK_A
        if ship0[k] <= cut:
            t, ev = ship0[k] - od, True
        else:
            t, ev = cut - od, False
        d = days.setdefault(t, [0, 0, 0, 0])  # da, ca, db, cb
        d[(0 if ev else 1) + (0 if arm_a else 2)] += 1
        na0 += arm_a
        nb0 += not arm_a
    if na0 + nb0 == 0:
        return None
    if all(d[0] + d[2] == 0 for d in days.values()):
        # engine contract (both sides): a study with qualifying orders
        # but zero EVENT days yields zero rows — every term row is
        # filtered by `da + db > 0`, so the global aggregate's o_a is
        # NULL and the final `o_a IS NOT NULL` drops it.  (Found by
        # hypothesis: single all-censored one-arm study.)
        return None
    o = e = v = 0
    na, nb = na0, nb0
    for t in sorted(days):
        da, ca, db, cb = days[t]
        d = da + db
        n = na + nb
        if d > 0:
            o += da
            e += tdiv(d * na * 1_000_000, n)
            if n >= 2:
                v += tdiv(
                    d * na * nb * (n - d) * 1_000_000, n * n * (n - 1)
                )
        na -= da + ca
        nb -= db + cb
    chi2 = None if v == 0 else tdiv((o * 1_000_000 - e) ** 2, v)
    return (_LOGRANK_A, _LOGRANK_B, o, e, v, chi2)


@settings(max_examples=6, deadline=None)
@given(items=st.lists(_order, min_size=1, max_size=8))
def test_logrank_matches_python_reference(spark, tmp_path_factory, items):
    d = tmp_path_factory.mktemp("lrfix")
    pq.write_table(
        pa.table(
            {
                "o_orderkey": pa.array(range(len(items)), pa.int64()),
                "o_orderpriority": pa.array([p for p, _o, _s in items]),
                "o_orderdate": pa.array(
                    [_T0 + dt.timedelta(days=o) for _p, o, _s in items],
                    pa.timestamp("us"),
                ),
            }
        ),
        str(d / "orders.parquet"),
    )
    keys, ships = [], []
    for k, (_p, _o, ss) in enumerate(items):
        for s in ss:
            keys.append(k)
            ships.append(_T0 + dt.timedelta(days=s))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(keys, pa.int64()),
                "l_shipdate": pa.array(ships, pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )

    rows = orders_km_logrank(spark, str(d)).collect()
    expect = _ref(items)
    if expect is None:
        assert rows == []
        return
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["arm_a"], r["arm_b"], r["o_a"], r["e_a_ppm"], r["v_ppm"],
        r["chi2_ppm"],
    ) == expect
