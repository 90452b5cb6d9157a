"""Whole-query hypothesis differential for the Kaplan–Meier family:
random small order/lineitem tables (multi-line orders, negative lead
times, orders placed after the cutoff, censor-only days) are run
through ``orders_kaplan_meier_ship`` and ``orders_km_by_priority`` and
compared against an independent pure-Python reference that replays the
censoring contract and the truncating product-limit fold with plain
integers — engine-independent ground truth for the shared
``_km_study`` / ``_km_fold_curve`` machinery.
"""

from __future__ import annotations

import datetime as dt

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.analytics_ext import (
    _KM_CENSOR_DAYS,
    orders_kaplan_meier_ship,
    orders_km_by_priority,
)

_T0 = dt.datetime(2026, 6, 1)

# one order: (priority, orderdate offset, 1-3 ship offsets — allowed
# BEFORE the orderdate: real data has negative lead times)
_order = st.tuples(
    st.sampled_from(["1-URGENT", "5-LOW"]),
    st.integers(min_value=0, max_value=30),
    st.lists(
        st.integers(min_value=-10, max_value=100), min_size=1, max_size=3
    ),
)


def _ref(items):
    """→ (global_rows, strat_rows) exactly as the operators emit."""
    ship0 = {k: min(ships) for k, (_p, _od, ships) in enumerate(items)}
    cut = max(s for _p, _od, ships in items for s in ships) - _KM_CENSOR_DAYS

    def curve(keys):
        days: dict[int, list[int]] = {}
        for k in keys:
            _prio, od, _ships = items[k]
            if od > cut:
                continue
            if ship0[k] <= cut:
                t, ev = ship0[k] - od, True
            else:
                t, ev = cut - od, False
            d = days.setdefault(t, [0, 0])
            d[0 if ev else 1] += 1
        nrem = sum(d + c for d, c in days.values())
        surv, out = 1_000_000, []
        for t in sorted(days):
            d, c = days[t]
            if d > 0:
                surv = tdiv(surv * (nrem - d), nrem)
            out.append((t, nrem, d, c, surv))
            nrem -= d + c
        return out

    glob = curve(range(len(items)))
    strat = {
        p: curve([k for k, (kp, _o, _s) in enumerate(items) if kp == p])
        for p in {p for p, _o, _s in items}
    }
    return glob, {p: rows for p, rows in strat.items() if rows}


@settings(max_examples=6, deadline=None)
@given(items=st.lists(_order, min_size=1, max_size=6))
def test_km_family_matches_python_reference(
    spark, tmp_path_factory, items
):
    d = tmp_path_factory.mktemp("kmfix")
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
    li_keys, li_ships = [], []
    for k, (_p, _o, ships) in enumerate(items):
        for s in ships:
            li_keys.append(k)
            li_ships.append(_T0 + dt.timedelta(days=s))
    pq.write_table(
        pa.table(
            {
                "l_orderkey": pa.array(li_keys, pa.int64()),
                "l_shipdate": pa.array(li_ships, pa.timestamp("us")),
            }
        ),
        str(d / "lineitem.parquet"),
    )

    exp_glob, exp_strat = _ref(items)
    got_glob = sorted(
        (r["t_days"], r["n_at_risk"], r["n_events"], r["n_censored"],
         r["surv_ppm"])
        for r in orders_kaplan_meier_ship(spark, str(d)).collect()
    )
    assert got_glob == exp_glob

    got_strat: dict = {}
    for r in orders_km_by_priority(spark, str(d)).collect():
        got_strat.setdefault(r["priority"], []).append(
            (r["t_days"], r["n_at_risk"], r["n_events"], r["n_censored"],
             r["surv_ppm"])
        )
    assert {p: sorted(v) for p, v in got_strat.items()} == exp_strat
