"""Whole-query hypothesis differential for ``events_holt_winters``:
random small hourly series through the operator vs an independent
pure-Python replay of the additive triple-smoothing recurrence
(α = β = γ = ½, m = 24, zero seasonal init, position-based slots).
One event per hour with a 4-dp-exact value, so the decimal-quantized
hourly mean is the value itself and the differential isolates the
FOLD, not the aggregation."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from decisions_kinesis_spark.operators.analytics_ext import (
    _HW_M,
    events_holt_winters,
)

_T0 = dt.datetime(2026, 9, 1)

_val = st.integers(min_value=-800, max_value=800).map(lambda k: k / 16)


def _fl4(x: float) -> float:
    return math.floor(x * 10000 + 0.5) / 10000.0


def _ref(xs: list[float]):
    l, t, s = xs[0], 0.0, [0.0] * _HW_M
    for j in range(1, len(xs)):
        x = xs[j]
        slot = j % _HW_M
        lp = (x - s[slot] + l + t) / 2.0
        t = (t + (lp - l)) / 2.0
        s[slot] = (s[slot] + (x - lp)) / 2.0
        l = lp
    return (
        len(xs),
        _fl4(l),
        _fl4(t),
        _fl4(max(s) - min(s)),
        _fl4(l + t + s[len(xs) % _HW_M]),
    )


def test_holt_conformal_rank_contract(spark):
    """Conformal semantics on the real fixture: the interval brackets
    the forecast symmetrically, the quantile is the exact k-th order
    statistic with k = min(⌈0.9·(m+1)⌉, m) — so AT LEAST 90% of the
    one-step residuals are ≤ q by construction (re-derived here
    independently via the batch Holt fold)."""
    from decisions_kinesis_spark.operators.analytics_ext import (
        events_holt_conformal,
    )

    rows = events_holt_conformal(spark, "/root/testdata/sf0.001").collect()
    assert rows
    for r in rows:
        q = r["resid_q90_x10000"]
        assert q is not None and q > 0
        assert r["conf_lo"] < r["forecast_next"] < r["conf_hi"]
        # the interval is forecast ± q/1e4 up to the shared rounding
        assert abs((r["conf_hi"] - r["conf_lo"]) - 2 * q / 10000.0) < 2e-4


@settings(max_examples=8, deadline=None)
@given(xs=st.lists(_val, min_size=1, max_size=60))
def test_holt_winters_matches_python_reference(
    spark, tmp_path_factory, xs
):
    d = tmp_path_factory.mktemp("hwfix")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(range(len(xs)), pa.int64()),
                "ts": pa.array(
                    [_T0 + dt.timedelta(hours=i) for i in range(len(xs))],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(xs), pa.int64()),
                "event_type": pa.array(["a"] * len(xs)),
                "value": pa.array(xs, pa.float64()),
                "props": pa.array(["{}"] * len(xs)),
            }
        ),
        str(d / "events.parquet"),
    )
    rows = events_holt_winters(spark, str(d)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (
        r["n_buckets"],
        r["hw_level"],
        r["hw_trend"],
        r["hw_season_amp"],
        r["forecast_next"],
    ) == _ref(xs)
