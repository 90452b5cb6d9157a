"""Whole-query hypothesis differential for ``events_theil_sen_trend``:
the full pipeline (hourly ×10⁴-quantized means, per-type bucket ranks,
all C(n,2) truncating-division pairwise slopes, lower-median selection
under (slope, x1, x2) order, residual-median intercept) is checked
against an independent pure-Python reference over randomized streams.

Values are constrained to multiples of 0.25 so the engine's
``cast(double as decimal(18,4))`` sum is exact and the reference can
use plain ``Fraction``-free integer arithmetic — every step after the
shared float mean division is integers in both worlds.
"""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.analytics_ext import (
    events_theil_sen_trend,
)

_T0 = dt.datetime(2026, 5, 1, 0, 0, 0)

# multiples of 0.25: decimal(18,4) casts and sums are exact, so the
# reference's float(sum)/n division is the identical IEEE op
_values = st.integers(min_value=-4000, max_value=4000).map(lambda i: i / 4)


def _py_reference(rows):
    """rows: [(type, hour_offset, value)] → {type: (n_points, n_pairs,
    slope_ppm, intercept_ppm)}; types with <2 buckets are absent."""
    buckets: dict[tuple, list[float]] = {}
    for typ, hh, val in rows:
        buckets.setdefault((typ, hh), []).append(val)
    series: dict[str, list[int]] = {}
    for (typ, hh) in sorted(buckets):
        vals = buckets[(typ, hh)]
        mean = float(sum(vals)) / len(vals)  # exact: quarters sum exactly
        series.setdefault(typ, []).append(
            int(math.floor(mean * 10000 + 0.5))
        )
    out = {}
    for typ, ys in series.items():
        n = len(ys)
        if n < 2:
            continue
        slopes = sorted(
            (tdiv((ys[j] - ys[i]) * 1_000_000, j - i), i + 1, j + 1)
            for i in range(n)
            for j in range(i + 1, n)
        )
        m = len(slopes)
        slope = slopes[(m + 1) // 2 - 1][0]
        resid = sorted(
            (y * 1_000_000 - slope * x, x)
            for x, y in enumerate(ys, start=1)
        )
        out[typ] = (n, m, slope, resid[(n + 1) // 2 - 1][0])
    return out


@settings(max_examples=6, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.sampled_from("AB"),
            st.integers(min_value=0, max_value=12),
            _values,
        ),
        min_size=2,
        max_size=40,
    )
)
def test_theil_sen_matches_python_reference(spark, tmp_path_factory, items):
    d = tmp_path_factory.mktemp("tsfix")
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([t for t, _h, _v in items]),
                "ts": pa.array(
                    [
                        _T0 + dt.timedelta(hours=h, minutes=17)
                        for _t, h, _v in items
                    ],
                    pa.timestamp("us"),
                ),
                "value": pa.array([v for _t, _h, v in items], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = {
        r["event_type"]: (
            r["n_points"],
            r["n_pairs"],
            r["slope_ppm"],
            r["intercept_ppm"],
        )
        for r in events_theil_sen_trend(spark, str(d)).collect()
    }
    assert got == _py_reference(items)
