"""Whole-query hypothesis differential for ``events_gapfill_interp``:
random sparse hourly streams (quarter-valued metrics → exact decimal
sums) run through the operator and an independent pure-Python
reference of the dense grid, ×10⁴ quantization, and truncating-
division lerp — covering negative slopes, multi-hour gaps, and
single-bucket types (grid of one, nothing to interpolate)."""

from __future__ import annotations

import datetime as dt
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.windows_ext import (
    events_gapfill_interp,
)

_T0 = dt.datetime(2026, 8, 1)

_values = st.integers(min_value=-4000, max_value=4000).map(lambda i: i / 4)
_event = st.tuples(
    st.sampled_from("AB"),
    st.integers(min_value=0, max_value=10),
    _values,
)


def _ref(items):
    buckets: dict = {}
    for t, h, v in items:
        n, s = buckets.get((t, h), (0, 0.0))
        buckets[(t, h)] = (n + 1, s + v)  # quarters sum exactly
    out = {}
    for typ in {t for t, _h, _v in items}:
        hs = sorted(h for t, h in buckets if t == typ)
        ys = {
            h: int(math.floor(buckets[(typ, h)][1] / buckets[(typ, h)][0]
                              * 10000 + 0.5))
            for h in hs
        }
        for g, h in enumerate(range(hs[0], hs[-1] + 1), start=1):
            if h in ys:
                out[(typ, h)] = (buckets[(typ, h)][0], ys[h], ys[h], False)
            else:
                hp = max(x for x in hs if x < h)
                hn = min(x for x in hs if x > h)
                # grid ticks are dense ranks, so t deltas equal hour
                # deltas inside the span
                interp = ys[hp] + tdiv(
                    (ys[hn] - ys[hp]) * (h - hp), hn - hp
                )
                out[(typ, h)] = (0, None, interp, True)
    return out


@settings(max_examples=6, deadline=None)
@given(items=st.lists(_event, min_size=1, max_size=25))
def test_gapfill_interp_matches_python_reference(
    spark, tmp_path_factory, items
):
    d = tmp_path_factory.mktemp("gapfix")
    pq.write_table(
        pa.table(
            {
                "event_type": pa.array([t for t, _h, _v in items]),
                "ts": pa.array(
                    [
                        _T0 + dt.timedelta(hours=h, minutes=5)
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
        (r["event_type"], r["bucket_ts"].hour): (
            r["n_events"], r["avg_q4"], r["interp_q4"], r["gap_filled"],
        )
        for r in events_gapfill_interp(spark, str(d)).collect()
    }
    assert got == _ref(items)
