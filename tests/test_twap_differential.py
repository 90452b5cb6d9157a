"""Whole-query hypothesis differential for ``events_twap_by_type``:
the full pipeline (per-user hold intervals from the (ts, event_id)
order, type attribution, ×10⁴ quantization, truncating-division TWAP
and naive mean) is checked against an independent pure-Python
reference (arbitrary-precision ints) over randomized streams —
engine-independent ground truth including tie-breaks (equal
timestamps fall back to event_id) and negative values (floor
quantization and truncate-toward-zero division are sign-sensitive in
different directions; the reference exercises both).
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
    events_twap_by_type,
)

_T0 = dt.datetime(2026, 3, 1, 12, 0, 0)

_values = st.floats(
    min_value=-999.99, max_value=999.99, allow_nan=False, allow_infinity=False
)


def _q(v: float) -> int:
    return int(math.floor(v * 10000 + 0.5))


def _py_twap_reference(rows):
    """rows: [(event_id, user, type, offset_s, value)] → {type: out}."""
    per_user: dict[int, list] = {}
    for eid, uid, typ, off, val in rows:
        per_user.setdefault(uid, []).append((off * 1_000_000, eid, typ, val))
    acc: dict[str, list[int]] = {}
    for seq in per_user.values():
        seq.sort(key=lambda t: (t[0], t[1]))
        for (us, _e, typ, val), (nus, _e2, _t2, _v2) in zip(seq, seq[1:]):
            dur = nus - us
            a = acc.setdefault(typ, [0, 0, 0, 0])
            a[0] += 1
            a[1] += dur
            a[2] += _q(val) * dur
            a[3] += _q(val)
    return {
        t: (
            n,
            hold,
            0 if hold == 0 else tdiv(wsum, hold),
            tdiv(vsum, n),
        )
        for t, (n, hold, wsum, vsum) in acc.items()
    }


@settings(max_examples=6, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.integers(min_value=1, max_value=3),
            st.sampled_from("AB"),
            st.integers(min_value=0, max_value=1000),
            _values,
        ),
        min_size=2,
        max_size=30,
    )
)
def test_twap_matches_python_reference(spark, tmp_path_factory, items):
    rows = [
        (i + 1, uid, typ, off, val)
        for i, (uid, typ, off, val) in enumerate(items)
    ]
    d = tmp_path_factory.mktemp("twapfix")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in rows], pa.int64()),
                "user_id": pa.array([r[1] for r in rows], pa.int64()),
                "event_type": pa.array([r[2] for r in rows]),
                "ts": pa.array(
                    [_T0 + dt.timedelta(seconds=r[3]) for r in rows],
                    pa.timestamp("us"),
                ),
                "value": pa.array([r[4] for r in rows], pa.float64()),
            }
        ),
        str(d / "events.parquet"),
    )
    got = {
        r["event_type"]: (
            r["n_intervals"],
            r["hold_us"],
            r["twap_x10000"],
            r["mean_x10000"],
        )
        for r in events_twap_by_type(spark, str(d)).collect()
    }
    assert got == _py_twap_reference(rows)
