"""Differentials for the deterministic Poisson bootstrap:

1. whole-query hypothesis differential — random tiny event tables
   through ``events_poisson_bootstrap`` vs an independent pure-Python
   replay of the digest slicing, CDF inversion, replicate means, and
   order statistics;
2. distribution sanity — the CDF-inversion weights over a large key
   range have mean ≈ 1 and P(w = 0) ≈ e⁻¹ (the draw really is
   Poisson(1), not just deterministic noise);
3. the threshold table matches its derivation round(CDF_k·2²⁴).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.analytics_ext import (
    _BOOT_B,
    _POIS_CDF_24,
    events_poisson_bootstrap,
)

_T0 = dt.datetime(2026, 9, 1)


def _w(event_id: int, b: int) -> int:
    d = hashlib.md5(f"{event_id}:bs{b // 5}".encode()).hexdigest()
    u = int(d[6 * (b % 5) : 6 * (b % 5) + 6], 16)
    for k, t in enumerate(_POIS_CDF_24):
        if u < t:
            return k
    return 8


def _ref(rows):
    """rows: [(event_id, event_type, value)] → expected output rows."""
    by_type: dict[str, list[tuple[int, int]]] = {}
    for eid, etype, v in rows:
        q = int(math.floor(v * 10000 + 0.5))
        by_type.setdefault(etype, []).append((eid, q))
    out = []
    for etype, evs in by_type.items():
        mbs = []
        for b in range(_BOOT_B):
            num = sum(_w(e, b) * q for e, q in evs)
            den = sum(_w(e, b) for e, _q in evs)
            if den > 0:
                # both engines truncate toward zero on negative sums
                mbs.append(tdiv(num, den))
        mbs.sort()
        n = len(evs)
        mean = tdiv(sum(q for _e, q in evs), n)
        v = len(mbs)
        out.append(
            (
                etype,
                n,
                mean,
                v,
                mbs[0] if v else None,
                mbs[(v + 1) // 2 - 1] if v else None,
                mbs[-1] if v else None,
            )
        )
    return sorted(out)


_row = st.tuples(
    st.sampled_from(["a", "b"]),
    st.integers(min_value=-80, max_value=80).map(lambda k: k / 16),
)


@settings(max_examples=8, deadline=None)
@given(rows=st.lists(_row, min_size=1, max_size=10))
def test_poisson_bootstrap_matches_python_reference(
    spark, tmp_path_factory, rows
):
    full = [(i, t, v) for i, (t, v) in enumerate(rows)]
    d = tmp_path_factory.mktemp("bootfix")
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array([r[0] for r in full], pa.int64()),
                "ts": pa.array(
                    [_T0 + dt.timedelta(seconds=r[0]) for r in full],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(full), pa.int64()),
                "event_type": pa.array([r[1] for r in full]),
                "value": pa.array([r[2] for r in full], pa.float64()),
                "props": pa.array(["{}"] * len(full)),
            }
        ),
        str(d / "events.parquet"),
    )
    got = sorted(
        tuple(r)
        for r in events_poisson_bootstrap(spark, str(d)).collect()
    )
    assert got == _ref(full)


def test_poisson_cdf_inversion_is_poisson_one():
    ws = [_w(i, 0) for i in range(20000)]
    mean = sum(ws) / len(ws)
    p0 = ws.count(0) / len(ws)
    assert abs(mean - 1.0) < 0.03
    assert abs(p0 - math.exp(-1)) < 0.02


def test_poisson_cdf_table_matches_derivation():
    e = math.exp(-1)
    cdf, p = 0.0, e
    for k, t in enumerate(_POIS_CDF_24):
        cdf += p
        assert t == round(cdf * (1 << 24))
        p = p / (k + 1)
