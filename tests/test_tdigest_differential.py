"""Differentials for the log₂-tail t-digest (sketches_ext):

1. the FULL ``sketch_tdigest_quantiles`` pipeline at sf0.001 against
   the pure-python reference (arbitrary-precision ints, independent of
   both engines),
2. hypothesis whole-query differentials on tiny parquet fixtures
   (random values, random hour placement — exercises both build
   regimes: weight-1 hours and multi-row hours),
3. degenerate contracts: empty table → zero rows; single row → every
   percentile exact with err 0,
4. pure-python recluster invariants under hypothesis: mass
   conservation, O(log n) centroid count, envelope containment, and
   the tail-exactness property (level-0 buckets hold exactly one row,
   so p0/p100-adjacent ranks are exact) — the properties that make the
   scale function a t-digest and not just a histogram.
"""

from __future__ import annotations

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdigest_quantile_rows, tdigest_recluster
from decisions_kinesis_spark.operators.sketches_ext import (
    _TD_PCTS,
    sketch_tdigest_quantiles,
)

SF = "/root/testdata/sf0.001"

_BASE_US = 1_700_000_000_000_000  # fixture epoch, micros


def _collect(spark, d):
    return {
        (r["event_type"], r["pct"]): (
            r["n_rows"],
            r["n_centroids"],
            r["est_cents"],
            r["exact_cents"],
            r["err_ppm"],
        )
        for r in sketch_tdigest_quantiles(spark, d).collect()
    }


def _reference_from_rows(rows):
    """rows: [(type, hr_key, cents)] → expected output dict."""
    hour_digests: dict = {}
    exact_vals: dict = {}
    by_th: dict = {}
    for t, hr, c in rows:
        by_th.setdefault((t, hr), []).append(c)
        exact_vals.setdefault(t, []).append(c)
    for (t, hr), cs in by_th.items():
        dig = tdigest_recluster([(1, c, c, c) for c in cs])
        hour_digests.setdefault(t, {})[hr] = dig
    return tdigest_quantile_rows(hour_digests, exact_vals, _TD_PCTS)


def test_tdigest_matches_python_reference_at_sf(spark):
    rows = duckdb.sql(
        f"""
        SELECT event_type, date_trunc('hour', ts) AS hr,
               (floor(value * 100 + 0.5))::BIGINT AS c
        FROM read_parquet('{SF}/events.parquet')
        """
    ).fetchall()
    expected = _reference_from_rows(rows)
    got = _collect(spark, SF)
    assert got == expected
    # the defining shape: centroid count is logarithmic, not linear
    for (_t, _p), (n, n_cent, *_rest) in got.items():
        assert n_cent <= 2 * (((n - 1) // 2 + 1).bit_length() - 1) + 1


def _write_events(tmpdir, rows):
    pq.write_table(
        pa.table(
            {
                "event_id": pa.array(
                    range(1, len(rows) + 1), pa.int64()
                ),
                "ts": pa.array(
                    [
                        _BASE_US + hr * 3_600_000_000 + i * 1_000
                        for i, (_t, hr, _v) in enumerate(rows)
                    ],
                    pa.timestamp("us"),
                ),
                "user_id": pa.array([1] * len(rows), pa.int64()),
                "event_type": pa.array([r[0] for r in rows]),
                "value": pa.array([r[2] for r in rows], pa.float64()),
                "props": pa.array(["{}"] * len(rows)),
            }
        ),
        str(tmpdir / "events.parquet"),
    )
    return str(tmpdir)


_vals = st.floats(
    min_value=0.01, max_value=500.0, allow_nan=False, allow_infinity=False
)


@settings(max_examples=6, deadline=None)
@given(
    rows=st.lists(
        st.tuples(
            st.sampled_from("AB"), st.integers(0, 3), _vals
        ),
        min_size=1,
        max_size=60,
    )
)
def test_tdigest_query_matches_python_reference(
    spark, tmp_path_factory, rows
):
    d = _write_events(tmp_path_factory.mktemp("tdfix"), rows)
    cents = [
        (t, hr, int((v * 100 + 0.5) // 1)) for t, hr, v in rows
    ]
    assert _collect(spark, d) == _reference_from_rows(cents)


def test_tdigest_empty_table_yields_no_rows(spark, tmp_path):
    d = _write_events(tmp_path, [])
    assert sketch_tdigest_quantiles(spark, d).count() == 0


def test_tdigest_single_row_exact_everywhere(spark, tmp_path):
    d = _write_events(tmp_path, [("A", 0, 12.34)])
    got = _collect(spark, d)
    assert set(got) == {("A", p) for p in _TD_PCTS}
    for (_t, _p), (n, n_cent, est, exact, err) in got.items():
        assert (n, n_cent, est, exact, err) == (1, 1, 1234, 1234, 0)


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=1, max_size=400)
)
def test_recluster_invariants(vals):
    cents = [(1, v, v, v) for v in vals]
    merged = tdigest_recluster(cents)
    n = len(vals)
    # mass conservation: weights and value-sums survive bucketing
    assert sum(w for _b, w, *_ in merged) == n
    assert sum(vs for _b, _w, vs, *_ in merged) == sum(vals)
    # logarithmic size: ≤ 2·lmax+1 buckets
    lmax = ((n - 1) // 2 + 1).bit_length() - 1
    assert len(merged) <= 2 * lmax + 1
    s = sorted(vals)
    # envelope containment + bucket contiguity in rank order: bucket i
    # covers ranks [wb, wb+w) of the sorted multiset exactly
    wb = 0
    for _b, w, vs, vmin, vmax in merged:
        chunk = s[wb : wb + w]
        assert vmin == chunk[0] and vmax == chunk[-1]
        assert vs == sum(chunk)
        wb += w
    # tail exactness: the extreme buckets hold exactly one row each
    # (level 0 covers tail distance 0), so min/max are always exact.
    # n=2 is the one exception: lmax=0 folds both tails into a single
    # bucket (left lvl 0 and right 2·0−0 share key 0).
    if n >= 3:
        assert merged[0][1] == 1 and merged[-1][1] == 1


@settings(max_examples=25, deadline=None)
@given(
    vals=st.lists(st.integers(0, 10_000), min_size=2, max_size=300),
    n_parts=st.integers(1, 5),
)
def test_recluster_merge_mass_and_envelope(vals, n_parts):
    """Merge path: digests of arbitrary slices, recombined by the same
    rule, conserve mass and keep bucket means inside the global
    envelope (the merged digest is a coarsening, never an
    extrapolation)."""
    slices: list[list[int]] = [[] for _ in range(n_parts)]
    for i, v in enumerate(vals):
        slices[i % n_parts].append(v)
    flat = [
        c
        for sl in slices
        if sl
        for c in (
            (w, vs, vmin, vmax)
            for _b, w, vs, vmin, vmax in tdigest_recluster(
                [(1, v, v, v) for v in sl]
            )
        )
    ]
    merged = tdigest_recluster(flat)
    assert sum(w for _b, w, *_ in merged) == len(vals)
    assert sum(vs for _b, _w, vs, *_ in merged) == sum(vals)
    lo, hi = min(vals), max(vals)
    for _b, w, vs, vmin, vmax in merged:
        assert lo <= vmin <= vmax <= hi
        assert vmin * w <= vs <= vmax * w


def test_tdigest_two_rows_single_bucket_fold(spark, tmp_path):
    """n=2 is the lone tail-fold case (lmax=0 maps both tails to
    bucket 0): one merged centroid of weight 2, every percentile
    estimates the integer mean — pinned in the ENGINE, not just the
    python reference."""
    d = _write_events(tmp_path, [("A", 0, 1.00), ("A", 0, 3.00)])
    got = _collect(spark, d)
    assert set(got) == {("A", p) for p in _TD_PCTS}
    for (_t, p), (n, n_cent, est, exact, err) in got.items():
        assert (n, n_cent, est) == (2, 1, 200)  # mean of 100, 300
        assert exact == (100 if ((n - 1) * p) // 100 == 0 else 300)
