"""Hypothesis differentials for the round-7 sketch family: the full
``quantile_bottomk_sample`` and ``freq_countmin_topk`` pipelines are
checked against independent pure-Python references (hashlib md5,
arbitrary-precision ints) over randomized inputs — engine-independent
ground truth, the ``test_fold_differential`` pattern lifted from
expression level to whole-query level.

Each example writes a tiny parquet fixture and runs the real query, so
example counts stay small; the deterministic >k case exercises the
actual bottom-k sampling path (hypothesis examples stay below k, where
the sample is the whole group).
"""

from __future__ import annotations

import hashlib
import math

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from _helpers import tdiv
from decisions_kinesis_spark.operators.relational import (
    _CMS_D,
    _CMS_TOPK,
    _CMS_W,
    _QS_K,
    freq_countmin_topk,
    quantile_bottomk_sample,
)

_prices = st.floats(
    min_value=0.01, max_value=99999.99, allow_nan=False, allow_infinity=False
)


def _quantize(p: float) -> int:
    return int(math.floor(p * 10000 + 0.5))


def _hv(orderkey: int, linenumber: int) -> int:
    dg = hashlib.md5(f"{orderkey}:{linenumber}".encode()).hexdigest()
    return int(dg[:14], 16)


def _disc(sorted_vals: list[int], num: int) -> int:
    return sorted_vals[((len(sorted_vals) - 1) * num) // 10]


def _py_quantile_reference(rows):
    """rows: [(flag, orderkey, linenumber, price)] → {flag: output}."""
    groups: dict[str, list[tuple[int, int]]] = {}
    for flag, ok, ln, price in rows:
        groups.setdefault(flag, []).append((_hv(ok, ln), _quantize(price)))
    out = {}
    for flag, pairs in groups.items():
        full = sorted(pq_ for _hv_, pq_ in pairs)
        samp = sorted(pq_ for _hv_, pq_ in sorted(pairs)[:_QS_K])
        em, e9 = _disc(full, 5), _disc(full, 9)
        sm, s9 = _disc(samp, 5), _disc(samp, 9)
        out[flag] = (
            len(full),
            em,
            sm,
            0 if em == 0 else tdiv((sm - em) * 1_000_000, em),
            e9,
            s9,
            0 if e9 == 0 else tdiv((s9 - e9) * 1_000_000, e9),
        )
    return out


def _write_lineitem(tmpdir, rows):
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows]),
                "l_orderkey": pa.array(
                    [r[1] for r in rows], pa.int64()
                ),
                "l_linenumber": pa.array([r[2] for r in rows], pa.int32()),
                "l_extendedprice": pa.array(
                    [r[3] for r in rows], pa.float64()
                ),
            }
        ),
        str(tmpdir / "lineitem.parquet"),
    )
    return str(tmpdir)


def _collect_quantile(spark, d):
    return {
        r["l_returnflag"]: (
            r["n_rows"],
            r["exact_median_q"],
            r["sample_median_q"],
            r["med_err_ppm"],
            r["exact_p90_q"],
            r["sample_p90_q"],
            r["p90_err_ppm"],
        )
        for r in quantile_bottomk_sample(spark, d).collect()
    }


@settings(max_examples=6, deadline=None)
@given(
    prices=st.lists(
        st.tuples(st.sampled_from("AB"), _prices), min_size=1, max_size=30
    )
)
def test_quantile_sample_matches_python_reference(
    spark, tmp_path_factory, prices
):
    rows = [
        (flag, i + 1, 1, price) for i, (flag, price) in enumerate(prices)
    ]
    d = _write_lineitem(tmp_path_factory.mktemp("qfix"), rows)
    assert _collect_quantile(spark, d) == _py_quantile_reference(rows)


def test_quantile_sample_beyond_k_matches_python_reference(
    spark, tmp_path
):
    """600 rows in one group (> k=256): the bottom-k hash-rank
    SELECTION itself — not just the disc rule — must match the
    reference row-for-row."""
    rows = [
        ("A", i + 1, (i % 7) + 1, float((i * 37) % 9000) / 10 + 0.01)
        for i in range(600)
    ]
    d = _write_lineitem(tmp_path, rows)
    got = _collect_quantile(spark, d)
    want = _py_quantile_reference(rows)
    assert got == want
    # the sampling path genuinely engaged (sample != whole group)
    assert want["A"][0] == 600 > _QS_K


def _py_cms_reference(custkeys):
    cells: dict[tuple[int, int], int] = {}
    exact: dict[int, int] = {}
    for k in custkeys:
        exact[k] = exact.get(k, 0) + 1
        dg = hashlib.md5(str(k).encode()).hexdigest()
        for d in range(_CMS_D):
            cell = int(dg[8 * d : 8 * d + 8], 16) % _CMS_W
            cells[(d, cell)] = cells.get((d, cell), 0) + 1
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    out = {}
    for k, n in top:
        dg = hashlib.md5(str(k).encode()).hexdigest()
        est = min(
            cells[(d, int(dg[8 * d : 8 * d + 8], 16) % _CMS_W)]
            for d in range(_CMS_D)
        )
        out[k] = (n, est, ((est - n) * 1_000_000) // n)
    return out


@settings(max_examples=6, deadline=None)
@given(
    custkeys=st.lists(
        st.integers(min_value=1, max_value=12), min_size=1, max_size=40
    )
)
def test_countmin_matches_python_reference(
    spark, tmp_path_factory, custkeys
):
    d = tmp_path_factory.mktemp("cfix")
    pq.write_table(
        pa.table({"o_custkey": pa.array(custkeys, pa.int64())}),
        str(d / "orders.parquet"),
    )
    got = {
        r["o_custkey"]: (r["n_exact"], r["cms_estimate"], r["overcount_ppm"])
        for r in freq_countmin_topk(spark, str(d)).collect()
    }
    assert got == _py_cms_reference(custkeys)


def test_bloom_prefilter_matches_python_reference(spark, tmp_path):
    """Deterministic whole-query differential for the Bloom prefilter:
    a constructed 4-table fixture (2 member suppliers in EUROPE, 60
    non-member fact keys) replayed by a pure-Python filter — bit
    positions, membership, false positives and fp_ppm must all match
    exactly."""
    from decisions_kinesis_spark.operators.relational import (
        _BLOOM_K,
        _BLOOM_M,
        join_bloom_prefilter,
    )

    d = tmp_path
    pq.write_table(
        pa.table(
            {
                "r_regionkey": pa.array([0, 1], pa.int64()),
                "r_name": pa.array(["EUROPE", "ASIA"]),
            }
        ),
        str(d / "region.parquet"),
    )
    pq.write_table(
        pa.table(
            {
                "n_nationkey": pa.array([0, 1], pa.int64()),
                "n_regionkey": pa.array([0, 1], pa.int64()),
            }
        ),
        str(d / "nation.parquet"),
    )
    # suppliers 1, 2 are EUROPE members; 3, 4 are not
    pq.write_table(
        pa.table(
            {
                "s_suppkey": pa.array([1, 2, 3, 4], pa.int64()),
                "s_nationkey": pa.array([0, 0, 1, 1], pa.int64()),
            }
        ),
        str(d / "supplier.parquet"),
    )
    fact_keys = [1, 2] * 5 + list(range(100, 160))  # members + 60 others
    pq.write_table(
        pa.table(
            {
                "l_suppkey": pa.array(fact_keys, pa.int64()),
                "l_returnflag": pa.array(
                    ["A" if k % 2 else "R" for k in fact_keys]
                ),
            }
        ),
        str(d / "lineitem.parquet"),
    )

    def positions(key: int) -> list[int]:
        dg = hashlib.md5(str(key).encode()).hexdigest()
        return [
            int(dg[10 * i : 10 * i + 10], 16) % _BLOOM_M
            for i in range(_BLOOM_K)
        ]

    members = {1, 2}
    bits = {p for k in members for p in positions(k)}
    ref: dict[str, list[int]] = {}
    for k in fact_keys:
        flag = "A" if k % 2 else "R"
        g = ref.setdefault(flag, [0, 0, 0])
        g[0] += 1
        passed = all(p in bits for p in positions(k))
        g[1] += int(passed)
        g[2] += int(k in members)
        assert passed or k not in members  # no false negatives
    want = {}
    for flag, (n, p, t) in ref.items():
        fp = p - t
        want[flag] = (
            n, p, t, fp, 0 if n - t == 0 else (fp * 1_000_000) // (n - t)
        )
    got = {
        r["l_returnflag"]: (
            r["n_rows"],
            r["n_pass_bloom"],
            r["n_true_match"],
            r["n_false_pos"],
            r["fp_ppm"],
        )
        for r in join_bloom_prefilter(spark, str(d)).collect()
    }
    assert got == want


def _wps_hv(orderkey: int, linenumber: int) -> int:
    dg = hashlib.md5(f"{orderkey}:{linenumber}:wps".encode()).hexdigest()
    return int(dg[:14], 16)


def _py_weighted_poisson_reference(rows):
    """rows: [(flag, orderkey, linenumber, qty, price)] → per-flag
    (n_rows, n_sampled, exact_q, ht_q, err_ppm) under the same salted
    hash, inclusion rule, and floor-HT arithmetic."""
    out: dict[str, list[int]] = {}
    for flag, ok, ln, qty, price in rows:
        n, s, ex, ht = out.setdefault(flag, [0, 0, 0, 0])
        qv = _quantize(price)
        sampled = (_wps_hv(ok, ln) % 100) < qty
        out[flag] = [
            n + 1,
            s + (1 if sampled else 0),
            ex + qv,
            ht + ((qv * 100) // qty if sampled else 0),
        ]
    return {
        flag: (
            n,
            s,
            ex,
            ht,
            0 if ex == 0 else tdiv((ht - ex) * 1_000_000, ex),
        )
        for flag, (n, s, ex, ht) in out.items()
    }


def _write_lineitem_qty(tmpdir, rows):
    pq.write_table(
        pa.table(
            {
                "l_returnflag": pa.array([r[0] for r in rows]),
                "l_orderkey": pa.array([r[1] for r in rows], pa.int64()),
                "l_linenumber": pa.array([r[2] for r in rows], pa.int32()),
                "l_quantity": pa.array(
                    [float(r[3]) for r in rows], pa.float64()
                ),
                "l_extendedprice": pa.array(
                    [r[4] for r in rows], pa.float64()
                ),
            }
        ),
        str(tmpdir / "lineitem.parquet"),
    )
    return str(tmpdir)


@settings(max_examples=6, deadline=None)
@given(
    items=st.lists(
        st.tuples(
            st.sampled_from("AB"),
            st.integers(min_value=1, max_value=50),
            _prices,
        ),
        min_size=1,
        max_size=40,
    )
)
def test_weighted_poisson_matches_python_reference(
    spark, tmp_path_factory, items
):
    from decisions_kinesis_spark.operators.relational import (
        sample_weighted_poisson,
    )

    rows = [
        (flag, i + 1, (i % 7) + 1, qty, price)
        for i, (flag, qty, price) in enumerate(items)
    ]
    d = _write_lineitem_qty(tmp_path_factory.mktemp("wfix"), rows)
    got = {
        r["l_returnflag"]: (
            r["n_rows"],
            r["n_sampled"],
            r["exact_q"],
            r["ht_q"],
            r["err_ppm"],
        )
        for r in sample_weighted_poisson(spark, d).collect()
    }
    assert got == _py_weighted_poisson_reference(rows)


# ---------------------------------------------------------------------------
# HLL linear-counting correction (sketches_ext.agg_hll_linear_counting)
# ---------------------------------------------------------------------------


def _py_hll_lc_rollup(pairs):
    """Pure-python reference for the whole agg_hll_linear_counting
    pipeline: hashlib md5 registers, exact-integer raw estimator, the
    Flajolet small-range gate with ln(m/V) recomputed here from
    math.log (independent of the module's constant table)."""
    per_part: dict[int, dict[int, int]] = {}
    supp: dict[int, set] = {}
    for pk, sk in pairs:
        dg = hashlib.md5(str(sk).encode()).hexdigest()
        reg = int(dg[:2], 16)
        hv = int(dg[2:14], 16)
        rho = 49 - hv.bit_length() if hv else 49
        regs = per_part.setdefault(pk, {})
        regs[reg] = max(regs.get(reg, 0), rho)
        supp.setdefault(pk, set()).add(sk)
    rollup: dict[int, list[int]] = {}
    for pk, regs in per_part.items():
        s_total = sum(2 ** (49 - mr) for mr in regs.values()) + (
            256 - len(regs)
        ) * 2**49
        raw = (718273 * 256 * 256 * 2**49) // (s_total * 10**6)
        v = 256 - len(regs)
        if v > 0 and raw * 2 <= 5 * 256:
            corr = (256 * round(math.log(256 / v) * 1_000_000)) // 10**6
        else:
            corr = raw
        n_exact = len(supp[pk])
        acc = rollup.setdefault(n_exact, [0, 0, 0, 0, 0])
        acc[0] += 1
        acc[1] += raw
        acc[2] += corr
        acc[3] += 1 if raw == n_exact else 0
        acc[4] += 1 if corr == n_exact else 0
    return {k: tuple(v) for k, v in rollup.items()}


def _write_partsupp_lineitem(tmpdir, pairs):
    pq.write_table(
        pa.table(
            {
                "l_partkey": pa.array([p for p, _s in pairs], pa.int64()),
                "l_suppkey": pa.array([s for _p, s in pairs], pa.int64()),
            }
        ),
        str(tmpdir / "lineitem.parquet"),
    )
    return str(tmpdir)


def _collect_hll_lc(spark, d):
    from decisions_kinesis_spark.operators.sketches_ext import (
        agg_hll_linear_counting,
    )

    return {
        r["n_exact"]: (
            r["n_parts"],
            r["sum_raw_est"],
            r["sum_corr_est"],
            r["n_raw_match"],
            r["n_corr_match"],
        )
        for r in agg_hll_linear_counting(spark, d).collect()
    }


@settings(max_examples=6, deadline=None)
@given(
    pairs=st.lists(
        st.tuples(st.integers(1, 6), st.integers(1, 1_000_000)),
        min_size=1,
        max_size=80,
    )
)
def test_hll_linear_counting_matches_python_reference(
    spark, tmp_path_factory, pairs
):
    d = _write_partsupp_lineitem(tmp_path_factory.mktemp("lcfix"), pairs)
    assert _collect_hll_lc(spark, d) == _py_hll_lc_rollup(pairs)


def test_hll_lc_large_cardinality_takes_raw_branch(spark, tmp_path):
    """5000 distinct suppliers on one part: every register is hit
    (V=0), so the correction must fall back to the raw estimator —
    the V>0 guard and the E ≤ 2.5m gate both exercised off."""
    pairs = [(1, s) for s in range(1, 5001)]
    d = _write_partsupp_lineitem(tmp_path, pairs)
    got = _collect_hll_lc(spark, d)
    assert got == _py_hll_lc_rollup(pairs)
    (n_parts, sum_raw, sum_corr, _rm, _cm) = got[5000]
    assert n_parts == 1
    assert sum_corr == sum_raw  # raw branch: no table lookup fired


def test_hll_lc_empty_table_yields_no_rows(spark, tmp_path):
    d = _write_partsupp_lineitem(tmp_path, [])
    assert _collect_hll_lc(spark, d) == {}


def test_hll_lc_single_row_pinned(spark, tmp_path):
    """One (part, supplier) row: 1 register set, V=255, raw ≈ α·m,
    corrected = 256·ln(256/255) — exactly 1.  Pinned in the engine,
    independent of the hypothesis sampler."""
    pairs = [(7, 42)]
    d = _write_partsupp_lineitem(tmp_path, pairs)
    got = _collect_hll_lc(spark, d)
    assert got == _py_hll_lc_rollup(pairs)
    (n_parts, sum_raw, sum_corr, raw_match, corr_match) = got[1]
    assert (n_parts, sum_corr, corr_match) == (1, 1, 1)
    assert raw_match == 0  # raw sits at the ~α·m tier for n=1
