"""Hypothesis differential tests for the round-4 sequential folds:
the greedy BPE encode (corpus._GREEDY_ENC) and the fixed-width span
interval-union (corpus.dedup_exact_substring's fold) are each checked
against an independent pure-Python reference over randomized inputs —
the same differential pattern the filter compiler uses.
"""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.corpus import _GREEDY_ENC, _SUBSTR_N

_words = st.text(alphabet="abcd", min_size=1, max_size=12)
_vocab = st.lists(
    st.text(alphabet="abcd", min_size=2, max_size=2), max_size=6, unique=True
)


def _py_greedy(word: str, vocab: list[str]) -> int:
    """Reference greedy longest-match encode: 2-char merge else 1 char."""
    i, n = 0, 0
    while i < len(word):
        if word[i : i + 2] in vocab and len(word[i : i + 2]) == 2:
            i += 2
        else:
            i += 1
        n += 1
    return n


def _py_span_union(positions: list[int], width: int) -> int:
    """Reference interval union of fixed-width spans at sorted starts."""
    tot, prev_end = 0, None
    for p in sorted(positions):
        start = p if prev_end is None else max(p, prev_end + 1)
        end = p + width - 1
        if end >= start:
            tot += end - start + 1
        prev_end = end if prev_end is None else max(prev_end, end)
    return tot


@settings(max_examples=30, deadline=None)
@given(words=st.lists(_words, min_size=1, max_size=6), vocab=_vocab)
def test_greedy_bpe_fold_matches_python_reference(spark, words, vocab):
    df = spark.createDataFrame([(w,) for w in words], "w string")
    vocab_arr = (
        "array(" + ", ".join(f"'{p}'" for p in vocab) + ")"
        if vocab
        else "array()"
    )
    got = {
        r["w"]: r["cnt"]
        for r in df.withColumn("vocab", F.expr(vocab_arr))
        .withColumn("cnt", F.expr(_GREEDY_ENC))
        .collect()
    }
    for w in words:
        assert got[w] == _py_greedy(w, vocab), (w, vocab)


@settings(max_examples=30, deadline=None)
@given(
    positions=st.lists(
        st.integers(min_value=1, max_value=60), min_size=0, max_size=20, unique=True
    )
)
def test_span_union_fold_matches_python_reference(spark, positions):
    span_union = (
        "aggregate(array_sort(collect_list(pos)),"
        f" named_struct('tot', cast(0 as bigint), 'prev', {-_SUBSTR_N}),"
        " (acc, p) -> named_struct("
        f"   'tot', acc.tot + least({_SUBSTR_N}, p - acc.prev),"
        "   'prev', p)).tot"
    )
    df = spark.createDataFrame(
        [(1, p) for p in positions] or [(1, None)], "doc_id long, pos int"
    )
    got = df.groupBy("doc_id").agg(F.expr(span_union).alias("tot")).collect()[0][
        "tot"
    ]
    assert got == _py_span_union(positions, _SUBSTR_N), positions


@given(
    samples=st.lists(
        st.integers(min_value=-32768, max_value=32767), min_size=1, max_size=200
    ),
    rate=st.sampled_from([8000, 16000, 44100, 48000]),
)
@settings(max_examples=50, deadline=None)
def test_wav_decoder_matches_stdlib_writer(samples, rate):
    """decode_wav vs Python's independent stdlib wave writer: any
    PCM16 mono clip must round-trip with exact integer statistics."""
    import io
    import struct
    import wave

    from decisions_kinesis_spark.operators.multimodal import decode_wav

    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(1)
        w.setsampwidth(2)
        w.setframerate(rate)
        w.writeframes(struct.pack(f"<{len(samples)}h", *samples))
    out = decode_wav(buf.getvalue())
    assert out["n_samples"] == len(samples)
    assert out["sample_rate"] == rate
    assert out["sum_s"] == sum(samples)
    assert out["sq_sum"] == sum(s * s for s in samples)
    assert out["peak"] == max((abs(s) for s in samples), default=0)


@given(
    w=st.integers(min_value=2, max_value=12),
    h=st.integers(min_value=2, max_value=12),
    data=st.data(),
)
@settings(max_examples=50, deadline=None)
def test_resize_matches_pure_python_reference(w, h, data):
    """resize_box2 vs a pure-Python 2×2 block-average loop over a
    hand-built P6 blob (arbitrary pixel bytes, including header-like
    values inside the pixel plane)."""
    from decisions_kinesis_spark.operators.multimodal import resize_box2

    pix = bytes(
        data.draw(
            st.lists(
                st.integers(min_value=0, max_value=255),
                min_size=w * h * 3,
                max_size=w * h * 3,
            )
        )
    )
    blob = f"P6\n{w} {h}\n255\n".encode() + pix

    def p(r, c, ch):
        return pix[(r * w + c) * 3 + ch]

    rw, rh = w // 2, h // 2
    expect = [0, 0, 0]
    for i in range(rh):
        for j in range(rw):
            for ch in range(3):
                expect[ch] += (
                    p(2 * i, 2 * j, ch)
                    + p(2 * i, 2 * j + 1, ch)
                    + p(2 * i + 1, 2 * j, ch)
                    + p(2 * i + 1, 2 * j + 1, ch)
                ) // 4
    out = resize_box2(blob)
    assert (out["r_width"], out["r_height"]) == (rw, rh)
    assert [out["rsum_r"], out["rsum_g"], out["rsum_b"]] == expect


@settings(max_examples=8, deadline=None)
@given(
    vals=st.lists(
        st.tuples(
            st.integers(min_value=-50, max_value=50),
            st.integers(min_value=0, max_value=1000),
        ),
        min_size=1,
        max_size=120,
    ),
    n_parts=st.integers(min_value=1, max_value=9),
)
def test_range_prefix_positions_match_single_node_sort(
    spark, vals, n_parts
):
    """Property: the distributed range_prefix machinery reproduces the
    single-node total order exactly — global position from (partition
    offset + within-partition row_number) equals the sorted rank, and
    the _sum_off offsets reproduce the exact prefix sums — for random
    data (with duplicate keys) and any partition count."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    from decisions_kinesis_spark.functions.ordering import range_prefix

    rows = [(a, s, i) for i, (a, s) in enumerate(vals)]
    df = spark.createDataFrame(rows, "a bigint, s bigint, uid bigint")
    part, off, total_rows, total_sum = range_prefix(
        df, ["a", "uid"], n_parts, sum_col="s"
    )
    w = Window.partitionBy("_pid").orderBy("a", "uid")
    run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    got = (
        part.join(F.broadcast(off), "_pid")
        .select(
            "uid",
            (F.row_number().over(w) + F.col("_row_off")).alias("pos"),
            (
                F.sum("s").over(run)
                + F.col("_sum_off").cast("bigint")
            ).alias("psum"),
        )
        .collect()
    )
    expect = sorted(rows, key=lambda r: (r[0], r[2]))
    assert total_rows == len(rows)
    assert total_sum == sum(s for _a, s, _u in rows)
    exp_pos = {uid: i + 1 for i, (_a, _s, uid) in enumerate(expect)}
    acc, exp_psum = 0, {}
    for _a, s, uid in expect:
        acc += s
        exp_psum[uid] = acc
    assert {r["uid"]: r["pos"] for r in got} == exp_pos
    assert {r["uid"]: r["psum"] for r in got} == exp_psum


@settings(max_examples=25, deadline=None)
@given(
    edges=st.sets(
        st.tuples(st.integers(0, 9), st.integers(0, 9)).filter(
            lambda p: p[0] != p[1]
        ),
        min_size=1,
        max_size=25,
    )
)
def test_triangle_counts_match_brute_force(spark, edges):
    """Degree-oriented wedge counting == O(n^3) brute force on random
    graphs: per-node triangle counts AND degrees agree exactly, and
    nodes in no triangle are absent (the documented output contract)."""
    from itertools import combinations

    from decisions_kinesis_spark.operators.graphs import triangle_counts

    und = {(min(u, v), max(u, v)) for u, v in edges}
    nodes = {n for e in und for n in e}
    tri = {n: 0 for n in nodes}
    for a, b, c in combinations(sorted(nodes), 3):
        if (
            (a, b) in und and (a, c) in und and (b, c) in und
        ):
            tri[a] += 1
            tri[b] += 1
            tri[c] += 1
    deg = {n: sum(n in e for e in und) for n in nodes}
    expect = {
        n: (tri[n], deg[n]) for n in nodes if tri[n] > 0
    }
    df = spark.createDataFrame(sorted(und), "u bigint, v bigint")
    got = {
        r["node"]: (r["tri_cnt"], r["deg"])
        for r in triangle_counts(df).collect()
    }
    assert got == expect, (sorted(und), got, expect)


@settings(max_examples=12, deadline=None)
@given(
    series=st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.lists(st.integers(0, 5), min_size=1, max_size=8),
        min_size=1,
        max_size=2,
    )
)
def test_acf_hourly_matches_python_reference(spark, series):
    """ACF DataFrame formulation (n-scaled DECIMAL identity) == the
    textbook mean-centered integer estimator on random short series —
    including constant series (NULL acf), all-zero types, and series
    whose observed span shrinks past leading/trailing zero hours (the
    densification contract both sides must share)."""
    import datetime as dt

    from _helpers import acf_from_state
    from decisions_kinesis_spark.operators.analytics_ext import acf_hourly

    h0 = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = []
    state = {}
    for t, cs in series.items():
        for i, c in enumerate(cs):
            if c > 0:
                b = h0 + dt.timedelta(hours=i)
                state[(t, b)] = c
                rows.extend([(t, b)] * c)
    types = ("a", "ghost")
    max_lag = 3
    expect = acf_from_state(state, types, max_lag)
    ev = spark.createDataFrame(rows, "event_type string, b timestamp")
    got = {
        (r["event_type"], r["lag"]): r["acf_ppm"]
        for r in acf_hourly(spark, ev, types, max_lag).collect()
    }
    assert got == expect, (series, got, expect)


@settings(max_examples=12, deadline=None)
@given(
    series=st.dictionaries(
        st.sampled_from(["a", "b"]),
        st.lists(st.integers(0, 5), min_size=1, max_size=8),
        min_size=1,
        max_size=2,
    )
)
def test_ccf_hourly_matches_python_reference(spark, series):
    """CCF DataFrame formulation == the shared Python reference on
    random short series — the correctly-rounded double path
    (int→float, product, sqrt, division, floor) must agree with
    Python's identical op sequence exactly, including NULLs for
    constant series and the densification-span contract."""
    import datetime as dt

    from _helpers import ccf_from_state
    from decisions_kinesis_spark.operators.analytics_ext import ccf_hourly

    h0 = dt.datetime(2026, 3, 1, 0, 0, 0)
    rows = []
    state = {}
    for t, cs in series.items():
        for i, c in enumerate(cs):
            if c > 0:
                b = h0 + dt.timedelta(hours=i)
                state[(t, b)] = c
                rows.extend([(t, b)] * c)
    types = ("a", "ghost")
    max_lag = 3
    expect = ccf_from_state(state, types, max_lag)
    ev = spark.createDataFrame(rows, "event_type string, b timestamp")
    got = {
        (r["type_lead"], r["type_lag"], r["lag"]): r["ccf_r_ppm"]
        for r in ccf_hourly(spark, ev, types, max_lag).collect()
    }
    assert got == expect, (series, got, expect)
