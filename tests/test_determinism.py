"""Property tests for the cross-engine determinism contracts every
oracle depends on: the 60-bit md5 hash, the engine-stable rounding
helper, and the minhash universal-hash family."""

from __future__ import annotations

import hashlib
import math

import duckdb
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

# printable-ish strings without the quote/backslash hazards SQL literals
# would add (the engine never inlines data as literals; this keeps the
# test harness itself simple)
_TEXT = st.text(
    alphabet=st.characters(
        whitelist_categories=("Lu", "Ll", "Nd", "Zs"), max_codepoint=0x24F
    ),
    min_size=0,
    max_size=40,
)


def _py_bighash(s: str) -> int:
    """The pure-Python model of the 60-bit md5 hash both engines use."""
    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[:15], 16)


@settings(max_examples=20, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8, unique=True))
def test_bighash_spark_matches_python_model(spark, texts):
    df = spark.createDataFrame([(t,) for t in texts], "s string")
    got = {
        r.s: r.h
        for r in df.withColumn(
            "h", F.expr("cast(conv(substring(md5(s), 1, 15), 16, 10) as bigint)")
        ).collect()
    }
    for t in texts:
        assert got[t] == _py_bighash(t)


@settings(max_examples=20, deadline=None)
@given(st.lists(_TEXT, min_size=1, max_size=8, unique=True))
def test_bighash_duckdb_matches_python_model(texts):
    con = duckdb.connect()
    for t in texts:
        (h,) = con.execute(
            "SELECT ('0x' || substr(md5(?), 1, 15))::BIGINT", [t]
        ).fetchone()
        assert h == _py_bighash(t)


@settings(max_examples=30, deadline=None)
@given(
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    )
)
def test_stable_round_agrees_across_engines(spark, x):
    """floor(x*1e4 + 0.5)/1e4 must be the same IEEE op sequence in
    Spark, DuckDB, and Python — including on .xxxx5 halves where
    round() HALF_UP vs HALF_EVEN diverge."""
    expected = math.floor(x * 1e4 + 0.5) / 1e4
    (got_spark,) = (
        spark.createDataFrame([(x,)], "x double")
        .selectExpr("floor(x * 1e4 + 0.5) / 1e4 AS r")
        .collect()[0]
    )
    (got_duck,) = (
        duckdb.connect().execute("SELECT floor(? * 1e4 + 0.5) / 1e4", [x]).fetchone()
    )
    assert got_spark == expected
    assert got_duck == expected


def test_minhash_family_stays_in_bigint_range():
    """(a·h + b) mod P with 40-bit h must not overflow int64 for any
    seed — the silent-wraparound failure mode of the universal-hash
    family."""
    from decisions_kinesis_spark.operators.dedup import (
        _MINHASH_A,
        _MINHASH_B,
        _MINHASH_P,
    )

    h_max = (1 << 40) - 1
    for a, b in zip(_MINHASH_A, _MINHASH_B):
        assert a * h_max + b < (1 << 63)
    assert _MINHASH_P < (1 << 62)
