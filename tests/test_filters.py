"""Filter-compiler truth-table tests (SURVEY.md §5 plan #1).

Mirrors ApplyPayloadFilters (KinesisThreadJobs.cs:731-814): 18 verbs ×
{match, no-match, missing property, invalid JSON, non-object JSON,
nested path} × {AND, OR}, plus hypothesis differential tests against
the pure-Python reference model.
"""

from __future__ import annotations

import json

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from decisions_kinesis_spark.config import FilterVerb, PayloadFilter
from decisions_kinesis_spark.functions.filters import (
    apply_payload_filters,
    compile_payload_filters,
    payload_filters_py,
)


def run_filter(spark, payloads, filters, use_or=False):
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    out = apply_payload_filters(df, "payload", filters, use_or)
    return [r.payload for r in out.collect()]


# --- verb semantics (KinesisThreadJobs.cs:746-805) -------------------------

VERB_CASES = [
    # (verb, payload value, filter value, expected match)
    (FilterVerb.EQUALS, "premium", "premium", True),
    (FilterVerb.EQUALS, "premium", "Premium", False),
    (FilterVerb.EQUALS_CI, "Premium", "premium", True),
    (FilterVerb.NOT_EQUALS, "a", "b", True),
    (FilterVerb.NOT_EQUALS, "a", "a", False),
    (FilterVerb.NOT_EQUALS_CI, "A", "a", False),
    (FilterVerb.CONTAINS, "hello world", "lo wo", True),
    (FilterVerb.CONTAINS, "hello", "LO", False),
    (FilterVerb.CONTAINS_CI, "hello", "LO", True),
    (FilterVerb.STARTS_WITH, "hello", "he", True),
    (FilterVerb.STARTS_WITH, "hello", "He", False),
    (FilterVerb.STARTS_WITH_CI, "Hello", "he", True),
    (FilterVerb.ENDS_WITH, "hello", "lo", True),
    (FilterVerb.ENDS_WITH, "hello", "LO", False),
    (FilterVerb.ENDS_WITH_CI, "hellO", "lo", True),
    # lexicographic, NOT numeric: "9" > "10" (KinesisThreadJobs.cs:778-800)
    (FilterVerb.GREATER_THAN, "9", "10", True),
    (FilterVerb.GREATER_THAN, "10", "9", False),
    (FilterVerb.GREATER_THAN_CI, "B", "a", True),  # lower("B")="b" > "a"
    (FilterVerb.LESS_THAN, "10", "9", True),
    (FilterVerb.LESS_THAN_CI, "a", "B", True),
    (FilterVerb.GREATER_THAN_OR_EQUAL, "abc", "abc", True),
    (FilterVerb.GREATER_THAN_OR_EQUAL_CI, "ABC", "abc", True),
    (FilterVerb.LESS_THAN_OR_EQUAL, "abb", "abc", True),
    (FilterVerb.LESS_THAN_OR_EQUAL, "abd", "abc", False),
    (FilterVerb.LESS_THAN_OR_EQUAL_CI, "ABC", "abc", True),
]


@pytest.mark.parametrize("verb,pv,fv,expected", VERB_CASES)
def test_verb_semantics(spark, verb, pv, fv, expected):
    payload = json.dumps({"x": pv})
    kept = run_filter(spark, [payload], [PayloadFilter("x", verb, fv)])
    assert (payload in kept) == expected


def test_unknown_verb_raises():
    with pytest.raises(ValueError):
        PayloadFilter("x", "Regex Match", "v")


# --- F-semantics: nulls, combinators, invalid JSON (:731-813) --------------

P_MATCH = json.dumps({"user": {"type": "premium", "tier": "gold"}, "amount": "9"})
P_MISS = json.dumps({"other": 1})
P_INVALID = "not json"
P_ARRAY = "[1,2,3]"  # JObject.Parse rejects non-objects → pass-through
P_SCALAR = '"just a string"'

F_TYPE = PayloadFilter("user.type", FilterVerb.EQUALS, "premium")
F_AMT = PayloadFilter("amount", FilterVerb.GREATER_THAN, "10")  # "9" > "10" lexicographic
F_NOPE = PayloadFilter("user.type", FilterVerb.EQUALS, "basic")


def test_and_all_match(spark):
    assert run_filter(spark, [P_MATCH], [F_TYPE, F_AMT], use_or=False) == [P_MATCH]


def test_and_one_fails(spark):
    assert run_filter(spark, [P_MATCH], [F_TYPE, F_NOPE], use_or=False) == []


def test_or_any_matches(spark):
    assert run_filter(spark, [P_MATCH], [F_NOPE, F_TYPE], use_or=True) == [P_MATCH]


def test_or_none_matches(spark):
    assert run_filter(spark, [P_MATCH], [F_NOPE], use_or=True) == []


def test_missing_property_and_rejects(spark):
    # :739 — missing property under AND rejects even if others match
    assert run_filter(spark, [P_MISS], [F_TYPE], use_or=False) == []


def test_missing_property_or_skips(spark):
    # :737-738 — missing property under OR skips that filter
    payload = json.dumps({"amount": "9"})
    kept = run_filter(spark, [payload], [F_TYPE, F_AMT], use_or=True)
    assert kept == [payload]


def test_or_all_skipped_rejects(spark):
    # fall-through :813 — OR with every filter skipped → no match
    assert run_filter(spark, [P_MISS], [F_TYPE, F_AMT], use_or=True) == []


@pytest.mark.parametrize("payload", [P_INVALID, P_ARRAY, P_SCALAR, None, ""])
def test_invalid_or_non_object_passes(spark, payload):
    # :705-708 — parse failure ⇒ record passes unfiltered
    df = spark.createDataFrame([(payload,)], "payload string")
    assert apply_payload_filters(df, "payload", [F_NOPE]).count() == 1


@pytest.mark.parametrize("ws", ["\n", "\t", "\r\n", " \t\n "])
def test_leading_whitespace_object_is_valid_json(spark, ws):
    # JObject.Parse accepts ANY leading whitespace: a \n-prefixed object
    # is a VALID object, so a failing filter must reject it (it would
    # pass-through only if parsing failed)
    payload = ws + P_MATCH
    assert run_filter(spark, [payload], [F_NOPE]) == []
    # and a matching filter still matches through the whitespace
    assert run_filter(spark, [payload], [F_TYPE]) == [payload]


def test_empty_filter_list_passes_everything(spark):
    # :694 guard
    kept = run_filter(spark, [P_MATCH, P_INVALID, P_MISS], [])
    assert len(kept) == 3


def test_nested_path_and_non_leaf(spark):
    # dotted path (README.md:149); non-leaf extraction yields JSON text
    kept = run_filter(
        spark,
        [P_MATCH],
        [PayloadFilter("user", FilterVerb.CONTAINS, '"tier":"gold"')],
    )
    assert kept == [P_MATCH]


def test_shared_extraction_per_property(spark):
    # Same property used by 2 verbs compiles to one shared Column (runtime
    # dedup via WholeStageCodegen subexpression elimination); the whole
    # predicate stays a single codegen'd Filter — no Python, no shuffle.
    filters = [
        PayloadFilter("k", FilterVerb.GREATER_THAN, "1"),
        PayloadFilter("k", FilterVerb.LESS_THAN, "9"),
    ]
    col = compile_payload_filters(F.col("payload"), filters)
    df = spark.createDataFrame([('{"k":"5"}',)], "payload string").filter(col)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "$.k" in plan and "BatchEvalPython" not in plan
    assert df.count() == 1


# --- differential property tests vs pure-Python model (plan #4) ------------

_scalars = st.one_of(
    st.text(alphabet=st.characters(min_codepoint=32, max_codepoint=126), max_size=8),
    st.integers(-1000, 1000),
    st.booleans(),
)
_payloads = st.one_of(
    st.dictionaries(st.sampled_from(["a", "b", "c.d", "e"]), _scalars, max_size=4).map(
        json.dumps
    ),
    st.sampled_from([P_INVALID, P_ARRAY, P_SCALAR, "{}", '{"a":null}']),
)
_filters = st.lists(
    st.builds(
        PayloadFilter,
        property=st.sampled_from(["a", "b", "e", "zz"]),
        verb=st.sampled_from(list(FilterVerb)),
        value=st.text(
            alphabet=st.characters(min_codepoint=48, max_codepoint=122), max_size=4
        ),
    ),
    min_size=0,
    max_size=4,
)


@settings(max_examples=25, deadline=None)
@given(payloads=st.lists(_payloads, min_size=1, max_size=8), filters=_filters, use_or=st.booleans())
def test_differential_vs_python_model(spark, payloads, filters, use_or):
    expected = [p for p in payloads if payload_filters_py(p, filters, use_or)]
    df = spark.createDataFrame([(p,) for p in payloads], "payload string")
    got = [r.payload for r in apply_payload_filters(df, "payload", filters, use_or).collect()]
    assert sorted(got) == sorted(expected)
