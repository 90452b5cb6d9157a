"""Whole-query hypothesis differential for ``lm_kneser_ney_score``:
random lowercase-word corpora through the operator vs an independent
pure-Python interpolated-KN reference replaying the declared integer
recurrence — the two-step ×10⁶ ratio, the discounted term, the
continuation-count backoff, and every truncation site.

Token alphabet is lowercase-ASCII words so the shared whitespace
tokenizer is trivially stable; the reference tokenizes independently.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from decisions_kinesis_spark.operators.corpus import (
    _KN_D_DEN,
    _KN_D_NUM,
    lm_kneser_ney_score,
)

_word = st.sampled_from(["a", "bb", "ccc", "dd", "e", "ff"])
_doc = st.lists(_word, min_size=0, max_size=8).map(" ".join)


def _ratio(n: int, d: int) -> int:
    """floor(n·10⁶/d) in the two exact ×1000 steps (all operands
    non-negative here, so // is the shared truncation)."""
    return ((n * 1000) // d) * 1000 + (((n * 1000) % d) * 1000) // d


def _ref(texts: list[str]):
    docs = {
        i: [w for w in t.lower().split() if w] for i, t in enumerate(texts)
    }
    bigrams: dict[int, list[tuple[str, str]]] = {
        i: list(zip(ws, ws[1:])) for i, ws in docs.items() if len(ws) >= 2
    }
    c_bi: dict[tuple[str, str], int] = {}
    for bs in bigrams.values():
        for b in bs:
            c_bi[b] = c_bi.get(b, 0) + 1
    c_uni: dict[str, int] = {}
    n1f: dict[str, int] = {}
    n1b: dict[str, int] = {}
    for (w1, w2), c in c_bi.items():
        c_uni[w1] = c_uni.get(w1, 0) + c
        n1f[w1] = n1f.get(w1, 0) + 1
        n1b[w2] = n1b.get(w2, 0) + 1
    n_types = len(c_bi)
    out = []
    for i, bs in bigrams.items():
        if not bs:
            continue
        total = 0
        for b in bs:
            w1, w2 = b
            p = _ratio(
                _KN_D_DEN * c_bi[b] - _KN_D_NUM, _KN_D_DEN * c_uni[w1]
            ) + (_KN_D_NUM * n1f[w1] * _ratio(n1b[w2], n_types)) // (
                _KN_D_DEN * c_uni[w1]
            )
            total += p
        out.append((i, len(bs), total // len(bs)))
    return sorted(out)


@settings(max_examples=10, deadline=None)
@given(texts=st.lists(_doc, min_size=1, max_size=6))
def test_kneser_ney_matches_python_reference(
    spark, tmp_path_factory, texts
):
    d = tmp_path_factory.mktemp("knfix")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(texts)), pa.int64()),
                "text": pa.array(texts),
                "lang": pa.array(["en"] * len(texts)),
                "source": pa.array(["t"] * len(texts)),
                "n_chars": pa.array(
                    [len(t) for t in texts], pa.int64()
                ),
            }
        ),
        str(d / "documents.parquet"),
    )
    rows = sorted(
        (r["doc_id"], r["n_bigrams"], r["lm_kn_scaled"])
        for r in lm_kneser_ney_score(spark, str(d)).collect()
    )
    assert rows == _ref(texts)


def test_kneser_ney_discount_reserves_mass(spark):
    """Semantic sanity on the real fixture: the discounted bigram term
    is strictly below the raw ML estimate wherever the backoff term
    exists (D > 0 reserves mass), so the KN score of a document never
    exceeds its raw-bigram score by more than the backoff
    contribution — concretely, every score is positive and bounded by
    10⁶ + slack from the two-stage truncation."""
    rows = lm_kneser_ney_score(
        spark, "/root/testdata/sf0.001"
    ).collect()
    assert rows
    assert all(0 < r["lm_kn_scaled"] <= 2_000_000 for r in rows)
