"""Whole-query hypothesis differential for
``dedup_ngram_jaccard_sampled``: random tiny corpora over a 4-token
alphabet (maximal hash-collision pressure on the 1024-bit signature)
run through the operator and an independent pure-Python reference of
the whole pipeline — tokenization, 60-bit md5 bit indices, geometric
banding, same-band pair generation, exact bitset Jaccard with the
engine's HALF_UP 4dp rounding (mirrored via Decimal on the shortest
float repr, the BigDecimal.valueOf semantics), and the Q=1 degenerate
Horvitz–Thompson identities.  Q > 1 dynamics are covered by the
streaming proof (#29) and the tri-SF gate; THIS layer hunts
consistent-but-wrong arithmetic both engines could share.
"""

from __future__ import annotations

import hashlib
from decimal import ROUND_HALF_UP, Decimal

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from decisions_kinesis_spark.operators.dedup import (
    _RATIO_BOUNDS,
    _SIG_BITS,
    dedup_ngram_jaccard_sampled,
)

_doc = st.tuples(
    st.sampled_from(["en", "de"]),
    st.lists(st.sampled_from(["a", "b", "cc", "ddd"]), max_size=8),
)


def _idxs(tokens):
    return {
        int(hashlib.md5(t.encode()).hexdigest()[:15], 16) % _SIG_BITS
        for t in tokens
    }


def _round4(x: float) -> float:
    # Spark's Round(double, 4): BigDecimal.valueOf(d) (shortest string
    # repr) setScale(4, HALF_UP) — Python mirror via Decimal(repr(x))
    return float(Decimal(repr(x)).quantize(Decimal("0.0001"),
                                           rounding=ROUND_HALF_UP))


def _ref(docs):
    sigs = []
    for doc_id, (lang, toks) in enumerate(docs):
        ids = _idxs(toks)
        if not ids:
            continue  # empty docs never enter the banded frame
        band = sum(len(ids) >= g for g in _RATIO_BOUNDS)
        sigs.append((doc_id, lang, band, ids))
    out = {}
    for doc_id, lang, band, ids in sigs:
        r = out.setdefault(lang, [0, 0, 0])  # docs, pairs, neardup
        r[0] += 1
    for i, (ida, la, ba, sa) in enumerate(sigs):
        for idb, lb, bb, sb in sigs[i + 1:]:
            a, b = ((ida, la, ba, sa), (idb, lb, bb, sb))
            if a[0] > b[0]:
                a, b = b, a
            if a[1] != b[1] or a[2] != b[2]:
                continue
            jac = _round4(len(a[3] & b[3]) / len(a[3] | b[3]))
            out[a[1]][1] += 1
            out[a[1]][2] += int(jac >= 0.8)
    # Q = 1 at these sizes: HT estimates equal observations
    return {
        lang: (1, d, p, n, p, n) for lang, (d, p, n) in out.items()
    }


@settings(max_examples=6, deadline=None)
@given(docs=st.lists(_doc, min_size=1, max_size=14))
def test_sampled_jaccard_matches_python_reference(
    spark, tmp_path_factory, docs
):
    d = tmp_path_factory.mktemp("ngramdiff")
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "lang": pa.array([lang for lang, _ in docs]),
                "text": pa.array([" ".join(toks) for _, toks in docs]),
            }
        ),
        str(d / "documents.parquet"),
    )
    got = {
        r["lang"]: (
            r["sample_q"], r["n_docs_sampled"], r["n_pairs_sampled"],
            r["n_neardup_sampled"], r["est_pairs"], r["est_neardup"],
        )
        for r in dedup_ngram_jaccard_sampled(spark, str(d)).collect()
    }
    assert got == _ref(docs)
