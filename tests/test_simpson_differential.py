"""Whole-query hypothesis differential for ``docs_simpson_diversity``:
random (source, lang) corpora vs a pure-Python arbitrary-precision
reference of the unbiased Simpson index, its Gini–Simpson complement,
and the inverse-Simpson (Hill-2) effective count — including the three
NULL contracts (N < 2 no-pair, all-singletons infinite Hill number,
effective count past int64 via try_cast) and exact truncating division.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.parquet as pq
from hypothesis import given, settings
from hypothesis import strategies as st

from decisions_kinesis_spark.operators.corpus import docs_simpson_diversity

_doc = st.tuples(
    st.sampled_from(["web", "books", "code"]),
    st.sampled_from(["en", "de", "fr", "ja"]),
)


def _ref(docs: list[tuple[str, str]]):
    cells: dict[tuple[str, str], int] = {}
    for s, l in docs:
        cells[(s, l)] = cells.get((s, l), 0) + 1
    out = []
    for src in sorted({s for s, _ in docs}):
        ns = [c for (s, _), c in cells.items() if s == src]
        n = sum(ns)
        coin = sum(c * (c - 1) for c in ns)
        if n < 2:
            simpson = gini = None
        else:
            simpson = coin * 1_000_000 // (n * (n - 1))
            gini = 1_000_000 - simpson
        if coin == 0:
            eff = None
        else:
            q = n * (n - 1) * 1000 // coin
            eff = q if q < 2**63 else None  # the try_cast contract
        out.append((src, n, len(ns), simpson, gini, eff))
    return sorted(out)


def _write_fixture(d, docs):
    pq.write_table(
        pa.table(
            {
                "doc_id": pa.array(range(len(docs)), pa.int64()),
                "source": pa.array([s for s, _ in docs]),
                "lang": pa.array([l for _, l in docs]),
                "text": pa.array(["x"] * len(docs)),
            }
        ),
        str(d / "documents.parquet"),
    )


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_doc, min_size=0, max_size=60))
def test_simpson_diversity_matches_python_reference(
    spark, tmp_path_factory, docs
):
    d = tmp_path_factory.mktemp("simpfix")
    _write_fixture(d, docs)
    rows = sorted(
        tuple(r) for r in docs_simpson_diversity(spark, str(d)).collect()
    )
    assert rows == _ref(docs)
