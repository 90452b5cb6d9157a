"""Streaming/batch equivalence proof #34: CROSS-SOURCE overlap-matrix
maintenance — the governance report (`dedup_source_overlap_matrix`) kept
live as documents arrive.

Recoverability criterion (the CUPED lesson, satisfied here): the matrix
cell is (n_pairs, min_jaccard, max_jaccard) per unordered source pair —
count is ADDITIVE over pair arrivals and min/max are semilattice folds,
so per-batch increments merge exactly and no pair's contribution ever
needs revision.  Each verified near-dup pair is attributed to exactly
ONE micro-batch (the batch where its LATER document arrives): candidate
generation joins the new batch's band keys against the accumulated
index ∪ the batch itself, so an (old, new) pair fires once and an
(old, old) pair never re-fires.

Pair semantics are the module's own (`_doc_shingles` → `_band_table`
band-key candidates → exact shingle Jaccard, round 4dp, ≥ 0.5 — the
`dedup_minhash_lsh_pairs` contract), reused so the proof cannot drift
from the operator it certifies.  The injected-dup id remap of the batch
query is fixture plumbing for the sf corpora and does not apply to this
synthetic corpus.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.dedup import _band_table, _doc_shingles

from _helpers import stage_file as _stage_file

_TEXT_X = (
    "alpha beta gamma delta epsilon zeta eta theta iota kappa lambda mu"
    " nu xi omicron pi rho sigma tau upsilon"
)
_TEXT_Y = (
    "one two three four five six seven eight nine ten eleven twelve"
    " thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"
)
# _TEXT_Y plus a tail: high-but-partial Jaccard (shared prefix
# shingles; exact shingle J = 0.8182 with this tail, and the md5
# banding — deterministic for fixed text — keeps the pair as a
# candidate, probed before pinning: a longer tail drops J below the
# banding's recall floor and the pair honestly disappears)
_TEXT_Y2 = _TEXT_Y + " extra trailing tokens appended"
_TEXT_Z = (
    "completely unrelated content about adaptive query execution broadcast"
    " joins shuffle partitions and tungsten code generation internals"
)

_DOCS = [
    (1, _TEXT_X, "s1"),
    (3, _TEXT_Y, "s1"),
    (2, _TEXT_X, "s2"),
    (4, _TEXT_Y2, "s1"),
    (5, _TEXT_Z, "s3"),
    (6, _TEXT_X, "s2"),
]
_BATCHES = [(1, 3), (2, 4, 5), (6,)]
_SCHEMA = "doc_id long, text string, source string"


def _verified_pairs(spark, new_docs, all_docs):
    """Verified near-dup pairs (doc_a < doc_b, exact Jaccard ≥ 0.5,
    round 4dp) where at least one side is in ``new_docs`` — the
    operator's pair contract restricted to a batch's frontier."""
    sh_all = _doc_shingles(all_docs.select("doc_id", "text")).localCheckpoint(
        eager=True
    )
    bands_all = _band_table(sh_all)
    new_ids = {r.doc_id for r in new_docs.select("doc_id").collect()}
    bands_new = bands_all.where(F.col("doc_id").isin(new_ids))
    cand = (
        bands_new.alias("n")
        .join(
            bands_all.alias("c"),
            (F.col("n.band") == F.col("c.band"))
            & (F.col("n.band_sig") == F.col("c.band_sig"))
            & (F.col("n.doc_id") != F.col("c.doc_id")),
        )
        .select(
            F.least("n.doc_id", "c.doc_id").alias("doc_a"),
            F.greatest("n.doc_id", "c.doc_id").alias("doc_b"),
        )
        .distinct()
    )
    sizes = sh_all.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    inter = (
        cand.join(sh_all.alias("sa"), F.col("doc_a") == F.col("sa.doc_id"))
        .join(
            sh_all.alias("sb"),
            (F.col("doc_b") == F.col("sb.doc_id"))
            & (F.col("sa.shingle") == F.col("sb.shingle")),
        )
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    return (
        inter.join(sizes.alias("za"), F.col("doc_a") == F.col("za.doc_id"))
        .join(sizes.alias("zb"), F.col("doc_b") == F.col("zb.doc_id"))
        .withColumn(
            "jaccard",
            F.round(
                F.col("n_inter")
                / (F.col("za.n_sh") + F.col("zb.n_sh") - F.col("n_inter")),
                4,
            ),
        )
        .filter(F.col("jaccard") >= 0.5)
        .select("doc_a", "doc_b", "jaccard")
    )


def _matrix_rows(spark, pairs, src_df):
    """(source_a, source_b) → (n_pairs, min_j, max_j), the operator's
    reduce."""
    sa = src_df.select(
        F.col("doc_id").alias("doc_a"), F.col("source").alias("sa")
    )
    sb = src_df.select(
        F.col("doc_id").alias("doc_b"), F.col("source").alias("sb")
    )
    return {
        (r.source_a, r.source_b): (r.n_pairs, r.min_j, r.max_j)
        for r in (
            pairs.join(sa, "doc_a")
            .join(sb, "doc_b")
            .select(
                F.least("sa", "sb").alias("source_a"),
                F.greatest("sa", "sb").alias("source_b"),
                "jaccard",
            )
            .groupBy("source_a", "source_b")
            .agg(
                F.count("*").alias("n_pairs"),
                F.min("jaccard").alias("min_j"),
                F.max("jaccard").alias("max_j"),
            )
            .collect()
        )
    }


def test_streaming_overlap_matrix_equals_batch(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    now = time.time()
    by_id = {d[0]: d for d in _DOCS}
    for i, ids in enumerate(_BATCHES):
        _stage_file(
            spark.createDataFrame([by_id[i_] for i_ in ids], _SCHEMA),
            src,
            f"b{i}.parquet",
            now - 60 * (len(_BATCHES) - i),
        )

    state = {"seen": None, "cells": {}, "epochs": 0}

    def handler(batch_df, epoch_id):
        state["epochs"] += 1
        batch = batch_df.localCheckpoint(eager=True)
        seen = (
            batch
            if state["seen"] is None
            else state["seen"].unionByName(batch)
        )
        state["seen"] = seen.localCheckpoint(eager=True)
        inc = _matrix_rows(
            spark, _verified_pairs(spark, batch, state["seen"]), state["seen"]
        )
        for key, (n, lo, hi) in inc.items():
            if key in state["cells"]:
                n0, lo0, hi0 = state["cells"][key]
                state["cells"][key] = (n0 + n, min(lo0, lo), max(hi0, hi))
            else:
                state["cells"][key] = (n, lo, hi)

    q = (
        spark.readStream.schema(_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    assert state["epochs"] == len(_BATCHES)

    corpus = spark.createDataFrame(_DOCS, _SCHEMA)
    batch_cells = _matrix_rows(
        spark, _verified_pairs(spark, corpus, corpus), corpus
    )
    assert state["cells"] == batch_cells
    # shape sanity: the exact-copy triangle spans s1-s2 twice and s2-s2
    # once at J=1.0; the partial dup lands within s1
    assert batch_cells[("s1", "s2")][0] == 2
    assert batch_cells[("s1", "s2")][1] == batch_cells[("s1", "s2")][2] == 1.0
    assert batch_cells[("s2", "s2")] == (1, 1.0, 1.0)
    assert batch_cells[("s1", "s1")][0] == 1
    assert 0.5 <= batch_cells[("s1", "s1")][1] < 1.0
    assert ("s3", "s3") not in batch_cells
    assert not any("s3" in k for k in batch_cells)
