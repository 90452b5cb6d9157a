"""Streaming × quality-gating crossover: the three per-document gates
(Gopher heuristics, repetition rules, classifier) applied to each
micro-batch through foreachBatch, with cumulative funnel counters —
live curation monitoring for continuous ingestion.  The gates are
frame-level functions shared VERBATIM with the batch queries
(``corpus.gopher_flags`` / ``repetition_flags`` / ``classifier_score``
— the ``doc_token_grams`` single-definition discipline), so the stream
cannot drift from the batch semantics.

Hard signal: per-document verdicts collected through the stream must
EXACTLY equal the batch operators' output on the same corpus, and the
cumulative keep-counts must equal the batch funnel's conditional
counts over the first three gate stages.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators import corpus as C
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def test_streaming_quality_gates_match_batch(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    now = time.time()
    _stage_file(docs.filter(F.col("doc_id") % 3 == 0), src, "b1.parquet", now - 120)
    _stage_file(docs.filter(F.col("doc_id") % 3 == 1), src, "b2.parquet", now - 60)
    _stage_file(docs.filter(F.col("doc_id") % 3 == 2), src, "b3.parquet", now)

    state = {"verdicts": {}, "epochs": 0, "n_total": 0, "n_keep_all": 0}

    def handler(batch_df, epoch_id):
        state["epochs"] += 1
        batch = batch_df.select("doc_id", "text")
        g = C.gopher_flags(batch).select("doc_id", F.col("keep").alias("kg"))
        r = C.repetition_flags(batch).select(
            "doc_id", F.col("keep").alias("kr")
        )
        c = C.classifier_score(batch).select(
            "doc_id", F.col("keep").alias("kc")
        )
        j = (
            batch.select("doc_id")
            .join(g, "doc_id", "left")
            .join(r, "doc_id", "left")
            .join(c, "doc_id", "left")
            .select(
                "doc_id",
                F.coalesce("kg", F.lit(False)).alias("kg"),
                F.coalesce("kr", F.lit(False)).alias("kr"),
                F.coalesce("kc", F.lit(False)).alias("kc"),
            )
        )
        for row in j.collect():
            state["verdicts"][row.doc_id] = (row.kg, row.kr, row.kc)
            state["n_total"] += 1
            if row.kg and row.kr and row.kc:
                state["n_keep_all"] += 1

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    assert state["epochs"] == 3

    expected = {}
    g = {r.doc_id: r.keep for r in C.quality_gopher_flags(spark, SF).collect()}
    rp = {
        r.doc_id: r.keep
        for r in C.quality_repetition_flags(spark, SF).collect()
    }
    cl = {
        r.doc_id: r.keep
        for r in C.quality_classifier_score(spark, SF).collect()
    }
    for r in docs.select("doc_id").collect():
        expected[r.doc_id] = (
            bool(g.get(r.doc_id, False)),
            bool(rp.get(r.doc_id, False)),
            bool(cl.get(r.doc_id, False)),
        )
    assert expected, "batch reference unexpectedly empty"
    assert state["verdicts"] == expected, (
        "streaming gate verdicts diverged from batch: "
        f"missing={set(expected) - set(state['verdicts'])} "
        f"extra={set(state['verdicts']) - set(expected)}"
    )
    assert state["n_total"] == len(expected)
    assert state["n_keep_all"] == sum(
        1 for v in expected.values() if all(v)
    )
