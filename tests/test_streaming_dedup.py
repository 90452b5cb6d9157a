"""Streaming × dedup crossover: incremental near-dup detection through
the foreachBatch runtime — the per-ingest production shape at 100 TB,
where each micro-batch is checked against a PERSISTED corpus band
index (here: an accumulated localCheckpoint'd frame) and the corpus is
never re-deduplicated.  Composes the batch LSH machinery
(`dedup._doc_shingles` / `dedup._band_table`, the same helpers behind
``dedup_incremental_lsh``) with Structured Streaming's file source.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.dedup import _band_table, _doc_shingles

_TEXT_A = (
    "the quick brown fox jumps over the lazy dog again and again in the"
    " long meadow by the winding river at dawn"
)
_TEXT_B = (
    "completely different words about spark shuffles broadcast joins and"
    " adaptive query execution plans at cluster scale"
)
_TEXT_D = (
    "yet another unrelated document discussing minhash bands shingle sets"
    " and exact jaccard verification stages in depth"
)


from _helpers import stage_file as _stage_file


def test_streaming_incremental_near_dup_detection(spark, tmp_path):
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    now = time.time()
    _stage_file(
        spark.createDataFrame(
            [(1, _TEXT_A), (2, _TEXT_B)], "doc_id long, text string"
        ),
        src,
        "b1.parquet",
        now - 60,  # file source orders by mtime: b1 strictly first
    )
    _stage_file(
        spark.createDataFrame(
            [(3, _TEXT_A), (4, _TEXT_D)], "doc_id long, text string"
        ),
        src,
        "b2.parquet",
        now,
    )

    state = {"index": None, "flagged": [], "epochs": 0}

    def handler(batch_df, epoch_id):
        state["epochs"] += 1
        bands = _band_table(
            _doc_shingles(batch_df.select("doc_id", "text"))
        ).localCheckpoint(eager=True)
        if state["index"] is not None:
            hits = (
                bands.alias("n")
                .join(
                    state["index"].alias("c"),
                    (F.col("n.band") == F.col("c.band"))
                    & (F.col("n.band_sig") == F.col("c.band_sig")),
                )
                .select(
                    F.col("n.doc_id").alias("new_id"),
                    F.col("c.doc_id").alias("corpus_id"),
                )
                .distinct()
                .collect()
            )
            state["flagged"].extend((r.new_id, r.corpus_id) for r in hits)
            state["index"] = (
                state["index"].unionByName(bands).localCheckpoint(eager=True)
            )
        else:
            state["index"] = bands

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert state["epochs"] == 2  # one micro-batch per staged file
    # the later exact copy is flagged against its earlier original...
    assert (3, 1) in state["flagged"]
    # ...and the unique documents stay clean
    new_ids = {n for n, _ in state["flagged"]}
    assert 2 not in new_ids and 4 not in new_ids
