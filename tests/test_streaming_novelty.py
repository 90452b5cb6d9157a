"""Streaming novelty-curve maintenance — the streaming dual of
``corpus_novelty_curve`` (equivalence proof #38).

State shape this proof adds to the catalog: a MIN-SEMILATTICE over an
unbounded key space plus a distinct-pair set.  A gram's first-seen
bucket is ``min(bucket)`` over its occurrences — min is associative,
commutative, and idempotent, so per-batch minima merge order-free into
{gram → first bucket}; the per-bucket type counts need the distinct
(bucket, gram) pairs, which is SET-UNION state (idempotent too — a
re-delivered batch changes nothing, making the maintainer exactly-once
for free).  The recoverability line is honest: this state IS the
corpus's distinct-gram inventory (the decontamination class), ~|gram
types| cells — the price of an exact always-current novelty curve; the
batch operator re-derives it in two aggregations when a pipeline only
wants the curve at rebuild time.

Hard signal: after all batches, the curve derived from maintained
state (exact Python ints replaying the truncating ppm div) equals the
batch query's rows EXACTLY.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file
from decisions_kinesis_spark.operators.corpus import (
    _NOVELTY_BUCKET,
    corpus_novelty_curve,
    doc_token_grams,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_novelty_curve_matches_batch(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select("doc_id", "text")
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    now = time.time()
    parts = docs.withColumn("m", F.col("doc_id") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    first_seen: dict[int, int] = {}  # gram hash -> min bucket
    pairs: set[tuple[int, int]] = set()  # distinct (bucket, gram)
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            doc_token_grams(batch_df)
            .select(
                F.expr(f"doc_id div {_NOVELTY_BUCKET}").alias("bucket"),
                "g",
            )
            .distinct()
            .collect()
        )
        for r in part:
            b, g = r["bucket"], r["g"]
            pairs.add((b, g))  # set union: idempotent on redelivery
            if g not in first_seen or b < first_seen[g]:
                first_seen[g] = b  # min-semilattice merge

    q = (
        spark.readStream.schema("doc_id bigint, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the curve from maintained state — exact Python ints
    types: dict[int, int] = {}
    novel: dict[int, int] = {}
    for b, g in pairs:
        types[b] = types.get(b, 0) + 1
        if first_seen[g] == b:
            novel[b] = novel.get(b, 0) + 1
    got = sorted(
        (
            b,
            types[b],
            novel.get(b, 0),
            novel.get(b, 0) * 1_000_000 // types[b],
        )
        for b in types
    )

    batch = sorted(
        (r["bucket"], r["n_gram_types"], r["n_novel_types"], r["novelty_ppm"])
        for r in corpus_novelty_curve(spark, SF).collect()
    )
    assert got == batch
