"""Streaming collocation maintenance — the streaming dual of
``text_collocations`` (equivalence proof #37).

A bigram position lives entirely inside one document, and a document
arrives in exactly one micro-batch — so the per-(pair, left, right)
position count c12 is ADDITIVE state, merged order-free across
batches.  Everything the report shows is DERIVED at read time from
that vocabulary-bounded state: the unigram marginals c1/c2 are sums of
c12 over the pair key's two projections, n_pos is the global sum, and
the min-support floor, exact-integer lift, and (lift DESC, hash ASC)
top-k are read-time cuts.  This is the continuously-maintained
phrase-table shape: O(|bigram types|) state while positions grow
unboundedly, with the lift table available at any point in the stream.

Hard signal: after all batches, the report derived from maintained
state (Python bigints replaying the operator's DECIMAL(38,0) interior
lift and truncating div) equals the batch query's rows EXACTLY,
including the tie rule and the top-k cut.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file
from decisions_kinesis_spark.operators.corpus import (
    _BIGRAM_STRUCTS,
    _COLLOC_MIN_N,
    _COLLOC_TOPK,
    text_collocations,
)
from decisions_kinesis_spark.operators.textops import _BIGHASH, _TOKS
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_collocations_match_batch(spark, tmp_path):
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

    # maintained state: {(gb, gu, gv) -> c12}; additive across batches
    c12: dict[tuple[int, int, int], int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.select(F.expr(_TOKS).alias("toks"))
            .filter(F.size("toks") >= 2)
            .select(F.explode(F.expr(_BIGRAM_STRUCTS)).alias("b"))
            .select(
                F.expr(_BIGHASH.format(e="b.gb")).alias("gb"),
                F.expr(_BIGHASH.format(e="b.gu")).alias("gu"),
                F.expr(_BIGHASH.format(e="b.gv")).alias("gv"),
            )
            .groupBy("gb", "gu", "gv")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        for r in part:
            key = (r["gb"], r["gu"], r["gv"])
            c12[key] = c12.get(key, 0) + r["c"]

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

    # derive the report from maintained state — exact Python bigints
    c1: dict[int, int] = {}
    c2: dict[int, int] = {}
    for (gb, gu, gv), c in c12.items():
        c1[gu] = c1.get(gu, 0) + c
        c2[gv] = c2.get(gv, 0) + c
    n_pos = sum(c12.values())
    scored = [
        (gb, c, c1[gu], c2[gv], c * n_pos * 1_000_000 // (c1[gu] * c2[gv]))
        for (gb, gu, gv), c in c12.items()
        if c >= _COLLOC_MIN_N
    ]
    # the operator's lift contract is NULL past int64 (try_cast); the
    # regime needs ~2.7e13 positions, unreachable at this SF — assert
    # that so the ordered compare below stays well-defined
    assert all(r[4] < 2**63 for r in scored)
    scored.sort(key=lambda r: (-r[4], r[0]))
    got = scored[:_COLLOC_TOPK]

    batch = [
        (r["pair_hash"], r["c12"], r["c1"], r["c2"], r["lift_ppm"])
        for r in text_collocations(spark, SF).collect()
    ]
    assert got == batch  # ordered compare: the top-k order is contract
