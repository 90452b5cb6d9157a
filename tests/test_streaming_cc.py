"""Streaming × dedup crossover: INCREMENTAL connected components —
the streaming dual of ``dedup_components`` (equivalence proof #14).

The near-dup pair stream is the production shape (each ingest's LSH
pass emits new verified pairs — ``dedup_incremental_lsh``); cluster
maintenance is a driver union-find that absorbs each micro-batch's
edges into O(|nodes-in-pairs|) state.  Union-find is insertion-order
independent (the component partition is a pure function of the edge
SET), so the accumulated structure after any batch split must equal
the single-pass clustering.

Hard signal: after all batches, (node → min-reachable-node) labels
derived from the accumulated union-find must EXACTLY equal the batch
``dedup_components`` output on the same corpus — the same
max-root-points-to-min-root policy, so roots ARE component minima on
both sides.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.dedup import (
    dedup_components,
    dedup_minhash_lsh_pairs,
)
from _helpers import stage_file as _stage_file

SF = "/root/testdata/sf0.001"


def test_streaming_union_find_matches_batch_components(spark, tmp_path):
    pairs = dedup_minhash_lsh_pairs(spark, SF).select("doc_a", "doc_b")
    assert pairs.count() > 0, "fixture must produce near-dup pairs"
    src = str(tmp_path / "pair_stream")
    os.makedirs(src)
    now = time.time()
    parts = pairs.withColumn("m", (F.col("doc_a") + F.col("doc_b")) % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # accumulated state: union-find parent map over nodes seen in pairs
    # (the batch query's driver-tail strategy, here fed incrementally)
    parent: dict[int, int] = {}
    epochs = {"n": 0}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]  # path halving
            x = parent[x]
        return x

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        for r in batch_df.collect():
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)

    q = (
        spark.readStream.schema("doc_a bigint, doc_b bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    got = {n: find(n) for n in parent}
    batch = {
        r["doc_id"]: r["cluster"]
        for r in dedup_components(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
