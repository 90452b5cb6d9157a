"""Streaming join-key skew-profiler maintenance — the streaming dual of
``profile_join_skew`` (equivalence proof #35).

The profiler's ONLY corpus-grain state is the per-key row count, which
is ADDITIVE: each micro-batch contributes its own per-key counts and
the maintainer sums them, order-free across batches.  Everything else
the report shows — the key-count/row-count moments, the ppm share, the
×1000 skew factor, and the top-N cut — is DERIVED at read time from
that state, exactly as the batch operator derives it from one scan.
This is the stats-collector shape a streaming engine persists: O(|keys|)
state no matter how many batches arrive, with the hot-key diagnostic
available continuously instead of once per batch job.

Hard signal: after all batches, the report derived from the maintained
state (exact Python bigint arithmetic replaying the operator's
truncating integer divs) equals the batch query's rows EXACTLY —
including the (n_rows_key DESC, join_key ASC) top-N order.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file
from decisions_kinesis_spark.operators.relational import (
    _SKEW_TOP,
    profile_join_skew,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_join_skew_profile_matches_batch(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select("l_orderkey")
    src = str(tmp_path / "li_stream")
    os.makedirs(src)
    now = time.time()
    parts = li.withColumn("m", F.col("l_orderkey") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # maintained state: {join_key -> row count}; additive across batches
    counts: dict[int, int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.groupBy("l_orderkey")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        for r in part:
            k = r["l_orderkey"]
            counts[k] = counts.get(k, 0) + r["c"]

    q = (
        spark.readStream.schema("l_orderkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the report from the maintained state — exact Python ints
    # replay the operator's truncating divs (all terms positive here)
    n_keys = len(counts)
    n_rows = sum(counts.values())
    top = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:_SKEW_TOP]
    got = [
        (
            k,
            c,
            n_keys,
            n_rows,
            c * 1_000_000 // n_rows,
            c * n_keys * 1000 // n_rows,
        )
        for k, c in top
    ]

    batch = [
        (
            r["join_key"],
            r["n_rows_key"],
            r["n_keys"],
            r["n_rows"],
            r["share_ppm"],
            r["skew_x1000"],
        )
        for r in profile_join_skew(spark, SF).collect()
    ]
    assert got == batch  # ordered compare: the top-N order is contract
