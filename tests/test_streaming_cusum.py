"""Streaming × monitoring crossover: CONTINUOUS CUSUM maintenance —
the streaming dual of ``events_cusum_change``.

Each micro-batch folds its per-(type, hour) counts into an accumulated
hourly state (counts add — the rollup merge discipline); the CUSUM
alarm is then DERIVED from the accumulated state, never from raw
events — the refresh shape a 100 TB monitoring pipeline needs.

Hard signal: after all batches, the derived per-type (final, max,
breached) triples must EXACTLY equal the batch ``events_cusum_change``
on the same data.  Integer counts merge order-free, so stream==batch
holds exactly; the python fold here is the textbook recursion, so this
doubles as a second independent check of the batch query's drawup-
identity formulation.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import events_cusum_change
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def test_streaming_cusum_maintenance_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select("event_type", "ts")
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    parts = ev.withColumn("m", F.unix_micros("ts") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # accumulated hourly count state: {(type, hour) -> n}
    state: dict = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.groupBy(
                "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
            )
            .agg(F.count("*").alias("n"))
            .collect()
        )
        for r in part:
            key = (r["event_type"], r["b"])
            state[key] = state.get(key, 0) + r["n"]

    q = (
        spark.readStream.schema("event_type string, ts timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the alarm from the ACCUMULATED state with the textbook
    # recursive fold (independent of the batch query's window algebra)
    series: dict[str, list[tuple]] = {}
    for (etype, b), n in state.items():
        series.setdefault(etype, []).append((b, n))
    from _helpers import cusum_fold

    got = {
        etype: cusum_fold([n for _b, n in sorted(pairs)])
        for etype, pairs in series.items()
    }

    batch = {
        r["event_type"]: (
            r["n_buckets"],
            r["tgt"],
            r["final_cusum"],
            r["max_cusum"],
            r["breached"],
        )
        for r in events_cusum_change(spark, SF).collect()
    }
    assert got == batch
