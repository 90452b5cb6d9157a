"""Streaming × hypertable crossover: CONTINUOUS interpolation gap-fill
maintenance — the streaming dual of ``events_gapfill_interp``
(equivalence proof #26).

The maintained state is the additive per-(type, hour) (count,
decimal-sum) rollup — the same state family as the Holt/Theil–Sen
proofs — and, unlike the CUPED case (rejected: period membership is
unrecoverable under a moving midpoint), EVERYTHING the operator emits
is derivable from it: the grid anchors are the min/max observed
buckets per type (order-free mins/maxes over state keys), gaps are the
absent keys in between, and the lerp is pure integer arithmetic on the
quantized means.  New batches can EXTEND the span (new grid rows
appear retroactively) and can FILL a former gap (a row flips from
interpolated to observed) — both dynamics exercised by hour-sliced
ingest.

Hard signal: after all batches, the full derived grid — observed and
interpolated rows, quantized values, gap flags — EXACTLY equals the
batch operator on the same data.
"""

from __future__ import annotations

import math
import os
import time
from decimal import Decimal

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.windows_ext import (
    events_gapfill_interp,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def test_streaming_gapfill_interp_maintenance_matches_batch(
    spark, tmp_path
):
    ev = load_table(spark, "events", SF).select("event_type", "ts", "value")
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    # slice by hour parity+type hash so spans extend and gaps fill
    # across batches (not a uniform random shred)
    parts = ev.withColumn(
        "m",
        F.pmod(
            F.xxhash64(F.date_trunc("hour", F.col("ts")), "event_type"),
            F.lit(3),
        ),
    )
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    state: dict = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.groupBy(
                "event_type", F.date_trunc("hour", F.col("ts")).alias("b")
            )
            .agg(
                F.count("*").alias("n"),
                F.sum(F.col("value").cast("decimal(18,4)")).alias("sdec"),
            )
            .collect()
        )
        for r in part:
            key = (r["event_type"], r["b"])
            n, s = state.get(key, (0, Decimal(0)))
            state[key] = (n + r["n"], s + r["sdec"])

    q = (
        spark.readStream.schema(
            "event_type string, ts timestamp, value double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the FULL grid from state: anchors, quantized means, lerp
    import datetime as dt

    got = {}
    for typ in {t for t, _b in state}:
        obs = sorted(b for t, b in state if t == typ)
        ys = {}
        for b in obs:
            n, s = state[(typ, b)]
            ys[b] = int(math.floor(float(s) / n * 10000 + 0.5))
        b0, b1 = obs[0], obs[-1]
        h = b0
        while h <= b1:
            if h in ys:
                got[(typ, h)] = (state[(typ, h)][0], ys[h], ys[h], False)
            else:
                hp = max(b for b in obs if b < h)
                hn = min(b for b in obs if b > h)
                dt_ticks = int((hn - hp).total_seconds() // 3600)
                k = int((h - hp).total_seconds() // 3600)
                interp = ys[hp] + tdiv((ys[hn] - ys[hp]) * k, dt_ticks)
                got[(typ, h)] = (0, None, interp, True)
            h = h + dt.timedelta(hours=1)

    batch = {
        (r["event_type"], r["bucket_ts"]): (
            r["n_events"], r["avg_q4"], r["interp_q4"], r["gap_filled"],
        )
        for r in events_gapfill_interp(spark, SF).collect()
    }
    assert batch
    assert got == batch
