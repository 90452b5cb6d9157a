"""Streaming × rollup crossover: CONTINUOUS-AGGREGATE maintenance —
the streaming dual of ``events_rollup_cascade``.  Each micro-batch
folds its per-(type, hour) partial aggregates into an accumulated
hourly state (decimal sums merge exactly: counts add, sums add), and
the coarser daily level is derived FROM THE ACCUMULATED HOURLY STATE,
never from raw events — the refresh discipline a 100 TB hypertable
needs, where re-scanning raw data per refresh is impossible.

Hard signal: after all batches, the accumulated hourly and derived
daily frames must EXACTLY equal the batch ``events_rollup_cascade``
levels on the same data (decimal-exact sums make the merge
order-free, so stream==batch holds bit-for-bit).
"""

from __future__ import annotations

import os
import time
from decimal import Decimal

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.windows_ext import events_rollup_cascade
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def test_streaming_continuous_rollup_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select("event_type", "ts", "value")
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    # split on event_id parity proxies: hash of ts microseconds
    parts = ev.withColumn("m", F.unix_micros("ts") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # accumulated hourly state: {(type, hour) -> [n, decimal_sum]}
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
            n0, s0 = state.get(key, (0, Decimal(0)))
            state[key] = (n0 + r["n"], s0 + r["sdec"])

    q = (
        spark.readStream.schema("event_type string, ts timestamp, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    def _round4(d: Decimal) -> float:
        import math

        return math.floor(float(d) * 10000 + 0.5) / 10000.0

    batch = events_rollup_cascade(spark, SF).collect()
    batch_hour = {
        (r["event_type"], r["bucket_ts"]): (r["n"], r["sum_value"])
        for r in batch
        if r["level"] == "hour"
    }
    batch_day = {
        (r["event_type"], r["bucket_ts"]): (r["n"], r["sum_value"])
        for r in batch
        if r["level"] == "day"
    }
    got_hour = {k: (n, _round4(s)) for k, (n, s) in state.items()}
    assert got_hour == batch_hour, (
        f"hourly mismatch: missing={set(batch_hour) - set(got_hour)} "
        f"extra={set(got_hour) - set(batch_hour)}"
    )
    # daily derived from the ACCUMULATED hourly state, never raw events.
    # TZ-robustness: collected datetimes render in the session timezone,
    # so midnight-truncating them only matches the query's
    # date_trunc('day') keys when that timezone is UTC — instead, fold
    # the BATCH hourly frame with the IDENTICAL python truncation and
    # compare key-exact against that, then compare the query's own day
    # level by VALUE MULTISET (timezone-independent).
    def _fold_daily(hourly: dict) -> dict:
        out: dict = {}
        for (etype, hour), (n, sdec) in hourly.items():
            key = (etype, hour.replace(hour=0, minute=0, second=0, microsecond=0))
            n0, s0 = out.get(key, (0, Decimal(0)))
            out[key] = (n0 + n, s0 + sdec)
        return out

    batch_hour_dec = {
        k: (n, Decimal(str(s))) for k, (n, s) in batch_hour.items()
    }
    got_day = {k: (n, _round4(s)) for k, (n, s) in _fold_daily(state).items()}
    ref_day = {
        k: (n, _round4(s)) for k, (n, s) in _fold_daily(batch_hour_dec).items()
    }
    assert got_day == ref_day
    assert sorted(got_day.values()) == sorted(batch_day.values())
