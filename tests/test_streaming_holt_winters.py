"""Streaming × forecasting crossover: CONTINUOUS Holt–Winters
maintenance (equivalence proof #33) — the streaming dual of
``events_holt_winters``, extending the Holt proof (#9) with the
seasonal axis.

State stays the SAME compact additive form — per-(type, hour) (count,
exact-decimal sum), order-free merge across micro-batches — because
the seasonal vector, like level and trend, is a DERIVED quantity of
the hourly-mean series: the sequential fold (including the 24-slot
seasonal accumulator) replays at read time over the calendar-bounded
series.  Nothing order-dependent is ever accumulated across batches —
the recoverability criterion the CUPED rejection established, satisfied
here because the irreversible (sequential) part of the computation is
confined to the bounded rollup grain.

Hard signal: derived (n_buckets, level, trend, seasonal amplitude,
forecast) EXACTLY equals batch ``events_holt_winters`` — the fold is
the identical IEEE sequence, so equality is bitwise before the shared
floor-rounding.
"""

from __future__ import annotations

import math
import os
import time
from decimal import Decimal

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file
from decisions_kinesis_spark.operators.analytics_ext import (
    _HW_M,
    events_holt_winters,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_holt_winters_maintenance_matches_batch(
    spark, tmp_path
):
    ev = load_table(spark, "events", SF).select("event_type", "ts", "value")
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
            n, s = state.get(key, (0, None))
            if r["sdec"] is not None:
                s = (s if s is not None else Decimal(0)) + r["sdec"]
            state[key] = (n + r["n"], s)

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

    series: dict[str, list[tuple]] = {}
    for (etype, b), (n, s) in state.items():
        assert n > 0
        if s is None:
            continue  # all-NULL hour: batch skips it too
        series.setdefault(etype, []).append((b, float(s) / n))

    def fl4(v: float) -> float:
        return math.floor(v * 10000 + 0.5) / 10000.0

    got = {}
    for etype, pairs in series.items():
        xs = [x for _b, x in sorted(pairs)]
        l, t, s = xs[0], 0.0, [0.0] * _HW_M
        for j in range(1, len(xs)):
            x = xs[j]
            slot = j % _HW_M
            lp = (x - s[slot] + l + t) / 2.0
            t = (t + (lp - l)) / 2.0
            s[slot] = (s[slot] + (x - lp)) / 2.0
            l = lp
        got[etype] = (
            len(xs),
            fl4(l),
            fl4(t),
            fl4(max(s) - min(s)),
            fl4(l + t + s[len(xs) % _HW_M]),
        )

    batch = {
        r["event_type"]: (
            r["n_buckets"],
            r["hw_level"],
            r["hw_trend"],
            r["hw_season_amp"],
            r["forecast_next"],
        )
        for r in events_holt_winters(spark, SF).collect()
    }
    assert batch
    assert got == batch
