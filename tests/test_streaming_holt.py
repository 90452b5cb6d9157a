"""Streaming × monitoring crossover: CONTINUOUS Holt level+trend
maintenance — the streaming dual of ``events_holt_linear``
(equivalence proof #9).

Each micro-batch folds its per-(type, hour) (count, exact-decimal sum)
pairs into accumulated state — counts AND decimal sums merge
order-free (the rollup merge discipline), so the hourly means are
derivable exactly at any point.  The Holt (level, trend) pair is then
DERIVED from the accumulated state by the textbook Python fold, never
from raw events.

Hard signal: after all batches, the derived per-type
(n_buckets, level, trend, forecast) must EXACTLY equal the batch
``events_holt_linear`` on the same data — float()-of-Decimal and
Spark's decimal→double cast are both correctly rounded, and the fold
is the identical IEEE op sequence, so equality is bitwise before the
shared floor-rounding.
"""

from __future__ import annotations

import math
import os
import time
from decimal import Decimal

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    events_holt_linear,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def test_streaming_holt_maintenance_matches_batch(spark, tmp_path):
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

    # accumulated state: {(type, hour) -> [n_rows, decimal_sum_or_None]}
    # — the sum stays None until a non-NULL value arrives, so a bucket
    # whose every value is NULL is representable and can be SKIPPED at
    # derive time exactly like the batch query's NULL-mean filter
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

    # derive Holt from the ACCUMULATED state: hourly means in bucket
    # order, SKIPPING NULL-mean buckets (sum still None — the batch
    # query's .where(mean IS NOT NULL) contract), textbook fold,
    # shared floor-rounding
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
        l, t = xs[0], 0.0
        for x in xs[1:]:
            ln = (x + l + t) / 2.0
            t = (t + (ln - l)) / 2.0
            l = ln
        got[etype] = (len(xs), fl4(l), fl4(t), fl4(l + t))

    batch = {
        r["event_type"]: (
            r["n_buckets"],
            r["holt_level"],
            r["holt_trend"],
            r["forecast_next"],
        )
        for r in events_holt_linear(spark, SF).collect()
    }
    assert batch
    assert got == batch
