"""Streaming × monitoring crossover: CONTINUOUS EWMA maintenance —
the streaming dual of ``events_ewma_hourly`` (equivalence proof #16,
the single-exponential sibling of the Holt proof #9).

Micro-batches fold per-(type, hour) (count, exact-decimal sum) pairs
into accumulated state — both merge order-free — and the α = ½ EWMA is
DERIVED from the accumulated hourly means by the same left fold the
query runs (``acc ← (acc + x)/2`` over bucket order, null semantics
included), so equality with the batch output is bitwise before the
shared 4dp floor-rounding.
"""

from __future__ import annotations

import math
import os
import time
from decimal import Decimal

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    events_ewma_hourly,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file

SF = "/root/testdata/sf0.001"


def test_streaming_ewma_maintenance_matches_batch(spark, tmp_path):
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
    # — the Holt-proof state shape (one fold discipline for the family)
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

    # derive from ACCUMULATED state: hourly means in bucket order (a
    # bucket whose sum stayed None has a NULL mean — included, matching
    # the batch query's unfiltered series), then the exact fold
    series: dict[str, list[tuple]] = {}
    for (etype, b), (n, s) in state.items():
        assert n > 0
        mean = float(s) / n if s is not None else None
        series.setdefault(etype, []).append((b, mean))

    def fl4(v):
        return (
            None if v is None else math.floor(v * 10000 + 0.5) / 10000.0
        )

    got = {}
    for etype, pairs in series.items():
        xs = [x for _b, x in sorted(pairs)]
        acc = None
        for x in xs:
            if acc is None:
                acc = x
            elif x is None:
                acc = None  # (acc + NULL)/2 is NULL in both engines
            else:
                acc = (acc + x) / 2.0
        got[etype] = (len(xs), fl4(xs[-1]), fl4(acc))

    batch = {
        r["event_type"]: (r["n_buckets"], r["last_mean"], r["ewma_level"])
        for r in events_ewma_hourly(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
