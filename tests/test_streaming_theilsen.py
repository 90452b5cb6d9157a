"""Streaming × monitoring crossover: CONTINUOUS Theil–Sen trend
maintenance — the streaming dual of ``events_theil_sen_trend``
(equivalence proof #23).

Each micro-batch folds its per-(type, hour) (count, exact-decimal sum)
pairs into accumulated state — the same additive rollup-merge
discipline as the Holt proof (#9), and the SAME state: counts and
decimal sums merge order-free, so the ×10⁴-quantized hourly means are
derivable exactly at any point.  The robust slope is then DERIVED from
the accumulated state by the textbook pairwise-median computation in
pure integer Python, never from raw events — state stays
calendar-bounded (one (n, Σ) pair per (type, hour)) no matter how many
events stream through.

Hard signal: after all batches, the derived per-type
(n_points, n_pairs, slope_ppm, intercept_ppm) must EXACTLY equal the
batch ``events_theil_sen_trend`` on the same data — every step after
the shared float()-of-Decimal mean is integer arithmetic (truncating
division toward zero, matching Spark ``div`` / DuckDB ``//``), so
equality is exact, not approximate.
"""

from __future__ import annotations

import math
import os
import time
from decimal import Decimal

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    events_theil_sen_trend,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def _tdiv(n: int, d: int) -> int:
    """Integer division truncating toward zero — Spark ``div`` and
    DuckDB ``//`` semantics (Python ``//`` floors, which differs on
    negative numerators)."""
    q = abs(n) // abs(d)
    return q if (n >= 0) == (d > 0) else -q


def test_streaming_theil_sen_maintenance_matches_batch(spark, tmp_path):
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
    # — the hourly rollup is the ONLY thing maintained; pairwise slopes
    # are recomputed from it at derive time (calendar-bounded work).
    # The sum stays None until a non-NULL value arrives, so an all-NULL
    # hour is representable and skipped at derive time exactly like the
    # batch query's NULL-mean filter.
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

    # derive the robust trend from the ACCUMULATED state: per-type
    # series in bucket order, shared ×10⁴ quantization, all C(n,2)
    # integer slopes, lower median under (slope, x1, x2) order
    series: dict[str, list[tuple]] = {}
    for (etype, b), (n, s) in state.items():
        assert n > 0
        if s is None:
            continue  # all-NULL hour: batch skips it too
        series.setdefault(etype, []).append(
            (b, math.floor(float(s) / n * 10000 + 0.5))
        )

    got = {}
    for etype, pairs in series.items():
        ys = [y for _b, y in sorted(pairs)]
        n_points = len(ys)
        if n_points < 2:
            continue
        slopes = sorted(
            (_tdiv((ys[j] - ys[i]) * 1_000_000, j - i), i + 1, j + 1)
            for i in range(n_points)
            for j in range(i + 1, n_points)
        )
        m = len(slopes)
        slope = slopes[(m + 1) // 2 - 1][0]
        resid = sorted(
            (y * 1_000_000 - slope * x, x)
            for x, y in enumerate(ys, start=1)
        )
        icept = resid[(n_points + 1) // 2 - 1][0]
        got[etype] = (n_points, m, slope, icept)

    batch = {
        r["event_type"]: (
            r["n_points"],
            r["n_pairs"],
            r["slope_ppm"],
            r["intercept_ppm"],
        )
        for r in events_theil_sen_trend(spark, SF).collect()
    }
    assert batch
    assert got == batch
