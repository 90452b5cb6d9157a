"""Streaming × survival crossover: CONTINUOUS Kaplan–Meier maintenance
— the streaming dual of ``orders_kaplan_meier_ship``
(equivalence proof #24).

Lineitems stream in micro-batches; the maintained state is ONE
(orderdate, min shipdate) pair per order — an upsert keyed on the
order, merged with ``min`` (order-free, idempotent), never the raw
lineitems, so state is compressed by the lineitem:order ratio.  The
observation cutoff itself EVOLVES (max shipdate − 60 d): a later batch
can flip an order from event to censored or move the cutoff past an
order's first ship, so per-order classifications are provisional by
construction — which is exactly why the curve must be DERIVED from the
compact state at read time rather than accumulated as counts.

Hard signal: after all batches, the curve derived from the state by
the integer product-limit fold (truncating division toward zero)
EXACTLY equals the batch ``orders_kaplan_meier_ship`` on the same
data, row for row.
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    _KM_CENSOR_DAYS,
    orders_kaplan_meier_ship,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def _tdiv(n: int, d: int) -> int:
    q = abs(n) // abs(d)
    return q if (n >= 0) == (d > 0) else -q


def test_streaming_km_maintenance_matches_batch(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select("l_orderkey", "l_shipdate")
    src = str(tmp_path / "li_stream")
    os.makedirs(src)
    now = time.time()
    parts = li.withColumn("m", F.pmod(F.xxhash64("l_orderkey", "l_shipdate"), F.lit(3)))
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # lineitem-derived state: per-order first-ship upsert (min-merge)
    # plus ONE scalar — the global max shipdate the evolving cutoff
    # hangs off (max of per-order minima is NOT it); orders is the
    # static dimension side
    ship0: dict[int, dt.date] = {}
    maxship: list[dt.date] = []
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.groupBy("l_orderkey")
            .agg(
                F.min(F.col("l_shipdate").cast("date")).alias("s0"),
                F.max(F.col("l_shipdate").cast("date")).alias("s1"),
            )
            .collect()
        )
        for r in part:
            k = r["l_orderkey"]
            if k not in ship0 or r["s0"] < ship0[k]:
                ship0[k] = r["s0"]
            if not maxship or r["s1"] > maxship[0]:
                maxship[:] = [r["s1"]]

    q = (
        spark.readStream.schema("l_orderkey bigint, l_shipdate timestamp")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the curve from the compact state: evolving cutoff, study
    # classification, day table, integer product-limit fold
    od = {
        r["o_orderkey"]: r["od"]
        for r in load_table(spark, "orders", SF)
        .select("o_orderkey", F.col("o_orderdate").cast("date").alias("od"))
        .collect()
    }
    cut = maxship[0] - dt.timedelta(days=_KM_CENSOR_DAYS)
    days: dict[int, list[int]] = {}
    for k, s0 in ship0.items():
        if od[k] > cut:
            continue  # placed after the cutoff: out of the study
        if s0 <= cut:
            t, is_event = (s0 - od[k]).days, True
        else:
            t, is_event = (cut - od[k]).days, False
        d = days.setdefault(t, [0, 0])
        d[0 if is_event else 1] += 1

    nrem = sum(d + c for d, c in days.values())
    surv = 1_000_000
    got = []
    for t in sorted(days):
        d, c = days[t]
        if d > 0:
            surv = _tdiv(surv * (nrem - d), nrem)
        got.append((t, nrem, d, c, surv))
        nrem -= d + c

    batch = sorted(
        (r["t_days"], r["n_at_risk"], r["n_events"], r["n_censored"],
         r["surv_ppm"])
        for r in orders_kaplan_meier_ship(spark, SF).collect()
    )
    assert batch
    assert got == batch
