"""Streaming × monitoring crossover: CONTINUOUS ACF maintenance — the
streaming dual of ``events_acf_hourly`` (equivalence proof #8).

Each micro-batch folds its per-(type, hour) counts into an accumulated
hourly state (counts add — the rollup merge discipline shared with the
CUSUM proof); the lag-k autocorrelations are then DERIVED from the
accumulated state, never from raw events.

Hard signal: after all batches, the derived per-(type, lag) ppm values
must EXACTLY equal the batch ``events_acf_hourly`` on the same data.
The derivation here is an INDEPENDENT formulation — the textbook
mean-centered estimator over the densified series in exact Python
integer arithmetic (numerator/denominator scaled by n, truncation
toward zero) — so this doubles as a second check of the batch query's
n-scaling identity and its DECIMAL(38,0)/HUGEINT div discipline.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    _ACF_MAX_LAG,
    _EVENT_TYPES,
    events_acf_hourly,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def test_streaming_acf_maintenance_matches_batch(spark, tmp_path):
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

    from _helpers import acf_from_state

    got = acf_from_state(state, _EVENT_TYPES, _ACF_MAX_LAG)

    batch = {
        (r["event_type"], r["lag"]): r["acf_ppm"]
        for r in events_acf_hourly(spark, SF).collect()
    }
    assert batch  # non-vacuous: sf0.001 spans far more than 24 hours
    assert got == batch

    # The SAME accumulated count state also maintains the CCF — the
    # whole correlation family is derivable from one streaming rollup
    from _helpers import ccf_from_state
    from decisions_kinesis_spark.operators.analytics_ext import (
        _CCF_MAX_LAG,
        events_ccf_hourly,
    )

    got_ccf = ccf_from_state(state, _EVENT_TYPES, _CCF_MAX_LAG)
    batch_ccf = {
        (r["type_lead"], r["type_lag"], r["lag"]): r["ccf_r_ppm"]
        for r in events_ccf_hourly(spark, SF).collect()
    }
    assert batch_ccf
    assert got_ccf == batch_ccf
