"""Streaming × time-series crossover: CONTINUOUS duration-weighted
(TWAP) maintenance — the streaming dual of ``events_twap_by_type``
(equivalence proof #19).

Holding intervals depend on ADJACENCY within each user's
(ts, event_id)-ordered stream, so batch boundaries cut intervals: the
streaming state carries each user's LAST event (its µs timestamp,
quantized value, and type) so the next batch's first event closes the
cross-boundary interval — the Markov carry shape (proof #17) with a
duration payload.  State is O(|users| + |types|): one pending event
per user plus the per-type (n, hold_µs, Σvq·dur, Σvq) accumulator —
every component merges by addition, so the accumulated state replays
the batch aggregation exactly.

Micro-batches are time-ordered slices (the ingest reality this
maintenance assumes).  Hard signal: accumulated per-type interval
counts, hold times, and the truncating-division TWAP/mean columns
equal the batch query row-for-row.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    events_twap_by_type,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def test_streaming_twap_maintenance_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
        F.expr("cast(floor(value * 10000 + 0.5) as bigint)").alias("vq"),
    )
    rows = sorted(
        ev.collect(), key=lambda r: (r["us"], r["event_id"])
    )  # test-only global order to cut time-ordered ingest slices
    third = (len(rows) + 2) // 3
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        _stage_file(
            spark.createDataFrame(chunk, ev.schema),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # state: per-user pending event + per-type additive accumulators
    last: dict[int, tuple] = {}
    acc: dict[str, list[int]] = {}  # type -> [n, hold, wsum, vsum]
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        batch = sorted(
            batch_df.collect(), key=lambda r: (r["us"], r["event_id"])
        )
        per_user: dict[int, list] = {}
        for r in batch:
            per_user.setdefault(r["user_id"], []).append(r)
        for uid, seq in per_user.items():
            pend = last.get(uid)
            for r in seq:
                if pend is not None:
                    dur = r["us"] - pend["us"]
                    a = acc.setdefault(pend["event_type"], [0, 0, 0, 0])
                    a[0] += 1
                    a[1] += dur
                    a[2] += pend["vq"] * dur
                    a[3] += pend["vq"]
                pend = r
            last[uid] = pend

    q = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    got = {
        t: (
            n,
            hold,
            0 if hold == 0 else tdiv(wsum, hold),
            tdiv(vsum, n),
        )
        for t, (n, hold, wsum, vsum) in acc.items()
    }
    batch = {
        r["event_type"]: (
            r["n_intervals"],
            r["hold_us"],
            r["twap_x10000"],
            r["mean_x10000"],
        )
        for r in events_twap_by_type(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
