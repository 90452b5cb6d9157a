"""Streaming × sequential-pattern crossover: CONTINUOUS 3-step path
mining — the streaming dual of ``events_top_paths`` (equivalence proof
#18, the ORDER-2 carry generalization of the Markov proof #17: the
per-user pending state is the last TWO events, so chains cut at batch
boundaries complete across one or even two boundary crossings).

State is O(2·|users| + |types|³).  Hard signal: the accumulated path
counts cut to the batch query's top-k with its exact (n desc, path)
tie-break equal the batch output row-for-row.
"""

from __future__ import annotations

import os
import time

from decisions_kinesis_spark.operators.analytics_ext import (
    _PATH_TOPK,
    events_top_paths,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file

SF = "/root/testdata/sf0.001"


def test_streaming_path_mining_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = sorted(ev.collect(), key=lambda r: (r["ts"], r["event_id"]))
    third = (len(rows) + 2) // 3
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    for i in range(3):
        _stage_file(
            spark.createDataFrame(
                rows[i * third : (i + 1) * third], ev.schema
            ),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # state: per-user last-two-event carry + path-count grid
    carry: dict[int, list] = {}
    counts: dict[str, int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        batch = sorted(
            batch_df.collect(), key=lambda r: (r["ts"], r["event_id"])
        )
        per_user: dict[int, list] = {}
        for r in batch:
            per_user.setdefault(r["user_id"], []).append(r["event_type"])
        for uid, seq in per_user.items():
            window = carry.get(uid, []) + seq
            for i in range(max(0, len(window) - 2)):
                path = ">".join(window[i : i + 3])
                counts[path] = counts.get(path, 0) + 1
            carry[uid] = window[-2:]

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

    got = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[
        :_PATH_TOPK
    ]
    batch = [
        (r["path"], r["n"]) for r in events_top_paths(spark, SF).collect()
    ]
    assert batch
    assert got == batch
