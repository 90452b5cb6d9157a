"""Streaming × behavioral-model crossover: CONTINUOUS Markov
transition maintenance — the streaming dual of
``events_markov_transitions`` (equivalence proof #17).

Unlike the count-rollup proofs, transitions depend on ADJACENCY within
each user's (ts, event_id)-ordered sequence, so batch boundaries cut
chains: the streaming state must carry each user's LAST event so the
next batch's first event completes the cross-boundary transition —
exactly the carry the ``transformWithState`` tier would hold per key.
State is O(|users| + |types|²): one pending event per user plus the
transition-count grid.

Micro-batches are time-ordered slices (the ingest reality this
maintenance assumes; out-of-order arrival would need the watermark
discipline of the windowed operators).  Hard signal: accumulated
transition counts + derived per-prev totals and exact-ppm
probabilities equal the batch query row-for-row.
"""

from __future__ import annotations

import os
import time

from decisions_kinesis_spark.operators.analytics_ext import (
    events_markov_transitions,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def test_streaming_markov_maintenance_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select(
        "user_id", "ts", "event_id", "event_type"
    )
    rows = sorted(
        ev.collect(), key=lambda r: (r["ts"], r["event_id"])
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

    # state: per-user pending last event + transition-count grid
    last: dict[int, tuple] = {}
    counts: dict[tuple[str, str], int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        batch = sorted(
            batch_df.collect(), key=lambda r: (r["ts"], r["event_id"])
        )
        per_user: dict[int, list] = {}
        for r in batch:
            per_user.setdefault(r["user_id"], []).append(r)
        for uid, seq in per_user.items():
            pend = last.get(uid)
            for r in seq:
                if pend is not None:
                    key = (pend["event_type"], r["event_type"])
                    counts[key] = counts.get(key, 0) + 1
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

    prev_totals: dict[str, int] = {}
    for (p, _n), c in counts.items():
        prev_totals[p] = prev_totals.get(p, 0) + c
    got = {
        (p, nx): (c, prev_totals[p], tdiv(c * 1_000_000, prev_totals[p]))
        for (p, nx), c in counts.items()
    }

    batch = {
        (r["prev_type"], r["next_type"]): (
            r["n"],
            r["n_prev"],
            r["p_ppm"],
        )
        for r in events_markov_transitions(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
