"""Streaming × sketch crossover: CONTINUOUS t-digest maintenance —
equivalence proof #39, the quantile-DIGEST member of the sketch merge
proofs (KMV k-min union #13, CMS addition, Bloom OR, HLL register max,
bottom-k payload union).

The batch query ``sketch_tdigest_quantiles`` is DEFINED as
merge-of-per-hour-digests, so a streaming pipeline that keeps one
digest per (event_type, hour) in state and merges at read time is
EXACTLY the batch computation — no approximation drift between the two
paths.  Each hour-aligned micro-batch contributes its hours' digests
(O(log rows) centroids per hour); the read path flattens all centroid
lists per type and runs ONE recluster pass — associative in the only
sense the engine relies on: the merge consumes the full centroid
multiset, so slice order never matters.

Recoverability contract (the CUPED lesson): the per-hour digest is a
RANK construction, so a retroactive intra-hour arrival cannot be folded
into an existing hour's centroids — the hour must be re-digested from
raw rows.  Hour-aligned ingest (each hour closed before it ships, the
log-rotation topology) is therefore the supported shape; the handler
asserts it.

Hard signal: after all batches, quantile rows derived from the merged
state (pure-python reference, arbitrary-precision ints) must EXACTLY
equal the batch query's output — every column, every percentile.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import (
    stage_file as _stage_file,
    tdigest_quantile_rows,
    tdigest_recluster,
)
from decisions_kinesis_spark.operators.sketches_ext import (
    _TD_PCTS,
    sketch_tdigest_quantiles,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_tdigest_merge_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select(
        "event_type",
        F.date_trunc("hour", F.col("ts")).alias("hr"),
        F.expr("cast(floor(value * 100 + 0.5) as bigint)").alias("c"),
    )
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    # HOUR-ALIGNED slices: every (type, hour) cell ships whole, in the
    # batch its hour hashes to — the closed-hour ingest contract
    parts = ev.withColumn("m", F.abs(F.hash("hr")) % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # state: {type -> {hr -> centroid list}}; exact: {type -> [cents]}
    # (test-only calibration ground truth, mirrors the query's exact
    # side)
    state: dict[str, dict] = {}
    exact: dict[str, list[int]] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        by_th: dict = {}
        for r in batch_df.collect():
            by_th.setdefault((r["event_type"], r["hr"]), []).append(
                r["c"]
            )
            exact.setdefault(r["event_type"], []).append(r["c"])
        for (t, hr), cs in by_th.items():
            hrs = state.setdefault(t, {})
            # closed-hour contract: an hour never spans micro-batches
            assert hr not in hrs, "intra-hour retro-arrival"
            hrs[hr] = tdigest_recluster([(1, c, c, c) for c in cs])

    q = (
        spark.readStream.schema(
            "event_type string, hr timestamp, c bigint"
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

    got = tdigest_quantile_rows(state, exact, _TD_PCTS)
    batch = {
        (r["event_type"], r["pct"]): (
            r["n_rows"],
            r["n_centroids"],
            r["est_cents"],
            r["exact_cents"],
            r["err_ppm"],
        )
        for r in sketch_tdigest_quantiles(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
