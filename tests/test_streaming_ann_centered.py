"""Streaming equivalence proof #38: maintenance of the MEAN-CENTERED
integer LSH index under streaming arrival (VERDICT r10 #5).

Unlike MinHash-band LSH (proof: test_streaming_dedup.py), the centered
index's bucket ids are CORPUS-DEPENDENT through the per-dimension
integer mean — new arrivals drift the mean and can invalidate every
previously-assigned bucket.  The index is therefore not additive, but
its corpus state IS:

- per-vector quantized components ``qv`` (``_QV_EXPR``) are
  corpus-independent — computed once at arrival, never revisited;
- the mean derives from additive per-dimension (sum, count) pairs —
  64 bigints of driver state, updated per micro-batch;
- ``bucket = f(qv − mean)`` (``_plane_bits_expr``) is STATELESS given
  the mean.

Maintenance strategy proven here: per epoch, fold the batch's
per-dimension sums into the running state and re-derive the truncating
integer mean.  If it CHANGED, re-index — one linear scan re-deriving
``bucket`` over the stored ``qv`` (no pairwise work, no shuffle of
anything but the corpus scan); if unchanged, bucket only the arrivals
with the existing mean and append.  The proof drives three
micro-batches through a real Structured Streaming query — the second
shifts the mean (re-index fires), the third is constructed to leave
the truncating integer mean EXACTLY fixed (the cheap append path) —
and asserts the maintained (vec_id → bucket) mapping equals the batch
``_centered_int_buckets`` on the full corpus, through the identical
expression helpers.

The adaptive plane count (``_adaptive_nbits``) is the second, coarser
re-index trigger at scale: N crossing a power-of-two boundary changes
nbits, which re-derives buckets with the same linear-scan cost.  The
proof pins nbits to isolate the mean-drift mechanism.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.similarity import (
    _CQ,
    _N_DIMS,
    _QV_EXPR,
    _centered_int_buckets,
    _plane_bits_expr,
)
from _helpers import stage_file as _stage_file, tdiv

_NBITS = 4  # pinned: isolates mean-drift from the adaptive-nbits trigger


def _vecs(rows: list[tuple[int, list[float]]]):
    """(vec_id, 64-dim embedding) rows for createDataFrame."""
    return [(i, [float(x) for x in v]) for i, v in rows]


def test_streaming_centered_index_maintenance(spark, tmp_path):
    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    now = time.time()

    # batch 1: a small cluster around the origin (components in
    # quarter steps so quantization is exact)
    b1 = [
        (1, [0.25 * ((i + d) % 3 - 1) for d in range(_N_DIMS)])
        for i in range(1, 5)
    ]
    # batch 2: strongly shifted vectors — moves the integer mean, so
    # the maintained index MUST re-derive every stored bucket
    b2 = [
        (10 + i, [2.0 + 0.25 * ((i + d) % 3) for d in range(_N_DIMS)])
        for i in range(4)
    ]
    schema = "vec_id long, embedding array<double>"
    _stage_file(spark.createDataFrame(_vecs(b1), schema), src, "b1.parquet", now - 60)
    _stage_file(spark.createDataFrame(_vecs(b2), schema), src, "b2.parquet", now - 30)

    # batch 3 needs the integer mean AFTER b1+b2, so pre-compute it
    # with the same additive fold the handler runs (tdiv = the
    # truncate-toward-zero division both engines use for `div`)
    import math

    pre = b1 + b2
    # the engine's quantization: floor(x·CQ + 0.5) per component
    sums = [
        sum(int(math.floor(v[d] * _CQ + 0.5)) for _, v in pre)
        for d in range(_N_DIMS)
    ]
    mean_after_b2 = [tdiv(s, len(pre)) for s in sums]
    # two vectors whose qv equals that mean exactly: sum += 2·mean,
    # n += 2 → trunc((S + 2m)/(n + 2)) = m (remainder 0 ≤ r < n keeps
    # the truncating quotient fixed) — the NO-DRIFT epoch
    b3 = [
        (100 + i, [m / _CQ for m in mean_after_b2])
        for i in range(2)
    ]
    _stage_file(spark.createDataFrame(_vecs(b3), schema), src, "b3.parquet", now)

    state = {
        "sums": [0] * _N_DIMS,
        "n": 0,
        "qv_store": None,  # accumulated (vec_id, qv) — arrival-immutable
        "mean": None,
        "buckets": {},  # maintained vec_id → bucket
        "reindex_epochs": [],
        "epochs": 0,
    }

    def _bucket_with_mean(qv_df, mean):
        mq = "array(" + ", ".join(f"{m}L" for m in mean) + ")"
        return qv_df.withColumn(
            "cv", F.expr(f"zip_with(qv, {mq}, (x, m) -> x - m)")
        ).withColumn(
            "bucket", F.expr(_plane_bits_expr("cv", _NBITS)).cast("bigint")
        )

    def handler(batch_df, epoch_id):
        state["epochs"] += 1
        qv = (
            batch_df.select("vec_id", F.col("embedding").alias("v"))
            .withColumn("qv", F.expr(_QV_EXPR))
            .select("vec_id", "qv")
            .localCheckpoint(eager=True)
        )
        # additive state update: per-dimension sums (a 64-row
        # aggregate → bounded driver transfer), count
        dim_sums = (
            qv.select(F.posexplode("qv").alias("pos", "x"))
            .groupBy("pos")
            .agg(F.sum("x").alias("s"))
            .collect()
        )
        for r in dim_sums:
            state["sums"][r["pos"]] += r["s"]
        state["n"] += qv.count()
        new_mean = [tdiv(s, state["n"]) for s in state["sums"]]
        state["qv_store"] = (
            qv
            if state["qv_store"] is None
            else state["qv_store"].unionByName(qv).localCheckpoint(eager=True)
        )
        if new_mean != state["mean"]:
            # mean drift → epoch re-index: ONE linear scan over the
            # stored corpus-independent qv; no pairwise work
            state["reindex_epochs"].append(state["epochs"])
            state["mean"] = new_mean
            state["buckets"] = {
                r["vec_id"]: r["bucket"]
                for r in _bucket_with_mean(state["qv_store"], new_mean)
                .select("vec_id", "bucket")
                .collect()
            }
        else:
            # no drift → bucket only the arrivals, append
            state["buckets"].update(
                {
                    r["vec_id"]: r["bucket"]
                    for r in _bucket_with_mean(qv, state["mean"])
                    .select("vec_id", "bucket")
                    .collect()
                }
            )

    q = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert state["epochs"] == 3
    # epoch 1 seeds the mean, epoch 2 drifts it; epoch 3 was
    # constructed to keep the truncating integer mean fixed — the
    # cheap append path must have been taken
    assert state["reindex_epochs"] == [1, 2]

    # equivalence: the maintained mapping equals the batch index over
    # the full corpus, derived through the same expression helpers
    full = spark.createDataFrame(_vecs(b1 + b2 + b3), schema).select(
        "vec_id", F.col("embedding").alias("v")
    )
    batch_buckets = {
        r["vec_id"]: r["bucket"]
        for r in _centered_int_buckets(full, _NBITS)
        .select("vec_id", "bucket")
        .collect()
    }
    assert state["buckets"] == batch_buckets
    # the drift was real: batch-2 vectors would have landed elsewhere
    # under the epoch-1 mean (the re-index did observable work)
    assert len(set(state["buckets"].values())) > 1
