"""Streaming × sketch crossover: CONTINUOUS bottom-k quantile-sample
maintenance — the streaming dual of ``quantile_bottomk_sample``
(equivalence proof #13, the quantile member of the sketch-family
merge proofs: KMV k-min union, CMS addition, Bloom OR, and now
payload-carrying k-min union).

Each micro-batch contributes its per-group bottom-k (hash, value)
rows; the driver state keeps the k smallest of the union — a uniform
sample of everything seen so far in O(k) state per group, no matter
how many batches arrive.  Exact per-value counts accumulate alongside
(the calibration ground truth).

Hard signal: after all batches, the (sample_median, sample_p90)
derived from the merged sample and the (exact_median, exact_p90)
derived from the accumulated counts must EXACTLY equal the batch
query — bottom-k-by-deterministic-hash union is associative, so the
merged sample IS the single-pass sample, row for row.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.relational import (
    _QS_HV_SPARK,
    _QS_K,
    _QS_PQ_SPARK,
    quantile_bottomk_sample,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def _disc(sorted_vals: list[int], num: int, den: int) -> int:
    """Shared discrete-quantile rule: 1-indexed position
    ((n-1)*num) div den + 1 over the value-sorted multiset."""
    return sorted_vals[tdiv((len(sorted_vals) - 1) * num, den)]


def test_streaming_bottomk_sample_merge_matches_batch(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select(
        "l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    src = str(tmp_path / "li_stream")
    os.makedirs(src)
    now = time.time()
    parts = li.withColumn("m", F.col("l_orderkey") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # sample state: {flag -> sorted list of <= k (hv, pq) pairs};
    # exact state: {flag -> {pq -> count}} (test-only ground truth)
    sample: dict[str, list[tuple[int, int]]] = {}
    exact: dict[str, dict[int, int]] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        rows = batch_df.select(
            "l_returnflag",
            F.expr(_QS_PQ_SPARK).alias("pq"),
            F.expr(_QS_HV_SPARK).alias("hv"),
        ).collect()
        merged: dict[str, list[tuple[int, int]]] = {}
        for r in rows:
            merged.setdefault(r["l_returnflag"], []).append(
                (r["hv"], r["pq"])
            )
            g = exact.setdefault(r["l_returnflag"], {})
            g[r["pq"]] = g.get(r["pq"], 0) + 1
        for flag, pairs in merged.items():
            # payload-carrying k-min union: k smallest (hv, pq) of the
            # combined set — the KMV merge with the value along for
            # the ride
            sample[flag] = sorted(sample.get(flag, []) + pairs)[:_QS_K]

    q = (
        spark.readStream.schema(
            "l_returnflag string, l_orderkey bigint,"
            " l_linenumber int, l_extendedprice double"
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

    got = {}
    for flag, counts in exact.items():
        full = sorted(
            pq for pq, c in counts.items() for _ in range(c)
        )
        svals = sorted(pq for _hv, pq in sample[flag])
        em, e9 = _disc(full, 5, 10), _disc(full, 9, 10)
        sm, s9 = _disc(svals, 5, 10), _disc(svals, 9, 10)
        got[flag] = (
            len(full),
            em,
            sm,
            0 if em == 0 else tdiv((sm - em) * 1_000_000, em),
            e9,
            s9,
            0 if e9 == 0 else tdiv((s9 - e9) * 1_000_000, e9),
        )

    batch = {
        r["l_returnflag"]: (
            r["n_rows"],
            r["exact_median_q"],
            r["sample_median_q"],
            r["med_err_ppm"],
            r["exact_p90_q"],
            r["sample_p90_q"],
            r["p90_err_ppm"],
        )
        for r in quantile_bottomk_sample(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
