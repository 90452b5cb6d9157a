"""Streaming × sketch crossover: CONTINUOUS KMV distinct-count sketch
maintenance — the streaming dual of ``agg_kmv_distinct`` (equivalence
proof #10).

Each micro-batch computes its per-group k-minimum distinct hash values
with the SAME shared ``_KMV_HASH_SPARK`` expression and WindowGroupLimit
top-k plan the batch query uses; the driver state then merges sketches
by the textbook KMV union rule — keep the k smallest of the combined
DISTINCT hash sets (Beyer et al. 2007; the ``agg_kmv_set_ops``
mergeability contract, here applied across TIME instead of across
groups).  At 100 TB this is how per-micro-batch sketches roll up to a
running corpus-wide distinct count without ever re-scanning history:
state is O(k) per group no matter how many batches arrive.

Hard signal: after all batches, the DERIVED per-group
(k_actual, vk, kmv_estimate) must EXACTLY equal the batch sketch over
the full table — the hash is a deterministic md5 prefix and the
estimator is one exact bigint division, so sketch-merge associativity
makes equality bit-exact, not approximate.  The estimate is checked
against the batch query's ``kmv_estimate`` column itself (same code
path the DuckDB oracle gates), and ``err_ppm`` re-derives from the
exact distinct count maintained independently in the test.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Window
from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.relational import (
    _KMV_BITS,
    _KMV_HASH_SPARK,
    _KMV_K,
    agg_kmv_distinct,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def test_streaming_kmv_sketch_merge_matches_batch(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select("l_returnflag", "l_partkey")
    src = str(tmp_path / "li_stream")
    os.makedirs(src)
    now = time.time()
    parts = li.withColumn("m", F.col("l_partkey") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # sketch state: {flag -> sorted list of <= k smallest DISTINCT
    # hashes}; exact state: {flag -> set of partkeys} (test-only — the
    # independent ground truth err_ppm is re-derived from; a production
    # pipeline would keep only the O(k) sketch)
    sketch: dict[str, list[int]] = {}
    exact: dict[str, set[int]] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        w = Window.partitionBy("l_returnflag").orderBy(F.asc("hv"))
        part = (
            batch_df.select(
                "l_returnflag", F.expr(_KMV_HASH_SPARK).alias("hv")
            )
            .distinct()
            .withColumn("rk", F.row_number().over(w))
            .filter(F.col("rk") <= _KMV_K)
            .select("l_returnflag", "hv")
            .collect()
        )
        merged: dict[str, set[int]] = {}
        for r in part:
            merged.setdefault(r["l_returnflag"], set()).add(r["hv"])
        for flag, hs in merged.items():
            # KMV union: k smallest of the combined distinct hash set
            sketch[flag] = sorted(set(sketch.get(flag, [])) | hs)[:_KMV_K]
        for r in batch_df.select("l_returnflag", "l_partkey").collect():
            exact.setdefault(r["l_returnflag"], set()).add(r["l_partkey"])

    q = (
        spark.readStream.schema("l_returnflag string, l_partkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive (k_actual, vk, estimate, err_ppm) from the merged sketch
    # with the batch query's exact integer estimator
    got = {}
    for flag, hs in sketch.items():
        k_actual, vk = len(hs), hs[-1]
        est = (
            k_actual
            if k_actual < _KMV_K
            else tdiv((_KMV_K - 1) * (1 << _KMV_BITS), vk)
        )
        n_exact = len(exact[flag])
        got[flag] = (n_exact, est, tdiv((est - n_exact) * 1_000_000, n_exact))

    batch = {
        r["l_returnflag"]: (r["n_exact"], r["kmv_estimate"], r["err_ppm"])
        for r in agg_kmv_distinct(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
