"""Streaming × sampling crossover: CONTINUOUS weighted-Poisson sample
maintenance — the streaming dual of ``sample_weighted_poisson``
(equivalence proof #20).

Because inclusion is a deterministic salted-hash compare (h(key) mod D
< w), it is INDEPENDENT of batching, ordering, and partitioning: the
sample of a union is exactly the union of per-batch samples — no
carry state at all (contrast the TWAP/Markov carry proofs #17–#19).
The streaming job therefore keeps ONLY the sampled rows plus additive
per-group (n, n_sampled, Σq, Σht) accumulators — the production shape
where the full stream is never stored — and replays the batch query's
report exactly, including the floor-HT estimator.

Hard signal: per-flag accumulated counts/sums/estimates equal the
batch query row-for-row, and the accumulated sample KEY SET equals the
batch-side sample key set (selection itself, not just aggregates).
"""

from __future__ import annotations

import hashlib
import math
import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.relational import (
    _WPS_D,
    sample_weighted_poisson,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def _included(orderkey: int, linenumber: int, w: int) -> bool:
    dg = hashlib.md5(f"{orderkey}:{linenumber}:wps".encode()).hexdigest()
    return (int(dg[:14], 16) % _WPS_D) < w


def test_streaming_wps_sample_maintenance_matches_batch(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select(
        "l_returnflag",
        "l_orderkey",
        "l_linenumber",
        F.expr("cast(l_quantity as bigint)").alias("w"),
        F.expr(
            "cast(floor(l_extendedprice * 10000 + 0.5) as bigint)"
        ).alias("qv"),
    )
    rows = li.collect()
    third = (len(rows) + 2) // 3
    src = str(tmp_path / "li_stream")
    os.makedirs(src)
    now = time.time()
    for i in range(3):
        chunk = rows[i * third : (i + 1) * third]
        _stage_file(
            spark.createDataFrame(chunk, li.schema),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # state: sampled-row key set + additive per-flag accumulators —
    # nothing else; the unsampled stream is discarded per batch
    sample_keys: set[tuple] = set()
    acc: dict[str, list[int]] = {}  # flag -> [n, n_s, sum_q, ht]
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        for r in batch_df.collect():
            a = acc.setdefault(r["l_returnflag"], [0, 0, 0, 0])
            a[0] += 1
            a[2] += r["qv"]
            if _included(r["l_orderkey"], r["l_linenumber"], r["w"]):
                a[1] += 1
                a[3] += (r["qv"] * _WPS_D) // r["w"]
                sample_keys.add((r["l_orderkey"], r["l_linenumber"]))

    q = (
        spark.readStream.schema(li.schema)
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
        flag: (
            n,
            n_s,
            sq,
            ht,
            0 if sq == 0 else tdiv((ht - sq) * 1_000_000, sq),
        )
        for flag, (n, n_s, sq, ht) in acc.items()
    }
    batch = {
        r["l_returnflag"]: (
            r["n_rows"],
            r["n_sampled"],
            r["exact_q"],
            r["ht_q"],
            r["err_ppm"],
        )
        for r in sample_weighted_poisson(spark, SF).collect()
    }
    assert batch and got == batch

    # the SELECTION matches too: engine-side sampled keys == accumulated
    batch_keys = {
        (r["l_orderkey"], r["l_linenumber"])
        for r in li.filter(
            (
                F.expr(
                    "cast(conv(substring(md5(concat("
                    "cast(l_orderkey as string), ':',"
                    " cast(l_linenumber as string), ':wps')), 1, 14),"
                    " 16, 10) as bigint)"
                )
                % _WPS_D
            )
            < F.col("w")
        ).collect()
    }
    assert sample_keys == batch_keys and len(sample_keys) > 0
