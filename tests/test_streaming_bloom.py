"""Streaming × sketch crossover: CONTINUOUS Bloom-filter maintenance —
the streaming dual of ``join_bloom_prefilter``'s build side
(equivalence proof #12, completing the sketch-family trio: KMV merges
by k-min union, CMS by cell addition, Bloom by bitwise OR).

Each micro-batch contributes its dim keys' bit positions; the driver
state ORs them into the accumulated word map — the associative,
idempotent merge that lets per-partition / per-batch filters union
without re-scanning history (and why a Bloom filter is the canonical
broadcast runtime-filter at 100 TB: O(m) bits of state, ever).

Hard signal: after all batches, membership probes through the
accumulated filter must agree EXACTLY with the batch query's
per-returnflag (n_pass_bloom, n_true_match, n_false_pos) — bit-OR
associativity makes the merged filter identical to the single-pass
filter, so even the false positives are the same rows.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.relational import (
    _BLOOM_K,
    _bloom_pos_spark,
    _cms_digest_spark,
    join_bloom_prefilter,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file

SF = "/root/testdata/sf0.001"


def test_streaming_bloom_or_merge_matches_batch(spark, tmp_path):
    sup = load_table(spark, "supplier", SF).select("s_suppkey", "s_nationkey")
    nat = load_table(spark, "nation", SF).select("n_nationkey", "n_regionkey")
    reg = load_table(spark, "region", SF).filter(F.col("r_name") == "EUROPE")
    dim = (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("s_suppkey")
    )
    src = str(tmp_path / "dim_stream")
    os.makedirs(src)
    now = time.time()
    parts = dim.withColumn("m", F.col("s_suppkey") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # accumulated filter state: {word_index -> 64-bit OR of set bits};
    # exact key set kept alongside (test-only ground truth)
    words: dict[int, int] = {}
    exact: set[int] = set()
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        rows = (
            batch_df.select(
                "s_suppkey", F.expr(_cms_digest_spark("s_suppkey")).alias("dg")
            )
            .select(
                "s_suppkey",
                F.explode(
                    F.array(
                        *[
                            F.expr(_bloom_pos_spark(i, "dg"))
                            for i in range(_BLOOM_K)
                        ]
                    )
                ).alias("p"),
            )
            .collect()
        )
        for r in rows:
            exact.add(r["s_suppkey"])
            w, b = r["p"] // 64, r["p"] % 64
            words[w] = words.get(w, 0) | (1 << b)  # the Bloom OR-merge

    q = (
        spark.readStream.schema("s_suppkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # probe every lineitem row through the ACCUMULATED filter (positions
    # from the same Spark expressions the batch query uses)
    li = (
        load_table(spark, "lineitem", SF)
        .select("l_suppkey", "l_returnflag")
        .withColumn("dg", F.expr(_cms_digest_spark("l_suppkey")))
        .select(
            "l_suppkey",
            "l_returnflag",
            *[
                F.expr(_bloom_pos_spark(i, "dg")).alias(f"p{i}")
                for i in range(_BLOOM_K)
            ],
        )
        .collect()
    )
    got: dict[str, list[int]] = {}
    for r in li:
        member = all(
            (words.get(r[f"p{i}"] // 64, 0) >> (r[f"p{i}"] % 64)) & 1
            for i in range(_BLOOM_K)
        )
        true_m = r["l_suppkey"] in exact
        assert member or not true_m  # no false negatives, ever
        g = got.setdefault(r["l_returnflag"], [0, 0, 0])
        g[0] += 1
        g[1] += int(member)
        g[2] += int(true_m)

    batch = {
        r["l_returnflag"]: (
            r["n_rows"],
            r["n_pass_bloom"],
            r["n_true_match"],
            r["n_false_pos"],
        )
        for r in join_bloom_prefilter(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    for flag, (n, p, t) in got.items():
        assert batch[flag] == (n, p, t, p - t)
