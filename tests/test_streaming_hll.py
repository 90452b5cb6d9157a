"""Streaming × sketch crossover: CONTINUOUS HyperLogLog register
maintenance — the streaming dual of ``agg_hll_distinct`` (equivalence
proof #31).

Each micro-batch computes its per-(group, register) max ρ with the SAME
shared ``_HLL_REG_SPARK`` / ``_HLL_RHO_SPARK`` spellings the batch
query uses; the driver state merges by per-register MAX — the textbook
HLL union (Flajolet et al. 2007), the simplest merge of the four
sketch families (KMV keeps k-mins, CMS adds cells, Bloom ORs bits, HLL
MAXES registers).  State is O(m) per group no matter how many batches
arrive — the 100 TB rolling-cardinality shape.

Hard signal: after all batches, the derived per-group register sum and
raw estimate EXACTLY equal the batch query's ``hll_estimate`` column
(the same code path the DuckDB oracle gates) — max-merge associativity
makes the equality bit-exact, not approximate; ``err_ppm`` re-derives
from an independently maintained exact distinct set.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file, tdiv
from decisions_kinesis_spark.operators.relational import (
    _HLL_ALPHA_PPM,
    _HLL_E0,
    _HLL_HV_SPARK,
    _HLL_M,
    _HLL_REG_SPARK,
    _HLL_RHO_SPARK,
    agg_hll_distinct,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_hll_register_merge_matches_batch(spark, tmp_path):
    li = load_table(spark, "lineitem", SF).select(
        "l_returnflag", "l_partkey"
    )
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

    # sketch state: {flag -> {register -> max rho}}; exact state is
    # test-only ground truth for err_ppm
    regs: dict[str, dict[int, int]] = {}
    exact: dict[str, set[int]] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        from pyspark.sql import functions as BF

        hv = batch_df.select(
            "l_returnflag",
            "l_partkey",
            BF.expr(_HLL_REG_SPARK.format(k="l_partkey")).alias("reg"),
            BF.expr(_HLL_HV_SPARK.format(k="l_partkey")).alias("hv"),
        )
        part = (
            hv.select(
                "l_returnflag", "reg", BF.expr(_HLL_RHO_SPARK).alias("rho")
            )
            .groupBy("l_returnflag", "reg")
            .agg(BF.max("rho").alias("mreg"))
            .collect()
        )
        for r in part:
            g = regs.setdefault(r["l_returnflag"], {})
            g[r["reg"]] = max(g.get(r["reg"], 0), r["mreg"])
        for r in batch_df.select(
            "l_returnflag", "l_partkey"
        ).collect():
            exact.setdefault(r["l_returnflag"], set()).add(
                r["l_partkey"]
            )

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

    got = []
    for flag, g in regs.items():
        s_total = sum(1 << (_HLL_E0 - m) for m in g.values()) + (
            _HLL_M - len(g)
        ) * (1 << _HLL_E0)
        est = (_HLL_ALPHA_PPM * _HLL_M * _HLL_M * (1 << _HLL_E0)) // (
            s_total * 1_000_000
        )
        n_exact = len(exact[flag])
        got.append(
            (flag, n_exact, est, tdiv((est - n_exact) * 1_000_000, n_exact))
        )

    batch = [
        (r["l_returnflag"], r["n_exact"], r["hll_estimate"], r["err_ppm"])
        for r in agg_hll_distinct(spark, SF).collect()
    ]
    assert sorted(got) == sorted(batch)
