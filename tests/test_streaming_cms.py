"""Streaming × sketch crossover: CONTINUOUS count-min sketch
maintenance — the streaming dual of ``freq_countmin_topk``
(equivalence proof #11).

Count-min cells merge by ADDITION (Cormode & Muthukrishnan 2005 §4.1),
so per-micro-batch partial sketches fold into accumulated state
order-free — the simplest mergeable sketch there is: state is the
d·w cell grid no matter how many batches arrive, and no raw history is
ever re-scanned.

Hard signal: after all batches, the point estimates DERIVED from the
accumulated cells (min over the d salted rows, same deterministic
md5-prefix hashes) must EXACTLY equal the batch
``freq_countmin_topk`` output on the same data — cell counts are exact
integer sums, so merge associativity makes the equality bit-exact.
The probe set (top-k customers by exact count) re-derives from exact
per-customer counts accumulated independently alongside.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.relational import (
    _CMS_D,
    _CMS_TOPK,
    _cms_cell_spark,
    _cms_digest_spark,
    freq_countmin_topk,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def test_streaming_cms_cell_merge_matches_batch(spark, tmp_path):
    ords = load_table(spark, "orders", SF).select("o_custkey")
    src = str(tmp_path / "ord_stream")
    os.makedirs(src)
    now = time.time()
    parts = ords.withColumn("m", F.col("o_custkey") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # accumulated sketch state: {(d, cell) -> count}; exact per-key
    # counts kept alongside (the probe-selection ground truth)
    cells: dict[tuple[int, int], int] = {}
    exact: dict[int, int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.select(
                F.expr(_cms_digest_spark("o_custkey")).alias("dg")
            )
            .select(
                F.explode(
                    F.array(
                        *[
                            F.struct(
                                F.lit(d).alias("d"),
                                F.expr(_cms_cell_spark(d, "dg")).alias(
                                    "cell"
                                ),
                            )
                            for d in range(_CMS_D)
                        ]
                    )
                ).alias("x")
            )
            .groupBy("x.d", "x.cell")
            .agg(F.count("*").alias("n"))
            .collect()
        )
        for r in part:
            key = (r["d"], r["cell"])
            cells[key] = cells.get(key, 0) + r["n"]
        for r in (
            batch_df.groupBy("o_custkey").agg(F.count("*").alias("n"))
        ).collect():
            exact[r["o_custkey"]] = exact.get(r["o_custkey"], 0) + r["n"]

    q = (
        spark.readStream.schema("o_custkey bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the batch query's output from the ACCUMULATED state: top-k
    # probes by (exact desc, key asc), then min over the d merged cells
    top = sorted(exact.items(), key=lambda kv: (-kv[1], kv[0]))[:_CMS_TOPK]
    # recompute each probe's cell indices with the same Spark expression
    # the batch query uses (one tiny local frame — keeps ONE hash
    # definition on the Spark side of the proof)
    probe_cells = {
        r["o_custkey"]: [r[f"c{d}"] for d in range(_CMS_D)]
        for r in spark.createDataFrame(
            [(k,) for k, _n in top], "o_custkey bigint"
        )
        .select(
            "o_custkey", F.expr(_cms_digest_spark("o_custkey")).alias("dg")
        )
        .select(
            "o_custkey",
            *[
                F.expr(_cms_cell_spark(d, "dg")).alias(f"c{d}")
                for d in range(_CMS_D)
            ],
        )
        .collect()
    }
    got = {}
    for key, n_exact in top:
        est = min(cells[(d, probe_cells[key][d])] for d in range(_CMS_D))
        got[key] = (n_exact, est, tdiv((est - n_exact) * 1_000_000, n_exact))
        assert est >= n_exact  # CMS one-sided error bound

    batch = {
        r["o_custkey"]: (r["n_exact"], r["cms_estimate"], r["overcount_ppm"])
        for r in freq_countmin_topk(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
