"""Streaming split-drift maintenance — the streaming dual of
``docs_split_drift_tv`` (equivalence proof #36).

The TV gate's only corpus-grain state is the per-(lang, source) pair of
side counts (a_c, b_c), which is ADDITIVE: each arriving document lands
in exactly one cell on exactly one side of the deterministic md5 split,
so batches contribute independent increments and the maintainer sums
them order-free.  Every output column — side totals, the exact-integer
deviation sum, tv_ppm, and the worst cell under the (dev, cell) struct
max — is DERIVED at read time from that |cells|-bounded state.  This is
the continuous "is my holdout still representative" monitor: O(|cells|)
state while the corpus grows unboundedly.

Hard signal: after all batches, the report derived from maintained
state (Python bigints replaying the operator's DECIMAL(38,0) interior
and truncating divs) equals the batch query's single row EXACTLY,
including the tie rule on the worst cell (larger label wins).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file
from decisions_kinesis_spark.operators.analytics_ext import (
    docs_split_drift_tv,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"

_SIDE = (
    "cast(conv(substring(md5(cast(doc_id as string)), 1, 15),"
    " 16, 10) as bigint) % 2"
)


def test_streaming_split_drift_tv_matches_batch(spark, tmp_path):
    docs = load_table(spark, "documents", SF).select(
        "doc_id", "lang", "source"
    )
    src = str(tmp_path / "docs_stream")
    os.makedirs(src)
    now = time.time()
    parts = docs.withColumn("m", F.col("doc_id") % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # maintained state: {(lang, source) -> [a_c, b_c]}; additive
    cells: dict[tuple[str, str], list[int]] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.select(
                "lang", "source", F.expr(_SIDE).alias("side")
            )
            .groupBy("lang", "source", "side")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        for r in part:
            cell = cells.setdefault((r["lang"], r["source"]), [0, 0])
            cell[r["side"]] += r["c"]

    q = (
        spark.readStream.schema("doc_id bigint, lang string, source string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the gate row from maintained state — exact Python bigints
    n_a = sum(a for a, _ in cells.values())
    n_b = sum(b for _, b in cells.values())
    devs = [
        (abs(a * n_b - b * n_a), f"{lang}/{source}")
        for (lang, source), (a, b) in cells.items()
    ]
    sdev = sum(d for d, _ in devs)
    worst_dev, worst_cell = max(devs)  # struct max: ties → larger label
    den = 2 * n_a * n_b
    got = (
        len(devs),
        n_a,
        n_b,
        sdev * 1_000_000 // den if n_a and n_b else None,
        worst_cell,
        worst_dev * 1_000_000 // den if n_a and n_b else None,
    )

    r = docs_split_drift_tv(spark, SF).collect()[0]
    assert got == (
        r["n_cells"],
        r["n_a"],
        r["n_b"],
        r["tv_ppm"],
        r["worst_cell"],
        r["worst_cell_ppm"],
    )
