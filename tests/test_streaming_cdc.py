"""Streaming × CDC crossover: continuous MERGE maintenance — the
streaming dual of ``cdc_upsert_orders``.  The change feed streams in
micro-batches through foreachBatch and each batch upserts into an
accumulated keyed snapshot (update-in-place, delete-by-key,
insert-new-key) — the production shape for keeping a serving table
current from a CDC stream.

Hard signal: after all change batches, the accumulated snapshot,
restricted to the batch operator's audit neighborhood, must EXACTLY
equal ``cdc_upsert_orders``.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.relational import cdc_upsert_orders
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


from _helpers import stage_file as _stage_file


def test_streaming_cdc_apply_matches_batch_merge(spark, tmp_path):
    base_df = load_table(spark, "orders", SF).select(
        "o_orderkey", "o_orderstatus", "o_totalprice"
    )
    k = F.col("o_orderkey")
    # the same deterministic change feed the batch operator derives,
    # as explicit CDC records (op, key, new values)
    updates = base_df.filter((k % 50 == 0) | (k % 75 == 0)).select(
        F.when(k % 75 == 0, F.lit("D")).otherwise(F.lit("U")).alias("op"),
        k.alias("key"),
        F.lit("X").alias("new_status"),
        (F.col("o_totalprice") + F.lit(1.0)).alias("new_total"),
    )
    off = base_df.agg((F.max(k) + 1).alias("off"))
    inserts = (
        base_df.filter(k % 100 == 0)
        .join(F.broadcast(off))
        .select(
            F.lit("I").alias("op"),
            (k + F.col("off")).alias("key"),
            F.lit("N").alias("new_status"),
            F.col("o_totalprice").alias("new_total"),
        )
    )
    feed = updates.unionByName(inserts)
    src = str(tmp_path / "cdc_stream")
    os.makedirs(src)
    now = time.time()
    _stage_file(feed.filter(F.col("key") % 2 == 0), src, "b1.parquet", now - 60)
    _stage_file(feed.filter(F.col("key") % 2 == 1), src, "b2.parquet", now)

    snapshot = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in base_df.collect()
    }
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        for r in batch_df.collect():
            if r["op"] == "D":
                snapshot.pop(r["key"], None)
            else:  # U upserts in place, I inserts a new key
                snapshot[r["key"]] = (r["new_status"], r["new_total"])

    q = (
        spark.readStream.schema(
            "op string, key long, new_status string, new_total double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 2

    expected = {
        r["o_orderkey"]: (r["o_orderstatus"], r["o_totalprice"])
        for r in cdc_upsert_orders(spark, SF).collect()
    }
    max_key = max(
        r["o_orderkey"] for r in base_df.select("o_orderkey").collect()
    )
    got = {
        key: v
        for key, v in snapshot.items()
        if key % 25 == 0 or key > max_key
    }
    assert expected, "batch reference unexpectedly empty"
    assert got == expected, (
        f"streaming snapshot diverged: missing={set(expected) - set(got)} "
        f"extra={set(got) - set(expected)}"
    )
