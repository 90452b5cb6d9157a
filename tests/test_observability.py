"""Engine observability + scan-cost evidence.

Two production mechanisms a 100 TB deployment leans on, pinned by
test so they stay true:

- ``observe()`` metrics: row-count / sum audits piggyback on the SAME
  scan as the query (an AggregatingAccumulator attached to the plan),
  instead of a second pass over 100 TB.  Shown for a batch query via
  ``Observation`` and for a stream via ``observedMetrics`` in the
  progress event.
- Nested schema pruning: projecting one subfield of a struct column
  prunes the parquet ``ReadSchema`` to that subfield — scan bytes
  follow the projection even inside nested types.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import Observation
from pyspark.sql import functions as F

from decisions_kinesis_spark.sources.tables import load_table

from _helpers import stage_file as _stage_file

SF = "/root/testdata/sf0.001"


def test_batch_observe_metrics_on_query_scan(spark):
    """The audit metrics ride the query's own scan: one action yields
    both the query result and the observed row/sum metrics, and they
    agree with independently-computed values."""
    li = load_table(spark, "lineitem", SF)
    obs = Observation("scan_audit")
    audited = li.observe(
        obs,
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.col("l_quantity").cast("decimal(18,2)")).alias("sum_qty"),
    ).groupBy("l_returnflag").agg(F.count("*").alias("n"))
    per_flag = {r["l_returnflag"]: r["n"] for r in audited.collect()}
    got = obs.get
    assert got["n_rows"] == sum(per_flag.values())
    exact = li.agg(
        F.sum(F.col("l_quantity").cast("decimal(18,2)"))
    ).collect()[0][0]
    assert got["sum_qty"] == exact


def test_streaming_observed_metrics_in_progress(spark, tmp_path):
    """Streaming ``observe()`` surfaces per-batch audit metrics in the
    progress events — the zero-extra-scan monitoring hook a streaming
    deployment alarms on."""
    ev = load_table(spark, "events", SF).select("event_type", "value")
    src = str(tmp_path / "obs_stream")
    os.makedirs(src)
    _stage_file(ev, src, "b0.parquet", time.time() - 60)

    seen: list[dict] = []

    def handler(batch_df, epoch_id):
        seen.append({"rows": batch_df.count()})

    q = (
        spark.readStream.schema("event_type string, value double")
        .parquet(src)
        .observe("batch_audit", F.count(F.lit(1)).alias("n_rows"))
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "stream did not finish in time"
    progress = [p for p in q.recentProgress if p.get("observedMetrics")]
    assert progress, "no observedMetrics in any progress event"
    n_obs = sum(
        p["observedMetrics"]["batch_audit"]["n_rows"] for p in progress
    )
    assert n_obs == sum(s["rows"] for s in seen) == ev.count()


def test_nested_schema_pruning_reads_one_subfield(spark, tmp_path):
    """Projecting s.a from a struct<a,b,payload> parquet prunes
    ReadSchema to the single subfield — nested columns don't drag
    their siblings through the scan."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    tbl = pa.table(
        {
            "id": pa.array(range(100), pa.int64()),
            "s": pa.array(
                [
                    {"a": i, "b": f"b{i}", "payload": "x" * 50}
                    for i in range(100)
                ],
                pa.struct(
                    [
                        ("a", pa.int64()),
                        ("b", pa.string()),
                        ("payload", pa.string()),
                    ]
                ),
            ),
        }
    )
    pq.write_table(tbl, str(tmp_path / "nested.parquet"))
    df = spark.read.parquet(str(tmp_path / "nested.parquet")).select(
        F.col("s.a").alias("a")
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    read_schema = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert read_schema, plan
    line = read_schema[0]
    assert "a:bigint" in line.replace(" ", "")
    assert "payload" not in line and "b:string" not in line.replace(" ", "")
    assert df.agg(F.sum("a")).collect()[0][0] == sum(range(100))


def test_dynamic_partition_overwrite_replaces_only_touched_days(
    spark, tmp_path
):
    """Dynamic partition overwrite — the incremental-backfill write
    path: rewriting ONE day's partition leaves every other partition's
    files and rows untouched, where static overwrite mode would drop
    the whole table.  At 100 TB this is the difference between a
    per-day backfill and a full rewrite."""
    ev = load_table(spark, "events", SF).select(
        "event_id",
        "event_type",
        F.col("value"),
        F.date_format(F.col("ts"), "yyyy-MM-dd").alias("day"),
    )
    tgt = str(tmp_path / "by_day")
    ev.write.partitionBy("day").parquet(tgt)
    days = [r["day"] for r in spark.read.parquet(tgt)
            .select("day").distinct().collect()]
    assert len(days) >= 2
    victim = sorted(days)[0]
    before_other = (
        spark.read.parquet(tgt).where(F.col("day") != victim).count()
    )

    patched = (
        spark.read.parquet(tgt)
        .where(F.col("day") == victim)
        .withColumn("value", F.lit(-1.0))
        .limit(5)
    )
    (
        patched.write.mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("day")
        .parquet(tgt)
    )
    after = spark.read.parquet(tgt)
    # untouched partitions: byte-for-byte row survival
    assert after.where(F.col("day") != victim).count() == before_other
    # victim partition: fully replaced by the 5 patched rows
    vict = after.where(F.col("day") == victim)
    assert vict.count() == 5
    assert vict.where(F.col("value") != -1.0).count() == 0
