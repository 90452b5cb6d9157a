"""Streaming × resampling crossover: CONTINUOUS Poisson-bootstrap
maintenance (equivalence proof #32) — the streaming dual of
``events_poisson_bootstrap``.

Because every replicate weight is a deterministic per-row function
(digest-slice CDF inversion), each replicate's (Σw·q, Σw) is plain
ADDITIVE state: B·|types| bigint cell pairs, independent of corpus
size.  The replicate means, their order statistics, and the exact mean
all derive at read time — this is why the deterministic Poisson
bootstrap is the production error-bar method on streams (a classical
n-out-of-n bootstrap cannot be maintained at all: drawing a new sample
requires the rows the stream already dropped, the CUPED-class
unrecoverability).

Hard signal: after all batches the derived report EXACTLY equals the
batch operator row-for-row (weights share the operator's digest/CDF
spelling via a per-batch Spark computation, not a re-implementation).
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file, tdiv
from decisions_kinesis_spark.operators.analytics_ext import (
    _BOOT_B,
    events_poisson_bootstrap,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_poisson_bootstrap_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select(
        "event_id", "ts", "user_id", "event_type", "value", "props"
    )
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    parts = ev.withColumn("m", F.pmod(F.xxhash64("event_id"), F.lit(3)))
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # additive state: (type, b) -> [num, den]; (type) -> [n, sum_q]
    cells: dict[tuple[str, int], list[int]] = {}
    totals: dict[str, list[int]] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        base = batch_df.select(
            "event_type",
            "event_id",
            F.expr(
                "cast(floor(cast(value as double) * 10000 + 0.5)"
                " as bigint)"
            ).alias("q"),
        )
        evd = base
        for s in range(3):
            evd = evd.withColumn(
                f"d{s}",
                F.expr(
                    f"md5(concat(cast(event_id as string), ':bs{s}'))"
                ),
            )
        u = (
            "cast(conv(substring(element_at(array(d0, d1, d2),"
            " cast(b div 5 as int) + 1), cast(1 + 6 * (b % 5) as int),"
            " 6), 16, 10) as bigint)"
        )
        from decisions_kinesis_spark.operators.analytics_ext import _pois_w

        rows = (
            evd.select(
                "event_type",
                "q",
                F.expr(f"explode(sequence(0, {_BOOT_B - 1}))").alias("b"),
                "d0",
                "d1",
                "d2",
            )
            .select(
                "event_type",
                "q",
                "b",
                F.expr(f"cast({_pois_w(u)} as bigint)").alias("w"),
            )
            .groupBy("event_type", "b")
            .agg(F.sum(F.expr("w * q")).alias("num"), F.sum("w").alias("den"))
            .collect()
        )
        for r in rows:
            c = cells.setdefault((r["event_type"], r["b"]), [0, 0])
            c[0] += int(r["num"])
            c[1] += int(r["den"])
        for r in (
            base.groupBy("event_type")
            .agg(F.count("*").alias("n"), F.sum("q").alias("sq"))
            .collect()
        ):
            t = totals.setdefault(r["event_type"], [0, 0])
            t[0] += r["n"]
            t[1] += int(r["sq"])

    q = (
        spark.readStream.schema(
            "event_id bigint, ts timestamp, user_id bigint,"
            " event_type string, value double, props string"
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

    got = []
    for etype, (n, sq) in totals.items():
        mbs = sorted(
            tdiv(num, den)
            for (t, _b), (num, den) in cells.items()
            if t == etype and den > 0
        )
        v = len(mbs)
        got.append(
            (
                etype,
                n,
                tdiv(sq, n),
                v,
                mbs[0],
                mbs[(v + 1) // 2 - 1],
                mbs[-1],
            )
        )

    batch = [tuple(r) for r in events_poisson_bootstrap(spark, SF).collect()]
    assert sorted(got) == sorted(batch)
