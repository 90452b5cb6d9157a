"""Streaming × monitoring crossover: CONTINUOUS robust-outlier
maintenance — the streaming dual of ``events_mad_outliers``
(equivalence proof #15).

Exact medians are not mergeable as scalars, but the (value → count)
frequency state they derive from IS (counts add, order-free — the
rollup merge discipline), and Spark's own ``percentile`` aggregate
evaluates from exactly that value-count map.  Each micro-batch folds
its per-(type, value) counts into accumulated state; median, MAD, and
the 3-MAD outlier count are then DERIVED from the state with the
identical IEEE op sequence (pos = p·(n−1); lower + (higher − lower) ·
frac; abs-deviation re-walk) — so equality with the batch query is
bitwise before the shared 4dp floor-rounding, not approximate.

State is O(distinct values per type) — the honest bound of EXACT
quantile maintenance (the bottom-k sample, proof #13, is the O(k)
alternative when that bound is too big).
"""

from __future__ import annotations

import math
import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.windows_ext import events_mad_outliers
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file, tdiv

SF = "/root/testdata/sf0.001"


def _percentile_from_counts(counts: dict[float, int], p: float) -> float:
    """Spark Percentile.getPercentile replay over a value-count map:
    pos = p·(n−1) into the value-sorted expansion, linear interpolation
    ``lower + (higher − lower)·(pos − lowerIndex)`` — same op order."""
    items = sorted(counts.items())
    n = sum(c for _v, c in items)
    pos = p * (n - 1)
    lo_idx = int(math.floor(pos))
    hi_idx = lo_idx + (0 if pos == lo_idx else 1)

    def at(i: int) -> float:
        acc = 0
        for v, c in items:
            acc += c
            if acc > i:
                return v
        raise AssertionError("index out of range")

    lower = at(lo_idx)
    if hi_idx == lo_idx:
        return lower
    higher = at(hi_idx)
    return lower + (higher - lower) * (pos - lo_idx)


def test_streaming_mad_maintenance_matches_batch(spark, tmp_path):
    ev = load_table(spark, "events", SF).select("event_type", "value")
    src = str(tmp_path / "ev_stream")
    os.makedirs(src)
    now = time.time()
    parts = ev.withColumn(
        "m", (F.abs(F.hash("event_type", "value")) % 3)
    )
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # accumulated state: {type -> {value -> count}} over NON-NULL
    # values (percentile skips nulls) plus a per-type TOTAL row count
    # (the batch count(*) includes null-value rows)
    state: dict[str, dict[float, int]] = {}
    totals: dict[str, int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        part = (
            batch_df.groupBy("event_type", "value")
            .agg(F.count("*").alias("c"))
            .collect()
        )
        for r in part:
            totals[r["event_type"]] = (
                totals.get(r["event_type"], 0) + r["c"]
            )
            if r["value"] is not None:
                g = state.setdefault(r["event_type"], {})
                g[r["value"]] = g.get(r["value"], 0) + r["c"]

    q = (
        spark.readStream.schema("event_type string, value double")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    def fl4(v: float) -> float:
        return math.floor(v * 10000 + 0.5) / 10000.0

    got = {}
    for etype, counts in state.items():
        med = _percentile_from_counts(counts, 0.5)
        adev: dict[float, int] = {}
        n = 0
        n_out_src: list[tuple[float, int]] = []
        for v, c in counts.items():
            d = abs(v - med)
            adev[d] = adev.get(d, 0) + c
            n += c
            n_out_src.append((d, c))
        mad = _percentile_from_counts(adev, 0.5)
        n_out = sum(c for d, c in n_out_src if d > 3 * mad)
        n_total = totals[etype]
        got[etype] = (
            fl4(med), fl4(mad), n_total, n_out,
            tdiv(n_out * 1_000_000, n_total),
        )

    batch = {
        r["event_type"]: (
            r["med"], r["mad"], r["n"], r["n_outliers"], r["outlier_ppm"]
        )
        for r in events_mad_outliers(spark, SF).collect()
    }
    assert batch and set(batch) == set(got)
    assert got == batch
