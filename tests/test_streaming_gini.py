"""Streaming × inequality/cohort crossover: CONTINUOUS maintenance of
the Gini coefficient (equivalence proof #27) and the cohort-LTV curve
(equivalence proof #28) — the streaming duals of
``customer_revenue_gini`` and ``orders_cohort_ltv``.

Both satisfy the recoverability criterion (the KM #24 / gap-fill #26
test — and the reason streaming CUPED was REJECTED): every
read-time-derived quantity is a function of compact ADDITIVE or
MIN-MERGE state, never of retention the stream already dropped.

- Gini: state is ONE ×10⁴-quantized revenue sum per customer
  (additive, order-free across micro-batches).  Ranks, moment sums,
  and the estimator ``(2Σi·xᵢ − (n+1)Σx)·10⁶ div (nΣx)`` are all
  derived at read time — an order STATISTIC cannot be accumulated
  incrementally (one new customer shifts every rank), which is exactly
  why the state must stay at the per-customer grain.
- Cohort LTV: state is the per-(customer, month) revenue sum
  (additive).  A customer's COHORT (first-order month) is EVOLVING —
  a later batch can reveal an earlier first order and move the
  customer (and all their revenue) to a different cohort, re-ageing
  every cell — so cohort assignment, cell sums, cumulative revenue,
  and LTV are derived from the per-customer-month grain at read time
  (the provisional-classification lesson of proof #24 at the cohort
  axis).  State compresses by the orders-per-(customer, month) ratio
  and is bounded by |customers|·|calendar months|.

Hard signal: after all batches, the derived outputs EXACTLY equal the
batch operators on the same data, row for row (integer/×10⁴ decimal
arithmetic — no tolerance anywhere).
"""

from __future__ import annotations

import datetime as dt
import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file
from decisions_kinesis_spark.operators.analytics_ext import (
    _MONEY_X10000,
    customer_revenue_gini,
    orders_cohort_ltv,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _tdiv(n: int, d: int) -> int:
    q = abs(n) // abs(d)
    return q if (n >= 0) == (d > 0) else -q


def _stream_orders(spark, tmp_path, handler, n_batches=3):
    o = load_table(spark, "orders", SF).select(
        "o_custkey", "o_orderdate", "o_totalprice"
    )
    src = str(tmp_path / "orders_stream")
    os.makedirs(src)
    now = time.time()
    parts = o.withColumn(
        "m", F.pmod(F.xxhash64("o_custkey", "o_totalprice"), F.lit(n_batches))
    )
    for i in range(n_batches):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )
    q = (
        spark.readStream.schema(
            "o_custkey bigint, o_orderdate timestamp, o_totalprice double"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"


def test_streaming_gini_maintenance_matches_batch(spark, tmp_path):
    # additive per-customer ×10⁴ revenue state; quantization runs
    # SPARK-side per micro-batch with the shared _MONEY_X10000 spelling
    rev: dict[int, int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        for r in (
            batch_df.groupBy("o_custkey")
            .agg(F.sum(F.expr(_MONEY_X10000)).alias("r"))
            .collect()
        ):
            rev[r["o_custkey"]] = rev.get(r["o_custkey"], 0) + int(r["r"])

    _stream_orders(spark, tmp_path, handler)
    assert epochs["n"] == 3

    # derive at read time: ranks ascending by (revenue, custkey), exact
    # integer moments, the batch operator's estimator verbatim
    items = sorted((x, k) for k, x in rev.items())
    n = len(items)
    total = sum(x for x, _ in items)
    s1 = sum(i * x for i, (x, _) in enumerate(items, start=1))
    got = (n, total, _tdiv((2 * s1 - (n + 1) * total) * 1_000_000, n * total))

    rows = customer_revenue_gini(spark, SF).collect()
    assert len(rows) == 1
    b = rows[0]
    assert got == (
        b["n_customers"], int(b["total_rev_x10000"]), b["gini_ppm"]
    )


def test_streaming_cohort_ltv_maintenance_matches_batch(spark, tmp_path):
    # additive per-(customer, month) state: month m = year·12 + month − 1
    # and the ×10⁴ revenue sum; n_orders per cell is NOT needed — only
    # the cell's existence (drives n_active) and its sum
    cm: dict[tuple[int, int], int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        for r in (
            batch_df.select(
                "o_custkey",
                F.expr(
                    "year(o_orderdate) * 12 + month(o_orderdate) - 1"
                ).alias("m"),
                F.expr(_MONEY_X10000).alias("r"),
            )
            .groupBy("o_custkey", "m")
            .agg(F.sum("r").alias("r"))
            .collect()
        ):
            key = (r["o_custkey"], r["m"])
            cm[key] = cm.get(key, 0) + int(r["r"])

    _stream_orders(spark, tmp_path, handler)
    assert epochs["n"] == 3

    # derive at read time: evolving cohort = min month per customer;
    # cells, cohort sizes, cumulative revenue, truncating LTV
    first: dict[int, int] = {}
    for (cust, m), _ in cm.items():
        if cust not in first or m < first[cust]:
            first[cust] = m
    sizes: dict[int, int] = {}
    for m0 in first.values():
        sizes[m0] = sizes.get(m0, 0) + 1
    cells: dict[tuple[int, int], list[int]] = {}
    for (cust, m), r in cm.items():
        c = cells.setdefault((first[cust], m - first[cust]), [0, 0])
        c[0] += 1  # one customer-month of activity per state key
        c[1] += r
    got = []
    for m0 in sorted({k[0] for k in cells}):
        cum = 0
        for age in sorted(a for c, a in cells if c == m0):
            n_active, rv = cells[(m0, age)]
            cum += rv
            got.append(
                (
                    dt.date(m0 // 12, m0 % 12 + 1, 1),
                    age,
                    n_active,
                    sizes[m0],
                    rv,
                    cum,
                    _tdiv(cum, sizes[m0]),
                )
            )

    batch = sorted(
        (
            r["cohort_month"], r["age_months"], r["n_active"],
            r["cohort_size"], int(r["rev_x10000"]),
            int(r["cum_rev_x10000"]), r["ltv_per_cust_x10000"],
        )
        for r in orders_cohort_ltv(spark, SF).collect()
    )
    assert batch
    assert sorted(got) == batch
