"""Second-wave analytic extensions: robust statistics + Pareto/ABC.

Two operator families the monitoring/merchandising side of an
analytics engine needs beyond the first-wave suites:

- ``events_winsorized_stats`` — percentile-clipped (winsorized) robust
  moments per event type, completing the robust-statistics family next
  to ``events_mad_outliers`` (windows_ext.py): MAD answers "how many
  points are anomalous", winsorizing answers "what is the mean once
  tails stop lying".
- ``orders_pareto_abc`` — cumulative-revenue-share ABC classification
  of parts (the 80/95 Pareto cut), the inventory-analytics shape that
  needs an exact GLOBAL cumulative sum — implemented with the
  distributed prefix-sum pattern (range repartition + per-partition
  offsets), never a single-partition window, so the same plan survives
  a dimension table with 10⁸ members.

Determinism: quantile interpolations are bitwise-identical between
the engines (the established ``percentile``/``quantile_cont``
contract); money flows through per-row integer quantization (×10⁴,
floor+0.5) so every sum, cumulative sum, and share is exact BIGINT in
both engines; double outputs are floor-rounded at 4dp.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from decisions_kinesis_spark.functions.rounding import fl4
from decisions_kinesis_spark.sources.tables import load_table


def events_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized (1%/99%-clipped) statistics per event_type: the
    clipping bounds, how many observations each tail clamps, and the
    winsorized mean — the robust location estimate monitoring uses
    when raw means chase heavy tails.

    Determinism: p01/p99 use the identical continuous-quantile
    interpolation in both engines and all comparisons run on the
    UNROUNDED doubles; the clamped values are per-row quantized to
    DECIMAL(18,4) before summing (exact, order-free) and the single
    double division is floor-rounded at output (the MAD/gapfill
    contract).

    Scale: one exact-percentile reduction per type (|types| groups)
    with the tiny bounds frame broadcast back; the clamp + count +
    sum pass is ONE map-side-combining aggregation.
    """
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    bounds = ev.groupBy("event_type").agg(
        F.expr("percentile(value, cast(1 as double)/100)").alias("p01"),
        F.expr("percentile(value, cast(99 as double)/100)").alias("p99"),
    )
    return (
        ev.join(F.broadcast(bounds), "event_type")
        .withColumn(
            "w", F.least(F.greatest(F.col("value"), F.col("p01")), F.col("p99"))
        )
        .groupBy("event_type")
        .agg(
            F.first("p01").alias("p01_raw"),
            F.first("p99").alias("p99_raw"),
            F.count("*").alias("n"),
            F.count(F.when(F.col("value") < F.col("p01"), 1)).alias(
                "n_clip_low"
            ),
            F.count(F.when(F.col("value") > F.col("p99"), 1)).alias(
                "n_clip_high"
            ),
            F.sum(F.col("w").cast("decimal(18,4)")).alias("wsum"),
        )
        .select(
            "event_type",
            fl4(F.col("p01_raw")).alias("p01"),
            fl4(F.col("p99_raw")).alias("p99"),
            "n",
            "n_clip_low",
            "n_clip_high",
            fl4(F.col("wsum").cast("double") / F.col("n")).alias("win_mean"),
        )
    )


_ABC_PARTS = 16  # range partitions for the distributed prefix sum


def orders_pareto_abc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto/ABC classification of parts by discounted revenue: parts
    covering the first 80% of cumulative revenue are class A, to 95%
    class B, the long tail C — with each part's exact cumulative share
    in ppm.  The classic inventory-skew report, and the shape any
    "which sources give 80% of my tokens" corpus question takes.

    Exactness: per-row revenue is quantized to bigint once
    (``floor(price·(1−disc)·10⁴ + 0.5)``); every aggregate and the
    cumulative sum stay integer from there, so the 80/95 threshold
    comparisons (``cum·100 ≤ 80·total``) never touch a float in
    either engine.  Per-PART revenue fits bigint at any realistic
    scale, but the corpus-wide cumulative total does not (×10⁴-scaled
    revenue passes 9.2·10¹⁸ around SF 50k ≈ 50 TB), so ``cum``/
    ``total`` and everything derived from them run as DECIMAL(38,0)
    in Spark — DuckDB's BIGINT sums already widen to INT128 natively.

    Scale: revenue aggregates map-side to |parts| rows; the global
    cumulative sum uses the distributed prefix-sum pattern — range-
    repartition on the (rev desc, part) total order, localCheckpoint
    to pin the partitioner's sampling (the layout lesson), collect the
    ≤|partitions| per-partition subtotals, and add each partition's
    starting offset to its within-partition running sum — a
    partitioned window, never a single-partition WindowExec, so the
    plan holds for arbitrarily large dimension tables.
    """
    rev = (
        load_table(spark, "lineitem", sf_dir)
        .select(
            F.col("l_partkey").alias("part_key"),
            F.expr(
                "cast(floor(l_extendedprice * (1.0 - l_discount) * 10000"
                " + 0.5) as bigint)"
            ).alias("r"),
        )
        .groupBy("part_key")
        .agg(F.sum("r").alias("rev_scaled"))
    )
    part = (
        rev.repartitionByRange(
            _ABC_PARTS, F.col("rev_scaled").desc(), F.col("part_key")
        )
        .withColumn("_pid", F.spark_partition_id())
        .localCheckpoint(eager=True)
    )
    subtotals = sorted(
        (r["_pid"], r["s"], r["c"])
        for r in part.groupBy("_pid")
        .agg(F.sum("rev_scaled").alias("s"), F.count("*").alias("c"))
        .collect()
    )
    total = sum(s for _, s, _ in subtotals)
    offsets, acc = [], 0
    for pid, s, _c in subtotals:
        offsets.append((pid, Decimal(acc)))
        acc += s
    off_df = part.sparkSession.createDataFrame(
        offsets, "_pid int, _off decimal(38,0)"
    )
    w = (
        Window.partitionBy("_pid")
        .orderBy(F.col("rev_scaled").desc(), F.col("part_key"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    tot = f"cast('{total}' as decimal(38,0))"
    return (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn(
            "cum",
            F.sum(F.col("rev_scaled").cast("decimal(38,0)")).over(w)
            + F.col("_off"),
        )
        .select(
            "part_key",
            "rev_scaled",
            F.expr(f"(cum * 1000000) div {tot}").alias("cum_ppm"),
            F.expr(
                f"case when cum * 100 <= 80 * {tot} then 'A' "
                f"when cum * 100 <= 95 * {tot} then 'B' "
                "else 'C' end"
            ).alias("abc_class"),
        )
    )


QUERIES = {
    "events_winsorized_stats": events_winsorized_stats,
    "orders_pareto_abc": orders_pareto_abc,
}

ORACLES = {
    "events_winsorized_stats": """
        WITH bounds AS (
            SELECT event_type,
                   quantile_cont(value, 1.0/100) AS p01,
                   quantile_cont(value, 99.0/100) AS p99
            FROM events GROUP BY event_type
        )
        SELECT e.event_type,
               floor(any_value(b.p01) * 10000 + 0.5) / 10000.0 AS p01,
               floor(any_value(b.p99) * 10000 + 0.5) / 10000.0 AS p99,
               count(*)::BIGINT AS n,
               count(*) FILTER (WHERE e.value < b.p01)::BIGINT AS n_clip_low,
               count(*) FILTER (WHERE e.value > b.p99)::BIGINT AS n_clip_high,
               floor(
                   (sum(least(greatest(e.value, b.p01), b.p99)
                        ::DECIMAL(18,4))::DOUBLE / count(*)) * 10000 + 0.5
               ) / 10000.0 AS win_mean
        FROM events e JOIN bounds b ON e.event_type = b.event_type
        GROUP BY e.event_type
    """,
    "orders_pareto_abc": """
        WITH rev AS (
            SELECT l_partkey AS part_key,
                   sum(floor(l_extendedprice * (1.0 - l_discount) * 10000
                             + 0.5)::BIGINT) AS rev_scaled
            FROM lineitem GROUP BY l_partkey
        ),
        t AS (SELECT sum(rev_scaled)::BIGINT AS total FROM rev),
        c AS (
            SELECT part_key, rev_scaled,
                   sum(rev_scaled) OVER (
                       ORDER BY rev_scaled DESC, part_key
                       ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
                   ) AS cum
            FROM rev
        )
        SELECT part_key, rev_scaled,
               (cum * 1000000) // total AS cum_ppm,
               CASE WHEN cum * 100 <= 80 * total THEN 'A'
                    WHEN cum * 100 <= 95 * total THEN 'B'
                    ELSE 'C' END AS abc_class
        FROM c, t
    """,
}
