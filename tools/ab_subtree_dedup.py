"""Interleaved A/B for the subtree-dedup changes: old vs new
events_theil_sen_trend (pts checkpoint) and quantile_bottomk_sample
(window-carried n_rows).  Old constructions are inlined; values are
asserted identical each round.

    python tools/ab_subtree_dedup.py [--n 3]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    n = 3
    if "--n" in sys.argv:
        n = int(sys.argv[sys.argv.index("--n") + 1])

    os.environ.setdefault("SPARK_GRAFT_QUIET_WINDOWEXEC", "1")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pyspark.sql import Window
    from pyspark.sql import functions as F

    from decisions_kinesis_spark.operators.analytics_ext import (
        events_theil_sen_trend,
    )
    from decisions_kinesis_spark.operators.relational import (
        _QS_HV_SPARK,
        _QS_K,
        _QS_PQ_SPARK,
        quantile_bottomk_sample,
    )
    from decisions_kinesis_spark.session import get_session
    from decisions_kinesis_spark.sources.tables import load_table

    spark = get_session(app_name="dks-ab-subtree")
    spark.range(1000).selectExpr("sum(id)").collect()

    def old_theil_sen():
        ev = load_table(spark, "events", sf_dir).select(
            "event_type", F.date_trunc("hour", F.col("ts")).alias("b"), "value"
        )
        hourly = ev.groupBy("event_type", "b").agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,4)")).alias("sdec"),
        )
        w = Window.partitionBy("event_type").orderBy("b")
        pts = (
            hourly.select(
                "event_type",
                "b",
                F.expr(
                    "cast(floor((cast(sdec as double) / n) * 10000 + 0.5)"
                    " as bigint)"
                ).alias("y"),
            )
            .where(F.col("y").isNotNull())
            .select(
                "event_type",
                F.row_number().over(w).cast("bigint").alias("x"),
                "y",
            )
        )
        p1, p2 = pts.alias("p1"), pts.alias("p2")
        pairs = p1.join(
            p2,
            (F.col("p1.event_type") == F.col("p2.event_type"))
            & (F.col("p1.x") < F.col("p2.x")),
        ).select(
            F.col("p1.event_type").alias("event_type"),
            F.expr("(p2.y - p1.y) * 1000000 div (p2.x - p1.x)").alias(
                "slope"
            ),
            F.col("p1.x").alias("x1"),
            F.col("p2.x").alias("x2"),
        )
        med = (
            pairs.groupBy("event_type")
            .agg(
                F.expr(
                    "sort_array(collect_list(named_struct("
                    " 's', slope, 'x1', x1, 'x2', x2)))"
                ).alias("sl")
            )
            .select(
                "event_type",
                F.expr("size(sl)").cast("bigint").alias("n_pairs"),
                F.expr(
                    "element_at(sl, cast((size(sl) + 1) div 2 as int)).s"
                ).alias("slope_ppm"),
            )
        )
        resid = pts.join(F.broadcast(med), "event_type").select(
            "event_type",
            "x",
            F.expr("y * 1000000 - slope_ppm * x").alias("r"),
        )
        icept = (
            resid.groupBy("event_type")
            .agg(
                F.expr(
                    "sort_array(collect_list(named_struct('r', r, 'x', x)))"
                ).alias("rl")
            )
            .select(
                "event_type",
                F.expr(
                    "element_at(rl, cast((size(rl) + 1) div 2 as int)).r"
                ).alias("intercept_ppm"),
            )
        )
        npts = pts.groupBy("event_type").agg(F.count("*").alias("n_points"))
        return (
            npts.filter(F.col("n_points") >= 2)
            .join(med, "event_type")
            .join(icept, "event_type")
            .select(
                "event_type", "n_points", "n_pairs", "slope_ppm",
                "intercept_ppm",
            )
        )

    def old_bottomk():
        li = load_table(spark, "lineitem", sf_dir).select(
            "l_returnflag",
            F.expr(_QS_PQ_SPARK).alias("pq"),
            F.expr(_QS_HV_SPARK).alias("hv"),
        )
        vc = li.groupBy("l_returnflag", "pq").agg(F.count("*").alias("cnt"))
        cum = vc.withColumn(
            "cum",
            F.sum("cnt").over(
                Window.partitionBy("l_returnflag")
                .orderBy("pq")
                .rowsBetween(Window.unboundedPreceding, Window.currentRow)
            ),
        )
        tpos = (
            vc.groupBy("l_returnflag")
            .agg(F.sum("cnt").alias("n_rows"))
            .select(
                "l_returnflag",
                "n_rows",
                F.expr("((n_rows - 1) * 5) div 10 + 1").alias("t50"),
                F.expr("((n_rows - 1) * 9) div 10 + 1").alias("t90"),
            )
        )
        exact = (
            cum.join(F.broadcast(tpos), "l_returnflag")
            .groupBy("l_returnflag", "n_rows")
            .agg(
                F.min(
                    F.when(F.col("cum") >= F.col("t50"), F.col("pq"))
                ).alias("exact_median_q"),
                F.min(
                    F.when(F.col("cum") >= F.col("t90"), F.col("pq"))
                ).alias("exact_p90_q"),
            )
        )
        samp = (
            li.withColumn(
                "rk",
                F.row_number().over(
                    Window.partitionBy("l_returnflag").orderBy("hv", "pq")
                ),
            )
            .filter(F.col("rk") <= _QS_K)
            .groupBy("l_returnflag")
            .agg(
                F.sort_array(F.collect_list("pq")).alias("vals"),
                F.count("*").alias("k_actual"),
            )
            .select(
                "l_returnflag",
                F.expr(
                    "element_at(vals, cast(((k_actual - 1) * 5) div 10 + 1"
                    " as int))"
                ).alias("sample_median_q"),
                F.expr(
                    "element_at(vals, cast(((k_actual - 1) * 9) div 10 + 1"
                    " as int))"
                ).alias("sample_p90_q"),
            )
        )
        return exact.join(samp, "l_returnflag").select(
            "l_returnflag",
            "n_rows",
            "exact_median_q",
            "sample_median_q",
            F.expr(
                "case when exact_median_q = 0 then cast(0 as bigint)"
                " else ((sample_median_q - exact_median_q) * 1000000)"
                "      div exact_median_q end"
            ).alias("med_err_ppm"),
            "exact_p90_q",
            "sample_p90_q",
            F.expr(
                "case when exact_p90_q = 0 then cast(0 as bigint)"
                " else ((sample_p90_q - exact_p90_q) * 1000000)"
                "      div exact_p90_q end"
            ).alias("p90_err_ppm"),
        )

    cases = [
        ("theil_sen", old_theil_sen,
         lambda: events_theil_sen_trend(spark, sf_dir)),
        ("bottomk", old_bottomk,
         lambda: quantile_bottomk_sample(spark, sf_dir)),
    ]
    for name, old_fn, new_fn in cases:
        rows_old = sorted(map(tuple, old_fn().collect()))
        rows_new = sorted(map(tuple, new_fn().collect()))
        assert rows_old == rows_new, f"{name}: values differ!"
        olds, news = [], []
        for _ in range(n):
            t0 = time.perf_counter()
            old_fn().write.format("noop").mode("overwrite").save()
            olds.append(time.perf_counter() - t0)
            t0 = time.perf_counter()
            new_fn().write.format("noop").mode("overwrite").save()
            news.append(time.perf_counter() - t0)
        print(
            f"{name:12s} rows ok ({len(rows_new)})  "
            f"old best {min(olds):6.3f} {[round(x,2) for x in olds]}  "
            f"new best {min(news):6.3f} {[round(x,2) for x in news]}",
            flush=True,
        )


if __name__ == "__main__":
    main()
