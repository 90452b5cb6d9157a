"""Interleaved A/B for graph_triangle_knn_copurchase variants:
A = current triangle_counts (deg lazy, 3 consumers)
B = deg checkpointed once (coalesced — |V|-row frame)

    python tools/ab_triangle.py [--n 3]
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

    from pyspark.sql import functions as F

    from decisions_kinesis_spark.operators.graphs import (
        graph_triangle_knn_copurchase,
        triangle_counts,
    )
    from decisions_kinesis_spark.operators import graphs
    from decisions_kinesis_spark.session import get_session

    spark = get_session(app_name="dks-ab-tri")
    spark.range(1000).selectExpr("sum(id)").collect()

    real_triangle_counts = graphs.triangle_counts

    def triangle_counts_ckpt_deg(und):
        deg = (
            und.select(F.col("u").alias("node"))
            .unionAll(und.select(F.col("v").alias("node")))
            .groupBy("node")
            .agg(F.count("*").alias("deg"))
            .localCheckpoint(eager=True)
        )
        with_degs = und.join(
            deg.select(F.col("node").alias("u"), F.col("deg").alias("du")),
            "u",
        ).join(
            deg.select(F.col("node").alias("v"), F.col("deg").alias("dv")),
            "v",
        )
        u_first = (F.col("du") < F.col("dv")) | (
            (F.col("du") == F.col("dv")) & (F.col("u") < F.col("v"))
        )
        oriented = with_degs.select(
            F.when(u_first, F.col("u")).otherwise(F.col("v")).alias("a"),
            F.when(u_first, F.col("v")).otherwise(F.col("u")).alias("b"),
            F.when(u_first, F.col("dv")).otherwise(F.col("du")).alias("db"),
        ).localCheckpoint(eager=True)
        e1, e2 = oriented.alias("e1"), oriented.alias("e2")
        wedges = e1.join(
            e2,
            (F.col("e1.a") == F.col("e2.a"))
            & (
                (F.col("e1.db") < F.col("e2.db"))
                | (
                    (F.col("e1.db") == F.col("e2.db"))
                    & (F.col("e1.b") < F.col("e2.b"))
                )
            ),
        ).select(
            F.col("e1.a").alias("t1"),
            F.col("e1.b").alias("t2"),
            F.col("e2.b").alias("t3"),
        )
        tris = wedges.join(
            oriented.select(F.col("a").alias("t2"), F.col("b").alias("t3")),
            ["t2", "t3"],
        )
        per_node = (
            tris.select(F.explode(F.array("t1", "t2", "t3")).alias("node"))
            .groupBy("node")
            .agg(F.count("*").alias("tri_cnt"))
        )
        return per_node.join(deg, "node")

    def run(variant) -> float:
        graphs.triangle_counts = variant
        t0 = time.perf_counter()
        graph_triangle_knn_copurchase(spark, sf_dir).write.format(
            "noop"
        ).mode("overwrite").save()
        graphs.triangle_counts = real_triangle_counts
        return time.perf_counter() - t0

    graphs.triangle_counts = real_triangle_counts
    ra = sorted(
        map(tuple, graph_triangle_knn_copurchase(spark, sf_dir).collect())
    )
    graphs.triangle_counts = triangle_counts_ckpt_deg
    rb = sorted(
        map(tuple, graph_triangle_knn_copurchase(spark, sf_dir).collect())
    )
    graphs.triangle_counts = real_triangle_counts
    assert ra == rb, "triangle results differ!"
    a, b = [], []
    for _ in range(n):
        a.append(run(real_triangle_counts))
        b.append(run(triangle_counts_ckpt_deg))
    print(
        f"rows ok ({len(ra)})  lazy-deg best {min(a):6.3f} "
        f"{[round(x,2) for x in a]}  ckpt-deg best {min(b):6.3f} "
        f"{[round(x,2) for x in b]}"
    )


if __name__ == "__main__":
    main()
