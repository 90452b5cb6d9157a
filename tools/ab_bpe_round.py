"""Interleaved A/B for the fused BPE round (1 checkpoint/round) vs the
old two-checkpoint round, both run in-process against the same session.

    python tools/ab_bpe_round.py [--n 3]
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

    from decisions_kinesis_spark.functions.parallel import ensure_parallelism
    from decisions_kinesis_spark.operators.corpus import (
        _BPE_APPLY,
        _BPE_ITER_ROUNDS,
        _TOKS,
    )
    from decisions_kinesis_spark.session import get_session
    from decisions_kinesis_spark.sources.tables import load_table

    spark = get_session(app_name="dks-ab-bpe")
    spark.range(1000).selectExpr("sum(id)").collect()

    def base_syms():
        docs = ensure_parallelism(
            load_table(spark, "documents", sf_dir).select("text")
        )
        wt = (
            docs.select(F.explode(F.expr(_TOKS)).alias("w"))
            .groupBy("w")
            .agg(F.count("*").alias("tf"))
        )
        return wt.withColumn(
            "s", F.expr("filter(split(w, ''), x -> x != '')")
        ).localCheckpoint(eager=True)

    def pairs_of(syms):
        return (
            syms.filter(F.size("s") >= 2)
            .select(
                "tf",
                F.explode(
                    F.expr(
                        "transform(sequence(1, size(s) - 1),"
                        " i -> concat(element_at(s, i), char(31),"
                        "             element_at(s, i + 1)))"
                    )
                ).alias("pk"),
            )
            .groupBy("pk")
            .agg(F.sum("tf").alias("n"))
        )

    def old_loop() -> float:
        t0 = time.perf_counter()
        syms = base_syms()
        merges = []
        for r in range(1, _BPE_ITER_ROUNDS + 1):
            top = (
                pairs_of(syms)
                .orderBy(F.desc("n"), F.asc("pk"))
                .limit(1)
                .select(
                    F.expr("split(pk, char(31))[0]").alias("ml"),
                    F.expr("split(pk, char(31))[1]").alias("mr"),
                    "n",
                )
                .localCheckpoint(eager=True)
            )
            merges.append(
                top.select(
                    F.lit(r).cast("bigint").alias("merge_round"),
                    F.col("ml").alias("lhs"),
                    F.col("mr").alias("rhs"),
                    "n",
                )
            )
            syms = (
                syms.join(
                    F.broadcast(
                        top.select(
                            F.col("ml").alias("_ml"), F.col("mr").alias("_mr")
                        )
                    ),
                    F.lit(True),
                    "left",
                )
                .withColumn("_ml", F.expr("coalesce(_ml, char(30))"))
                .withColumn("_mr", F.expr("coalesce(_mr, char(30))"))
                .select("w", "tf", F.expr(_BPE_APPLY).alias("s"))
                .localCheckpoint(eager=True)
            )
        out = merges[0]
        for m in merges[1:]:
            out = out.unionByName(m)
        rows_old = sorted(map(tuple, out.collect()))
        return time.perf_counter() - t0, rows_old

    def new_loop() -> float:
        from decisions_kinesis_spark.operators import stage_cache
        from decisions_kinesis_spark.operators.corpus import _bpe_iter_state

        stage_cache.clear()
        t0 = time.perf_counter()
        merges, _ = _bpe_iter_state(spark, sf_dir)
        rows_new = sorted(map(tuple, merges.collect()))
        return time.perf_counter() - t0, rows_new

    olds, news = [], []
    rows_ref = None
    for _ in range(n):
        to, ro = old_loop()
        tn, rn = new_loop()
        assert ro == rn, "merge tables differ between old and new loops!"
        rows_ref = rn
        olds.append(to)
        news.append(tn)
    print(f"rows identical across arms: {len(rows_ref)} merges")
    print(
        f"old best {min(olds):6.3f} (all {[round(x,2) for x in olds]})\n"
        f"new best {min(news):6.3f} (all {[round(x,2) for x in news]})"
    )


if __name__ == "__main__":
    main()
