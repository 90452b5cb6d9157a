"""Streaming × clustering crossover: CONTINUOUS maintenance of ONE
Lloyd iteration under FROZEN centroids (equivalence proof #30) — the
mini-batch k-means shape (Sculley 2010, "Web-scale k-means
clustering"): arriving vectors are assigned to a fixed centroid set
and only ADDITIVE per-cluster moments are kept —

- per cluster: member count and Σdist (the inertia numerator),
- per (cluster, dim): Σq (the centroid-update numerator),

K + K·d bigint cells of state, independent of corpus size.  At read
time the state derives the iteration's full report — n_members,
truncating mean_dist, the UPDATED centroid (Σq div n per dim) and its
L1 mass — EXACTLY equal to the batch operator's iter=1 rows.

The recoverability line (the KM #24 / CUPED criterion): ONE iteration
is stream-maintainable because assignment under frozen centroids is a
pure per-row function; the full multi-iteration loop is NOT — each
re-assignment needs every vector against the MOVED centroids, i.e.
corpus-grain state (buffering, not streaming).  Re-iteration is a
batch affair over the retained corpus; the streaming dual maintains
the current iteration's moments between batch re-trainings — exactly
how production mini-batch/online k-means deployments split the work.

Hard signal: integer arithmetic end to end (the shared _QV_SQL /
_DIST_SQL spellings), no tolerance anywhere.
"""

from __future__ import annotations

import os
import time

from pyspark.sql import functions as F

from _helpers import stage_file as _stage_file, tdiv
from decisions_kinesis_spark.operators.clustering import (
    _DIST_SQL,
    _K,
    _QV_SQL,
    embedding_kmeans_inertia,
)
from decisions_kinesis_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_streaming_one_lloyd_iteration_matches_batch(spark, tmp_path):
    # frozen centroids = the batch seed contract (the K smallest
    # vec_ids of the static table), quantized with the shared spelling
    cents = (
        load_table(spark, "embeddings", SF)
        .filter(F.col("vec_id") < _K)
        .select(
            F.col("vec_id").alias("cent_id"),
            F.expr(_QV_SQL).alias("cv"),
        )
    )

    emb = load_table(spark, "embeddings", SF).select(
        "vec_id", "embedding"
    )
    src = str(tmp_path / "emb_stream")
    os.makedirs(src)
    now = time.time()
    parts = emb.withColumn(
        "m", F.pmod(F.xxhash64("vec_id"), F.lit(3))
    )
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    # additive state: per cluster (n, Σdist), per (cluster, pos) Σq
    nd: dict[int, list[int]] = {}
    dims: dict[tuple[int, int], int] = {}
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        assigned = (
            batch_df.select("vec_id", F.expr(_QV_SQL).alias("qv"))
            .crossJoin(F.broadcast(cents))
            .select(
                "vec_id", "qv", "cent_id", F.expr(_DIST_SQL).alias("dist")
            )
            .groupBy("vec_id")
            .agg(
                F.min(F.struct("dist", "cent_id")).alias("w"),
                F.first("qv").alias("qv"),
            )
            .select(
                F.col("w.cent_id").alias("cent_id"),
                F.col("w.dist").alias("dist"),
                "qv",
            )
        )
        for r in (
            assigned.groupBy("cent_id")
            .agg(F.count("*").alias("n"), F.sum("dist").alias("sd"))
            .collect()
        ):
            c = nd.setdefault(r["cent_id"], [0, 0])
            c[0] += r["n"]
            c[1] += int(r["sd"])
        for r in (
            assigned.select(
                "cent_id", F.posexplode("qv").alias("pos0", "q")
            )
            .groupBy("cent_id", "pos0")
            .agg(F.sum("q").alias("s"))
            .collect()
        ):
            key = (r["cent_id"], r["pos0"])
            dims[key] = dims.get(key, 0) + int(r["s"])

    q = (
        spark.readStream.schema("vec_id bigint, embedding array<float>")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # derive the iteration report from the additive state
    got = []
    for cid, (n, sd) in nd.items():
        cvals = [
            tdiv(dims[(cid, p)], n)
            for p in sorted(p for c, p in dims if c == cid)
        ]
        got.append((1, cid, n, sd // n, sum(abs(v) for v in cvals)))

    batch = [
        (r["iter"], r["cluster_id"], r["n_members"], r["mean_dist"],
         r["centroid_l1"])
        for r in embedding_kmeans_inertia(spark, SF).collect()
        if r["iter"] == 1
    ]
    assert sorted(got) == sorted(batch)
