"""Streaming × dedup × training-prep crossover: INCREMENTAL
group-aware split maintenance — the streaming dual of
``split_group_aware`` (equivalence proof #25).

Composes proof #14's union-find (pair stream → cluster labels) with
the group-hash split: after every micro-batch the CURRENT split
assignment of every corpus document is derivable from O(|clustered
nodes|) state.  The interesting dynamics are pinned explicitly: a
batch that MERGES two clusters can FLIP the split of already-assigned
documents (their group label — the hash key — changed), which is why
a leakage-safe split must be derived from live cluster state, not
frozen at first sight of each document.

Hard signal: after all batches, the derived per-document split —
including the injected-duplicate universe and singleton fallback —
EXACTLY equals the batch ``split_group_aware`` membership (same
cluster labels, same md5 group hash), and every observed flip is
explained by a group-label change in that same batch.
"""

from __future__ import annotations

import hashlib
import os
import time

from pyspark.sql import functions as F

from decisions_kinesis_spark.operators.dedup import (
    _with_injected_dups,
    dedup_components,
    dedup_minhash_lsh_pairs,
    split_group_aware,
)
from decisions_kinesis_spark.sources.tables import load_table
from _helpers import stage_file as _stage_file

SF = "/root/testdata/sf0.001"


def _side(group_id: int) -> str:
    h = int(hashlib.md5(str(group_id).encode()).hexdigest()[:15], 16)
    return "train" if h % 100 < 90 else "val"


def test_streaming_split_maintenance_matches_batch(spark, tmp_path):
    pairs = dedup_minhash_lsh_pairs(spark, SF).select("doc_a", "doc_b")
    assert pairs.count() > 0
    src = str(tmp_path / "pair_stream")
    os.makedirs(src)
    now = time.time()
    parts = pairs.withColumn("m", (F.col("doc_a") + F.col("doc_b")) % 3)
    for i in range(3):
        _stage_file(
            parts.filter(F.col("m") == i).drop("m"),
            src,
            f"b{i}.parquet",
            now - 120 + 60 * i,
        )

    universe = [
        r["doc_id"]
        for r in _with_injected_dups(load_table(spark, "documents", SF))
        .select("doc_id")
        .collect()
    ]

    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def snapshot() -> dict[int, tuple[int, str]]:
        """doc → (group, split) from live state; singletons fall back
        to their own id — the operator's coalesce contract."""
        out = {}
        for d in universe:
            g = find(d) if d in parent else d
            out[d] = (g, _side(g))
        return out

    snaps = [snapshot()]
    epochs = {"n": 0}

    def handler(batch_df, epoch_id):
        epochs["n"] += 1
        for r in batch_df.collect():
            ra, rb = find(r["doc_a"]), find(r["doc_b"])
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        snaps.append(snapshot())

    q = (
        spark.readStream.schema("doc_a bigint, doc_b bigint")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(handler)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(180), "stream did not finish in time"
    assert epochs["n"] == 3

    # flip dynamics: a split flip is legal ONLY when the group label
    # changed in the same batch (cluster merge moved the hash key)
    n_flips = 0
    for prev, cur in zip(snaps, snaps[1:]):
        for d in universe:
            if prev[d][1] != cur[d][1]:
                n_flips += 1
                assert prev[d][0] != cur[d][0], (
                    f"doc {d} flipped split without a group change"
                )

    # hard signal 1: final membership equals the batch operator's
    # cluster labels + hash, doc by doc
    batch_groups = {
        r["doc_id"]: r["cluster"]
        for r in dedup_components(spark, SF).collect()
    }
    expect = {
        d: (
            batch_groups.get(d, d),
            _side(batch_groups.get(d, d)),
        )
        for d in universe
    }
    assert snaps[-1] == expect

    # hard signal 2: the derived aggregates equal the registered query
    agg: dict[tuple, list] = {}
    for d, (g, s) in snaps[-1].items():
        a = agg.setdefault((s, d in batch_groups), [0, set(), 0])
        a[0] += 1
        a[1].add(g)
        a[2] += d
    got = {
        k: (n, len(groups), chk) for k, (n, groups, chk) in agg.items()
    }
    rows = {
        (r["split"], r["is_clustered"]): (
            r["n_docs"],
            r["n_groups"],
            r["id_checksum"],
        )
        for r in split_group_aware(spark, SF).collect()
    }
    assert got == rows
