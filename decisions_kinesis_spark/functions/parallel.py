"""Parallelism guard for compute-heavy per-row operators.

A small parquet file arrives as one input partition; an operator doing
real per-row work (md5 per char position, per-pair popcounts) would
then run single-core no matter how many executors exist.  At 100 TB
inputs are already well-partitioned and this is a no-op; on small
inputs it trades one tiny shuffle for full-cluster compute.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_partitions: int | None = None) -> DataFrame:
    sc = df.sparkSession.sparkContext
    want = min_partitions or sc.defaultParallelism
    if df.rdd.getNumPartitions() < want:
        return df.repartition(want)
    return df
