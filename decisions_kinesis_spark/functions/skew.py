"""Skew-mitigation helpers (100 TB posture, SURVEY.md §7).

AQE's skew-join handling (enabled in the session factory) covers most
cases at runtime; these helpers are for the two patterns AQE cannot
fix:

- ``salted_aggregate`` — two-phase aggregation for hot GROUP BY keys
  (partial agg on (key, salt), final agg on key);
- ``salt_join_keys``   — explicit salting for a shuffle join against a
  replicable small-ish side.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, Column],
    n_salts: int = 16,
) -> DataFrame:
    """Two-phase (salted) aggregation for skewed group keys.

    Phase 1 shuffles on (keys..., salt) — a hot key spreads over
    ``n_salts`` reducers; phase 2 re-aggregates the ``n_salts`` partial
    rows per key.  Only decomposable aggregates are supported: the
    caller provides the partial aggs; the final phase re-applies SUM to
    the partial columns (sum-of-sums, sum-of-counts).
    """
    salted = df.withColumn(
        "_salt", (F.rand(seed=42) * n_salts).cast("int")
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[c.alias(name) for name, c in aggs.items()]
    )
    final = partial.groupBy(*keys).agg(
        *[F.sum(name).alias(name) for name in aggs]
    )
    return final


def salt_join_keys(
    big: DataFrame,
    small: DataFrame,
    key: str,
    n_salts: int = 8,
) -> tuple[DataFrame, DataFrame, list[str]]:
    """Salt a skewed equi-join: the big side gets a random salt, the
    small side is replicated ``n_salts``× with every salt value — the
    hot key's rows land on ``n_salts`` different reducers.

    Returns (salted_big, replicated_small, join_keys).
    """
    salted_big = big.withColumn("_salt", (F.rand(seed=42) * n_salts).cast("int"))
    replicated_small = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    )
    return salted_big, replicated_small, [key, "_salt"]
