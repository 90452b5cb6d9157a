"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query smoke on sf0.001.
``queries()`` — every implemented operator (SURVEY.md §2 + §7).
``oracle_sql()`` — DuckDB-equivalent SQL per query (the correctness gate).
"""

from __future__ import annotations

import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, "/root/repo")


# Registration order = the order the driver's correctness gate walks
# the queries; cheap scan-shaped families first, the expensive dedup
# pair pipelines last, so a time-capped gate reaches everything cheap
# before paying for the pair generation.
_OPERATOR_MODULES = (
    "payload",
    "relational",
    "windows_ext",
    "asof",
    "textops",
    "multimodal",
    "udfs",
    "pipeline",
    "similarity",
    "dedup",
)


def _registries():
    import importlib

    queries: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    oracles: dict[str, str] = {}
    for name in _OPERATOR_MODULES:
        try:
            m = importlib.import_module(f"decisions_kinesis_spark.operators.{name}")
        except ImportError:
            continue
        queries.update(m.QUERIES)
        oracles.update(m.ORACLES)
    return queries, oracles


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from decisions_kinesis_spark.operators.payload import flagship_premium_filter

    return flagship_premium_filter(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _registries()[0]


def oracle_sql() -> dict[str, str]:
    return _registries()[1]
