"""Batch table loaders for the driver's parquet fixtures (TESTDATA.md).

Plain ``spark.read.parquet`` — Catalyst handles predicate pushdown,
column pruning, and partition listing (the batch analog of shard
discovery S3, KinesisThreadJobs.cs:201-218).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import TimestampType

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


#: Analyzed-relation cache: the fixtures are immutable, so the parquet
#: footer/schema read and DataFrame construction (~180 ms via py4j) are
#: paid once per (session, sf_dir, table) instead of once per query —
#: the catalog-metadata cache every real engine keeps.
_RELATION_CACHE: dict[tuple[str, str, str], DataFrame] = {}


def load_table(spark: SparkSession, name: str, sf_dir: str | None = None) -> DataFrame:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    # The driver owns the SparkSession; pin UTC on EVERY call (cache hit
    # or miss) so timestamp values compare stably against the DuckDB
    # oracle even if intervening code changed the session timezone.
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    key = (spark.sparkContext.applicationId, sf_dir, name)
    cached = _RELATION_CACHE.get(key)
    if cached is not None:
        return cached
    if name == "events":
        # ts is parquet TIMESTAMP(NANOS): Spark has no nanosecond timestamp
        # type, so read it as long-nanos and truncate to microseconds —
        # exactly what DuckDB does when casting TIMESTAMP_NS → TIMESTAMP,
        # keeping oracle comparisons exact.  The legacy conf is confined
        # to this one read (restored after analysis) so unrelated parquet
        # reads in the session keep normal timestamp decoding.
        prior = spark.conf.get("spark.sql.legacy.parquet.nanosAsLong")
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
        try:
            df = spark.read.parquet(os.path.join(sf_dir, "events.parquet"))
            if dict(df.dtypes).get("ts") == "bigint":
                # integer division: ns-since-epoch overflows double precision
                df = df.withColumn("ts", F.timestamp_micros(F.expr("ts div 1000")))
            elif dict(df.dtypes).get("ts") == "timestamp_ntz":
                # TIMESTAMP(MICROS, isAdjustedToUTC=false) parquet comes out
                # TimestampNTZ under inferTimestampNTZ; normalize to LTZ.
                # The session tz is pinned UTC above, so the NTZ→LTZ cast
                # reinterprets the naive value as UTC — the same instants
                # DuckDB sees for its naive TIMESTAMP.  The cast target is
                # the EXPLICIT TimestampType (not the "timestamp" alias,
                # which resolves through spark.sql.timestampType and would
                # silently no-op if a caller overrode that conf to NTZ).
                df = df.withColumn("ts", F.col("ts").cast(TimestampType()))
        finally:
            spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", prior)
    else:
        df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    _RELATION_CACHE[key] = df
    return df


#: Row-count cache next to the relation cache: adaptive operators (IVF
#: centroid modulus, LSH plane count) size themselves from N; the
#: fixtures are immutable, so one column-pruned count per (session,
#: sf_dir, table) serves every query in the session.
_COUNT_CACHE: dict[tuple[str, str, str], int] = {}


def table_count(spark: SparkSession, name: str, sf_dir: str | None = None) -> int:
    sf_dir = sf_dir or DEFAULT_SF_DIR
    key = (spark.sparkContext.applicationId, sf_dir, name)
    n = _COUNT_CACHE.get(key)
    if n is None:
        n = load_table(spark, name, sf_dir).count()
        _COUNT_CACHE[key] = n
    return n


def load_tables(
    spark: SparkSession, sf_dir: str | None = None, names: tuple[str, ...] = TABLE_NAMES
) -> dict[str, DataFrame]:
    return {n: load_table(spark, n, sf_dir) for n in names}


def register_views(spark: SparkSession, sf_dir: str | None = None) -> None:
    """Register every fixture table as a temp view for the SQL API."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
