"""File-format round-trips and skew-helper equivalence tests."""

from __future__ import annotations

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from decisions_kinesis_spark.functions.skew import salt_join_keys, salted_aggregate
from decisions_kinesis_spark.sources.formats import read_table_as, write_table
from decisions_kinesis_spark.sources.tables import load_table


@pytest.mark.parametrize("fmt", ["parquet", "orc", "json", "csv"])
def test_format_roundtrip_nation(spark, sf_dir, fmt):
    nation = load_table(spark, "nation", sf_dir)
    tmp = tempfile.mkdtemp(prefix=f"dks-fmt-{fmt}-")
    try:
        write_table(nation, f"{tmp}/out", fmt=fmt)
        back = read_table_as(spark, f"{tmp}/out", fmt, nation.schema)
        assert sorted(map(tuple, back.collect())) == sorted(
            map(tuple, nation.collect())
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_relation_cache_isolated_per_sf_dir(spark):
    """The analyzed-relation cache must key on sf_dir: the same table
    loaded from two scale factors returns different data."""
    a = load_table(spark, "lineitem", "/root/testdata/sf0.001")
    b = load_table(spark, "lineitem", "/root/testdata/sf0.01")
    assert a is load_table(spark, "lineitem", "/root/testdata/sf0.001")  # cached
    assert a.count() != b.count()


def test_merge_schema_reads_evolved_parquet(spark, sf_dir):
    """Schema evolution: a dataset written in two generations (second
    adds a column) reads as the union schema with nulls for the old
    files — the drift situation every long-lived 100 TB dataset hits."""
    nation = load_table(spark, "nation", sf_dir)
    tmp = tempfile.mkdtemp(prefix="dks-evolve-")
    try:
        nation.write.parquet(f"{tmp}/data/gen=1")
        nation.withColumn("n_comment", F.lit("added-later")).write.parquet(
            f"{tmp}/data/gen=2"
        )
        back = spark.read.option("mergeSchema", True).parquet(f"{tmp}/data")
        assert "n_comment" in back.columns
        assert back.count() == 2 * nation.count()
        # old-generation rows surface the new column as NULL
        assert back.filter(F.col("n_comment").isNull()).count() == nation.count()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_corrupt_json_records_permissive_vs_failfast(spark):
    """Corrupt-record handling on JSON sources: PERMISSIVE surfaces bad
    lines in _corrupt_record (pipeline continues), FAILFAST raises —
    the two contracts a production ingest chooses between."""
    tmp = tempfile.mkdtemp(prefix="dks-corrupt-")
    try:
        with open(f"{tmp}/data.json", "w") as f:
            f.write('{"a": 1, "b": "x"}\n')
            f.write("not json at all\n")
            f.write('{"a": 2, "b": "y"}\n')
        schema = "a bigint, b string, _corrupt_record string"
        ok = (
            spark.read.schema(schema)
            .option("mode", "PERMISSIVE")
            .option("columnNameOfCorruptRecord", "_corrupt_record")
            .json(f"{tmp}/data.json")
        )
        rows = ok.collect()
        assert len(rows) == 3
        assert sum(r._corrupt_record is not None for r in rows) == 1
        assert sorted(r.a for r in rows if r.a is not None) == [1, 2]
        strict = (
            spark.read.schema("a bigint, b string")
            .option("mode", "FAILFAST")
            .json(f"{tmp}/data.json")
        )
        with pytest.raises(Exception):
            strict.collect()
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_table_reduces_files_preserves_rows(spark, sf_dir):
    """Small-files compaction: 32 tiny files rewritten into the
    size-derived file count, content identical."""
    import glob

    from decisions_kinesis_spark.sources.formats import compact_table

    ev = load_table(spark, "events", sf_dir)
    tmp = tempfile.mkdtemp(prefix="dks-compact-")
    try:
        ev.repartition(32).write.parquet(f"{tmp}/small")
        assert len(glob.glob(f"{tmp}/small/part-*.parquet")) == 32
        n = compact_table(spark, f"{tmp}/small", f"{tmp}/big",
                          target_file_bytes=64 * 1024 * 1024)
        out_files = glob.glob(f"{tmp}/big/part-*.parquet")
        assert len(out_files) == n
        assert n < 32  # tiny dataset → far fewer files than inputs
        back = spark.read.parquet(f"{tmp}/big")
        assert back.count() == ev.count()
        assert sorted(r.event_id for r in back.select("event_id").collect()) == sorted(
            r.event_id for r in ev.select("event_id").collect()
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_compact_table_refuses_in_place(spark, sf_dir):
    """In-place compaction would overwrite the directory the lazy read
    is about to scan — must be refused."""
    from decisions_kinesis_spark.sources.formats import compact_table

    tmp = tempfile.mkdtemp(prefix="dks-inplace-")
    try:
        load_table(spark, "nation", sf_dir).write.parquet(f"{tmp}/d")
        with pytest.raises(ValueError, match="in place"):
            compact_table(spark, f"{tmp}/d", f"{tmp}/d")
        # nested destination writes into the directory being read
        with pytest.raises(ValueError, match="nested"):
            compact_table(spark, f"{tmp}/d", f"{tmp}/d/compacted")
        # enclosing destination would clobber the source on overwrite
        with pytest.raises(ValueError, match="nested"):
            compact_table(spark, f"{tmp}/d", tmp)
        # source untouched
        assert spark.read.parquet(f"{tmp}/d").count() > 0
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def test_salted_aggregate_equals_direct(spark, sf_dir):
    li = load_table(spark, "lineitem", sf_dir)
    salted = salted_aggregate(
        li,
        keys=["l_returnflag"],
        aggs={"sum_qty": F.sum("l_quantity"), "n": F.count("*")},
    )
    direct = li.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("sum_qty"), F.count("*").alias("n")
    )
    s = {r.l_returnflag: (round(r.sum_qty, 6), r.n) for r in salted.collect()}
    d = {r.l_returnflag: (round(r.sum_qty, 6), r.n) for r in direct.collect()}
    assert s == d


def test_salted_join_equals_direct(spark, sf_dir):
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    big, small, keys = salt_join_keys(orders, cust, "o_custkey")
    salted = big.join(small, keys).groupBy("c_mktsegment").count()
    direct = orders.join(cust, "o_custkey").groupBy("c_mktsegment").count()
    assert sorted(map(tuple, salted.collect())) == sorted(
        map(tuple, direct.collect())
    )


def test_aqe_skew_join_split_equals_direct(spark):
    """AQE's OWN skew-join rewrite — the engine-native complement to
    the explicit salting helpers above: with a 90%-one-key build side,
    the runtime re-plan splits the oversized partition
    (``SortMergeJoin(skew=true)`` + ``AQEShuffleRead coalesced and
    skewed`` in the final adaptive plan) instead of letting one task
    carry 90% of the shuffle.  Thresholds are production-scale, so the
    test pins them down to engage at test sizes; at 100 TB the
    defaults fire on their own.  Row counts must equal the unsplit
    join."""
    keep = {
        k: spark.conf.get(k, None)
        for k in (
            "spark.sql.autoBroadcastJoinThreshold",
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        )
    }
    big = (
        spark.range(0, 200_000)
        .withColumn(
            "k",
            F.when(F.col("id") % 10 < 9, F.lit(1)).otherwise(
                F.col("id") % 1000
            ),
        )
        .withColumn("pad", F.expr("repeat('x', 40)"))
    )
    dim = (
        spark.range(0, 1000)
        .withColumnRenamed("id", "k")
        .withColumn("v", F.col("k") * 2)
    )
    baseline = big.join(dim, "k").count()
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionFactor", "1.0"
        )
        spark.conf.set(
            "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
            "16KB",
        )
        spark.conf.set(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes", "8KB"
        )
        joined = big.join(dim, "k")
        rows = len(joined.collect())
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "skew=true" in plan and "isFinalPlan=true" in plan
        assert rows == baseline == 200_000
    finally:
        for k, v in keep.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
