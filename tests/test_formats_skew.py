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
