"""Data-layout operators: multi-dimensional clustering for file skipping.

At 100 TB the scan cost of every query is decided before it runs — by
how the writer laid rows into files and what min/max zone maps those
files expose (the Delta/Iceberg ``OPTIMIZE ZORDER`` story).  This
module implements Z-order (Morton) clustering as a *measurable*
operator: interleave the bits of two normalized dimensions, range-split
the sort order into files, and report each file's per-dimension min/max
zone map — for BOTH the z-ordered layout and the single-key linear
layout, side by side, so the pruning trade (linear: perfect on the sort
key, useless on the other; z-order: good on both) is visible in the
result itself and assertable by tests.

Everything is exact bigint arithmetic (normalize → interleave → global
position → equal-height tiling), so the DuckDB oracle replays the
identical formula with no tolerance.  Global positions use the
SCALABLE distributed-rank pattern (range-partitioned sort +
per-partition cumulative offsets + partitioned row_number), never a
single-partition window — the shape that still works when the table is
100 TB; the oracle's plain ``row_number() OVER (ORDER BY …)`` computes
the same total order single-node.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from decisions_kinesis_spark.functions.ordering import range_prefix
from decisions_kinesis_spark.sources.tables import load_table

_Z_BITS = 10  # 10 bits/dim → 20-bit Morton key
_N_FILES = 64


def _zexpr(sa: str, sb: str, divop: str) -> str:
    """Morton interleave of two pre-normalized 0..2^bits-1 ints as a
    pure arithmetic expression — ``divop`` is ``div`` (Spark) or ``//``
    (DuckDB); ``%`` and ``*`` agree between the engines on the
    non-negative ints used here."""
    terms = []
    for i in range(_Z_BITS):
        terms.append(f"((({sa} {divop} {1 << i}) % 2) * {1 << (2 * i)})")
        terms.append(f"((({sb} {divop} {1 << i}) % 2) * {1 << (2 * i + 1)})")
    return " + ".join(terms)


def _normexpr(col: str, lo: str, hi: str, divop: str) -> str:
    """Scale col into 0..2^bits-1 with exact integer math; the span
    guard keeps a constant column (degenerate stats) at bucket 0."""
    top = (1 << _Z_BITS) - 1
    return (
        f"(({col} - {lo}) * {top}) {divop} "
        f"(CASE WHEN {hi} > {lo} THEN {hi} - {lo} ELSE 1 END)"
    )


def layout_zorder_vs_linear(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map comparison of two physical layouts of ``lineitem`` over
    the dimensions (l_orderkey, l_partkey): ``linear`` = sorted by
    orderkey (what a naive writer produces), ``zorder`` = sorted by the
    20-bit Morton key of both dimensions.  Rows: (layout, file_id,
    n_rows, min/max of each dimension) for 64 equal-height files per
    layout — the min/max zone maps a scan planner would consult.

    A point/range predicate on l_partkey prunes almost nothing under
    ``linear`` (every file spans the full part range) but most files
    under ``zorder``, while orderkey pruning stays strong — the
    multi-dimensional clustering trade, measured not asserted
    (tests/test_operators.py quantifies both span ratios).

    Implementation (one pass for both layouts): each row is emitted
    twice, tagged with its layout and that layout's sort key, then the
    union gets ONE global total order (layout major, key minor) via
    the scalable distributed-rank pattern (shared helper
    ``functions/ordering.range_prefix``):

    1. range-repartition on (layout, k1, k2, k3) — the same shuffle a
       real layout-optimize write pays — then localCheckpoint: the
       range partitioner RE-SAMPLES per job, so without freezing the
       partition assignment the count job and the final job can see
       DIFFERENT partition boundaries (observed: a phantom 65th file);
    2. per-partition row counts → cumulative offsets (a ≤|partitions|-
       row driver scalar, the documented bounded-collect class);
    3. global position = offset + row_number within the partition
       (partitioned window — never a single-partition WindowExec);
       per-layout position subtracts the layout's start offset (the
       layout tag is the major sort key, so each layout's rows are
       contiguous and n rows long), then
       ``file_id = (pos-1)·k div n + 1``.

    The explicit formula (not ntile) keeps the Spark and DuckDB
    tilings identical by construction.  Normalization bounds are a
    1-row broadcast; zone maps are one map-side-combining agg over
    2·64 keys.
    """
    li = load_table(spark, "lineitem", sf_dir).select(
        F.col("l_orderkey").alias("o"),
        F.col("l_partkey").alias("p"),
        F.col("l_linenumber").alias("ln"),
    )
    bounds = li.agg(
        F.min("o").alias("min_o"),
        F.max("o").alias("max_o"),
        F.min("p").alias("min_p"),
        F.max("p").alias("max_p"),
    )
    z = (
        li.crossJoin(F.broadcast(bounds))
        .withColumn("sa", F.expr(_normexpr("o", "min_o", "max_o", "div")))
        .withColumn("sb", F.expr(_normexpr("p", "min_p", "max_p", "div")))
        .withColumn("z", F.expr(_zexpr("sa", "sb", "div")))
        .select("o", "p", "ln", "z")
    )
    tagged = z.select(
        F.lit("zorder").alias("layout"),
        F.col("z").alias("k1"),
        F.col("o").cast("bigint").alias("k2"),
        F.col("ln").cast("bigint").alias("k3"),
        "o",
        "p",
    ).unionByName(
        z.select(
            F.lit("linear").alias("layout"),
            F.col("o").cast("bigint").alias("k1"),
            F.col("ln").cast("bigint").alias("k2"),
            F.lit(0).cast("bigint").alias("k3"),
            "o",
            "p",
        )
    )
    order_cols = ["layout", "k1", "k2", "k3"]
    part, off_df, total, _ = range_prefix(tagged, order_cols, 32)
    n = total // 2  # rows per layout
    w = Window.partitionBy("_pid").orderBy(*order_cols)
    tiled = (
        part.join(F.broadcast(off_df), "_pid")
        .withColumn("_pos", F.row_number().over(w) + F.col("_row_off"))
        # 'linear' sorts before 'zorder', so linear occupies global
        # positions 1..n and zorder n+1..2n
        .withColumn(
            "_lpos",
            F.col("_pos")
            - F.when(F.col("layout") == "zorder", F.lit(n)).otherwise(
                F.lit(0)
            ),
        )
        .withColumn("file_id", F.expr(f"((_lpos - 1) * {_N_FILES}) div {n} + 1"))
    )
    return tiled.groupBy("layout", "file_id").agg(
        F.count("*").alias("n_rows"),
        F.min("o").alias("min_o"),
        F.max("o").alias("max_o"),
        F.min("p").alias("min_p"),
        F.max("p").alias("max_p"),
    )


def _layout_oracle() -> str:
    norm_a = _normexpr("o", "b.min_o", "b.max_o", "//")
    norm_b = _normexpr("p", "b.min_p", "b.max_p", "//")
    return f"""
        WITH li AS MATERIALIZED (
            SELECT l_orderkey AS o, l_partkey AS p, l_linenumber AS ln
            FROM lineitem
        ),
        b AS (
            SELECT min(o) AS min_o, max(o) AS max_o,
                   min(p) AS min_p, max(p) AS max_p
            FROM li
        ),
        n AS (SELECT count(*)::BIGINT AS total FROM li),
        z AS MATERIALIZED (
            SELECT o, p, ln, sa, sb, {_zexpr('sa', 'sb', '//')} AS z
            FROM (
                SELECT o, p, ln,
                       {norm_a} AS sa,
                       {norm_b} AS sb
                FROM li, b
            )
        ),
        tiled AS (
            SELECT 'zorder' AS layout,
                   ((row_number() OVER (ORDER BY z, o, ln) - 1)
                    * {_N_FILES}) // total + 1 AS file_id,
                   o, p
            FROM z, n
            UNION ALL
            SELECT 'linear' AS layout,
                   ((row_number() OVER (ORDER BY o, ln) - 1)
                    * {_N_FILES}) // total + 1 AS file_id,
                   o, p
            FROM z, n
        )
        SELECT layout, file_id, count(*)::BIGINT AS n_rows,
               min(o) AS min_o, max(o) AS max_o,
               min(p) AS min_p, max(p) AS max_p
        FROM tiled
        GROUP BY layout, file_id
    """


QUERIES = {
    "layout_zorder_vs_linear": layout_zorder_vs_linear,
}

ORACLES = {
    "layout_zorder_vs_linear": _layout_oracle(),
}
