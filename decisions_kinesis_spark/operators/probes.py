"""Driver-hash conformance probes (VERDICT r7 item 3).

The correctness gate compares a Spark result against a DuckDB oracle by
value hash, and the local mimic (``tools/oracle_check.py``) folds type
families when canonicalizing schemas.  Every fold the mimic PERFORMS is
a permissive assumption that can hide a driver red (exactly what
happened in r7: the HUGEINT≡decimal(38,0) fold, inferred in r5, was
disproven by the ``customer_revenue_gini``/``orders_cohort_ltv``
hash-fails).  These probes turn each remaining permissive fold into a
one-row, trivially cheap query whose Spark side and oracle side
deliberately use DIFFERENT physical types of the SAME family — so the
driver itself certifies (or refutes) the fold every time the probe
gates.  Folds the mimic REFUSES (date vs timestamp, float vs decimal,
HUGEINT vs anything) need no probe: strictness in the mimic can only
cause false local REDs, never a false local green.

Probed folds (mimic behavior in ``tools/oracle_check.py::canon_duck`` /
``canon_spark``):

- int32 ≡ int64 (both directions) — relied on wherever a Spark INT
  column meets a DuckDB BIGINT ``count(*)`` or cast;
- float32 ≡ float64 — relied on by the ``float`` family fold;
- NULL values inside aggregates and as bare typed literals — relied on
  by every empty-group / skipped-bucket contract;
- decimal→string rendering agreement — the digit-string transport the
  ×10⁴-money queries use for unbounded exact totals.

ADJUDICATED r8: the original ``probe_hash_decimal_precision`` (Spark
DECIMAL(12,4) vs oracle DECIMAL(38,4), same scale, same values) gated
RED, alongside the three money queries whose both sides were exactly
DECIMAL(38,0) — so the driver hash rejects EVERY decimal output
column, not just precision mixes (mechanism confirmed locally:
``duckdb .df()`` converts DECIMAL to float64 while Spark's toPandas
ships ``Decimal`` objects).  The fold was removed from the mimic
(``oracle_check.py`` now hard-fails any decimal output family on
either side), every decimal output was re-spelled (bigint when
provably bounded, digit string when corpus-scale), and the probe was
replaced by ``probe_hash_decimal_string_transport``.  The int-width,
float-width, NULL and temporal probes gated GREEN in r8 — those folds
are now driver-certified, not inferred.

A sixth probe pins the temporal VALUE path (NTZ µs timestamps + dates
derived through ``load_table``'s normalization) on a one-row result so
a future driver-environment change in timestamp handling surfaces here
first, not in a 3600-row gap-fill diff.

Values are constants of the tiny ``region`` table (5 rows at every SF)
or ``min()``s over ``events``, so each probe costs one metadata-scale
scan.  Each probe is expected GREEN; a red row in CORRECTNESS means the
driver hash is stricter than the mimic's fold, and the fold must be
removed from ``canon_*`` (the r7 HUGEINT lesson applied proactively).

Reference parity note: the reference C# connector has no relational
surface (Decisions.Kinesis — KinesisThreadJobs.cs processes records,
KinesisMessageQueue.cs validates config); these probes belong to the
engine's own correctness-gate contract, not to reference coverage.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..sources.tables import load_table


def probe_hash_int32_vs_int64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark INT vs oracle BIGINT, same value — pins the int-width fold
    in the spark-narrow direction (r5 evidence, now a standing probe)."""
    return load_table(spark, "region", sf_dir).agg(
        F.expr("cast(count(*) as int)").alias("v"),
        F.expr("cast(min(r_regionkey) as int)").alias("lo"),
    )


def probe_hash_int64_vs_int32(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark BIGINT vs oracle INTEGER, same value — the reverse width
    direction (a hash that serializes physical width fails exactly one
    of the two directions only if it also pads; probe both)."""
    return load_table(spark, "region", sf_dir).agg(
        F.expr("cast(count(*) as bigint)").alias("v"),
        F.expr("cast(max(r_regionkey) as bigint)").alias("hi"),
    )


def probe_hash_decimal_string_transport(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Pins the DIGIT-STRING transport every ×10⁴-money query now uses
    for unbounded exact totals.  Its predecessor
    (``probe_hash_decimal_precision``, Spark DECIMAL(12,4) vs oracle
    DECIMAL(38,4)) gated RED in r8 — and so did the three queries whose
    both sides were exactly DECIMAL(38,0) — establishing that NO
    decimal output column survives the driver comparator (DuckDB's
    pandas transport folds DECIMAL to float64, Spark ships Decimal
    objects; verified locally via ``duckdb.df()`` dtypes).  The safe
    envelope is the decimal's string rendering, which both engines
    produce identically: scale-0 bare digits, scale>0 padded to scale,
    ``-`` sign, no exponent.  This probe runs that rendering through
    deliberately DIFFERENT interior physical types (Spark
    DECIMAL(12,4)/DECIMAL(38,0) vs DuckDB DECIMAL(38,4)/HUGEINT) so a
    driver-side change in either engine's decimal→string path surfaces
    on one row."""
    return load_table(spark, "region", sf_dir).agg(
        F.expr(
            "cast(cast(count(*) as decimal(12,4)) as string)"
        ).alias("s4"),
        F.expr(
            "cast(cast(sum(r_regionkey) as decimal(38,0)) as string)"
        ).alias("s0"),
        F.expr(
            "cast(cast(-7 as decimal(20,2)) as string)"
        ).alias("neg"),
    )


def probe_hash_float32_vs_float64(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark FLOAT (32-bit) vs oracle DOUBLE, value 2.5 — exactly
    representable in both widths so only the physical type can differ.
    Pins the ``float`` family fold.  The cast must wrap the WHOLE
    expression: Spark's Divide coerces float operands to double, so
    ``cast(x as float) / cast(y as float)`` is DOUBLE and would make
    this probe vacuously compare double to double."""
    return load_table(spark, "region", sf_dir).agg(
        F.expr("cast(count(*) / 2 as float)").alias("v"),
    )


def probe_hash_null_in_aggregates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global aggregate over an emptied relation: sum → NULL, count → 0,
    plus a bare typed-NULL string column — pins that NULL hashes
    identically through Arrow on both engines for numeric and string
    slots (every skipped-bucket / empty-group contract rests on it)."""
    return (
        load_table(spark, "region", sf_dir)
        .where("r_regionkey < 0")
        .agg(
            F.expr("cast(sum(r_regionkey) as bigint)").alias("s_null"),
            F.count("*").alias("n"),
            F.expr("cast(null as string)").alias("s_str"),
        )
    )


def probe_hash_temporal_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row temporal probe through the production path: min event
    timestamp hour-truncated (the window-family convention: Spark
    TimestampType vs oracle ``make_timestamp(µs)``) and its DATE — so a
    driver-environment change in timestamp conversion shows up on one
    row before it shows up in a 3600-row window diff."""
    ev = load_table(spark, "events", sf_dir)
    return ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("h_min"),
        F.expr("cast(min(ts) as date)").alias("d_min"),
    )


QUERIES = {
    "probe_hash_int32_vs_int64": probe_hash_int32_vs_int64,
    "probe_hash_int64_vs_int32": probe_hash_int64_vs_int32,
    "probe_hash_decimal_string_transport": probe_hash_decimal_string_transport,
    "probe_hash_float32_vs_float64": probe_hash_float32_vs_float64,
    "probe_hash_null_in_aggregates": probe_hash_null_in_aggregates,
    "probe_hash_temporal_values": probe_hash_temporal_values,
}

ORACLES = {
    # deliberately BIGINT where Spark emits INT
    "probe_hash_int32_vs_int64": """
        SELECT count(*)::BIGINT AS v, min(r_regionkey)::BIGINT AS lo
        FROM region
    """,
    # deliberately INTEGER where Spark emits BIGINT
    "probe_hash_int64_vs_int32": """
        SELECT count(*)::INTEGER AS v, max(r_regionkey)::INTEGER AS hi
        FROM region
    """,
    # deliberately different interior types (DECIMAL(38,4)/HUGEINT vs
    # Spark DECIMAL(12,4)/DECIMAL(38,0)) — only the string rendering
    # crosses the boundary
    "probe_hash_decimal_string_transport": """
        SELECT count(*)::DECIMAL(38,4)::VARCHAR AS s4,
               sum(r_regionkey)::HUGEINT::VARCHAR AS s0,
               (-7)::DECIMAL(9,2)::VARCHAR AS neg
        FROM region
    """,
    # deliberately DOUBLE where Spark emits FLOAT (value 2.5 exact)
    "probe_hash_float32_vs_float64": """
        SELECT count(*)::DOUBLE / 2 AS v FROM region
    """,
    "probe_hash_null_in_aggregates": """
        SELECT sum(r_regionkey)::BIGINT AS s_null,
               count(*)::BIGINT AS n,
               NULL::VARCHAR AS s_str
        FROM region WHERE r_regionkey < 0
    """,
    "probe_hash_temporal_values": """
        SELECT make_timestamp((epoch_us(min(ts)) // 3600000000)
                              * 3600000000) AS h_min,
               min(ts)::DATE AS d_min
        FROM events
    """,
}
