"""Reference-capability queries: payload filtering + envelope projection.

These are the operators the reference actually has (SURVEY.md §2
D1-D5, F1-F2), run over the driver's ``events`` table as the batch
stand-in for a Kinesis stream (FIXTURES.md envelope mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from decisions_kinesis_spark.config import FilterVerb, KinesisQueueConfig, PayloadFilter
from decisions_kinesis_spark.functions.filters import apply_payload_filters
from decisions_kinesis_spark.functions.parallel import ensure_parallelism
from decisions_kinesis_spark.sources.tables import load_table


def flagship_premium_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship scenario (README.md:361-381): filter a
    stream on a JSON payload property + an attribute, AND-combined,
    then project the record envelope.

    Semantics: ``props.k > '50'`` is the *lexicographic* Greater Than
    verb (KinesisThreadJobs.cs:778-779) — '6' > '50' but '100' < '50'.
    The whole predicate compiles to one codegen'd Filter over the scan.
    """
    cfg = KinesisQueueConfig(
        stream_name="events",
        payload_filters=[PayloadFilter("k", FilterVerb.GREATER_THAN, "50")],
        use_or=False,
    ).require_valid()
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "purchase")
    out = apply_payload_filters(ev, "props", cfg.payload_filters, cfg.use_or)
    return out.select(
        F.col("event_id").alias("sequence_number"),
        F.col("user_id").cast("string").alias("partition_key"),
        F.col("ts").alias("arrival_ts"),
        F.get_json_object(F.col("props"), "$.k").alias("k_value"),
    )


def payload_filter_or_verbs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OR combinator over three verbs on the same payload property
    (missing-property → skip rule folds to False per SURVEY §2)."""
    filters = [
        PayloadFilter("k", FilterVerb.STARTS_WITH, "9"),
        PayloadFilter("k", FilterVerb.ENDS_WITH, "3"),
        PayloadFilter("k", FilterVerb.EQUALS, "42"),
    ]
    # the verb predicates JSON-parse every row (no pushable prefilter);
    # spread the single-split fixture scan across cores (no-op at scale)
    ev = ensure_parallelism(load_table(spark, "events", sf_dir))
    return apply_payload_filters(ev, "props", filters, use_or=True).select(
        "event_id", "event_type", F.get_json_object("props", "$.k").alias("k_value")
    )


def payload_filter_ci_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Case-insensitive verbs + AND band predicate on the event_type
    attribute treated as payload (Equals CI / GTE / LTE family)."""
    filters = [
        PayloadFilter("k", FilterVerb.GREATER_THAN_OR_EQUAL, "2"),
        PayloadFilter("k", FilterVerb.LESS_THAN_OR_EQUAL, "7"),
        PayloadFilter("k", FilterVerb.NOT_EQUALS, "42"),
    ]
    # cheap attribute filter first, then spread the surviving rows for
    # the JSON verb work (lower() is not scan-pushable, so nothing is
    # lost; no-op at scale)
    ev = ensure_parallelism(
        load_table(spark, "events", sf_dir).filter(
            F.lower(F.col("event_type")) == "error"
        )
    )
    return apply_payload_filters(ev, "props", filters, use_or=False).select(
        "event_id", F.get_json_object("props", "$.k").alias("k_value")
    )


def payload_filter_contains_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CONTAINS / CONTAINS_CI / ENDS_WITH_CI / LESS_THAN / LESS_THAN_CI
    verbs over a synthesized JSON payload (attributes embedded via
    to_json), completing oracle coverage of the 18-verb table
    (KinesisThreadJobs.cs:746-805)."""
    filters = [
        PayloadFilter("et", FilterVerb.CONTAINS_CI, "URCH"),
        PayloadFilter("et", FilterVerb.ENDS_WITH_CI, "ASE"),
        PayloadFilter("et", FilterVerb.CONTAINS, "chas"),
        PayloadFilter("k", FilterVerb.LESS_THAN, "5"),  # lexicographic
        PayloadFilter("k", FilterVerb.LESS_THAN_OR_EQUAL_CI, "4~"),
    ]
    # The synthesized payload goes through explode(array(...)) — a
    # 1-row Generate — so it materializes ONCE per row as a plan
    # attribute.  As a plain projected column, filter pushdown through
    # the projection inlined the to_json(struct(...)) expression into
    # every consumer: the physical plan evaluated it 10x per row (5
    # verb extractions + validity + output projection, each re-running
    # the inner get_json_object) — measured 2.0 s vs 0.4 s at sf0.1.
    # Row count and values are untouched (the array is always 1
    # non-null element); the filter semantics still run through
    # apply_payload_filters on the JSON text exactly as before.
    ev = ensure_parallelism(load_table(spark, "events", sf_dir)).select(
        "event_id",
        "event_type",
        F.explode(
            F.array(
                F.to_json(
                    F.struct(
                        F.col("event_type").alias("et"),
                        F.get_json_object("props", "$.k").alias("k"),
                    )
                )
            )
        ).alias("payload"),
    )
    return apply_payload_filters(ev, "payload", filters, use_or=False).select(
        "event_id",
        "event_type",
        F.get_json_object("payload", "$.k").alias("k_value"),
    )


def envelope_metadata_projection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 metadata projection over the envelope mapping (KinesisUtils.cs:146-163)."""
    ev = load_table(spark, "events", sf_dir)
    return ev.select(
        F.col("user_id").cast("string").alias("partitionKey"),
        F.col("event_id").cast("string").alias("sequenceNumber"),
        F.col("ts").alias("approximateArrivalTimestamp"),
    )


QUERIES = {
    "flagship_premium_filter": flagship_premium_filter,
    "payload_filter_or_verbs": payload_filter_or_verbs,
    "payload_filter_ci_band": payload_filter_ci_band,
    "payload_filter_contains_ci": payload_filter_contains_ci,
    "envelope_metadata_projection": envelope_metadata_projection,
}

ORACLES = {
    "flagship_premium_filter": """
        SELECT event_id AS sequence_number,
               user_id::VARCHAR AS partition_key,
               ts AS arrival_ts,
               json_extract_string(props, '$.k') AS k_value
        FROM events
        WHERE event_type = 'purchase'
          AND json_extract_string(props, '$.k') > '50'
    """,
    "payload_filter_or_verbs": """
        SELECT event_id, event_type,
               json_extract_string(props, '$.k') AS k_value
        FROM events
        WHERE starts_with(json_extract_string(props, '$.k'), '9')
           OR ends_with(json_extract_string(props, '$.k'), '3')
           OR json_extract_string(props, '$.k') = '42'
    """,
    "payload_filter_ci_band": """
        SELECT event_id, json_extract_string(props, '$.k') AS k_value
        FROM events
        WHERE lower(event_type) = 'error'
          AND json_extract_string(props, '$.k') >= '2'
          AND json_extract_string(props, '$.k') <= '7'
          AND json_extract_string(props, '$.k') <> '42'
    """,
    "payload_filter_contains_ci": """
        SELECT event_id, event_type,
               json_extract_string(props, '$.k') AS k_value
        FROM events
        WHERE contains(lower(event_type), lower('URCH'))
          AND ends_with(lower(event_type), lower('ASE'))
          AND contains(event_type, 'chas')
          AND json_extract_string(props, '$.k') < '5'
          AND lower(json_extract_string(props, '$.k')) <= lower('4~')
    """,
    "envelope_metadata_projection": """
        SELECT user_id::VARCHAR AS partitionKey,
               event_id::VARCHAR AS sequenceNumber,
               ts AS approximateArrivalTimestamp
        FROM events
    """,
}
