"""Event-time window extensions (SURVEY.md §7 M6).

The reference has NO event-time windows (SURVEY.md §2: the only time
notion is arrival timestamp as metadata).  These are the engine's
extension surface: tumbling / sliding / session windows over
``events.ts``, expressed with Spark's native ``window()`` /
``session_window()`` operators in batch mode (identical semantics to
the streaming versions — same expressions, plus a watermark, covered
in tests/test_streaming_windows.py).

DuckDB oracles rebuild the window grids arithmetically (epoch-µs
integer math), proving the window-assignment semantics — not just row
counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from decisions_kinesis_spark.functions.rounding import fl4
from decisions_kinesis_spark.sources.tables import load_table


def window_tumbling_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows: counts + rounded sums per event_type.

    Scale: window assignment is a pure projection (one window per row);
    the aggregation is an ordinary hash agg on (window, type).
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(
            F.count("*").alias("n"),
            F.round(F.sum("value"), 4).alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def window_sliding_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in 2
    overlapping windows.

    Scale: slide explode multiplies rows by size/slide (2×) before the
    hash agg — the standard cost model; wider overlap ratios should
    switch to per-grid aggregation + rollup merge.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "n",
        )
    )


def window_session_bounds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Native session windows (5-min gap) per user: bounds + event count.

    Spark semantics: session end = last event + gap; sessions merge
    while each event arrives within gap of the session's current end.
    The oracle rebuilds identical sessions with lag + running flag-sum.
    """
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy("user_id", F.session_window("ts", "5 minutes").alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )


def join_time_range_purchase_errors(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The stream-stream join expression run in batch mode (the exact
    DataFrame expression is batch/stream dual — the streaming variant
    with watermarks is tests/test_streaming_windows.py)."""
    from decisions_kinesis_spark.streaming.windows import (
        purchase_error_correlation_stream,
    )

    events = load_table(spark, "events", sf_dir)
    return purchase_error_correlation_stream(events)


def join_time_range_purchase_errors_left(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch dual of the streaming LEFT OUTER stream-stream join
    (streaming variant: streaming/windows.py
    purchase_error_left_join_stream, tested for watermark-consistent
    equality) — every purchase, with correlated error or nulls."""
    from decisions_kinesis_spark.streaming.windows import (
        purchase_error_left_join_stream,
    )

    events = load_table(spark, "events", sf_dir)
    return purchase_error_left_join_stream(events)


def join_time_range_purchase_errors_full(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Batch dual of the streaming FULL OUTER stream-stream join
    (streaming/windows.py purchase_error_full_join_stream)."""
    from decisions_kinesis_spark.streaming.windows import (
        purchase_error_full_join_stream,
    )

    events = load_table(spark, "events", sf_dir)
    return purchase_error_full_join_stream(events)


def events_funnel_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Signup→purchase conversion funnel: per signed-up user, the first
    purchase at-or-after their first signup and the hours to convert.

    Shape: two filtered aggregations + a left join + a min-over-match —
    the standard event-funnel plan (each step shuffles on user_id only;
    at 100 TB the same key co-locates all steps).  Time math is done in
    integer microseconds (unix_micros ↔ epoch_us) so both engines agree
    exactly.
    """
    ev = load_table(spark, "events", sf_dir)
    signups = (
        ev.filter(F.col("event_type") == "signup")
        .groupBy("user_id")
        .agg(F.min("ts").alias("signup_ts"))
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"), F.col("ts").alias("p_ts")
    )
    first_purchase = (
        signups.join(
            purchases,
            (F.col("user_id") == F.col("p_user"))
            & (F.col("p_ts") >= F.col("signup_ts")),
            "left",
        )
        .groupBy("user_id", "signup_ts")
        .agg(F.min("p_ts").alias("first_purchase_ts"))
    )
    return first_purchase.select(
        "user_id",
        "signup_ts",
        "first_purchase_ts",
        F.col("first_purchase_ts").isNotNull().alias("converted"),
        F.round(
            (
                F.unix_micros(F.col("first_purchase_ts"))
                - F.unix_micros(F.col("signup_ts"))
            )
            / 3.6e9,
            4,
        ).alias("hours_to_convert"),
    )


def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort-retention table: users grouped by the ISO week of
    their FIRST activity (the cohort), and for each later week, how
    many of that cohort were active again — the standard product-
    analytics retention triangle, here over the events stream.
    ``retention_ppm`` is the exact integer-scaled retained share.

    Cross-engine: week truncation is ISO-Monday in both engines and
    cast to DATE (the date_trunc return-type gotcha in NOTES.md); the
    week offset is a day difference divided by 7 — exact, since both
    dates are week starts.

    Scale: activity distincts on (user, week); the cohort min and the
    retention join both key on user_id — the SAME shuffle key, so at
    100 TB every step after the distinct is co-partitioned; the
    cohort-size frame is |weeks| rows, broadcast back.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "user_id", F.to_date(F.date_trunc("week", F.col("ts"))).alias("wk")
    )
    act = ev.distinct()
    cohort = act.groupBy("user_id").agg(F.min("wk").alias("cw"))
    sizes = cohort.groupBy("cw").agg(F.count("*").alias("cohort_users"))
    ret = (
        act.join(cohort, "user_id")
        .withColumn(
            "week_offset", F.expr("cast(datediff(wk, cw) div 7 as bigint)")
        )
        .groupBy("cw", "week_offset")
        .agg(F.count("*").alias("n_active"))
    )
    return ret.join(F.broadcast(sizes), "cw").select(
        F.col("cw").alias("cohort_week"),
        "week_offset",
        "n_active",
        "cohort_users",
        F.expr("(n_active * 1000000) div cohort_users").alias(
            "retention_ppm"
        ),
    )


def events_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-filling with last-observation-carried-
    forward (the TimescaleDB ``time_bucket_gapfill`` + ``locf``
    feature class): hourly buckets per event_type, a DENSE time grid
    spanning each type's observed range (missing hours materialized
    with zero counts), and the bucket average carried forward across
    gaps — what a monitoring/feature pipeline reads when it needs a
    value for EVERY tick, not just ticks with data.

    Determinism: bucket averages use the money-sum discipline (exact
    DECIMAL(18,4) sum, one double division, round 4); the LOCF is
    last-non-null over a bucket-ordered frame — deterministic because
    bucket keys are unique per type.

    Scale: the grid is |types| × |hours in span| rows — generated from
    a |types|-row span frame, NEVER by exploding the corpus; the only
    per-event work is the bucket aggregation (map-side combining).
    The LOCF window partitions by event_type over grid-sized (not
    corpus-sized) frames; per-type span windows at 100 TB are bounded
    by calendar hours, not event counts.
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bkt"), "value"
    )
    agg = ev.groupBy("event_type", "bkt").agg(
        F.count("*").alias("n_events"),
        # floor-based 4dp round (NOT F.round): the exact decimal sum
        # divided by a small count lands on .xxxx5 halves — see
        # functions/rounding.py
        fl4(
            F.expr("cast(sum(cast(value as decimal(18,4))) as double)")
            / F.count("*")
        ).alias("avg_value"),
    )
    span = agg.groupBy("event_type").agg(
        F.min("bkt").alias("b0"), F.max("bkt").alias("b1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(b0, b1, interval 1 hour)")).alias("bkt"),
    )
    j = grid.join(agg, ["event_type", "bkt"], "left")
    w = (
        Window.partitionBy("event_type")
        .orderBy("bkt")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    return j.select(
        "event_type",
        F.col("bkt").alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        "avg_value",
        F.last("avg_value", ignorenulls=True).over(w).alias("value_locf"),
        F.col("n_events").isNull().alias("gap_filled"),
    )


def events_gapfill_interp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable gap-filling with LINEAR INTERPOLATION — the
    ``interpolate()`` companion to ``events_gapfill_locf``: hourly
    buckets per event_type on the same dense per-type grid, but a gap
    hour gets the straight line between its surrounding OBSERVED
    buckets instead of a carried-forward step — what a feature
    pipeline reads when the quantity is a level (queue depth, price)
    rather than a rate.

    Exact integer arithmetic end-to-end: bucket means are ×10⁴-
    quantized to bigint (the Theil–Sen discipline), grid ticks are the
    per-type dense rank t, and the interpolated value is
    ``y_prev + (y_next − y_prev)·(t − t_prev) div (t_next − t_prev)``
    with truncating division (both engines truncate toward zero), so
    the DuckDB oracle matches to the digit — no float lerp.  Grid
    edges cannot dangle (the span is anchored at observed buckets),
    but the one-sided fallbacks are kept and replayed by the oracle so
    an externally-anchored grid stays well-defined.

    Scale: identical topology to the LOCF variant — the corpus
    contributes only the map-side-combining hourly aggregation; the
    grid, the four IGNORE NULLS edge-extension windows, and the
    interpolation all run on |types| × |span hours| rows, bounded by
    the calendar at any data size.
    """
    from pyspark.sql import Window

    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("bkt"), "value"
    )
    agg = ev.groupBy("event_type", "bkt").agg(
        F.count("*").alias("n_events"),
        F.expr(
            "cast(floor(cast(sum(cast(value as decimal(18,4))) as double)"
            " / count(*) * 10000 + 0.5) as bigint)"
        ).alias("y"),
    )
    span = agg.groupBy("event_type").agg(
        F.min("bkt").alias("b0"), F.max("bkt").alias("b1")
    )
    grid = span.select(
        "event_type",
        F.explode(F.expr("sequence(b0, b1, interval 1 hour)")).alias("bkt"),
    )
    j = grid.join(agg, ["event_type", "bkt"], "left")
    wt = Window.partitionBy("event_type").orderBy("bkt")
    j = j.withColumn("t", F.row_number().over(wt).cast("bigint")).withColumn(
        "obs_t", F.expr("if(y is not null, t, cast(null as bigint))")
    )
    wprev = wt.rowsBetween(Window.unboundedPreceding, 0)
    wnext = wt.rowsBetween(0, Window.unboundedFollowing)
    filled = (
        j.withColumn("y_prev", F.last("y", ignorenulls=True).over(wprev))
        .withColumn("t_prev", F.last("obs_t", ignorenulls=True).over(wprev))
        .withColumn("y_next", F.first("y", ignorenulls=True).over(wnext))
        .withColumn("t_next", F.first("obs_t", ignorenulls=True).over(wnext))
    )
    return filled.select(
        "event_type",
        F.col("bkt").alias("bucket_ts"),
        F.coalesce("n_events", F.lit(0)).alias("n_events"),
        F.col("y").alias("avg_q4"),
        F.expr(
            "case when y is not null then y"
            " when y_prev is null then y_next"
            " when y_next is null then y_prev"
            " else y_prev + (y_next - y_prev) * (t - t_prev)"
            "      div (t_next - t_prev) end"
        ).alias("interp_q4"),
        F.col("n_events").isNull().alias("gap_filled"),
    )


def events_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-resolution rollup CASCADE (the hypertable continuous-
    aggregate pattern): hourly buckets aggregated from raw events,
    daily aggregated FROM THE HOURLY FRAME, monthly from the daily —
    each coarser level reuses the finer aggregate instead of
    re-scanning raw data, which is the only affordable shape when the
    raw table is 100 TB and the rollup refreshes continuously.  One
    stacked frame tagged by level.

    Determinism: value sums stay EXACT DECIMAL through every cascade
    level (re-aggregating rounded doubles would drift); the single
    double conversion + floor-round happens once at output.

    Scale: the raw scan feeds only the hourly aggregation (map-side
    combining); daily/monthly aggregate |hour-buckets| and
    |day-buckets| rows — negligible; the stack is a union of
    already-aggregated frames.
    """
    ev = load_table(spark, "events", sf_dir).select(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("b"), "value"
    )
    hourly = ev.groupBy("event_type", "b").agg(
        F.count("*").alias("n"),
        F.sum(F.col("value").cast("decimal(18,4)")).alias("sdec"),
    )
    daily = hourly.groupBy(
        "event_type", F.date_trunc("day", F.col("b")).alias("b")
    ).agg(F.sum("n").alias("n"), F.sum("sdec").alias("sdec"))
    monthly = daily.groupBy(
        "event_type", F.date_trunc("month", F.col("b")).alias("b")
    ).agg(F.sum("n").alias("n"), F.sum("sdec").alias("sdec"))

    def _lvl(df: DataFrame, name: str) -> DataFrame:
        return df.select(
            F.lit(name).alias("level"),
            F.col("b").alias("bucket_ts"),
            "event_type",
            "n",
            fl4(F.col("sdec").cast("double")).alias("sum_value"),
        )

    return (
        _lvl(hourly, "hour")
        .unionByName(_lvl(daily, "day"))
        .unionByName(_lvl(monthly, "month"))
    )


def events_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROBUST outlier detection per event_type: median absolute
    deviation (the estimator monitoring pipelines use where mean/std
    break under heavy tails — a single corrupt reading moves the mean,
    not the median).  Per type: median value, MAD, and how many events
    sit outside ``|x − med| > 3·MAD`` (exact ppm share).

    Determinism: both engines compute the identical continuous-
    quantile interpolation (the ``text_length_quantiles`` contract) on
    identical doubles, so the unrounded med/MAD used in the comparison
    agree bitwise; outputs are floor-rounded at 4dp (the gapfill
    lesson: F.round HALF_UP vs DuckDB HALF_EVEN diverges on halves).

    Scale: two exact-percentile reductions per type (the documented
    exact-quantile reducer trade, |types| groups) with the tiny median
    frame broadcast back between them; the flag count is one
    map-side-combining conditional aggregation.
    """
    ev = load_table(spark, "events", sf_dir).select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, cast(1 as double)/2)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").withColumn(
        "adev", F.abs(F.col("value") - F.col("med"))
    )
    mad = dev.groupBy("event_type").agg(
        F.first("med").alias("med"),
        F.expr("percentile(adev, cast(1 as double)/2)").alias("mad"),
        F.count("*").alias("n"),
    )
    # fold the flag count and the summary into ONE aggregation over the
    # broadcast-joined dev frame — carrying med/mad/n through first()
    # avoids re-executing the percentile pipeline for a second join
    return (
        dev.join(
            F.broadcast(
                mad.select(
                    "event_type",
                    F.col("med").alias("m_med"),
                    F.col("mad").alias("m_mad"),
                    "n",
                )
            ),
            "event_type",
        )
        .groupBy("event_type")
        .agg(
            F.first("m_med").alias("med0"),
            F.first("m_mad").alias("mad0"),
            F.first("n").alias("n"),
            F.count(F.when(F.col("adev") > 3 * F.col("m_mad"), 1)).alias(
                "n_outliers"
            ),
        )
        .select(
            "event_type",
            fl4(F.col("med0")).alias("med"),
            fl4(F.col("mad0")).alias("mad"),
            "n",
            "n_outliers",
            F.expr("(n_outliers * 1000000) div n").alias("outlier_ppm"),
        )
    )


QUERIES = {
    "window_tumbling_hourly": window_tumbling_hourly,
    "window_sliding_counts": window_sliding_counts,
    "window_session_bounds": window_session_bounds,
    "join_time_range_purchase_errors": join_time_range_purchase_errors,
    "join_time_range_purchase_errors_left": join_time_range_purchase_errors_left,
    "join_time_range_purchase_errors_full": join_time_range_purchase_errors_full,
    "events_funnel_conversion": events_funnel_conversion,
    "events_cohort_retention": events_cohort_retention,
    "events_gapfill_locf": events_gapfill_locf,
    "events_gapfill_interp": events_gapfill_interp,
    "events_rollup_cascade": events_rollup_cascade,
    "events_mad_outliers": events_mad_outliers,
}

_HOUR_US = 3_600_000_000
_HALF_US = 1_800_000_000
_GAP_US = 300_000_000

ORACLES = {
    "join_time_range_purchase_errors_left": """
        SELECT p.user_id AS p_user,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               p.ts AS p_ts,
               e.ts AS e_ts
        FROM events p
        LEFT JOIN events e
          ON p.user_id = e.user_id
         AND e.event_type = 'error'
         AND e.ts >= p.ts - INTERVAL 10 MINUTE
         AND e.ts <= p.ts
        WHERE p.event_type = 'purchase'
    """,
    "join_time_range_purchase_errors_full": """
        SELECT p.user_id AS p_user,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               p.ts AS p_ts,
               e.ts AS e_ts
        FROM (SELECT * FROM events WHERE event_type = 'purchase') p
        FULL JOIN (SELECT * FROM events WHERE event_type = 'error') e
          ON p.user_id = e.user_id
         AND e.ts >= p.ts - INTERVAL 10 MINUTE
         AND e.ts <= p.ts
    """,
    "events_funnel_conversion": """
        WITH signups AS (
            SELECT user_id, min(ts) AS signup_ts
            FROM events WHERE event_type = 'signup' GROUP BY user_id
        ),
        fp AS (
            SELECT s.user_id, s.signup_ts, min(e.ts) AS first_purchase_ts
            FROM signups s
            LEFT JOIN events e
              ON e.user_id = s.user_id
             AND e.event_type = 'purchase'
             AND e.ts >= s.signup_ts
            GROUP BY s.user_id, s.signup_ts
        )
        SELECT user_id, signup_ts, first_purchase_ts,
               first_purchase_ts IS NOT NULL AS converted,
               round((epoch_us(first_purchase_ts) - epoch_us(signup_ts))
                     / 3.6e9, 4) AS hours_to_convert
        FROM fp
    """,
    "join_time_range_purchase_errors": """
        SELECT p.user_id AS p_user,
               p.event_id AS purchase_id,
               e.event_id AS error_id,
               p.ts AS p_ts,
               e.ts AS e_ts
        FROM events p
        JOIN events e
          ON p.user_id = e.user_id
         AND e.ts >= p.ts - INTERVAL 10 MINUTE
         AND e.ts <= p.ts
        WHERE p.event_type = 'purchase' AND e.event_type = 'error'
    """,
    "window_tumbling_hourly": f"""
        SELECT make_timestamp((epoch_us(ts) // {_HOUR_US}) * {_HOUR_US}) AS w_start,
               make_timestamp((epoch_us(ts) // {_HOUR_US}) * {_HOUR_US}
                              + {_HOUR_US}) AS w_end,
               event_type,
               count(*) AS n,
               round(sum(value), 4) AS sum_value
        FROM events
        GROUP BY 1, 2, 3
    """,
    "window_sliding_counts": f"""
        WITH assigned AS (
            SELECT make_timestamp(((epoch_us(ts) // {_HALF_US}) - i.i) * {_HALF_US})
                       AS w_start,
                   ts
            FROM events, LATERAL (SELECT unnest([0, 1]) AS i) i
            WHERE epoch_us(ts) >= ((epoch_us(ts) // {_HALF_US}) - i.i) * {_HALF_US}
              AND epoch_us(ts) <  ((epoch_us(ts) // {_HALF_US}) - i.i) * {_HALF_US}
                                  + {_HOUR_US}
        )
        SELECT w_start,
               w_start + INTERVAL 1 HOUR AS w_end,
               count(*) AS n
        FROM assigned
        GROUP BY 1, 2
    """,
    "window_session_bounds": f"""
        WITH flagged AS (
            SELECT user_id, ts,
                   CASE WHEN lag(ts) OVER w IS NULL
                             OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {_GAP_US}
                        THEN 1 ELSE 0 END AS new_sess
            FROM events
            WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ),
        sessions AS (
            SELECT user_id, ts,
                   sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                       ROWS BETWEEN UNBOUNDED PRECEDING
                                                AND CURRENT ROW) AS sess_id
            FROM flagged
        )
        SELECT user_id,
               min(ts) AS sess_start,
               max(ts) + INTERVAL 5 MINUTE AS sess_end,
               count(*) AS n_events
        FROM sessions
        GROUP BY user_id, sess_id
    """,
}

# Cohort retention: ISO-week truncation cast to DATE on both sides;
# offsets and shares are exact integer arithmetic.
ORACLES["events_cohort_retention"] = """
    WITH act AS (
        SELECT DISTINCT user_id, date_trunc('week', ts)::DATE AS wk
        FROM events
    ),
    cohort AS (SELECT user_id, min(wk) AS cw FROM act GROUP BY user_id),
    sizes AS (SELECT cw, count(*)::BIGINT AS cohort_users
              FROM cohort GROUP BY cw),
    ret AS (
        SELECT c.cw, (date_diff('day', c.cw, a.wk) // 7)::BIGINT
                   AS week_offset,
               count(*)::BIGINT AS n_active
        FROM act a JOIN cohort c ON a.user_id = c.user_id
        GROUP BY c.cw, date_diff('day', c.cw, a.wk) // 7
    )
    SELECT r.cw AS cohort_week, r.week_offset, r.n_active, s.cohort_users,
           (r.n_active * 1000000) // s.cohort_users AS retention_ppm
    FROM ret r JOIN sizes s ON r.cw = s.cw
"""

# Gap-fill + LOCF: dense per-type hour grid via generate_series over
# the span frame; averages replay the exact-decimal-sum discipline;
# LOCF is last_value IGNORE NULLS over the bucket-ordered frame.
ORACLES["events_gapfill_locf"] = """
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bkt,
               count(*)::BIGINT AS n_events,
               floor((sum(value::DECIMAL(18,4)))::DOUBLE / count(*)
                     * 10000 + 0.5) / 10000.0 AS avg_value
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT event_type, min(bkt) AS b0, max(bkt) AS b1
             FROM agg GROUP BY event_type),
    grid AS (
        SELECT s.event_type, g.bkt
        FROM span s, LATERAL (
            SELECT unnest(generate_series(s.b0, s.b1, INTERVAL 1 HOUR))
                AS bkt
        ) g
    ),
    j AS (
        SELECT g.event_type, g.bkt, a.n_events, a.avg_value
        FROM grid g LEFT JOIN agg a
          ON a.event_type = g.event_type AND a.bkt = g.bkt
    )
    SELECT event_type, bkt AS bucket_ts,
           coalesce(n_events, 0)::BIGINT AS n_events,
           avg_value,
           last_value(avg_value IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY bkt
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS value_locf,
           n_events IS NULL AS gap_filled
    FROM j
"""

# Linear-interpolation gapfill: replays the engine's ×10⁴ quantization,
# dense-rank ticks, IGNORE NULLS edge extensions, and truncating-div
# lerp exactly (see events_gapfill_interp).
ORACLES["events_gapfill_interp"] = """
    WITH agg AS (
        SELECT event_type, date_trunc('hour', ts) AS bkt,
               count(*)::BIGINT AS n_events,
               floor((sum(value::DECIMAL(18,4)))::DOUBLE / count(*)
                     * 10000 + 0.5)::BIGINT AS y
        FROM events GROUP BY 1, 2
    ),
    span AS (SELECT event_type, min(bkt) AS b0, max(bkt) AS b1
             FROM agg GROUP BY event_type),
    grid AS (
        SELECT s.event_type, g.bkt
        FROM span s, LATERAL (
            SELECT unnest(generate_series(s.b0, s.b1, INTERVAL 1 HOUR))
                AS bkt
        ) g
    ),
    j AS (
        SELECT g.event_type, g.bkt, a.n_events, a.y,
               row_number() OVER (PARTITION BY g.event_type
                                  ORDER BY g.bkt)::BIGINT AS t
        FROM grid g LEFT JOIN agg a
          ON a.event_type = g.event_type AND a.bkt = g.bkt
    ),
    ext AS (
        SELECT *,
               CASE WHEN y IS NOT NULL THEN t END AS obs_t,
               last_value(y IGNORE NULLS) OVER wp AS y_prev,
               last_value(CASE WHEN y IS NOT NULL THEN t END
                          IGNORE NULLS) OVER wp AS t_prev,
               first_value(y IGNORE NULLS) OVER wn AS y_next,
               first_value(CASE WHEN y IS NOT NULL THEN t END
                           IGNORE NULLS) OVER wn AS t_next
        FROM j
        WINDOW wp AS (PARTITION BY event_type ORDER BY bkt
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
               wn AS (PARTITION BY event_type ORDER BY bkt
                      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT event_type, bkt AS bucket_ts,
           coalesce(n_events, 0)::BIGINT AS n_events,
           y AS avg_q4,
           (CASE WHEN y IS NOT NULL THEN y
                 WHEN y_prev IS NULL THEN y_next
                 WHEN y_next IS NULL THEN y_prev
                 ELSE y_prev + (y_next - y_prev) * (t - t_prev)
                      // (t_next - t_prev) END)::BIGINT AS interp_q4,
           n_events IS NULL AS gap_filled
    FROM ext
"""

# Rollup cascade: coarser levels re-aggregate the finer CTE (never the
# raw table); decimal sums stay exact until the single output round.
ORACLES["events_rollup_cascade"] = """
    WITH hourly AS (
        SELECT event_type, date_trunc('hour', ts) AS b,
               count(*)::BIGINT AS n,
               sum(value::DECIMAL(18,4)) AS sdec
        FROM events GROUP BY 1, 2
    ),
    daily AS (
        SELECT event_type, date_trunc('day', b)::TIMESTAMP AS b,
               sum(n)::BIGINT AS n, sum(sdec) AS sdec
        FROM hourly GROUP BY 1, 2
    ),
    monthly AS (
        SELECT event_type, date_trunc('month', b)::TIMESTAMP AS b,
               sum(n)::BIGINT AS n, sum(sdec) AS sdec
        FROM daily GROUP BY 1, 2
    )
    SELECT 'hour' AS level, b AS bucket_ts, event_type, n,
           floor(sdec::DOUBLE * 10000 + 0.5) / 10000.0 AS sum_value
    FROM hourly
    UNION ALL
    SELECT 'day', b, event_type, n,
           floor(sdec::DOUBLE * 10000 + 0.5) / 10000.0
    FROM daily
    UNION ALL
    SELECT 'month', b, event_type, n,
           floor(sdec::DOUBLE * 10000 + 0.5) / 10000.0
    FROM monthly
"""

# MAD outliers: identical continuous-quantile interpolation both
# engines; comparisons on the unrounded values, output floor-rounded.
ORACLES["events_mad_outliers"] = """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 1.0/2) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, e.value, m.med,
               abs(e.value - m.med) AS adev
        FROM events e JOIN med m ON e.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, any_value(med) AS med,
               quantile_cont(adev, 1.0/2) AS mad,
               count(*)::BIGINT AS n
        FROM dev GROUP BY event_type
    ),
    flagged AS (
        SELECT d.event_type,
               count(*) FILTER (WHERE d.adev > 3 * m.mad)::BIGINT
                   AS n_outliers
        FROM dev d JOIN mad m ON d.event_type = m.event_type
        GROUP BY d.event_type
    )
    SELECT m.event_type,
           floor(m.med * 10000 + 0.5) / 10000.0 AS med,
           floor(m.mad * 10000 + 0.5) / 10000.0 AS mad,
           m.n, f.n_outliers,
           (f.n_outliers * 1000000) // m.n AS outlier_ppm
    FROM mad m JOIN flagged f ON m.event_type = f.event_type
"""
