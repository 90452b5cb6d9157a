"""Streaming event-time windowing + custom stateful operators (M5/M6).

Same window expressions as operators/windows_ext (batch) plus
watermarks for late-data bounds, and an ``applyInPandasWithState``
custom stateful operator — the engine's answer to "operators Spark
lacks" in streaming (running per-key aggregates emitted each
micro-batch in update mode; a production deployment can switch the
``timeoutConf`` to ProcessingTime/EventTime timeouts for idle-key
eviction without changing the operator shape).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def tumbling_counts_stream(
    events: DataFrame, window_size: str = "1 hour", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked tumbling-window counts over the envelope/events stream.

    The watermark bounds state: windows older than (max event time −
    watermark) are finalized and evicted — the scale knob for unbounded
    streams.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window_size).alias("w"), "event_type")
        .agg(F.count("*").alias("n"))
        .select(
            F.col("w.start").alias("w_start"),
            F.col("w.end").alias("w_end"),
            "event_type",
            "n",
        )
    )


def session_counts_stream(
    events: DataFrame, gap: str = "5 minutes", watermark: str = "10 minutes"
) -> DataFrame:
    """Watermarked session windows per user (append mode emits closed
    sessions only)."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id", F.session_window("ts", gap).alias("w"))
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("w.start").alias("sess_start"),
            F.col("w.end").alias("sess_end"),
            "n_events",
        )
    )


def _purchase_error_sides(
    events: DataFrame, window: str, watermark: str
):
    """Shared projections + join condition for the purchase↔error
    stream-stream joins (inner and left-outer differ only in join
    type)."""
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .select(
            F.col("user_id").alias("p_user"),
            F.col("event_id").alias("purchase_id"),
            F.col("ts").alias("p_ts"),
        )
        .withWatermark("p_ts", watermark)
    )
    errors = (
        events.filter(F.col("event_type") == "error")
        .select(
            F.col("user_id").alias("e_user"),
            F.col("event_id").alias("error_id"),
            F.col("ts").alias("e_ts"),
        )
        .withWatermark("e_ts", watermark)
    )
    cond = (
        (F.col("p_user") == F.col("e_user"))
        & (F.col("e_ts") >= F.col("p_ts") - F.expr(f"INTERVAL {window}"))
        & (F.col("e_ts") <= F.col("p_ts"))
    )
    return purchases, errors, cond


def purchase_error_correlation_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-stream inner join: purchases correlated with errors by the
    same user within a trailing time window.

    Both sides carry watermarks and the join condition bounds the time
    range — the two requirements that let Spark bound join state (rows
    older than watermark+range are evicted).  The batch equivalent is
    the same join expression, which the test asserts.
    """
    purchases, errors, cond = _purchase_error_sides(events, window, watermark)
    return purchases.join(errors, cond).select(
        "p_user", "purchase_id", "error_id", "p_ts", "e_ts"
    )


def purchase_error_left_join_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-stream LEFT OUTER join: every purchase, with its correlated
    error ids where one exists within the trailing window, else nulls.

    Outer semantics in streaming: a purchase emits its null row only
    once the error-side watermark has passed the end of its join window
    (no earlier error can still arrive) — state stays bounded exactly
    as in the inner variant.  Batch dual: the same expression evaluated
    on a bounded frame.
    """
    purchases, errors, cond = _purchase_error_sides(events, window, watermark)
    return purchases.join(errors, cond, "leftOuter").select(
        "p_user", "purchase_id", "error_id", "p_ts", "e_ts"
    )


def purchase_error_full_join_stream(
    events: DataFrame, window: str = "10 minutes", watermark: str = "30 minutes"
) -> DataFrame:
    """Stream-stream FULL OUTER join: every purchase AND every error,
    matched where correlated within the window, null-extended where
    not.  Outer rows on each side emit once the OTHER side's watermark
    clears their join window — completing the inner/left/full join-type
    matrix with the same bounded-state guarantees."""
    purchases, errors, cond = _purchase_error_sides(events, window, watermark)
    return purchases.join(errors, cond, "fullOuter").select(
        "p_user", "purchase_id", "error_id", "p_ts", "e_ts"
    )


def dedup_stream(
    events: DataFrame, keys: list[str] | None = None, watermark: str = "30 minutes"
) -> DataFrame:
    """Streaming dedup via dropDuplicatesWithinWatermark: first
    occurrence of each key wins; duplicate arrivals within the
    watermark horizon are dropped.

    This is the streaming counterpart of the batch dedup family: state
    holds one entry per key only until the watermark passes (bounded),
    unlike plain dropDuplicates whose state grows forever — the only
    viable streaming-dedup shape on an unbounded 100 TB/day stream.
    Exactly-once dedup holds for duplicates arriving within the
    watermark of the first occurrence (the Kinesis redelivery case).
    """
    keys = keys or ["event_id"]
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(keys)


def enrich_with_latest_order(stream: DataFrame, orders: DataFrame) -> DataFrame:
    """Stream-static enrichment with an AGGREGATED static side: each
    streamed event joined to its user's latest order (max orderdate,
    orderkey tiebreak).

    The static aggregate is re-planned per micro-batch (Structured
    Streaming re-executes the static subtree), so a slowly-refreshing
    dimension table is always read current — the feature-lookup pattern
    of a streaming feature pipeline.  Batch dual: same expression.
    """
    latest = orders.groupBy(F.col("o_custkey").alias("user_id")).agg(
        F.max(F.struct("o_orderdate", "o_orderkey", "o_totalprice")).alias("last")
    )
    return stream.join(latest, "user_id", "left").select(
        "event_id",
        "user_id",
        "ts",
        F.col("last.o_orderkey").alias("last_orderkey"),
        F.col("last.o_orderdate").alias("last_orderdate"),
    )


_STATE_SCHEMA = "n bigint, total double"
_OUT_SCHEMA = "user_id bigint, n bigint, total double"

_SESS_GAP_US = 300_000_000  # 5 minutes, matches window_session_bounds
_SESS_STATE_SCHEMA = "starts array<bigint>, ends array<bigint>, counts array<bigint>"
_SESS_OUT_SCHEMA = (
    "user_id bigint, sess_start timestamp, sess_end timestamp, n_events bigint"
)


def _merge_sessions(iv: list[list[int]]) -> list[list[int]]:
    """Merge [start, end, count] intervals under Spark's session_window
    rule: an event joins a session iff its time is strictly before the
    session's current end (end = last event + gap), so intervals merge
    when next.start < cur.end — an event landing exactly at the end
    opens a NEW session."""
    iv.sort()
    merged: list[list[int]] = []
    for s, e, n in iv:
        if merged and s < merged[-1][1]:
            if e > merged[-1][1]:
                merged[-1][1] = e
            merged[-1][2] += n
        else:
            merged.append([s, e, n])
    return merged


def _session_windows(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Event-time session windows with EventTimeTimeout: state carries
    the user's OPEN sessions; a session closes (and emits, exactly
    once) when the watermark passes its end — either on a data batch
    for this key or via the timeout firing with no data."""
    if state.exists:
        starts, ends, counts = state.get
        sessions = [[s, e, n] for s, e, n in zip(starts, ends, counts)]
    else:
        sessions = []
    for pdf in pdfs:
        for t in (pdf["ts"].astype("int64") // 1000).tolist():
            sessions.append([t, t + _SESS_GAP_US, 1])
    sessions = _merge_sessions(sessions)
    # watermark-closed sessions: no event >= watermark can extend a
    # session whose end <= watermark (extension needs ts < end), and
    # events below the watermark are dropped upstream — safe to emit.
    wm_us = state.getCurrentWatermarkMs() * 1000
    closed = [s for s in sessions if s[1] <= wm_us]
    open_ = [s for s in sessions if s[1] > wm_us]
    if open_:
        state.update(
            (
                [s[0] for s in open_],
                [s[1] for s in open_],
                [s[2] for s in open_],
            )
        )
        # wake this key when the watermark passes the earliest open end
        state.setTimeoutTimestamp(
            max(min(s[1] for s in open_) // 1000, state.getCurrentWatermarkMs() + 1)
        )
    else:
        state.remove()
    if closed:
        yield pd.DataFrame(
            {
                "user_id": [key[0]] * len(closed),
                "sess_start": pd.to_datetime([s[0] for s in closed], unit="us"),
                "sess_end": pd.to_datetime([s[1] for s in closed], unit="us"),
                "n_events": [s[2] for s in closed],
            }
        )


def session_windows_stateful_stream(
    events: DataFrame, watermark: str = "10 minutes"
) -> DataFrame:
    """Custom stateful SESSION-WINDOW operator via applyInPandasWithState
    with ``GroupStateTimeout.EventTimeTimeout`` — the stateful-streaming
    shape the built-in ``session_window`` hides: open sessions live in
    the state store keyed by user, and idle keys are closed by the
    EVENT-TIME timeout (watermark-driven), not by new data arriving for
    the key.  Emits each closed session exactly once (append semantics);
    results equal the batch ``window_session_bounds`` dual for every
    session the final watermark passed.

    Scale: state is O(open sessions per user), partitioned on the same
    shuffle key as the groupBy; the watermark bounds both state size and
    timeout backlog — the same contract as the built-in operator.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _session_windows,
            outputStructType=_SESS_OUT_SCHEMA,
            stateStructType=_SESS_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def _running_totals(
    key: tuple,
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Stateful per-user running totals: state carries (count, sum)
    across micro-batches; emits the updated totals each batch."""
    if state.exists:
        n, total = state.get
    else:
        n, total = 0, 0.0
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame(
        {"user_id": [key[0]], "n": [n], "total": [total]}
    )


def running_totals_stream(events: DataFrame) -> DataFrame:
    """Custom stateful operator via applyInPandasWithState: per-user
    running (count, sum) maintained across micro-batches.

    Scale: state lives in the state store partitioned by user_id —
    the same shuffle key as the groupBy, no extra movement; state size
    is O(distinct users), not O(events).
    """
    return events.select("user_id", "value").groupBy("user_id").applyInPandasWithState(
        _running_totals,
        outputStructType=_OUT_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
