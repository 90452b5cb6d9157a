"""Arbitrary-state API v2 (``transformWithStateInPandas``, Spark 4.x).

The successor to ``applyInPandasWithState`` (streaming/windows.py): typed
state variables (ValueState / ListState / MapState, optional TTL) and
explicit per-key timers replace the single packed state tuple.  The
operator below maintains per-user running event-type counts in a
MapState and flushes a summary row per micro-batch — the same running
aggregate shape as ``running_totals_stream`` but on the v2 API.

ENVIRONMENT GATE: executing transformWithState requires the
``protobuf`` package (Spark's Python↔JVM state-server wire format),
which is not installed in this container.  The processor class and the
plan builder below are complete and importable; ``require_available()``
raises with a clear message when the runtime dependency is missing.
Scale contract (same as v1): state lives in the state store partitioned
by the grouping key — no extra shuffle beyond the groupBy; MapState
size is O(distinct event types) per user.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
    TimerValues,
)

OUT_SCHEMA = "user_id bigint, event_type string, n bigint"


def tws_available() -> bool:
    """True when the transformWithState runtime dependency (protobuf)
    is importable — the feature gate for this module."""
    try:
        import google.protobuf  # noqa: F401

        return True
    except ImportError:
        return False


def require_available() -> None:
    if not tws_available():
        raise NotImplementedError(
            "transformWithStateInPandas needs the 'protobuf' package for "
            "Spark's state-server protocol; it is not installed in this "
            "environment. The operator definition is complete — run it on "
            "a cluster image that bundles protobuf."
        )


class RunningTypeCounts(StatefulProcessor):
    """Per-user running count per event type, kept in a MapState.

    v2 shape: ``init`` declares typed state once per partition;
    ``handleInputRows`` folds each micro-batch's rows for one key and
    emits the updated (user_id, event_type, n) rows.  A production
    variant would also ``registerTimer`` for idle-key eviction — the
    session-window EventTimeTimeout pattern lives in
    streaming/windows.py on the v1 API.
    """

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._counts = handle.getMapState(
            "counts", "event_type string", "n bigint"
        )

    def handleInputRows(
        self,
        key: tuple,
        rows: Iterator[pd.DataFrame],
        timerValues: TimerValues,
    ) -> Iterator[pd.DataFrame]:
        delta: dict[str, int] = {}
        for pdf in rows:
            for et, cnt in pdf["event_type"].value_counts().items():
                delta[et] = delta.get(et, 0) + int(cnt)
        out_types, out_counts = [], []
        for et, inc in delta.items():
            cur = (
                self._counts.getValue((et,))[0]
                if self._counts.containsKey((et,))
                else 0
            )
            self._counts.updateValue((et,), (cur + inc,))
            out_types.append(et)
            out_counts.append(cur + inc)
        if out_types:
            yield pd.DataFrame(
                {
                    "user_id": [key[0]] * len(out_types),
                    "event_type": out_types,
                    "n": out_counts,
                }
            )

    def close(self) -> None:
        pass


def running_type_counts_stream(events: DataFrame) -> DataFrame:
    """Build the transformWithStateInPandas plan (update mode,
    processing-time semantics).  Raises NotImplementedError when the
    protobuf runtime dependency is absent — the plan itself is the
    tested surface in that case."""
    require_available()
    return (
        events.select("user_id", "event_type")
        .groupBy("user_id")
        .transformWithStateInPandas(
            RunningTypeCounts(),
            outputStructType=OUT_SCHEMA,
            outputMode="update",
            timeMode="none",
        )
    )
