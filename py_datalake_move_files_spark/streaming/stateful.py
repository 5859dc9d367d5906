"""Custom stateful streaming operators (SURVEY.md §2.9/§2.10:
``applyInPandasWithState`` and watermarked streaming dedup).

- :func:`streaming_dedup` — exactly-once-per-key event streams:
  ``dropDuplicates`` scoped by a watermark so state is bounded (the
  streaming twin of ``dedup_exact``).
- :func:`running_counts` — a hand-rolled stateful aggregate via
  ``applyInPandasWithState``: per key, a persistent (count, value-sum) state
  updated every micro-batch, emitting the running totals. This is the
  template for custom operators Spark's built-in windows can't express
  (per-key ML feature accumulators, anomaly state machines, ...).

The state handle keys state by group; timeouts are disabled here (bounded
test streams) — production pipelines set ``GroupStateTimeout`` to expire
idle keys and keep the state store bounded.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("total_value", T.DoubleType()),
    ]
)

_STATE_SCHEMA = T.StructType(
    [
        T.StructField("n", T.LongType()),
        T.StructField("total", T.DoubleType()),
    ]
)


def streaming_dedup(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Watermarked streaming deduplication: one output row per key; state
    for keys older than the watermark is dropped (bounded memory)."""
    keys = key_cols or ["event_id"]
    from py_datalake_move_files_spark.functions.timeutil import ensure_timestamp

    events = ensure_timestamp(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicates(keys)


def running_counts(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) via ``applyInPandasWithState``.

    Emits one row per user per micro-batch with the cumulative totals —
    state persists in the checkpointed state store across batches. The
    worker closure is self-contained (module-pickling rule)."""

    def update(
        key: tuple,
        pdfs: Iterator[pd.DataFrame],
        state: GroupState,
    ) -> Iterator[pd.DataFrame]:
        import pandas as _pd

        n, total = state.get if state.exists else (0, 0.0)
        for pdf in pdfs:
            n += len(pdf)
            total += float(pdf["value"].sum())
        state.update((n, float(total)))
        yield _pd.DataFrame(
            {"user_id": [key[0]], "n_events": [n], "total_value": [round(total, 2)]}
        )

    return (
        events.selectExpr("user_id", "value")
        .groupBy("user_id")
        .applyInPandasWithState(
            update,
            outputStructType=RUNNING_SCHEMA,
            stateStructType=_STATE_SCHEMA,
            outputMode="update",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )


def running_totals_tws(events: DataFrame) -> DataFrame:
    """Per-user running (count, value-sum) via ``transformWithStateInPandas``
    — the Spark 4 stateful API that succeeds ``applyInPandasWithState``
    (:func:`running_counts` is the legacy twin, kept for comparison).

    Why the new API matters at scale: state lives in NAMED, individually
    typed variables (``ValueState``/``ListState``/``MapState``) managed by
    the RocksDB-backed store with per-state TTL support, instead of one
    monolithic tuple per key — so a 1000-executor job can evolve state
    schema, expire idle keys, and register per-key timers without custom
    plumbing. The processor class is self-contained (module-pickling
    rule: only stdlib/site-package imports inside).

    Environment gate: PySpark's transformWithState Python client talks to
    the JVM state server over protobuf; without the ``protobuf`` package
    the driver-side state worker crashes opaquely (XXKST), so fail fast
    with a clear message here. :func:`running_counts` is the dependency-
    free legacy equivalent."""
    try:
        from google.protobuf import descriptor  # noqa: F401
    except ImportError as e:  # pragma: no cover - environment-dependent
        raise NotImplementedError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(PySpark's state-server wire protocol); it is not installed in "
            "this environment. Use running_counts (applyInPandasWithState) "
            "for the same semantics."
        ) from e
    from pyspark.sql.streaming import StatefulProcessor, StatefulProcessorHandle

    class RunningTotals(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._totals = handle.getValueState("totals", _STATE_SCHEMA)

        def handleInputRows(self, key, rows, timerValues):
            import pandas as _pd

            n, total = (
                self._totals.get() if self._totals.exists() else (0, 0.0)
            )
            for pdf in rows:
                n += len(pdf)
                total += float(pdf["value"].sum())
            self._totals.update((n, float(total)))
            yield _pd.DataFrame(
                {
                    "user_id": [key[0]],
                    "n_events": [n],
                    "total_value": [round(total, 2)],
                }
            )

        def close(self) -> None:
            pass

    return (
        events.selectExpr("user_id", "value")
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=RunningTotals(),
            outputStructType=RUNNING_SCHEMA,
            outputMode="Update",
            timeMode="None",
        )
    )


PATTERN_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("n_with_view", T.LongType()),
        T.StructField("n_view_then_click", T.LongType()),
        T.StructField("n_full_pattern", T.LongType()),
    ]
)

_PATTERN_STATE = T.StructType(
    [
        T.StructField("last_ms", T.LongType()),
        T.StructField("events_seen", T.LongType()),
        T.StructField("n_sessions", T.LongType()),
        T.StructField("closed_v", T.LongType()),
        T.StructField("closed_vc", T.LongType()),
        T.StructField("closed_vcp", T.LongType()),
        T.StructField("cur_v", T.LongType()),
        T.StructField("cur_vc", T.LongType()),
        T.StructField("cur_vcp", T.LongType()),
    ]
)


def session_pattern_state(events: DataFrame, *, gap_ms: int = 1800000) -> DataFrame:
    """Streaming twin of the batch ``session_pattern_match`` automaton:
    per-user session counts and view→click→purchase subsequence matches,
    maintained ACROSS micro-batches in the checkpointed state store via
    ``applyInPandasWithState`` — the live-funnel monitor (the batch query
    recomputes history; this sees each event once and keeps O(1) state
    per user: last-event time, session count, per-stage totals, and the
    open session's three stage flags).

    Strict-precedence semantics match the batch cascade exactly: events
    are processed in (ts, event_id) order and each stage consults the
    flags BEFORE the current event mutates them, which is the sequential
    equivalent of the batch query's 1-PRECEDING window frames. The open
    session's flags fold into the closed totals when the 30-min gap
    starts a new session; emitted totals always include the open session.
    Contract (same as every ingest twin here): micro-batches respect
    per-user event-time order — true for an append-only event log
    consumed in arrival order. The per-row Python loop runs on
    Arrow-batched pandas frames per key — the custom-state-machine slow
    path that windows cannot express incrementally; throughput scales
    with the number of user partitions, and state is O(users)."""

    def update(key, pdfs, state):
        import pandas as _pd

        if state.exists:
            (last_ms, seen, ns, cv, cvc, cvcp, uv, uvc, uvcp) = state.get
        else:
            last_ms, seen, ns, cv, cvc, cvcp, uv, uvc, uvcp = (
                None, 0, 0, 0, 0, 0, 0, 0, 0,
            )
        for pdf in pdfs:
            pdf = pdf.sort_values(["ts", "event_id"])
            for ts, et in zip(pdf["ts"], pdf["event_type"]):
                ms = int(ts.value // 1_000_000)  # pandas ns -> ms
                if last_ms is None or ms - last_ms > gap_ms:
                    cv += uv
                    cvc += uvc
                    cvcp += uvcp
                    uv = uvc = uvcp = 0
                    ns += 1
                last_ms = ms
                seen += 1
                if et == "view":
                    uv = 1
                elif et == "click" and uv:
                    uvc = 1
                elif et == "purchase" and uvc:
                    uvcp = 1
        state.update(
            (last_ms, seen, ns, cv, cvc, cvcp, uv, uvc, uvcp)
        )
        yield _pd.DataFrame(
            {
                "user_id": [key[0]],
                "events_seen": [seen],
                "n_sessions": [ns],
                "n_with_view": [cv + uv],
                "n_view_then_click": [cvc + uvc],
                "n_full_pattern": [cvcp + uvcp],
            }
        )

    from py_datalake_move_files_spark.functions.timeutil import ensure_timestamp

    ev = ensure_timestamp(events, "ts").select(
        "user_id", "ts", "event_id", "event_type"
    )
    return ev.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=PATTERN_SCHEMA,
        stateStructType=_PATTERN_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
