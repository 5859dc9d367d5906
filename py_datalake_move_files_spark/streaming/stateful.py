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
