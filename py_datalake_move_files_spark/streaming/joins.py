"""Stream-stream joins and watermark-scoped deduplication.

Completes the stateful-streaming surface beyond windowed aggregation
(filestream.py) and custom state (stateful.py):

- :func:`stream_stream_interval_join` — the canonical two-stream pattern
  (attribute purchases to the preceding view within a horizon). Both sides
  are watermarked and the join condition carries the time interval, so
  Spark can bound the join state: each side keeps only rows younger than
  watermark + interval. Without the interval bounds the state store grows
  forever — THE failure mode of naive stream joins at scale.
- :func:`dedup_within_watermark` — ``dropDuplicatesWithinWatermark``:
  exactly-once-per-key within the watermark horizon even when duplicate
  deliveries carry different event times (at-least-once sources re-stamp
  on retry; plain ``dropDuplicates`` would treat re-stamps as new rows).

State sizing at scale: state is partitioned by join key across executors
(numShufflePartitions state stores); a 1-hour horizon over ~10^6 events/s
with ~200-byte rows is ~0.7 TB of state fleet-wide — RocksDB state store
territory, which is a config (``spark.sql.streaming.stateStore
.providerClass``), not a code change.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from py_datalake_move_files_spark.functions.timeutil import ensure_timestamp


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    *,
    key: str = "user_id",
    left_ts: str = "ts",
    right_ts: str = "ts",
    horizon: str = "1 hour",
    left_watermark: str = "2 hours",
    right_watermark: str = "2 hours",
    how: str = "inner",
) -> DataFrame:
    """Join two event streams on ``key`` where the right event lands within
    ``(left_ts, left_ts + horizon]`` — e.g. purchases attributed to the view
    they followed. Column names are prefixed ``l_``/``r_`` to keep the
    output unambiguous."""
    left = ensure_timestamp(left, left_ts)
    right = ensure_timestamp(right, right_ts)
    l = left.withWatermark(left_ts, left_watermark).select(
        [F.col(c).alias(f"l_{c}") for c in left.columns]
    )
    r = right.withWatermark(right_ts, right_watermark).select(
        [F.col(c).alias(f"r_{c}") for c in right.columns]
    )
    cond = (
        (F.col(f"l_{key}") == F.col(f"r_{key}"))
        & (F.col(f"r_{right_ts}") > F.col(f"l_{left_ts}"))
        & (
            F.col(f"r_{right_ts}")
            <= F.col(f"l_{left_ts}") + F.expr(f"INTERVAL {horizon}")
        )
    )
    return l.join(r, cond, how)


def dedup_within_watermark(
    events: DataFrame,
    *,
    key_cols: list[str] | None = None,
    ts_col: str = "ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """One row per key within the watermark horizon, robust to duplicate
    deliveries whose event time was re-stamped (unlike ``dropDuplicates``,
    which keys state on the exact (key, ts) it first saw). State for keys
    older than the watermark is evicted — bounded memory."""
    keys = key_cols or ["event_id"]
    events = ensure_timestamp(events, ts_col)
    return events.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
