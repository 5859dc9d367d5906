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
- :func:`stream_static_enrich` — the stateless third shape: per-micro-
  batch join against a slowly-changing static dimension (broadcast by
  default), picking up in-place dimension updates without restarts.

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


def stream_static_enrich(
    stream: DataFrame,
    dim: DataFrame,
    *,
    on: str,
    how: str = "left",
    broadcast_dim: bool = True,
) -> DataFrame:
    """Stream-static enrichment join — the third join shape §2.9 needs
    beside stream-stream and self-dedup: a live event stream decorated
    with a slowly-changing dimension (user profile, product catalog).

    Stream-static joins are STATELESS: Spark re-plans the static side per
    micro-batch (no state store, no watermark requirement on the stream
    for inner/left), so the dimension may be updated in place between
    batches and each batch sees its latest snapshot — the cheap,
    restart-free alternative to a slowly-changing stream-stream join for
    reference data. ``broadcast_dim`` (default) hints the dimension below
    every executor — at 100 TB/day of events the dim is the small side by
    construction; pass False for a corpus-sized dimension and let AQE
    pick a shuffled join per micro-batch.

    Right/full joins are NOT offered: with a static right side they
    require watermark-complete knowledge of the stream and Spark rejects
    them at analysis — the API surfaces only the shapes that run."""
    if how not in ("inner", "left", "left_semi", "left_anti"):
        raise ValueError(
            f"stream-static join supports inner/left/left_semi/left_anti, "
            f"got {how!r} (right/full need the whole stream and are "
            f"rejected by Spark at analysis time)"
        )
    d = F.broadcast(dim) if broadcast_dim else dim
    return stream.join(d, on, how)
