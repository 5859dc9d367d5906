"""Timestamp-flavor normalization shared by the event-time operators.

Spark carries two wall-clock types: ``TimestampType`` (instant, rendered in
the session timezone) and ``TimestampNTZType`` (no zone). Epoch expressions
(``unix_millis`` / ``unix_micros``), watermarks, and window range frames are
defined on the former; handing them an NTZ column is an AnalysisException.
Harness tables are normalized at load (catalog.py), but operator APIs also
take USER frames — so each event-time operator funnels its timestamp columns
through :func:`ensure_timestamp` and accepts either flavor.

The NTZ -> timestamp cast interprets the naive wall-clock in the session
timezone (pinned to UTC in session.py). It is order- and interval-preserving
for any fixed session timezone, so as-of distances, bucket assignment, and
watermark arithmetic are unaffected by the flavor the caller used.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def ensure_timestamp(df: DataFrame, *cols: str) -> DataFrame:
    """Cast any of ``cols`` that are TIMESTAMP_NTZ to TimestampType.

    No-op (same DataFrame object) when nothing needs casting, so plans of
    already-normalized frames are untouched.
    """
    dtypes = dict(df.dtypes)
    ntz = {
        c: F.col(c).cast("timestamp")
        for c in cols
        if dtypes.get(c) == "timestamp_ntz"
    }
    return df.withColumns(ntz) if ntz else df
