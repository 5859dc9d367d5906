"""Event-time operator APIs must accept user frames of EITHER timestamp
flavor (TimestampType or TIMESTAMP_NTZ) — harness tables are normalized at
load (catalog.py), but callers pass their own frames; r2's harness-parquet
flavor flip showed how much breaks when epoch/watermark expressions meet an
NTZ column."""

from __future__ import annotations

import datetime

import pytest
from pyspark.sql import functions as F

from py_datalake_move_files_spark.operators.asof import (
    asof_join,
    interval_join_bucketed,
)
from py_datalake_move_files_spark.streaming.filestream import tumbling_event_stats

D = datetime.datetime
FLAVORS = ["timestamp", "timestamp_ntz"]


def _with_flavor(df, flavor, *cols):
    return df.withColumns({c: F.col(c).cast(flavor) for c in cols})


@pytest.mark.parametrize("flavor", FLAVORS)
def test_asof_join_tolerance_both_flavors(spark, flavor):
    left = spark.createDataFrame(
        [(1, D(2024, 1, 1, 0, 10)), (1, D(2024, 1, 1, 2, 0))],
        "k long, lts timestamp",
    )
    right = spark.createDataFrame(
        [(1, D(2024, 1, 1, 0, 0), "a")], "k long, rts timestamp, payload string"
    )
    left = _with_flavor(left, flavor, "lts")
    right = _with_flavor(right, flavor, "rts")
    out = asof_join(
        left,
        right,
        on="k",
        left_ts="lts",
        right_ts="rts",
        right_cols=["payload"],
        tolerance_ms=30 * 60 * 1000,
    )
    rows = {r.lts.replace(tzinfo=None): r.asof_payload for r in out.collect()}
    # 00:10 is within 30 min of the 00:00 right row; 02:00 is not
    assert rows[D(2024, 1, 1, 0, 10)] == "a"
    assert rows[D(2024, 1, 1, 2, 0)] is None


@pytest.mark.parametrize("flavor", FLAVORS)
def test_interval_join_bucketed_both_flavors(spark, flavor):
    facts = spark.createDataFrame(
        [(1, D(2024, 1, 1, 1, 30)), (1, D(2024, 1, 1, 9, 0))],
        "k long, pt timestamp",
    )
    ivs = spark.createDataFrame(
        [(1, D(2024, 1, 1, 1, 0), D(2024, 1, 1, 2, 0), "iv1")],
        "k long, st timestamp, en timestamp, label string",
    )
    facts = _with_flavor(facts, flavor, "pt")
    ivs = _with_flavor(ivs, flavor, "st", "en")
    out = interval_join_bucketed(
        facts, ivs, point_col="pt", start_col="st", end_col="en", keys=["k"]
    )
    rows = out.collect()
    assert len(rows) == 1 and rows[0].label == "iv1"


@pytest.mark.parametrize("flavor", FLAVORS)
def test_tumbling_stats_both_flavors(spark, flavor):
    # batch frame through the streaming builder (withWatermark no-ops in
    # batch; the window + agg path is the part that must survive NTZ)
    events = spark.createDataFrame(
        [(1, "view", 2.0, D(2024, 1, 1, 0, 10)), (2, "view", 3.0, D(2024, 1, 1, 0, 50))],
        "user_id long, event_type string, value double, ts timestamp",
    )
    events = _with_flavor(events, flavor, "ts")
    out = tumbling_event_stats(events).collect()
    assert len(out) == 1
    assert out[0].n == 2 and out[0].total_value == 5.0
