"""catalog.load_table must yield TimestampType for events.ts regardless of
how the harness parquet stores it (TIMESTAMP(NANOS) vs tz-less
TIMESTAMP(MICROS)), and regardless of whether the reading session set
``parquet.inferTimestampNTZ`` (sessions the engine did not create)."""

from __future__ import annotations

import datetime

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from py_datalake_move_files_spark.catalog import _normalize_timestamps, load_table

ROWS = [
    (1, "view", datetime.datetime(2024, 1, 1, 0, 0, 5)),
    (2, "purchase", datetime.datetime(2024, 1, 1, 0, 1, 30)),
]


def _write_events(dirpath, ts_type) -> str:
    table = pa.table(
        {
            "user_id": pa.array([r[0] for r in ROWS], pa.int64()),
            "event_type": pa.array([r[1] for r in ROWS], pa.string()),
            "ts": pa.array([r[2] for r in ROWS], ts_type),
        }
    )
    out = dirpath / "events.parquet"
    pq.write_table(table, str(out))
    return str(dirpath)


@pytest.mark.parametrize(
    "ts_type",
    [pa.timestamp("us"), pa.timestamp("ns")],
    ids=["micros_ntz", "nanos"],
)
def test_events_ts_always_timestamp(spark, tmp_path, ts_type):
    sf_dir = _write_events(tmp_path, ts_type)
    df = load_table(spark, sf_dir, "events")
    assert dict(df.dtypes)["ts"] == "timestamp"
    got = sorted(
        (r.user_id, r.ts.replace(tzinfo=None)) for r in df.collect()
    )
    assert got == [(r[0], r[2]) for r in ROWS]


def test_events_ts_with_ntz_inference_on(spark, tmp_path):
    """Even when the session infers NTZ (engine-external sessions), the
    loader casts back to TimestampType."""
    sf_dir = _write_events(tmp_path, pa.timestamp("us"))
    old = spark.conf.get("spark.sql.parquet.inferTimestampNTZ.enabled")
    spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
    try:
        df = load_table(spark, sf_dir, "events")
        assert dict(df.dtypes)["ts"] == "timestamp"
        assert df.count() == len(ROWS)
    finally:
        spark.conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", old)


def test_normalize_timestamps_passthrough(spark):
    """Frames without NTZ columns come back unchanged (same plan object)."""
    df = spark.range(3).withColumnRenamed("id", "x")
    assert _normalize_timestamps(df) is df
