"""Stream-stream interval join and watermark-scoped dedup, drained
deterministically with availableNow and checked against batch semantics."""

from __future__ import annotations

import datetime as dt

from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.streaming.filestream import (
    file_arrival_stream,
    to_parquet_sink,
)
from py_datalake_move_files_spark.streaming.joins import (
    dedup_within_watermark,
    stream_stream_interval_join,
)


def test_stream_stream_join_matches_batch(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    views = ev.where(F.col("event_type") == "view")
    buys = ev.where(F.col("event_type") == "purchase")
    views.coalesce(1).write.parquet(f"{tmp_path}/views")
    buys.coalesce(1).write.parquet(f"{tmp_path}/buys")

    vs = file_arrival_stream(spark, f"{tmp_path}/views", ev.schema)
    bs = file_arrival_stream(spark, f"{tmp_path}/buys", ev.schema)
    joined = stream_stream_interval_join(vs, bs, horizon="1 hour").select(
        "l_user_id", "l_event_id", "r_event_id", "l_ts", "r_ts"
    )
    q = (
        to_parquet_sink(joined, str(tmp_path / "out"), str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {tuple(r) for r in spark.read.parquet(str(tmp_path / "out")).collect()}

    batch = (
        views.alias("v")
        .join(
            buys.alias("b"),
            (F.col("v.user_id") == F.col("b.user_id"))
            & (F.col("b.ts") > F.col("v.ts"))
            & (F.col("b.ts") <= F.col("v.ts") + F.expr("INTERVAL 1 HOUR")),
        )
        .select("v.user_id", "v.event_id", "b.event_id", "v.ts", "b.ts")
    )
    batch_rows = {tuple(r) for r in batch.collect()}
    assert len(got) > 0
    # watermark semantics can withhold late matches; everything emitted
    # must be a true batch match
    assert got <= batch_rows
    # with a 2h watermark over a fully-drained bounded source, the miss
    # rate should be small — require the bulk of matches present
    assert len(got) >= len(batch_rows) * 0.8


def test_dedup_within_watermark_collapses_restamped_duplicates(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 12, 0, 0)
    rows = [
        # key 1 delivered three times with re-stamped event times
        (1, base, 10, "click", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=5), 10, "click", 1.0, "{}"),
        (1, base + dt.timedelta(minutes=9), 10, "click", 1.0, "{}"),
        (2, base + dt.timedelta(minutes=1), 20, "click", 2.0, "{}"),
    ]
    schema = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"
    df = spark.createDataFrame(rows, schema)
    df.coalesce(1).write.parquet(f"{tmp_path}/in")

    stream = file_arrival_stream(spark, f"{tmp_path}/in", df.schema)
    deduped = dedup_within_watermark(stream, key_cols=["event_id"], watermark="1 hour")
    q = (
        to_parquet_sink(deduped, str(tmp_path / "out"), str(tmp_path / "ckpt"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2  # one per event_id despite differing ts
    assert {r["event_id"] for r in out.collect()} == {1, 2}


def test_stream_static_enrich_matches_batch_join(spark, sf_small, tmp_path):
    """Stream-static enrichment: a live event stream decorated with a
    static user dimension must emit exactly the batch left join (the join
    is stateless, so no watermark/late-data slack is needed), and the
    unsupported shapes are rejected eagerly."""
    import pytest

    from py_datalake_move_files_spark.streaming.joins import (
        stream_static_enrich,
    )

    ev = load_table(spark, sf_small, "events").select(
        "event_id", "user_id", "event_type"
    )
    dim = (
        ev.select("user_id")
        .distinct()
        .where(F.col("user_id") % 2 == 0)  # half the users have a profile
        .withColumn("segment", F.concat(F.lit("seg"), F.col("user_id") % 3))
    )
    ev.coalesce(1).write.parquet(f"{tmp_path}/ev")
    stream = file_arrival_stream(spark, f"{tmp_path}/ev", ev.schema)

    enriched = stream_static_enrich(stream, dim, on="user_id")
    q = (
        to_parquet_sink(enriched, str(tmp_path / "out"), str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    got = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out"))
        .select("event_id", "user_id", "event_type", "segment")
        .collect()
    }
    want = {
        tuple(r)
        for r in ev.join(dim, "user_id", "left")
        .select("event_id", "user_id", "event_type", "segment")
        .collect()
    }
    assert got == want and got

    with pytest.raises(ValueError, match="right/full"):
        stream_static_enrich(stream, dim, on="user_id", how="full_outer")
