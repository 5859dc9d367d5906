"""Stateful streaming tests: watermarked dedup and applyInPandasWithState
running aggregates, drained deterministically and compared to batch truth."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.streaming.filestream import file_arrival_stream
from py_datalake_move_files_spark.streaming.stateful import (
    running_counts,
    streaming_dedup,
)


def _dup_stream(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events").limit(200)
    dup = ev.union(ev)  # every event twice
    dup.coalesce(1).write.parquet(f"{tmp_path}/in/b0")
    return ev, file_arrival_stream(spark, f"{tmp_path}/in/*", ev.schema)


def test_streaming_dedup_drops_duplicates(spark, sf_small, tmp_path):
    ev, stream = _dup_stream(spark, sf_small, tmp_path)
    q = (
        streaming_dedup(stream, key_cols=["event_id"])
        .writeStream.format("parquet")
        .option("path", f"{tmp_path}/out")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    out = spark.read.parquet(f"{tmp_path}/out")
    assert out.count() == ev.count()  # each duplicated event exactly once
    assert out.select("event_id").distinct().count() == ev.count()


def test_running_counts_match_batch(spark, sf_small, tmp_path):
    ev = load_table(spark, sf_small, "events")
    ev.coalesce(1).write.parquet(f"{tmp_path}/in/b0")
    stream = file_arrival_stream(spark, f"{tmp_path}/in/*", ev.schema)
    q = (
        running_counts(stream)
        .writeStream.format("memory")
        .queryName("running_counts_t")
        .option("checkpointLocation", f"{tmp_path}/ckpt")
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # last emitted row per user = the final running totals = batch groupBy
    got = {
        r.user_id: (r.n_events, r.total_value)
        for r in spark.sql("SELECT * FROM running_counts_t").collect()
    }
    want = {
        r.user_id: (r.n, round(r.s, 2))
        for r in ev.groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("value").alias("s"))
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k][0] == want[k][0], k
        assert abs(got[k][1] - want[k][1]) < 0.02, k
