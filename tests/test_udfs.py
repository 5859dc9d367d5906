"""UDTF + grouped-agg UDAF surface tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.functions.udfs import (
    make_weighted_avg_udaf,
    path_segments_udtf,
)

SF = "/root/testdata/sf0.001"


def test_path_segments_udtf(spark):
    df = spark.createDataFrame([("lake/raw/a.json",), ("x",), (None,)], ["p"])
    df.createOrReplaceTempView("paths_t")
    spark.udtf.register("path_segments", path_segments_udtf)
    rows = spark.sql(
        "SELECT p, s.* FROM paths_t, LATERAL path_segments(p) AS s"
    ).collect()
    got = [(r.p, r.segment, r.idx, r.is_last) for r in rows]
    assert ("lake/raw/a.json", "lake", 0, False) in got
    assert ("lake/raw/a.json", "a.json", 2, True) in got
    assert ("x", "x", 0, True) in got
    assert all(r[0] is not None for r in got)  # null path yields no rows


def test_weighted_avg_udaf_matches_exact(spark):
    ev = load_table(spark, SF, "events")
    wavg = make_weighted_avg_udaf()
    got = {
        r.event_type: r.w
        for r in ev.groupBy("event_type")
        .agg(wavg(F.col("value"), F.col("user_id").cast("double")).alias("w"))
        .collect()
    }
    want = {
        r.event_type: r.num / r.den
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value") * F.col("user_id")).alias("num"),
            F.sum(F.col("user_id").cast("double")).alias("den"),
        )
        .collect()
    }
    assert set(got) == set(want)
    for k in want:
        assert got[k] == pytest.approx(want[k], rel=1e-9), k
