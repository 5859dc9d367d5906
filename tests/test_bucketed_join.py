"""Bucketed-table co-located join: the pay-the-shuffle-once storage layout
(sources/bucketed.py). The joined plan must show a SortMergeJoin with ZERO
Exchange — each task zips bucket i with bucket i — and, with sortBy, no
extra Sort on the scan side."""

from __future__ import annotations

import uuid

import pytest
from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.sources.bucketed import read_table, write_bucketed

SF = "/root/testdata/sf0.01"


@pytest.fixture()
def bucketed_pair(spark):
    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lines = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    write_bucketed(
        load_table(spark, SF, "orders").select("o_orderkey", "o_totalprice"),
        t_orders,
        key="o_orderkey",
        buckets=8,
    )
    write_bucketed(
        load_table(spark, SF, "lineitem").select(
            "l_orderkey", "l_quantity", "l_extendedprice"
        ),
        t_lines,
        key="l_orderkey",
        buckets=8,
    )
    yield t_orders, t_lines
    for t in (t_orders, t_lines):
        spark.sql(f"DROP TABLE IF EXISTS {t}")


def test_bucketed_join_has_no_exchange(spark, bucketed_pair):
    t_orders, t_lines = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        # force the join shape a 100 TB fact-fact join has (no broadcast)
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        joined = read_table(spark, t_orders).join(
            read_table(spark, t_lines),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, plan  # the whole point of bucketing
        # correctness: same row count as the plain (shuffled) join
        plain = load_table(spark, SF, "orders").join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        assert joined.count() == plain.count()
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_unbucketed_baseline_does_exchange(spark, bucketed_pair):
    """Control: the same join over plain parquet DOES shuffle — proving the
    bucketed plan's missing Exchange is the layout's doing."""
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        plain = load_table(spark, SF, "orders").join(
            load_table(spark, SF, "lineitem"),
            F.col("o_orderkey") == F.col("l_orderkey"),
        )
        plan = plain._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" in plan
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_aggregation_also_skips_exchange(spark, bucketed_pair):
    """Bucketing serves GROUP BY on the bucket key too: the pre-shuffled
    layout satisfies the aggregate's distribution requirement."""
    _, t_lines = bucketed_pair
    agg = (
        read_table(spark, t_lines)
        .groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    plan = agg._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan
