"""Scale-strategy tests: bucketed co-located joins (no exchange), salted
skew joins (same results as plain), connected-components convergence."""

from __future__ import annotations

from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.functions.skew import salted_join
from py_datalake_move_files_spark.operators.clusters import (
    connected_components,
    dedup_clusters,
)

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_shuffle(spark, tmp_path):
    """Pre-bucketing both sides on the join key makes the join exchange-free
    — the co-located-join strategy for repeated large-large joins at scale."""
    orders = load_table(spark, SF, "orders")
    lineitem = load_table(spark, SF, "lineitem")
    orders.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey").option(
        "path", str(tmp_path / "orders_b")
    ).mode("overwrite").saveAsTable("orders_b")
    lineitem.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey").option(
        "path", str(tmp_path / "lineitem_b")
    ).mode("overwrite").saveAsTable("lineitem_b")

    joined = spark.table("lineitem_b").join(
        spark.table("orders_b"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    )
    plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "Exchange hashpartitioning" not in plan, plan[:2000]
    # sanity: result matches the unbucketed join
    plain = lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
    assert joined.count() == plain.count()
    spark.sql("DROP TABLE orders_b")
    spark.sql("DROP TABLE lineitem_b")


def test_salted_join_matches_plain_join(spark):
    ev = load_table(spark, SF, "events")  # user_id is the (potentially hot) key
    users = (
        ev.groupBy("user_id").count().select("user_id", F.col("count").alias("n"))
    )
    plain = ev.join(users, "user_id").agg(
        F.count(F.lit(1)).alias("c"), F.sum("n").alias("s")
    ).collect()[0]
    salted = salted_join(ev, users, key="user_id", salt_factor=4).agg(
        F.count(F.lit(1)).alias("c"), F.sum("n").alias("s")
    ).collect()[0]
    assert (plain.c, plain.s) == (salted.c, salted.s)


def test_connected_components_on_crafted_graph(spark):
    # chain 1-2-3-4 (diameter 3), pair 10-11, singleton via dedup_clusters
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (10, 11)], ["id_a", "id_b"]
    )
    got = {r.node: r.cluster_id for r in connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}

    docs = spark.createDataFrame([(i,) for i in [1, 2, 3, 4, 10, 11, 99]], ["doc_id"])
    full = {r.doc_id: (r.cluster_id, r.is_representative) for r in dedup_clusters(docs, pairs).collect()}
    assert full[99] == (99, True)  # singleton is its own representative
    assert full[2] == (1, False) and full[1] == (1, True)
