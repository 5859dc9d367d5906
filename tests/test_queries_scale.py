"""Oracle-parity + plan checks for the round-3 scale-pattern tier."""

from __future__ import annotations

import duckdb
import pytest

from py_datalake_move_files_spark.queries import ORACLE, QUERIES

NAMES = [
    "event_dedup_tumbling",
    "fuzzy_customer_pairs",
    "skew_salted_event_join",
    "pagerank_nation_flow",
]


@pytest.fixture(scope="module")
def oracle(sf_oracle):
    con = duckdb.connect()
    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_oracle}/{t}.parquet')"
        )
    return con


def _norm(v):
    import datetime

    if isinstance(v, datetime.datetime):
        return v.replace(tzinfo=None)
    if isinstance(v, float):
        return round(v, 6)
    return v


@pytest.mark.parametrize("name", NAMES)
def test_oracle_parity(spark, sf_oracle, oracle, name):
    got = sorted(
        tuple(_norm(v) for v in r) for r in QUERIES[name](spark, sf_oracle).collect()
    )
    want = sorted(
        tuple(_norm(v) for v in r) for r in oracle.execute(ORACLE[name]).fetchall()
    )
    assert len(got) == len(want), (len(got), len(want))
    assert got == want


def test_fuzzy_pairs_plan_has_no_cartesian(spark, sf_small):
    plan = (
        QUERIES["fuzzy_customer_pairs"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan


def test_salted_join_plan_spreads_hot_key(spark, sf_small):
    plan = (
        QUERIES["skew_salted_event_join"](spark, sf_small)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "__salt" in plan  # join key carries the salt column
