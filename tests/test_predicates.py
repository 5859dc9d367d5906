"""Golden-document tests for the JSON content predicate (P10) covering every
probe branch of the reference (app/main.py:49-106), plus date-range null
semantics (P9) and the reason cascade (P12)."""

from __future__ import annotations

import datetime as dt
import json

from pyspark.sql import functions as F

from py_datalake_move_files_spark.operators.predicates import (
    date_range_predicate,
    json_key_probe_fast,
    make_json_key_probe_exact,
    reason_cascade,
)

KEY, TARGET = "SalesCompanyId", "100"

GOLDEN = [
    # (doc, exact_expected) — mirrors reference branches app/main.py:68-82
    (json.dumps({"SalesCompanyId": 100}), True),            # top-level, int coerced
    (json.dumps({"SalesCompanyId": "100"}), True),          # top-level, string
    (json.dumps({"SalesCompanyId": 200}), False),           # top-level mismatch
    (json.dumps({"a": {"SalesCompanyId": 100}}), True),     # nested dict
    (json.dumps({"a": {"x": 1}, "b": {"SalesCompanyId": 100}}), True),  # 2nd nested
    (json.dumps({"a": [{"SalesCompanyId": 100}]}), True),   # list-of-dicts head
    (json.dumps({"a": [{"x": 1}, {"SalesCompanyId": 100}]}), False),  # only head checked
    (json.dumps([{"SalesCompanyId": 100}]), True),          # root list head
    (json.dumps({"other": 1}), False),                      # key absent
    ("not json at all", False),                             # decode error
    (None, False),                                          # null doc
    # adversarial: first nested dict has the key with a WRONG value — the
    # reference stops there (False); the fast path may still find b
    (json.dumps({"a": {"SalesCompanyId": 999}, "b": {"SalesCompanyId": 100}}), False),
]


def test_exact_probe_matches_reference_semantics(spark):
    df = spark.createDataFrame([(d,) for d, _ in GOLDEN], ["doc"])
    probe = make_json_key_probe_exact(KEY, TARGET)
    got = [r.r for r in df.select(probe(F.col("doc")).alias("r")).collect()]
    assert got == [e for _, e in GOLDEN]


def test_fast_probe_agrees_except_documented_divergence(spark):
    df = spark.createDataFrame([(d,) for d, _ in GOLDEN], ["doc"])
    got = [
        r.r
        for r in df.select(json_key_probe_fast("doc", KEY, TARGET).alias("r")).collect()
    ]
    # identical on all but the adversarial any-vs-first case (last golden doc)
    assert got[:-1] == [e for _, e in GOLDEN][:-1]
    assert got[-1] is True  # fast path: ANY nested match


def test_date_range_missing_passes(spark):
    rows = [
        (dt.datetime(2024, 1, 5),),
        (dt.datetime(2024, 2, 5),),
        (None,),
    ]
    df = spark.createDataFrame(rows, "ts timestamp")
    pred = date_range_predicate(
        F.col("ts"), after=dt.datetime(2024, 1, 1), before=dt.datetime(2024, 1, 31)
    )
    kept = [r.ts for r in df.where(pred).collect()]
    assert kept == [dt.datetime(2024, 1, 5), None]  # missing date PASSES (P9)

    strict = date_range_predicate(
        F.col("ts"),
        after=dt.datetime(2024, 1, 1),
        before=dt.datetime(2024, 1, 31),
        missing_passes=False,
    )
    assert [r.ts for r in df.where(strict).collect()] == [dt.datetime(2024, 1, 5)]


def test_reason_cascade_first_failure_wins(spark):
    df = spark.createDataFrame(
        [(1, 10), (2, 99), (60, 10), (None, 10)], ["a", "b"]
    )
    reason = reason_cascade(
        (F.col("a") < 50, "a too big"),
        (F.col("b") < 50, "b too big"),
    )
    got = [r.r for r in df.select(reason.alias("r")).collect()]
    # row1 passes both; row2 fails b; row3 fails a (checked first); null a fails a
    assert got == ["Matches all criteria", "b too big", "a too big", "a too big"]
