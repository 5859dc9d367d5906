"""Retention (vacuum) and compaction maintenance ops on real files."""

from __future__ import annotations

import datetime as dt
import os
import time

from py_datalake_move_files_spark.catalog import load_table
from py_datalake_move_files_spark.plans.maintenance import compact, retention_plan
from py_datalake_move_files_spark.plans.movecopy import execute_plan

SF = "/root/testdata/sf0.001"


def test_retention_deletes_only_old_files(spark, tmp_path):
    lake = tmp_path / "lake"
    lake.mkdir()
    old = lake / "old.txt"
    new = lake / "new.txt"
    old.write_text("old")
    new.write_text("new")
    past = time.time() - 90 * 86400
    os.utime(old, (past, past))

    cutoff = dt.datetime.now() - dt.timedelta(days=30)
    plan = retention_plan(spark, str(lake), older_than=cutoff)
    assert [r.source_path.split("/")[-1] for r in plan.collect()] == ["old.txt"]

    # dry run leaves everything
    execute_plan(plan, mode="delete", dry_run=True).collect()
    assert old.exists() and new.exists()

    audit = execute_plan(plan, mode="delete").collect()
    assert [a.status for a in audit] == ["ok"]
    assert not old.exists() and new.exists()


def test_compact_small_files(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    src = str(tmp_path / "small")
    ev.repartition(40).write.parquet(src)  # 40 tiny files
    n_in = len([f for f in os.listdir(src) if f.endswith(".parquet")])
    assert n_in == 40

    out = str(tmp_path / "compacted")
    n_target = compact(spark, src, out, target_file_mb=128)
    n_out = len([f for f in os.listdir(out) if f.endswith(".parquet")])
    assert n_out == n_target == 1  # tiny data → single 128MB-target file
    assert spark.read.parquet(out).count() == ev.count()
