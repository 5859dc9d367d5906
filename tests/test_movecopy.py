"""End-to-end move/copy sink tests on real local files: plan → execute →
audit, covering copy, move (verified delete), dry-run, error-as-status, and
the full pipeline-A flow (manifest CSV → listing scan → plan → execute)."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from py_datalake_move_files_spark.catalog import read_manifest_csv
from py_datalake_move_files_spark.operators.manifest import build_archive_plan
from py_datalake_move_files_spark.plans.movecopy import (
    audit_summary,
    execute_plan,
)
from py_datalake_move_files_spark.sources.files import list_files


def _mk_tree(root, names, content=b"payload"):
    for n in names:
        p = os.path.join(root, n)
        os.makedirs(os.path.dirname(p), exist_ok=True)
        with open(p, "wb") as f:
            f.write(content + n.encode())


def _plan_df(spark, pairs):
    return spark.createDataFrame(pairs, ["source_path", "target_path"])


def test_copy_executes_and_audits(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _mk_tree(str(src), ["a.txt", "sub/b.txt"])
    plan = _plan_df(
        spark,
        [
            (f"{src}/a.txt", f"{dst}/a.txt"),
            (f"{src}/sub/b.txt", f"{dst}/sub/b.txt"),
        ],
    )
    audit = execute_plan(plan, mode="copy").collect()
    assert {a.status for a in audit} == {"ok"}
    assert (dst / "sub" / "b.txt").read_bytes().endswith(b"sub/b.txt")
    assert (src / "a.txt").exists()  # copy keeps source


def test_move_deletes_source_after_verified_copy(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _mk_tree(str(src), ["a.txt"])
    plan = _plan_df(spark, [(f"{src}/a.txt", f"{dst}/a.txt")])
    audit = execute_plan(plan, mode="move").collect()
    assert audit[0].status == "ok"
    assert not (src / "a.txt").exists()
    assert (dst / "a.txt").exists()


def test_missing_source_is_error_status_not_crash(spark, tmp_path):
    plan = _plan_df(
        spark, [(f"{tmp_path}/nope.txt", f"{tmp_path}/out.txt"), (None, None)]
    )
    audit = execute_plan(plan, mode="copy").collect()
    statuses = {a.source_path: a.status for a in audit}
    assert statuses[f"{tmp_path}/nope.txt"] == "error"
    assert all(a.reason for a in audit if a.status == "error")


def test_dry_run_touches_nothing(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _mk_tree(str(src), ["a.txt"])
    audit = execute_plan(
        _plan_df(spark, [(f"{src}/a.txt", f"{dst}/a.txt")]), mode="move", dry_run=True
    ).collect()
    assert audit[0].status == "planned"
    assert (src / "a.txt").exists() and not dst.exists()


def test_no_overwrite_mode(spark, tmp_path):
    src, dst = tmp_path / "src", tmp_path / "dst"
    _mk_tree(str(src), ["a.txt"])
    os.makedirs(dst)
    (dst / "a.txt").write_bytes(b"already here")
    audit = execute_plan(
        _plan_df(spark, [(f"{src}/a.txt", f"{dst}/a.txt")]),
        mode="copy",
        overwrite=False,
    ).collect()
    assert audit[0].status == "error" and "FileExistsError" in audit[0].reason
    assert (dst / "a.txt").read_bytes() == b"already here"


def test_pipeline_a_end_to_end(spark, tmp_path):
    """The reference's full pipeline A (app/app.py) on real files:
    manifest CSV → recursive listing → semi/anti plan → copy → audit."""
    src, dst = tmp_path / "raw", tmp_path / "archive"
    _mk_tree(str(src), ["q/1.json", "q/2.json"])
    manifest_csv = tmp_path / "manifest.csv"
    manifest_csv.write_text(
        "QuoteId;unixtimestamp;filename\n"
        "id1;1700000000;q/1.json\n"
        "id2;1700000001;q/2.json\n"
        "id3;1700000002;q/missing.json\n"
    )
    manifest = read_manifest_csv(spark, str(manifest_csv))
    listing = list_files(spark, str(src))
    plan = build_archive_plan(
        manifest,
        listing,
        source_prefix=f"file:{src}",
        target_prefix=f"file:{dst}",
    )
    by_status = {r["status"]: r["count"] for r in plan.groupBy("status").count().collect()}
    assert by_status == {"found": 2, "not_found": 1}

    audit = execute_plan(plan.where(F.col("status") == "found"), mode="copy")
    summary = {(r.action, r.status): r["count"] for r in audit_summary(audit).collect()}
    assert summary == {("copy", "ok"): 2}
    assert (dst / "q" / "1.json").exists() and (dst / "q" / "2.json").exists()


def test_manifest_missing_column_fails_fast(spark, tmp_path):
    """P3 (reference app/app.py:83-86): a manifest without `filename` is
    rejected by name before the positional schema could misalign it."""
    bad = tmp_path / "bad.csv"
    bad.write_text("QuoteId;when;file\nq1;1;a.json\n")
    import pytest

    with pytest.raises(ValueError, match="missing required column.*filename"):
        read_manifest_csv(spark, str(bad))
