"""Dump ``explain('formatted')`` for named registered queries to files.

Usage (from a repo checkout root)::

    python tools/dump_plans.py OUTDIR SUFFIX name1 [name2 ...]

Writes ``OUTDIR/<name><SUFFIX>.txt`` for each registered query, using THIS
checkout's registry — run it once at HEAD (``_after``) and once inside a
worktree of the pre-optimization commit (``_before``) to produce the
plan-diff evidence pairs under ``plans/r<N>/``. Plans are captured at the
bench contract's own env knobs (ADVICE r12 #1): ``$SPARK_GRAFT_SF_DIR``
(default sf0.01, the parity scale) on ``local[$SPARK_GRAFT_CPUS]`` with the
session factory's AQE settings, so the captured shapes are the shapes the
graded bench plans. Plan SHAPE (exchanges, join strategies, pushed filters,
codegen spans) is what the files witness, not timings.
"""

from __future__ import annotations

import contextlib
import io
import os
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")


def main() -> None:
    outdir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)

    from py_datalake_move_files_spark.queries import QUERIES
    from py_datalake_move_files_spark.session import get_spark

    spark = get_spark("dump-plans")
    spark.sparkContext.setLogLevel("ERROR")
    try:
        for name in names:
            if name not in QUERIES:
                print(f"SKIP {name}: not registered in this checkout")
                continue
            # one broken query must not abort the remaining dumps
            # (ADVICE r12 #2) — log and continue
            try:
                df = QUERIES[name](spark, SF)
                buf = io.StringIO()
                with contextlib.redirect_stdout(buf):
                    df.explain("formatted")
                (outdir / f"{name}{suffix}.txt").write_text(buf.getvalue())
                print(f"wrote {name}{suffix}.txt")
            except Exception as exc:  # noqa: BLE001 — per-name isolation
                print(f"FAIL {name}: {type(exc).__name__}: {exc}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
