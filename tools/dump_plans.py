"""Dump ``explain('formatted')`` for named registered queries to files.

Usage (from a repo checkout root)::

    python tools/dump_plans.py OUTDIR SUFFIX name1 [name2 ...]

Writes ``OUTDIR/<name><SUFFIX>.txt`` for each registered query, using THIS
checkout's registry — run it once at HEAD (``_after``) and once inside a
worktree of the pre-optimization commit (``_before``) to produce the
plan-diff evidence pairs under ``plans/r<N>/``. Plans are captured at
sf0.01 (the parity scale): plan SHAPE (exchanges, join strategies, pushed
filters, codegen spans) is what the files witness, not timings.
"""

from __future__ import annotations

import contextlib
import io
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF = "/root/testdata/sf0.01"


def main() -> None:
    outdir, suffix, names = Path(sys.argv[1]), sys.argv[2], sys.argv[3:]
    outdir.mkdir(parents=True, exist_ok=True)

    from pyspark.sql import SparkSession

    from py_datalake_move_files_spark.queries import QUERIES

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.ui.enabled", "false")
        .appName("dump-plans")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in QUERIES:
            print(f"SKIP {name}: not registered in this checkout")
            continue
        df = QUERIES[name](spark, SF)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            df.explain("formatted")
        (outdir / f"{name}{suffix}.txt").write_text(buf.getvalue())
        print(f"wrote {name}{suffix}.txt")
    spark.stop()


if __name__ == "__main__":
    main()
