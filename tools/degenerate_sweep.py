#!/usr/bin/env python
"""Degenerate-lake robustness sweep (VERDICT r10 #3).

Rounds 9-10 added empty/all-tied guards ad hoc (Kendall tau-b, burstiness
feasibility, the r10 stats guards) and still missed the drift-report ANSI
div-by-zero. This runner systematizes the class: build pathological lake
fixtures, run EVERY registered query against each on BOTH engines, and
demand they AGREE — both succeed with canonically equal rows, or both
reject. A query that aborts where its oracle answers (or vice versa) is
exactly the parity split the driver would flag on a degenerate production
lake.

Fixtures (built from sf0.001 with DuckDB, written as single parquet files
both engines read):

- ``empty``      every table with its exact schema, zero rows
- ``single``     one row per table
- ``nullopt``    sf0.001 rows with optional columns nulled on a 1-in-3
                 stripe (documents.text/lang/source, events.value/props,
                 orders.o_orderdate, customer.c_acctbal) — aggregates stay
                 populated, null paths light up
- ``onelang``    sf0.001 with documents.lang constant — one-language
                 corpus (zero-entropy language marginals, single-group
                 language joins)
- ``onekey``     sf0.001 with ALL events on one user_id and ALL documents
                 from one source (r12, VERDICT r11 #6) — total key skew:
                 the salted join, sessionize, per-user windows, and every
                 groupBy-heavy query exercise their single-hot-key paths
                 under the same both-engines-agree contract

Usage: python tools/degenerate_sweep.py [--fixtures empty,single,...]
       [--queries name,name,...] [--out DEGENERATE.json]

Exit 0 when every (fixture, query) agrees; 1 otherwise. The JSON artifact
records per-cell status: ``match`` / ``both_reject`` / ``value_mismatch``
/ ``spark_only_fails`` / ``oracle_only_fails``. Intentional both-reject
cells are fine by contract (the engines agree the input is out of
domain); PLANS.md keeps the adjudicated table.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SRC = "/root/testdata/sf0.001"

FIXTURES = ("empty", "single", "nullopt", "onelang", "onekey")

#: optional columns nulled on the 1-in-3 stripe in the ``nullopt`` fixture
NULL_STRIPE: dict[str, tuple[str, ...]] = {
    "documents": ("text", "lang", "source"),
    "events": ("value", "props"),
    "orders": ("o_orderdate",),
    "customer": ("c_acctbal",),
}

#: per-table positional key column the stripe rotates on (any stable int)
STRIPE_KEY: dict[str, str] = {
    "documents": "doc_id",
    "events": "event_id",
    "orders": "o_orderkey",
    "customer": "c_custkey",
}


def build_fixture(con: duckdb.DuckDBPyConnection, kind: str, out_dir: Path) -> None:
    from py_datalake_move_files_spark.catalog import TABLES

    out_dir.mkdir(parents=True, exist_ok=True)
    for t in TABLES:
        src = f"read_parquet('{SRC}/{t}.parquet')"
        if kind == "empty":
            sel = f"SELECT * FROM {src} LIMIT 0"
        elif kind == "single":
            sel = f"SELECT * FROM {src} LIMIT 1"
        elif kind == "nullopt" and t in NULL_STRIPE:
            cols = con.execute(f"DESCRIBE SELECT * FROM {src}").fetchall()
            key = STRIPE_KEY[t]
            exprs = []
            for name, typ, *_ in cols:
                if name in NULL_STRIPE[t]:
                    exprs.append(
                        f"CASE WHEN {key} % 3 = 0 THEN NULL ELSE {name} END"
                        f"::{typ} AS {name}"
                    )
                else:
                    exprs.append(name)
            sel = f"SELECT {', '.join(exprs)} FROM {src}"
        elif kind == "onelang" and t == "documents":
            sel = (
                "SELECT doc_id, text, 'en' AS lang, source, n_chars"
                f" FROM {src}"
            )
        elif kind == "onekey" and t == "events":
            # every event on ONE user: per-user windows/sessionize collapse
            # to a single giant partition, the salted join's hot key is the
            # ONLY key, user-grouped stats become one group
            sel = (
                "SELECT event_id, ts, CAST(1 AS BIGINT) AS user_id,"
                f" event_type, value, props FROM {src}"
            )
        elif kind == "onekey" and t == "documents":
            # every document from ONE source: source marginals are a point
            # mass, per-source sampling quotas see one group
            sel = (
                "SELECT doc_id, text, lang, 'web' AS source, n_chars"
                f" FROM {src}"
            )
        else:
            sel = f"SELECT * FROM {src}"
        con.execute(f"COPY ({sel}) TO '{out_dir}/{t}.parquet' (FORMAT parquet)")


def sweep(fixtures: list[str], names: list[str], out_path: Path) -> int:
    from py_datalake_move_files_spark.catalog import TABLES
    from py_datalake_move_files_spark.functions.parity import canon_rows
    from py_datalake_move_files_spark.queries import ORACLE, QUERIES
    from py_datalake_move_files_spark.session import get_spark

    spark = get_spark("degenerate-sweep")
    spark.sparkContext.setLogLevel("ERROR")

    report: dict[str, dict[str, dict]] = {}
    bad = 0
    with tempfile.TemporaryDirectory(prefix="degenerate_") as tmp:
        for kind in fixtures:
            lake = Path(tmp) / kind
            bcon = duckdb.connect()
            build_fixture(bcon, kind, lake)
            bcon.close()

            ocon = duckdb.connect()
            for t in TABLES:
                ocon.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM"
                    f" read_parquet('{lake}/{t}.parquet')"
                )
            cells: dict[str, dict] = {}
            for name in names:
                s_err = o_err = None
                s_cols: list[str] = []
                s_rows: list[tuple] = []
                o_cols: list[str] = []
                o_rows: list[tuple] = []
                try:
                    df = QUERIES[name](spark, str(lake))
                    s_cols = list(df.columns)
                    s_rows = [tuple(r) for r in df.collect()]
                except Exception as exc:  # noqa: BLE001 — recorded verdict
                    s_err = f"{type(exc).__name__}: {exc}"[:200]
                try:
                    cur = ocon.execute(ORACLE[name])
                    o_cols = [d[0] for d in cur.description]
                    o_rows = cur.fetchall()
                except Exception as exc:  # noqa: BLE001 — recorded verdict
                    o_err = f"{type(exc).__name__}: {exc}"[:200]

                if s_err and o_err:
                    cells[name] = {
                        "status": "both_reject",
                        "spark_err": s_err,
                        "oracle_err": o_err,
                    }
                elif s_err:
                    cells[name] = {"status": "spark_only_fails", "spark_err": s_err}
                    bad += 1
                elif o_err:
                    cells[name] = {
                        "status": "oracle_only_fails",
                        "oracle_err": o_err,
                    }
                    bad += 1
                else:
                    ok = canon_rows(s_cols, s_rows) == canon_rows(o_cols, o_rows)
                    cells[name] = {
                        "status": "match" if ok else "value_mismatch",
                        "rows": len(s_rows),
                    }
                    if not ok:
                        cells[name]["oracle_rows"] = len(o_rows)
                        bad += 1
            ocon.close()
            report[kind] = cells
            agree = sum(
                1
                for c in cells.values()
                if c["status"] in ("match", "both_reject")
            )
            print(f"{kind}: {agree}/{len(cells)} agree", flush=True)

    spark.stop()
    out_path.write_text(json.dumps(report, indent=2) + "\n")
    print(f"wrote {out_path} ({bad} disagreement(s))")
    return 1 if bad else 0


def main() -> int:
    from py_datalake_move_files_spark.queries import QUERIES

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--fixtures", default=",".join(FIXTURES))
    p.add_argument("--queries", default=None, help="subset, comma-separated")
    p.add_argument("--out", default=str(ROOT / "DEGENERATE.json"))
    args = p.parse_args()
    fixtures = [f for f in args.fixtures.split(",") if f]
    unknown = set(fixtures) - set(FIXTURES)
    if unknown:
        p.error(f"unknown fixtures: {sorted(unknown)}")
    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries
        else sorted(QUERIES)
    )
    unknown_q = set(names) - set(QUERIES)
    if unknown_q:
        p.error(f"unknown queries: {sorted(unknown_q)}")
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    return sweep(fixtures, names, Path(args.out))


if __name__ == "__main__":
    raise SystemExit(main())
