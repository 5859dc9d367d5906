#!/usr/bin/env python
"""Probe ONE query against ONE degenerate fixture on both engines and
print rows/errors side by side — the debugging companion of
tools/degenerate_sweep.py. Usage:

    python tools/degen_probe.py <fixture> <query> [<query> ...]
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

import duckdb

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

from tools.degenerate_sweep import build_fixture  # noqa: E402


def main() -> None:
    os.environ.setdefault("SPARK_GRAFT_CPUS", "8")
    from py_datalake_move_files_spark.catalog import TABLES
    from py_datalake_move_files_spark.queries import ORACLE, QUERIES
    from py_datalake_move_files_spark.session import get_spark

    kind = sys.argv[1]
    names = sys.argv[2:]
    tmp = tempfile.mkdtemp(prefix="degen_probe_")
    bcon = duckdb.connect()
    build_fixture(bcon, kind, Path(tmp))
    bcon.close()
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM"
            f" read_parquet('{tmp}/{t}.parquet')"
        )
    spark = get_spark("degen-probe", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        print(f"=== {name} @ {kind}")
        try:
            df = QUERIES[name](spark, tmp)
            rows = df.collect()
            print(f"  spark ({len(rows)}) cols={df.columns}")
            for r in rows[:10]:
                print("   S", tuple(r))
        except Exception as exc:  # noqa: BLE001
            print(f"  spark ERR {type(exc).__name__}: {str(exc)[:300]}")
        try:
            cur = con.execute(ORACLE[name])
            orows = cur.fetchall()
            print(f"  duck  ({len(orows)}) cols={[d[0] for d in cur.description]}")
            for r in orows[:10]:
                print("   D", r)
        except Exception as exc:  # noqa: BLE001
            print(f"  duck  ERR {type(exc).__name__}: {str(exc)[:300]}")
    spark.stop()


if __name__ == "__main__":
    main()
