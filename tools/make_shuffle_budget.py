#!/usr/bin/env python
"""Regenerate SHUFFLE_BUDGET.json — the exchange-volume regression budget
(VERDICT r11 #5).

Per-query shuffle read/write is deterministic on this engine (max
back-to-back delta 0.12 MB across full sf0.1 sweeps), unlike wall time
(2-10x multi-tenant noise) — so exchange volume is the one per-query
metric a test can gate HARD. This tool picks the top-N registered queries
by committed sf0.1 exchange volume (BENCH_full.json), re-measures each
one's per-run shuffle read/write at sf0.01 (the scale the always-on gate
can afford), and writes the budget sidecar that
tests/test_bench_contract.py::test_shuffle_volume_within_budget enforces:
a code change that grows any budgeted query's exchange volume by >20%
(e.g. an accidental repartition, a lost broadcast, a widened shuffle
payload) goes red in the suite without waiting for a bench sweep.

Protocol mirrors bench.py: tables touched, session artifacts pre-built,
one untimed warm-up run per query (artifact/JIT effects), then the
measured run's executor-total delta. Run from the repo root after an
ADJUDICATED volume change:  python tools/make_shuffle_budget.py
"""

from __future__ import annotations

import json
import sys
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF_DIR = "/root/testdata/sf0.01"
TOP_N = 20


def budget_names(top_n: int = TOP_N) -> list[str]:
    """Top-N registered queries by committed sf0.1 exchange volume."""
    from py_datalake_move_files_spark.queries import QUERIES

    bench = json.loads((ROOT / "BENCH_full.json").read_text())
    vol = {
        n: bench["shuffle_read_mb"].get(n, 0.0)
        + bench["shuffle_write_mb"].get(n, 0.0)
        for n in bench.get("queries", {})
        if n in QUERIES
    }
    return [
        n for n, _ in sorted(vol.items(), key=lambda kv: kv[1], reverse=True)
    ][:top_n]


def measure(spark, names: list[str], sf_dir: str = SF_DIR) -> dict:
    """Per-run shuffle (read_mb, write_mb) per query, bench-protocol."""
    sys.path.insert(0, str(ROOT))
    import bench

    from py_datalake_move_files_spark.catalog import TABLES, load_table
    from py_datalake_move_files_spark.queries import QUERIES

    for t in TABLES:
        load_table(spark, sf_dir, t).count()
    out: dict[str, dict[str, float]] = {}
    for name in names:
        bench.materialize(QUERIES[name](spark, sf_dir))  # warm artifacts/JIT
        before = bench.shuffle_totals(spark)
        bench.materialize(QUERIES[name](spark, sf_dir))
        after = bench.shuffle_totals(spark)
        if before is None or after is None:
            raise RuntimeError(
                "executor shuffle metrics unavailable (AppStatusStore API "
                "moved?) — the volume gate cannot run blind"
            )
        out[name] = {
            "read_mb": round((after[0] - before[0]) / 1e6, 3),
            "write_mb": round((after[1] - before[1]) / 1e6, 3),
        }
    return out


def main() -> None:
    from py_datalake_move_files_spark.session import get_spark

    names = budget_names()
    # shuffle_partitions=8 matches the test fixture (tests/conftest.py):
    # partition count slightly changes compressed exchange bytes, so the
    # budget must be recorded under the gate's own session shape
    spark = get_spark("shuffle-budget", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    rows = measure(spark, names)
    spark.stop()
    artifact = {
        "_meta": {
            "sf_dir": SF_DIR,
            "selection": f"top {TOP_N} by BENCH_full.json sf0.1 volume",
            "tolerance": "gate fails above max(1.2x, +0.15 MB) per metric",
        },
        "queries": rows,
    }
    out = ROOT / "SHUFFLE_BUDGET.json"
    out.write_text(json.dumps(artifact, indent=2) + "\n")
    total = sum(v["read_mb"] + v["write_mb"] for v in rows.values())
    print(f"wrote {out.name}: {len(rows)} queries, {total:.1f} MB total")


if __name__ == "__main__":
    main()
