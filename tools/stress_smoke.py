"""Repeatable 10x stress smoke (VERDICT r7 #7, institutionalized).

Re-runs the top-N slowest queries (per BENCH_full.json) against the
.stress/sf1 dataset (tools/make_stress_sf1.py), records min-of-2 timings
plus the ratio vs 10x-linear scaling, and diffs the physical-plan join
shape (hash-exchange / broadcast / SMJ / cartesian counts) between
sf0.01 and sf1 to catch AQE plan flips. Writes BENCH_sf1_spot.json.

Run from the repo root (generate the data first if absent):
    python tools/make_stress_sf1.py   # once
    python tools/stress_smoke.py [N]
"""

from __future__ import annotations

import json
import re
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF01 = "/root/testdata/sf0.01"
SF_BASE = "/root/testdata/sf0.1"
SF1 = str(ROOT / ".stress" / "sf1")


def plan_counts(df) -> tuple[int, int, int, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        plan.count("Exchange hashpartitioning"),
        plan.count("BroadcastExchange"),
        plan.count("SortMergeJoin"),
        plan.count("CartesianProduct"),
    )


def main() -> None:
    n_top = int(sys.argv[1]) if len(sys.argv) > 1 else 10
    base = json.loads((ROOT / "BENCH_full.json").read_text())["queries"]
    top = [q for q, _ in sorted(base.items(), key=lambda kv: -kv[1])[:n_top]]

    from py_datalake_move_files_spark.catalog import TABLES, load_table
    from py_datalake_move_files_spark.queries import QUERIES
    from py_datalake_move_files_spark.session import get_spark

    spark = get_spark("stress-smoke")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, SF1, t).count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    rows, flips = {}, []
    for name in top:
        a = plan_counts(QUERIES[name](spark, SF01))
        b = plan_counts(QUERIES[name](spark, SF1))
        if a[2:] != b[2:]:  # SMJ or cartesian count changed with scale
            flips.append(f"{name}: sf0.01 {a} -> sf1 {b}")
        mat(QUERIES[name](spark, SF1))  # warm-up
        best = float("inf")
        for _ in range(2):
            t0 = time.perf_counter()
            mat(QUERIES[name](spark, SF1))
            best = min(best, time.perf_counter() - t0)
        rows[name] = {
            "sf1_sec": round(best, 3),
            "sf01_sec": base.get(name),
            "ratio_vs_10x_linear": round(best / base[name] / 10, 3),
        }
        print(
            f"{name}: {best:.2f}s ({rows[name]['ratio_vs_10x_linear']}x of"
            f" linear) plans sf0.01={a} sf1={b}",
            flush=True,
        )

    out = {
        "metric": f"sf1_stress_smoke_top{n_top}_total",
        "value": round(sum(r["sf1_sec"] for r in rows.values()), 3),
        "unit": "sec",
        "sf": 1.0,
        "data": ".stress/sf1 (tools/make_stress_sf1.py)",
        "note": "min-of-2 after warm-up; ratio < 1.0 = sub-linear at 10x",
        "plan_flips": flips or "none",
        "queries": rows,
    }
    (ROOT / "BENCH_sf1_spot.json").write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({"total": out["value"], "flips": flips}))
    spark.stop()


if __name__ == "__main__":
    main()
