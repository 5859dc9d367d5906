"""sf10 (100x) spot-sweep of the slowest registry queries (VERDICT r10 #5).

Every registered query has executed at sf1; the overflow rules and
plan-stability pins had only been exercised to 10x. This runs the
slowest-N queries (by the committed BENCH_full.json timings) plus any
--extra names against .stress/sf10 (lineitem ~60M rows), crash-isolated
min-of-1, with the stress plan-flip diff (SMJ / cartesian counts sf1 vs
sf10). Writes BENCH_sf10_spot.json.

Run from the repo root:
    python tools/make_stress_sf1.py                                  # once
    python tools/make_stress_sf1.py --src .stress/sf1 --out .stress/sf10
    python tools/stress_sf10_spot.py [--top 25] [--queries a,b,...]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF1 = str(ROOT / ".stress" / "sf1")
SF10 = str(ROOT / ".stress" / "sf10")


def plan_counts(df) -> tuple[int, int, int, int]:
    plan = df._jdf.queryExecution().executedPlan().toString()
    return (
        plan.count("Exchange hashpartitioning"),
        plan.count("BroadcastExchange"),
        plan.count("SortMergeJoin"),
        plan.count("CartesianProduct"),
    )


def main() -> None:
    from py_datalake_move_files_spark.catalog import TABLES, load_table
    from py_datalake_move_files_spark.queries import QUERIES
    from py_datalake_move_files_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--queries", default=None, help="extra names, comma-sep")
    args = ap.parse_args()

    bench = json.loads((ROOT / "BENCH_full.json").read_text())
    slowest = [
        n
        for n, _ in sorted(
            bench["queries"].items(), key=lambda kv: kv[1], reverse=True
        )
        if n in QUERIES
    ][: args.top]
    extra = [n for n in (args.queries or "").split(",") if n]
    names = list(dict.fromkeys(slowest + extra))

    spark = get_spark("stress-sf10-spot")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, SF10, t).count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    rows: dict[str, float] = {}
    errors: dict[str, str] = {}
    flips: list[str] = []
    for i, name in enumerate(names):
        try:
            a = plan_counts(QUERIES[name](spark, SF1))
            b = plan_counts(QUERIES[name](spark, SF10))
            if a[2:] != b[2:]:  # SMJ or cartesian count changed with scale
                flips.append(f"{name}: sf1 {a} -> sf10 {b}")
            t0 = time.perf_counter()
            mat(QUERIES[name](spark, SF10))
            rows[name] = round(time.perf_counter() - t0, 3)
            print(f"[{i + 1}/{len(names)}] {name}: {rows[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — crash isolation
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(
                f"[{i + 1}/{len(names)}] {name}: ERROR {errors[name][:120]}",
                flush=True,
            )

    out = {
        "metric": "registry_sf10_spot_sweep",
        "unit": "sec",
        "sf": 10.0,
        "queries_timed": len(rows),
        "total": round(sum(rows.values()), 3),
        "errors": errors,
        "plan_flips": flips or "none",
        "queries": rows,
    }
    (ROOT / "BENCH_sf10_spot.json").write_text(json.dumps(out, indent=2) + "\n")
    print(
        json.dumps(
            {k: out[k] for k in ("queries_timed", "total", "plan_flips")},
            default=str,
        )
    )
    print(f"errors: {len(errors)}")
    spark.stop()


if __name__ == "__main__":
    main()
