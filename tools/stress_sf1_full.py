"""One-shot sf1 (10x) sweep of the ENTIRE registry (VERDICT r9 #4).

The slowest-40 + the r9/r10 tiers were already sf1-validated; this runs
every OTHER registered query once against .stress/sf1, crash-isolated,
with the stress_smoke plan-flip diff (SMJ / cartesian counts sf0.01 vs
sf1). min-of-1 by design — the goal is errors + plan flips + gross
super-linearity, not tight timings. Writes BENCH_sf1_full.json.

Run from the repo root (generate data first if absent):
    python tools/make_stress_sf1.py   # once
    python tools/stress_sf1_full.py [--all]
"""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

ROOT = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(ROOT))

SF01 = "/root/testdata/sf0.01"
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
    import argparse

    from py_datalake_move_files_spark.catalog import TABLES, load_table
    from py_datalake_move_files_spark.queries import QUERIES
    from py_datalake_move_files_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--queries",
        default=None,
        help="comma-separated subset (post-sweep registrations); the"
        " sidecar then MERGES into the existing BENCH_sf1_full.json",
    )
    args = ap.parse_args()
    names = (
        [n for n in args.queries.split(",") if n]
        if args.queries
        else sorted(QUERIES)
    )
    unknown = set(names) - set(QUERIES)
    if unknown:
        ap.error(f"unknown queries: {sorted(unknown)}")
    spark = get_spark("stress-sf1-full")
    spark.sparkContext.setLogLevel("ERROR")
    for t in TABLES:
        load_table(spark, SF1, t).count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    rows: dict[str, float] = {}
    errors: dict[str, str] = {}
    flips: list[str] = []
    for i, name in enumerate(names):
        try:
            a = plan_counts(QUERIES[name](spark, SF01))
            b = plan_counts(QUERIES[name](spark, SF1))
            if a[2:] != b[2:]:  # SMJ or cartesian count changed with scale
                flips.append(f"{name}: sf0.01 {a} -> sf1 {b}")
            t0 = time.perf_counter()
            mat(QUERIES[name](spark, SF1))
            rows[name] = round(time.perf_counter() - t0, 3)
            print(f"[{i + 1}/{len(names)}] {name}: {rows[name]}s", flush=True)
        except Exception as exc:  # noqa: BLE001 — crash isolation
            errors[name] = f"{type(exc).__name__}: {exc}"[:300]
            print(f"[{i + 1}/{len(names)}] {name}: ERROR {errors[name][:120]}",
                  flush=True)

    side = ROOT / "BENCH_sf1_full.json"
    if args.queries and side.exists():
        # subset run: merge the new timings into the full-sweep sidecar so
        # every registered query keeps exactly one sf1 row. Reconcile state
        # transitions (ADVICE r11): a re-run name leaves whichever of
        # {timed, errored} it no longer is — otherwise a recovered query
        # kept its stale error and a newly-broken one kept its stale time.
        out = json.loads(side.read_text())
        stale_err = out.setdefault("errors", {})
        for name in names:
            stale_err.pop(name, None)
        for name in errors:
            out["queries"].pop(name, None)
        out["queries"].update(rows)
        out["queries_timed"] = len(out["queries"])
        out["total"] = round(sum(out["queries"].values()), 3)
        prior = out.get("plan_flips")
        prior = [] if prior in ("none", None) else list(prior)
        out["plan_flips"] = (prior + flips) or "none"
        stale_err.update(errors)
    else:
        out = {
            "metric": "registry_sf1_full_sweep",
            "unit": "sec",
            "sf": 1.0,
            "queries_timed": len(rows),
            "total": round(sum(rows.values()), 3),
            "errors": errors,
            "plan_flips": flips or "none",
            "queries": rows,
        }
    side.write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps({k: out[k] for k in
                      ("queries_timed", "total", "plan_flips")},
                     default=str))
    print(f"errors: {len(errors)}")
    spark.stop()


if __name__ == "__main__":
    main()
