"""Warm min-of-2 sf1+sf10 spot sweep of the scale-watch families.

The VERDICT r11 #7 / r12 #7 protocol, as a committed runner so the numbers
carry no end-of-round pressure: ONE warm session (every table touched at
both SFs first, no artifact families involved — the swept queries build
everything they time), min-of-2 per query at sf1 AND sf10, ratios from the
same session. Default query set = the r12 capped pair-generator family
plus the r13 rewrite targets (profile family, weighted median, novelty).

Run from a repo checkout root (HEAD or a before-worktree):

    python tools/spot_capped_family.py [--out FILE] [--queries a,b,...]

Requires .stress/sf1 and .stress/sf10 (tools/make_stress_sf1.py).
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

NAMES = [
    # the r12 capped pair-generator family (quadratic before r12)
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "source_overlap_matrix",
    "lsh_quality_eval",
    "simhash_dup_pairs",
    "lsh_threshold_curve",
    "lsh_quality_eval_sampled",
    "lsh_threshold_curve_sampled",
    # r13 rewrite targets
    "table_profile_orders",
    "table_profile_orders_approx",
    "weighted_median_price",
    "doc_novelty_scores",
    "doc_novelty_scores_sampled",
]


def main() -> None:
    from py_datalake_move_files_spark.catalog import TABLES, load_table
    from py_datalake_move_files_spark.queries import QUERIES
    from py_datalake_move_files_spark.session import get_spark

    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=str(ROOT / "SPOT_capped_family.json"))
    ap.add_argument("--queries", default=",".join(NAMES))
    args = ap.parse_args()
    names = [n for n in args.queries.split(",") if n]

    spark = get_spark("spot-capped-family")
    spark.sparkContext.setLogLevel("ERROR")
    for sf_dir in (SF1, SF10):
        for t in TABLES:
            load_table(spark, sf_dir, t).count()

    def mat(df):
        df.write.format("noop").mode("overwrite").save()

    out: dict = {"protocol": (
        "one warm session (all tables touched at both SFs), min-of-2 per "
        "query at sf1 AND sf10, ratios from the same session — the "
        "VERDICT r11 #7 warm spot protocol"
    )}
    errors: dict[str, str] = {}
    for label, sf_dir in (("sf1", SF1), ("sf10", SF10)):
        times: dict[str, float] = {}
        for name in names:
            spark.sparkContext.setJobDescription(f"spot:{label}:{name}")
            try:
                best = float("inf")
                for _ in range(2):
                    t0 = time.perf_counter()
                    mat(QUERIES[name](spark, sf_dir))
                    best = min(best, time.perf_counter() - t0)
                times[name] = round(best, 3)
                print(f"{label} {name}: {times[name]}", flush=True)
            except Exception as exc:  # noqa: BLE001 — crash isolation
                errors[f"{label}:{name}"] = f"{type(exc).__name__}: {exc}"[:300]
        out[label] = times
    out["sf10_over_sf1"] = {
        n: round(out["sf10"][n] / out["sf1"][n], 1)
        for n in names
        if out.get("sf1", {}).get(n) and out.get("sf10", {}).get(n)
    }
    if errors:
        out["errors"] = errors
    Path(args.out).write_text(json.dumps(out, indent=2) + "\n")
    print(json.dumps(out["sf10_over_sf1"], indent=2))
    spark.stop()


if __name__ == "__main__":
    main()
