"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``py_datalake_move_files_spark.queries``.
"""

from __future__ import annotations

import json
import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from py_datalake_move_files_spark.queries import ORACLE, QUERIES  # noqa: E402

#: The driver hash-checks the FIRST 50 registered queries. Round-12 window:
#: the ledger (CORRECTNESS_CUMULATIVE.json, regenerated at round start by
#: tools/make_cumulative.py — the single source of truth) holds 299
#: cumulatively driver-green queries after folding round 11's 50/50 green
#: artifact. The only registered queries without a driver row are the 15
#: round-11 additions that were queued last round (the measurement tier in
#: queries_measure.py); ALL 15 fill this window (listed first), alongside
#: 35 cumulative-green anchors chosen by STALENESS — the 35 ledger queries
#: least recently re-verified by a driver round (all last green in rounds
#: 4-5), so rotation stays a deterministic least-recently-verified policy.
#: The anchor set happens to include `lsh_quality_eval` and
#: `table_profile_orders` — both touched by this round's scale work — so
#: their updated oracles get a fresh driver row immediately. A green round
#: 12 means 314/314 registered-through-r11 queries own a driver-green row.
#: Queries ADDED in round 12 land in QUEUED_FOR_NEXT_WINDOW and rotate in
#: next round; until then they are covered by the local DuckDB parity
#: mirror (tests/test_oracle_parity.py runs EVERY registered query at BOTH
#: sf0.001 and sf0.01). tests/test_rotation_accounting.py asserts the
#: three lists exactly tile the registry, so a query can never silently
#: drop out of the accounting.
CURATED_FIRST = [
    # round-11 additions, never driver-checked (queued last round) — all 15
    "compression_ratio_stats",
    "vocab_coverage_curve",
    "odds_ratio_priority_ci",
    "cramers_v_categorical",
    "mcnemar_quality_rules",
    "fleiss_kappa_raters",
    "grubbs_outlier_prices",
    "runs_test_daily_events",
    "page_hinkley_daily_events",
    "bhattacharyya_lang_lengths",
    "kl_source_unigram",
    "embedding_isotropy_stats",
    "brier_calibration_bins",
    "wilcoxon_signed_rank_users",
    "brown_forsythe_events",
    # anchors — the 35 least-recently-driver-verified ledger queries
    # (last green r4-r5), re-verified breadth-first by staleness
    "q6_revenue_filter",
    "q7_bilateral_volume",
    "recursive_cte_tree_depth",
    "regr_trend_by_nation",
    "sequence_packing_stats",
    "snapshot_diff_counts",
    "source_mixture_counts",
    "table_profile_orders",
    "tfidf_top_terms",
    "value_histogram",
    "winsorized_value_stats",
    "zorder_locality",
    "ann_recall_ivf",
    "ann_recall_ivf_refined",
    "ann_recall_ivfpq",
    "ann_recall_pq",
    "boilerplate_char_windows",
    "cdc_upsert_apply",
    "char_entropy_stats",
    "cluster_canonical_docs",
    "data_quality_audit",
    "dataset_split_counts",
    "decontamination_overlap",
    "deterministic_group_sample",
    "document_chunks",
    "embedding_quantization",
    "ewma_user_values",
    "hard_negative_mining",
    "incremental_dedup_batch",
    "key_skew_profile",
    "kmeans_cluster_profile",
    "lang_temperature_resample",
    "length_bucket_padding",
    "lsh_quality_eval",
    "pq_code_histogram",
]

#: Queries registered DURING round 12 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-13 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry, and that every queued name actually runs at sf0.001
#: (the r6 snapshot-commit gate).
QUEUED_FOR_NEXT_WINDOW: list[str] = [
    # r12 sampled production twins of the pair-eval queries (VERDICT r11 #4)
    "lsh_quality_eval_sampled",
    "lsh_threshold_curve_sampled",
]


def _cumulative_green() -> set[str]:
    """Names with a driver-green row in any prior round, per the committed
    ledger (tools/make_cumulative.py regenerates it from CORRECTNESS_r*)."""
    p = Path(__file__).resolve().parent / "CORRECTNESS_CUMULATIVE.json"
    return set(json.loads(p.read_text())) if p.exists() else set()


def _ordered(src: dict) -> dict:
    head = {n: src[n] for n in CURATED_FIRST if n in src}
    tail = {n: v for n, v in src.items() if n not in head}
    return {**head, **tail}


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the manifest archive plan
    (the reference's pipeline A as one declarative Spark plan)."""
    return QUERIES["manifest_archive_plan"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, curated so the
    driver's 50-query correctness window covers every §2 row."""
    return _ordered(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted for sketch/approx ops,
    which get the driver's weaker rows-only check)."""
    return _ordered(ORACLE)
