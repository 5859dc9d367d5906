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

#: The driver hash-checks the FIRST 50 registered queries. Round-10 window:
#: the ledger (CORRECTNESS_CUMULATIVE.json, regenerated at round start by
#: tools/make_cumulative.py — the single source of truth) holds 268
#: cumulatively driver-green queries after folding round 9's 50/50 green
#: artifact. The only registered queries without a driver row are the 16
#: round-9 additions that were queued last round; ALL 16 fill this window
#: (listed first), alongside 34 cumulative-green anchors covering every
#: §2 family (rotated to different representatives than round 9's anchor
#: set, so the ledger keeps getting re-verified breadth-first). A green
#: round 10 means 284/284 registered-through-r9 queries own a driver-green
#: row. Queries ADDED in round 10 land in QUEUED_FOR_NEXT_WINDOW and
#: rotate in next round; until then they are covered by the local DuckDB
#: parity mirror (tests/test_oracle_parity.py runs EVERY registered query
#: at BOTH sf0.001 and sf0.01). tests/test_rotation_accounting.py asserts
#: the three lists exactly tile the registry, so a query can never
#: silently drop out of the accounting.
CURATED_FIRST = [
    # round-9 additions, never driver-checked (queued last round) — all 16
    "table_profile_orders_approx",
    "ndcg_retrieval_eval",
    "ks_test_doc_lengths",
    "zipf_slope_tokens",
    "temporal_decay_weights",
    "profile_drift_report",
    "l_diversity_audit",
    "stratified_kfold_assignment",
    "token_burstiness",
    "bootstrap_ci_mean",
    "permutation_test_events",
    "bigram_conditional_entropy",
    "embedding_mean_shift_mmd",
    "doc_length_moments",
    "neyman_allocation_plan",
    "knn_mutual_pairs",
    # anchors — re-verify representatives across every §2 family (all in
    # the cumulative ledger; rotated vs the round-9 anchor set)
    "path_rewrite_compat",
    "filter_reason_cascade",
    "json_probe_exact",
    "props_key_stats",
    "q1_pricing_summary",
    "q5_region_revenue",
    "q9_profit_by_nation",
    "q13_order_distribution",
    "q21_late_exclusive_suppliers",
    "semi_join_active_customers",
    "anti_join_inactive_customers",
    "full_outer_nation_presence",
    "range_join_value_buckets",
    "asof_purchase_prior_view",
    "skew_salted_event_join",
    "scalar_subquery_above_avg",
    "agg_distinct_stats",
    "cube_priority_status",
    "approx_percentile_prices",
    "unpivot_lineitem_metrics",
    "window_latest_order",
    "window_range_frame",
    "sessionize_events",
    "set_ops_segments",
    "string_funcs_suite",
    "date_funcs_suite",
    "null_handling_suite",
    "dedup_minhash_lsh",
    "simhash_dup_pairs",
    "ann_ivf_topk",
    "embedding_near_dup",
    "quality_scores",
    "bm25_doc_retrieval",
    "multimodal_frame_sample",
]

#: Queries registered DURING round 10 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-11 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry, and that every queued name actually runs at sf0.001
#: (the r6 snapshot-commit gate).
QUEUED_FOR_NEXT_WINDOW: list[str] = [
    # r10 additions
    "doc_novelty_scores_sampled",
    "table_profile_orders_approx_only",
    # r10 governance/measurement tier (queries_audit.py)
    "t_closeness_audit",
    "mann_whitney_u_events",
    "bpe_merge_candidates",
    "mattr_lexical_diversity",
    "chernoff_sample_size_plan",
    "decision_stump_quality",
    "token_log_odds_langs",
    "dataset_card_summary",
    "spearman_chars_tokens",
    "kendall_tau_rankers",
    "mixture_temperature_sweep",
    "ab_power_sample_size",
    "hapax_legomena_rate",
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
