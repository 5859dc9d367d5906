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

#: The driver hash-checks the FIRST 50 registered queries. Round-9 window:
#: the ledger (CORRECTNESS_CUMULATIVE.json, regenerated at round start by
#: tools/make_cumulative.py — the single source of truth) holds 251
#: cumulatively driver-green queries after folding round 8's 50/50 green
#: artifact. The only registered queries without a driver row are the 17
#: round-8 additions that were queued last round; ALL 17 fill this window
#: (listed first), alongside 33 cumulative-green anchors covering every
#: §2 family (rotated to different representatives than round 8's anchor
#: set, so the ledger keeps getting re-verified breadth-first). A green
#: round 9 means 268/268 registered-through-r8 queries own a driver-green
#: row. Queries ADDED in round 9 land in QUEUED_FOR_NEXT_WINDOW and
#: rotate in next round; until then they are covered by the local DuckDB
#: parity mirror (tests/test_oracle_parity.py runs EVERY registered query
#: at BOTH sf0.001 and sf0.01). tests/test_rotation_accounting.py asserts
#: the three lists exactly tile the registry, so a query can never
#: silently drop out of the accounting.
CURATED_FIRST = [
    # round-8 additions, never driver-checked (queued last round) — all 17
    "cumulative_distinct_users",
    "event_order_violations",
    "partition_compaction_plan",
    "token_budget_waterfill",
    "jackknife_mean_quality",
    "markov_two_step_reach",
    "elasticity_by_segment",
    "simplified_silhouette",
    "ql_dirichlet_retrieval",
    "winnowing_fingerprints",
    "mmr_rerank_retrieval",
    "consistent_hash_shards",
    "quantile_normalize_lengths",
    "prf_query_expansion",
    "seasonal_naive_backtest",
    "readability_scores",
    "ctr_wilson_bounds",
    # anchors — re-verify representatives across every §2 family (all in
    # the cumulative ledger; rotated vs the round-8 anchor set)
    "manifest_archive_plan",
    "manifest_status_counts",
    "path_rewrite_ops",
    "date_range_filter",
    "json_content_predicate",
    "q3_shipping_priority",
    "q8_market_share",
    "q18_big_orders",
    "hll_overlap_estimate",
    "window_running_revenue",
    "window_rank_suite",
    "sliding_window_counts",
    "left_outer_customer_orders",
    "not_in_null_semantics",
    "interval_attribution_bucketed",
    "asof_salted_hot_keys",
    "rollup_nation_region",
    "grouping_sets_orders",
    "pivot_event_type_counts",
    "percentile_prices",
    "multimodal_decode_features",
    "array_funcs_suite",
    "map_funcs_suite",
    "dedup_exact",
    "dedup_ngram_jaccard",
    "lang_id",
    "token_counts",
    "ann_brute_force",
    "ann_lsh_multiprobe",
    "ann_pq_topk",
    "web_corpus_pipeline",
    "hybrid_rrf_retrieval",
    "knn_components",
]

#: Queries registered DURING round 9 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-10 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry, and that every queued name actually runs at sf0.001
#: (the r6 snapshot-commit gate).
QUEUED_FOR_NEXT_WINDOW: list[str] = [
    "table_profile_orders_approx",
    # round-9 evaluation/measurement tier (queries_eval.py)
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
