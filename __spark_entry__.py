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

#: The driver hash-checks the FIRST 50 registered queries. Round-7 window:
#: the ledger (CORRECTNESS_CUMULATIVE.json, regenerated at round start by
#: tools/make_cumulative.py — the single source of truth) holds 190
#: cumulatively driver-green queries after folding round 6's 49/50 green
#: artifact. 37 registered queries have never owned a driver row: the 34
#: round-6 additions that were correctly queued, the two that escaped the
#: queue in the r6 snapshot commit (ab_conversion_ztest — degenerate-z
#: crash now guarded; cohort_ltv_matrix), and training_shard_plan (red on
#: an oracle HUGEINT/BIGINT typing artifact, now CAST-fixed). All 37 fill
#: this window alongside 13 cumulative-green anchors (one per §2 family).
#: After this round every registered-through-r6 query owns a driver row.
#: Queries ADDED in round 7 land in QUEUED_FOR_NEXT_WINDOW and rotate in
#: next round; until then they are covered by the local DuckDB parity
#: mirror (tests/test_oracle_parity.py runs EVERY registered query at BOTH
#: sf0.001 and sf0.01). tests/test_rotation_accounting.py asserts the
#: three lists exactly tile the registry, so a query can never silently
#: drop out of the accounting.
CURATED_FIRST = [
    # anchors — re-verify one representative per §2 family (all green)
    "manifest_archive_plan",
    "q1_pricing_summary",
    "sessionize_events",
    "asof_purchase_prior_view",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "corpus_curation_pipeline",
    "bm25_doc_retrieval",
    "bloom_decontamination",
    "cms_token_frequencies",
    "quality_scores",
    "semantic_dedup_summary",
    "json_probe_exact",
    # red-row retries — fixed this round, re-check first
    "training_shard_plan",  # oracle sums now CAST AS BIGINT
    "ab_conversion_ztest",  # degenerate z denominator NULL-guarded
    "cohort_ltv_matrix",  # orphaned in r6 snapshot; local parity both SFs
    # round-6 additions, never driver-checked (queued last round)
    "retention_cohorts",
    "yoy_monthly_growth",
    "zipf_slope",
    "tfidf_doc_pairs",
    "embedding_dim_correlations",
    "doc_length_by_lang",
    "kcenter_coreset",
    "length_ks_matrix",
    "source_lang_chi2",
    "token_packing_plan",
    "dau_wau_stickiness",
    "quality_dup_calibration",
    "knn_components",
    "lsh_threshold_curve",
    "trimmed_mean_prices",
    "revenue_gini",
    "event_hour_mix_chi2",
    "revenue_top_decile_share",
    "interarrival_burstiness",
    "dup_cluster_size_histogram",
    "lead_time_quartiles",
    "heaps_law_fit",
    "record_linkage_scores",
    "seasonal_daily_decomposition",
    "theil_sen_revenue_trend",
    "dim_label_mutual_info",
    "benford_order_values",
    "pca_top_component",
    "kaplan_meier_retention",
    "daily_count_cusum",
    "knn_degree_assortativity",
    "knn_local_clustering",
    "rfm_customer_segments",
    "hill_tail_index",
]

#: Queries registered DURING round 7 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-8 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry, and that every queued name actually runs at sf0.001
#: (the r6 snapshot-commit gate).
QUEUED_FOR_NEXT_WINDOW: list[str] = [
    "simhash_dup_pairs",  # new in r7; local parity both SFs
    "value_purchase_auc",  # new in r7; local parity both SFs
    "mann_kendall_trend",  # new in r7; local parity both SFs
    "changepoint_daily_events",  # new in r7; local parity both SFs
    "ols_revenue_model",  # new in r7; local parity both SFs
    "knn_link_prediction",  # new in r7; local parity both SFs
    "js_source_divergence",  # new in r7; local parity both SFs
    "weekday_anova_events",  # new in r7; local parity both SFs
    "k_anonymity_audit",  # new in r7; local parity both SFs
    "truncated_dim_recall",  # new in r7; local parity both SFs
    "rich_club_coefficient",  # new in r7; local parity both SFs
    "effective_sample_size",  # new in r7; local parity both SFs
    "weighted_median_price",  # new in r7; local parity both SFs
    "token_novelty_curve",  # new in r7; local parity both SFs
    "user_event_entropy",  # new in r7; local parity both SFs
    "ks_source_screen_bh",  # new in r7; local parity both SFs
    "revenue_hhi_concentration",  # new in r7; local parity both SFs
    "median_dkw_band",  # new in r7; local parity both SFs
    "seasonal_adjusted_anomalies",  # new in r7; local parity both SFs
    "purchase_decile_lift",  # new in r7; local parity both SFs
    "knn_hop_histogram",  # new in r7; local parity both SFs
    "embedding_dim_quantile_clip",  # new in r7; local parity both SFs
    "rolling_median_daily",  # new in r7; local parity both SFs
    "modal_event_type_by_user",  # new in r7; local parity both SFs
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
