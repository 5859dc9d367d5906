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

#: The driver hash-checks the FIRST 50 registered queries. Round-11 window:
#: the ledger (CORRECTNESS_CUMULATIVE.json, regenerated at round start by
#: tools/make_cumulative.py — the single source of truth) holds 284
#: cumulatively driver-green queries after folding round 10's 50/50 green
#: artifact. The only registered queries without a driver row are the 15
#: round-10 additions that were queued last round (the governance/
#: measurement tier + the two sanctioned scale variants); ALL 15 fill this
#: window (listed first), alongside 35 cumulative-green anchors chosen by
#: STALENESS — the 35 ledger queries least recently re-verified by a
#: driver round (all last green in rounds 2-4), so rotation is now a
#: deterministic least-recently-verified policy instead of a hand-picked
#: set, while still spanning every §2 family (ANN/LSH, dedup/fingerprint,
#: windows, TPC-H joins/aggs, streaming batch-twins, multimodal, graph).
#: A green round 11 means 299/299 registered-through-r10 queries own a
#: driver-green row. Queries ADDED in round 11 land in
#: QUEUED_FOR_NEXT_WINDOW and rotate in next round; until then they are
#: covered by the local DuckDB parity mirror (tests/test_oracle_parity.py
#: runs EVERY registered query at BOTH sf0.001 and sf0.01).
#: tests/test_rotation_accounting.py asserts the three lists exactly tile
#: the registry, so a query can never silently drop out of the accounting.
CURATED_FIRST = [
    # round-10 additions, never driver-checked (queued last round) — all 15
    "doc_novelty_scores_sampled",
    "table_profile_orders_approx_only",
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
    # anchors — the 35 least-recently-driver-verified ledger queries
    # (last green r2-r4), re-verified breadth-first by staleness
    "ann_lsh_multitable",
    "doc_fingerprint",
    "orders_by_month",
    "union_all_activity",
    "window_rank_parts",
    "ann_lsh_bucketed",
    "approx_distinct_users",
    "explode_token_topk",
    "hourly_event_stats",
    "pii_redaction",
    "q4_priority_exists",
    "repetition_stats",
    "topk_per_group_parts",
    "cohort_retention",
    "corpus_gate_counts",
    "date_gap_fill",
    "event_dedup_tumbling",
    "funnel_conversion",
    "heavy_hitter_tokens",
    "incremental_agg_merge",
    "ivf_list_sizes",
    "lateral_topk_orders",
    "multimodal_audio_features",
    "pagerank_nation_flow",
    "q10_returned_items",
    "q11_important_parts",
    "q12_latency_priority_counts",
    "q14_promo_revenue_ratio",
    "q15_top_supplier",
    "q16_brand_supplier_count",
    "q17_small_qty_revenue",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q22_idle_rich_customers",
    "q2_min_price_supplier",
]

#: Queries registered DURING round 11 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-11 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry, and that every queued name actually runs at sf0.001
#: (the r6 snapshot-commit gate).
QUEUED_FOR_NEXT_WINDOW: list[str] = [
    # r11 model-eval & measurement tier 2 (queries_measure.py)
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
