"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Implementation lives in ``py_datalake_move_files_spark.queries``.
"""

from __future__ import annotations

import sys
from collections.abc import Callable
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, str(Path(__file__).resolve().parent))

from py_datalake_move_files_spark.queries import ORACLE, QUERIES  # noqa: E402

#: The driver hash-checks the FIRST 50 registered queries. Round-4 rotation:
#: rounds 1-3 accumulated driver-green rows for 64 distinct queries; this
#: window keeps 8 anchors (one per major §2 family, all green in r3) and
#: fills the other 42 slots with queries that had NEVER received a
#: driver-side CORRECTNESS row when the rotation was set (TPC-H tail
#: q2/q6-q20/q22, the profiling/analytics tier, the four r3 scale queries,
#: heavy hitters, tfidf, funnel/cohort, audio multimodal, map funcs).
#: After this round the cumulative driver coverage is 64 + 42 = 106 of the
#: 148 now registered; the 42 names past the window (31 operators added
#: during round 4 after the rotation was fixed — including the late-r4 PQ
#: / IVF+PQ / quality-classifier / SemDeDup / unigram-LM / URL-dedup /
#: CDC-merge / chunking / hard-negative tier — plus 11 redundant
#: scalar-suite variants of driver-green queries) rotate into the window
#: in round 5, enumerated in ``NEVER_DRIVER_CHECKED_AFTER_R4`` below. All
#: 42 are covered by the local DuckDB parity mirror, which runs EVERY
#: registered query at BOTH sf0.001 and sf0.01 (tests/test_oracle_parity
#: two-scale matrix) pending their driver rows.
CURATED_FIRST = [
    # anchors — re-verify one representative per §2 family (all r3-green)
    "manifest_archive_plan",
    "q1_pricing_summary",
    "q5_region_revenue",
    "sessionize_events",
    "asof_purchase_prior_view",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "corpus_curation_pipeline",
    # TPC-H tail — never driver-checked before this round
    "q2_min_price_supplier",
    "q6_revenue_filter",
    "q7_bilateral_volume",
    "q8_market_share",
    "q9_profit_by_nation",
    "q10_returned_items",
    "q11_important_parts",
    "q12_latency_priority_counts",
    "q13_order_distribution",
    "q14_promo_revenue_ratio",
    "q15_top_supplier",
    "q16_brand_supplier_count",
    "q17_small_qty_revenue",
    "q18_big_orders",
    "q19_disjunctive_revenue",
    "q20_dominant_suppliers",
    "q22_idle_rich_customers",
    # r3 scale tier — never driver-checked
    "event_dedup_tumbling",
    "fuzzy_customer_pairs",
    "skew_salted_event_join",
    "pagerank_nation_flow",
    # profiling / analytics tier — never driver-checked
    "funnel_conversion",
    "cohort_retention",
    "tfidf_top_terms",
    "value_histogram",
    "table_profile_orders",
    "winsorized_value_stats",
    "regr_trend_by_nation",
    "incremental_agg_merge",
    "snapshot_diff_counts",
    "zorder_locality",
    "date_gap_fill",
    # subquery / window variants — never driver-checked
    "lateral_topk_orders",
    "recursive_cte_tree_depth",
    # r4's new hot-key salted as-of join (benched this round)
    "asof_salted_hot_keys",
    # corpus / text / multimodal tier — never driver-checked
    "heavy_hitter_tokens",
    "corpus_gate_counts",
    "source_mixture_counts",
    "sequence_packing_stats",
    "ivf_list_sizes",
    "multimodal_audio_features",
    "map_funcs_suite",
]

#: Still without a driver-side CORRECTNESS row after round 4: the first 31
#: are NEW r4 operators (registered after the 50-slot window was fixed for
#: the round — novel capabilities, not variants); the last 11 are redundant
#: variants of driver-green queries. All 42 stay covered by the local DuckDB
#: parity mirror in tests/test_oracle_parity.py. Rotate ALL of these into
#: the window in round 5, prioritizing the 31 new operators.
NEVER_DRIVER_CHECKED_AFTER_R4 = [
    "ann_recall_ivf",  # new in r4 (post-rotation); local parity both SFs
    "key_skew_profile",  # new in r4 (post-rotation); local parity both SFs
    "scd2_order_history",  # new in r4 (post-rotation); local parity both SFs
    "decontamination_overlap",  # new in r4 (post-rotation); local parity both SFs
    "vocab_oov_rate",  # new in r4 (post-rotation); local parity both SFs
    "kmeans_cluster_profile",  # new in r4 (post-rotation); local parity both SFs
    "data_quality_audit",  # new in r4 (post-rotation); local parity both SFs
    "lang_temperature_resample",  # new in r4 (post-rotation); local parity both SFs
    "incremental_dedup_batch",  # new in r4 (post-rotation); local parity both SFs
    "ewma_user_values",  # new in r4 (post-rotation); local parity both SFs
    "cluster_canonical_docs",  # new in r4 (post-rotation); local parity both SFs
    "embedding_quantization",  # new in r4 (post-rotation); local parity both SFs
    "ann_recall_ivf_refined",  # new in r4 (post-rotation); local parity both SFs
    "lsh_quality_eval",  # new in r4 (post-rotation); local parity both SFs
    "boilerplate_char_windows",  # new in r4 (post-rotation); local parity both SFs
    "split_leakage_audit",  # new in r4 (post-rotation); local parity both SFs
    "pq_code_histogram",  # new in r4 (post-rotation); local parity both SFs
    "ann_pq_topk",  # new in r4 (post-rotation); local parity both SFs
    "ann_recall_pq",  # new in r4 (post-rotation); local parity both SFs
    "ann_ivfpq_topk",  # new in r4 (post-rotation); local parity both SFs
    "ann_recall_ivfpq",  # new in r4 (post-rotation); local parity both SFs
    "quality_classifier_scores",  # new in r4 (post-rotation); local parity both SFs
    "semantic_dedup_summary",  # new in r4 (post-rotation); local parity both SFs
    "unigram_logfreq_scores",  # new in r4 (post-rotation); local parity both SFs
    "url_canonical_dedup",  # new in r4 (post-rotation); local parity both SFs
    "cdc_upsert_apply",  # new in r4 (post-rotation); local parity both SFs
    "web_corpus_pipeline",  # new in r4 (post-rotation); local parity both SFs
    "document_chunks",  # new in r4 (post-rotation); local parity both SFs
    "hard_negative_mining",  # new in r4 (post-rotation); local parity both SFs
    "stratified_split_counts",  # new in r4 (post-rotation); local parity both SFs
    "length_bucket_padding",  # new in r4 (post-rotation); local parity both SFs
    "sliding_window_counts",
    "window_lead_gap",
    "array_funcs_suite",
    "null_handling_suite",
    "stats_corr_quantity_price",
    "approx_percentile_prices",
    "text_normalize",
    "dataset_split_counts",
    "deterministic_group_sample",
    "char_entropy_stats",
    "window_rank_suite",
]


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
