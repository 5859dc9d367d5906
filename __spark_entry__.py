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

#: The driver hash-checks the FIRST 50 registered queries. Round-6 rotation
#: finishes the burn-down: rounds 1-5 accumulated driver-green rows for 148
#: distinct queries (ledger CORRECTNESS_CUMULATIVE.json, regenerated from
#: the per-round artifacts by tools/make_cumulative.py — the single source
#: of truth since r4's off-by-one). This window keeps 7 anchors (one per
#: major §2 family, all cumulative-green) and fills the other 43 slots with
#: EVERY query that has never received a driver-side CORRECTNESS row — the
#: complete round-5 addition set (kNN-graph census, CMS/HLL/Bloom sketches,
#: BM25/RRF retrieval, behavioral tier, pHash dedup, SQ ANN, lake layout).
#: After this round every query registered through r5 owns a cumulative
#: driver row (191/191). Queries ADDED in round 6 land after the window in
#: QUEUED_FOR_NEXT_WINDOW and rotate in next round; until then they are
#: covered by the local DuckDB parity mirror (tests/test_oracle_parity.py
#: runs EVERY registered query at BOTH sf0.001 and sf0.01).
#: tests/test_rotation_accounting.py asserts the three lists exactly tile
#: the registry, so a query can never silently drop out of the accounting.
CURATED_FIRST = [
    # anchors — re-verify one representative per §2 family (all green)
    "manifest_archive_plan",
    "q1_pricing_summary",
    "sessionize_events",
    "asof_purchase_prior_view",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "corpus_curation_pipeline",
    # retrieval / dedup tier — added r5, never driver-checked
    "bm25_doc_retrieval",
    "hybrid_rrf_retrieval",
    "containment_dup_pairs",
    "repeated_ngram_spans",
    "duplicated_span_coverage",
    "doc_novelty_scores",
    "cluster_safe_split",
    "image_phash_dedup",
    "bloom_decontamination",
    # language / corpus tier — added r5, never driver-checked
    "bigram_lm_scores",
    "lang_relative_quality_gate",
    "lang_confusion_matrix",
    "lang_kappa_score",
    "lang_balanced_sample",
    "weighted_sample_docs",
    "mixture_epoch_plan",
    "pmi_collocations",
    "quality_percentile_ranks",
    "source_overlap_matrix",
    # ANN / embedding tier — added r5, never driver-checked
    "ann_lsh_multiprobe",
    "ann_sq_topk",
    "ann_recall_sq",
    "ivf_assignment_drift",
    "knn_graph_edges",
    "knn_label_agreement",
    "knn_density_scores",
    "knn_triangle_count",
    "label_centroid_similarity",
    "rp_distance_preservation",
    "embedding_norm_outliers",
    # sketch tier — added r5, never driver-checked
    "cms_token_frequencies",
    "cms_join_size_estimate",
    "hll_overlap_estimate",
    "value_drift_psi",
    # behavioral analytics tier — added r5, never driver-checked
    "event_transition_matrix",
    "session_pattern_match",
    "pareto_quality_frontier",
    "mad_outlier_events",
    "hourly_autocorrelation",
    "conversion_latency_quartiles",
    "basket_pair_lift",
    # lake-layout tier — added r5, never driver-checked
    "range_partition_plan",
    "training_shard_plan",
]

#: Queries registered DURING round 6 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-7 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry.
QUEUED_FOR_NEXT_WINDOW: list[str] = [
    "retention_cohorts",  # new in r6; local parity both SFs
    "yoy_monthly_growth",  # new in r6; local parity both SFs
    "zipf_slope",  # new in r6; local parity both SFs
    "tfidf_doc_pairs",  # new in r6; local parity both SFs
    "embedding_dim_correlations",  # new in r6; local parity both SFs
    "doc_length_by_lang",  # new in r6; local parity both SFs
    "kcenter_coreset",  # new in r6; local parity both SFs
    "length_ks_matrix",  # new in r6; local parity both SFs
    "source_lang_chi2",  # new in r6; local parity both SFs
    "token_packing_plan",  # new in r6; local parity both SFs
    "dau_wau_stickiness",  # new in r6; local parity both SFs
    "quality_dup_calibration",  # new in r6; local parity both SFs
    "knn_components",  # new in r6; local parity both SFs
    "lsh_threshold_curve",  # new in r6; local parity both SFs
    "trimmed_mean_prices",  # new in r6; local parity both SFs
    "revenue_gini",  # new in r6; local parity both SFs
    "event_hour_mix_chi2",  # new in r6; local parity both SFs
    "revenue_top_decile_share",  # new in r6; local parity both SFs
    "interarrival_burstiness",  # new in r6; local parity both SFs
    "dup_cluster_size_histogram",  # new in r6; local parity both SFs
    "lead_time_quartiles",  # new in r6; local parity both SFs
    "heaps_law_fit",  # new in r6; local parity both SFs
    "record_linkage_scores",  # new in r6; local parity both SFs
    "seasonal_daily_decomposition",  # new in r6; local parity both SFs
    "theil_sen_revenue_trend",  # new in r6; local parity both SFs
    "dim_label_mutual_info",  # new in r6; local parity both SFs
    "benford_order_values",  # new in r6; local parity both SFs
    "pca_top_component",  # new in r6; local parity both SFs
    "kaplan_meier_retention",  # new in r6; local parity both SFs
    "daily_count_cusum",  # new in r6; local parity both SFs
    "knn_degree_assortativity",  # new in r6; local parity both SFs
    "knn_local_clustering",  # new in r6; local parity both SFs
    "rfm_customer_segments",  # new in r6; local parity both SFs
    "hill_tail_index",  # new in r6; local parity both SFs
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
