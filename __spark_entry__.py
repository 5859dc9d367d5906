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

#: The driver hash-checks the FIRST 50 registered queries. Round-5 rotation
#: completes the evidence burn-down: rounds 1-4 accumulated driver-green
#: rows for 105 distinct queries (the ledger CORRECTNESS_CUMULATIVE.json,
#: regenerated from the per-round artifacts by tools/make_cumulative.py, is
#: the source of truth — no more hand-kept counts after r4's off-by-one).
#: This window keeps 7 anchors (one per major §2 family, all green in r4)
#: and fills the other 43 slots with EVERY query that has never received a
#: driver-side CORRECTNESS row: the r4 post-rotation tier (PQ / IVF+PQ /
#: SemDeDup / quality-classifier / corpus curation / CDC), the redundant
#: scalar-suite variants, and multimodal_frame_sample (orphaned from the r4
#: list by the off-by-one; restored here). After this round every query
#: registered through r4 owns a cumulative driver row. Queries ADDED in
#: round 5 land after the window in NEVER_DRIVER_CHECKED_AFTER_R5 and
#: rotate in next round; until then they are covered by the local DuckDB
#: parity mirror (tests/test_oracle_parity.py runs EVERY registered query
#: at BOTH sf0.001 and sf0.01). tests/test_rotation_accounting.py asserts
#: the three lists exactly tile the registry, so a query can never again
#: silently drop out of the accounting.
CURATED_FIRST = [
    # anchors — re-verify one representative per §2 family (all r4-green)
    "manifest_archive_plan",
    "q1_pricing_summary",
    "sessionize_events",
    "asof_purchase_prior_view",
    "dedup_minhash_lsh",
    "ann_ivf_topk",
    "corpus_curation_pipeline",
    # multimodal frame sampling — orphaned by the r4 bookkeeping slip; its
    # only driver contact ever was r1's `err: no_oracle` (it has had an
    # oracle since and passes local parity at both SFs)
    "multimodal_frame_sample",
    # window / scalar-suite variants — never driver-checked
    "window_lead_gap",
    "window_rank_suite",
    "sliding_window_counts",
    "array_funcs_suite",
    "null_handling_suite",
    "stats_corr_quantity_price",
    "approx_percentile_prices",
    # text / corpus tier — never driver-checked
    "text_normalize",
    "char_entropy_stats",
    "boilerplate_char_windows",
    "quality_classifier_scores",
    "unigram_logfreq_scores",
    "vocab_oov_rate",
    "url_canonical_dedup",
    "web_corpus_pipeline",
    "document_chunks",
    "length_bucket_padding",
    "lang_temperature_resample",
    "dataset_split_counts",
    "stratified_split_counts",
    "deterministic_group_sample",
    "split_leakage_audit",
    "data_quality_audit",
    "key_skew_profile",
    # dedup tier — never driver-checked
    "incremental_dedup_batch",
    "cluster_canonical_docs",
    "decontamination_overlap",
    "lsh_quality_eval",
    "semantic_dedup_summary",
    # ANN / embedding tier — never driver-checked (the whole PQ family)
    "ann_recall_ivf",
    "ann_recall_ivf_refined",
    "kmeans_cluster_profile",
    "embedding_quantization",
    "pq_code_histogram",
    "ann_pq_topk",
    "ann_recall_pq",
    "ann_ivfpq_topk",
    "ann_recall_ivfpq",
    "hard_negative_mining",
    # delta / temporal tier — never driver-checked
    "scd2_order_history",
    "cdc_upsert_apply",
    "ewma_user_values",
]

#: Queries registered DURING round 5 (after this window was fixed). They
#: are covered by the local two-scale DuckDB parity mirror now and rotate
#: into the round-6 window. tests/test_rotation_accounting.py enforces
#: that this list + CURATED_FIRST + the cumulative ledger exactly cover
#: the registry.
NEVER_DRIVER_CHECKED_AFTER_R5: list[str] = [
    "bm25_doc_retrieval",  # new in r5 (post-rotation); local parity both SFs
    "containment_dup_pairs",  # new in r5 (post-rotation); local parity both SFs
    "repeated_ngram_spans",  # new in r5 (post-rotation); local parity both SFs
    "cluster_safe_split",  # new in r5 (post-rotation); local parity both SFs
    "bigram_lm_scores",  # new in r5 (post-rotation); local parity both SFs
    "ivf_assignment_drift",  # new in r5 (post-rotation); local parity both SFs
    "ann_lsh_multiprobe",  # new in r5 (post-rotation); local parity both SFs
    "bloom_decontamination",  # new in r5 (post-rotation); local parity both SFs
    "knn_graph_edges",  # new in r5 (post-rotation); local parity both SFs
    "knn_label_agreement",  # new in r5 (post-rotation); local parity both SFs
    "weighted_sample_docs",  # new in r5 (post-rotation); local parity both SFs
    "source_overlap_matrix",  # new in r5 (post-rotation); local parity both SFs
    "image_phash_dedup",  # new in r5 (post-rotation); local parity both SFs
    "lang_confusion_matrix",  # new in r5 (post-rotation); local parity both SFs
    "knn_density_scores",  # new in r5 (post-rotation); local parity both SFs
    "duplicated_span_coverage",  # new in r5 (post-rotation); local parity both SFs
    "label_centroid_similarity",  # new in r5 (post-rotation); local parity both SFs
    "lang_balanced_sample",  # new in r5 (post-rotation); local parity both SFs
    "ann_sq_topk",  # new in r5 (post-rotation); local parity both SFs
    "ann_recall_sq",  # new in r5 (post-rotation); local parity both SFs
    "lang_relative_quality_gate",  # new in r5 (post-rotation); local parity both SFs
    "cms_token_frequencies",  # new in r5 (post-rotation); local parity both SFs
    "mixture_epoch_plan",  # new in r5 (post-rotation); local parity both SFs
    "rp_distance_preservation",  # new in r5 (post-rotation); local parity both SFs
    "event_transition_matrix",  # new in r5 (post-rotation); local parity both SFs
    "pareto_quality_frontier",  # new in r5 (post-rotation); local parity both SFs
    "mad_outlier_events",  # new in r5 (post-rotation); local parity both SFs
    "training_shard_plan",  # new in r5 (post-rotation); local parity both SFs
    "pmi_collocations",  # new in r5 (post-rotation); local parity both SFs
    "knn_triangle_count",  # new in r5 (post-rotation); local parity both SFs
    "hybrid_rrf_retrieval",  # new in r5 (post-rotation); local parity both SFs
    "quality_percentile_ranks",  # new in r5 (post-rotation); local parity both SFs
    "cms_join_size_estimate",  # new in r5 (post-rotation); local parity both SFs
    "hll_overlap_estimate",  # new in r5 (post-rotation); local parity both SFs
    "value_drift_psi",  # new in r5 (post-rotation); local parity both SFs
    "doc_novelty_scores",  # new in r5 (post-rotation); local parity both SFs
    "session_pattern_match",  # new in r5 (post-rotation); local parity both SFs
    "lang_kappa_score",  # new in r5 (post-rotation); local parity both SFs
    "hourly_autocorrelation",  # new in r5 (post-rotation); local parity both SFs
    "range_partition_plan",  # new in r5 (post-rotation); local parity both SFs
    "embedding_norm_outliers",  # new in r5 (post-rotation); local parity both SFs
    "conversion_latency_quartiles",  # new in r5 (post-rotation); local parity both SFs
    "basket_pair_lift",  # new in r5 (post-rotation); local parity both SFs
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
