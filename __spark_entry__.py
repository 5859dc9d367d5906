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

#: The driver hash-checks the FIRST 50 registered queries. Round-13 window:
#: the ledger (CORRECTNESS_CUMULATIVE.json, regenerated at round start by
#: tools/make_cumulative.py — the single source of truth) holds 314
#: cumulatively driver-green queries after folding round 12's 50/50 green
#: artifact. The only registered queries without a driver row are the two
#: r12 sampled eval twins queued last round; both fill this window (listed
#: first), alongside 48 cumulative-green anchors chosen by STALENESS — the
#: 48 ledger queries least recently re-verified by a driver round (all
#: last green in rounds 5-7), deterministic (last-green round, then name).
#: The anchor set happens to include `split_leakage_audit`,
#: `source_overlap_matrix`, and `doc_novelty_scores` — all plan-touched or
#: re-measured by this optimization round — so they get fresh driver rows
#: immediately. No queries were added in round 13 (optimization round), so
#: QUEUED_FOR_NEXT_WINDOW is empty; every registered query is covered by
#: the local two-scale DuckDB parity mirror regardless
#: (tests/test_oracle_parity.py). tests/test_rotation_accounting.py
#: asserts the three lists exactly tile the registry, so a query can never
#: silently drop out of the accounting.
CURATED_FIRST = [
    # round-12 additions, never driver-checked (queued last round) — both
    "lsh_quality_eval_sampled",
    "lsh_threshold_curve_sampled",
    # anchors — the 48 least-recently-driver-verified ledger queries
    # (last green r5-r7), re-verified breadth-first by staleness
    "quality_classifier_scores",
    "scd2_order_history",
    "split_leakage_audit",
    "stats_corr_quantity_price",
    "stratified_split_counts",
    "text_normalize",
    "unigram_logfreq_scores",
    "vocab_oov_rate",
    "window_lead_gap",
    "ann_recall_sq",
    "ann_sq_topk",
    "basket_pair_lift",
    "bigram_lm_scores",
    "cluster_safe_split",
    "cms_join_size_estimate",
    "containment_dup_pairs",
    "conversion_latency_quartiles",
    "doc_novelty_scores",
    "duplicated_span_coverage",
    "embedding_norm_outliers",
    "event_transition_matrix",
    "hourly_autocorrelation",
    "image_phash_dedup",
    "ivf_assignment_drift",
    "knn_density_scores",
    "knn_graph_edges",
    "knn_label_agreement",
    "knn_triangle_count",
    "label_centroid_similarity",
    "lang_balanced_sample",
    "lang_confusion_matrix",
    "lang_kappa_score",
    "lang_relative_quality_gate",
    "mad_outlier_events",
    "mixture_epoch_plan",
    "pareto_quality_frontier",
    "pmi_collocations",
    "quality_percentile_ranks",
    "range_partition_plan",
    "repeated_ngram_spans",
    "rp_distance_preservation",
    "session_pattern_match",
    "source_overlap_matrix",
    "value_drift_psi",
    "weighted_sample_docs",
    "ab_conversion_ztest",
    "benford_order_values",
    "cohort_ltv_matrix",
]

#: Queries registered DURING the current round (after this window was
#: fixed). Round 13 is an optimization round and registers no new queries.
#: tests/test_rotation_accounting.py enforces that this list +
#: CURATED_FIRST + the cumulative ledger exactly cover the registry, and
#: that every queued name actually runs at sf0.001 (the r6
#: snapshot-commit gate).
QUEUED_FOR_NEXT_WINDOW: list[str] = []


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
