"""Partition-layout invariance: the engine's determinism claims say results
are value-identical regardless of parallelism — fixed-point sums, md5
ranking, explicit fold orders exist precisely so cluster layout cannot
change answers. Prove it: run value-sensitive queries under two different
shuffle-partition settings and compare full canonicalized row sets.

Picks one query per determinism device: float aggregation order (q1's
decimal sums), fixed-point centroids (kmeans), windowed float folds
(EWMA), integer weight sums (classifier), md5-ranked slicing (stratified
split), fixed-point ADC (PQ search), and the iterative CC labels.

r5 additions: BM25 (exact integer df/tf/len sums feeding a fixed-order
double chain, rounded before ranking), containment/jaccard (pure integer
intersection counts), repeated spans (digest group counts), cluster-safe
split (md5 of CC labels), bigram LM (integer log2-bucket sums), IVF
drift (integer per-list tallies over centroid argmax), Bloom-composed
decontamination, the kNN graph, A-ES weighted sampling, and the
source-overlap matrix's micro-unit averages."""

from __future__ import annotations

import math

import pytest

from py_datalake_move_files_spark.queries import QUERIES

SF = "/root/testdata/sf0.01"

QUERIES_UNDER_TEST = [
    "q1_pricing_summary",
    "kmeans_cluster_profile",
    "ewma_user_values",
    "quality_classifier_scores",
    "stratified_split_counts",
    "ann_pq_topk",
    "dedup_cluster_assignment",
    "scd2_order_history",
    # r5 tier
    "bm25_doc_retrieval",
    "containment_dup_pairs",
    "repeated_ngram_spans",
    "cluster_safe_split",
    "bigram_lm_scores",
    "ivf_assignment_drift",
    # r5 late tier: Bloom-prefilter composition (integer shingle
    # counts), kNN graph (rounded cosine + id tie-breaks over a
    # deterministic IVF assignment), A-ES sampling (md5-derived
    # uniforms), source matrix (integer micro-unit Jaccard sums)
    "bloom_decontamination",
    "knn_graph_edges",
    "weighted_sample_docs",
    "source_overlap_matrix",
    # r6 tier: left-folded Zipf regression, fixed-point TF-IDF weights,
    # int64 Gram accumulated across ARBITRARY Arrow batch boundaries
    # (the mapInPandas partial shape is exactly what partitioning
    # changes), fixed-point k-center greedy, sorted-fold chi2, and the
    # KS sup over exact division results
    "zipf_slope",
    "tfidf_doc_pairs",
    "embedding_dim_correlations",
    "kcenter_coreset",
    "source_lang_chi2",
    "length_ks_matrix",
    # r6 late tier: md5-ordered packing cumsum, calendar-broadcast
    # distinct windows, histogram-decile map + digest dup flags
    "token_packing_plan",
    "dau_wau_stickiness",
    "quality_dup_calibration",
    # r6 final tier: iterative CC labels over the kNN graph, the
    # two-arm threshold sweep, rank-overlap trimmed sums, and the
    # decimal rank-weighted Gini fold
    "knn_components",
    "lsh_threshold_curve",
    "trimmed_mean_prices",
    "revenue_gini",
    # r6 closing tier: sorted-fold chi2 over hours, rank-window share,
    # decimal gap moments behind a type-partitioned lag, CC size census
    "event_hour_mix_chi2",
    "revenue_top_decile_share",
    "interarrival_burstiness",
    "dup_cluster_size_histogram",
    "lead_time_quartiles",
    "heaps_law_fit",
    # r6 stats tier: integer linkage weights over banded candidates,
    # all-integer ppm decomposition, percentile over a calendar-bounded
    # slope frame, micro-nat MI rounded before its integer sum, and the
    # pure-integer Benford shares
    "record_linkage_scores",
    "seasonal_daily_decomposition",
    "theil_sen_revenue_trend",
    "dim_label_mutual_info",
    "benford_order_values",
    # exact int64 moments + driver-side pinned-fold eigensolve
    "pca_top_component",
    # micro-log hazard cumsum + all-integer CUSUM deviations
    "kaplan_meier_retention",
    "daily_count_cusum",
    # r6 graph-census extensions: per-node integer-ppm triangle ratios
    # over the shared degree-directed frame (the artifact cache keys on
    # the shuffle setting, so each layout builds its own graph)
    "knn_local_clustering",
    # r6: histogram-CDF quintile scores joined back to per-customer
    # integer aggregates — every score is a pure function of (value,
    # histogram), so layout must not move any customer across segments
    "rfm_customer_segments",
    # r7 mining tier: nano-nat JS terms rounded before the order-free
    # integer sum (the finest-grain quantization device in the repo),
    # popcount pairs over banded fingerprints, the cents-histogram
    # rank-sum AUC, the weekday-sorted ANOVA fold, and the decimal38
    # moment row behind the closed-form OLS solve
    "js_source_divergence",
    "simhash_dup_pairs",
    "value_purchase_auc",
    "weekday_anova_events",
    "ols_revenue_model",
    # r7 tier 2: Kish ESS from decimal38 weight moments; quantity-
    # weighted min-CASE rank reads over the grouped cents histogram
    "effective_sample_size",
    "weighted_median_price",
    # r7 tiers 3-5: micro-nat entropy cells, integer KS cross-products
    # feeding the BH rank window, layout-cut BFS frontiers, grouped
    # micro-value histogram quantiles, histogram-decile lift cells,
    # and the double-median seasonal robust z
    "user_event_entropy",
    "ks_source_screen_bh",
    "knn_hop_histogram",
    "embedding_dim_quantile_clip",
    "purchase_decile_lift",
    "seasonal_adjusted_anomalies",
    # r8 pipeline tier: micro-rounded two-step Markov terms summed
    # order-free, micro-quantized silhouettes over fixed-point
    # centroids, decimal38 per-segment moment rows, integer jackknife
    # influences, all-integer water-filling windows, and per-row HOF
    # winnowing (checksums are order-free integer folds)
    "markov_two_step_reach",
    "simplified_silhouette",
    "elasticity_by_segment",
    "jackknife_mean_quality",
    "token_budget_waterfill",
    "winnowing_fingerprints",
    # round-6-quantized greedy argmax chain over checkpointed <=C-row
    # frames (ties broken on doc_id at every step)
    "mmr_rerank_retrieval",
    # md5-argmax shard assignment; integer rank->histogram-value lookup
    "consistent_hash_shards",
    "quantile_normalize_lengths",
    # micro-quantized RM1 term weights; all-integer lag-7 WAPE cells
    "prf_query_expansion",
    "seasonal_naive_backtest",
    # shared Wilson double chain from exact integer (k, n)
    "ctr_wilson_bounds",
]


def _canon(v):
    if isinstance(v, float):
        return "NaN" if math.isnan(v) else format(v, ".17g")
    return str(v)


def _rows(spark, name):
    df = QUERIES[name](spark, SF)
    cols = sorted(df.columns)
    return sorted(tuple(_canon(r[c]) for c in cols) for r in df.collect())


@pytest.mark.parametrize("name", QUERIES_UNDER_TEST)
def test_result_invariant_to_shuffle_partitioning(spark, name):
    key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(key)
    try:
        spark.conf.set(key, "7")
        a = _rows(spark, name)
        spark.conf.set(key, "13")
        b = _rows(spark, name)
    finally:
        spark.conf.set(key, prev)
    assert a == b, f"{name}: results depend on shuffle partition count"
