"""Partitioning-invariance: the determinism contract (decimal
accumulation, single final divisions, ROUND'd dot products) claims query
results are independent of physical partitioning. This runs the most
float-sensitive gate queries under two different shuffle-partition
settings and requires BIT-IDENTICAL rows — the failure mode it guards is
an order-dependent double SUM whose result drifts with partial-
aggregation grouping, which the DuckDB oracle can miss whenever one
Spark layout happens to match DuckDB's summation order."""

from __future__ import annotations

import pytest

from aos_spark.cache import release_tracked
from aos_spark.queries import QUERIES

SF = "/root/testdata/sf0.001"

# every query here emits unrounded-or-aggregated doubles somewhere in
# its output — the surface where partial-agg order could leak
FLOAT_SENSITIVE = [
    "q1_pricing_summary",
    "stats_correlation",
    "a1_a2_probability_expected",
    "lm_bigram_rarity",
    "token_budget_selection",
    "sim_pq_topk",
    "incremental_agg_merge",
    "domain_mixture_plan",
    "semantic_dedup",
    "span_dedup_retention",
    "event_transition_matrix",
    "order_autocorrelation",
    "mad_outlier_bounds",
    "cross_source_dup_matrix",
    "mixture_apply_stats",
    "monthly_growth_by_nation",
    "graph_pagerank_step",
    "label_centroid_similarity",
    "term_cooccurrence_lift",
    "revenue_trend_by_nation",
    "trimmed_mean_prices",
    "revenue_pareto_by_nation",
    "gini_revenue_by_nation",
    "simpson_diversity_by_source",
    "assoc_rules_brands",
    "ks_length_drift",
    "seasonal_dow_anomaly",
    "winsorized_mean_prices",
    "rrf_fusion_topk",
    "bm25_lite_scores",
    "welch_ttest_priorities",
    "vocab_jaccard_matrix",
    "priority_mix_residuals",
    "cusum_change_point",
    "rfm_segmentation",
    "graph_link_prediction",
    "embedding_gram_matrix",
    "ewma_monthly_revenue",
    "sketch_hll_merge_weekly",
    "customer_skyline_frontier",
    "source_minhash_similarity",
    "dau_moving_average",
    # round-6 wave
    "ppjoin_exact_pairs",
    "winnowing_fingerprints",
    "language_kappa",
    "hard_negative_mining",
    "matryoshka_recall_eval",
    "dedup_threshold_curve",
    "split_leakage_check",
    "hll_error_eval",
    "quantile_error_eval",
    "sim_ivfpq_topk",
]


def _canon(df):
    cols = sorted(df.columns)
    rows = []
    for r in df.select(*cols).collect():
        key = []
        for c in cols:
            v = r[c]
            if isinstance(v, float):
                # strings only — a mixed NaN/hex column must stay sortable
                key.append("nan" if v != v else v.hex())
            else:
                key.append(repr(v))
        rows.append(tuple(key))
    return sorted(rows)


@pytest.mark.parametrize("name", FLOAT_SENSITIVE)
def test_result_is_partitioning_invariant(spark, name):
    fn = QUERIES[name]
    out = {}
    saved = spark.conf.get("spark.sql.shuffle.partitions")
    for parts in ("3", "13"):
        release_tracked()
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", parts)
        try:
            out[parts] = _canon(fn(spark, SF))
        finally:
            spark.conf.set("spark.sql.shuffle.partitions", saved)
    assert out["3"] == out["13"], f"{name} drifts with partitioning"
