#!/usr/bin/env python3
"""Reproduce the BASELINE.md scale-trend studies: run a set of catalog
queries at two scale dirs (best-of-N noop-sink wall clock per cell)
and print the markdown table rows.

    python scripts/scale_study.py [--queries q1,q2,...] \
        [--base /root/testdata/sf0.1] [--big /tmp/sf1-derived] [--runs 2]

Defaults reproduce the round-5 third-wave study (audit / robust-stats
/ sampling queries; derive the big set first with
``python scripts/make_sf1_derived.py``).  ``--wave r06`` reproduces
the round-6 wave table (sketches / PQ / phash / bootstrap / KS).
"""

from __future__ import annotations

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

R06_WAVE = [
    "skyline_part_price_size",
    "sketch_countmin_user_counts",
    "sketch_bloom_membership",
    "sketch_hll_distinct_by_type",
    "sketch_hll_rolling_distinct",
    "embedding_pq_adc_topk",
    "multimodal_phash_neardup",
    "text_bigram_lm_quality",
    "graph_cheapest_transfer_4hop",
    "stats_bootstrap_ci_order_value",
    "stats_ks_two_sample",
    "corpus_per_source_sample",
    "fuzzy_deletion_pairs",
    "multimodal_audio_fingerprint_neardup",
    "stats_mannwhitney_auc",
    "ml_decile_lift",
    "interval_peak_concurrency",
    "forecast_seasonal_naive_error",
    "timeseries_acf_lags",
    "text_pmi_collocations",
    "search_reciprocal_rank_fusion",
    "sketch_kmv_jaccard",
    "control_chart_xmr_signals",
    "embedding_centroid_classifier_eval",
    "streaks_longest_active_run",
    "timeseries_rolling_median_7d",
    "features_hashing_trick",
    "features_target_encoding_loo",
    "corpus_groupwise_split",
    "interval_overlap_concurrent_shipments",
    "interval_union_coverage_days",
    "ml_conformal_threshold",
    "robust_weighted_median_value",
    "growth_mom_yoy_revenue",
    "corpus_vocab_growth_curve",
    "privacy_k_anonymity_audit",
    "graph_link_prediction_jaccard",
    "text_rake_keyphrases",
    "cohort_ltv_curve",
    "behavior_interarrival_burstiness",
    "multimodal_video_shot_boundaries",
]

THIRD_WAVE = [
    "fraud_benford_digit_audit",
    "market_hhi_concentration",
    "timeseries_seasonal_decompose",
    "timeseries_cusum_changepoint",
    "text_token_frequency_quality",
    "assoc_rules_brand_confidence",
    "robust_median_mad_by_priority",
    "inequality_gini_by_nation",
    "robust_trimmed_mean_order_value",
    "robust_iqr_fence_outliers",
    "corpus_weighted_sample_priority",
    "histogram_equidepth_order_value",
]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--wave", choices=["third", "r06"], default="third")
    ap.add_argument("--queries", default="")
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--big", default="/tmp/sf1-derived")
    ap.add_argument("--runs", type=int, default=2)
    args = ap.parse_args()

    from end_end_data_pipeline__spark.plans.catalog import load_all
    from end_end_data_pipeline__spark.session import get_spark

    spark = get_spark("scale_study")
    queries = load_all()
    names = [n.strip() for n in args.queries.split(",") if n.strip()]
    if not names:
        names = R06_WAVE if args.wave == "r06" else THIRD_WAVE
    unknown = [n for n in names if n not in queries]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    def best_of(name: str, sf_dir: str) -> float:
        best = float("inf")
        for _ in range(args.runs):
            t = time.time()
            queries[name].fn(spark, sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            best = min(best, time.time() - t)
        return best

    # warm the session on the first query so JVM/codegen startup isn't
    # attributed to it
    best_of(names[0], args.base)
    print("| query | base (s) | big (s) | ratio |")
    print("|---|---|---|---|")
    for n in names:
        a = best_of(n, args.base)
        b = best_of(n, args.big)
        print(f"| {n} | {a:.2f} | {b:.2f} | {b / a:.1f}× |", flush=True)


if __name__ == "__main__":
    main()
