#!/usr/bin/env python
"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": <total sec>, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is fully materialized through the noop sink (all compute, no
write cost), except q_generate_dataset which includes its parquet write —
that IS the operation. AQE on; timings are end-to-end wall clock per query.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = os.environ.get("SPARK_GRAFT_CPUS", "32")

# headline set: the shuffling/joining/windowing queries that dominate at
# scale + the feature-store machinery path + EXT pipeline ops
HEADLINE = [
    "q_groupby_agg",
    "q_agg_multi",
    "q_join_equi",
    "q_join_left",
    "q_join_asof",
    "q_window_rank",
    "q_window_frame",
    "q_cte_pipeline",
    "q_generate_dataset",
    "q_sessionize",
    "q_tpch_q1like",
    "q_tpch_q3like",
    "q_tpch_q5like",
    "q_dedup_exact",
    "q_dedup_near",
    "q_text_quality",
    "q_readability",
    "q_tokenizer_fertility",
    "q_sim_topk_fast",
    # round-1 late additions (extend, never shrink: BENCH totals are
    # compared per-query against BASELINE, so new keys add new lines)
    "q_session_window",
    "q_stats_moments",
    "q_window_nav",
    "q_tpch_q13like",
    "q_dedup_ngram",
    "q_tpch_q17like",
    "q_join_full",
    # round-2 additions (VERDICT r1 item 8): regressions in the newly
    # driver-recorded machinery + EXT keys must be visible
    "q_sim_topk",
    "q_scd2_history",
    "q_fv_latest_snapshot",
    "q_multimodal_frames",
    # round-4 additions: chained SCD2, skew-hardened LSH pairs, oracle-
    # gated winnowing (portable-hash path is the benched one), funnel /
    # retention analytics, exact k-NN slice
    "q_scd2_multi",
    "q_dedup_embed",
    "q_fingerprint_winnow",
    "q_funnel",
    "q_retention",
    "q_knn_join",
    # round-5 additions (VERDICT r4 item 6): the round-4 cost classes —
    # int64 portable MinHash banding, iterative connected components,
    # dedup-composition accounting, global-quartile RFM, hopping
    # windows, broadcast-dictionary token rarity — plus the two
    # round-5 scale rewrites (two-phase stratified top-K, shard-keyed
    # packing) so their new plan shapes are regression-watched
    "q_dedup_near_portable",
    "q_dedup_clusters",
    "q_corpus_dedup_stats",
    "q_rfm",
    "q_hopping",
    "q_token_rarity",
    "q_sample_stratified",
    "q_pack_sequences",
    # round-5 late additions: new cost classes from the second half of
    # the round — forward as-of (reversed-order union window), windowed
    # event dedup (high-cardinality row_number), span-level chunk dedup
    # (count-back join on the chunk key), vocabulary build (exchange-
    # reused double aggregate)
    "q_join_asof_fwd",
    "q_event_dedup",
    "q_dedup_chunks",
    "q_vocab_build",
    "q_embed_outliers",
    "q_tpch_q10like",
    "q_sample_to_mix",
    "q_dedup_cross_source",
    "q_pack_bfd",
    # round-7 additions: nation-pair bilateral fact join (Q7), six-way
    # snowflake ratio aggregate (Q8), gram-grain first-seen novelty
    # (high-cardinality min-agg + count-back join)
    "q_tpch_q7like",
    "q_tpch_q8like",
    "q_ngram_novelty",
    "q_embed_covariance",
    # round-7: iterative driver-coordinated cost class — 20 BPE merge
    # rounds on the word dictionary (corpus pass only for the count);
    # wall-clock is round-trip-bound, scale-independent past the count
    "q_bpe_train",
    # round-7 late additions: distributed global ordering (range
    # exchange + parallel sorts, no window), per-order distribution
    # windows, dual-frame nearest as-of
    "q_global_rank",
    "q_window_percentile",
    "q_join_asof_near",
    # round-8 additions: the remaining partsupp-free TPC-H cost classes
    # (scan-agg pushdown probe Q6, conditional-count join Q12, scalar-
    # max view Q15, HAVING-reduced semijoin Q18, disjunctive-predicate
    # broadcast join Q19, double-correlated semi/anti Q21) + portable
    # hyperplane-LSH embedding dedup
    "q_tpch_q6like",
    "q_tpch_q12like",
    "q_tpch_q15like",
    "q_tpch_q18like",
    "q_tpch_q19like",
    "q_tpch_q21like",
    "q_dedup_embed_portable",
    "q_quantile_sketch",
    "q_heavy_hitters_sketch",
    "q_epoch_shuffle",
    "q_kmv_sketch",
    "q_kmv_jaccard",
    "q_gap_fill",
    "q_feature_drift",
    "q_join_skew_salted",
    "q_token_pmi",
    "q_bpe_segment",
    "q_ewma_decay",
    "q_event_corr",
    "q_pagerank",
    # round-10 additions: the de-weaked distributed running-sum plan
    # (vocab coverage), the new ranks consumer (exact Gini), the
    # portable PQ/ADC pipeline, TF-IDF keyword extraction (vocab-join
    # with no forced broadcast), and normalized-prefix dedup
    "q_vocab_coverage",
    "q_gini_spend",
    "q_sim_pq_portable",
    "q_tfidf_topterms",
    "q_dedup_normalized",
    # second round-10 wave: residual IVFPQ/ADC, exact-rational BM25
    # ranking (single-pass, no token shuffle), blocked Levenshtein dedup
    "q_sim_ivfpq_portable",
    "q_bm25_topk",
    "q_dedup_edit",
    "q_cluster_kmeans",
    "q_graph_triangles",
    "q_centroid_classify",
    "q_surprisal_bigram",
    "q_embed_pca_power",
    "q_knn_classify",
    # third round-10 wave: shared blocked-pair containment scorer,
    # double-ranked median/MAD (two range exchanges), the decile-lift
    # ntile consumer, fixed-domain hashing-trick aggregation, and the
    # checkpointed-contingency chi-squared
    "q_contain_ngram",
    "q_median_mad",
    "q_decile_lift",
    "q_feature_hash",
    "q_chi2_assoc",
    "q_rrf_fusion",
    "q_sample_weighted",
    "q_auc_mann_whitney",
    "q_diverse_topk",
    "q_quantile_norm",
    "q_group_kfold",
    "q_source_divergence",
    "q_hll_portable",
    # round-11 additions: the two de-weaked eval probes (fixed-K
    # hash-smallest anchor/query sets — were quadratic modulo slices),
    # the multi-mass range-exchange consumers (KS drift, Gini split),
    # the rescored fast top-k, and the new drift/label/eval keys
    "q_negative_sample",
    "q_ks_drift",
    "q_best_split_gini",
    "q_weighted_median",
    "q_label_churn",
    "q_entropy_mix",
    "q_stratified_kfold",
    "q_ann_recall",
    "q_pack_bfd_check",
    "q_agg_approx",
    "q_approx_distinct_sketch",
    # round-11 second wave: type/token accounting, dispersion index,
    # octave spectrum, binned TVD drift
    "q_lexical_diversity",
    "q_burstiness",
    "q_zipf_tail",
    "q_tvd_drift",
    "q_confusion_metrics",
    "q_user_session_features",
    # round-12 additions: octave-bits PSI, the chi2-normalizing
    # Cramér's V, double-range-exchange Spearman, the CUSUM
    # running-sum+running-min consumer, and the interval-overlap join
    "q_psi_bits",
    "q_cramers_v",
    "q_spearman_corr",
    "q_cusum_drift",
    "q_join_interval",
    # round-12 second wave: data-quality / seasonality / co-occurrence
    # / position-discounted retrieval eval
    "q_benford_digits",
    "q_autocorr_lag",
    "q_basket_lift",
    "q_weekday_profile",
    "q_ndcg_mrr",
    # round-13 additions: the slice-bucketed keyless interval join, the
    # banded-LSH recall pin, semantic-layer metric evaluation (full
    # registration + compile path), Mann-Kendall trend, grouped OLS
    "q_join_interval_keyless",
    "q_join_interval_adaptive",
    "q_lsh_recall",
    "q_metric_eval",
    "q_metric_conversion",
    "q_metric_ratio_xmodel",
    "q_metric_cumulative",
    "q_metric_window",
    "q_metric_offset",
    "q_saved_query",
    "q_source_freshness",
    "q_metric_timespine",
    "q_trend_mk",
    "q_ols_slope",
    # round-13 wave 4: pre-shuffle skew monitor, cohort revenue LTV,
    # sequential trigram mining
    "q_skew_audit",
    "q_cohort_ltv",
    "q_seq_patterns",
    # round-13 wave 5: survival hazard + funnel latency
    "q_hazard_km",
    "q_time_to_convert",
    # round-13 wave 6: Welch t², Tukey-fence outliers, weekday-residual
    # anomaly days, inter-event gap octave spectrum
    # round-13 wave 7: Kendall tau-b, CUSUM changepoint, Theil–Sen
    # slope, Lorenz deciles
    "q_kendall_tau",
    "q_changepoint",
    "q_theil_sen",
    "q_lorenz_deciles",
    "q_mi_bits",
    "q_hard_negatives",
    "q_welch_t",
    "q_anomaly_iqr",
    "q_seasonal_residual",
    "q_gap_octaves",
    # r14: MetricFlow depth (entity-path planner, templated filters,
    # event-grain conversions, calendar windows)
    "q_metric_entity_path",
    "q_metric_filter_dim",
    "q_metric_conv_events",
    "q_metric_window_cal",
    "q_metric_offset_grain",
    "q_metric_conv_xmodel",
    "q_metric_entity_hop",
    # r15: entity-path TimeDimension + templated conversion filters;
    # saved-query export (includes its atomic-swap table write — that
    # IS the operation)
    "q_metric_tdim_path",
    "q_saved_query_export",
    "q_saved_query_topn",
    # r16: non-SUM cumulative accumulators (min/max windows over the
    # aggregated day frame); interpolating as-of join (two union-shuffle
    # asof passes)
    "q_metric_cum_minmax",
    "q_join_asof_interp",
]


def main() -> None:
    from dbt_snowflake_feature_store_spark.session import get_spark

    # A/B knob for measurement-artifact checks: run the headline set in
    # reverse so warmup-order effects swap ends (VERDICT r3 item 2)
    if os.environ.get("SPARK_GRAFT_BENCH_REVERSE") == "1":
        HEADLINE.reverse()

    spark = get_spark("fs-bench")
    import __spark_entry__ as entry_mod

    queries = entry_mod.queries()

    # JVM/codegen warmup on a trivial plan (not counted)
    spark.range(1000).selectExpr("sum(id)").write.format("noop").mode(
        "overwrite"
    ).save()

    # adaptive min-of-N per query (3..5 runs): steady-state engine time,
    # not first-run JVM/codegen warmup or cold page cache. A round-4
    # idle-machine A/B showed min-of-2 still carries ~±40% per-key noise
    # from page-cache state, and window-heavy keys (q_window_nav) keep
    # improving through run 4 (JIT tiers) — so keep iterating while the
    # latest run still beats the best by >10%, up to 5 runs.
    timings: dict[str, float] = {}

    # The shared MinHash pair stage (ext_text._portable_pairs) is built
    # once per session and reused by q_dedup_near_portable /
    # q_dedup_clusters / q_corpus_dedup_stats — exactly what a real
    # pipeline does, but it made the first consumer's per-key time carry
    # the whole band stage (or, with min-of-N, attributed it to NOBODY —
    # VERDICT r6 item 2). Report the build as its own bench line: each
    # timed run starts from a cleared cache (cold cost), and the cache is
    # left WARM afterwards so the three consumer keys report their honest
    # incremental cost. Total = cold build + warm consumers, no double
    # count, no vanished cost.
    from dbt_snowflake_feature_store_spark.operators import ext_text

    # Machine-factor control (VERDICT r14 item 2): a fixed CPU-bound
    # calibration task whose input never changes (synthetic range, no
    # file I/O, no SF dependence) — a pure whole-stage-codegen hash/agg
    # chain. Cross-round per-key ratios divide out this number to answer
    # "noise or creep?" by arithmetic instead of re-profiling debates.
    control = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        spark.range(0, 20_000_000, 1, 32).selectExpr(
            "avg(xxhash64(cast(id as string), 'a')) as h1",
            "avg(xxhash64(id * 1000003, 'b')) as h2",
            "avg(sin(id % 1000)) as s",
        ).write.format("noop").mode("overwrite").save()
        control = min(control, time.perf_counter() - t0)
    control = round(control, 3)

    best = float("inf")
    for _ in range(3):
        ext_text._PAIR_CACHE.clear()
        t0 = time.perf_counter()
        ext_text._portable_pairs(spark, SF_DIR).write.format("noop").mode(
            "overwrite"
        ).save()
        best = min(best, time.perf_counter() - t0)
    timings["pair_stage_build"] = round(best, 3)

    for key in HEADLINE:
        fn = queries[key]
        best = float("inf")
        for it in range(5):
            t0 = time.perf_counter()
            df = fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            improved = t < best * 0.9
            best = min(best, t)
            if it >= 2 and not improved:
                break
        timings[key] = round(best, 3)

    total = round(sum(timings.values()), 3)
    sf = SF_DIR.rstrip("/").rsplit("sf", 1)[-1]
    # key order matters: the driver's BENCH capture head-truncates long
    # lines (VERDICT r9 item 4), so the long per-query dict goes FIRST
    # and the headline total + metadata go LAST — the tail stays
    # self-contained whatever gets cut off the front.
    print(
        json.dumps(
            {
                "queries": timings,
                "sf": float(sf),
                "control_seconds": control,
                "cpus": int(CPUS) if CPUS.isdigit() else CPUS,
                "metric": "headline query wall-clock (noop sink, AQE on, min of 3 runs)",
                "unit": "sec",
                "value": total,
            }
        )
    )


if __name__ == "__main__":
    main()
