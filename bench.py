"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line:
  {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from oraaud_kafka_spark import registry
from oraaud_kafka_spark.session import get_spark

# Headline set: one (heavy) representative per operator family. Fixed
# since round 1 — the driver's round-over-round regression baseline;
# never add here, add to EXTRAS.
HEADLINE = [
    "q1_pricing_summary",      # scan + filter + groupBy agg
    "q_join_5way_revenue",     # star join (broadcast dims + 1 shuffle join)
    "q_join_asof",             # as-of via union + single window pass
    "q_agg_rollup",            # hierarchical agg
    "q_window_topk_per_group", # ranking window + filter
    "q_sort_top10_global",     # TakeOrderedAndProject
    "q_json_from_json",        # semistructured parse
    "q_time_session_window",   # event-time sessionization
    "q_dedup_minhash_lsh",     # shingle->minhash->band->bucket join
    "q_sim_cosine_topk_brute", # broadcast queries x corpus + window top-k
    "q_text_quality_score",    # text feature extraction
    "q_emb_centroids",         # posexplode + partial agg (corpus mgmt)
]

# Round-2 operators, timed identically but reported under queries_extra
# and EXCLUDED from the headline total so "value" stays comparable to
# BENCH_r01.
EXTRAS = [
    "q_dedup_ngram_jaccard",     # triangle-decomposed blocked self-join
    "q_dedup_embedding_lsh",     # SRP-bucketed near-dup
    "q_sim_ivf_kmeans_topk",     # trained-quantizer ANN (incl. training)
    "q_pack_chunked",            # budgeted sequence chunking
    "q_decontaminate",           # benchmark n-gram overlap
    "q_time_gap_fill",           # dense grid + forward fill
    "q_profile_table",           # one-scan column profiling
    "q_dedup_span_c4",           # cross-doc span removal + reassembly
    "q_text_tfidf_topk",         # two-level term stats + ranked window
    "q_join_fuzzy_levenshtein",  # blocked edit-distance linkage
    "q_events_funnel",           # staged shrinking-set joins
    "q_events_zscore_outliers",  # exact-moment stats broadcast back
    "q_pack_strided",            # map-only overlapping windows
    "q_window_rolling_corr",     # decimal window moments
    "q_rag_retrieve_enrich",     # ANN top-k + broadcast enrich join
    "q_dedup_semantic",          # SemDeDup: cluster-blocked near-dup drop
    "q_text_gopher_rules",       # map-only quality gates at scan speed
    "q_sample_importance_dsir",  # hashed-feature domain affinity top-K
    "q_corpus_pipeline_card",    # composed gate -> dedup -> corpus card
    "q_text_bpe_pair_counts",    # BPE merge-candidate counting
    "q_events_top_paths",        # session path frequency ranking
    "q_pack_length_buckets",     # per-bucket padding-waste plan
    "q_profile_table_approx",    # sketch-based profile + certification
    "q_text_unigram_logprob",    # corpus-unigram LM doc scoring
    "q_text_ccnet_tiers",        # per-lang quality tier planning
    "q_dedup_simhash_eval",      # hamming vs exact-jaccard calibration
    "q_emb_dim_stats",           # per-dim whitening stats
    "q_time_ohlc_bars",          # hourly OHLC downsampling
    "q_text_dup_ngram_chars",    # dup-ngram char-fraction gate
    "q_events_markov_transitions",  # event transition matrix
    "q_agg_approx_percentile",   # certified KLL-style quantile sketch
    "q_agg_hll_union",           # mergeable HLL sketch rollup
    "q_agg_promo_share",         # Q14-shape conditional revenue share
    "q_filter_disjunctive",      # Q19-shape OR-of-ANDs pushdown
    "q_join_priority_counts",    # Q12-shape conditional counts
    "q_subquery_dormant_customers",  # Q22-shape scalar + anti join
    "q_events_anomaly_mad",      # robust median/MAD outliers
    "q_sql_cte_chain",           # WITH-pipeline above-average filter
    "q_emb_pca_top_component",   # matrix-free power-iteration PCA
    "q_dedup_containment",       # minhash-blocked shingle containment
    "q_text_bpe_apply_merge",    # positional BPE merge rewrite
    "q_time_interpolate_linear", # dense-grid linear interpolation
    "q_corpus_shuffle_deterministic",  # seeded reproducible shard+order
    "q_time_ewma_level",         # per-user exponential smoothing fold
    "q_text_bigram_logprob",     # add-one bigram LM doc scoring
    "q_text_source_entropy",     # per-source token-distribution entropy
    "q_events_rfm",              # RFM quintile segmentation
    "q_corpus_epochs_budget",    # token-budget epoch planning
    "q_multimodal_dedup",        # two-level header+content payload dedup
    "q_tpch_q4",                 # EXISTS priority check (semi join)
    "q_tpch_q7",                 # two-nation volume shipping
    "q_tpch_q8",                 # national market share
    "q_tpch_q10",                # returned-item top-20 report
    "q_tpch_q15",                # top supplier vs decimal-exact max
    "q_tpch_q21",                # waiting-orders multi-EXISTS
    "q_tpch_q9",                 # profit by nation/year (cost proxy)
    "q_sim_knn_eval",            # kNN majority-vote label accuracy
    "q_multimodal_phash",        # perceptual average-hash pipeline
    "q_events_time_to_convert",  # funnel latency quantiles
    "q_events_ab_welch",         # Welch t-test from exact moments
    "q_profile_join_skew",       # hot-key skew diagnostic
    "q_corpus_fingerprint",      # order-free xor dataset checksum
    "q_time_rollup_merge",       # lossless partial-aggregate merge
    "q_sql_recursive_paths",     # WITH RECURSIVE reachability
    "q_quality_constraints",     # one-scan data-quality report
    "q_dedup_containment_eval",  # single-band blocking recall calibration
    "q_emb_whiten_apply",        # per-dim standardization application
    "q_time_holt_trend",         # level+trend double exponential smoothing
    "q_sample_reservoir",        # exact-k-per-stratum deterministic sample
    "q_text_source_kl",          # per-source KL from corpus distribution
    "q_text_zipf_fit",           # vocab Zipf-slope corpus health check
    "q_agg_skew_kurtosis",       # exact-int64 distribution-shape moments
    "q_agg_mode_deterministic",  # pinned-tie-break per-group mode
    "q_events_attribution",      # join-free first/last-touch credit
    "q_time_cusum_changepoint",  # CUSUM level-shift scan
    "q_graph_degree_profile",    # type-graph weighted degrees
    "q_events_pagerank",         # all-broadcast 12-iter power loop
    "q_sim_mips_augmented",      # norm-augmentation MIPS certification
    "q_agg_gini",                # value-domain-bounded exact Gini
    "q_basket_association_rules",  # Apriori-pruned pair mining
    "q_text_readability",        # map-only Flesch scoring
    "q_text_ngram_novelty",      # single-scan window doc-frequency
    "q_window_distribution_ranks",  # quantile-position windows
    "q_time_seasonal_naive_eval",  # explode+regroup forecast backtest
    "q_sample_weighted_reservoir",  # A-ES importance-weighted sample
    "q_time_autocorrelation",    # exact-moment ACF, no self-join
    "q_agg_trimmed_mean",        # value-domain-bounded robust mean
    "q_quality_psi_drift",       # Laplace-smoothed PSI drift report
    "q_split_kfold",             # hash-mod fold balance audit
    "q_multimodal_silence_ratio",  # Arrow-decode VAD profile
    "q_events_concurrency",      # segmented +1/-1 interval sweep
    "q_text_source_jsd",         # pairwise source JSD matrix
    "q_text_pmi_collocations",   # PMI collocation top-k
    "q_agg_bootstrap_ci",        # deterministic Poisson bootstrap CI
    "q_agg_benford_digits",      # first-digit audit fraud screen
    "q_time_seasonality_strength",  # hour-of-day eta-squared
    "q_agg_ks_two_sample",       # exact two-sample KS over cents
    "q_agg_spearman",            # integer-rank Spearman rho
    "q_agg_chi2_independence",   # contingency chi-square + Cramér V
    "q_agg_mann_whitney_u",      # tie-corrected rank-sum test
    "q_agg_ols_regression",      # closed-form exact-moment OLS fit
    "q_agg_theil_index",         # decomposable inequality index
    "q_privacy_k_anonymity",     # QI equivalence-class risk audit
    "q_text_char_entropy",       # map-only char-entropy gibberish gate
    "q_dedup_containment_multiband",  # b=2 banded containment recall lift
    "q_eval_auc_roc",            # exact rank-sum ROC-AUC
    "q_eval_calibration_bins",   # reliability bins + exact Brier terms
    "q_events_kaplan_meier",     # right-censored KM survival curve
    "q_privacy_l_diversity",     # QI sensitive-value diversity audit
    "q_eval_confusion_threshold",  # one-scan threshold decision metrics
    "q_eval_ndcg_retrieval",     # NDCG@10 retrieval ranking quality
    "q_privacy_t_closeness",     # per-class TVD vs corpus distribution
    "q_eval_pr_auc",             # exact step-form average precision
    "q_eval_mrr_retrieval",      # first-relevant reciprocal rank @10
    "q_agg_winsorized_mean",     # tail-clamped robust mean
    "q_window_max_drawdown",     # running-max peak-to-trough window
    "q_time_burst_detection",    # hourly rate vs trailing-24h baseline
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(sf_dir.rstrip("/")).replace("sf", "")
    spark = get_spark(app_name="oraaud-kafka-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    registry.load_all()
    names = [n for n in HEADLINE if n in registry.QUERIES]

    def run_once(name: str) -> float:
        # noop write materializes EVERY output column JVM-side — count()
        # would let Catalyst prune the computed columns of map-only
        # queries and under-measure them
        t0 = time.perf_counter()
        df = registry.QUERIES[name](spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        return time.perf_counter() - t0

    # Warm every headline query once so timings measure the engine in
    # steady state (codegen compiled, classes loaded, file listings
    # cached) rather than first-call overhead.
    for name in names:
        run_once(name)

    # settle GC debt from the warm loop so it isn't charged to the first
    # measured query
    spark.sparkContext._jvm.System.gc()

    # Two full passes over the suite with min-of-2 inside each, reported
    # value = min across all 4 samples. Back-to-back min-of-3 turned out
    # not to be noise-proof: a sustained interference window (noisy
    # neighbor, GC thrash) covers all consecutive samples of one query
    # and inflates its "min" 5-10x. Separating sample groups by a whole
    # suite pass (~minutes) makes that failure mode require the
    # interference to span the entire bench.
    samples: dict[str, list[float]] = {}
    extras_names = [n for n in EXTRAS if n in registry.QUERIES]
    for name in extras_names:
        run_once(name)  # warm (headliners were warmed above)
    for _pass in range(2):
        for name in (*names, *extras_names):
            best = min(run_once(name) for _ in range(2))
            samples.setdefault(name, []).append(best)

    timings = {n: round(min(samples[n]), 4) for n in names}
    for name in names:
        print(f"# {name}: {timings[name]:.3f}s", file=sys.stderr)
    extras = {n: round(min(samples[n]), 4) for n in extras_names}
    for name in extras_names:
        print(f"# extra {name}: {extras[name]:.3f}s", file=sys.stderr)

    # Ingest throughput: the reference's own workload (audit files ->
    # sink). Synthetic corpus, full pipeline, one availableNow pass.
    from oraaud_kafka_spark.streaming.bench_ingest import run_ingest_bench

    ingest = run_ingest_bench(spark)
    print(f"# ingest: {ingest['ingest_mbps']} MB/s "
          f"({ingest['ingest_files']} files, {ingest['ingest_sec']}s)",
          file=sys.stderr)

    total = round(sum(timings.values()), 4)
    # Driver artifact storage keeps only a ~2000-char tail of stdout;
    # round 6's line outgrew it (65 extras inline) and the official
    # headline was lost (`parsed: null`). Two defenses:
    #   1. the stdout line stays SHORT (per-extra timings move to the
    #      history file; only their total stays inline) and orders
    #      `queries`/`value` LAST so even a truncated tail still carries
    #      the headline numbers;
    #   2. the full record (extras included) appends to an in-repo
    #      bench_history.jsonl, so round-over-round comparison never
    #      depends on driver artifact storage again.
    record = {
        "metric": "headline_queries_total_sec",
        "unit": "sec",
        "sf": float(sf) if sf.replace(".", "").isdigit() else sf,
        # per-query value = best of 4 samples taken as min-of-2 inside
        # each of 2 whole-suite-separated passes (see comment above) —
        # recorded so a loaded-machine driver run is identifiable
        "best_of": 4,
        **ingest,
        "queries_extra_total_sec": round(sum(extras.values()), 4),
        "queries": timings,
        "value": total,
    }
    hist_path = os.environ.get("SPARK_GRAFT_BENCH_HISTORY") or os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "bench_history.jsonl"
    )
    try:
        with open(hist_path, "a") as f:
            f.write(json.dumps({**record, "queries_extra": extras,
                                "ts": int(time.time())}) + "\n")
    except OSError as e:
        # best-effort telemetry: a read-only checkout or full disk must
        # not kill the run before the headline line prints — that would
        # recreate the exact lost-headline failure this file defends
        # against
        print(f"# WARNING bench history not written: {e}", file=sys.stderr)
    line = json.dumps(record)
    if len(line) > 1900:  # pragma: no cover - contract guard
        print(f"# WARNING stdout line {len(line)} chars nears the "
              "driver's 2000-char tail", file=sys.stderr)
    print(line)
    spark.stop()


if __name__ == "__main__":
    main()
