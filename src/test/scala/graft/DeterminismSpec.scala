package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.ops.Registry

/** Shuffle-order independence — the failure class the DuckDB oracle only
  * catches if the driver's partitioning happens to differ from ours: a
  * result that depends on the number of shuffle partitions (double
  * summation order, non-deterministic tie-breaks, partition-id leakage)
  * is wrong at cluster scale even when it hash-matches locally. Each op
  * below runs under two different shuffle-partition settings (a prime, and
  * the suite default) and must produce IDENTICAL rows. The list covers
  * every mechanism the repo relies on for determinism: decimal-cast sums,
  * two-pass rank offsets, iterative label propagation, integer-scaled
  * PageRank, windowed tie-breaks, scratch-state rebuild, and the
  * floor(x+0.5) quantizer.
  */
/** The matrix key list lives in a companion-style object so RegistrySpec
  * can pin README.md's stated matrix size against the real one.
  */
object DeterminismMatrix {
  val keys = Seq(
    "agg_hash_groupby",          // decimal-cast distributed sums
    "agg_exact_median_distributed", // two-pass rank, boundary pinning
    "win_rank_distributed",      // range-partition offsets
    "dedup_cc_clusters",         // iterative min-label propagation
    "graph_pagerank",            // integer-scaled iterative mass
    "sim_label_centroids",       // integer micro-unit distributed mean
    "agg_mode_per_group",        // deterministic tie-break
    "evt_rfm_segments",          // broadcast horizon + decimal sums
    "dim_scd2_merge",            // snapshot join + union branches
    "emb_quantize_int8",         // floor(x+0.5) quantizer arithmetic
    "txt_collocation_pmi",       // ln over count ratios
    "qc_column_profile",         // multi-distinct Expand + stack
    "emb_srp_ann",               // integer SRP sketches + band join
    "win_rolling_slope",         // exact windowed sums -> IEEE slope
    "txt_bm25_rank",             // decimal-summed ln-derived scores
    "sim_containment_pairs",     // df-capped shingle join + integer ppm
    "qc_benford_check",          // windowed total + integer ppm
    "agg_weighted_median",       // histogram cumsum over exact longs
    "graph_label_propagation",   // iterative mode with explicit tie-break
    "ml_feature_pit",            // RANGE-frame windows over the µs timeline
    "emb_matryoshka_trunc",      // two-score join + rank-window tie-breaks
    "evt_sequence_pattern",      // sort_array-ordered collapse (the
                                 //   collect_list-order trap this op dodges)
    "win_median_sliding",        // qty-tiebroken frames over dup keys
    "txt_zipf_slope",            // rank tie-break + integer OLS
    "txt_bigram_logprob",        // decimal-summed ln + top-20 tie-break
    "graph_k_core",              // iterative semi-join peeling
    "ml_psi_stability",          // integer binning + decimal-summed ln
    "evt_lifecycle_states",      // lag/lead week windows + full-outer join
    "qc_cusum_drift",            // stacked prefix-sum/prefix-min windows
    "qc_theil_sen_trend",        // pairwise slopes + rank-median
    "evt_bot_gap_stats",         // µs lag gaps + top-20 tie-break
    "win_bollinger_bands",       // decimal(38) trailing sums + comparisons
    "ml_ks_drift",               // cum CDF windows + struct argmax
    "txt_heaps_law",             // log2 buckets + prefix sums + integer OLS
    "txt_bpe_merges",            // per-round argmax (count DESC, pair ASC)
    "sim_ivf_knn_det",           // integer Lloyd rounds + tie-broken rerank
    "serve_more_like_this",      // ppm idf sums + doubly tie-broken ranks
    "mm_shot_boundary",          // partition-iterator codec + lag deltas
    "sim_lsh_tuning_curve",      // md5 minhash + band self-joins
    "serve_bitmap_index",        // bit_or packing (commutative by design)
    "win_drawdown",              // running-max + earliest-day argmax tie
    "evt_dow_seasonality",       // rank-median over dup counts
    "scan_text_lines",           // multi-file text round-trip + reparse
    "txt_char_entropy",          // decimal-summed log2 terms
    "evt_top_paths",             // sort_array collapse + top-15 tie-break
    "graph_common_neighbors",    // percentile threshold + wedge joins + ppm
    "evt_transition_entropy",    // decimal-summed ln + integer ppm share
    "ml_target_encode",          // contingency windows + integer ppm
    "agg_kmv_distinct",          // TopKPerKey bottom-k heaps + merge
    "ml_chi2_feature_select",    // decimal chi2 + top-20 tie-break
    "ml_kmeans_lloyd",           // integer-grid Lloyd + struct argmin
    "txt_code_detect",           // regexp densities + integer division
    "evt_forecast_backtest",     // lag window + argmax worst-day tie-break
    "qc_freshness_lag",          // horizon window over per-type aggregate
    "graph_assortativity",       // decimal Pearson, sqrt-free division
    "ml_ndcg_at_k",              // twin TopKPerKey heaps + decimal DCG
    "evt_funnel_windowed",       // µs deadline joins + 3-row lag window
    "join_view_delta_maintain",  // gated base + delta branches + decimal sums
    "ml_auc_by_segment",         // lang-partitioned histogram windows
    "evt_overlap_matrix",        // pair-collapse self-join + integer ppm
    "qc_join_fanout",            // checkpointed multiplicities + top-20 tie
    "bit_funcs",                 // commutative bitwise rollups
    "ml_operating_point",        // histogram cumsums + struct argmax
    "qc_quarantine_split",       // tag + dual-sink write + read-back rollup
    "dedup_survivorship_merge",  // per-field struct-argmax golden record
    "txt_source_overlap",        // df-capped shingle self-join + containment
    "emb_dim_variance_rank",     // decimal variance + 64-row rank windows
    "sql_q1_pricing_summary",    // capped-width decimal micro-unit money
    "evt_error_rate_slo",        // checkpointed hourly + dual ppm gates
    "sim_knn_classify",          // cosine rank tie-break + vote argmax
    "evt_decay_engagement",      // integer half-life weights + top-20 tie
    "qc_uniqueness_profile",     // one-Expand multi-distinct + stack
    "ml_cv_auc_stability",       // fold-partitioned histogram windows
    "ml_feature_standardize",    // exact moments + IEEE sqrt z buckets
    "graph_clustering_coeff",    // checkpointed wedge joins + integer ppm
    "graph_hits",                // integer mutual reinforcement + renorm
    "ml_gain_lift_deciles",      // histogram Lorenz interpolation + lag
    "evt_gini_concentration",    // count-of-counts integer rank sum
    "evt_diff_in_diff",          // integer-unit 2x2 panel + broadcast mid
    "dt_business_days",          // closed-form weekday integer arithmetic
    "txt_gopher_filter",         // per-doc integer rules + stack rollup
    "txt_boilerplate_coverage",  // checkpointed positioned grams + ppm
    "scan_custom_dsv2",          // DSv2 readers: pure function of row id
    "ml_woe_encoding",           // broadcast totals + ln + round(6)
    "ml_brier_decomposition",    // decimal ppm^2 sums over the histogram
    "dedup_url_canonicalize",    // parse_url + sorted-params groupBy
    "evt_stickiness_ratio",      // checkpointed triple distinct + ppm
    "ml_fairness_parity",        // 2x2 integer cells + bounded gap windows
    "scan_dsv2_agg_pushdown",    // per-slice partial aggs, merge-invariant
    "agg_kmv_intersect",         // bottom-k sketches + theta intersection
    "evt_survival_km",           // decimal-ln cumsum over duration histogram
    "evt_peak_concurrency",      // sweep-line max, tie-block invariant
    "evt_assoc_rules",           // basket self-join + integer ppm
    "scan_csv_multiline",        // multiLine round trip + mass aggregates
    "join_dsv2_stats_broadcast", // stats-driven broadcast, decimal revenue
    "win_rolling_corr",          // decimal(38) power-sum frames + sqrt
    "join_dsv2_runtime_filter",  // runtime In-filter is efficiency-only
    "dt_fiscal_calendar",        // integer 4-4-5 closed form + decimal
    "ml_champion_challenger",    // model-partitioned histogram AUC
    "ml_cem_matching",           // integer strata + weighted-gap rollup
    "win_hampel_outliers",       // exact array median/MAD in micro-units
    "txt_winnowing",             // frame minima over positioned hashes
    "dedup_sorted_neighborhood", // partitioned lead windows + levenshtein
    "scan_recursive_glob",       // listing-time glob + union aggregates
    "agg_pareto_coverage",       // ranked cumulative window, full tie order
    "ml_qini_uplift",            // arm histogram + descending cumsums
    "evt_bounce_rate",           // sessionize + day ppm rollup
    "evt_welch_ttest",           // decimal moments + IEEE finish
    "evt_ab_power_mde",          // decimal moments + floor-cast ppm
    "txt_mattr_diversity",       // per-doc window transform + ppm
    "agg_quantiles_hist_det",    // histogram cumsum + ceil rank pick
    "txt_freq_tokens_det",       // vocab count + broadcast-scalar support gate
    "win_sliding_distinct_det",  // matrix explode + trailing countDistinct
    "txt_dsir_weight",           // md5-bucket profiles + integer ppm ratio
    "txt_dsir_resample",         // Knuth-hash uniform vs integer score gate
    "agg_countmin_freq_det",     // md5 hex-pair grid + broadcast min join
    "txt_hashing_tf_det",        // md5-pair bucket fold + per-doc counts
    "scan_xml_roundtrip",        // 4-file xml fan-out + schema-on-read agg
    "join_spatial_grid_eps",     // 3x3 cell replication + exact dist filter
    "evt_srm_check",             // exact variant counts + IEEE chi-square
    "evt_cuped_lift",            // exact integer moments + linearity finish
    "ml_propensity_strat_ate",   // integer strata + ppm-quantized gap
    "txt_rake_keywords",         // islands window + ppm word scores
    "ml_conformal_interval",     // dual-counter histogram + cumsum pick
    "evt_seasonal_ma_decompose", // daily rollup + centered-MA windows
    "ml_poisson_bootstrap_ci",   // md5 Poisson weights + order statistic
    "evt_group_sequential_obf",  // per-look exact counts + IEEE z finish
    "txt_cdc_chunks",            // windowed gear cuts + chunk-hash rollup
    "txt_bpe_encode",            // rank-ordered literal rewrites + rollup
    "serve_hybrid_search",       // dual rank windows + integer RRF ties
    "serve_prefix_autocomplete", // df ties broken by token, bounded top-5
    "serve_doc_snippet",         // collected id cut + first-occurrence pos
    "txt_pack_sequences")        // two-pass prefix sum vs partition count
}

class DeterminismSpec extends AnyFunSuite {
  import TestSession._
  import DeterminismMatrix.keys

  private def rows(name: String, parts: String): Seq[String] = {
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.shuffle.partitions", parts)
    try Registry.queries(name)(spark, sf).collect().map(_.toString).toSeq
    finally spark.conf.set("spark.sql.shuffle.partitions", prev)
  }

  for (k <- keys)
    test(s"$k is invariant to the shuffle partition count") {
      val a = rows(k, "7")
      val b = rows(k, "4")
      assert(a == b,
        s"$k differs across partition counts: ${a.diff(b).take(3)} vs ${b.diff(a).take(3)}")
    }
}
