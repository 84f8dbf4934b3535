package graft.tools

import graft.{SparkEntry, Tables}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Scale-regime plan evidence (VERDICT r4 §next-round #2): runs the 20
  * headline queries plus the six join-battery queries against an
  * [[Amplify]]-amplified corpus with the CLUSTER posture (AQE on,
  * coalescePartitions, skew-join — [[graft.ScaleConfig.cluster]]),
  * times each, and records per-query plan facts from the AQE FINAL
  * plan. Fails loudly if any query plans a CartesianProduct or
  * BroadcastNestedLoopJoin at this scale.
  *
  * This is the measured back-stop for the per-plan scale arguments: the
  * plan guards in PlanSpec pin test-scale shapes; this artifact shows
  * the same queries at 10× bench rows under the config a real cluster
  * runs, where AQE (not the static planner) picks the join strategy.
  *
  * Run: `sbt "runMain graft.tools.ScaleCheck <ampDir> <outJson>"`.
  */
object ScaleCheck {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val outJson = if (args.length > 1) args(1) else "/tmp/scalecheck.json"
    // Optional comma-separated skip list (3rd arg) for queries whose
    // SEMANTICS are quadratic in the corpus (e.g. q90's all-pairs
    // cosine within one source — its scale path is the LSH/ANN family,
    // not a bigger exact run). Skips are recorded in the JSON, never
    // silent.
    val skip = if (args.length > 2) args(2).split(",").toSet else Set.empty[String]
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val builder = graft.ScaleConfig.cluster(SparkSession.builder())
      .master(s"local[$cpus]")
      // the cluster default (4096) targets 100 TB shuffles; at a 160 MB
      // local corpus AQE would coalesce every stage anyway — 64 keeps
      // the scheduler overhead honest without changing plan shapes
      .config("spark.sql.shuffle.partitions", "64")
      .config("spark.ui.enabled", "false")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    Tables.names.foreach(n => Tables.load(spark, dir, n).persist().count())

    // BNLJ is a scale-killer only when BOTH sides scale with the data.
    // q13 crossJoins a broadcast SINGLE-ROW query vector — the standard
    // scalar-attach plan (IdentityBroadcastMode of one row); the fact
    // side streams through untouched. Allowlisted, not excused: the
    // cartesian ban still applies to it.
    // q76 attaches a single-row total-mass scalar to the heavy-hitter
    // candidates the same way (IdentityBroadcastMode of one aggregate
    // row); q82 cross-combines THREE single-row aggregates into its
    // 1-row result — all non-scaling sides by construction.
    // q96 attaches the global max-date row and the 9-value quartile-
    // cutoff row; q99 attaches the single-row digit total — same
    // IdentityBroadcastMode single-row pattern. q104 crosses the hour
    // spine with a 2-row literal series list (bounded by construction).
    // Round-6 continuation additions, same single-row/bounded pattern:
    // q107/q108/q109 attach the basket count / the mean-co-count edge
    // cutoff (one aggregate row); q110 the contingency total row; q111
    // the distinct-doc count row; q115 the trigram total row; q119
    // combines SIX single-row anti-join counts; q127 the corpus
    // max-instant row; q128 the gap-histogram total row.
    // q134 attaches the total-rows row; q135 the timeline midpoint row;
    // q136 the corpus-total and (A, H(Q)) scalar rows; q138 the basket
    // count row; q141 the user total row — all single-row
    // IdentityBroadcastMode attaches, non-scaling by construction.
    // q149 attaches the single-row spectrum total; q152 cross-attaches
    // the |labels|-row centroid table (bounded by the label vocabulary,
    // 10 rows here — per-vector work is O(|labels|·dim) by design);
    // q153 attaches the single-row corpus stats row; q156 the
    // single-row unigram and bigram totals.
    // q90/q111 attach the single-row top-k boundary cosine/shared-count
    // (the class-collapse expansion cutoff); q55 the ONE-row bloom word
    // map (the q196 pattern, now the only bloom probe path) — all
    // single-row by construction.
    // q244 attaches the single-row candidate-pair total the same way.
    val scalarBroadcastOk = Set("q90_tfidf_pairs", "q111_winnowing",
      "q55_bloom_join", "q244_dedup_cost_model",
      "q13_cosine_topk", "q76_heavy_hitters",
      "q82_asof_ties", "q96_rfm_segments", "q99_benford",
      "q104_interpolate", "q107_assoc_rules", "q108_triangles",
      "q109_bfs", "q110_mutual_info", "q111_winnowing", "q115_trigrams",
      "q119_conformance", "q127_freshness", "q128_gap_histogram",
      "q130_quality_curve", "q134_ks_drift", "q135_psi", "q136_jsd",
      "q138_pmi", "q141_survival_curve", "q142_rank_bias",
      "q143_split_leakage", "q149_dup_spectrum", "q152_centroid_audit",
      "q153_bm25", "q156_collocations", "q160_top_supplier",
      "q161_idle_rich", "q167_quantile_norm",
      // q186 attaches the corpus-horizon row; q188 the brand-count
      // row; q194 the horizon row; q195 the single pooled-moments row;
      // q196 the ONE-row bloom-filter map (the whole point of the
      // operator: the filter rides a single broadcast row); q197/q198
      // the global stats row; q213 the single-row true-population
      // attach — all IdentityBroadcastMode single-row patterns
      "q186_decayed_engagement", "q188_negative_samples",
      "q194_churn_hazard", "q195_simpson", "q196_bloom_join",
      "q197_theil", "q198_kde", "q213_capture_recapture",
      // q217 attaches the 50-row top-vocab list; q218/q228/q230/q233/
      // q239 single-row stats/prior/total rows; q240 the median +
      // weight-total single rows — all bounded attaches
      "q217_burrows_delta", "q218_did_placebo", "q228_mixture_drift",
      "q230_eb_shrinkage", "q233_unigram_kl", "q239_multi_test",
      "q240_standardized_rate")

    // headline 20 + join battery + the round-5/6 additions (boilerplate
    // n-grams, count-min, priority sampling, quantile sketch, scd2,
    // funnel, cohort) — the newest operators get the same amplified-
    // corpus plan evidence as the originals
    val round56 = Seq("q75_boilerplate", "q76_heavy_hitters",
      "q77_weighted_sample", "q78_quantile_sketch", "q79_scd2",
      "q80_funnel", "q81_cohort_retention", "q82_asof_ties",
      "q83_pit_enrichment",
      // round-6 integrity/analytics family
      "q84_table_checksum", "q85_profile", "q86_corr_regr",
      "q87_unpivot", "q88_fuzzy_vocab", "q89_robust_outliers",
      "q90_tfidf_pairs", "q91_concurrent_sessions", "q92_active_users",
      "q93_snapshot_diff", "q94_rolling_checksum",
      // round-6 behavioral/statistical family
      "q95_transitions", "q96_rfm_segments", "q97_seasonal_anomaly",
      "q98_source_entropy", "q99_benford", "q100_attribution",
      "q101_keywords",
      // round-6 time-series family
      "q102_twap", "q103_ewma", "q104_interpolate",
      // round-6 continuation: experimentation, graph, sequential-stats,
      // spans, concentration, similarity and recommendation families
      "q105_ab_test", "q106_conversion_latency", "q107_assoc_rules",
      "q108_triangles", "q109_bfs", "q110_mutual_info", "q111_winnowing",
      "q112_pagerank", "q113_cusum", "q114_acf", "q115_trigrams",
      "q116_winsorize", "q117_streaks", "q118_concurrency",
      "q119_conformance", "q120_position", "q121_gini", "q122_pareto",
      "q123_cr4", "q124_oov", "q125_jaro_pairs", "q126_item_cf",
      "q127_freshness", "q128_gap_histogram", "q129_dow_profile",
      "q130_quality_curve", "q131_bounce_rate", "q132_rolling_corr",
      // round-6 continuation: weighted percentiles, distribution-drift
      // trio, text statistics, PMI, contamination matrix, survival
      "q133_weighted_median", "q134_ks_drift", "q135_psi", "q136_jsd",
      "q137_readability", "q138_pmi", "q139_lexical_diversity",
      "q140_source_overlap", "q141_survival_curve", "q142_rank_bias",
      "q143_split_leakage", "q144_spearman",
      // round-6 continuation: shape moments, equi-depth/Lorenz deciles,
      // windowed funnel, dup spectrum, SLA lags, audience overlap,
      // nearest-centroid label audit
      "q145_moments", "q146_equidepth", "q147_lorenz",
      "q148_window_funnel", "q149_dup_spectrum", "q150_ship_lag",
      "q151_audience_overlap", "q152_centroid_audit", "q153_bm25",
      "q155_calibration", "q156_collocations", "q157_new_returning",
      "q158_min_cost_supplier", "q159_small_qty_revenue",
      "q160_top_supplier", "q161_idle_rich", "q162_big_orders",
      "q163_session_paths", "q164_fd_audit", "q165_bitmap_distinct",
      "q166_proration", "q167_quantile_norm", "q168_quartile_migration",
      "q169_rank_fusion", "q170_window_bitmap_dau", "q171_corr_matrix",
      "q172_skyline", "q173_revenue_bridge", "q174_share_of_parent",
      // q177 prefix-jaccard joins q25/q154 in the pair-machinery
      // family (ScaleRun, not ScaleCheck: quadratic BY SEMANTICS on
      // the 99-exact-twins amplified corpus)
      "q175_debounce", "q176_interval_union",
      // ledger / stats / risk / forecast waves (q178-q195)
      "q178_fifo_costing", "q179_drawdown", "q180_kendall",
      "q181_k_anonymity", "q182_nucleus_vocab", "q183_zipf_fit",
      "q184_capped_balance", "q185_join_fanout",
      "q186_decayed_engagement", "q187_hhi", "q188_negative_samples",
      "q189_holt", "q190_isotonic", "q191_burstiness", "q192_coverage",
      "q193_multi_touch", "q194_churn_hazard", "q195_simpson",
      // bloom pruning, inequality, density, regression, classification,
      // graph-stats, resampling, decomposition, sketch, audit waves
      "q196_bloom_join", "q197_theil", "q198_kde", "q199_ols2",
      "q200_pca", "q201_abc", "q202_hits", "q203_clustering",
      "q204_cohort_ltv", "q205_bootstrap", "q206_seasonal_decompose",
      "q207_linear_counting", "q208_anova", "q209_stump",
      "q210_rapid_repeats", "q211_assortativity",
      "q212_deseasonal_anomaly", "q213_capture_recapture",
      "q214_unit_value_index", "q215_cond_entropy", "q216_up_streak",
      // evaluation / economics / epidemiology waves; q231/q243 join
      // the q25 pair-machinery family (quadratic on the exact-twins
      // amplified corpus — ScaleRun territory, like q90/q140/q143)
      "q217_burrows_delta", "q218_did_placebo", "q219_chao1",
      "q220_theil_sen", "q221_feature_hash", "q222_wilson_rank",
      "q223_var_cvar", "q224_mase_backtest", "q225_fertility",
      "q226_exp_fit", "q227_canonical_dedup", "q228_mixture_drift",
      "q229_overdispersion", "q230_eb_shrinkage", "q232_bursty_terms",
      "q233_unigram_kl", "q234_markov_predictor", "q235_auc",
      "q236_ece", "q237_gains", "q238_price_dispersion",
      "q239_multi_test", "q240_standardized_rate",
      "q241_seasonality_strength", "q242_ending_inventory",
      // round-7 additions; q246 is class-collapsed like q140/q143 so
      // the sweep is runnable on the exact-twins amplified corpus
      "q244_dedup_cost_model", "q245_twin_compression",
      "q246_threshold_sweep", "q247_langid_confusion")
    val names =
      (graft.Bench.headlineNames ++ NoBroadcastVerify.queries ++ round56)
        .distinct.sorted.filterNot(skip)
    val skipped = skip.toSeq.sorted
      .map(n => s""""$n": {"skipped": true}""")
    val results = names.map { name =>
      val fn = SparkEntry.queries(name)
      fn(spark, dir).collect() // warm: codegen + cache
      val t0 = System.nanoTime()
      val df = fn(spark, dir)
      df.collect()
      val sec = (System.nanoTime() - t0) / 1e9
      val p = df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
      val bad = p.contains("CartesianProduct") ||
        (p.contains("BroadcastNestedLoopJoin") && !scalarBroadcastOk(name))
      if (bad) {
        System.err.println(s"SCALE-KILLER in $name:\n$p")
        sys.exit(1)
      }
      val facts = Seq(
        "sec" -> f"$sec%.3f",
        "sort_merge_join" -> "SortMergeJoin".r.findAllIn(p).size.toString,
        "broadcast_hash_join" -> "BroadcastHashJoin".r.findAllIn(p).size.toString,
        "shuffled_hash_join" -> "ShuffledHashJoin".r.findAllIn(p).size.toString,
        "exchanges" -> "Exchange (hash|range|Single)".r.findAllIn(p).size.toString,
        "aqe_coalesced" -> p.contains("AQEShuffleRead").toString)
        .map { case (k, v) => s""""$k": $v""" }.mkString(", ")
      println(f"$name%-30s $sec%7.3f s")
      s""""$name": {$facts}"""
    }
    Files.writeString(Paths.get(outJson),
      (results ++ skipped).mkString("{\n ", ",\n ", "\n}"))
    println(s"wrote $outJson — ${names.size} queries, zero loop joins" +
      (if (skipped.nonEmpty) s"; skipped (quadratic semantics): ${skip.mkString(",")}" else ""))
    spark.stop()
  }
}
