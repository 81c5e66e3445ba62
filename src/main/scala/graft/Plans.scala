package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.SparkSession

/** Dev tool: dump `explain("formatted")` for representative queries to
  * PLANS.md — the scale-posture evidence (pushdown reaching the scan,
  * broadcast vs shuffle joins, whole-stage codegen spans, window-group
  * limits). Run: `sbt "runMain graft.Plans <sfDir> <outFile>"`.
  */
object Plans {
  private val Show = Seq(
    "q02_filter_pushdown",   // PushedFilters + pruned ReadSchema
    "q03_star_join_broadcast", // BroadcastHashJoin for dims
    "q04_factfact_join",     // shuffle join + AQE
    "q08_topk_per_group",    // WindowGroupLimit pushdown
    "q14_global_topk",       // TakeOrderedAndProject (no global sort)
    "q23_upsert",            // single-shuffle window merge
    "q34_ngram_jaccard",     // inverted-index self-join
    "q37_embedding_topk",    // codegen'd graft_dot + broadcast NL + 2-phase topk
    "q42_udaf_weighted_mean", // partial+final UDAF
    "q30_dedup_exact",       // fingerprint computed in scan stage, one shuffle
    "q60_pivot",             // static pivot = conditional agg, one pass
    "q65_timeseries_gapfill", // generated spine, no collect
    "q79_salted_join",       // salted (key, salt) equi-join, no hot reducer
    "q80_asof_native",       // custom AsOfJoinExec: 2 exchanges + sorts, merge scan
    "q39_embedding_pairs",   // blocked exact pair join: cell-partitioned, no BNLJ
    "q97_decontamination",   // cross-corpus inverted-index equi-join
    "q99_quantized_topk",    // codegen'd int8 quantize + integer-exact dots
    "q101_seq_packing",      // two-phase prefix sum: no global window partition
    "q112_bm25",             // tf shuffle + broadcast df join + per-doc top-3
    "q114_corpus_shuffle",   // two-phase rank: bucket-partitioned row_number
    "q119_tpch_q5",          // 6-table join: dim filters pushed, dims broadcast
    "q126_filtered_ann",     // label predicate pushed into the IVF index scan
    "q129_quality_classifier", // map-side hashed features, one partial-agg shuffle
    "q130_ivfpq_indexed",    // probe-only: pruned bucket scan + map-side ADC decode + exact refine
    "q131_lm_fluency",       // vocab-sized rate table joins instances once, doc_id agg
    "q133_turn_assembly",    // one user-keyed exchange feeds both session windows
    "q140_rrf_fusion",       // bounded fuse: hash-agg over Σk candidates + per-query window
    "q142_snm_pairs",        // banded rank-block equi-join, ids-only candidates
    "q144_winnowing",        // per-doc windows share one id exchange
    "q145_random_projection", // outDim codegen'd dots, zero shuffle
    "q148_per_source_quality_gate", // grouped two-phase rank: bucketed windows, tiny offsets frame
    "q151_quality_survivors",     // max_by hash agg, no per-cluster window
    "q152_semantic_decontamination", // broadcast bench, zero corpus shuffle
    "q154_pmi_phrases",           // two count shuffles + TakeOrdered top-k
    "q156_prefix_filter_jaccard", // prefix postings equi-join, ids-only candidates, position filter
    "q158_stratified_priority_sample", // WindowGroupLimit per-stratum heaps
    "q159_mad_outliers",          // two grouped two-phase ranks, no per-group window
    "q160_point_in_time_features", // label ×2 band explode + (key, bucket) equi-join + left join
    "q168_token_budget_select",   // two-phase prefix sum + pre-window off<=B bucket prune
    "q176_kcore",                 // semi-join peel rounds over cut edge frames
    "q177_ks_drift",              // count shuffle + grid-sized ECDF windows
    "q178_auc",                   // histogram agg below the one value-grid window
    "q165_bfs_hierarchy",         // r14: binary-lifting depths — sort over the walk cut
    "q185_head_overlap",          // r15: WindowGroupLimit heap-prunes the 2-partition vocab window
    "q188_burstiness",            // r15: global top-20 as TakeOrderedAndProject, no window
    "q194_frequent_pairs",        // r15: broadcast support-prune before the basket self-join
    "q211_pr_thresholds",         // r16: class-histogram agg below both grid windows
    "q215_psi_buckets",           // r16: two count shuffles + grid-sized bucket machinery
    "q227_pr_by_source",          // r17: PARTITIONED grid windows over the (source, value) histogram
    "q229_cusum",                 // r17: prefix-identity cumulative windows on the cut day grid
    "q231_binary_hamming_topk",   // r17: compressed-domain 2-phase shortlist + broadcast rerank
    "q234_budget_select_by_source", // r17: per-(group, bucket) offsets + boundary-bucket prune
    "q236_embedding_gram",        // r17: one map-side-combined triangle-buffer aggregator pass
    "q249_mutual_knn_margin",     // r17: broadcast pair gen + bounded per-id windows, ordered-fold k-NN sums
    "q253_zorder_extents",        // r17: broadcast bounds row + codegen'd Morton interleave + 16-bucket agg
    "q254_rolling_robust_outliers", // r17: 7× offset-explode equi-join windows (no non-equi day join)
    "q260_lateness_audit",        // r17: two-phase prefix max — bucketed windows, no global partition
    "q280_tpch_q17",              // r18: correlated scalar subquery DECORRELATED to per-part avg agg + equi-join
    "q283_tpch_q22",              // r18: one-shot uncorrelated scalar + LeftAnti with pushed date filter
    "q296_tpch_q20",              // r19: two-level decorrelation — scalar→agg-join inside a LeftSemi
    "q297_kendall_tau_nlogn",     // r19: one (g, level, block) window shuffle over the cut base
    "q301_tpch_q8",               // r19: seven-table join, dims broadcast, one CASE'd hash agg
    "q305_tpch_q2"                // r19: correlated MIN decorrelated to per-part agg + equality join
  )

  def main(args: Array[String]): Unit = {
    val sfDir = if (args.length > 0) args(0) else "/root/testdata/sf0.001"
    val out = if (args.length > 1) args(1) else "PLANS.md"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sb = new StringBuilder
    sb.append("# PLANS — physical-plan evidence (generated by graft.Plans)\n\n")
    sb.append(s"Scale factor dir: `$sfDir`. Each section is the ")
    sb.append("`explain(\"formatted\")` of a representative query; see the ")
    sb.append("per-query scale notes in src/main/scala/graft/queries/.\n")
    Show.foreach { name =>
      val df = SparkEntry.queries(name)(spark, sfDir)
      val plan = df.queryExecution.explainString(
        org.apache.spark.sql.execution.FormattedMode)
      sb.append(s"\n## $name\n\n```\n$plan```\n")
    }
    Files.writeString(Paths.get(out), sb.toString)
    println(s"wrote $out")
    spark.stop()
  }
}
