package graft

import org.apache.spark.sql.SparkSession

/** Benchmark main (driver contract): runs every registered query on
  * SPARK_GRAFT_SF_DIR, prints ONE JSON line.
  *
  * A full warmup pass runs first so the timed pass measures steady-state
  * plan execution, not JVM/classloader/FS-cache warmup (the first Spark
  * action in a fresh JVM pays ~5s of one-time cost).
  */
object Bench {
  def main(args: Array[String]): Unit = {
    // arg overrides env: the sbt server freezes fork env at boot, so ad-hoc
    // sweeps (e.g. the sf1 scale point) pass the dir explicitly
    val sfDir = args.headOption.getOrElse(
      sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    // args after the dir select a query subset — for adjudicating a
    // suspicious per-query timing by focused rerun without a full sweep
    val only: Set[String] = args.drop(1).toSet
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "4")
    val builder = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
    graft.core.GraftSession.requiredConfs
      .foreach { case (k, v) => builder.config(k, v) }
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val queries0 = Queries.all
    val queries = if (only.isEmpty) queries0 else queries0.filter(q => only(q.name))
    // warmup (untimed; failures surface in the timed pass's error map)
    queries.foreach { q =>
      try q.fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case e: Throwable =>
        System.err.println(s"[bench] warmup ${q.name} failed: ${e.getMessage}")
      }
    }
    spark.catalog.clearCache()
    // timed (cold cache per query — persists inside operators still help
    // within a query, which is the production shape). A failing query is
    // recorded with its error, never silently timed as near-zero.
    // MIN OF TWO timed passes per query: a one-shot timing on a contended
    // host can post multi-x phantoms (round 4's driver run showed five
    // 3-7x outliers a fresh rerun disproved); the min of two consecutive
    // passes is robust to transient contention while still measuring
    // steady-state plan execution.
    val results = queries.map { q =>
      def onePass(): (Double, Option[String]) = {
        val t0 = System.nanoTime()
        val err =
          try { q.fn(spark, sfDir).write.format("noop").mode("overwrite").save(); None }
          catch { case e: Throwable => Some(Option(e.getMessage).getOrElse(e.getClass.getName)) }
        val sec = (System.nanoTime() - t0) / 1e9
        // harness hygiene OUTSIDE the clock: drop this query's cached
        // blocks and collect its garbage now, so accumulated heap debt
        // from 70+ earlier queries can't bill an innocent later one with
        // a full-GC stall mid-measurement
        spark.catalog.clearCache()
        System.gc()
        (sec, err)
      }
      val (t1, e1) = onePass()
      val (t2, e2) = if (e1.isEmpty) onePass() else (t1, e1)
      (q.name, math.min(t1, t2), e1.orElse(e2))
    }
    def esc(s: String): String =
      s.flatMap { case '"' => "\\\""; case '\\' => "\\\\"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString }
    val qs = results.map { case (k, v, _) => "\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val errs = results.collect { case (k, _, Some(e)) =>
      "\"" + k + "\":\"" + esc(e.take(300)) + "\"" }.mkString("{", ",", "}")
    val ok = results.count(_._3.isEmpty)
    val total = results.map(_._2).sum
    // rounds 3-4 added engine-path queries (temp-store pushes, a streaming
    // ingest, schema evolution, incremental views) on top of the 38-query
    // set BASELINE.md's sweeps recorded; "core" is the subtotal over that
    // original set so round-over-round comparisons stay apples-to-apples.
    // "total" covers everything.
    val addedLater = Set("w7_crdt_merge", "r7_count_map", "r12_store_meta", "w1_put_delete",
      "w2_update_builder", "w4_update_schema", "w9_chunk_roundtrip",
      "b6_wire_roundtrip", "b1_avro_roundtrip", "w10_compression",
      "b10_job_metrics", "b11_incremental_push", "b12_etl_normalize",
      "s1_stream_ingest", "s2_rewind", "s4_changelog", "s6_sql_view",
      "mm_frame_sample", "text_token_counts", "b4_dup_audit", "w7_crdt_map",
      "r13_schema_evolution", "b13_incremental_view",
      "s7_token_bucket", "dedup_clusters", "text_pii_redact", "split_assign",
      "b14_aa_incremental_view", "r14_aa_schema_evolution", "s3_lag_gate",
      "decontaminate", "sample_stratified", "mix_token_budget", "text_winnow",
      "text_repetition", "corpus_filter", "mix_report", "pack_sequences",
      "lm_rarity", "semdedup", "boilerplate_ngrams", "embed_quantize",
      "mix_temperature", "stream_window_agg", "corpus_shuffle",
      "mm_audio_resample", "q_asof_join", "corpus_percentiles",
      "q_range_join", "q_topk_group", "dedup_incremental", "sample_exact_k",
      "r15_facet_count", "doc_chunk", "vocab_coverage", "hard_negatives",
      "stream_enrich_join", "tfidf_topterms", "rolling_features",
      "corpus_diff", "domain_stats", "bloom_exclusion", "skew_profile",
      "stream_join", "stream_join_outer", "r16_asof_read",
      "quality_deciles", "b15_purge", "curriculum_interleave",
      "url_canonicalize", "bpe_pair_stats", "sample_weighted", "ann_ivf_pq",
      "stream_sessionize", "dedup_spans", "seq_length_hist", "gopher_rules",
      "split_leakage", "r17_rollback", "bm25_retrieval", "lm_bigram",
      "crawl_pagerank", "span_corrupt", "mix_rollup", "q5_local_supplier",
      "stream_trending", "q18_big_orders", "dedup_rate_report", "stream_dedup",
      "r18_partial_key", "funnel_analysis", "source_divergence",
      "props_json", "q_window_funcs", "dedup_incremental_near",
      "dataset_card", "k_anonymity", "q17_small_qty",
      "q_salted_join", "s9_bootstrap_changelog", "q_pivot", "w14_hll_union",
      "bpe_train_merges", "b16_agg_view", "bpe_encode", "dedup_cluster_keeper",
      "cohort_retention", "events_debounce", "centroid_classify", "q7_volume",
      "q_scd_join", "quality_ci", "r19_rebucket", "b17_data_recovery",
      "s10_stream_agg_view", "ann_dim_truncation",
      "mm_pair_audit", "pipeline_e2e", "b18_compact_policy",
      "q10_returns", "doc_lang_confusion", "emb_norm_audit",
      "q14_promo", "q19_bands", "events_resample", "dup_span_profile",
      "q22_no_orders", "daily_new_users", "q6_forecast", "data_contract",
      "s11_aa_two_region", "ab_analysis", "emb_outliers",
      "s12_ingest_resume", "q13_custdist", "q15_top_supplier",
      "q8_market_share", "export_jsonl", "label_next_purchase",
      "multi_store_join", "token_pmi", "q_approx_quantile",
      "rolling_distinct_hll", "events_heatmap", "event_transitions",
      "purchase_intervals", "w6_delete_wins", "dedup_ngram_capped",
      "pack_masks", "q9_profit", "q11_important_stock",
      "q21_waiting_supplier", "fim_transform", "batch_padding_waste",
      "r20_davinci", "nb_classifier_filter")
    val core = results.filterNot(r => addedLater(r._1)).map(_._2).sum
    println(s"""{"metric":"total","value":$total,"unit":"sec","core38":$core,"queries":$qs,"ok":$ok,"n":${results.size},"errors":$errs,"sf":"$sfDir"}""")
    if (results.exists(_._3.nonEmpty)) System.err.println(
      s"[bench] ${results.count(_._3.nonEmpty)} queries FAILED")
    spark.stop()
  }
}
