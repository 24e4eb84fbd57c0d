package graft

/** Plan auditor: prints formatted physical plans for representative queries
  * so scan pruning (ReadSchema/PushedFilters), broadcast joins, and
  * WholeStageCodegen spans can be inspected per round. */
object Explain {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSet
      else Set("q1_agg", "q3_join_topk", "r2_batchget", "r4_dotproduct",
        "b4_compaction", "dedup_minhash_lsh", "ann_topk",
        "q9_profit", "q21_waiting_supplier", "dedup_ngram_capped",
        "dedup_simhash64", "dsv2_store_read", "b19_join_view",
        "ann_sq8", "w16_update_cdc", "store_config", "b20_avro_union")
    val spark = graft.core.GraftSession.build(cpus = 4, appName = "explain")
    Queries.all.filter(q => names(q.name)).foreach { q =>
      println(s"\n========== ${q.name} ==========")
      q.fn(spark, sfDir).explain("formatted")
    }
    spark.stop()
  }
}
