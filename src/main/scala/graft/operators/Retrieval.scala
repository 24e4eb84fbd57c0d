package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Hybrid-retrieval rank fusion.
  *
  * Reciprocal-rank fusion (Cormack, Clarke & Buettcher, "Reciprocal Rank
  * Fusion outperforms Condorcet and individual Rank Learning Methods",
  * SIGIR 2009): fused(d) = Σ_legs 1/(k + rank_leg(d)), summed over the
  * legs that ranked d at all. Ranks are exact integers, so the score is
  * computed as the integer surrogate 1e6/(k+rank) under integer division
  * — bit-for-bit reproducible across engines, no float ever enters the
  * fusion (the same no-float trick the bm25/tfidf family uses).
  *
  * Scale shape: every leg is a bounded per-query top-K list (|queries|·K
  * rows — tiny by construction, whatever the corpus size), so fusion is
  * one union + one groupBy on (query_id, doc_id) over |queries|·ΣK rows
  * and a bounded per-query window. All corpus-sized work lives in the
  * legs; fusing L legs never touches the corpus again.
  */
object Retrieval {

  /** Fuse ranking legs into a per-query top-`k` list.
    *
    * Each leg must carry (query_id, doc_id, rank) with rank 1-based and
    * dense within the leg. Output: (query_id, rank, doc_id, rrf_score,
    * legs) where `legs` counts how many input legs ranked the doc —
    * consensus hits sort first at equal depth because they sum more
    * reciprocal terms, which is the whole point of RRF. Ties break on
    * doc_id so the cut is deterministic across engines. */
  def rrfFuse(legs: Seq[DataFrame], k: Int, rrfK: Int = 60): DataFrame = {
    require(legs.nonEmpty, "rrfFuse needs at least one ranking leg")
    val all = legs
      .map(_.select(col("query_id"), col("doc_id"), col("rank")))
      .reduce(_ unionByName _)
    val fused = all
      .withColumn("contrib", expr(s"1000000L div (${rrfK}L + rank)"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("contrib")).as("rrf_score"), count(lit(1)).as("legs"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("rrf_score").desc, col("doc_id"))
    fused.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("doc_id"),
        col("rrf_score"), col("legs"))
  }
}
