package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Corpus vocabulary induction and out-of-vocabulary auditing — the
  * "does my tokenizer/vocab cover this corpus" step of a training-data
  * pipeline (vocabulary truncation is where rare-language and code text
  * silently degrades).
  *
  * Scale shape: the vocabulary is small BY DEFINITION (k entries), so it
  * is computed with one token-keyed aggregation and then broadcast; the
  * audit streams the corpus through a map-side join + one doc-keyed
  * re-aggregation. The corpus crosses the network once per stage, never
  * collected.
  */
object Vocab {

  /** Top-`k` corpus vocabulary by token frequency: `token`, `n_occ`,
    * `rank` (1-based). Ties broken by token text ascending, so the cut at
    * rank k is deterministic across engines. One shuffle on token; the
    * ordered-limit and rank window run on k candidate rows, not the
    * corpus. */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    docs.select(explode(TextOps.tokens(col(textCol))).as("token"))
      .groupBy(col("token")).agg(count(lit(1)).as("n_occ"))
      .orderBy(col("n_occ").desc, col("token"))
      .limit(k)
      .withColumn("rank",
        row_number().over(Window.orderBy(col("n_occ").desc, col("token"))))
  }

  /** Per-document audit against the top-`k` vocabulary: token count, OOV
    * token count, and `oov_ppm` — integer parts-per-million OOV rate
    * (exact integer math, no float rounding to disagree across engines).
    * Documents with zero tokens emit no row (they have no coverage to
    * audit). */
  def oovAudit(docs: DataFrame, idCol: String, textCol: String,
      k: Int): DataFrame = {
    val vocab = topK(docs, textCol, k)
      .select(col("token"), lit(1).as("__in_vocab"))
    docs.select(col(idCol), explode(TextOps.tokens(col(textCol))).as("token"))
      .join(broadcast(vocab), Seq("token"), "left")
      .groupBy(col(idCol))
      .agg(count(lit(1)).as("n_tokens"),
        count(when(col("__in_vocab").isNull, 1)).as("n_oov"))
      .withColumn("oov_ppm", expr("n_oov * 1000000 div n_tokens"))
  }
}
