package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exact distributed discrete percentiles (quantile_disc semantics) via a
  * value histogram — the corpus-QA primitive ("p99 document length per
  * language") that `approx_percentile` only estimates and a global sort
  * can't survive at scale.
  *
  * Shape: one shuffle to the (key, value) histogram with map-side partial
  * counts, then a keyed window over the DISTINCT values only (cardinality-
  * bounded — token counts, score buckets — not row-bounded), then one keyed
  * aggregate. No row-level global sort ever exists; 100 TB of rows with a
  * few thousand distinct values per key costs what a groupBy costs.
  *
  * Percentile rule: smallest value whose cumulative count ≥ ⌈p·n/100⌉,
  * computed in EXACT integer arithmetic — bit-identical to DuckDB's
  * `quantile_disc` (rule verified empirically including the float-fragile
  * exact-integer boundaries like p99 of n=300).
  */
object Percentiles {

  /** @param percents integer percentiles in (0, 100], e.g. Seq(50, 90, 99);
    *                 emitted as columns `p50`, `p90`, ... plus `n_rows` */
  def disc(df: DataFrame, keyCols: Seq[String], valueCol: Column,
      percents: Seq[Int]): DataFrame = {
    require(percents.nonEmpty && percents.forall(p => p > 0 && p <= 100),
      s"percents must be in (0,100], got $percents")
    val hist = df
      .select(keyCols.map(col) :+ valueCol.cast("long").as("__v"): _*)
      .groupBy(keyCols.map(col) :+ col("__v"): _*)
      .agg(count(lit(1)).as("__c"))
    val byKey = Window.partitionBy(keyCols.map(col): _*)
    val cum = hist
      .withColumn("__cum", sum(col("__c")).over(byKey.orderBy(col("__v"))))
      .withColumn("__n", sum(col("__c")).over(byKey))
    // integer cum ≥ ⌈p·n/100⌉  ⟺  100·cum ≥ p·n — no division at all
    cum.groupBy(keyCols.map(col): _*)
      .agg(max(col("__n")).as("n_rows"),
        percents.map(p =>
          min(when(col("__cum") * 100 >= col("__n") * p, col("__v")))
            .as(s"p$p")): _*)
  }
}
