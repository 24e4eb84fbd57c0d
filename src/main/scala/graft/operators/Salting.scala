package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salt hot keys so one reducer doesn't own the whole
  * distribution. Two-phase aggregate — partial agg on (key, salt), final
  * agg on key — is semantics-preserving for any commutative monoid.
  * (AQE's skew-join handling covers joins; this covers aggregations.) */
object Salting {

  /** Deterministic salt: hash of the full row, mod buckets — stable under
    * task retry and re-evaluation (rand() is not: a retried task would
    * re-draw salts and double-count rows mid-aggregation). Rows that are
    * full duplicates share a salt; for salting to spread a hot KEY that is
    * the point — its rows differ in the value columns. */
  def withSalt(df: DataFrame, buckets: Int): DataFrame =
    df.withColumn("__salt",
      pmod(xxhash64(df.columns.map(col): _*), lit(buckets)).cast("int"))

  /** Two-phase count/sum on a possibly-skewed key. `aggs` maps output name
    * → (partial expression, final combiner over the partial column). */
  def saltedSum(df: DataFrame, keys: Seq[String], valueCol: Column,
      buckets: Int = 16): DataFrame = {
    val salted = withSalt(df, buckets)
    val partial = salted
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(sum(valueCol).as("__psum"), count(lit(1)).as("__pcnt"))
    partial
      .groupBy(keys.map(col): _*)
      .agg(sum(col("__psum")).as("sum"), sum(col("__pcnt")).as("count"))
  }
}
