package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Venice push-job compaction (B4): per key keep the record with the highest
  * offset / timestamp, plus the duplicate-key audit counts.
  *
  * Reference semantics: clients/venice-push-job/.../spark/datawriter/jobs/
  * AbstractDataWriterSparkJob.applyCompaction (groupByKey + flatMapGroups,
  * max-offset wins; counts duplicate keys with identical vs distinct values).
  *
  * Scale notes: one hash shuffle on the key columns; rank inside partitions.
  * AQE handles skewed keys; no driver-side state.
  */
object Compaction {

  /** Keep the winning row per key under the given descending total order. */
  def latestPerKey(df: DataFrame, keys: Seq[String], order: Seq[Column]): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*).orderBy(order.map(_.desc): _*)
    df.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
  }

  /** Duplicate-key audit: per duplicated key, how many copies and how many
    * distinct values (Venice distinguishes identical vs divergent dups). */
  def duplicateAudit(df: DataFrame, keys: Seq[String], valueCol: Column): DataFrame =
    df.groupBy(keys.map(col): _*)
      .agg(count(lit(1)).as("copies"),
        countDistinct(valueCol).as("distinct_values"))
      .filter(col("copies") > 1)
}
