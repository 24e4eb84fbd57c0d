package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Venice compute-AGGREGATION builder (facet counting): the serving-side
  * aggregation layer on top of read-compute.
  *
  * Reference semantics (NOT code): clients/venice-thin-client/.../store/
  * ComputeAggregationRequestBuilder.java:16-31 (the two-facet surface) and
  * FacetCountingUtils.java:30-115 — `countGroupByValue` counts each
  * distinct value of a field across the fetched records and returns the
  * top-K by count (nulls count as a value); `countGroupByBucket` counts,
  * per named predicate bucket, the records whose NON-null field value
  * matches, every declared bucket present even at count 0.
  *
  * Documented deviations: (1) the reference's ordering among equal counts
  * is stream order — here ties break deterministically by value ascending
  * (nulls last); (2) the reference returns per-field maps — here the
  * relational form `(kind, field, facet, cnt)`, which is what a DataFrame
  * consumer joins/filters on. The plan per field is one partial-agged
  * groupBy + a top-K window over the DISTINCT values only — never a global
  * row sort — and bucket counting is a single pass of conditional sums.
  */
class AggregationBuilder(df: DataFrame, keyCols: Seq[String]) {

  private var valueFacets: Seq[(Int, String)] = Seq.empty
  private var bucketFacets: Seq[(Seq[(String, Column => Column)], String)] =
    Seq.empty

  /** Count distinct values of each field, keep the top-K by count. */
  def countGroupByValue(topK: Int, fields: String*): this.type = {
    require(topK > 0, s"topK must be positive, got $topK")
    valueFacets ++= fields.map((topK, _)); this
  }

  /** Count per named predicate bucket (declaration order preserved in the
    * output via the facet column; predicates receive the field column). */
  def countGroupByBucket(buckets: Seq[(String, Column => Column)],
      fields: String*): this.type = {
    require(buckets.nonEmpty, "countGroupByBucket needs at least one bucket")
    bucketFacets ++= fields.map((buckets, _)); this
  }

  private def compile(base: DataFrame): DataFrame = {
    require(valueFacets.nonEmpty || bucketFacets.nonEmpty,
      "no aggregations requested")
    (valueFacets.map(_._2) ++ bucketFacets.map(_._2)).foreach { f =>
      require(base.columns.contains(f), s"unknown field $f")
    }
    val valueParts = valueFacets.map { case (k, f) =>
      val counted = base.groupBy(col(f).cast("string").as("facet"))
        .agg(count(lit(1)).as("cnt"))
      val w = Window.partitionBy(lit(1))
        .orderBy(col("cnt").desc, col("facet").asc_nulls_last)
      counted.withColumn("__rk", row_number().over(w))
        .filter(col("__rk") <= k)
        .select(lit("value").as("kind"), lit(f).as("field"),
          col("facet"), col("cnt"))
    }
    val bucketParts = bucketFacets.map { case (buckets, f) =>
      // one conditional-sum pass; sums coalesce to 0 so every declared
      // bucket shows up even over an empty/never-matching input
      val sums = buckets.map { case (name, pred) =>
        coalesce(sum(when(col(f).isNotNull && pred(col(f)), 1L)), lit(0L))
          .as(name)
      }
      val one = base.agg(sums.head, sums.tail: _*)
      one.select(explode(map(
        buckets.flatMap { case (name, _) => Seq(lit(name), col(name)) }: _*))
        .as(Seq("facet", "cnt")))
        .select(lit("bucket").as("kind"), lit(f).as("field"),
          col("facet"), col("cnt"))
    }
    (valueParts ++ bucketParts).reduce(_ unionByName _)
  }

  /** Aggregate over the (whole) store view. */
  def execute(): DataFrame = compile(df)

  /** Aggregate over a key set (R2-style broadcast semi-join first). */
  def executeForKeys(keys: DataFrame): DataFrame =
    compile(df.join(broadcast(keys), keyCols, "left_semi"))
}
