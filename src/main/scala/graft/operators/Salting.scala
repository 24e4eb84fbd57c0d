package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew mitigation: salt hot keys so one reducer doesn't own the whole
  * distribution. Two-phase aggregate — partial agg on (key, salt), final
  * agg on key — is semantics-preserving for any commutative monoid.
  * (AQE's skew-join handling covers joins; this covers aggregations.) */
object Salting {

  /** Deterministic salt: hash of the row, mod buckets — stable under task
    * retry and re-evaluation (rand() is not: a retried task would re-draw
    * salts and double-count rows mid-aggregation). Rows that are full
    * duplicates share a salt; for salting to spread a hot KEY that is the
    * point — its rows differ in the value columns. Top-level map columns
    * hash via their entry arrays (hash() rejects MapType); columns with
    * maps nested deeper are skipped. */
  def withSalt(df: DataFrame, buckets: Int): DataFrame = {
    import org.apache.spark.sql.types._
    def hashable(dt: DataType): Boolean = dt match {
      case _: MapType => false
      case ArrayType(et, _) => hashable(et)
      case st: StructType => st.fields.forall(f => hashable(f.dataType))
      case _ => true
    }
    val cols = df.schema.fields.flatMap { f =>
      f.dataType match {
        case _ if hashable(f.dataType) => Some(col(f.name))
        case MapType(kt, vt, _) if hashable(kt) && hashable(vt) =>
          Some(map_entries(col(f.name)))
        case _ => None
      }
    }
    val salt =
      if (cols.isEmpty) lit(0) // nothing hashable — degenerate, but safe
      else pmod(xxhash64(cols.toIndexedSeq: _*), lit(buckets)).cast("int")
    df.withColumn("__salt", salt)
  }

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
