package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Cross-engine deterministic hashing built on md5.
  *
  * Venice partitions records by `MD5(serialized key) mod N`
  * (reference: internal/venice-client-common/.../partitioner/
  * DefaultVenicePartitioner.java:55-77). We reproduce the same shape —
  * md5-of-key mod N — over a string rendering of the key, which keeps the
  * function reproducible in any engine (the DuckDB oracle included) without
  * Avro byte serialization.
  *
  * All helpers here are pure `Column` compositions (codegen'd by Catalyst,
  * no UDFs), so they stay inside WholeStageCodegen at any scale.
  */
object HashOps {

  /** First 15 hex chars of md5 as a non-negative Long (60 bits).
    * DuckDB equivalent: `('0x' || substr(md5(x),1,15))::BIGINT`. */
  def h64(c: Column): Column =
    conv(substring(md5(c.cast("string")), 1, 15), 16, 10).cast("long")

  /** Seeded variant: independent hash family member i.
    * DuckDB: `('0x' || substr(md5(i || '|' || x),1,15))::BIGINT`. */
  def h64Seeded(seed: Int, c: Column): Column =
    h64(concat(lit(seed.toString), lit("|"), c.cast("string")))

  /** Venice-style partition id: md5-mod over the key rendering.
    * DuckDB: `(('0x'||substr(md5(x),1,15))::BIGINT) % N`. */
  def partitionId(key: Column, numPartitions: Int): Column =
    (h64(key) % numPartitions).cast("int")

  /** THE key rendering every routing site must share: "|"-joined string
    * casts with null components rendered as the literal "null" — exactly
    * `String.valueOf`, which the driver-side twin
    * (GraftEngine.bucketHashOf) uses. A bare `concat_ws` DROPS nulls, so
    * a null key component would route/compare differently on the two
    * sides and a point read for that key could never match. */
  def renderKey(keyCols: Seq[String]): Column =
    concat_ws("|",
      keyCols.map(c => coalesce(col(c).cast("string"), lit("null"))): _*)
}
