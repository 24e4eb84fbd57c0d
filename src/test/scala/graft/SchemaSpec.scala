package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite
import graft.core.{GraftSession, SchemaEvolution, Tables}
import graft.operators.Salting

class SchemaSpec extends AnyFunSuite {
  lazy val spark = GraftSession.build(cpus = 4, appName = "schema-spec")
  val sf = "/root/testdata/sf0.001"

  test("superset merges, widens, recurses, and rejects conflicts") {
    val v1 = StructType(Seq(
      StructField("id", IntegerType, nullable = false),
      StructField("name", StringType),
      StructField("meta", StructType(Seq(StructField("a", IntegerType))))))
    val v2 = StructType(Seq(
      StructField("id", LongType),
      StructField("score", DoubleType),
      StructField("meta", StructType(Seq(
        StructField("a", IntegerType), StructField("b", StringType))))))
    val sup = SchemaEvolution.superset(v1, v2)
    assert(sup("id").dataType == LongType)
    assert(sup("score").nullable)
    assert(sup("meta").dataType.asInstanceOf[StructType].fieldNames.toSeq
      == Seq("a", "b"))
    intercept[IllegalArgumentException] {
      SchemaEvolution.superset(
        StructType(Seq(StructField("x", StringType))),
        StructType(Seq(StructField("x", LongType))))
    }
  }

  test("conform projects an old-schema frame to the superset") {
    import spark.implicits._
    val old = Seq((1, "a")).toDF("id", "name")
    val target = StructType(Seq(
      StructField("id", LongType),
      StructField("name", StringType),
      StructField("score", DoubleType)))
    val out = SchemaEvolution.conform(old, target)
    assert(out.schema("id").dataType == LongType)
    assert(out.head.isNullAt(2))
  }

  test("salted aggregation matches direct aggregation") {
    val ev = Tables.events(spark, sf)
    val direct = ev.groupBy("event_type")
      .agg(sum(col("value")).as("sum"), count(lit(1)).as("count"))
    val salted = Salting.saltedSum(ev, Seq("event_type"), col("value"))
    val joined = direct.as("d").join(salted.as("s"), Seq("event_type"))
      .filter(col("d.count") =!= col("s.count") ||
        abs(col("d.sum") - col("s.sum")) > 1e-6)
    assert(joined.count() == 0)
  }
}
