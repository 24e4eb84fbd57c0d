package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import graft.functions.VectorOps

/** Venice read-compute request builder (R3–R10): accumulate projection +
  * vector ops + predicate, validate against the store schema, and compile to
  * a single select — Catalyst then prunes columns and pushes the predicate
  * down to the scan.
  *
  * Reference semantics: clients/venice-thin-client/.../store/
  * ComputeRequestBuilder.java:16-111 (builder surface) and
  * AbstractAvroComputeRequestBuilder.java:408-501 (validation: fields must
  * exist and be float arrays, result names unique and non-colliding); the
  * error map column mirrors `__veniceComputationError__`.
  */
class ComputeBuilder(df: DataFrame, keyCols: Seq[String]) {
  import ComputeBuilder._

  private var projected: Seq[String] = Seq.empty
  private var ops: Seq[Op] = Seq.empty
  private var predicate: Option[Column] = None

  def project(fields: String*): this.type = { projected ++= fields; this }
  def dotProduct(f: String, p: Seq[Double], as: String): this.type =
    { ops :+= Dot(f, p, as); this }
  def cosineSimilarity(f: String, p: Seq[Double], as: String): this.type =
    { ops :+= Cos(f, p, as); this }
  def hadamardProduct(f: String, p: Seq[Double], as: String): this.type =
    { ops :+= Had(f, p, as); this }
  def count(f: String, as: String): this.type = { ops :+= Cnt(f, as); this }

  /** R9/R10: partial-key / predicate filter. */
  def withFilter(pred: Column): this.type = { predicate = Some(pred); this }

  private def vectorField(o: Op): Option[String] = o match {
    case Dot(f, _, _) => Some(f)
    case Cos(f, _, _) => Some(f)
    case Had(f, _, _) => Some(f)
    case _ => None
  }

  private def validate(): Unit = {
    val schema = df.schema
    def field(n: String): StructField = schema.fields
      .find(_.name == n)
      .getOrElse(throw new IllegalArgumentException(s"unknown field $n"))
    projected.foreach(field)
    ops.flatMap(vectorField).foreach { f =>
      field(f).dataType match {
        case ArrayType(FloatType | DoubleType, _) => ()
        case other => throw new IllegalArgumentException(
          s"$f must be a float/double array, is $other")
      }
    }
    ops.collect { case Cnt(f, _) => f }.foreach { f =>
      field(f).dataType match {
        case _: ArrayType | _: MapType => ()
        case other => throw new IllegalArgumentException(
          s"$f must be a collection, is $other")
      }
    }
    val results = ops.map(_.result)
    require(results.distinct.size == results.size, "duplicate result names")
    val taken = (keyCols ++ projected).toSet
    results.foreach(r => require(!taken(r), s"result name $r collides"))
  }

  private def compile(base: DataFrame): DataFrame = {
    validate()
    val computed: Seq[Column] = ops.map {
      case Dot(f, p, as) => VectorOps.dotProduct(col(f), p).as(as)
      case Cos(f, p, as) => VectorOps.cosineSimilarity(col(f), p).as(as)
      case Had(f, p, as) => VectorOps.hadamardProduct(col(f), p).as(as)
      case Cnt(f, as) => VectorOps.countElements(col(f)).as(as)
    }
    val errInputs = ops.flatMap {
      case Dot(f, p, as) => Some((as, col(f), p.length))
      case Cos(f, p, as) => Some((as, col(f), p.length))
      case Had(f, p, as) => Some((as, col(f), p.length))
      case _ => None
    }
    val errCol =
      if (errInputs.isEmpty)
        typedLit(Map.empty[String, String]).as(ErrorCol)
      else VectorOps.computationErrors(errInputs).as(ErrorCol)
    base.select((keyCols ++ projected).map(col) ++ computed :+ errCol: _*)
  }

  /** Compile over the (optionally filtered) full store. */
  def execute(): DataFrame =
    compile(predicate.fold(df)(df.filter))

  /** Compute over a key set (R2-style broadcast semi-join first). */
  def executeForKeys(keys: DataFrame): DataFrame =
    compile(predicate.fold(df)(df.filter)
      .join(broadcast(keys), keyCols, "left_semi"))
}

object ComputeBuilder {
  val ErrorCol = "__veniceComputationError__"

  private sealed trait Op { def result: String }
  private final case class Dot(field: String, p: Seq[Double], result: String) extends Op
  private final case class Cos(field: String, p: Seq[Double], result: String) extends Op
  private final case class Had(field: String, p: Seq[Double], result: String) extends Op
  private final case class Cnt(field: String, result: String) extends Op
}
