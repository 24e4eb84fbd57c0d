package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** §1.4 schema system: evolvable value schemas with superset computation.
  *
  * Reference semantics: value schemas evolve per store, readers resolve
  * writer→reader, and stores with partial updates compute a superset schema
  * spanning all registered versions (AvroSupersetSchemaUtils shape).
  * Spark translation: StructType union with per-field reconciliation;
  * reads of mixed-version snapshot dirs use mergeSchema + projection.
  */
object SchemaEvolution {

  /** Superset of two value schemas: union of fields; same-name fields must
    * reconcile (equal types, or widenable numeric); nested structs recurse;
    * a field present on one side becomes nullable. */
  def superset(a: StructType, b: StructType): StructType = {
    val bByName = b.fields.map(f => f.name -> f).toMap
    val merged = a.fields.map { fa =>
      bByName.get(fa.name) match {
        case None => fa.copy(nullable = true)
        case Some(fb) => StructField(fa.name,
          reconcile(fa.name, fa.dataType, fb.dataType),
          nullable = fa.nullable || fb.nullable)
      }
    }
    val aNames = a.fieldNames.toSet
    val extra = b.fields.filterNot(f => aNames(f.name))
      .map(_.copy(nullable = true))
    StructType(merged ++ extra)
  }

  private def reconcile(name: String, x: DataType, y: DataType): DataType =
    (x, y) match {
      case (dx, dy) if dx == dy => dx
      case (sx: StructType, sy: StructType) => superset(sx, sy)
      case (ArrayType(ex, nx), ArrayType(ey, ny)) =>
        ArrayType(reconcile(name, ex, ey), nx || ny)
      case (MapType(kx, vx, nx), MapType(ky, vy, ny)) if kx == ky =>
        MapType(kx, reconcile(name, vx, vy), nx || ny)
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
      case (dx, dy) => throw new IllegalArgumentException(
        s"field $name: irreconcilable $dx vs $dy")
    }

  /** Type equality modulo nullability flags — a cast between types that
    * differ only in containsNull/valueContainsNull/field nullability is
    * unnecessary (and Spark rejects the narrowing direction outright). */
  def sameType(x: DataType, y: DataType): Boolean = (x, y) match {
    case (ArrayType(ex, _), ArrayType(ey, _)) => sameType(ex, ey)
    case (MapType(kx, vx, _), MapType(ky, vy, _)) =>
      sameType(kx, ky) && sameType(vx, vy)
    case (sx: StructType, sy: StructType) =>
      sx.length == sy.length && sx.fields.zip(sy.fields).forall {
        case (fx, fy) => fx.name == fy.name && sameType(fx.dataType, fy.dataType)
      }
    case _ => x == y
  }

  /** Project a frame (written under an older schema) to the superset:
    * missing fields become typed nulls, widened numerics cast. */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    target.fields.foldLeft(df) { (d, f) =>
      if (!have(f.name)) d.withColumn(f.name, lit(null).cast(f.dataType))
      else if (!sameType(d.schema(f.name).dataType, f.dataType))
        d.withColumn(f.name, col(f.name).cast(f.dataType))
      else d
    }.select(target.fieldNames.map(col): _*)
  }
}
