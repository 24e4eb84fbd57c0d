package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Recursively widen a schema to fully-nullable. Registered value
    * schemas are normalized this way: snapshot parquet reads surface
    * every field as nullable regardless of what the writer declared, and
    * the A/A state rebuilds (array/map element casts in CrdtMerge) are
    * illegal INTO a non-null-element type — a store pushed from a
    * `collect_set` array (containsNull=false) must still fold. */
  def nullable(s: StructType): StructType =
    StructType(s.fields.map(f =>
      f.copy(dataType = nullableType(f.dataType), nullable = true)))

  private def nullableType(dt: DataType): DataType = dt match {
    case s: StructType => nullable(s)
    case ArrayType(e, _) => ArrayType(nullableType(e), containsNull = true)
    case MapType(k, v, _) =>
      MapType(nullableType(k), nullableType(v), valueContainsNull = true)
    case other => other
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

  /** Conform one column from its current type to the target type.
    * Recursive where a plain cast is illegal or lossy: a struct gains
    * fields as typed nulls (Spark refuses struct casts that change field
    * count), arrays/maps conform element-wise. */
  def conformCol(c: Column, from: DataType, to: DataType): Column =
    (from, to) match {
      case (f, t) if sameType(f, t) => c
      case (fs: StructType, ts: StructType) =>
        val have = fs.fieldNames.toSet
        when(c.isNull, lit(null).cast(ts)).otherwise(struct(ts.fields.map {
          tf =>
            (if (have(tf.name))
              conformCol(c.getField(tf.name), fs(tf.name).dataType, tf.dataType)
            else lit(null).cast(tf.dataType)).as(tf.name)
        }.toIndexedSeq: _*).cast(ts))
      case (ArrayType(fe, _), ArrayType(te, _)) =>
        transform(c, e => conformCol(e, fe, te)).cast(to)
      case (MapType(_, fv, _), MapType(_, tv, _)) =>
        map_from_entries(transform(map_entries(c), e =>
          struct(e.getField("key").as("key"),
            conformCol(e.getField("value"), fv, tv).as("value")))).cast(to)
      case _ => c.cast(to)
    }

  /** Project a frame (written under an older schema) to the superset:
    * missing fields become typed nulls, widened numerics cast, nested
    * structs conform field-wise (a field ADDED inside a struct reads as a
    * typed null on old rows — a plain cast would be rejected). */
  def conform(df: DataFrame, target: StructType): DataFrame = {
    val have = df.columns.toSet
    target.fields.foldLeft(df) { (d, f) =>
      if (!have(f.name)) d.withColumn(f.name, lit(null).cast(f.dataType))
      else if (!sameType(d.schema(f.name).dataType, f.dataType))
        d.withColumn(f.name,
          conformCol(col(f.name), d.schema(f.name).dataType, f.dataType))
      else d
    }.select(target.fieldNames.map(col): _*)
  }
}
