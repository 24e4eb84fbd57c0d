package graft.sources

import java.nio.ByteBuffer
import scala.jdk.CollectionConverters._
import org.apache.avro.Schema
import org.apache.avro.file.{DataFileReader, DataFileWriter}
import org.apache.avro.generic.{GenericData, GenericDatumReader, GenericDatumWriter, GenericRecord}
import org.apache.avro.mapred.AvroKey
import org.apache.avro.mapreduce.AvroKeyInputFormat
import org.apache.hadoop.io.NullWritable
import org.apache.spark.TaskContext
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** B1: Avro container-file input — the reference push job's primary batch
  * format (reference shape: VeniceAvroRecordReader.java:27 extracts
  * key/value fields from each input GenericRecord; VeniceHdfsSource lists
  * the input dir). No Spark Avro connector ships in this build, so the scan
  * is a `newAPIHadoopFile` over `AvroKeyInputFormat` (the public
  * avro-mapred API): each split is decoded executor-side straight into
  * `Row`s — no driver involvement, standard HadoopRDD partitioning (one
  * split per block at scale), so the shape survives a 1000-file 100 TB
  * input like any other file scan.
  *
  * Type mapping: primitives, bytes/fixed, enum→string, arrays, string-keyed
  * maps, nested records, and nullable `[null, T]` unions — the subset the
  * reference's ETL actually emits. Timestamps should be normalized to
  * epoch longs upstream (Venice values are plain Avro records, no logical
  * types on the wire).
  *
  * [[write]] is the inverse (one container file per partition, written
  * executor-side) — used by ingest prep and the round-trip tests.
  */
object AvroInput {

  // ---- schema mapping ------------------------------------------------------

  /** Avro → Spark type. */
  def sparkType(s: Schema): DataType = s.getType match {
    case Schema.Type.STRING => StringType
    case Schema.Type.ENUM => StringType
    case Schema.Type.INT => IntegerType
    case Schema.Type.LONG => LongType
    case Schema.Type.FLOAT => FloatType
    case Schema.Type.DOUBLE => DoubleType
    case Schema.Type.BOOLEAN => BooleanType
    case Schema.Type.BYTES | Schema.Type.FIXED => BinaryType
    case Schema.Type.ARRAY => ArrayType(sparkType(s.getElementType))
    case Schema.Type.MAP => MapType(StringType, sparkType(s.getValueType))
    case Schema.Type.RECORD => StructType(s.getFields.asScala.map(f =>
      StructField(f.name, sparkType(f.schema))).toSeq)
    case Schema.Type.UNION => sparkType(nonNullBranch(s))
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  /** Spark → Avro type (nullable fields become `[null, T]` unions). */
  def avroType(dt: DataType, path: String): Schema = dt match {
    case StringType => Schema.create(Schema.Type.STRING)
    case IntegerType => Schema.create(Schema.Type.INT)
    case LongType => Schema.create(Schema.Type.LONG)
    case FloatType => Schema.create(Schema.Type.FLOAT)
    case DoubleType => Schema.create(Schema.Type.DOUBLE)
    case BooleanType => Schema.create(Schema.Type.BOOLEAN)
    case BinaryType => Schema.create(Schema.Type.BYTES)
    case ArrayType(et, _) => Schema.createArray(nullable(avroType(et, path)))
    case MapType(StringType, vt, _) =>
      Schema.createMap(nullable(avroType(vt, path)))
    case st: StructType => avroRecord(st, path.replace('.', '_'))
    case other =>
      throw new IllegalArgumentException(s"unsupported spark type $other at $path")
  }

  def avroRecord(st: StructType, name: String): Schema = {
    val fields = st.fields.map { f =>
      new Schema.Field(f.name, nullable(avroType(f.dataType, s"$name.${f.name}")),
        null, Schema.Field.NULL_DEFAULT_VALUE)
    }
    Schema.createRecord(name, null, "graft", false, fields.toList.asJava)
  }

  private def nullable(s: Schema): Schema =
    if (s.getType == Schema.Type.UNION) s
    else Schema.createUnion(Schema.create(Schema.Type.NULL), s)

  private def nonNullBranch(s: Schema): Schema = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    require(branches.size == 1, s"unsupported non-nullable union $s")
    branches.head
  }

  // ---- value conversion ----------------------------------------------------

  private def fromAvro(v: Any, s: Schema): Any =
    if (v == null) null
    else s.getType match {
      case Schema.Type.UNION => fromAvro(v, nonNullBranch(s))
      case Schema.Type.STRING | Schema.Type.ENUM => v.toString
      case Schema.Type.BYTES =>
        val bb = v.asInstanceOf[ByteBuffer]
        val out = new Array[Byte](bb.remaining()); bb.duplicate().get(out); out
      case Schema.Type.FIXED =>
        v.asInstanceOf[org.apache.avro.generic.GenericFixed].bytes().clone()
      case Schema.Type.ARRAY =>
        v.asInstanceOf[java.util.Collection[AnyRef]].asScala
          .map(fromAvro(_, s.getElementType)).toSeq
      case Schema.Type.MAP =>
        v.asInstanceOf[java.util.Map[AnyRef, AnyRef]].asScala
          .map { case (k, x) => k.toString -> fromAvro(x, s.getValueType) }.toMap
      case Schema.Type.RECORD =>
        val rec = v.asInstanceOf[GenericRecord]
        Row.fromSeq(s.getFields.asScala.toSeq.map(f =>
          fromAvro(rec.get(f.pos), f.schema)))
      case _ => v
    }

  private def toAvro(v: Any, s: Schema): AnyRef =
    if (v == null) null
    else s.getType match {
      case Schema.Type.UNION => toAvro(v, nonNullBranch(s))
      case Schema.Type.STRING => v.toString
      case Schema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.ARRAY =>
        v.asInstanceOf[scala.collection.Seq[Any]]
          .map(toAvro(_, s.getElementType)).asJava
      case Schema.Type.MAP =>
        v.asInstanceOf[scala.collection.Map[String, Any]]
          .map { case (k, x) => k -> toAvro(x, s.getValueType) }.asJava
      case Schema.Type.RECORD =>
        val row = v.asInstanceOf[Row]
        val rec = new GenericData.Record(s)
        s.getFields.asScala.foreach(f =>
          rec.put(f.pos, toAvro(row.get(f.pos), f.schema)))
        rec
      case _ => v.asInstanceOf[AnyRef]
    }

  // ---- read / write --------------------------------------------------------

  /** Writer schema of the first container file in the directory. */
  def writerSchema(path: String): Schema = {
    val first = new java.io.File(path).listFiles()
      .filter(_.getName.endsWith(".avro")).sortBy(_.getName).headOption
      .getOrElse(throw new IllegalArgumentException(s"no .avro files in $path"))
    val r = new DataFileReader[GenericRecord](first,
      new GenericDatumReader[GenericRecord]())
    try r.getSchema finally r.close()
  }

  /** Read a directory of Avro container files as a DataFrame. Decoding
    * happens per-split in executors (AvroKeyInputFormat falls back to each
    * file's writer schema when no reader schema is configured). */
  def read(spark: SparkSession, path: String): DataFrame = {
    val schemaJson = writerSchema(path).toString
    val structType = sparkType(new Schema.Parser().parse(schemaJson))
      .asInstanceOf[StructType]
    val rdd = spark.sparkContext.newAPIHadoopFile(
      path,
      classOf[AvroKeyInputFormat[GenericRecord]],
      classOf[AvroKey[GenericRecord]],
      classOf[NullWritable])
      .mapPartitions { it =>
        // GenericRecord is not serializable — convert to Row inside the task
        val schema = new Schema.Parser().parse(schemaJson)
        it.map { case (k, _) =>
          fromAvro(k.datum(), schema).asInstanceOf[Row]
        }
      }
    spark.createDataFrame(rdd, structType)
  }

  /** Write a DataFrame as Avro container files, one per partition, written
    * executor-side (local-filesystem paths in this build). */
  def write(df: DataFrame, path: String): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val schemaJson = avroRecord(df.schema, "graft_record").toString
    val sparkSchema = df.schema
    df.rdd.foreachPartition { it =>
      val schema = new Schema.Parser().parse(schemaJson)
      val pid = TaskContext.getPartitionId()
      val w = new DataFileWriter[GenericRecord](
        new GenericDatumWriter[GenericRecord](schema))
      w.create(schema, new java.io.File(f"$path%s/part-$pid%05d.avro"))
      try it.foreach { row =>
        w.append(toAvro(row, schema).asInstanceOf[GenericRecord])
      } finally w.close()
    }
  }
}
