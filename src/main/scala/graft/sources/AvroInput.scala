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
  * maps, nested records, nullable `[null, T]` unions, and GENERAL
  * multi-branch unions as tagged structs-of-optionals (SURVEY §1.2:
  * `union[null, A, B]` ↔ `struct<tag, m_A, m_B>` — see [[branchName]]);
  * the reference's own SQL projection skips multi-branch unions
  * (AvroToSQL.java:43-49), this mapping carries them losslessly.
  * Timestamps should be normalized to epoch longs upstream (Venice values
  * are plain Avro records, no logical types on the wire).
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
    case Schema.Type.UNION =>
      val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
      if (branches.size == 1) sparkType(branches.head) // nullable [null, T]
      else unionStruct(s) // general union → tagged struct-of-optionals
    case other =>
      throw new IllegalArgumentException(s"unsupported avro type $other")
  }

  // ---- general (multi-branch) unions ----------------------------------------
  // SURVEY §1.2's struct-of-optionals: a union [null, A, B, ...] maps to
  //   struct<tag: string, m_<A>: A', m_<B>: B', ...>
  // where exactly the member named by `tag` is non-null (a null union value
  // is a null struct). The reference's own SQL projection skips these
  // (AvroToSQL.java:43-49); this mapping makes them first-class instead —
  // write-compute's union-typed value fields round-trip losslessly.

  /** Stable name of a union branch: the declared name for named types
    * (record/enum/fixed), the type name for primitives/containers. */
  def branchName(s: Schema): String = s.getType match {
    case Schema.Type.RECORD | Schema.Type.ENUM | Schema.Type.FIXED => s.getName
    case t => t.getName.toLowerCase
  }

  /** Union-tag column name inside the mapped struct. */
  val UnionTagField = "tag"

  private def unionStruct(s: Schema): StructType = {
    val branches = s.getTypes.asScala.filter(_.getType != Schema.Type.NULL)
    StructType(StructField(UnionTagField, StringType) +:
      branches.map(b =>
        StructField(s"m_${branchName(b)}", sparkType(b))).toSeq)
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

  // ---- value conversion ----------------------------------------------------

  private def fromAvro(v: Any, s: Schema): Any =
    if (v == null) null
    else s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
          .filter(_.getType != Schema.Type.NULL)
        if (branches.size == 1) fromAvro(v, branches.head)
        else {
          // tagged struct: resolve the live branch, set its member slot
          val live = s.getTypes.get(
            org.apache.avro.generic.GenericData.get().resolveUnion(s, v))
          Row.fromSeq(branchName(live) +: branches.toSeq.map(b =>
            if (b eq live) fromAvro(v, b) else null))
        }
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

  private[graft] def toAvro(v: Any, s: Schema): AnyRef =
    if (v == null) null
    else s.getType match {
      case Schema.Type.UNION =>
        val branches = s.getTypes.asScala
          .filter(_.getType != Schema.Type.NULL)
        if (branches.size == 1) toAvro(v, branches.head)
        else {
          // tagged struct back to the union: the tag picks the branch,
          // that branch's member slot carries the value
          val row = v.asInstanceOf[Row]
          val tag = row.getString(0)
          val idx = branches.indexWhere(b => branchName(b) == tag)
          require(idx >= 0, s"union tag '$tag' matches no branch of $s")
          toAvro(row.get(1 + idx), branches(idx))
        }
      case Schema.Type.STRING => v.toString
      case Schema.Type.ENUM =>
        new GenericData.EnumSymbol(s, v.toString)
      case Schema.Type.BYTES => ByteBuffer.wrap(v.asInstanceOf[Array[Byte]])
      case Schema.Type.FIXED =>
        new GenericData.Fixed(s, v.asInstanceOf[Array[Byte]])
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
    * executor-side (local-filesystem paths in this build). The Avro schema
    * is derived from the frame ([[avroRecord]] — all-nullable fields, no
    * multi-branch unions). */
  def write(df: DataFrame, path: String): Unit =
    write(df, path, avroRecord(df.schema, "graft_record"))

  /** Write under an EXPLICIT writer schema — the lossless path for schemas
    * the derived mapping can't reconstruct (multi-branch unions, enums,
    * fixed). `df`'s shape must be [[sparkType]] of `schema` (union fields
    * as tagged structs); a read→write round-trip satisfies this by
    * construction. */
  def write(df: DataFrame, path: String, writerSchema: Schema): Unit = {
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(path))
    val schemaJson = writerSchema.toString
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
