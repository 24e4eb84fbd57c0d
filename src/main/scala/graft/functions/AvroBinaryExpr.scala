package graft.functions

import org.apache.avro.Schema
import org.apache.avro.generic.{GenericDatumWriter, GenericRecord}
import org.apache.avro.io.EncoderFactory
import org.apache.spark.sql.{Column, GraftColumnBridge, Row}
import org.apache.spark.sql.catalyst.CatalystTypeConverters
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types.{BinaryType, DataType, StructType}

/** Avro binary serialization of a struct — the LWW serialized-byte
  * tie-break.
  *
  * Venice breaks equal-timestamp PUT/PUT conflicts over the SERIALIZED
  * value, but by hashCode comparison with nulls winning
  * (MergeUtils.compareAndReturn via MergeByteBuffer.compareAndReturn;
  * reference semantics, not code) — an order the reference's own TODO
  * flags as non-deterministic under hash collision. This engine keeps the
  * reference's tie-break DOMAIN (the Avro-serialized value bytes) but
  * ranks them with Spark's BinaryType unsigned lexicographic compare — a
  * stable, byte-defined total order. Any total order gives the CRDT
  * convergence the merge needs; this one is additionally reproducible
  * cross-engine for any value the Avro writer twin
  * ([[graft.sources.AvroInput.avroRecord]]) can encode.
  *
  * CodegenFallback by design: the expression only evaluates on TIMESTAMP
  * TIES — with real event-time stamps that is a vanishing fraction of rows,
  * and the store opts in via `StoreConfig.lwwByteTieBreak`. The default
  * string-rendering tie-break stays on the codegen'd path. Per-task state
  * (encoder, converter, schema) is transient-lazy, so executors build it
  * once per task, not per row.
  */
case class AvroBinaryExpr(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType
  override def prettyName: String = "avro_binary"

  @transient private lazy val structType =
    child.dataType.asInstanceOf[StructType]
  @transient private lazy val schema: Schema =
    graft.sources.AvroInput.avroRecord(structType, "graft_tiebreak")
  @transient private lazy val toScala =
    CatalystTypeConverters.createToScalaConverter(structType)
  @transient private lazy val writer =
    new GenericDatumWriter[GenericRecord](schema)
  @transient private lazy val buf = new java.io.ByteArrayOutputStream(64)

  override protected def nullSafeEval(input: Any): Any = {
    val row = toScala(input).asInstanceOf[Row]
    val rec = graft.sources.AvroInput.toAvro(row, schema)
      .asInstanceOf[GenericRecord]
    buf.reset()
    val enc = EncoderFactory.get().directBinaryEncoder(buf, null)
    writer.write(rec, enc)
    enc.flush()
    buf.toByteArray
  }

  override protected def withNewChildInternal(
      newChild: Expression): AvroBinaryExpr = copy(child = newChild)
}

object AvroBinaryExpr {
  /** The serialized-Avro bytes of a struct column (see class doc). */
  def avroBinary(structCol: Column): Column =
    GraftColumnBridge.column(
      AvroBinaryExpr(GraftColumnBridge.expression(structCol)))
}
