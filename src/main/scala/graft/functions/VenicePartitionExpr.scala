package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._

/** Byte-exact twin of the reference's default partitioner
  * (DefaultVenicePartitioner.java:55-77): MD5 of the key BYTES, then a
  * base-256 Horner modulus over the full 16-byte digest —
  * `m := (m·256 + byteᵢ) % N` — i.e. the digest read as an unsigned 128-bit
  * integer, mod N. Operating on the serialized key bytes (not a string
  * rendering) is what makes repush output partition-identical to a Venice
  * deployment's topic partitions.
  *
  * Pair with [[AvroKeyBytes]] to reproduce Venice's exact input: the Avro
  * binary encoding of the key record/primitive.
  */
case class VenicePartition(child: Expression, numPartitions: Int)
    extends UnaryExpression with CodegenFallback {

  require(numPartitions > 0, "numPartitions must be positive")

  override def dataType: DataType = IntegerType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"venice_partition needs key bytes (binary), got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(input.asInstanceOf[Array[Byte]])
    var m = 0
    var i = 0
    while (i < digest.length) {
      m = (m * 256 + (digest(i) & 0xff)) % numPartitions
      i += 1
    }
    math.abs(m % numPartitions)
  }

  override protected def withNewChildInternal(newChild: Expression): VenicePartition =
    copy(child = newChild)
}

/** Avro binary encoding of a single-field key — the bytes Venice hashes.
  * Covers the common key schemas (string / int / long / bytes):
  *  - string & bytes: zig-zag varint length prefix + raw bytes
  *  - int & long: zig-zag varint
  * (Avro spec "Binary encoding"; parity with GenericDatumWriter is pinned
  * in SchemaSpec against the avro library itself.) */
case class AvroKeyBytes(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = BinaryType

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType | IntegerType | LongType | BinaryType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"avro_key_bytes supports string/int/long/binary keys, got $other")
    }

  private def zigZag(n: Long): Array[Byte] = {
    var v = (n << 1) ^ (n >> 63)
    val out = new Array[Byte](10)
    var i = 0
    while ((v & ~0x7fL) != 0) {
      out(i) = (((v & 0x7f) | 0x80).toByte); v >>>= 7; i += 1
    }
    out(i) = v.toByte
    java.util.Arrays.copyOf(out, i + 1)
  }

  override def nullSafeEval(input: Any): Any = child.dataType match {
    case IntegerType => zigZag(input.asInstanceOf[Int].toLong)
    case LongType => zigZag(input.asInstanceOf[Long])
    case StringType =>
      val bytes = input.asInstanceOf[org.apache.spark.unsafe.types.UTF8String].getBytes
      zigZag(bytes.length.toLong) ++ bytes
    case BinaryType =>
      val bytes = input.asInstanceOf[Array[Byte]]
      zigZag(bytes.length.toLong) ++ bytes
    case other => throw new IllegalStateException(s"unreachable: $other")
  }

  override protected def withNewChildInternal(newChild: Expression): AvroKeyBytes =
    copy(child = newChild)
}

object VenicePartitionExpr {
  import org.apache.spark.sql.GraftColumnBridge

  /** Partition id from raw key bytes (reference Horner-mod over MD5). */
  def venicePartitionId(keyBytes: Column, numPartitions: Int): Column =
    GraftColumnBridge.column(VenicePartition(
      GraftColumnBridge.expression(keyBytes), numPartitions))

  /** Avro binary encoding of a primitive key column. */
  def avroKeyBytes(key: Column): Column =
    GraftColumnBridge.column(AvroKeyBytes(GraftColumnBridge.expression(key)))

  /** The full reference pipeline: avro-encode the key, MD5+Horner-mod. */
  def venicePartitionIdAvro(key: Column, numPartitions: Int): Column =
    venicePartitionId(avroKeyBytes(key), numPartitions)
}
