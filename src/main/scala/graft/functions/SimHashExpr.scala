package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom expression: 16-bit SimHash over a token array — semantically
  * identical to the higher-order-function formulation in
  * [[TextOps.simhash16]] (bit i set when Σ over tokens of ±1 votes from
  * md5 nibble i is > 0), but one tight per-row loop instead of 16 × |tokens|
  * interpreted lambda dispatches. CodegenFallback: the md5 call dominates,
  * so interpreted eval of this node costs the same as generated code would.
  */
case class SimHash16(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = IntegerType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash16 needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](16)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      val tok = toks.getUTF8String(t)
      if (tok != null) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        var i = 0
        while (i < 8) {
          val b = digest(i) & 0xff
          // hex char 2i   = high nibble, 2i+1 = low nibble;
          // nibble ≥ 8 ⇔ hex char in "89abcdef"
          votes(2 * i) += (if ((b >> 4) >= 8) 1 else -1)
          votes(2 * i + 1) += (if ((b & 0xf) >= 8) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var out = 0
    var i = 0
    while (i < 16) {
      if (votes(i) > 0) out |= 1 << (15 - i)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash16 =
    copy(child = newChild)
}

/** 64-bit SimHash over a token array — the standard Charikar/Manku shape
  * (bit i of the signature = sign of the Σ over tokens of ±1 votes from
  * bit i of md5(token)'s first 8 bytes). 64 bits is the scale-correct
  * width: banded into 4×16-bit bands it gives 65536 values per band, so
  * candidate pairs grow Θ(n²/65536) per band instead of the 16-bit
  * scheme's Θ(n²/256) — see [[graft.operators.Dedup.simhashPairs64]].
  * Same per-row tight loop as [[SimHash16]]; md5 dominates, so
  * CodegenFallback costs nothing measurable. */
case class SimHash64(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"simhash64 needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val toks = input.asInstanceOf[ArrayData]
    val votes = new Array[Int](64)
    val md = MessageDigest.getInstance("MD5")
    var t = 0
    val n = toks.numElements()
    while (t < n) {
      val tok = toks.getUTF8String(t)
      if (tok != null) {
        md.reset()
        val digest = md.digest(tok.getBytes)
        // bit i (0-based, MSB-first) = bit (7 - i%8) of byte i/8 —
        // equivalently bit (3 - i%4) of hex nibble i/4, the form the
        // DuckDB oracle replays from the md5 hex string
        var i = 0
        while (i < 64) {
          val b = digest(i >> 3) & 0xff
          votes(i) += (if (((b >> (7 - (i & 7))) & 1) == 1) 1 else -1)
          i += 1
        }
      }
      t += 1
    }
    var out = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) out |= 1L << (63 - i)
      i += 1
    }
    out
  }

  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

object SimHashExpr {
  def simhash16(tokens: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHash16(GraftColumnBridge.expression(tokens)))
  }

  def simhash64(tokens: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(SimHash64(GraftColumnBridge.expression(tokens)))
  }
}
