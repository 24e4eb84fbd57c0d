package graft.functions

import java.security.MessageDigest
import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Custom expression: k-element MinHash signature over a shingle array —
  * semantically identical to the higher-order-function formulation in
  * [[TextOps.minhashSignature]] (two-hash Kirsch–Mitzenmacher construction:
  * one md5 per shingle, h1/h2 = its 32-bit halves, signature element i =
  * min over shingles of (h1 + i·h2) mod (2³¹−1)), but ONE md5 + one tight
  * loop per shingle instead of k interpreted `transform` lambdas per row.
  *
  * The md5 hex-parse twin: h1 = first 8 hex chars of md5(shingle) parsed as
  * an unsigned 32-bit value = the first 4 digest bytes big-endian; h2 = the
  * next 4 bytes. DuckDB reproduces it as ('0x'||substr(md5(s),1,8))::BIGINT.
  *
  * CodegenFallback: the md5 call dominates, so interpreted eval of this node
  * costs the same as generated code would.
  */
case class MinHashSig(child: Expression, k: Int)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(StringType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_sig needs array<string>, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val shingles = input.asInstanceOf[ArrayData]
    val n = shingles.numElements()
    val mins = Array.fill[Long](k)(Long.MaxValue)
    val md = MessageDigest.getInstance("MD5")
    var seen = false
    var t = 0
    while (t < n) {
      val s = shingles.getUTF8String(t)
      if (s != null) {
        seen = true
        md.reset()
        val d = md.digest(s.getBytes)
        // unsigned big-endian 32-bit halves of the first 8 digest bytes
        val h1 = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
          ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
        val h2 = ((d(4) & 0xffL) << 24) | ((d(5) & 0xffL) << 16) |
          ((d(6) & 0xffL) << 8) | (d(7) & 0xffL)
        var i = 0
        while (i < k) {
          val g = (h1 + i.toLong * h2) % 2147483647L
          if (g < mins(i)) mins(i) = g
          i += 1
        }
      }
      t += 1
    }
    // empty / all-null shingle set → null signature (mirrors array_min of
    // an empty transform in the HOF formulation)
    if (!seen) null else new GenericArrayData(mins)
  }

  override protected def withNewChildInternal(newChild: Expression): MinHashSig =
    copy(child = newChild)
}

object MinHashExpr {
  def minhashSig(shingles: Column, k: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(MinHashSig(GraftColumnBridge.expression(shingles), k))
  }
}
