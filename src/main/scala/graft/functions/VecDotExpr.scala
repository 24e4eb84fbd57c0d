package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Custom Catalyst expression: Σᵢ aᵢ·bᵢ over two numeric arrays, accumulated
  * left-to-right in double (same fold order as `aggregate(zip_with(...))`
  * and DuckDB's list_dot_product, so oracle parity is preserved bit-for-bit).
  *
  * Exists because the higher-order-function formulation pays per-element
  * lambda dispatch + boxing; this is a tight primitive loop with codegen
  * (the hot path of R4/R5, ANN, and embedding dedup — SURVEY §4 "custom
  * needed (a)").
  */
case class VecDot(left: Expression, right: Expression,
    floatAccum: Boolean = false)
    extends BinaryExpression {

  override def dataType: DataType = if (floatAccum) FloatType else DoubleType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    (left.dataType, right.dataType) match {
      case (ArrayType(FloatType | DoubleType, _), ArrayType(FloatType | DoubleType, _)) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case _ =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"vec_dot needs float/double arrays, got ${left.dataType} / ${right.dataType}")
    }
  }

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(a: Any, b: Any): Any = {
    val (aa, ba) = (a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    // length mismatch → null, matching the aggregate(zip_with(...)) HOF
    // (zip_with pads with nulls, so the fold nulls out) and the SQL oracle —
    // silently truncating to min(len) would let unguarded callers return a
    // value where the oracle returns null
    if (aa.numElements() != ba.numElements()) return null
    val n = aa.numElements()
    var i = 0
    if (floatAccum) {
      // Venice-exact mode: float multiply + float accumulate, the
      // reference kernel's arithmetic (DotProductOperator semantics)
      var acc = 0.0f
      while (i < n) {
        val x = if (isFloat(left)) aa.getFloat(i) else aa.getDouble(i).toFloat
        val y = if (isFloat(right)) ba.getFloat(i) else ba.getDouble(i).toFloat
        acc += x * y; i += 1
      }
      acc
    } else {
      var acc = 0.0
      if (isFloat(left) && isFloat(right)) {
        while (i < n) {
          acc += aa.getFloat(i).toDouble * ba.getFloat(i).toDouble; i += 1
        }
      } else if (isFloat(left)) {
        while (i < n) { acc += aa.getFloat(i).toDouble * ba.getDouble(i); i += 1 }
      } else if (isFloat(right)) {
        while (i < n) { acc += aa.getDouble(i) * ba.getFloat(i).toDouble; i += 1 }
      } else {
        while (i < n) { acc += aa.getDouble(i) * ba.getDouble(i); i += 1 }
      }
      acc
    }
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val getA = if (isFloat(left)) "getFloat" else "getDouble"
    val getB = if (isFloat(right)) "getFloat" else "getDouble"
    val (accTy, cast) = if (floatAccum) ("float", "(float)") else ("double", "(double)")
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
         |if ($a.numElements() != $b.numElements()) {
         |  ${ev.isNull} = true;
         |} else {
         |  int $n = $a.numElements();
         |  $accTy $acc = 0;
         |  for (int $i = 0; $i < $n; $i++) {
         |    $acc += ($cast $a.$getA($i)) * ($cast $b.$getB($i));
         |  }
         |  ${ev.value} = $acc;
         |}
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): VecDot =
    copy(left = newLeft, right = newRight)
}

object VecDotExpr {
  /** Column wrapper for [[VecDot]] (double accumulation — oracle-exact). */
  def vecDot(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b)))
  }

  /** Venice-exact float accumulation (the reference kernel's arithmetic);
    * use when byte-parity with a Venice serving deployment matters more
    * than precision. */
  def vecDotFloat(a: Column, b: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(VecDot(
      GraftColumnBridge.expression(a), GraftColumnBridge.expression(b),
      floatAccum = true))
  }
}
