package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom expression: the distinct word-n-gram shingle set of a document in
  * ONE pass — semantically identical to the column composition
  * `array_distinct(transform(sequence, i => concat_ws("", slice(tokens, i, n))))`
  * over `tokens = filter(split(lower(text), " "), _ =!= "")`, but without the
  * per-token/per-shingle interpreted lambda dispatch and the three
  * intermediate arrays (the shingle stage showed up as ~2 s of each dedup
  * query at sf0.1). Tokenization rule matches the DuckDB oracle twin:
  * lowercase, split on single spaces, drop empty tokens.
  *
  * Output order = first occurrence (array_distinct semantics), so the
  * downstream md5/minhash math sees byte-identical inputs.
  *
  * CodegenFallback: string splitting/allocation dominates; generated code
  * would not beat the tight loop here.
  */
case class ShingleSet(child: Expression, n: Int)
    extends UnaryExpression with CodegenFallback {

  require(n >= 1, "shingle width must be >= 1")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"shingle_set needs a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    // same lowercase as Spark's lower(): UTF8String.toLowerCase
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    // literal-space split with trailing fields kept, exactly like
    // split(lower(text), " ") (a single-space regex), then drop empties
    val raw = text.split(" ", -1)
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) toks.add(raw(i)); i += 1
    }
    val m = toks.size - (n - 1)
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val seen = new java.util.LinkedHashSet[String](m * 2)
    i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < n) { sb.append(toks.get(i + j)); j += 1 }
      seen.add(sb.toString)
      i += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    i = 0
    while (it.hasNext) { out(i) = UTF8String.fromString(it.next()); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): ShingleSet =
    copy(child = newChild)
}

object ShingleExpr {
  def shingleSet(text: Column, n: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(ShingleSet(GraftColumnBridge.expression(text), n))
  }
}
