package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Custom expression: every per-token counting stat the text-analysis
  * pipeline needs, in ONE pass over the tokens —
  * `{n_tokens, s_de, s_en, s_es, s_fr, s_zh, n_long}` where s_* are the
  * language-marker hit counts ([[TextOps.langMarkers]]) and n_long counts
  * tokens of ≥ 4 characters. Tokenization = lowercase, split on single
  * spaces, drop empties — identical to [[TextOps.tokens]] and the DuckDB
  * twin.
  *
  * Only INTEGER counts are computed here; the language argmax and the
  * floating-point quality formula stay in Catalyst columns downstream, so
  * the oracle-parity-sensitive double math is untouched. Replaces ~11
  * interpreted filter/size lambda chains per row (each of which re-walked
  * the token array).
  */
case class TokenStats(child: Expression)
    extends UnaryExpression with CodegenFallback {

  override def dataType: DataType = StructType(Seq(
    StructField("n_tokens", IntegerType, nullable = false),
    StructField("s_de", IntegerType, nullable = false),
    StructField("s_en", IntegerType, nullable = false),
    StructField("s_es", IntegerType, nullable = false),
    StructField("s_fr", IntegerType, nullable = false),
    StructField("s_zh", IntegerType, nullable = false),
    StructField("n_long", IntegerType, nullable = false)))

  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"token_stats needs a string column, got $other")
    }

  // langMarkers is alphabetical (de,en,es,fr,zh) — mirrored in the struct
  @transient private lazy val markerSets: Array[java.util.HashSet[String]] =
    TokenStats.markerSets

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase
    val parts = text.split(UTF8String.fromString(" "), -1)
    var nTokens = 0
    var nLong = 0
    val scores = new Array[Int](markerSets.length)
    var i = 0
    while (i < parts.length) {
      val tok = parts(i)
      if (tok.numBytes() > 0) {
        nTokens += 1
        if (tok.numChars() >= 4) nLong += 1
        val s = tok.toString
        var l = 0
        while (l < markerSets.length) {
          if (markerSets(l).contains(s)) scores(l) += 1
          l += 1
        }
      }
      i += 1
    }
    InternalRow(nTokens, scores(0), scores(1), scores(2), scores(3),
      scores(4), nLong)
  }

  override protected def withNewChildInternal(newChild: Expression): TokenStats =
    copy(child = newChild)
}

object TokenStats {
  /** Built once per JVM: marker word → hash set, in [[TextOps.langMarkers]]
    * (alphabetical) order. */
  lazy val markerSets: Array[java.util.HashSet[String]] =
    TextOps.langMarkers.map { case (_, words) =>
      val s = new java.util.HashSet[String]()
      words.foreach(s.add)
      s
    }.toArray
}

object TokenStatsExpr {
  def tokenStats(text: Column): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(TokenStats(GraftColumnBridge.expression(text)))
  }
}
