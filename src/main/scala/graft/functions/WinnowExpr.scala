package graft.functions

import java.security.MessageDigest

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.CodegenFallback
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing fingerprint sketch of a document in ONE pass: tokenize, hash
  * every POSITIONAL k-gram (order kept, duplicates kept — unlike the
  * Jaccard shingle SET), slide a window of `w` consecutive hashes keeping
  * each window's minimum, return the distinct minima sorted ascending.
  *
  * Winnowing guarantee: any shared run of w+k-1 tokens between two docs
  * yields ≥ 1 common fingerprint, so fingerprint intersection detects
  * verbatim passage reuse that whole-document Jaccard dilutes.
  *
  * Semantics twin (what the DuckDB oracle replays):
  * tokens = list_filter(string_split(lower(text), ' '), x -> x <> '');
  * gram_i = t[i] || ' ' || … || t[i+k-1];
  * hash   = ('0x' || substr(md5(gram), 1, 8))::BIGINT  (unsigned 32-bit);
  * wins   = m ≥ w ? [min(hs[i..i+w-1]) for i in 0..m-w] : [min(hs)];
  * fps    = list_sort(list_distinct(wins)); fewer than k tokens → [].
  *
  * A column-function formulation exists but re-inlines the tokenization
  * into every `transform` lambda element (Catalyst collapses the shared
  * projection), going quadratic in document length — this expression is
  * the reason text_winnow survives long documents.
  *
  * CodegenFallback: one md5 per gram dominates; generated code would not
  * beat the tight loop.
  */
case class WinnowFingerprints(child: Expression, k: Int, w: Int)
    extends UnaryExpression with CodegenFallback {

  require(k >= 1 && w >= 1, "k-gram width and window size must be >= 1")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case StringType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"winnow_fingerprints needs a string column, got $other")
    }

  override def nullSafeEval(input: Any): Any = {
    val text = input.asInstanceOf[UTF8String].toLowerCase.toString
    val raw = text.split(" ", -1)
    val toks = new java.util.ArrayList[String](raw.length)
    var i = 0
    while (i < raw.length) {
      if (raw(i).nonEmpty) toks.add(raw(i)); i += 1
    }
    val m = toks.size - (k - 1) // number of positional k-grams
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    val md = MessageDigest.getInstance("MD5")
    val hs = new Array[Long](m)
    i = 0
    while (i < m) {
      val sb = new java.lang.StringBuilder()
      var j = 0
      while (j < k) {
        if (j > 0) sb.append(' ')
        sb.append(toks.get(i + j)); j += 1
      }
      md.reset()
      val d = md.digest(sb.toString.getBytes("UTF-8"))
      // unsigned big-endian 32-bit prefix = ('0x'||substr(md5,1,8))::BIGINT
      hs(i) = ((d(0) & 0xffL) << 24) | ((d(1) & 0xffL) << 16) |
        ((d(2) & 0xffL) << 8) | (d(3) & 0xffL)
      i += 1
    }
    val selected = new java.util.TreeSet[java.lang.Long]()
    if (m < w) {
      var mn = Long.MaxValue
      i = 0
      while (i < m) { if (hs(i) < mn) mn = hs(i); i += 1 }
      selected.add(mn)
    } else {
      i = 0
      while (i <= m - w) {
        var mn = Long.MaxValue
        var j = 0
        while (j < w) { if (hs(i + j) < mn) mn = hs(i + j); j += 1 }
        selected.add(mn)
        i += 1
      }
    }
    val out = new Array[Any](selected.size)
    val it = selected.iterator()
    i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  override protected def withNewChildInternal(newChild: Expression): WinnowFingerprints =
    copy(child = newChild)
}

object WinnowExpr {
  def winnow(text: Column, k: Int, w: Int): Column = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.column(WinnowFingerprints(
      GraftColumnBridge.expression(text), k, w))
  }
}
