package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge.{column, eagerExpression}
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.functions._

/** SQL-callable registrations of the compute DSL — the pure-SQL face of
  * the read-compute surface (reference: the thin client's ComputeRequest
  * operators, clients/venice-thin-client/.../ComputeRequestBuilder.java —
  * semantics, NOT code), so a session with `GraftExtensions` installed can
  * write `SELECT graft_cosine(a.vec, b.vec) FROM ...` with no graft
  * imports at all. Combined with the `format("graft")` DSv2 relation this
  * makes plain `spark.sql` a complete client: read a store, compute over
  * it, never touch the library API.
  *
  * Every function delegates to the same Column builders the programmatic
  * API uses ([[VectorOps]], [[VecDotExpr]], [[SimHashExpr]]), so SQL and
  * DataFrame callers hit identical codegen'd expressions — one semantics,
  * two spellings. */
object SqlFunctions {

  private def asDouble(v: Column): Column = v.cast("array<double>")

  private def fn(name: String, arity: Int, usage: String)(
      build: Seq[Column] => Column)
      : (FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression) = {
    val builder = (args: Seq[Expression]) => {
      require(args.length == arity,
        s"$name expects $arity argument(s), got ${args.length}")
      // eager: the analyzer may read this expression's dataType in the
      // same rule batch (e.g. under `f(x)[0]`), before a lazy
      // ColumnNodeExpression would have been converted
      eagerExpression(build(args.map(column)))
    }
    (FunctionIdentifier(name),
      new ExpressionInfo("graft.functions.SqlFunctions", name, usage),
      builder)
  }

  /** All graft SQL functions, in injection order. */
  val all: Seq[(FunctionIdentifier, ExpressionInfo, Seq[Expression] => Expression)] = Seq(
    fn("graft_dot", 2,
      "graft_dot(a, b) - dot product of two float/double arrays; " +
        "length mismatch yields NULL") { case Seq(a, b) =>
      VecDotExpr.vecDot(asDouble(a), asDouble(b))
    },
    fn("graft_dot_float", 2,
      "graft_dot_float(a, b) - dot product with float accumulation " +
        "(the reference kernel's arithmetic)") { case Seq(a, b) =>
      VecDotExpr.vecDotFloat(a, b)
    },
    fn("graft_cosine", 2,
      "graft_cosine(a, b) - cosine similarity of two vector columns") {
      case Seq(a, b) => VectorOps.cosineCols(a, b)
    },
    fn("graft_hadamard", 2,
      "graft_hadamard(a, b) - element-wise product; length mismatch " +
        "yields NULL (Venice hadamardProduct semantics)") { case Seq(a, b) =>
      when(a.isNull || b.isNull || size(a) =!= size(b),
        lit(null).cast("array<double>"))
        .otherwise(zip_with(asDouble(a), asDouble(b), (x, y) => x * y))
    },
    fn("graft_count", 1,
      "graft_count(x) - collection size; NULL yields -1 " +
        "(Venice count operator's error default)") { case Seq(a) =>
      VectorOps.countElements(a)
    },
    fn("graft_l2norm", 1,
      "graft_l2norm(v) - L2 norm of a vector column") { case Seq(a) =>
      VectorOps.l2Norm(a)
    },
    fn("graft_simhash64", 1,
      "graft_simhash64(tokens) - 64-bit Charikar SimHash of a token array") {
      case Seq(a) => SimHashExpr.simhash64(a)
    },
    fn("graft_bucket", 2,
      "graft_bucket(key, n) - the engine's md5-mod bucket id for a key " +
        "(the store-layout partitioner; n must be a literal)") {
      case Seq(a, n) => HashOps.partitionId(a, litInt(n, "graft_bucket"))
    },
    fn("graft_partition", 2,
      "graft_partition(key, n) - byte-exact reference partition id " +
        "(avro-encoded key, MD5 Horner-mod; n must be a literal)") {
      case Seq(a, n) =>
        VenicePartitionExpr.venicePartitionIdAvro(a,
          litInt(n, "graft_partition"))
    },
    fn("graft_sq8", 1,
      "graft_sq8(v) - rank-comparable SQ8 codes of a vector column: the " +
        "unit vector scaled by 127, floor(+0.5)-rounded (integer-valued " +
        "doubles; graft_dot of two code vectors is the exact integer " +
        "ADC score)") { case Seq(a) =>
      graft.operators.Similarity.sq8UnitCodes(asDouble(a))
    },
    fn("graft_shingles", 2,
      "graft_shingles(text, n) - distinct n-token shingles of a text " +
        "column (n must be a literal)") { case Seq(a, n) =>
      ShingleExpr.shingleSet(a, litInt(n, "graft_shingles"))
    },
    fn("graft_minhash", 2,
      "graft_minhash(shingles, k) - k-element MinHash signature of a " +
        "shingle set (k must be a literal)") { case Seq(a, k) =>
      MinHashExpr.minhashSig(a, litInt(k, "graft_minhash"))
    })

  /** Foldable-integer argument of a SQL function (sizes the expression at
    * plan time — k hash lanes, bucket modulus — so it must be a literal). */
  private def litInt(c: Column, fname: String): Int = {
    import org.apache.spark.sql.GraftColumnBridge
    GraftColumnBridge.eagerExpression(c) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int,
          org.apache.spark.sql.types.IntegerType) => v
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Long,
          org.apache.spark.sql.types.LongType) => v.toInt
      case other => throw new IllegalArgumentException(
        s"$fname expects a literal integer, got $other")
    }
  }
}
