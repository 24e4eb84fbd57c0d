package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Venice read-compute vector operators, re-expressed as Catalyst column
  * expressions (whole-stage-codegen'd higher-order functions — no UDFs).
  *
  * Reference semantics (NOT code) from linkedin/venice:
  *  - dotProduct: internal/venice-client-common/.../compute/DotProductOperator.java:13-51
  *    Σᵢ vᵢ·pᵢ; null/empty field → null result; size mismatch → 0.0 plus an
  *    entry in the per-row computation-error map.
  *  - cosineSimilarity: CosineSimilarityOperator.java:16-73 — dot(v,p) /
  *    sqrt(‖v‖²·‖p‖²); the param norm is a constant folded by Catalyst here.
  *  - hadamardProduct: HadamardProductOperator.java:13-47 — element-wise
  *    product; mismatch → null + error entry.
  *  - count: CountOperator.java:14-40 — collection size, error default −1.
  *
  * Math is done in Double (Venice accumulates float dot-products in float;
  * we document this as a precision upgrade, not a semantic change).
  */
object VectorOps {

  /** Σᵢ vᵢ·pᵢ as a left-to-right fold in double precision (deterministic,
    * matches a sequential `list_sum` oracle). Routed through the codegen'd
    * [[VecDot]] expression — identical fold order, ~10× the throughput of
    * the aggregate(zip_with(...)) formulation. */
  private def dotRaw(v: Column, p: Column): Column =
    VecDotExpr.vecDot(v, p)

  private def asDouble(v: Column): Column = v.cast("array<double>")

  /** Venice dotProduct(field, param): null/empty → null, size mismatch → 0.0. */
  def dotProduct(field: Column, param: Seq[Double]): Column = {
    val p = typedLit(param)
    val v = asDouble(field)
    when(field.isNull || size(field) === 0, lit(null).cast("double"))
      .when(size(field) =!= param.length, lit(0.0))
      .otherwise(dotRaw(v, p))
  }

  /** Venice cosineSimilarity(field, param): dot / sqrt(‖v‖²·‖p‖²). */
  def cosineSimilarity(field: Column, param: Seq[Double]): Column = {
    val v = asDouble(field)
    val paramNormSq = param.map(x => x * x).sum // constant, like Venice's cached norm
    val vNormSq = dotRaw(v, v)
    when(field.isNull || size(field) === 0, lit(null).cast("double"))
      .when(size(field) =!= param.length, lit(0.0))
      .otherwise(dotRaw(v, typedLit(param)) / sqrt(vNormSq * lit(paramNormSq)))
  }

  /** Cosine similarity between two vector columns (used by dedup/ANN). */
  def cosineCols(a: Column, b: Column): Column = {
    val (va, vb) = (asDouble(a), asDouble(b))
    dotRaw(va, vb) / sqrt(dotRaw(va, va) * dotRaw(vb, vb))
  }

  /** Venice hadamardProduct(field, param): element-wise; mismatch → null. */
  def hadamardProduct(field: Column, param: Seq[Double]): Column = {
    val p = typedLit(param)
    when(field.isNull || size(field) === 0, lit(null).cast("array<double>"))
      .when(size(field) =!= param.length, lit(null).cast("array<double>"))
      .otherwise(zip_with(asDouble(field), p, (x, y) => x * y))
  }

  /** Venice count(field): collection size; null → −1 (Venice's error default,
    * CountOperator.java:35). */
  def countElements(field: Column): Column =
    coalesce(size(field), lit(-1))

  /** Venice `__veniceComputationError__` map column: one entry per op whose
    * input failed validation (size mismatch), mirroring
    * ComputeUtils.computeResult's error accumulation. */
  def computationErrors(ops: Seq[(String, Column, Int)]): Column = {
    require(ops.nonEmpty, "computationErrors needs at least one op")
    val entries = ops.map { case (name, field, expectedLen) =>
      when(field.isNotNull && size(field) =!= expectedLen,
        struct(
          lit(name).as("key"),
          concat(lit("array length "), size(field).cast("string"),
            lit(" does not match param length "),
            lit(expectedLen.toString)).as("value")))
    }
    map_from_entries(filter(array(entries: _*), e => e.isNotNull))
  }

  /** L2 norm of a vector column. */
  def l2Norm(v: Column): Column = sqrt(dotRaw(asDouble(v), asDouble(v)))
}
