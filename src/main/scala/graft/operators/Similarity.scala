package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.{VecDotExpr, VectorOps}

/** Approximate-nearest-neighbor search over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once, rank per query — exact, scales linearly in corpus size).
  * Scale path: random-hyperplane LSH — md5-seeded ±1 hyperplanes give every
  * vector a small bucket code; candidates come from an equi-join on the
  * code, cutting the scanned fraction to ~1/2^bits per probe.
  *
  * Norms are computed once per vector BEFORE pairing (a norm recomputed per
  * pair turns 1 dot/pair into 3 — at 10⁹ pairs that's the whole budget), and
  * all dot products run through the codegen'd [[graft.functions.VecDot]]
  * expression. Pair similarity = dot / (normA · normB); the oracles use the
  * same association.
  */
object Similarity {

  private def vecDot(a: Column, b: Column) = VecDotExpr.vecDot(a, b)
  private def norm(v: Column) = sqrt(vecDot(v, v))

  /** Exact cosine top-k per query vector.
    * queries: (qid, qvec); corpus: (id, vec). Ranking uses the rounded
    * similarity + id so ties are deterministic across engines. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      excludeSelf: Boolean = true): DataFrame = {
    val c = corpus.withColumn("__n", norm(col("vec")))
    val q = queries.withColumn("__qn", norm(col("qvec")))
    val joined = c.crossJoin(broadcast(q))
      .withColumn("sim",
        round(vecDot(col("vec"), col("qvec")) / (col("__n") * col("__qn")), 6)
          + lit(0.0))
    val base = if (excludeSelf) joined.filter(col("id") =!= col("qid")) else joined
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    base.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** md5-seeded ±1 hyperplane: component d of plane j is +1 when the md5
    * nibble of "j|d" is ≥ 8. Deterministic, engine-independent. */
  private def planeSign(j: Int, d: Column): Column =
    when(instr(lit("89abcdef"),
      substring(md5(concat(lit(s"$j|"), d.cast("string"))), lit(1), lit(1))) > 0,
      lit(1.0)).otherwise(lit(-1.0))

  /** LSH bucket code from `bits` hyperplanes: bit j = sign(dot(v, h_j)). */
  def lshCode(vec: Column, bits: Int): Column = {
    val dots = (0 until bits).map { j =>
      // dot(v, h_j) as a fold over (value, index) pairs
      aggregate(
        zip_with(vec.cast("array<double>"),
          sequence(lit(0), size(vec) - 1),
          (x, d) => x * planeSign(j, d)),
        lit(0.0), (acc, x) => acc + x)
    }
    dots.zipWithIndex.map { case (dp, j) =>
      when(dp > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Bucketed ANN: candidates share the query's LSH code, then exact cosine
    * top-k within the bucket. Trades recall for a ~2^bits scan reduction. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int): DataFrame = {
    val codedCorpus = corpus
      .withColumn("code", lshCode(col("vec"), bits))
      .withColumn("__n", norm(col("vec")))
    val codedQueries = queries
      .withColumn("qcode", lshCode(col("qvec"), bits))
      .withColumn("__qn", norm(col("qvec")))
    val joined = codedCorpus
      .join(broadcast(codedQueries), col("code") === col("qcode"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim",
        round(vecDot(col("vec"), col("qvec")) / (col("__n") * col("__qn")), 6)
          + lit(0.0))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    joined.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** IVF (inverted-file) ANN: a coarse quantizer assigns every vector to
    * its nearest centroid cell; queries probe the nProbe nearest cells and
    * rank exactly within them. Scan fraction ≈ nProbe/K. Centroids here are
    * a deterministic corpus sample (ids < K) — a k-means step would slot in
    * without changing the plan shape (assign = crossJoin small broadcast
    * centroid set, search = equi-join on cell id). */
  def ivfAssign(corpus: DataFrame, centroids: DataFrame): DataFrame = {
    val cent = centroids.select(col("id").as("cid"), col("vec").as("cvec"))
      .withColumn("__cn", norm(col("cvec")))
    val w = Window.partitionBy(col("id")).orderBy(col("sim").desc, col("cid"))
    corpus.withColumn("__n", norm(col("vec")))
      .crossJoin(broadcast(cent))
      .withColumn("sim",
        round(vecDot(col("vec"), col("cvec")) / (col("__n") * col("__cn")), 6)
          + lit(0.0))
      .withColumn("rn", row_number().over(w))
  }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, numCells: Int,
      nProbe: Int): DataFrame = {
    val centroids = corpus.filter(col("id") < numCells)
    val assigned = ivfAssign(corpus, centroids)
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("__n"), col("cid"))
      .persist()
    val probes = ivfAssign(
      queries.select(col("qid").as("id"), col("qvec").as("vec")), centroids)
      .filter(col("rn") <= nProbe)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("__n").as("__qn"), col("cid"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    assigned
      .join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("sim",
        round(vecDot(col("vec"), col("qvec")) / (col("__n") * col("__qn")), 6)
          + lit(0.0))
      .select(col("qid"), col("id"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup). Exact version
    * is a self-join with per-row precomputed norms; at scale, pre-bucket by
    * [[lshCode]] to keep the pair space near-linear. */
  def cosinePairs(corpus: DataFrame, threshold: Double): DataFrame = {
    val withNorm = corpus.withColumn("__n", norm(col("vec")))
    val a = withNorm.select(col("id").as("id_a"), col("vec").as("vec_a"),
      col("__n").as("n_a"))
    val b = withNorm.select(col("id").as("id_b"), col("vec").as("vec_b"),
      col("__n").as("n_b"))
    a.crossJoin(b).filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(vecDot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 6)
          + lit(0.0))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }
}
