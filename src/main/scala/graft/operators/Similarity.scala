package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.VecDotExpr

/** Approximate-nearest-neighbor search and near-duplicate pair detection
  * over an embedding column.
  *
  * Baseline: brute-force cosine top-k (broadcast the query set, scan the
  * corpus once, rank per query — exact, scales linearly in corpus size).
  * Scale paths: random-hyperplane LSH (bucketed candidates) and IVF
  * (coarse-quantizer cells).
  *
  * Norms are computed once per vector BEFORE pairing (a norm recomputed per
  * pair turns 1 dot/pair into 3 — at 10⁹ pairs that's the whole budget), and
  * all dot products run through the codegen'd [[graft.functions.VecDot]]
  * expression. Pair similarity = dot / (normA · normB); the oracles use the
  * same association.
  */
object Similarity {

  /** Max codebook rows the Lloyd loop may collect to the driver per
    * iteration (~0.5 GB at 64-dim double vectors — well inside the 12 GB
    * driver). Corpus-driven K crosses it at ≈ 2×10⁹ training vectors with
    * the default targetCellRows=2000. */
  val KmeansCodebookBudget: Int = 1 << 20

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

  /** Contrastive hard-negative mining: for each query vector, the top-`k`
    * most-similar corpus vectors carrying a DIFFERENT label — the pairs an
    * embedding-model trainer wants as in-batch negatives (similar enough
    * to be hard, labeled differently so they are true negatives).
    * corpus: (id, vec, label); queries: (qid, qvec, qlabel).
    *
    * Same scale shape as [[bruteForceTopK]] (queries broadcast, corpus
    * scanned once, per-query rank) with the label disagreement applied
    * BEFORE ranking. At corpus sizes where brute force is off the table,
    * feed [[ivfTopK]] candidates through the same label filter instead —
    * this is the exactness baseline. */
  def hardNegatives(corpus: DataFrame, queries: DataFrame,
      k: Int): DataFrame = {
    val c = corpus.withColumn("__n", norm(col("vec")))
    val q = queries.withColumn("__qn", norm(col("qvec")))
    c.crossJoin(broadcast(q))
      .filter(col("label") =!= col("qlabel"))
      .withColumn("sim",
        round(vecDot(col("vec"), col("qvec")) / (col("__n") * col("__qn")), 6)
          + lit(0.0))
      .withColumn("rank", row_number().over(
        Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))))
      .filter(col("rank") <= k)
      .select(col("qid"), col("qlabel"), col("rank"), col("id"),
        col("label"), col("sim"))
  }

  /** md5-seeded ±1 hyperplane component: +1 when the first hex nibble of
    * md5("j|d") is ≥ 8. Deterministic, engine-independent; evaluated ONCE
    * driver-side into a literal plane vector — the previous formulation
    * re-hashed per (row × bit × element). */
  private def planeSignVal(j: Int, d: Int): Double = {
    val digest = MessageDigest.getInstance("MD5")
      .digest(s"$j|$d".getBytes("UTF-8"))
    if (((digest(0) >> 4) & 0xf) >= 8) 1.0 else -1.0
  }

  private def plane(j: Int, dim: Int): Seq[Double] =
    (0 until dim).map(d => planeSignVal(j, d))

  /** LSH bucket code from `bits` hyperplanes: bit j = sign(dot(v, h_j)).
    * Planes are literal ±1 vectors, so each bit is one codegen'd VecDot over
    * the row — identical output to the historical per-element md5 fold. */
  def lshCode(vec: Column, bits: Int, dim: Int, planeOffset: Int = 0): Column = {
    // guard: a dim mismatch would make every dot null (VecDot's
    // length-mismatch semantics), when(null > 0) would zero every bit, and
    // ALL rows would silently collapse into one bucket — turning the
    // near-linear candidate join quadratic. Fail loudly instead.
    val v = when(size(vec) === dim, vec).otherwise(raise_error(concat(
      lit(s"lshCode: expected $dim-dim vectors, got "),
      size(vec).cast("string"))))
    val dots = (0 until bits).map { j =>
      vecDot(v, typedLit(plane(planeOffset + j, dim)))
    }
    dots.zipWithIndex.map { case (dp, j) =>
      when(dp > 0, lit(1 << j)).otherwise(lit(0))
    }.reduce(_ + _)
  }

  /** Bucketed ANN: candidates share the query's LSH code, then exact cosine
    * top-k within the bucket. Trades recall for a ~2^bits scan reduction.
    *
    * `probeRadius = 1` turns on multi-probe: each query also probes every
    * code one bit-flip away (bits+1 probes), the standard fix for the
    * single-probe recall cliff — a near-neighbor differing on ONE
    * hyperplane's side is still found, at (bits+1)/2^bits of the corpus
    * scanned instead of 1/2^bits. Probes stay an equi-join (the probe set
    * is exploded on the broadcast query side, so the corpus is still
    * scanned once with a hash lookup per row). */
  def lshTopK(corpus: DataFrame, queries: DataFrame, k: Int,
      bits: Int, dim: Int, probeRadius: Int = 0): DataFrame = {
    require(probeRadius == 0 || probeRadius == 1,
      "probeRadius 0 (exact code) or 1 (one bit flip) supported")
    val codedCorpus = corpus
      .withColumn("code", lshCode(col("vec"), bits, dim))
      .withColumn("__n", norm(col("vec")))
    val qcode = lshCode(col("qvec"), bits, dim)
    val probes =
      if (probeRadius == 0) array(qcode)
      else array(qcode +: (0 until bits).map(j =>
        qcode.bitwiseXOR(lit(1 << j))): _*)
    val codedQueries = queries
      .withColumn("qcode", explode(probes))
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

  /** Deterministic IVF training: `iters` Lloyd steps from the ids&lt;k seed
    * sample. Assignment = [[ivfAssign]] (broadcast centroids, linear scan);
    * recentring = one groupBy(cell, dimension) — both plain shuffles,
    * linear per iteration. The mean is computed in scaled-integer space
    * (per-dimension sum of round(1000·x) as BIGINT, one division at the
    * end): float partial sums would differ across partition orders and
    * engines, breaking determinism and the SQL oracle; exact integer sums
    * are order-independent. */
  def kmeansCentroids(corpus: DataFrame, k: Int, iters: Int,
      trainFraction: Double = 1.0): DataFrame = {
    require(trainFraction > 0 && trainFraction <= 1,
      s"trainFraction in (0,1], got $trainFraction")
    // SCALE guard on the per-iteration codebook collect: k is corpus-driven
    // for the auto-scaled callers (K = ⌈n / targetCellRows⌉), so "the
    // codebook is driver-sized by design" stops holding silently at extreme
    // corpus sizes. Refuse (typed, machine-checkable) instead of OOMing the
    // driver mid-collect.
    graft.core.Guard.admit(k <= KmeansCodebookBudget,
      s"kmeansCentroids: k=$k exceeds the driver codebook budget of " +
        s"$KmeansCodebookBudget rows — raise targetCellRows (or pass a " +
        "smaller explicit numCells) so the per-iteration codebook collect " +
        "stays driver-sized")
    // At 100 TB, Lloyd iterations over the FULL corpus are waste: centroid
    // positions converge on a sample long before the scan pays off. The
    // sample is a deterministic id-hash slice (reproducible across runs and
    // partitionings, like every sampler here); the seed rows always train
    // so the codebook can never lose a cell to sampling.
    val train = if (trainFraction >= 1.0) corpus
      else corpus.filter(col("id") < k ||
        pmod(xxhash64(col("id")), lit(10000)) <
          math.max(1, (trainFraction * 10000).toInt))
    // LOCALIZE the k-row codebook between iterations: the previous lazy
    // chain made iteration i+1's plan contain iteration i's full-corpus
    // assignment TWICE (recentre + re-seed anti-join both reference it),
    // so a 2-iter Lloyd re-executed the iter-1 scan up to 4× wherever
    // exchange reuse didn't kick in. Collecting k rows per iteration is
    // driver-sized by design (the codebook IS k rows), executes each
    // iteration exactly once, and hands the next assignment a
    // LocalRelation Spark broadcasts for free. Same integer-scaled
    // arithmetic per iteration — result rows are bit-identical.
    val spark = corpus.sparkSession
    def localize(df: DataFrame): DataFrame =
      spark.createDataFrame(
        java.util.Arrays.asList(df.collect(): _*), df.schema)
    val seeds = localize(corpus.filter(col("id") < k)
      .select(col("id"), col("vec")))
    var cent = seeds
    for (_ <- 0 until iters) {
      val recentred = ivfAssign(train, cent).filter(col("rn") === 1)
        .select(col("cid"), posexplode(col("vec")))
        .groupBy(col("cid"), col("pos"))
        .agg(sum(round(col("col").cast("double") * 1000).cast("long")).as("s"),
          count(lit(1)).as("c"))
        .groupBy(col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / (col("c") * lit(1000.0))).as("v"))))
          .as("pv"))
        .select(col("cid").as("id"),
          transform(col("pv"), e => e.getField("v")).as("vec"))
      // a cell that loses every member would vanish from the groupBy and
      // silently shrink the codebook below k; re-seed it with its original
      // seed vector (deterministic) so the quantizer always returns k
      // centroids. A no-op anti-join when every cell kept members, so the
      // common-case result (and the SQL oracle replay) is unchanged.
      cent = localize(recentred.unionByName(
        seeds.join(recentred.select(col("id")), Seq("id"), "left_anti")))
    }
    cent
  }

  /** The IVF coarse codebook as a driver-local relation (numCells rows —
    * driver-sized by design). Materializing it once replaces a persist
    * that a lazy return value could never unpersist (dead cached blocks
    * in a long-lived session) and hands every consumer (corpus assign +
    * query probes) a local relation Spark broadcasts for free. */
  private def cellCentroids(corpus: DataFrame, numCells: Int,
      trainIters: Int, trainFraction: Double): DataFrame =
    if (trainIters <= 0) corpus.filter(col("id") < numCells)
    else {
      val trained = kmeansCentroids(corpus, numCells, trainIters,
        trainFraction)
      corpus.sparkSession.createDataFrame(
        java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    }

  def ivfTopK(corpus: DataFrame, queries: DataFrame, k: Int, numCells: Int,
      nProbe: Int, trainIters: Int = 2,
      trainFraction: Double = 1.0): DataFrame = {
    val centroids = cellCentroids(corpus, numCells, trainIters, trainFraction)
    val assigned = ivfAssign(corpus, centroids)
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("__n"), col("cid"))
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

  /** The IVF index as a pushable store frame: cell id → members, the
    * cell's (id, vec) structs sorted by id. The ANN twin of
    * [[graft.operators.Dedup.lshIndexFrame]]: train the coarse quantizer
    * ONCE ([[kmeansCentroids]] → its own store, the served codebook),
    * push the assigned corpus as cell-keyed posting lists, and every
    * query afterwards probes by bucket-pruned point reads
    * ([[probeIvfIndex]]) instead of re-training + re-assigning the
    * corpus per search (what [[ivfTopK]] does — right for one-shot
    * analytics, waste as a serving path).
    *
    * Scale: one assignment scan (broadcast centroids) + one groupBy on
    * the cell id. Cell member lists carry the vectors, so a cell's value
    * is |corpus|/numCells vectors — size numCells so lists stay within
    * value-size budgets (the reference chunks oversized values; the w9
    * emulation applies) or shard hot cells the maxPostings way. */
  def ivfIndexFrame(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus, centroids).filter(col("rn") === 1)
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("id"), col("vec"))))
        .as("members"))

  /** Incremental IVF index maintenance: assign the DELTA vectors against
    * the SAME served codebook, read only the affected cells' current
    * posting lists (batchGet point reads), union in the new members, and
    * put the rebuilt cells through the RT log — cost O(delta + affected
    * cells), never a corpus re-assignment. The read-modify-write is sound
    * because cell membership is append-only under a FIXED codebook (a
    * vector's nearest centroid never changes until re-training, which is
    * a new codebook version + full repush by design).
    *
    * Pinned by the PipelineSpec differential: probe(after upsert) ≡
    * probe(store rebuilt from the full corpus with the same codebook). */
  def ivfIndexUpsert(engine: graft.core.GraftEngine, store: String,
      centroidStore: String, delta: DataFrame, tsMs: Long): Unit = {
    val cents = engine.servingView(centroidStore)
      .select(col("cid").as("id"), col("cvec").as("vec"))
    val assigned = ivfAssign(delta, cents).filter(col("rn") === 1)
      .select(col("cid"), col("id"), col("vec"))
    val fresh = assigned.groupBy(col("cid"))
      .agg(collect_list(struct(col("id"), col("vec"))).as("new_members"))
      .persist()
    val existing = engine.batchGet(store,
      fresh.select(col("cid")).distinct())
    val rebuilt = fresh.join(existing, Seq("cid"), "left")
      .select(col("cid"), array_sort(concat(
        coalesce(col("members"),
          array().cast(existing.schema("members").dataType)),
        col("new_members"))).as("members"))
    engine.put(store, rebuilt, tsMs)
    fresh.unpersist()
  }

  /** Probe a store-backed IVF index: queries are assigned to their
    * `nProbe` nearest cells AGAINST THE SERVED CODEBOOK (the centroid
    * store — numCells rows, one tiny scan), the probed cells are fetched
    * by batchGet point reads (bucket-set-pruned — the corpus index is
    * never scanned), and exact cosine ranks the members. Result ≡
    * [[ivfTopK]] with the same train/probe parameters — pinned by the
    * `ann_index_probe` oracle reusing `ann_ivf`'s SQL verbatim.
    *
    * Index maintenance: new vectors are assigned against the same served
    * codebook and folded in by incremental push / repush of their cells
    * (posting-list values are rebuilt per affected cell — element-level
    * CRDT adds fit scalar sets, not struct lists); periodic re-training
    * is a new codebook version + full repush, the standard IVF refresh. */
  def probeIvfIndex(engine: graft.core.GraftEngine, store: String,
      centroidStore: String, queries: DataFrame, k: Int,
      nProbe: Int): DataFrame = {
    val cents = engine.servingView(centroidStore)
      .select(col("cid").as("id"), col("cvec").as("vec"))
    val probes = ivfAssign(
        queries.select(col("qid").as("id"), col("qvec").as("vec")), cents)
      .filter(col("rn") <= nProbe)
      .select(col("id").as("qid"), col("vec").as("qvec"),
        col("__n").as("__qn"), col("cid"))
    val hits = engine.batchGet(store, probes.select(col("cid")).distinct())
    val cand = probes.join(hits, "cid")
      .select(col("qid"), col("qvec"), col("__qn"),
        explode(col("members")).as("m"))
      .select(col("qid"), col("qvec"), col("__qn"),
        col("m").getField("id").as("id"), col("m").getField("vec").as("vec"))
      .filter(col("id") =!= col("qid"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("id"))
    cand
      .withColumn("sim",
        round(vecDot(col("vec"), col("qvec")) / (norm(col("vec")) * col("__qn")), 6)
          + lit(0.0))
      .select(col("qid"), col("id"), col("sim")).distinct()
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** The SQ8-COMPRESSED IVF index as a servable store: cell posting lists
    * carry (id, q) structs with q = [[sq8UnitCodes]] cast to TINYINT — one
    * byte per dimension, the 4× store shrink of the compression ladder
    * applied to the serving layout itself (the float corpus lives only in
    * the separate id→vec value store the final rerank points at). */
  def ivfSq8IndexFrame(corpus: DataFrame, centroids: DataFrame): DataFrame =
    ivfAssign(corpus, centroids).filter(col("rn") === 1)
      .groupBy(col("cid"))
      .agg(array_sort(collect_list(struct(col("id"),
        sq8UnitCodes(col("vec")).cast("array<tinyint>").as("q"))))
        .as("members"))

  /** Probe the SQ8 store-backed index — the full two-stage serving shape:
    * assign queries against the served codebook, batchGet ONLY the probed
    * cells' code postings (bucket-set-pruned point reads, 1 byte/dim on
    * the wire), shortlist by the EXACT integer code dot, then fetch just
    * the shortlist ids' true vectors from the value store (more point
    * reads — the corpus is never scanned) for the exact cosine rerank.
    * With `shortlist` ≥ every probed candidate the integer stage reorders
    * but drops nothing, so the result is EXACTLY [[ivfTopK]] with the
    * same parameters (the `ann_index_sq8` oracle is `ann_ivf`'s SQL
    * verbatim); production shortlists trade the standard quantization
    * recall for k/shortlist × less value-store traffic. */
  def probeIvfSq8Index(engine: graft.core.GraftEngine, store: String,
      centroidStore: String, vecStore: String, queries: DataFrame,
      k: Int, nProbe: Int, shortlist: Int = Int.MaxValue): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val cents = engine.servingView(centroidStore)
      .select(col("cid").as("id"), col("cvec").as("vec"))
    val probes = ivfAssign(
        queries.select(col("qid").as("id"), col("qvec").as("vec")), cents)
      .filter(col("rn") <= nProbe)
      .select(col("id").as("qid"), sq8UnitCodes(col("vec")).as("__qq"),
        col("cid"))
    val hits = engine.batchGet(store, probes.select(col("cid")).distinct())
    val cand = probes.join(hits, "cid")
      .select(col("qid"), col("__qq"), explode(col("members")).as("m"))
      .select(col("qid"), col("__qq"), col("m").getField("id").as("id"),
        col("m").getField("q").cast("array<double>").as("__q"))
      .filter(col("id") =!= col("qid"))
      .withColumn("qdot", vecDot(col("__q"), col("__qq")).cast("long"))
      .select(col("qid"), col("id"), col("qdot")).distinct()
    val short = cand.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("qdot").desc, col("id"))))
      .filter(col("rk") <= shortlist)
    val vecs = engine.batchGet(vecStore, short.select(col("id")).distinct())
      .select(col("id"), col("vec"))
    rerankExact(vecs, queries, short.select(col("qid"), col("id")), k)
  }

  /** All pairs with cosine ≥ threshold (embedding near-dup), EXACT, with no
    * CartesianProduct node in the plan.
    *
    * Why not LSH here: hyperplane bucketing prunes only when the threshold
    * implies a small angle. At a threshold near the random-pair similarity
    * (this oracle's 0.4 over near-orthogonal vectors) ANY full-recall bucket
    * scheme degenerates to Ω(n²) candidates, so the exact path must survive
    * n² pair evaluations — and the way to survive them on a cluster is not
    * Spark's CartesianProduct (one lopsided nested loop, unbounded partition
    * pairs in memory) but a block-partitioned self-join: ids hash into B
    * blocks, the B(B+1)/2 unordered block pairs become join keys, and each
    * task computes one block×block tile with bounded memory. Shuffle cost =
    * (B+1)/2 × data replication; parallelism = B(B+1)/2 even tiles.
    * `blocks = 0` (the default) resolves to ≈ 2·√(defaultParallelism) so
    * the tile count tracks the cluster size without a parameter — 32 local
    * cores → 12 blocks / 78 tiles; 1000 executors·4 cores → 127 blocks /
    * 8128 tiles. For genuine near-dup thresholds (cos ≳ 0.7) use
    * [[lshCosinePairs]] — near-linear, tunable recall.
    *
    * THIS IS THE EXACT ALL-PAIRS BASELINE — the comparison count is
    * Θ(n²) by definition, tiling only bounds memory and shuffle width.
    * `maxExactRows` (default 100k ⇒ ≤ 5·10⁹ dot products) guards against
    * running it on a corpus-scale input by accident: beyond the cap it
    * refuses with a pointer to the scale paths ([[lshCosinePairs]],
    * [[semDedup]]). Raise the cap EXPLICITLY to run bigger exactness
    * studies. (The earlier 1M default admitted a 200k×64-dim corpus whose
    * 2·10¹⁰ exact pairs ran ~40 wall-minutes on 32 cores — a deliberate
    * study's budget, not an accident's; quadratic baselines refuse where
    * they stop being practical, like the n-gram/simhash guards.)
    *
    * The guard costs one extra pass over the input plan, but a CHEAP one:
    * it counts a constant projection limited to cap+1 rows, so column
    * pruning drops the embedding payload and the scan early-terminates as
    * soon as the cap is provably exceeded — it never counts a 100-TB
    * corpus to refuse it. (Caps above Int.MaxValue probe only the first
    * Int.MaxValue rows; at that size you are past any exactness study.) */
  def cosinePairs(corpus: DataFrame, threshold: Double,
      blocks: Int = 0, maxExactRows: Long = 100000L): DataFrame = {
    val probeLimit = math.min(maxExactRows, (Int.MaxValue - 1).toLong).toInt
    val probed = corpus.select(lit(1).as("__c")).limit(probeLimit + 1).count()
    graft.core.Guard.admit(probed <= maxExactRows,
      s"cosinePairs is the exact O(n²) all-pairs baseline and its input " +
        s"has at least $probed rows (cap $maxExactRows). Use " +
        "lshCosinePairs or semDedup for corpus-scale near-dup detection, " +
        "or raise maxExactRows explicitly for a deliberate exactness study.")
    val b = if (blocks > 0) blocks
      else math.max(8, 2 * math.ceil(math.sqrt(
        corpus.sparkSession.sparkContext.defaultParallelism)).toInt)
    val withNorm = corpus
      .withColumn("__n", norm(col("vec")))
      .withColumn("__b", pmod(xxhash64(col("id")), lit(b)).cast("int"))
    // row in block b plays the LEFT role of tiles (b, j) for j ≥ b …
    val left = withNorm
      .withColumn("__tile",
        explode(transform(sequence(col("__b"), lit(b - 1)),
          j => col("__b") * b + j)))
      .select(col("__tile"), col("id").as("id_a"), col("vec").as("vec_a"),
        col("__n").as("n_a"), col("__b").as("b_a"))
    // … and the RIGHT role of tiles (i, b) for i ≤ b, so every unordered
    // block pair meets in exactly one tile
    val right = withNorm
      .withColumn("__tile",
        explode(transform(sequence(lit(0), col("__b")),
          i => i * b + col("__b"))))
      .select(col("__tile"), col("id").as("id_b"), col("vec").as("vec_b"),
        col("__n").as("n_b"), col("__b").as("b_b"))
    left.join(right, "__tile")
      // same-block tiles see both orderings of a pair — keep one; cross-block
      // tiles see exactly one ordering — keep it regardless of id order
      .filter(col("b_a") =!= col("b_b") || col("id_a") < col("id_b"))
      .withColumn("sim",
        round(vecDot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 6)
          + lit(0.0))
      .filter(col("sim") >= threshold)
      .select(least(col("id_a"), col("id_b")).as("id_a"),
        greatest(col("id_a"), col("id_b")).as("id_b"), col("sim"))
  }

  /** Near-dup pairs for genuine near-dup thresholds: multi-band hyperplane
    * LSH candidates + exact cosine verify — the candidates→verify pattern of
    * [[Dedup.minhashCandidates]]→[[Dedup.jaccardVerify]]. Candidate
    * generation is an equi-join on (band, bandCode): near-linear in corpus
    * size when duplicates are actually near (per-pair recall =
    * 1 − (1 − p^bitsPerBand)^bands with p = 1 − θ/π; e.g. cos 0.9, 8 bits ×
    * 8 bands → ~0.97). PipelineSpec pins recall on planted near-dups. */
  def lshCosinePairs(corpus: DataFrame, threshold: Double, dim: Int,
      bitsPerBand: Int = 8, bands: Int = 8): DataFrame = {
    // referenced by three consumers (band keys + both verify sides);
    // localCheckpoint instead of persist: same one-time materialization,
    // but the blocks are released by the ContextCleaner once the result
    // plan is dropped — a bare persist here could never be unpersisted
    // (the return value is lazy) and leaked cached blocks in a long-lived
    // session
    val withNorm = corpus
      .withColumn("__n", norm(col("vec")))
      .localCheckpoint()
    val banded = withNorm
      .select(col("id"), explode(array((0 until bands).map { b =>
        struct(lit(b).as("band"),
          lshCode(col("vec"), bitsPerBand, dim,
            planeOffset = b * bitsPerBand).as("code"))
      }: _*)).as("bk"))
      .select(col("id"), col("bk.band").as("band"), col("bk.code").as("code"))
    val l = banded.as("l"); val r = banded.as("r")
    val cand = l.join(r,
        col("l.band") === col("r.band") && col("l.code") === col("r.code") &&
          col("l.id") < col("r.id"))
      .select(col("l.id").as("id_a"), col("r.id").as("id_b"))
      .distinct()
    val a = withNorm.select(col("id").as("id_a"), col("vec").as("vec_a"),
      col("__n").as("n_a"))
    val b = withNorm.select(col("id").as("id_b"), col("vec").as("vec_b"),
      col("__n").as("n_b"))
    cand.join(a, "id_a").join(b, "id_b")
      .withColumn("sim",
        round(vecDot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 6)
          + lit(0.0))
      .filter(col("sim") >= threshold)
      .select(col("id_a"), col("id_b"), col("sim"))
  }

  /** Hyperplane band rows for a store-backed streaming LSH index: one
    * (bandkey, id) row per band, bandkey = "band:code" over the SAME
    * deterministic md5 planes as [[lshCosinePairs]] — the streaming
    * index and the batch candidate join agree on collision identity, so
    * a stream drain's pair set equals the batch band join over the same
    * corpus (the `stream_semdedup` oracle pins this equivalence). */
  def hyperplaneBandRows(df: DataFrame, idCol: String, vecCol: String,
      dim: Int, bitsPerBand: Int = 12, bands: Int = 8): DataFrame =
    df.select(col(idCol).as("id"),
        explode(array((0 until bands).map { b =>
          concat_ws(":", lit(b).cast("string"),
            lshCode(col(vecCol), bitsPerBand, dim,
              planeOffset = b * bitsPerBand).cast("string"))
        }: _*)).as("bandkey"))
      .select(col("bandkey"), col("id"))

  /** SemDeDup-style semantic deduplication (Abbas et al. 2023): cluster the
    * embedding space with the deterministic k-means quantizer, then compare
    * pairs only WITHIN a cell — each vector with a ≥threshold cosine
    * neighbor of smaller id in its cell is a duplicate of the smallest such
    * neighbor. The cluster pass turns the n² global pair problem into K
    * independent (n/K)² cell problems: at 100 TB you raise numCells with
    * corpus size so cells stay bounded (the standard SemDeDup deployment),
    * and the within-cell pass is a plain equi-join on the cell id — one
    * shuffle, no CartesianProduct. Output: every vector with its cell, a
    * nullable `dup_of` (the keeper) and an `is_dup` flag.
    *
    * `numCells = 0` auto-scales the codebook with the CORPUS:
    * K = max(16, ⌈n / targetCellRows⌉), one cheap count up front. This is
    * the load-bearing scale knob — within-cell exact cosine is Θ(Σ n_c²),
    * so a K that does NOT grow with n makes 10× data 100× pair work
    * (measured: a cores-derived fixed K posted a 47× sf1→sf10 decade;
    * corpus-derived K holds cells at ~targetCellRows and the decade near
    * linear). Pass an explicit K only to pin reproducible cells for an
    * exactness oracle at small SF (the pinned `semdedup` query does;
    * `semdedup_scaled` replays this formula instead).
    */
  def semDedup(corpus: DataFrame, threshold: Double, numCells: Int = 0,
      trainIters: Int = 2, trainFraction: Double = 1.0,
      targetCellRows: Int = 2000): DataFrame = {
    val k = if (numCells > 0) numCells
      else math.max(16L, math.ceil(
        corpus.count().toDouble / targetCellRows).toLong).toInt
    // codebook is k rows — collect to a local relation once, so the
    // two assign consumers below don't re-run Lloyd training (same pattern
    // as ivfTopK)
    val trained = kmeansCentroids(corpus, k, trainIters, trainFraction)
    val centroids = corpus.sparkSession.createDataFrame(
      java.util.Arrays.asList(trained.collect(): _*), trained.schema)
    // assignment feeds both sides of the pair join AND the final output;
    // localCheckpoint (not persist) so the blocks free with the plan
    val assigned = ivfAssign(corpus, centroids)
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("__n"), col("cid"))
      .localCheckpoint()
    val a = assigned.select(col("cid"), col("id").as("id_a"),
      col("vec").as("vec_a"), col("__n").as("n_a"))
    val b = assigned.select(col("cid"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("__n").as("n_b"))
    val dups = a.join(b, Seq("cid"))
      .filter(col("id_a") < col("id_b"))
      .withColumn("sim",
        round(vecDot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 6)
          + lit(0.0))
      .filter(col("sim") >= threshold)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("dup_of"))
      .select(col("id_b").as("vec_id"), col("dup_of"))
    assigned.select(col("id").as("vec_id"), col("cid").as("cell"))
      .join(dups, Seq("vec_id"), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
  }

  /** Incremental SemDeDup for a crawl DELTA: score a new `batch` of
    * embeddings against an accepted `corpus` without ever re-pairing the
    * corpus with itself — the embedding-side twin of
    * [[Dedup.crossMinhashCandidates]]'s crawl-delta shape. The quantizer
    * trains on the CORPUS ONLY (deterministic Lloyd, seeds = corpus ids
    * < K), so cell boundaries do not move with arrivals and successive
    * batches are scored against a stable geometry. A batch vector is a
    * duplicate iff some ≥`threshold` cosine neighbor shares its cell —
    * either ANY corpus vector, or a batch vector with smaller id (the
    * within-batch tie falls to the smallest id, as in [[semDedup]]);
    * `dup_of` is the smallest such neighbor. Output: one row per BATCH
    * vector (vec_id, cell, dup_of, is_dup).
    *
    * Scale shape: corpus assignment is one broadcast-centroid scan; the
    * pair join is (corpus ∪ batch) ⋈ batch on the cell id — cost
    * Θ(|batch| · cellRows), linear in the delta for bounded cells, and
    * the corpus NEVER self-joins. Ids must be disjoint across the two
    * inputs (they share one id space).
    *
    * `numCells = 0` derives K = max(16, ⌈|corpus| / targetCellRows⌉) —
    * the [[semDedup]] formula, on the corpus count. */
  def semDedupIncremental(corpus: DataFrame, batch: DataFrame,
      threshold: Double, numCells: Int = 0, trainIters: Int = 2,
      trainFraction: Double = 1.0, targetCellRows: Int = 2000): DataFrame = {
    val k = if (numCells > 0) numCells
      else math.max(16L, math.ceil(
        corpus.count().toDouble / targetCellRows).toLong).toInt
    val centroids = cellCentroids(corpus, k, trainIters, trainFraction)
    val corpusAssigned = ivfAssign(corpus, centroids)
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("__n"), col("cid"))
    // batch assignment feeds the pair join's probe side AND the output;
    // localCheckpoint so the (small) delta materializes once
    val batchAssigned = ivfAssign(batch, centroids)
      .filter(col("rn") === 1)
      .select(col("id"), col("vec"), col("__n"), col("cid"))
      .localCheckpoint()
    val aSide = corpusAssigned
      .select(col("cid"), col("id").as("id_a"), col("vec").as("vec_a"),
        col("__n").as("n_a"), lit(true).as("from_corpus"))
      .unionByName(batchAssigned
        .select(col("cid"), col("id").as("id_a"), col("vec").as("vec_a"),
          col("__n").as("n_a"), lit(false).as("from_corpus")))
    val bSide = batchAssigned.select(col("cid"), col("id").as("id_b"),
      col("vec").as("vec_b"), col("__n").as("n_b"))
    val dups = aSide.join(bSide, Seq("cid"))
      // corpus neighbors always count; batch neighbors only at smaller id
      .filter(col("from_corpus") || col("id_a") < col("id_b"))
      .withColumn("sim",
        round(vecDot(col("vec_a"), col("vec_b")) / (col("n_a") * col("n_b")), 6)
          + lit(0.0))
      .filter(col("sim") >= threshold)
      .groupBy(col("id_b"))
      .agg(min(col("id_a")).as("dup_of"))
      .select(col("id_b").as("vec_id"), col("dup_of"))
    batchAssigned.select(col("id").as("vec_id"), col("cid").as("cell"))
      .join(dups, Seq("vec_id"), "left")
      .withColumn("is_dup", col("dup_of").isNotNull)
  }

  /** Recall@k of an approximate top-k result against an exact baseline —
    * the quality harness every ANN deployment needs BEFORE trading probes
    * for latency (tune nProbe/bands by measured recall, don't guess).
    * Both inputs are (qid, id, ...) top-k frames (e.g. [[bruteForceTopK]]
    * as `exact`, [[ivfTopK]]/[[lshTopK]]/[[pqTopK]] as `approx`); output
    * is one row per qid: hits (exact results the approx run surfaced) and
    * recall = hits/k. Zero-overlap qids stay in the output at 0, not
    * silently dropped. Scale shape: one left-semi equi-join on (qid, id)
    * + a keyed count — both sides are |queries|·k rows, never the corpus. */
  def recallAtK(exact: DataFrame, approx: DataFrame, k: Int): DataFrame =
    exact.select(col("qid"), col("id"))
      .join(approx.select(col("qid"), col("id")), Seq("qid", "id"),
        "left_semi")
      .groupBy(col("qid")).agg(count(lit(1)).as("hits"))
      .join(exact.select(col("qid")).distinct(), Seq("qid"), "right")
      .na.fill(0L, Seq("hits"))
      .withColumn("recall", round(col("hits") / lit(k.toDouble), 6) + lit(0.0))

  /** Rounded squared L2 distance with a FIXED association — (a·a − 2·a·b)
    * + b·b, each dot a sequential fold — so Spark and a SQL oracle using
    * the same expression produce bit-identical doubles. */
  private def d2(a: Column, b: Column): Column =
    round(vecDot(a, a) - lit(2.0) * vecDot(a, b) + vecDot(b, b), 6)

  /** Slice a vector column into its `m` product-quantization subspaces:
    * one row per (id, m, svec). */
  private def subspaces(df: DataFrame, idCol: String, vecCol: String,
      m: Int, subDim: Int): DataFrame =
    df.select(col(idCol).as("id"), explode(array((0 until m).map(i =>
        struct(lit(i).as("m"),
          slice(col(vecCol), i * subDim + 1, subDim).as("svec"))): _*)).as("s"))
      .select(col("id"), col("s.m").as("m"), col("s.svec").as("svec"))

  /** Product-quantization ANN (the IVF-PQ family's compression half).
    *
    * Train: each of `m` subspaces gets its own `ksub`-centroid codebook —
    * seeds are the ids&lt;ksub subvectors, refined by `trainIters` Lloyd
    * steps with scaled-integer recentring (exactly [[kmeansCentroids]]'
    * determinism trick, per subspace). Encode: every corpus vector becomes
    * `m` small codes (argmin rounded L2 per subspace — 64 floats → 4
    * codes, a 64× memory cut, which is what makes billion-vector serving
    * fit in RAM). Query: asymmetric distance computation — the query
    * builds an (m × ksub) distance table against the codebooks, and a
    * candidate's approximate distance is the sum of `m` table lookups,
    * never a full-vector dot product.
    *
    * Scale shape: codebooks and distance tables are driver-sized (m·ksub
    * rows) → broadcast; corpus codes are one narrow frame; the ADC join is
    * an equi-join on (subspace, code) followed by a keyed integer-sum
    * aggregation (scaled-integer distances — float addition order across
    * subspaces would break cross-engine determinism). No shuffle touches
    * a full-width vector after encoding.
    *
    * Reference semantics (NOT code): Venice serves embeddings for ANN
    * feature stores (docs/README.md:25-33); PQ itself is the standard
    * Jégou et al. 2011 construction re-expressed as DataFrame ops. */
  def pqTopK(corpus: DataFrame, queries: DataFrame, k: Int, m: Int,
      ksub: Int, dim: Int, trainIters: Int = 1): DataFrame = {
    require(dim % m == 0, s"dim $dim not divisible by m $m")
    val subDim = dim / m
    val spark = corpus.sparkSession
    val sub = subspaces(corpus, "id", "vec", m, subDim)

    def assign(s: DataFrame, cb: DataFrame) = {
      val w = Window.partitionBy(col("id"), col("m"))
        .orderBy(col("dist").asc, col("cid").asc)
      s.join(broadcast(cb), Seq("m"))
        .withColumn("dist", d2(col("svec"), col("cvec")) + lit(0.0))
        .withColumn("rn", row_number().over(w))
    }

    // per-subspace Lloyd refinement; scaled-integer means (order-independent)
    var codebook = sub.filter(col("id") < ksub)
      .select(col("m"), col("id").as("cid"), col("svec").as("cvec"))
    for (_ <- 0 until trainIters) {
      codebook = assign(sub, codebook).filter(col("rn") === 1)
        .select(col("m"), col("cid"), posexplode(col("svec")))
        .groupBy(col("m"), col("cid"), col("pos"))
        .agg(sum(round(col("col").cast("double") * 1000).cast("long")).as("s"),
          count(lit(1)).as("c"))
        .groupBy(col("m"), col("cid"))
        .agg(array_sort(collect_list(struct(col("pos"),
          (col("s").cast("double") / (col("c") * lit(1000.0))).as("v"))))
          .as("pv"))
        .select(col("m"), col("cid"),
          transform(col("pv"), e => e.getField("v")).as("cvec"))
    }
    // m·ksub rows — driver-sized by design; materialize once so both
    // consumers (corpus encode + query distance tables) broadcast a local
    // relation instead of re-running the training
    val cbLocal = spark.createDataFrame(
      java.util.Arrays.asList(codebook.collect(): _*), codebook.schema)

    val codes = assign(sub, cbLocal).filter(col("rn") === 1)
      .select(col("id"), col("m"), col("cid").as("code"))
    // ADC distance table: scaled-integer entries so the per-candidate sum
    // over subspaces is exact in any order and any engine
    val dtable = subspaces(queries, "qid", "qvec", m, subDim)
      .select(col("id").as("qid"), col("m"), col("svec").as("qsvec"))
      .join(broadcast(cbLocal), Seq("m"))
      .select(col("qid"), col("m"), col("cid"),
        round((vecDot(col("qsvec"), col("qsvec"))
          - lit(2.0) * vecDot(col("qsvec"), col("cvec"))
          + vecDot(col("cvec"), col("cvec"))) * 1e6).cast("long").as("d2i"))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("d2s").asc, col("id").asc)
    codes.join(broadcast(dtable),
        codes("m") === dtable("m") && codes("code") === dtable("cid"))
      .filter(col("id") =!= col("qid"))
      .groupBy(col("qid"), col("id"))
      .agg(sum(col("d2i")).as("d2s"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"),
        round(col("d2s").cast("double") / 1e6, 6).as("approx_d2"))
  }

  /** Scaled-integer per-label mean vectors (engine-exact: the recentring
    * sums round(x·1000) longs, so the oracle replays the means bit-for-
    * bit). One partial-aggregated explode; #labels × dims rows out. */
  private def labelCentroids(vecs: DataFrame): DataFrame =
    vecs.select(col("label"), posexplode(col("vec")))
      .groupBy(col("label"), col("pos"))
      .agg(sum(round(col("col").cast("double") * 1000).cast("long")).as("s"),
        count(lit(1)).as("c"))
      .groupBy(col("label"))
      .agg(array_sort(collect_list(struct(col("pos"),
        (col("s").cast("double") / (col("c") * lit(1000.0))).as("v"))))
        .as("pv"))
      .select(col("label").as("clabel"),
        transform(col("pv"), e => e.getField("v")).as("cvec"))

  /** Nearest-centroid classification over labeled embeddings: one
    * scaled-integer mean vector per label (the same order-independent
    * arithmetic as [[kmeansCentroids]] — float partial sums would break
    * cross-engine determinism), then every vector assigned to its most
    * cosine-similar label centroid. The label-quality eval a training-data
    * pipeline runs on embedded corpora: the confusion matrix localizes
    * label noise and near-duplicate label pairs.
    *
    * Scale shape: centroids are |labels| rows — broadcast; the corpus is
    * scanned ONCE against them (narrow after the per-label mean's two
    * keyed aggregations). Ties break to the smaller label id.
    *
    * @param vecs (id, vec, label)
    * @return (id, label, pred, sim) — one row per input vector */
  def centroidClassify(vecs: DataFrame): DataFrame = {
    val cent = broadcast(labelCentroids(vecs).withColumn("__cn", norm(col("cvec"))))
    val w = Window.partitionBy(col("id"))
      .orderBy(col("sim").desc, col("clabel"))
    vecs.withColumn("__n", norm(col("vec")))
      .crossJoin(cent)
      .withColumn("sim",
        round(vecDot(col("vec"), col("cvec")) / (col("__n") * col("__cn")), 6)
          + lit(0.0))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("id"), col("label"), col("clabel").as("pred"), col("sim"))
  }

  /** Exact-cosine rerank of an approximate candidate list — the second
    * stage of the production two-stage retrieval shape (an ANN recall
    * stage over-fetches cheap approximate candidates, then only THOSE are
    * scored exactly). cands: (qid, id); queries: (qid, qvec);
    * corpus: (id, vec). Output: (qid, rank, id, sim), the same contract
    * as [[bruteForceTopK]].
    *
    * Scale shape: the candidate list is |queries|·K rows — the corpus-side
    * join is a keyed equi-join on id touching only candidate vectors (one
    * shuffle of K·|queries| rows, NOT a corpus scan), queries broadcast,
    * per-query rank bounded. Exactness of the final order costs only
    * K·|queries| true dot products regardless of corpus size. */
  def rerankExact(corpus: DataFrame, queries: DataFrame, cands: DataFrame,
      k: Int): DataFrame = {
    val c = corpus.withColumn("__n", norm(col("vec")))
    val q = queries.withColumn("__qn", norm(col("qvec")))
    val w = Window.partitionBy(col("qid"))
      .orderBy(col("sim").desc, col("id"))
    cands.select(col("qid"), col("id"))
      .join(c, "id")
      .join(broadcast(q), "qid")
      .withColumn("sim",
        round(vecDot(col("vec"), col("qvec")) / (col("__n") * col("__qn")), 6)
          + lit(0.0))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("qid"), col("rank"), col("id"), col("sim"))
  }

  /** SQ8 code vector for ANN ranking: the UNIT vector (x/‖x‖) scaled by
    * 127 and floor(+0.5)-rounded — so every code is an integer in
    * [-127, 127] and, unlike the per-vector max-abs codes of
    * `embed_quantize` (a storage layout), two vectors' code dot products
    * are mutually comparable: both sides carry the SAME fixed scale, so
    * ⟨qa,qb⟩ ≈ 127²·cosine and ranking by the integer dot ranks by
    * approximate cosine directly. Zero vectors code to all-zero. Codes are
    * integer-valued doubles: every product ≤ 127²+ε and a 4096-dim sum
    * stays < 2³⁰ — exact in IEEE doubles in ANY summation order, which is
    * what makes the score engine-exact with no float-rounding escrow. */
  def sq8UnitCodes(vec: Column): Column = {
    val n = norm(vec)
    when(n > 0, transform(vec,
        x => floor(x.cast("double") * lit(127.0) / n + lit(0.5))))
      .otherwise(transform(vec, _ => lit(0.0)))
  }

  /** SQ8 ANN: score candidates by the EXACT integer dot product of their
    * [[sq8UnitCodes]] (asymmetric-distance-style, both sides quantized),
    * rank per query, optionally rerank the top-`rerank` survivors with
    * true float cosine ([[rerankExact]] — the standard two-stage shape,
    * same as `ann_pq_rerank`).
    *
    * Where this sits in the ANN family: the codes are 8 bits/dim — 4× less
    * scan IO than float32 with NO codebook to train or ship (vs PQ's 16×
    * compression + trained codebooks), so SQ8 is the drop-in first rung of
    * the compression ladder. This form is exhaustive over `corpus` (the
    * exactness-oracleable baseline); at 100 TB store the codes as a column
    * (the `embed_quantize` pattern), compose with [[ivfTopK]]'s cell
    * pruning so only probed cells' CODES are scanned, and let the integer
    * dot — codegen'd through [[graft.functions.VecDot]] — replace the
    * float one. Queries broadcast; corpus crosses the network never. */
  def sq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      rerank: Int = 0): DataFrame = {
    val c = corpus.withColumn("__q", sq8UnitCodes(col("vec")))
    val q = queries.withColumn("__qq", sq8UnitCodes(col("qvec")))
    val scored = c
      .crossJoin(broadcast(q.select(col("qid"), col("__qq"))))
      .filter(col("id") =!= col("qid"))
      .withColumn("qdot", vecDot(col("__q"), col("__qq")).cast("long"))
    val w = Window.partitionBy(col("qid")).orderBy(col("qdot").desc, col("id"))
    val ranked = scored.withColumn("rank", row_number().over(w))
    if (rerank <= 0)
      ranked.filter(col("rank") <= k)
        .select(col("qid"), col("rank"), col("id"), col("qdot"))
    else
      rerankExact(corpus, queries,
        ranked.filter(col("rank") <= rerank).select(col("qid"), col("id")), k)
  }

  /** The compression ladder composed with cell pruning: IVF probe →
    * SQ8 integer-ADC shortlist → exact rerank. The 100-TB serving shape:
    * only the probed cells' CODES (8 bits/dim) are scanned, the integer
    * shortlist bounds exact-cosine work to `shortlist` true dot products
    * per query, and nothing corpus-sized crosses a shuffle (probes
    * broadcast, cells equi-joined). With `shortlist` ≥ the probed
    * candidate count this is EXACTLY [[ivfTopK]] (the integer stage
    * reorders but drops nothing — the PipelineSpec differential); smaller
    * shortlists trade the standard quantization recall for 4× less
    * rerank IO. Codes are computed inline here; a store-backed deployment
    * persists them as a column ([[sq8UnitCodes]] is deterministic, so
    * inline and stored codes agree). */
  def ivfSq8TopK(corpus: DataFrame, queries: DataFrame, k: Int,
      numCells: Int, nProbe: Int, shortlist: Int,
      trainIters: Int = 2): DataFrame = {
    require(shortlist >= k, s"shortlist $shortlist < k $k")
    val centroids = cellCentroids(corpus, numCells, trainIters, 1.0)
    val assigned = ivfAssign(corpus, centroids)
      .filter(col("rn") === 1)
      .select(col("id"), col("cid"), sq8UnitCodes(col("vec")).as("__q"))
    val probes = ivfAssign(
        queries.select(col("qid").as("id"), col("qvec").as("vec")), centroids)
      .filter(col("rn") <= nProbe)
      .select(col("id").as("qid"), col("cid"),
        sq8UnitCodes(col("vec")).as("__qq"))
    val cand = assigned
      .join(broadcast(probes), Seq("cid"))
      .filter(col("id") =!= col("qid"))
      .withColumn("qdot", vecDot(col("__q"), col("__qq")).cast("long"))
      .select(col("qid"), col("id"), col("qdot")).distinct()
    val short = cand.withColumn("rk", row_number().over(
        Window.partitionBy(col("qid"))
          .orderBy(col("qdot").desc, col("id"))))
      .filter(col("rk") <= shortlist)
    rerankExact(corpus, queries, short.select(col("qid"), col("id")), k)
  }

  /** Each vector's cosine to its OWN label's centroid — the label-noise /
    * outlier gate (a low self-similarity means the vector doesn't belong
    * where its label says). Broadcast equi-join on the label; one corpus
    * scan. */
  def centroidSelfSim(vecs: DataFrame): DataFrame = {
    val cent = broadcast(labelCentroids(vecs).withColumn("__cn", norm(col("cvec"))))
    vecs.withColumn("__n", norm(col("vec")))
      .join(cent, col("label") === col("clabel"))
      .withColumn("self_sim",
        round(vecDot(col("vec"), col("cvec")) / (col("__n") * col("__cn")), 6)
          + lit(0.0))
      .select(col("id"), col("label"), col("self_sim"))
  }
}
