package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Deterministic corpus-curation sampling for training-data pipelines.
  *
  * Both samplers key every decision on a stable content hash of the row id —
  * never `rand()` — so membership is reproducible across runs, engines, and
  * partitionings (resuming or re-running a 100 TB curation job must not
  * reshuffle which documents made the cut), and both are single-shuffle
  * shapes that hold at cluster scale.
  */
object Sampling {

  /** Hash-uniform position of an id in [0, 100): the same md5-prefix bucket
    * [[TextOps.splitBucket]] uses for splits, so sampling and splitting
    * compose without correlation only if callers SALT one of them — mixing
    * a salt string into the hash decorrelates the two decisions. */
  def hashPct(id: Column, salt: String = ""): Column =
    conv(substring(md5(concat(lit(salt), id.cast("string"))), 1, 4), 16, 10)
      .cast("int") % 100

  /** Stratified sampling with per-stratum rates: keep a row iff its hash
    * bucket falls under its stratum's percentage. `rates` maps stratum value
    * → keep-percentage (0..100); strata absent from the map keep
    * `defaultPct`. The rate table is a literal CASE expression — no join,
    * no shuffle, a pure narrow filter that pushes into the scan. */
  def stratifiedSample(df: DataFrame, stratumCol: Column, idCol: Column,
      rates: Map[String, Int], defaultPct: Int = 100,
      salt: String = "strat"): DataFrame = {
    val pct = rates.foldLeft(lit(defaultPct)) { case (acc, (k, p)) =>
      when(stratumCol === k, lit(p)).otherwise(acc)
    }
    df.filter(hashPct(idCol, salt) < pct)
  }

  /** Exactly-k per group, deterministically: rank the group's rows in
    * stable hash order (salted md5 of the id — an id-keyed uniform draw,
    * never `rand()`) and keep the first k. One shuffle on the group key +
    * per-partition sort; the rate-based [[stratifiedSample]] can miss a
    * small stratum's target count, this cannot (a group with < k rows
    * keeps them all).
    *
    * Scale note: a single group's rows sort within one task. For k ≪ group
    * size at extreme scale, pre-filter on a hex-prefix threshold of the
    * SAME salted md5 (`md5(salt||id) < lit("0a…")`, sized to overshoot k
    * with near-certainty — a string-prefix cut IS a prefix of the rank
    * order, so whenever it keeps ≥ k rows it provably contains the exact
    * winners; `hashPct` is NOT usable here, its mod-100 breaks
    * monotonicity), then exact-rank the survivors. */
  def exactKPerGroup(df: DataFrame, groupCol: Column, idCol: Column, k: Int,
      salt: String = "exactk"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window.partitionBy(groupCol)
      .orderBy(md5(concat(lit(salt), idCol.cast("string"))), idCol)
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Domain-mix curation to a token budget: per group (language, source
    * domain, …), admit documents in stable hash order until the group's
    * cumulative token count reaches `budgetTokens` — the "sample each
    * domain down to N tokens" step of assembling a training mix with
    * controlled proportions.
    *
    * Hash order makes the admitted set a uniform random-looking but
    * deterministic subset; the first document that would overflow the
    * budget is the cut (truncation semantics — admitted iff the RUNNING
    * SUM through this doc still fits). One shuffle on the group key; the
    * running sum is a window cumsum, O(1) state per task.
    *
    * @return admitted docs with `n_tokens` and the running `cum_tokens`
    *         (≤ budgetTokens by construction)
    */
  def tokenBudgetSample(df: DataFrame, groupCol: String, idCol: String,
      tokensCol: Column, budgetTokens: Long): DataFrame = {
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(md5(col(idCol).cast("string")), col(idCol))
    df.withColumn("n_tokens", tokensCol)
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= budgetTokens)
  }

  /** Temperature-flattened mixture resampling (the multilingual
    * training-mix recipe): group g keeps rate r_g = (n_min/n_g)^(1−α) —
    * the without-replacement filter analog of sampling ∝ p_g^α. α = 1
    * keeps everything (proportional mix), α = 0 equalizes every group down
    * to the smallest; in between, rare groups are up-weighted relative to
    * their share. The smallest group always keeps rate 1.
    *
    * Rates derive from one tiny per-group count (broadcast back — a narrow
    * join at any scale); admission is the stable salted-md5 uniform, so
    * membership is reproducible across runs/engines/partitionings.
    * α = 0.5 computes through `sqrt` (IEEE-correctly-rounded, so both
    * engines agree bit-exactly); other α go through `pow`, whose last ulp
    * may differ across libm implementations — fine for pipelines, not for
    * a hash-compare oracle.
    *
    * @return input rows + the group `rate` (rounded to 6) and a `kept` flag
    */
  def temperatureSample(df: DataFrame, groupCol: String, idCol: Column,
      alpha: Double = 0.5, salt: String = "mixt"): DataFrame = {
    require(alpha >= 0 && alpha <= 1, s"alpha in [0,1], got $alpha")
    val counts = df.groupBy(col(groupCol)).agg(count(lit(1)).as("__n"))
    val nmin = counts.agg(min(col("__n")).as("__nmin"))
    val ratio = col("__nmin").cast("double") / col("__n")
    val rate =
      round(if (alpha == 0.5) sqrt(ratio) else pow(ratio, 1.0 - alpha), 6)
    val rates = counts.crossJoin(broadcast(nmin))
      .select(col(groupCol), rate.as("rate"))
    val u = conv(substring(md5(concat(lit(salt), idCol.cast("string"))),
      1, 6), 16, 10).cast("double") / 16777216.0d
    df.join(broadcast(rates), Seq(groupCol))
      .withColumn("kept", u < col("rate"))
  }

  /** Deterministic POPULARITY-weighted negative sampling — the
    * (user, positive, negative) triples a two-tower/contrastive
    * recommender trainer consumes. For every distinct (user, item)
    * positive, draw `candidatesPerPos` hash-indexed interaction ROWS
    * (sampling an interaction uniformly IS sampling items ∝ their
    * interaction count — the standard popularity-weighted negative
    * distribution, exact, with no range lookup), drop candidates the user
    * has actually interacted with (anti-join on (user, item)), and keep
    * the first `negPerPos` survivors in draw order.
    *
    * Scale shape: every step is an equi-join or the two-phase global
    * prefix sum — draw → interaction is an equi-join on the exact global
    * row position ([[Packing.withGlobalOffsets]] over the unique `idCol`),
    * NEVER a broadcast range/inverse-CDF lookup, so an item vocabulary of
    * any size works. Hash-keyed draws (never rand()) keep the triples
    * reproducible across runs, engines and partitionings.
    *
    * @param idCol unique interaction id (the draw-order key)
    * @return (user, pos_item, neg_rank, neg_item, draw_j) */
  def negativeTriples(interactions: DataFrame, idCol: String,
      userCol: String, itemCol: String, negPerPos: Int,
      candidatesPerPos: Int = 8, salt: String = "neg"): DataFrame = {
    require(negPerPos > 0 && candidatesPerPos >= negPerPos,
      s"need candidatesPerPos >= negPerPos > 0, got " +
        s"($candidatesPerPos, $negPerPos)")
    val inter = interactions.select(col(idCol).as("__iid"),
      col(userCol).as("__u"), col(itemCol).as("__it"))
    // the interaction count (the draw-modulo range) falls out of the
    // prefix pass's own per-partition sums — no separate count() job
    val (indexedAll, total) = Packing.withGlobalOffsetsAndTotal(
      inter.withColumn("__one", lit(1L)), "__iid", "__one")
    val indexed = indexedAll.select(col("start_offset").as("__pos"), col("__it"))
    val pos = inter.select(col("__u").as("user"), col("__it").as("pos_item"))
      .distinct()
    val cand = pos.select(col("user"), col("pos_item"),
        explode(sequence(lit(0), lit(candidatesPerPos - 1))).as("draw_j"))
      .withColumn("__pos",
        pmod(conv(substring(md5(concat_ws("-", lit(salt), col("user"),
          col("pos_item"), col("draw_j"))), 1, 12), 16, 10).cast("long"),
          lit(total)))
      .join(indexed, Seq("__pos"))
      .withColumnRenamed("__it", "neg_item")
    val unseen = cand.join(
        pos.select(col("user"), col("pos_item").as("neg_item")),
        Seq("user", "neg_item"), "left_anti")
    unseen.withColumn("neg_rank", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("user"), col("pos_item"))
          .orderBy(col("draw_j"))))
      .filter(col("neg_rank") <= negPerPos)
      .select(col("user"), col("pos_item"), col("neg_rank"),
        col("neg_item"), col("draw_j"))
  }
}
