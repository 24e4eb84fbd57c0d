package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Co-visitation candidate generation — the classic recommender
  * training-data shape (items a user touches close together in time are
  * related; the co-occurrence matrix seeds candidate retrieval, and the
  * serving side of exactly such item→neighbors lists is what a Venice
  * store holds). Batch twin of the online covisit builders.
  *
  * Scale discipline: the pair explode is the quadratic hazard. Pairs are
  * generated ONLY within a (user, time-bucket) group, and each group is
  * CAPPED to `maxPerBucket` distinct items first (deterministic cut:
  * item-ascending), so per-group pair work is ≤ cap² regardless of how
  * hot a user-hour is — the same guard-the-explode discipline as the
  * n-gram dedup family. The self-join is an equi-join on (user, bucket);
  * nothing ever crosses user boundaries.
  */
object Covisit {

  /** (item, neighbor, n_co, rank) — top-`k` co-visited neighbors per item
    * by co-occurrence count (ties → neighbor ascending), from pairs of
    * distinct items the same user touched in the same `bucketMs` window.
    * Symmetric: each unordered pair contributes to both orientations.
    *
    * @param events      rows with a user column, an epoch-millis ts column
    *                    and an item column
    * @param bucketMs    co-occurrence window (bucketed, not sliding: pairs
    *                    crossing a bucket boundary don't count — the
    *                    standard approximation that keeps the explode
    *                    equi-joinable)
    * @param maxPerBucket per-(user, bucket) distinct-item cap before
    *                    pairing (item-ascending cut, deterministic)
    * @param minCount    drop pairs seen fewer than this many times */
  def topNeighbors(events: DataFrame, userCol: String, tsMsCol: String,
      itemCol: String, bucketMs: Long, k: Int, maxPerBucket: Int = 20,
      minCount: Long = 1L): DataFrame = {
    require(bucketMs > 0 && k > 0 && maxPerBucket > 1,
      s"need bucketMs > 0, k > 0, maxPerBucket > 1; got " +
        s"($bucketMs, $k, $maxPerBucket)")
    val base = events.select(col(userCol).as("u"),
        expr(s"cast($tsMsCol as long) div ${bucketMs}L").as("b"),
        col(itemCol).as("item"))
      .distinct()
    val capped = base.withColumn("__rn", row_number().over(
        Window.partitionBy(col("u"), col("b")).orderBy(col("item"))))
      .filter(col("__rn") <= maxPerBucket)
      .drop("__rn")
    val pairs = capped.as("l").join(capped.as("r"),
        col("l.u") === col("r.u") && col("l.b") === col("r.b") &&
          col("l.item") < col("r.item"))
      .groupBy(col("l.item").as("item_a"), col("r.item").as("item_b"))
      .agg(count(lit(1)).as("n_co"))
      .filter(col("n_co") >= minCount)
    val sym = pairs.select(col("item_a").as("item"),
        col("item_b").as("neighbor"), col("n_co"))
      .unionByName(pairs.select(col("item_b").as("item"),
        col("item_a").as("neighbor"), col("n_co")))
    sym.withColumn("rank", row_number().over(
        Window.partitionBy(col("item"))
          .orderBy(col("n_co").desc, col("neighbor"))))
      .filter(col("rank") <= k)
  }

  /** Next-item training examples — the sequential-recommendation dataset
    * builder: for every interaction after a user's first, emit the last
    * `contextLen` items (oldest-first, comma-joined) as the context and
    * the interaction's item as the label. One window per user ordered by
    * (ts, id) — per-user state is bounded by user activity, the same
    * bound sessionization already lives with; no explode, no join, one
    * keyed shuffle total.
    *
    * @param tieCol unique tie-break within equal timestamps (cross-engine
    *               determinism — two events in the same millisecond must
    *               order identically everywhere) */
  def nextItemExamples(events: DataFrame, userCol: String, tsMsCol: String,
      tieCol: String, itemCol: String, contextLen: Int): DataFrame = {
    require(contextLen > 0, s"contextLen must be positive, got $contextLen")
    val w = Window.partitionBy(col(userCol))
      .orderBy(col(tsMsCol), col(tieCol))
    val ctx = w.rowsBetween(-contextLen, -1)
    events
      .withColumn("seq_no", row_number().over(w) - 1)
      .withColumn("context",
        array_join(collect_list(col(itemCol).cast("string")).over(ctx), ","))
      .filter(col("seq_no") >= 1)
      .select(col(userCol).as("user"), col("seq_no"),
        col("context"), col(itemCol).as("label"))
  }
}
