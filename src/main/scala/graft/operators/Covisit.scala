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
}
