package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Derives a larger scale point from a driver-provided SF dir (default:
  * sf0.1 ×10 → "sf1") for bench scaling sweeps — /root/testdata ships
  * sf0.001–0.1 only.
  *
  * Replication preserves the two properties a scaling sweep needs:
  *  - join consistency: each replica's foreign keys shift together, so
  *    customer⋈orders⋈lineitem joins have the same selectivity per replica;
  *  - duplicate density: documents get a per-replica deterministic word
  *    shuffle and embeddings a per-replica dimension rotation, so
  *    cross-replica rows are NOT near-duplicates. A naive 10× copy would
  *    give every doc 9 high-similarity siblings and the dedup benchmarks
  *    would measure a degenerate workload (quadratic candidate blowup)
  *    instead of scale.
  */
object MakeScale {
  def main(args: Array[String]): Unit = {
    val src = if (args.length > 0) args(0) else "/root/testdata/sf0.1"
    val dst = if (args.length > 1) args(1) else "/root/repo/tmp/sf1"
    val reps = if (args.length > 2) args(2).toInt else 10
    // second-decade params (e.g. sf1 → sf10): the key-offset strides and
    // the text-shuffle/rotation seeds were sized for ONE decade from the
    // driver corpus — reusing them verbatim on an already-scaled source
    // would collide replica key ranges and replant the exact same word
    // shuffles / dimension rotations (= exact-duplicate texts/embeddings
    // across replicas, a degenerate dedup workload). `offMult` multiplies
    // every key stride (pass 10 for sf1→sf10); `seedTag` salts the
    // deterministic shuffle so each stage draws fresh permutations.
    val offMult = if (args.length > 3) args(3).toLong else 1L
    val seedTag = if (args.length > 4) args(4) else ""
    val spark = graft.core.GraftSession.build(appName = "make-scale")
    spark.sparkContext.setLogLevel("WARN")

    val repDf = spark.range(reps).select(col("id").as("__rep"))
    val R = col("__rep")
    def scaled(name: String)(f: DataFrame => DataFrame): Unit = {
      val df = spark.read.parquet(s"$src/$name.parquet")
      f(df.crossJoin(repDf)).drop("__rep")
        .repartition(16)
        .write.mode("overwrite").parquet(s"$dst/$name.parquet")
      ()
    }

    Seq("region", "nation").foreach { n => // tiny dims: copy as-is
      spark.read.parquet(s"$src/$n.parquet")
        .write.mode("overwrite").parquet(s"$dst/$n.parquet")
    }
    val M = offMult
    scaled("customer")(_
      .withColumn("c_custkey", col("c_custkey") + R * (10000000L * M)))
    scaled("supplier")(_
      .withColumn("s_suppkey", col("s_suppkey") + R * (1000000L * M)))
    scaled("part")(_
      .withColumn("p_partkey", col("p_partkey") + R * (10000000L * M)))
    scaled("orders")(_
      .withColumn("o_orderkey", col("o_orderkey") + R * (100000000L * M))
      .withColumn("o_custkey", col("o_custkey") + R * (10000000L * M)))
    scaled("lineitem")(_
      .withColumn("l_orderkey", col("l_orderkey") + R * (100000000L * M))
      .withColumn("l_partkey", col("l_partkey") + R * (10000000L * M))
      .withColumn("l_suppkey", col("l_suppkey") + R * (1000000L * M)))
    scaled("events")(_
      .withColumn("event_id", col("event_id") + R * (100000000L * M))
      .withColumn("user_id", col("user_id") + R * (1000000L * M)))
    scaled("documents")(_
      .withColumn("doc_id", col("doc_id") + R * (10000000L * M))
      // replica 0 keeps the original corpus; other replicas get a
      // deterministic md5-keyed word shuffle (same length, same vocabulary,
      // disjoint shingle sets). seedTag keeps a second decade's shuffles
      // disjoint from the first's.
      .withColumn("text", when(R === 0, col("text")).otherwise(
        array_join(transform(array_sort(transform(split(col("text"), " "),
          (w, i) => struct(
            md5(concat_ws("|", w, i.cast("string"),
              concat(lit(seedTag), R.cast("string")))).as("h"),
            w.as("w")))),
          e => e.getField("w")), " "))))
    scaled("embeddings")(_
      .withColumn("vec_id", col("vec_id") + R * (10000000L * M))
      // per-replica dimension permutation: norms and within-replica pair
      // similarities preserved exactly, cross-replica pairs decorrelated.
      // First decade: rotation by R. Second decade (offMult > 1): the
      // MULTIPLICATIVE permutation i → i·(2R+1) mod dims instead — a
      // rotation stride would compose with the source's own rotations
      // into repeats (r + S·R mod 64 collides for some pairs at any
      // stride), while affine maps i → a·i + b with distinct odd `a`
      // never coincide, so no cross-replica exact-dup vectors.
      .withColumn("embedding",
        transform(sequence(lit(0), size(col("embedding")) - 1),
          i => element_at(col("embedding"),
            (if (M == 1L) pmod(i + R, size(col("embedding")))
             else pmod(i * (R * 2 + 1), size(col("embedding"))))
              .cast("int") + 1))))

    println(s"[make-scale] wrote $dst (${reps}x $src)")
    spark.stop()
  }
}
