package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.functions.HashOps

/** Deterministic Bloom filter for huge exclusion lists (URL / fingerprint
  * blocklists in crawl curation).
  *
  * Why not a semi-join: at 100 TB a blocklist with billions of entries
  * makes `corpus ⋉ blocklist` a full shuffle of the corpus. The Bloom
  * bitmap is built with one distributed bit-OR aggregation whose output is
  * `mBits/64` longs — CONSTANT in the blocklist cardinality — so the
  * driver collect is bounded and the membership test is a narrow,
  * codegen'd per-row expression (no join, no shuffle on the corpus side).
  * False positives are possible (callers route "maybe" rows to an exact
  * re-check, the candidates→verify shape used by the LSH dedup operators);
  * false negatives are not.
  *
  * Hashing is the repo-wide md5 scheme ([[HashOps.h64]]): position j of
  * entry e = h64(e || ':' || j) mod mBits — bit-exactly replayable in any
  * engine (the DuckDB oracle replays it in SQL), no library sketch with
  * private seeds.
  *
  * Venice ships server-computed sketches to readers the same way (HLL in
  * the read-compute path; semantics, not code) — a tiny aggregate standing
  * in for the full set.
  */
object Bloom {

  /** Bit positions (k Columns, each in [0, mBits)) for entry column `c`. */
  def positions(c: Column, k: Int, mBits: Int): Seq[Column] =
    (0 until k).map(j => HashOps.h64(concat(c.cast("string"), lit(s":$j"))) % mBits)

  /** Build the bitmap over `entries.select(c)`: distributed explode of the
    * k positions per entry, one bit-OR aggregation grouped by word index
    * (≤ mBits/64 groups), then a bounded driver collect — O(mBits) result
    * no matter how many entries went in. */
  def build(entries: DataFrame, c: Column, k: Int = 3,
      mBits: Int = 1024): Array[Long] = {
    require(mBits % 64 == 0, s"mBits must be a multiple of 64, got $mBits")
    val words = entries
      .select(explode(array(positions(c, k, mBits): _*)).as("p"))
      .select(expr("cast(p div 64 as int)").as("idx"),
        expr("shiftleft(1L, cast(p % 64 as int))").as("mask"))
      .groupBy(col("idx")).agg(expr("bit_or(mask)").as("word"))
      .collect()
    val bitmap = new Array[Long](mBits / 64)
    words.foreach(r => bitmap(r.getInt(0)) = r.getLong(1))
    bitmap
  }

  /** Add `outCol` = whether `c` might be in the set behind `bitmap`.
    * Pure narrow expressions: k probe columns + k codegen'd bit tests
    * against the broadcast-literal bitmap; the probe columns are dropped
    * again. Guaranteed true for every entry the bitmap was built from. */
  def withMightContain(df: DataFrame, c: Column, bitmap: Array[Long],
      outCol: String, k: Int = 3, mBits: Int = 1024): DataFrame = {
    val pos = positions(c, k, mBits)
    val probed = pos.zipWithIndex.foldLeft(
        df.withColumn("__bloom_bm", typedLit(bitmap.toSeq))) {
      case (d, (p, j)) => d.withColumn(s"__bloom_p$j", p)
    }
    val hit = (0 until k)
      .map(j => expr(s"(element_at(__bloom_bm, cast(__bloom_p$j div 64 as int) + 1)" +
        s" & shiftleft(1L, cast(__bloom_p$j % 64 as int))) != 0"))
      .reduce(_ && _)
    probed.withColumn(outCol, hit)
      .drop("__bloom_bm" +: (0 until k).map(j => s"__bloom_p$j"): _*)
  }
}
