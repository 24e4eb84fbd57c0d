package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Multi-dimensional data clustering for scan pruning: Z-order (Morton)
  * interleaving of range-bucketed dimension values, so a range predicate on
  * ANY of the clustered dimensions touches a small, contiguous set of files
  * instead of all of them.
  *
  * Why this matters at 100 TB: parquet prunes row groups by min/max stats,
  * but a table sorted by ONE column has useless stats for every OTHER
  * column — a two-dimensional box filter still scans everything. Z-ordering
  * gives every clustered dimension locality simultaneously (each file owns a
  * hyper-rectangle of the key space) — the layout technique Delta/Iceberg
  * expose as OPTIMIZE ZORDER, built here from plain Column bit math:
  * codegen'd, no UDF, and the only shuffle is the one range partitioning any
  * re-layout pays.
  *
  * Engine-neutral bucket arithmetic: `floor((x-lo)*2^bits / span)` with the
  * product kept ≤ 2^53 so both multiplicands and the product are exact
  * doubles; the IEEE quotient of two exact doubles is identical in every
  * engine, and the explicit floor() avoids the cast-rounding split (Spark's
  * long cast truncates, DuckDB's rounds). Morton construction is the public
  * textbook one: bit j of dimension i lands at position `j * numDims + i`.
  */
object Layout {

  /** Bucket `c` into [0, 2^bits) by linear scaling between the (column)
    * bounds `lo`/`hi` — bounds typically come from one broadcast 1-row agg
    * ([[withBounds]]) or are domain constants at production scale. */
  def rangeBucket(c: Column, lo: Column, hi: Column, bits: Int): Column = {
    require(bits >= 1 && bits <= 20, s"bits in [1,20], got $bits")
    val buckets = 1L << bits
    val span = (hi.cast("long") - lo.cast("long") + lit(1L)).cast("double")
    val scaled = floor((c.cast("long") - lo.cast("long")).cast("double") *
      lit(buckets.toDouble) / span).cast("long")
    least(lit(buckets - 1), greatest(lit(0L), scaled))
  }

  /** Morton-interleave pre-bucketed dimensions (each already in
    * [0, 2^bits)): bit j of dims(i) → position j*k + i of the z-value.
    * Unrolled to k*bits codegen'd OR terms; k*bits ≤ 60 keeps the z-value
    * in a Long. */
  def interleave(dims: Seq[Column], bits: Int): Column = {
    val k = dims.size
    require(k >= 1, "at least one dimension")
    require(k * bits <= 60, s"k*bits = ${k * bits} exceeds Long z-value")
    val terms = for {
      j <- 0 until bits
      i <- 0 until k
    } yield shiftleft(shiftright(dims(i), j).bitwiseAND(lit(1L)), j * k + i)
    terms.foldLeft(lit(0L))((acc, t) => acc.bitwiseOR(t))
  }

  /** Attach per-dimension `__lo_d`/`__hi_d` bound columns from ONE 1-row
    * min/max aggregate, broadcast — the bounds pass reads only the dim
    * columns (column pruning), so it is cheap even on a wide table. */
  def withBounds(df: DataFrame, dims: Seq[String]): DataFrame = {
    val aggs = dims.flatMap(d => Seq(
      min(col(d)).cast("long").as(s"__lo_$d"),
      max(col(d)).cast("long").as(s"__hi_$d")))
    df.crossJoin(broadcast(df.agg(aggs.head, aggs.tail: _*)))
  }

  /** Z-value column over `dims` of a frame prepared by [[withBounds]]. */
  def zvalue(dims: Seq[String], bits: Int): Column =
    interleave(dims.map(d =>
      rangeBucket(col(d), col(s"__lo_$d"), col(s"__hi_$d"), bits)), bits)

  /** Re-layout `df` clustered by the z-order of `dims` into `numFiles`
    * output files: one range shuffle on the z-value (range partitioning
    * keeps the curve contiguous per file — hash partitioning would scatter
    * it) plus an intra-partition sort so parquet row-group stats are tight
    * within each file too. Returns the frame to write; caller picks the
    * sink. */
  def zorderFrame(df: DataFrame, dims: Seq[String], bits: Int,
      numFiles: Int): DataFrame = {
    require(numFiles >= 1, s"numFiles >= 1, got $numFiles")
    val cols = df.columns
    withBounds(df, dims)
      .withColumn("__z", zvalue(dims, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .select(cols.map(col): _*)
  }

  /** Cell-occupancy summary (the oracle surface): rows per coarse z-cell
    * (z-value shifted down `dropBits`) with the min/max of each raw
    * dimension inside the cell — evidence each cell's rows span a bounded
    * hyper-rectangle, i.e. exactly the min/max stats a file holding that
    * cell would publish for BOTH dimensions. */
  def zcellSummary(df: DataFrame, dims: Seq[String], bits: Int,
      dropBits: Int): DataFrame = {
    val aggs = dims.flatMap { d =>
      Seq(min(col(d)).cast("long").as(s"min_$d"),
        max(col(d)).cast("long").as(s"max_$d"))
    }
    withBounds(df, dims)
      .withColumn("zcell", shiftright(zvalue(dims, bits), dropBits))
      .groupBy(col("zcell"))
      .agg(count(lit(1)).as("n_rows"), aggs: _*)
      .orderBy(col("zcell"))
  }

  /** DuckDB-side bucket expression — the same floor/least/greatest shape as
    * [[rangeBucket]], with `lo`/`hi` as arbitrary SQL expressions. */
  def rangeBucketSql(x: String, lo: String, hi: String, bits: Int): String = {
    val buckets = 1L << bits
    s"least(${buckets - 1}, greatest(0, CAST(floor((CAST(($x) - ($lo) AS " +
      s"DOUBLE) * $buckets.0) / CAST(($hi) - ($lo) + 1 AS DOUBLE)) AS " +
      "BIGINT)))"
  }

  /** DuckDB-side interleave over pre-bucketed BIGINT column names —
    * textually unrolled to the same k*bits OR terms [[interleave]] emits,
    * so the oracle replays the Morton code bit-exactly. */
  def interleaveSql(names: Seq[String], bits: Int): String = {
    val k = names.size
    val terms = for {
      j <- 0 until bits
      i <- 0 until k
    } yield s"(((${names(i)} >> $j) & 1) << ${j * k + i})"
    terms.mkString("(", " | ", ")")
  }
}
