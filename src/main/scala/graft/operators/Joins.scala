package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Join shapes Spark's optimizer has no native operator for.
  *
  * As-of join (backward): attach to each left row the single most recent
  * right row for the same key with right.ts ≤ left.ts — the canonical
  * "state at event time" lookup (feature value as of a label's timestamp,
  * last heartbeat before an error, price in effect at order time).
  *
  * The naive relational spelling is a non-equi range join
  * (`l.k = r.k AND r.ts <= l.ts` + a per-row argmax), which Spark plans as
  * a broadcast nested loop or a sort-merge with an n·m within-key blowup.
  * This implementation never builds the range: tag each side, union, ONE
  * shuffle on the key, sort within key by (ts, side) with right rows
  * ordered before coincident left rows (at-or-before includes equality),
  * and carry the latest right payload forward with a running
  * `last(ignoreNulls)` frame. Cost is a single keyed shuffle + in-partition
  * sort — the same shape at 100 TB, with the usual keyed-window caveat that
  * one pathologically hot key serializes within its partition.
  */
object Joins {

  /** @param left     probe side; all its columns pass through
    * @param right    state side; must be UNIQUE per (keyCols, rightTs) —
    *                 pre-aggregate with e.g. [[Compaction.latestPerKey]],
    *                 otherwise coincident right rows make the match
    *                 engine-dependent (this is asserted per-key-ts at plan
    *                 level by construction: duplicates would carry whichever
    *                 sorted last, so we require the caller to dedup)
    * @param keyCols  equi-join keys
    * @param leftTs / rightTs  event-time columns (any ordered type; both
    *                 sides are compared on the SAME unioned column)
    * @param payload  right columns to attach (null when no right row is
    *                 at-or-before the left row)
    */
  def asOfBackward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, payload, forward = false)

  /** Forward variant: the EARLIEST right row with right.ts ≥ left.ts —
    * "next maintenance window", "first purchase after signup". Same plan,
    * sorted descending. */
  def asOfForward(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String]): DataFrame =
    asOf(left, right, keyCols, leftTs, rightTs, payload, forward = true)

  private def asOf(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, rightTs: String, payload: Seq[String],
      forward: Boolean): DataFrame = {
    require(payload.nonEmpty, "asOfBackward needs at least one payload column")
    val leftCols = left.columns.toSeq
    require(payload.forall(right.columns.contains),
      s"payload ${payload.mkString(",")} must exist on the right side")
    val pay = payload.map(p => s"__pay_$p")

    // right rows: side 0 (sort before coincident left rows), payload kept,
    // left columns nulled; left rows: side 1, payload nulled
    val r = right.select(
      keyCols.map(col) ++ Seq(col(rightTs).as("__ts"), lit(0).as("__side")) ++
        payload.map(p => col(p).as(s"__pay_$p")): _*)
    val l = left.select(
      keyCols.map(col) ++ Seq(col(leftTs).as("__ts"), lit(1).as("__side")) ++
        leftCols.filterNot(keyCols.contains).map(col): _*)
    val unioned = l.unionByName(r, allowMissingColumns = true)

    val tsOrder = if (forward) col("__ts").desc else col("__ts").asc
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(tsOrder, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = pay.foldLeft(unioned) { (df, p) =>
      df.withColumn(p, last(col(p), ignoreNulls = true).over(w))
    }
    carried.filter(col("__side") === 1)
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__pay_$p").as(s"asof_$p")): _*)
  }

  /** Salted equi-join for skewed keys: the standard 100-TB mitigation when
    * the build side is too large to broadcast AND the probe side's join-key
    * distribution is heavily skewed (a handful of hot keys own most rows —
    * exactly what [[graft.Queries]]' `skew_profile` measures pre-flight).
    *
    * A plain shuffle join on such a key sends every row of a hot key to ONE
    * reducer: the job runs as slow as its hottest key, or OOMs. Salting
    * splits each key's rows across `salts` sub-partitions:
    *
    *  - probe side: `__salt = pmod(xxhash64(saltBy), salts)` — derived from
    *    a caller-supplied per-row column (an id, offset, anything uniform),
    *    NOT from rand(), so the plan stays deterministic and re-runnable;
    *  - build side: each row explodes to ALL `salts` replicas (bounded,
    *    small × salts);
    *  - join on (keys, __salt) — a hot key now occupies `salts` reducers.
    *
    * The join is pinned to sort-merge (`hint("merge")`): size-based
    * broadcast would silently defeat the salt in local tests while the
    * real deployment's build side exceeds the broadcast threshold, and SMJ
    * is the spill-safe choice at scale. AQE's skew-join split handles
    * mild skew at runtime; explicit salting remains the contract when one
    * key alone exceeds what a single reducer can sort.
    *
    * Result set is identical to `big.join(small, keyCols)` — the salt
    * column never leaves the operator. Inner join only (an outer variant
    * would emit one null-match per salt replica).
    */
  def saltedJoin(big: DataFrame, small: DataFrame, keyCols: Seq[String],
      saltBy: org.apache.spark.sql.Column, salts: Int): DataFrame = {
    require(salts > 1, s"salts must be > 1, got $salts")
    val b = big.withColumn("__salt", pmod(xxhash64(saltBy), lit(salts)))
    val s = small.withColumn("__salt",
      explode(sequence(lit(0L), lit(salts - 1L))))
    b.join(s.hint("merge"), keyCols :+ "__salt").drop("__salt")
  }

  /** Interval (range) containment join: emit every (left row, right
    * interval) pair with the same key and startCol ≤ ts ≤ endCol.
    *
    * Spark plans the naive `BETWEEN` predicate as a broadcast nested loop
    * (or worse); the scale spelling bins time: each interval explodes to
    * the bins it overlaps (bounded by interval-length / binSize + 1), each
    * left row has exactly ONE bin, and the join becomes a plain equi-join
    * on (key, bin) + an exact containment filter. No row is ever matched
    * twice — the left side owns one bin — so no dedup pass is needed.
    *
    * @param binSize bin width in the ts column's own units; choose ≳ the
    *                typical interval length so intervals explode to ~2 bins
    * @param payload right-side columns to carry (prefixed `range_`)
    *
    * Intervals with endCol < startCol are dropped (an inverted interval
    * contains nothing; letting it through would make `sequence()` count
    * DOWN and match everything).
    */
  def rangeJoin(left: DataFrame, right: DataFrame, keyCols: Seq[String],
      leftTs: String, startCol: String, endCol: String, binSize: Long,
      payload: Seq[String]): DataFrame = {
    require(binSize > 0, s"binSize must be positive, got $binSize")
    require(payload.nonEmpty, "rangeJoin needs at least one payload column")
    val leftCols = left.columns.toSeq
    val lb = left.withColumn("__bin",
      floor(col(leftTs).cast("long") / binSize).cast("long"))
    val rb = right
      .filter(col(endCol) >= col(startCol))
      .select(keyCols.map(col) ++
        Seq(col(startCol).cast("long").as("__s"),
          col(endCol).cast("long").as("__e")) ++
        payload.map(p => col(p).as(s"__pay_$p")): _*)
      .withColumn("__bin", explode(sequence(
        floor(col("__s") / binSize).cast("long"),
        floor(col("__e") / binSize).cast("long"))))
    lb.join(rb, keyCols :+ "__bin")
      .filter(col(leftTs).cast("long").between(col("__s"), col("__e")))
      .select(leftCols.map(col) ++
        payload.map(p => col(s"__pay_$p").as(s"range_$p")): _*)
  }
}
