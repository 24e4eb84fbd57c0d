package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Event-time interval join between two streams — the attribution shape
  * (every right-side event within [left ts, left ts + window] of a
  * matching left event, e.g. click-through attribution of impressions).
  *
  * Venice's nearline consumers do this client-side against serving-time
  * lookups; here it is a first-class Structured Streaming operator
  * (semantics, not code — there is no reference implementation to port:
  * stream-stream joins are native Spark).
  *
  * Scale/semantics properties:
  *   - both inputs carry a watermark and the join condition carries the
  *     time range on the RAW event-time columns, so Spark's state store
  *     can evict rows once the watermark passes their last possible match
  *     — bounded state at any input rate;
  *   - state is shuffle-partitioned on the join keys (the same hash both
  *     sides), so matching is local to a partition;
  *   - inner-join results emit as soon as both sides arrive (no window
  *     close-out needed); input older than the watermark is DROPPED — the
  *     property the `stream_join` oracle pins end-to-end with a planted
  *     late row.
  */
object StreamJoin {

  /** Attribution join: rows of `right` within `[leftTs, leftTs + windowMs]`
    * of a matching `left` row on equal `keys`.
    *
    * Except for `keys`, the two sides' column names must be disjoint
    * (rename before calling — the query does); the output carries the left
    * columns then the right's non-key columns.
    */
  /** `joinType` "inner" (default) or "left_outer". Outer semantics: an
    * unmatched left row is emitted with nulls for the right columns ONLY
    * when the watermark passes its last possible match and its state
    * evicts — the unmatched verdict is final by construction, never a
    * guess that a match "probably" won't arrive. */
  def intervalJoin(left: DataFrame, right: DataFrame, keys: Seq[String],
      leftTs: String, rightTs: String, windowMs: Long,
      delay: String, joinType: String = "inner"): DataFrame = {
    val l = left.withWatermark(leftTs, delay).alias("l")
    val r = right.withWatermark(rightTs, delay).alias("r")
    val keyCond = keys.map(k => col(s"l.$k") === col(s"r.$k")).reduce(_ && _)
    // raw timestamp comparisons (not unix_millis projections): this is the
    // form Spark's streaming planner recognizes as a state-cleanup range
    val timeCond = col(s"r.$rightTs") >= col(s"l.$leftTs") &&
      col(s"r.$rightTs") <= col(s"l.$leftTs") +
        expr(s"INTERVAL ${windowMs / 1000} SECONDS")
    val joined = l.join(r, keyCond && timeCond, joinType)
    val rightCols = right.columns.filterNot(keys.contains)
    joined.select(
      keys.map(k => col(s"l.$k")) ++
        left.columns.filterNot(keys.contains).map(c => col(s"l.$c")) ++
        rightCols.map(c => col(s"r.$c")): _*)
  }
}
