package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Watermarked event-time window aggregation for streaming pipelines —
  * the nearline counterpart of the batch `groupBy(bucket)` rollups.
  *
  * Semantics (reference: venice's nearline aggregation happens after
  * serving-side resolution, so its "windowed" consumers are client-built;
  * here the engine provides it natively on Structured Streaming):
  *   - event-time windows aligned to the epoch (pure integer arithmetic on
  *     the internal microsecond value — no timezone dependence);
  *   - a watermark bounds state: a window's aggregate is emitted exactly
  *     once, when the watermark passes its end (append mode), and rows
  *     arriving after their window was finalized are DROPPED, not merged —
  *     the property that makes the emitted aggregates immutable facts a
  *     downstream consumer can append-only ingest.
  *
  * At scale the plan is the one you want: partial aggregation before the
  * shuffle on (window, keys), state store partitioned the same way, no
  * driver-side accumulation. Draining a bounded backlog emits every closed
  * window; the tail windows close when the next run's data (or a sentinel
  * beyond max+delay, see the `stream_window_agg` query) advances the
  * watermark.
  */
object StreamWindow {

  /** Hour-windowed (or any-duration) keyed aggregation with a watermark.
    *
    * @param stream  streaming DataFrame with an event-time column
    * @param tsCol   TimestampType event-time column name
    * @param delay   watermark delay, e.g. "1 hour" — rows older than
    *                max(ts) − delay are late; windows older than that are
    *                final
    * @param window  window duration, e.g. "1 hour" (tumbling)
    * @param keys    grouping keys alongside the window
    * @param aggs    aggregate columns (first is mandatory for .agg's shape)
    * @return streaming DataFrame keyed by `bucket_ms` (window start, epoch
    *         millis — integer-stable across engines) + keys + aggregates
    */
  /** @param slide  slide duration for overlapping (sliding) windows; None =
    *               tumbling. With slide, each row lands in window/slide
    *               windows — the "trending over the last 2h, refreshed
    *               hourly" shape; emit-once/drop-late semantics unchanged
    *               (each overlapping window is its own state row, finalized
    *               when the watermark passes ITS end). */
  def windowedAgg(stream: DataFrame, tsCol: String, delay: String,
      window: String, keys: Seq[String], aggs: Seq[Column],
      slide: Option[String] = None): DataFrame = {
    require(aggs.nonEmpty, "windowedAgg needs at least one aggregate")
    val win = slide match {
      case Some(sl) => org.apache.spark.sql.functions.window(col(tsCol), window, sl)
      case None     => org.apache.spark.sql.functions.window(col(tsCol), window)
    }
    val agged = stream
      .withWatermark(tsCol, delay)
      .groupBy(win +: keys.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .withColumn("bucket_ms", unix_millis(col("window.start")))
      .drop("window")
    agged.select(col("bucket_ms") +:
      agged.columns.filterNot(_ == "bucket_ms").map(col).toSeq: _*)
  }
}
