package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import graft.functions.TextOps

/** Dedup-on-arrival for streaming corpus ingestion: drop any document whose
  * normalized-text fingerprint has already been seen — ACROSS microbatches —
  * before it reaches the sink. A batch-side `dropDuplicates` inside
  * `foreachBatch` only dedups within one microbatch; cross-batch dedup must
  * live on the streaming plan, where Structured Streaming keeps one state
  * row per distinct fingerprint.
  *
  * State sizing at scale: unbounded mode keeps every fingerprint forever
  * (right for a bounded backfill or a keyed store where re-puts are
  * idempotent anyway); pass an event-time watermark to bound state to the
  * lateness horizon via `dropDuplicatesWithinWatermark` — the standard
  * "duplicates arrive close together" contract of at-least-once transports.
  * Near-dup (MinHash/SimHash) streaming dedup is deliberately absent: its
  * candidate join needs the full corpus index, which is the batch repush
  * path's job ([[graft.operators.Dedup]]), not per-record streaming state.
  */
object StreamDedup {

  /** Keep the FIRST arrival of each exact-duplicate text (same normalized
    * fingerprint as [[graft.operators.Dedup.exact]], so streaming and batch
    * dedup agree on identity). `watermark = Some((tsCol, delay))` bounds
    * the fingerprint state to the watermark horizon.
    */
  def exact(rows: DataFrame, textCol: String = "text",
      watermark: Option[(String, String)] = None): DataFrame = {
    val fp = rows.withColumn("__fp", TextOps.fingerprint(col(textCol)))
    val deduped = watermark match {
      case Some((tsCol, delay)) =>
        fp.withWatermark(tsCol, delay).dropDuplicatesWithinWatermark("__fp")
      case None => fp.dropDuplicates("__fp")
    }
    deduped.drop("__fp")
  }
}
