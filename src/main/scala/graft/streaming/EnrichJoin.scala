package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{broadcast, col}
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.GraftEngine

/** Stream enrichment by store lookup — the Venice stream-processor
  * pattern (a nearline job issuing `client.batchGet` for each batch of
  * events it processes; reference semantics:
  * `clients/venice-thin-client/.../AbstractAvroStoreClient.java:143-144`
  * batchGet + missing-key-omitted contract, re-expressed engine-side) as
  * one Structured Streaming query instead of per-row RPCs.
  *
  * Every microbatch re-resolves the store's CURRENT serving view, so a
  * version swap or an RT write landing between batches is visible to the
  * next batch — exactly what a point-reading stream job observes, and the
  * property a cached static-side join plan would silently lose.
  *
  * Scale shape per microbatch: the batch's distinct keys broadcast INTO
  * the store scan (the batchGet left-semi, pruning the store map-side),
  * then the hit set — no larger than the batch's key set — broadcasts
  * back onto the batch for a left join that keeps missing-key events with
  * null enrichment (the negative-index marker of R11). The store is never
  * shuffled and the batch never leaves its executors, at any store size.
  */
object EnrichJoin {

  /** Batch-level core: left-enrich `batch` with the store's value columns.
    * `keyMap` maps batch column → store key column (all store key columns
    * must be covered). Store key columns are dropped from the output; the
    * batch's own columns all pass through. */
  def enrich(engine: GraftEngine, store: String, batch: DataFrame,
      keyMap: Seq[(String, String)]): DataFrame = {
    val meta = engine.storeMeta(store)
    require(keyMap.map(_._2).toSet == meta.keyCols.toSet,
      s"keyMap must cover the store key columns ${meta.keyCols.mkString(",")}")
    val keys = batch
      .select(keyMap.map { case (b, k) => col(b).as(k) }: _*).distinct()
    val hits = broadcast(engine.batchGet(store, keys))
    if (keyMap.forall { case (b, k) => b == k })
      batch.join(hits, keyMap.map(_._1), "left")
    else {
      val cond = keyMap.map { case (b, k) => batch(b) === hits(k) }
        .reduce(_ && _)
      keyMap.map(_._2).foldLeft(batch.join(hits, cond, "left"))(_ drop _)
    }
  }

  /** Streaming driver: enrich every microbatch against the live store and
    * append to `outDir`. `finish` shapes the enriched batch (projection /
    * aliases) before the write. Drains the available backlog and stops
    * (AvailableNow) — restart with the same checkpoint to process new
    * files, re-resolving the store as of that run. */
  def enrichStream(engine: GraftEngine, store: String, stream: DataFrame,
      keyMap: Seq[(String, String)], outDir: String, checkpoint: String,
      finish: DataFrame => DataFrame = identity): StreamingQuery =
    stream.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        finish(enrich(engine, store, batch, keyMap))
          .write.mode("append").parquet(outDir)
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
}
