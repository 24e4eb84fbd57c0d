package graft.sources

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{Column, DataFrame, GraftColumnBridge}
import org.apache.spark.sql.execution.streaming.Sink
import org.apache.spark.sql.functions._
import graft.core.GraftEngine

/** `df.writeStream.format("graft")` — the nearline-producer surface for
  * vanilla Spark sessions (reference semantics, not code: Venice's nearline
  * writers produce PUT/DELETE messages onto the store's RT topic and the
  * ingestion task applies them with per-record conflict-resolution
  * timestamps; VeniceSystemProducer is the Samza-side shape). Here every
  * microbatch lands as ONE atomic log append, so the query IS the producer
  * and the upsert log IS the topic — no graft API anywhere in user code:
  *
  * {{{
  *   events.writeStream.format("graft")
  *     .option("root", "/stores").option("store", "user_profile")
  *     .option("tsColumn", "event_ts")        // per-row LWW timestamp
  *     .option("checkpointLocation", cp).start()
  * }}}
  *
  * Options: `tsColumn` (per-row event-time column, the streaming-ingest
  * shape) or `tsMs` (a fixed stamp); neither → a wall-clock stamp chosen
  * once per batch id and PERSISTED before the append, so a crash-window
  * replay re-applies the identical timestamp (see below).
  * `deleteColumn` names a boolean column routing rows to tombstones —
  * puts and deletes of one microbatch commit atomically on LWW stores
  * (`GraftEngine.applyCdc`), and route through the CRDT op log on
  * active-active stores.
  *
  * Delivery: EXACTLY-ONCE onto the log. The sink records the last committed
  * batch id per streaming query (`_stream_commits/<queryId>`, atomic
  * rename), so a microbatch replayed after a crash-before-checkpoint is
  * skipped rather than re-appended. The window between a durable append and
  * the commit-file rename re-applies at most one batch — and that replay is
  * value-identical in EVERY timestamp mode (same keys, same timestamps,
  * same LWW outcome): `tsColumn`/`tsMs` are deterministic by construction,
  * and the wall-clock default records its per-batch stamp durably before
  * the append and reuses it on replay. Strictly stronger than the
  * reference's at-least-once nearline contract.
  *
  * Scale: the sink body is two metadata file reads plus the engine's
  * one-shuffle-free log append per microbatch; state is O(1) per query
  * (one batch id), never O(rows). */
final case class GraftStreamSink(root: String, store: String,
    options: Map[String, String]) extends Sink {

  override def name(): String = s"graft-sink:$root/$store"

  override def addBatch(batchId: Long, data: DataFrame): Unit = {
    val spark = data.sparkSession
    val engine = new GraftEngine(spark, root)
    // queryId is stable across restarts (it lives in the checkpoint), so it
    // keys the commit record; a direct addBatch call outside a streaming
    // query (tests, manual replay) shares the "adhoc" slot
    val qid = Option(spark.sparkContext
      .getLocalProperty("sql.streaming.queryId")).getOrElse("adhoc")
    val commitDir = Paths.get(root, store, "_stream_commits")
    val commitFile = commitDir.resolve(qid)
    val lastCommitted =
      if (Files.exists(commitFile)) Files.readString(commitFile).trim.toLong
      else -1L
    if (batchId <= lastCommitted) return // replayed microbatch — already durable

    // the incoming frame is bound to this microbatch's IncrementalExecution;
    // rebind it over the same planned rows so the engine's writers (which
    // re-select, conform and repartition) plan it as an ordinary batch
    val batch = GraftColumnBridge.rebatch(data)
    val tsCol: Column = options.get("tscolumn").map(col)
      .orElse(options.get("tsms").map(t => lit(t.toLong)))
      .getOrElse {
        // wall-clock default, made replay-deterministic: the stamp chosen
        // for a batch id is persisted (atomic rename) BEFORE the append, so
        // the at-most-one-replayed-batch crash window re-applies the SAME
        // timestamp — value-identical rows, an idempotent LWW outcome —
        // instead of a fresh now() that silently re-orders ties
        val stampFile = commitDir.resolve(s"$qid.ts")
        val recorded = if (Files.exists(stampFile))
          Files.readString(stampFile).trim.split(":", 2) match {
            case Array(b, t) if b.toLong == batchId => Some(t.toLong)
            case _ => None
          }
        else None
        val stamp = recorded.getOrElse {
          val now = System.currentTimeMillis()
          Files.createDirectories(commitDir)
          val tmp = commitDir.resolve(s"$qid.ts.tmp")
          Files.writeString(tmp, s"$batchId:$now")
          Files.move(tmp, stampFile, StandardCopyOption.REPLACE_EXISTING,
            StandardCopyOption.ATOMIC_MOVE)
          now
        }
        lit(stamp)
      }
    options.get("deletecolumn") match {
      case None =>
        if (engine.isActiveActive(store)) engine.putAA(store, batch, tsCol)
        else engine.put(store, batch, tsCol)
      case Some(d) =>
        if (engine.isActiveActive(store)) {
          // CRDT ops are commutative — two appends need no atomicity; the
          // tombstone frame keeps every non-flag column so a tsColumn
          // event time rides along (delete ops ignore value payloads)
          engine.putAA(store, batch.filter(!col(d)).drop(d), tsCol)
          engine.deleteAA(store, batch.filter(col(d)).drop(d), tsCol)
        } else engine.applyCdc(store, batch, tsCol, col(d))
    }
    Files.createDirectories(commitDir)
    val tmp = commitDir.resolve(s"$qid.tmp")
    Files.writeString(tmp, batchId.toString)
    Files.move(tmp, commitFile, StandardCopyOption.REPLACE_EXISTING,
      StandardCopyOption.ATOMIC_MOVE)
  }
}
