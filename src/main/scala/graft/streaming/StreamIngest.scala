package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{StreamingQuery, Trigger}
import graft.core.GraftEngine

/** Streaming ingestion — the Spark-native leader/follower analog (S1–S5).
  *
  * Venice shape (reference, not code): a StoreIngestionTask consumes the RT
  * topic, resolves conflicts, and persists (StoreIngestionTask.java:5228-5530
  * dispatch); hybrid stores replay `rewindTimeInSeconds` of RT data onto a
  * fresh batch version (HybridStoreConfig.java); consumers read the change
  * log with seek-by-timestamp (VeniceChangelogConsumer.java:34-166); user
  * transformers hook the ingest path (DaVinciRecordTransformer.java:45-100).
  *
  * Spark shape: one Structured Streaming query per store. Each microbatch
  * appends PUT/DELETE rows to the store's upsert log (the log IS the change
  * stream); the serving view merges it lazily, so "ingestion" is just
  * durable, ordered log appends — no per-record state, no driver loops.
  * Leader election is the Spark driver's job ownership — Helix is out of
  * scope by design (SURVEY §2.4 S1).
  */
object StreamIngest {

  /** Column carrying the event-time used for conflict resolution. */
  val EventTsCol = "__event_ts_ms"

  /** Start the ingest query for a store: every microbatch lands in the
    * store's log with LWW timestamps, optionally through a user transformer
    * (S5). `rows` must carry the store's value columns + [[EventTsCol]]. */
  def ingest(engine: GraftEngine, store: String, rows: DataFrame,
      transformer: DataFrame => DataFrame = identity,
      checkpoint: String): StreamingQuery = {
    rows.writeStream
      .option("checkpointLocation", checkpoint)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        // ONE log append per microbatch, per-row event time carried as the
        // conflict-resolution timestamp — no driver-side collect, no
        // per-ts writes (per-ms event times would otherwise mean per-row
        // round-trips and thousands of tiny files). Active-active stores
        // route through the CRDT op log (per-field resolution downstream),
        // plain hybrid stores through the LWW upsert log.
        if (engine.isActiveActive(store))
          engine.putAA(store, transformer(batch), col(EventTsCol))
        else
          engine.put(store, transformer(batch), col(EventTsCol))
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
  }

  /** [[ingest]] from an external topic through the [[TopicSource]] seam
    * (B2): the topic presents its records as a streaming DataFrame and the
    * ingest path is IDENTICAL from there — one log append per microbatch,
    * A/A auto-routing, transformer hook. A real deployment passes
    * [[KafkaTopicSource]]; in-env and replication flows pass
    * [[FileTopicSource]]. */
  def ingestFrom(engine: GraftEngine, store: String, source: TopicSource,
      checkpoint: String,
      transformer: DataFrame => DataFrame = identity): StreamingQuery =
    ingest(engine, store, source.stream(engine.spark), transformer,
      checkpoint)

  /** S2: hybrid rewind — on version swap, re-feed the last `rewindMs` of the
    * log onto the (new) current version. Venice's TopicSwitch replay. */
  def rewind(engine: GraftEngine, store: String, nowMs: Long,
      rewindMs: Long): DataFrame =
    engine.changelog(store, nowMs - rewindMs)

  /** S2 with the STORE's persisted rewind window
    * (StoreConfig.rewindSeconds — HybridStoreConfig.java:17's
    * rewindTimeInSeconds lives on the store record, so every ingest job
    * replays the same window). */
  def rewind(engine: GraftEngine, store: String, nowMs: Long): DataFrame =
    rewind(engine, store, nowMs,
      engine.storeConfig(store).rewindSeconds * 1000L)

  /** S4: the CDC stream — a streaming read of the store's upsert log.
    * Seek-to-timestamp = a filter on the log's ts column (checkpointing is
    * Structured Streaming's file-source offset log). */
  def changelogStream(spark: SparkSession, engine: GraftEngine,
      store: String, sinceTsMs: Long = 0L): DataFrame = {
    val logDir = s"${engine.root}/$store/log"
    val schema = spark.read.parquet(logDir).schema
    spark.readStream.schema(schema).parquet(logDir)
      .filter(col(GraftEngine.TsCol) >= sinceTsMs)
  }

  /** S3: readiness gate — a replica serves once its lag is under threshold
    * (Venice gates the version swap on follower lag). A terminated query is
    * trivially caught up; an active one must have no data available AND its
    * last completed microbatch must have drained zero rows — the status
    * flag alone flips true between the source buffering data and the batch
    * that processes it. */
  def isCaughtUp(q: StreamingQuery): Boolean = isCaughtUp(q, maxOffsetLag = 0L)

  /** S3 thresholded readiness, offset-lag strategy (HybridStoreConfig.java:
    * 17-19 — offsetLagThresholdToGoOnline): the replica may serve while the
    * un-consumed source position is within `maxOffsetLag` of the latest,
    * instead of demanding an exact drain. A query that has produced no
    * progress yet is NOT ready (unknown lag ≠ zero lag). */
  def isCaughtUp(q: StreamingQuery, maxOffsetLag: Long): Boolean =
    !q.isActive || {
      !q.status.isDataAvailable && Option(q.lastProgress).exists(
        _.sources.forall(s =>
          s.latestOffset == null ||
            offsetPos(s.latestOffset) - offsetPos(s.endOffset) <= maxOffsetLag))
    }

  /** First integer inside a source-offset JSON (file source:
    * {"logOffset":N}); MinValue when absent so an unparseable latest reads
    * as "not ready", never as caught up. */
  private def offsetPos(o: String): Long =
    Option(o).flatMap("""-?\d+""".r.findFirstIn).map(_.toLong)
      .getOrElse(Long.MinValue)

  /** S3 time-lag strategy (producerTimestampLagThresholdToGoOnline): ready
    * when the newest conflict-resolution timestamp durably ingested is
    * within `maxTimeLagMs` of `nowMs`. A store with no log yet has ingested
    * nothing — infinitely behind. */
  def isCaughtUpByTime(engine: GraftEngine, store: String,
      maxTimeLagMs: Long, nowMs: Long): Boolean =
    latestIngestedTs(engine, store)
      .exists(ts => nowMs - ts <= maxTimeLagMs)

  /** Newest event-time the store has durably applied (max log ts). */
  def latestIngestedTs(engine: GraftEngine, store: String): Option[Long] =
    scala.util.Try(engine.changelog(store, 0L)).toOption
      .flatMap(df => Option(df.agg(max(col(GraftEngine.TsCol))).head().get(0))
        .map(_.asInstanceOf[Long]))

  /** The gated version swap: Venice refuses to swap a hybrid version until
    * the replica's lag is under threshold (VersionBackend
    * .isPartitionReadyToServe semantics). Returns the new version, or None
    * — with nothing consumed or swapped — while the store lags. */
  def swapIfCaughtUp(engine: GraftEngine, store: String,
      maxTimeLagMs: Long, nowMs: Long): Option[Int] =
    if (isCaughtUpByTime(engine, store, maxTimeLagMs, nowMs))
      Some(engine.repush(store))
    else None

  /** Gated swap with the STORE's persisted lag threshold
    * (StoreConfig.lagThresholdMs — the producer-timestamp go-online
    * strategy read from the store record, so two operators gating the same
    * store apply the same bar). */
  def swapIfCaughtUp(engine: GraftEngine, store: String,
      nowMs: Long): Option[Int] =
    swapIfCaughtUp(engine, store,
      engine.storeConfig(store).lagThresholdMs, nowMs)
}
