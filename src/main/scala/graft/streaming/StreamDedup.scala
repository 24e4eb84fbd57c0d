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
  * Near-dup (MinHash) streaming dedup does NOT live in streaming state —
  * its candidate index is corpus-sized and must outlive the query — it
  * rides the store-backed LSH index instead ([[nearDupPairs]]: probe the
  * store, then index the batch into it).
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

  /** Near-dup candidate detection ON ARRIVAL against a store-backed LSH
    * index ([[graft.operators.Dedup.lshIndexFrame]] layout): every
    * microbatch (1) probes the store for band collisions with everything
    * indexed by PRIOR batches (bucket-pruned batchGet point reads — no
    * corpus scan), (2) self-joins its own band rows for intra-batch
    * collisions, then (3) APPENDS its band rows to the index as A/A
    * set-union element-adds. `emit` receives the batch's normalized
    * candidate pairs (id_a < id_b) and MUST materialize them (it runs
    * before the index append, so a batch never probes itself).
    *
    * The emitted pair SET is microbatch-boundary- and arrival-order-
    * INVARIANT: a band-sharing pair is caught exactly once — by the probe
    * when its members land in different batches (the earlier member is
    * indexed by then), by the self-join when they land together. So the
    * drain of a corpus equals the batch band join over that corpus,
    * whatever the trigger/file slicing did — the property the
    * `stream_neardup` oracle pins.
    *
    * Delivery: index maintenance is idempotent (set-union of elements), so
    * crash replays never corrupt the index; `emit` is foreachBatch-grade
    * at-least-once — dedup downstream (the oracled query reads pairs back
    * through a distinct) or write through an idempotent sink.
    *
    * Scale: per-batch work is O(batch shingles + band-key point reads);
    * the corpus appears only as the store, which grows by appended band
    * rows and is compacted by the engine's normal repush path. */
  def nearDupPairs(rows: DataFrame, engine: graft.core.GraftEngine,
      store: String, idCol: String, textCol: String,
      k: Int = 8, bands: Int = 4, shingleN: Int = 3)(
      emit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Dedup
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val sh = Dedup.shingleSets(batch, idCol, textCol, shingleN)
        val br = Dedup.bandRows(sh, k, bands).persist()
        probeEmitIndex(br, engine, store, batchId, emit)
        br.unpersist(); sh.unpersist()
      }
      ()
    }
  }

  /** EMBEDDING near-dup candidates on arrival — the semantic twin of
    * [[nearDupPairs]]: band rows come from the deterministic md5
    * hyperplane codes ([[graft.operators.Similarity.hyperplaneBandRows]],
    * the `lshCosinePairs` geometry) instead of MinHash over shingles, so
    * no quantizer training is needed and the index geometry is stable from
    * the first arrival. Identical store layout, probe/self-join/append
    * discipline, invariance and delivery contract as the text path. */
  def nearDupPairsEmbedding(rows: DataFrame, engine: graft.core.GraftEngine,
      store: String, idCol: String, vecCol: String, dim: Int,
      bitsPerBand: Int = 12, bands: Int = 8)(
      emit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Similarity
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val br = Similarity.hyperplaneBandRows(batch, idCol, vecCol, dim,
          bitsPerBand, bands).persist()
        probeEmitIndex(br, engine, store, batchId, emit)
        br.unpersist()
      }
      ()
    }
  }

  /** Shared probe→emit→append body over (bandkey, id) band rows: probe the
    * store for collisions with prior batches (bucket-pruned point reads),
    * self-join the batch's own rows, emit normalized pairs, THEN index the
    * batch (so a batch never probes itself) — see [[nearDupPairs]] for the
    * full invariance/delivery contract. */
  private def probeEmitIndex(br: DataFrame, engine: graft.core.GraftEngine,
      store: String, batchId: Long,
      emit: (DataFrame, Long) => Unit): Unit = {
    val hits = engine.batchGet(store,
      br.select(col("bandkey")).distinct())
    val cross = br.join(hits, "bandkey")
      .select(col("id"), explode(col("ids")).as("other"))
    val intra = br.as("l").join(br.as("r"),
        col("l.bandkey") === col("r.bandkey") &&
          col("l.id") < col("r.id"))
      .select(col("r.id").as("id"), col("l.id").as("other"))
    val pairs = cross.unionByName(intra)
      .select(least(col("id"), col("other")).as("id_a"),
        greatest(col("id"), col("other")).as("id_b"))
      .distinct()
    emit(pairs, batchId) // materializes BEFORE the batch is indexed
    engine.addToSetAA(store, br.select(col("bandkey"), col("id")),
      "ids", "id", tsMs = batchId)
  }

  /** DECONTAMINATION on arrival: every arriving training document is
    * scored against a STATIC benchmark-shingle index before it can enter
    * the corpus (the streaming twin of
    * [[graft.operators.Dedup.contamination]] — same shingle identity, same
    * best-match rule, so a drain's union over microbatches equals the
    * batch decontamination of the same corpus).
    *
    * Unlike [[nearDupPairs]] the index is read-only: the eval set doesn't
    * grow with arrivals, so there is no append step and no cross-batch
    * state at all — each batch explodes its distinct shingles, point-reads
    * the eval-posting store (bucket-pruned batchGet; the probe is
    * O(batch shingles), never O(eval set)), counts per-(train, eval)
    * intersections, normalizes by the tiny eval-size store (broadcast),
    * and emits one row per arriving doc — zero-hit docs included at
    * overlap 0.0.
    *
    * @param evalIndexStore store keyed by `sh` with `ids: array<long>` —
    *        the eval docs containing that shingle
    * @param evalSizeStore  store keyed by `eval_id` with `n_eval: long` —
    *        each eval doc's distinct-shingle count */
  def contaminationOnArrival(rows: DataFrame, engine: graft.core.GraftEngine,
      evalIndexStore: String, evalSizeStore: String, idCol: String,
      textCol: String, shingleN: Int = 3, minOverlap: Double = 0.5)(
      emit: (DataFrame, Long) => Unit): org.apache.spark.sql.streaming.DataStreamWriter[org.apache.spark.sql.Row] = {
    import graft.operators.Dedup
    rows.writeStream.foreachBatch { (batch: DataFrame, batchId: Long) =>
      if (!batch.isEmpty) {
        val sh = Dedup.shingleSets(batch, idCol, textCol, shingleN).persist()
        val posts = sh.select(col("id").as("train_id"),
          explode(col("shingles")).as("sh"))
        val hits = engine.batchGet(evalIndexStore,
          posts.select(col("sh")).distinct())
        val inter = posts.join(hits, "sh")
          .select(col("train_id"), explode(col("ids")).as("eval_id"))
          .groupBy("train_id", "eval_id").agg(count(lit(1)).as("inter"))
        val overlaps = inter.join(
            broadcast(engine.servingView(evalSizeStore)), "eval_id")
          .withColumn("overlap", col("inter").cast("double") / col("n_eval"))
        val w = org.apache.spark.sql.expressions.Window
          .partitionBy(col("train_id"))
          .orderBy(col("overlap").desc, col("eval_id"))
        val best = overlaps
          .withColumn("__rn", row_number().over(w)).filter(col("__rn") === 1)
          .select(col("train_id"), col("eval_id"),
            round(col("overlap"), 6).as("overlap"))
        val out = sh.select(col("id").as("train_id"))
          .join(best, Seq("train_id"), "left")
          .select(col("train_id"), col("eval_id"),
            coalesce(col("overlap"), lit(0.0)).as("overlap"),
            (coalesce(col("overlap"), lit(0.0)) >= minOverlap)
              .as("contaminated"))
        emit(out, batchId)
        sh.unpersist()
      }
      ()
    }
  }
}
