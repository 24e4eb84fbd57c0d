package graft.operators

import org.apache.spark.sql.{DataFrame, Encoders, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Sequence packing for training-data pipelines: lay every document's
  * tokens end-to-end in one deterministic global order and cut fixed-length
  * training sequences, so each document knows exactly which sequences it
  * lands in (the manifest a packed-dataset writer needs).
  *
  * The core primitive is an EXACT prefix sum over a total order. The naive
  * Spark spelling — `Window.orderBy(key)` with no partitionBy — collapses
  * the whole table into ONE partition and dies at scale. This one never
  * materializes a global window:
  *
  *   1. range-shuffle on the order key + sort within partitions (the only
  *      wide operation over the data);
  *   2. one streaming pass per partition for the LOCAL running sum —
  *      genuine per-partition imperative state, the documented
  *      mapPartitions exception;
  *   3. per-partition totals (one tiny aggregate, #partitions rows) →
  *      cumulative base offsets on the driver → broadcast-joined back.
  *
  * At 100 TB the data crosses the network once; driver state is
  * O(#partitions). The result is invariant to where the range boundaries
  * land, so sampling nondeterminism in the range partitioner cannot change
  * the answer.
  */
object Packing {

  /** Adds `start_offset`: the exact sum of `weightCol` over all rows
    * strictly before this one in ascending `orderCol` order. `orderCol`
    * must be unique (ties would make "before" ambiguous across engines);
    * null weights count as 0.
    */
  def withGlobalOffsets(df: DataFrame, orderCol: String, weightCol: String,
      numParts: Int = 0): DataFrame =
    withGlobalOffsetsAndTotal(df, orderCol, weightCol, numParts)._1

  /** [[withGlobalOffsets]] plus the exact grand total of `weightCol`. The
    * total is the last cumulative of the per-partition sums this pass
    * already collects to compute base offsets, so a caller that needs it
    * (e.g. the negative sampler's draw-modulo range) skips a separate
    * counting job over the data (guide §1.2 — one fewer pass). */
  def withGlobalOffsetsAndTotal(df: DataFrame, orderCol: String,
      weightCol: String, numParts: Int = 0): (DataFrame, Long) = {
    val spark = df.sparkSession
    val parts =
      if (numParts > 0) numParts else spark.sessionState.conf.numShufflePartitions
    val ranged = df
      .withColumn("__w", coalesce(col(weightCol).cast(LongType), lit(0L)))
      .repartitionByRange(parts, col(orderCol))
      .sortWithinPartitions(col(orderCol))
      .withColumn("__pid", spark_partition_id())
    val schema = ranged.schema.add("__local_off", LongType, nullable = false)
    val wIdx = ranged.schema.fieldIndex("__w")
    val local = ranged.mapPartitions { it =>
      var acc = 0L
      it.map { r =>
        val out = Row.fromSeq(r.toSeq :+ acc)
        acc += r.getLong(wIdx)
        out
      }
    }(Encoders.row(schema))
    // consumed twice (per-partition totals now, the caller's action later);
    // localCheckpoint over persist so the blocks free with the plan instead
    // of leaking in a long-lived session
    val cached = local.localCheckpoint()
    val scanned = cached.groupBy(col("__pid"))
      .agg(sum(col("__w")).as("__psum"))
      .collect()
      .map(r => (r.getInt(0), r.getLong(1)))
      .sortBy(_._1)
      .scanLeft((0, 0L, 0L)) { case ((_, _, running), (pid, s)) =>
        (pid, running, running + s)
      }
    val total = scanned.lastOption.map(_._3).getOrElse(0L)
    val bases = scanned.drop(1).map { case (pid, base, _) => (pid, base) }
    val baseDf = spark.createDataFrame(bases.toIndexedSeq).toDF("__pid", "__base")
    val out = cached.join(broadcast(baseDf), Seq("__pid"))
      .withColumn("start_offset", col("__base") + col("__local_off"))
      .drop("__pid", "__base", "__local_off", "__w")
    (out, total)
  }

  /** Deterministic global training order ("corpus shuffle"): every row gets
    * the exact 0-based position it holds when the corpus is ordered by a
    * seeded md5 of its id, plus the shard that position lands in — the
    * manifest an epoch writer needs to emit shuffled shards in parallel.
    *
    * Ordering by a cryptographic hash IS the shuffle (uniform, seed-keyed,
    * reproducible across runs/partitionings); the position comes from the
    * same two-phase distributed prefix sum as sequence packing, so there is
    * never a single-partition global window. The md5 is suffixed with the
    * id to keep the order key unique even under hash collision.
    *
    * @param idCol   unique row id (cast to string for hashing)
    * @param seed    epoch seed — different seeds give independent orders
    * @param shardSize rows per output shard (> 0)
    */
  def globalShuffleOrder(df: DataFrame, idCol: String, seed: Long,
      shardSize: Long, numParts: Int = 0): DataFrame = {
    require(shardSize > 0, s"shardSize must be positive, got $shardSize")
    val ord = concat(
      md5(concat_ws("-", lit(seed.toString), col(idCol).cast("string"))),
      lit("-"), col(idCol).cast("string"))
    withGlobalOffsets(
      df.withColumn("__shuffle_ord", ord).withColumn("__one", lit(1L)),
      "__shuffle_ord", "__one", numParts)
      .withColumnRenamed("start_offset", "position")
      .withColumn("shard", expr(s"position div ${shardSize}L"))
      .drop("__shuffle_ord", "__one")
  }

  /** Packs weighted rows into fixed-length sequences of `seqLen` tokens:
    * each row gets its global `start_offset` plus the first/last sequence
    * index it touches and how many sequences it spans. Zero-weight rows
    * occupy no sequence (`n_seqs` 0, null first/last).
    */
  def packSequences(df: DataFrame, orderCol: String, weightCol: String,
      seqLen: Long, numParts: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = col(weightCol).cast(LongType)
    val first = col("start_offset") - pmod(col("start_offset"), lit(seqLen))
    val last = (col("start_offset") + w - 1) -
      pmod(col("start_offset") + w - 1, lit(seqLen))
    withGlobalOffsets(df, orderCol, weightCol, numParts)
      .withColumn("first_seq", when(w > 0, (first / seqLen).cast(LongType)))
      .withColumn("last_seq", when(w > 0, (last / seqLen).cast(LongType)))
      .withColumn("n_seqs",
        when(w > 0, col("last_seq") - col("first_seq") + 1).otherwise(lit(0L)))
  }

  /** Per-sequence loss-mask spans for packed training data: explodes the
    * [[packSequences]] layout into one row per (sequence, document) overlap
    * — the attention-reset / loss-mask metadata a trainer consumes so
    * cross-document attention inside a packed sequence can be masked
    * (each span is `[start_in_seq, start_in_seq + span_len)` of `seq_id`,
    * owned by `doc_id`). Pure integer interval intersection over the
    * already-computed offsets; the explode is bounded by `n_seqs` per doc
    * (≈ n_tok/seqLen + 1), so output size tracks corpus tokens / seqLen —
    * embarrassingly parallel, no extra shuffle past the packing's own. */
  def packMaskSpans(df: DataFrame, orderCol: String, weightCol: String,
      seqLen: Long, numParts: Int = 0): DataFrame = {
    val packed = packSequences(df, orderCol, weightCol, seqLen, numParts)
    packed.filter(col("n_seqs") > 0)
      .select(col(orderCol), col("start_offset"), col(weightCol).cast(LongType).as("__w"),
        explode(expr("sequence(first_seq, last_seq)")).as("seq_id"))
      .withColumn("__seq_base", col("seq_id") * seqLen)
      .withColumn("start_in_seq",
        greatest(col("start_offset") - col("__seq_base"), lit(0L)))
      .withColumn("span_len",
        least(col("start_offset") + col("__w") - col("__seq_base"), lit(seqLen))
          - col("start_in_seq"))
      .select(col("seq_id"), col(orderCol), col("start_in_seq"), col("span_len"))
  }

  /** The dual of packing: splits each document's token sequence into
    * fixed-size context windows of `chunkLen` tokens starting every
    * `stride` tokens (overlap = chunkLen − stride when stride < chunkLen).
    * Chunk starts are 0, stride, 2·stride, …; a chunk never starts at or
    * past the document's end, so an n-token doc yields ⌊(n−1)/stride⌋ + 1
    * chunks and the last one may be short. Empty docs emit nothing.
    *
    * Scale shape: tokenize → bounded explode, embarrassingly parallel —
    * no shuffle; each task's output is its input share × the overlap
    * factor chunkLen/stride.
    */
  def chunkTokens(docs: DataFrame, idCol: String, textCol: String,
      chunkLen: Int, stride: Int): DataFrame = {
    require(chunkLen > 0, s"chunkLen must be positive, got $chunkLen")
    require(stride > 0, s"stride must be positive, got $stride")
    docs
      .select(col(idCol), graft.functions.TextOps.tokens(col(textCol)).as("__toks"))
      .withColumn("__n", size(col("__toks")))
      .filter(col("__n") > 0)
      .select(col(idCol), col("__toks"),
        explode(sequence(lit(0), expr(s"(__n - 1) div $stride").cast("int")))
          .as("chunk_no"))
      .withColumn("__c",
        slice(col("__toks"), col("chunk_no") * stride + 1, lit(chunkLen)))
      .select(col(idCol), col("chunk_no"),
        size(col("__c")).as("n_tokens"),
        array_join(col("__c"), " ").as("chunk_text"))
  }

  /** WHOLE-DOC sequence packing (no cross-document splits): pack pieces
    * into fixed-`seqLen` bins such that a bin only ever holds pieces of
    * ONE length — `⌊seqLen/ℓ⌋` pieces per bin — so no piece is ever cut
    * across a sequence boundary. The padding-based alternative to
    * [[packSequences]]' concat-and-cut layout, used when cross-document
    * attention contamination is unacceptable and attention masks are
    * expensive; length-bucketing is the standard deterministic
    * approximation of bin packing (first-fit-decreasing is inherently
    * sequential — this is order-free and exactly replayable).
    *
    * Scale shape: the rank within each length group does NOT use a
    * `Window.partitionBy(len)` — at 100 TB one length value can hold
    * billions of rows and a window partition is one task. Instead the
    * global two-phase prefix sum ([[withGlobalOffsets]]) orders by
    * (len, id) — rows of equal length are contiguous in that order, so
    * rank-in-group = global position − the group's min position (one
    * ≤seqLen-row aggregate, broadcast back). Everything stays distributed.
    *
    * @param idCol unique NON-NEGATIVE INTEGRAL piece id (zero-padded into
    *              the order key); rows with weight outside [1, seqLen]
    *              are dropped (chunk long docs first, e.g. [[chunkTokens]])
    * @return one row per packed piece: id, n_tokens, bin capacity
    *         (pieces of this length per bin), bin_no within the length
    *         class, slot within the bin */
  def packBinsWholeDoc(df: DataFrame, idCol: String, weightCol: String,
      seqLen: Long, numParts: Int = 0): DataFrame = {
    require(seqLen > 0, s"seqLen must be positive, got $seqLen")
    val w = col(weightCol).cast(LongType)
    val rows = df.filter(w >= 1 && w <= seqLen)
      .select(col(idCol), w.as("n_tokens"))
      .withColumn("__ord", concat(
        lpad(col("n_tokens").cast("string"), 10, "0"), lit("-"),
        lpad(col(idCol).cast("string"), 19, "0")))
      .withColumn("__one", lit(1L))
    val pos = withGlobalOffsets(rows, "__ord", "__one", numParts)
    val g0 = pos.groupBy(col("n_tokens"))
      .agg(min(col("start_offset")).as("__g0"))
    pos.join(broadcast(g0), Seq("n_tokens"))
      .withColumn("__rk", col("start_offset") - col("__g0"))
      .withColumn("per_bin", expr(s"${seqLen}L div n_tokens"))
      .select(col(idCol), col("n_tokens"), col("per_bin"),
        expr("__rk div per_bin").as("bin_no"),
        pmod(col("__rk"), col("per_bin")).as("slot"))
  }

  /** Training-data export: the corpus as JSONL shard files plus a
    * deterministic manifest. Shard assignment is md5-keyed on the id
    * (order/partition-independent — the same contract as dataset splits:
    * an export re-run on re-partitioned data lands every doc in the SAME
    * shard, so downstream loaders can cache by shard). One narrow pass +
    * a partitioned text write; the manifest is a partial-aggregated
    * groupBy whose counts/id-sums pin the exact shard membership.
    *
    * Writes `outDir/shard=K/part-*.txt` (one JSON object per line) and
    * returns the manifest frame (shard, n_docs, id_sum) — the artifact a
    * training job's data loader consumes first. The manifest is built by
    * READING the shard files back from `outDir` (partition-discovered
    * `shard` column + the id parsed out of each JSON line), so its hash
    * covers the artifact actually on disk — a misrouted partition or a
    * dropped task output breaks the manifest, not just the plan. */
  def exportJsonl(df: DataFrame, idCol: String, outDir: String,
      numShards: Int): DataFrame = {
    require(numShards > 0, "exportJsonl needs a positive shard count")
    df.withColumn("shard",
        graft.functions.TextOps.splitBucket(col(idCol)) % numShards)
      .select(col("shard"),
        to_json(struct(df.columns.map(col): _*)).as("value"))
      .write.mode("overwrite").partitionBy("shard").text(outDir)
    df.sparkSession.read.text(outDir)
      .select(col("shard").cast("int").as("shard"),
        get_json_object(col("value"), s"$$.$idCol").cast("long").as("__id"))
      .groupBy(col("shard"))
      .agg(count(lit(1)).as("n_docs"), sum(col("__id")).as("id_sum"))
      .orderBy(col("shard"))
  }
}
