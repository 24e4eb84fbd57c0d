package graft.core

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

/** DaVinci-style embedded client: the subscribed slice of a store
  * materialized into driver-process memory, so point reads are O(1)
  * hash-map lookups with NO Spark job on the read path — the reference's
  * sub-millisecond local-read contract (reference intent:
  * clients/da-vinci-client/.../DaVinciClient.java — subscribeAll /
  * subscribe(partitions), reads served from the node-local
  * materialization; semantics, not code).
  *
  * Memory is bounded the way the reference bounds it: SUBSCRIPTION.
  * `buckets = Some(...)` pins only those bucket directories' keys (Venice
  * partition subscription — a 100-TB store stays readable on one host by
  * subscribing to the partitions assigned to it); an unrestricted
  * subscription refuses to materialize more than `maxRows` rows unless the
  * cap is raised explicitly, mirroring the guard on the exact all-pairs
  * cosine baseline.
  *
  * Consistency is the reference's: EVENTUAL. `get` serves the materialized
  * state with no synchronous freshness check — that is what makes it
  * sub-millisecond. `isFresh` costs two metadata file reads; `refresh()`
  * re-materializes iff the store's change coordinate moved (version swap,
  * put/delete/update, repush, rebucket, rollback — every one bumps it).
  * Pass `autoRefreshMs >= 0` to piggyback the staleness check on reads at
  * most once per interval (the Venice shape: ingestion updates the local
  * replica asynchronously while reads keep serving).
  *
  * A `get` for a key routing outside the subscribed buckets throws — the
  * reference's non-local-read error, not a silent miss. Bucket routing is
  * evaluated against the bucket count captured at materialization time, so
  * a rebucket is picked up on the next refresh (staleness, not wrongness:
  * the thrown message says which). */
final class DaVinciClient private[core] (engine: GraftEngine, name: String,
    buckets: Option[Seq[Int]], maxRows: Int, autoRefreshMs: Long,
    asOfTs: Option[Long] = None,
    transform: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame
      = identity) {

  private val keyCols: Seq[String] = engine.storeMeta(name).keyCols
  // None = all buckets (subscribeAll); Some(set) = partition subscription.
  // Mutated only under `synchronized` by subscribe/unsubscribe.
  @volatile private var subscribed: Option[Set[Int]] = buckets.map(_.toSet)

  // state swapped atomically on refresh; reads never lock
  @volatile private var state: DaVinciClient.State = _
  @volatile private var lastCheckNanos = 0L

  refreshNow()

  /** O(1) in-process point read of the FULL row (key + value columns).
    * None = key absent (or tombstoned) in the materialized state. */
  def get(key: Seq[Any]): Option[Row] = {
    maybeAutoRefresh()
    val s = state
    subscribed.foreach { bs =>
      val b = GraftEngine.bucketHashOf(key, s.nBuckets)
      if (!bs.contains(b)) throw new IllegalStateException(
        s"key ${key.mkString("|")} routes to bucket $b of ${s.nBuckets}, " +
          s"outside this client's subscription $bs — subscribe to it or " +
          "use GraftEngine.get (Venice: non-local reads are errors, not " +
          "misses)")
    }
    Option(s.table.get(DaVinciClient.render(key)))
  }

  /** Batch of [[get]]s (one staleness check, not one per key). */
  def batchGet(keys: Seq[Seq[Any]]): Map[Seq[Any], Option[Row]] = {
    maybeAutoRefresh()
    keys.map(k => k -> get(k)).toMap
  }

  /** Number of materialized rows (subscribed slice only). */
  def size: Int = state.table.size()

  /** True iff the materialized state reflects the store's current change
    * coordinate (two metadata file reads, no scan). A seekable client
    * pinned at a past instant is always fresh — the past is immutable. */
  def isFresh: Boolean =
    asOfTs.isDefined || state.coord == engine.latestCoordinate(name)

  /** Re-materialize iff the change coordinate moved. Returns true when a
    * re-materialization happened; a pinned as-of client never does. */
  def refresh(): Boolean = synchronized {
    if (isFresh) false else { refreshNow(); true }
  }

  // ---- reference interface parity (DaVinciClient.java: subscribe /
  // unsubscribe / getPartitionCount; semantics, not code) -------------------

  /** Number of buckets (the reference's getPartitionCount). */
  def partitionCount: Int = state.nBuckets

  /** Ingest MORE buckets into the local materialization (the reference's
    * subscribe(Set<Integer>) — additive). No-op buckets are fine; a client
    * opened with subscribeAll stays all-subscribed. Pays one slice scan. */
  def subscribe(more: Seq[Int]): Unit = synchronized {
    subscribed = subscribed.map(_ ++ more)
    refreshNow()
  }

  /** Drop buckets from the subscription AND their local state — a pure
    * in-process map filter, NO Spark job (the reference drops the local
    * partitions' data the same way). */
  def unsubscribe(fewer: Seq[Int]): Unit = synchronized {
    val s = state
    val drop = fewer.toSet
    subscribed = Some(
      subscribed.getOrElse((0 until s.nBuckets).toSet) -- drop)
    val table = new java.util.HashMap[String, org.apache.spark.sql.Row](s.table)
    table.keySet.removeIf(k =>
      drop.contains(GraftEngine.bucketHashOf(Seq(k), s.nBuckets)))
    state = s.copy(table = table)
  }

  /** Drop everything (the reference's unsubscribeAll). */
  def unsubscribeAll(): Unit = synchronized {
    subscribed = Some(Set.empty)
    state = state.copy(
      table = new java.util.HashMap[String, org.apache.spark.sql.Row]())
  }

  // ---- local read-compute (the reference serves compute() from the local
  // replica too — DaVinciComputeTest; same null/mismatch semantics as the
  // engine's ComputeBuilder/VectorOps, checked differentially in
  // DaVinciSpec) -------------------------------------------------------------

  /** Venice dotProduct: None = key absent OR null/empty vector (the SQL
    * null); Some(0.0) on length mismatch — VectorOps.dotProduct exactly. */
  def dotProduct(key: Seq[Any], field: String,
      param: Seq[Double]): Option[Double] =
    DaVinciClient.dotProductOf(get(key), field, param)

  /** Venice cosineSimilarity — same null/mismatch contract as dotProduct. */
  def cosineSimilarity(key: Seq[Any], field: String,
      param: Seq[Double]): Option[Double] =
    DaVinciClient.cosineSimilarityOf(get(key), field, param)

  /** Venice hadamardProduct: None on key-absent / null / mismatch. */
  def hadamardProduct(key: Seq[Any], field: String,
      param: Seq[Double]): Option[Seq[Double]] =
    DaVinciClient.hadamardProductOf(get(key), field, param)

  /** Venice count: collection size, null field → −1 (CountOperator's error
    * default); None only when the key is absent. */
  def countElements(key: Seq[Any], field: String): Option[Long] =
    DaVinciClient.countElementsOf(get(key), field)

  private def maybeAutoRefresh(): Unit = {
    if (autoRefreshMs < 0 || state == null) return
    val now = System.nanoTime()
    if (now - lastCheckNanos >= autoRefreshMs * 1000000L) {
      lastCheckNanos = now
      refresh()
      ()
    }
  }

  private def refreshNow(): Unit = {
    val coord = engine.latestCoordinate(name)
    val nb = engine.numBuckets(name)
    val view0 = asOfTs match {
      case Some(t) => engine.servingViewAsOf(name, t)
      case None => engine.servingView(name)
    }
    // record-transformer hook (reference intent:
    // DaVinciRecordTransformer.java — records transformed during local
    // ingestion, the mechanism the DuckDB integration rides; semantics,
    // not code). Keys must survive the transform — routing needs them.
    val view = transform(view0)
    keyCols.foreach(k => require(view.columns.contains(k),
      s"transform dropped key column $k — the local replica cannot route"))
    val sliced = subscribed match {
      case Some(bs) =>
        // shared null-safe rendering: must agree with bucketHashOf, or a
        // null-component key lands in a bucket its reads never probe
        val keyExpr = graft.functions.HashOps.renderKey(keyCols)
        view.filter(graft.functions.HashOps.partitionId(keyExpr, nb)
          .isin(bs.toSeq: _*))
      case None => view
    }
    // limit(maxRows + 1) bounds driver memory in ONE job: if the extra row
    // comes back the slice is over budget and nothing oversized was kept
    val rows = sliced.limit(maxRows + 1).collect()
    if (rows.length > maxRows) throw new IllegalArgumentException(
      s"store $name's subscribed slice exceeds maxRows=$maxRows — " +
        "subscribe to fewer buckets (Venice partition subscription), use " +
        "GraftEngine.daVinciDistributed (cluster-memory residency, " +
        "bucket-pruned reads) for stores past one host's budget, or " +
        "raise maxRows explicitly for a deliberately large local replica")
    val idx = rows.headOption.map(r => keyCols.map(r.fieldIndex))
      .getOrElse(Nil)
    val table = new java.util.HashMap[String, Row](rows.length * 2)
    rows.foreach { r =>
      table.put(DaVinciClient.render(idx.map(r.get)), r)
    }
    state = DaVinciClient.State(coord, nb, table)
  }
}

object DaVinciClient {
  private[core] final case class State(coord: ChangeCoordinate, nBuckets: Int,
    table: java.util.HashMap[String, Row])

  /** Driver-side key rendering — the same `String.valueOf` join
    * [[GraftEngine.bucketHashOf]] uses, so lookup and routing agree. */
  private[core] def render(key: Seq[Any]): String =
    key.map(String.valueOf).mkString("|")

  // ---- the local read-compute math, SHARED by the embedded and
  // distributed clients so "same compute through both" is true by
  // construction (same null/mismatch semantics as ComputeBuilder/
  // VectorOps, checked differentially in DaVinciSpec) ------------------------

  private def vecOf(row: Option[Row], field: String)
      : Option[Option[Seq[Double]]] =
    row.map { r =>
      val i = r.fieldIndex(field)
      if (r.isNullAt(i)) None
      else {
        val xs = r.getSeq[Any](i).map {
          case n: java.lang.Number => n.doubleValue()
          case other => other.toString.toDouble
        }
        if (xs.isEmpty) None else Some(xs)
      }
    }

  private[core] def dotProductOf(row: Option[Row], field: String,
      param: Seq[Double]): Option[Double] =
    vecOf(row, field).flatMap {
      case None => None
      case Some(v) if v.length != param.length => Some(0.0)
      case Some(v) => Some(v.lazyZip(param).map(_ * _).sum)
    }

  private[core] def cosineSimilarityOf(row: Option[Row], field: String,
      param: Seq[Double]): Option[Double] =
    vecOf(row, field).flatMap {
      case None => None
      case Some(v) if v.length != param.length => Some(0.0)
      case Some(v) =>
        val dot = v.lazyZip(param).map(_ * _).sum
        val n2 = v.map(x => x * x).sum * param.map(x => x * x).sum
        Some(dot / math.sqrt(n2))
    }

  private[core] def hadamardProductOf(row: Option[Row], field: String,
      param: Seq[Double]): Option[Seq[Double]] =
    vecOf(row, field).flatMap {
      case Some(v) if v.length == param.length =>
        Some(v.lazyZip(param).map(_ * _))
      case _ => None
    }

  private[core] def countElementsOf(row: Option[Row],
      field: String): Option[Long] =
    row.map { r =>
      val i = r.fieldIndex(field)
      if (r.isNullAt(i)) -1L else r.getSeq[Any](i).length.toLong
    }
}

/** The 100×-scale DaVinci mode: the serving view resident in CLUSTER memory
  * (executor storage via `persist()`), not a driver-local hash map — the
  * path for stores past any single host's subscription budget.
  *
  * The embedded [[DaVinciClient]] is the reference's sub-millisecond
  * in-process contract and is bounded by subscription (`maxRows`); this
  * sibling trades per-read latency (one Spark job per batchGet, ~ms on a
  * warm cluster) for UNBOUNDED store size: memory is the cluster's, each
  * executor holds its partitions' slice, and reads prune to the probed
  * buckets.
  *
  * Pruning mechanics (why a read is O(corpus/buckets), not O(corpus)): the
  * materialized frame is RANGE-repartitioned on (bucket id, rendered key) —
  * bucket ids are dense ints, so the sampled ranges align ~1:1 with bucket
  * values and every cached partition holds a tight contiguous bucket range
  * (hash-repartitioning would collide arbitrary buckets per partition and
  * widen the stats) — then sorted within partitions, so each in-memory
  * batch carries tight min/max (bucket, key) stats. The `__bucket IN (...)`
  * filter of a probe skips non-matching batches at the InMemoryTableScan
  * level before any key comparison runs. The fold (snapshot ∪ log merge) is
  * paid ONCE at materialization, like the embedded client.
  *
  * Freshness is the same eventual contract: [[refresh]] re-materializes iff
  * the store's change coordinate moved. */
final class DistributedDaVinci private[core] (engine: GraftEngine,
    name: String) {
  import org.apache.spark.sql.DataFrame
  import org.apache.spark.sql.functions._

  private val keyCols: Seq[String] = engine.storeMeta(name).keyCols
  private val probeBucket = "__probe_bucket"
  private val probeKey = "__probe_key"
  @volatile private var state: (ChangeCoordinate, Int, DataFrame) = _

  materialize()

  private def materialize(): Unit = {
    val coord = engine.latestCoordinate(name)
    val nb = engine.numBuckets(name)
    // null-safe rendering shared with the driver-side bucketHashOf twin —
    // a bare concat_ws would drop null key components and the probe's
    // wanted-set (String.valueOf → "null") could never match such a row
    val keyExpr = graft.functions.HashOps.renderKey(keyCols)
    // the rendered key is MATERIALIZED (not recomputed per probe) and each
    // partition is sorted on it, so every cached batch carries a tight
    // min/max key range — a probe's equality filter skips non-matching
    // batches on stats alone, the in-memory analog of key-sorted parquet
    // row groups. repartitionByRange (bucket ids are dense ints, so the
    // sampled ranges align ~1:1 with bucket values) keeps each cached
    // partition's bucket range tight — hash-repartitioning on the bucket
    // id would collide several buckets per partition (Murmur3(b) % nb is
    // not identity) and widen every partition's min/max
    val frame = engine.servingView(name)
      .withColumn(probeKey, keyExpr)
      .withColumn(probeBucket,
        graft.functions.HashOps.partitionId(col(probeKey), nb))
      .repartitionByRange(nb, col(probeBucket), col(probeKey))
      .sortWithinPartitions(col(probeBucket), col(probeKey))
      .persist()
    frame.count() // pay the fold once, eagerly, like the embedded client
    val prev = state
    state = (coord, nb, frame)
    if (prev != null) prev._3.unpersist()
  }

  /** Rows resident in cluster memory. */
  def size: Long = state._3.count()

  def isFresh: Boolean = state._1 == engine.latestCoordinate(name)

  /** Re-materialize iff the change coordinate moved. */
  def refresh(): Boolean = synchronized {
    if (isFresh) false else { materialize(); true }
  }

  /** Point read: ONE Spark job over the probed bucket's cached batches. */
  def get(key: Seq[Any]): Option[Row] = batchGet(Seq(key))(key)

  /** The probe plan pre-collect — exposed for plan pins: it must read the
    * CACHED frame (InMemoryTableScan), never re-touch parquet. */
  private[graft] def probeFrame(keys: Seq[Seq[Any]]): DataFrame = {
    val (_, nb, frame) = state
    val buckets = keys.map(GraftEngine.bucketHashOf(_, nb)).distinct
    val wanted = keys.map(DaVinciClient.render).toSet
    frame
      .filter(col(probeBucket).isin(buckets.map(Integer.valueOf): _*))
      .filter(col(probeKey).isin(wanted.toSeq: _*))
      .drop(probeBucket, probeKey)
  }

  /** Batch point reads: one job, pruned to the probed buckets' partitions
    * (batch-stats skip), result O(batch) on the driver. */
  def batchGet(keys: Seq[Seq[Any]]): Map[Seq[Any], Option[Row]] = {
    val hits = probeFrame(keys).collect()
    val idx = hits.headOption.map(r => keyCols.map(r.fieldIndex))
      .getOrElse(Nil)
    val found = hits.map(r =>
      DaVinciClient.render(idx.map(r.get)) -> r).toMap
    keys.map(k => k -> found.get(DaVinciClient.render(k))).toMap
  }

  // ---- embedded-client parity: the distributed path is a drop-in past the
  // memory budget, so it serves the same local compute and partial-key
  // surface — same math ([[DaVinciClient]] shares it), cached-frame reads
  // (no parquet re-scan) ------------------------------------------------------

  /** Venice dotProduct over the cached state — contract identical to
    * [[DaVinciClient.dotProduct]] (the math is shared). */
  def dotProduct(key: Seq[Any], field: String,
      param: Seq[Double]): Option[Double] =
    DaVinciClient.dotProductOf(get(key), field, param)

  def cosineSimilarity(key: Seq[Any], field: String,
      param: Seq[Double]): Option[Double] =
    DaVinciClient.cosineSimilarityOf(get(key), field, param)

  def hadamardProduct(key: Seq[Any], field: String,
      param: Seq[Double]): Option[Seq[Double]] =
    DaVinciClient.hadamardProductOf(get(key), field, param)

  def countElements(key: Seq[Any], field: String): Option[Long] =
    DaVinciClient.countElementsOf(get(key), field)

  /** Partial-key lookup over the CACHED frame — [[GraftEngine.partialKeyGet]]
    * contract (prefix must be the leading key components), served from
    * cluster memory: no single-bucket routing exists (buckets hash the FULL
    * key), but the per-partition sort on the rendered key gives the scan
    * tight batch stats on the leading component, so non-matching batches
    * skip on min/max — and the plan stays InMemoryTableScan-only. */
  def partialKeyGet(prefix: Map[String, Any]): DataFrame = {
    val lead = keyCols.take(prefix.size)
    require(lead.toSet == prefix.keySet,
      s"partial key ${prefix.keySet} must be the leading prefix of $keyCols")
    // null-safe <=> (not ===): GraftEngine.partialKeyGet matches null
    // prefix components, and the drop-in contract must too — a bare ===
    // would vacuously return zero rows for a null prefix value
    prefix.foldLeft(state._3) { case (df, (k, v)) =>
      df.filter(col(k) <=> lit(v))
    }.drop(probeBucket, probeKey)
  }

  /** Release the cluster-memory residency. */
  def close(): Unit = state._3.unpersist()
}
