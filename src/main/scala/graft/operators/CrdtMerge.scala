package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** W7: field-level replication-metadata (RMD) CRDT merge — the active-active
  * conflict resolver with per-field timestamps and per-element collection
  * timestamps.
  *
  * Reference semantics (NOT code): MergeConflictResolver.java:204-255
  * (per-field UPDATE merge), SortBasedCollectionFieldOpHandler (collection
  * fields: top-level put timestamp + per-element add/remove timestamps,
  * observed-remove flavor), AbstractMerge.java (LWW + deterministic value
  * tie-break), CollectionRmdTimestamp (RMD shape).
  *
  * Model here: a key's state is a struct of value fields plus an RMD
  * sibling:
  *  - scalar field f  → rmd ts long; LWW on (ts, value-string) — the string
  *    compare stands in for Venice's unsigned serialized-byte compare.
  *  - array field f   → {topTs, active:[(elem,ts)], deleted:[(elem,ts)]};
  *    an element is live iff its ts ≥ topTs (newer than the last full put)
  *    and ts > its delete ts (delete wins ties). Tombstones older than
  *    topTs are GC'd.
  *
  * The state join is commutative, associative and idempotent (max/union
  * lattice), so merging is order-independent — replicas/regions can fold
  * events in any order and converge, which is exactly the A/A guarantee.
  * CrdtMergeSpec property-tests this via permuted folds.
  *
  * Implementation: pure column expressions (no UDFs). Per-element max uses
  * `map_from_entries(array_sort(entries))` under LAST_WIN dedup — set by
  * GraftSession — so the later (= max-ts) entry per element survives.
  */
object CrdtMerge {

  /** RMD schema for a value schema: f_ts for scalars, f_rmd for arrays
    * (per-element add/remove ts) and maps (per-entry put/remove-key ts). */
  def rmdSchema(value: StructType): StructType = StructType(value.fields.map {
    case StructField(n, _: ArrayType, _, _) =>
      StructField(s"${n}__rmd", StructType(Seq(
        StructField("topTs", LongType),
        StructField("active", ArrayType(elemTs)),
        StructField("deleted", ArrayType(elemTs)))))
    case StructField(n, _: MapType, _, _) =>
      StructField(s"${n}__rmd", StructType(Seq(
        StructField("topTs", LongType),
        StructField("active", ArrayType(entryTs)),
        StructField("deleted", ArrayType(elemTs)))))
    case StructField(n, _, _, _) => StructField(s"${n}__ts", LongType)
  })

  val elemTs: StructType = StructType(Seq(
    StructField("elem", StringType), StructField("ts", LongType)))

  /** Map-entry RMD record. Field order (key, ts, value) is load-bearing:
    * `array_sort` orders entries per key by ts then value-string, so the
    * LAST_WIN map-dedup keeps the max-(ts, value) entry — LWW per entry
    * with the same deterministic tie-break as scalars. */
  val entryTs: StructType = StructType(Seq(
    StructField("key", StringType), StructField("ts", LongType),
    StructField("value", StringType)))

  /** Array-field lattice merge over a BAG of add/remove entries (any number
    * of states' entries concatenated) — the single source of truth for
    * element-level semantics, shared by the pairwise [[joinStates]] and the
    * batch [[partialStates]] fold. Equivalent to pairwise folding because
    * per-element max-ts is associative and the liveness/GC filters are
    * monotone in topTs (an entry dropped early could never survive the
    * final filter). */
  private def mergedArray(f: StructField, topTs: Column, actRaw: Column,
      delRaw: Column): Seq[Column] = {
    val actEntries = array_sort(actRaw)
    val delEntries = array_sort(delRaw)
    // LAST_WIN after (elem, ts) sort ⇒ max ts per element
    val actMap = map_from_entries(
      transform(actEntries, e =>
        struct(e.getField("elem").as("key"), e.getField("ts").as("value"))))
    val delMap = map_from_entries(
      transform(delEntries, e =>
        struct(e.getField("elem").as("key"), e.getField("ts").as("value"))))
    val live = filter(map_entries(actMap), e =>
      e.getField("value") >= topTs &&
        e.getField("value") > coalesce(
          element_at(delMap, e.getField("key")), lit(Long.MinValue)))
    val keptTombs = filter(map_entries(delMap), e =>
      e.getField("value") >= topTs)
    val toElemTs = (c: Column) => transform(c, e =>
      struct(e.getField("key").as("elem"), e.getField("value").as("ts")))
    Seq(
      transform(array_sort(live), e => e.getField("key"))
        .cast(f.dataType).as(f.name),
      struct(topTs.as("topTs"),
        toElemTs(array_sort(live)).as("active"),
        toElemTs(array_sort(keptTombs)).as("deleted"))
        .as(s"${f.name}__rmd"))
  }

  /** Map-field twin of [[mergedArray]] (per-entry LWW with value-string
    * tie-break). */
  private def mergedMap(f: StructField, mt: MapType, topTs: Column,
      actRaw: Column, delRaw: Column): Seq[Column] = {
    val actEntries = array_sort(actRaw)
    val delEntries = array_sort(delRaw)
    // entries sorted by (key, ts, value) + LAST_WIN ⇒ per key the
    // max-(ts, value-string) entry survives (LWW, deterministic ties)
    val actMap = map_from_entries(
      transform(actEntries, e => struct(e.getField("key").as("key"),
        struct(e.getField("ts").as("ts"), e.getField("value").as("value"))
          .as("value"))))
    val delMap = map_from_entries(
      transform(delEntries, e =>
        struct(e.getField("elem").as("key"), e.getField("ts").as("value"))))
    val live = filter(map_entries(actMap), e =>
      e.getField("value").getField("ts") >= topTs &&
        e.getField("value").getField("ts") > coalesce(
          element_at(delMap, e.getField("key")), lit(Long.MinValue)))
    val keptTombs = filter(map_entries(delMap), e =>
      e.getField("value") >= topTs)
    val liveSorted = array_sort(live)
    Seq(
      map_from_entries(transform(liveSorted, e =>
        struct(e.getField("key").cast(mt.keyType).as("key"),
          e.getField("value").getField("value").cast(mt.valueType)
            .as("value")))).as(f.name),
      struct(topTs.as("topTs"),
        transform(liveSorted, e =>
          struct(e.getField("key").as("key"),
            e.getField("value").getField("ts").as("ts"),
            e.getField("value").getField("value").as("value"))).as("active"),
        transform(array_sort(keptTombs), e =>
          struct(e.getField("key").as("elem"),
            e.getField("value").as("ts"))).as("deleted"))
        .as(s"${f.name}__rmd"))
  }

  /** Join two per-key states (value+rmd structs side by side). */
  def joinStates(a: Column, b: Column, value: StructType): Column = {
    val outFields: Seq[Column] = value.fields.flatMap { f =>
      f.dataType match {
        case _: ArrayType =>
          val (ra, rb) = (a.getField(s"${f.name}__rmd"), b.getField(s"${f.name}__rmd"))
          mergedArray(f,
            greatest(ra.getField("topTs"), rb.getField("topTs")),
            concat(
              coalesce(ra.getField("active"), array().cast(ArrayType(elemTs))),
              coalesce(rb.getField("active"), array().cast(ArrayType(elemTs)))),
            concat(
              coalesce(ra.getField("deleted"), array().cast(ArrayType(elemTs))),
              coalesce(rb.getField("deleted"), array().cast(ArrayType(elemTs)))))
        case mt: MapType =>
          val (ra, rb) = (a.getField(s"${f.name}__rmd"), b.getField(s"${f.name}__rmd"))
          mergedMap(f, mt,
            greatest(ra.getField("topTs"), rb.getField("topTs")),
            concat(
              coalesce(ra.getField("active"), array().cast(ArrayType(entryTs))),
              coalesce(rb.getField("active"), array().cast(ArrayType(entryTs)))),
            concat(
              coalesce(ra.getField("deleted"), array().cast(ArrayType(elemTs))),
              coalesce(rb.getField("deleted"), array().cast(ArrayType(elemTs)))))
        case _ =>
          // null-safe ts: a null timestamp (e.g. outer-join-produced state)
          // coalesces to MinValue so bWins stays boolean and the join stays
          // commutative — a NULL comparison would make the a-side win
          // regardless of argument order
          val ta = coalesce(a.getField(s"${f.name}__ts"), lit(Long.MinValue))
          val tb = coalesce(b.getField(s"${f.name}__ts"), lit(Long.MinValue))
          val (va, vb) = (a.getField(f.name), b.getField(f.name))
          // LWW; ts tie → larger value-string wins (deterministic stand-in
          // for Venice's unsigned serialized-byte compare). The tie-break is
          // null-safe — a NULL value deterministically loses to any non-null
          // regardless of argument order, preserving commutativity (a bare
          // string compare yields NULL on null input, which would let
          // join(a,b) and join(b,a) disagree on equal-ts ties).
          val bWins = (tb > ta) ||
            (tb === ta && vb.isNotNull &&
              (va.isNull || vb.cast("string") > va.cast("string")))
          Seq(when(bWins, vb).otherwise(va).as(f.name),
            when(bWins, tb).otherwise(ta).as(s"${f.name}__ts"))
      }
    }
    struct(outFields: _*)
  }

  /** Lift a full PUT at `ts` into a state struct: every scalar stamped ts,
    * every collection becomes a full put (topTs=ts, elements at ts). */
  def putState(valueStruct: Column, ts: Column, value: StructType): Column = {
    val fields = value.fields.flatMap { f =>
      f.dataType match {
        case _: ArrayType =>
          val elems = coalesce(valueStruct.getField(f.name),
            array().cast(f.dataType))
          Seq(sort_array(array_distinct(elems)).cast(f.dataType).as(f.name),
            struct(ts.as("topTs"),
              transform(sort_array(array_distinct(elems)),
                e => struct(e.cast("string").as("elem"), ts.as("ts"))).as("active"),
              array().cast(ArrayType(elemTs)).as("deleted"))
              .as(s"${f.name}__rmd"))
        case mt: MapType =>
          val m = coalesce(valueStruct.getField(f.name), map().cast(mt))
          val entries = array_sort(transform(map_entries(m), e =>
            struct(e.getField("key").cast("string").as("key"), ts.as("ts"),
              e.getField("value").cast("string").as("value"))))
          Seq(m.as(f.name),
            struct(ts.as("topTs"), entries.as("active"),
              array().cast(ArrayType(elemTs)).as("deleted"))
              .as(s"${f.name}__rmd"))
        case dt =>
          Seq(valueStruct.getField(f.name).as(f.name), ts.as(s"${f.name}__ts"))
      }
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** Bottom state: loses to everything (all timestamps at Long.MinValue). */
  def bottomState(value: StructType): Column = {
    val fields = value.fields.flatMap { f =>
      f.dataType match {
        case at: ArrayType =>
          Seq(lit(null).cast(at).as(f.name),
            struct(lit(Long.MinValue).as("topTs"),
              array().cast(ArrayType(elemTs)).as("active"),
              array().cast(ArrayType(elemTs)).as("deleted"))
              .as(s"${f.name}__rmd"))
        case mt: MapType =>
          Seq(lit(null).cast(mt).as(f.name),
            struct(lit(Long.MinValue).as("topTs"),
              array().cast(ArrayType(entryTs)).as("active"),
              array().cast(ArrayType(elemTs)).as("deleted"))
              .as(s"${f.name}__rmd"))
        case dt =>
          Seq(lit(null).cast(dt).as(f.name),
            lit(Long.MinValue).as(s"${f.name}__ts"))
      }
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** State for a single map-entry put (key→value at ts) on map field `f`. */
  def mapEntryState(f: String, key: Column, v: Column, ts: Column,
      value: StructType): Column = {
    val bottom = bottomState(value)
    val fields = value.fields.flatMap { vf =>
      vf.dataType match {
        case mt: MapType if vf.name == f =>
          Seq(lit(null).cast(mt).as(vf.name),
            struct(lit(Long.MinValue).as("topTs"),
              array(struct(key.cast("string").as("key"), ts.as("ts"),
                v.cast("string").as("value"))).as("active"),
              array().cast(ArrayType(elemTs)).as("deleted"))
              .as(s"${vf.name}__rmd"))
        case _ => passthrough(vf, bottom)
      }
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** State for a single map-key remove (tombstone at ts) on map field `f`. */
  def mapRemoveState(f: String, key: Column, ts: Column,
      value: StructType): Column = {
    val bottom = bottomState(value)
    val fields = value.fields.flatMap { vf =>
      vf.dataType match {
        case mt: MapType if vf.name == f =>
          Seq(lit(null).cast(mt).as(vf.name),
            struct(lit(Long.MinValue).as("topTs"),
              array().cast(ArrayType(entryTs)).as("active"),
              array(struct(key.cast("string").as("elem"), ts.as("ts")))
                .as("deleted"))
              .as(s"${vf.name}__rmd"))
        case _ => passthrough(vf, bottom)
      }
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** Bottom-valued (field, rmd/ts) pair for an untouched field. */
  private def passthrough(vf: StructField, bottom: Column): Seq[Column] =
    vf.dataType match {
      case _: ArrayType | _: MapType =>
        Seq(bottom.getField(vf.name).as(vf.name),
          bottom.getField(s"${vf.name}__rmd").as(s"${vf.name}__rmd"))
      case _ =>
        Seq(bottom.getField(vf.name).as(vf.name),
          bottom.getField(s"${vf.name}__ts").as(s"${vf.name}__ts"))
    }

  /** State for a single element add/remove op on collection field `f`. */
  def elementOpState(f: String, elem: Column, ts: Column, isRemove: Boolean,
      value: StructType): Column = {
    val bottom = bottomState(value)
    val fields = value.fields.flatMap { vf =>
      vf.dataType match {
        case at: ArrayType if vf.name == f =>
          val entry = array(struct(elem.cast("string").as("elem"), ts.as("ts")))
          Seq(lit(null).cast(at).as(vf.name),
            struct(lit(Long.MinValue).as("topTs"),
              (if (isRemove) array().cast(ArrayType(elemTs)) else entry).as("active"),
              (if (isRemove) entry else array().cast(ArrayType(elemTs))).as("deleted"))
              .as(s"${vf.name}__rmd"))
        case _ => passthrough(vf, bottom)
      }
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** State for a single scalar setField op at ts. */
  def setFieldState(f: String, v: Column, ts: Column,
      value: StructType): Column = {
    val bottom = bottomState(value)
    val fields = value.fields.flatMap { vf =>
      vf.dataType match {
        case _: ArrayType | _: MapType => passthrough(vf, bottom)
        case dt if vf.name == f =>
          Seq(v.cast(dt).as(vf.name), ts.as(s"${vf.name}__ts"))
        case _ => passthrough(vf, bottom)
      }
    }
    struct(fields.toIndexedSeq: _*)
  }

  /** Fold per-key event states into the converged state. `events` must
    * carry key cols + a "state" struct column built by the constructors
    * above. The fold order is irrelevant (commutative join), which is the
    * A/A multi-region guarantee.
    *
    * Scale shape: a TWO-PHASE fold, legal because the lattice is
    * commutative + associative (CrdtMergeSpec proves convergence under
    * permuted folds). Phase 1 folds each input partition's slice of a key
    * into one partial state — grouping on (key, spark_partition_id) means
    * every group lives inside a single input split, so no task ever
    * materializes more ops than one input partition holds (bounded by
    * spark.sql.files.maxPartitionBytes, not by key popularity). Phase 2
    * folds the ≤ numPartitions partial states per key. A hot key with
    * millions of pending ops therefore costs per-task memory O(partition
    * slice), where the previous single collect_list was O(key history) —
    * the difference between "spills" and "OOMs" at 100-TB scale.
    * Reference intent: Venice folds per-record incrementally and never
    * buffers a key's history (MergeConflictResolver.java:111-255 —
    * semantics pointer, not code).
    *
    * `keepRmd = true` also emits the merged RMD sibling columns
    * (f__ts / f__rmd) — the compaction shape: persisting them with the
    * value lets a repushed version keep resolving against late
    * out-of-order events (Venice stores RMD next to the value for exactly
    * this reason). */
  /** Phase-1 batch fold: one partial state per (key, input-partition slice)
    * computed with NATIVE aggregates — codegen'd `max(struct(ts, value))`
    * per scalar (the LWW tie-break IS lexicographic struct ordering:
    * null-first matches "null loses", string compare matches the
    * value-string tie-break), `max(topTs)` + flattened entry bags per
    * collection, with the element-level merge expression applied ONCE per
    * group. Replaces an interpreted `aggregate()` lambda that evaluated the
    * full two-sided lattice join per event (~20× the work for op-shaped
    * states that are bottom in every field but one). */
  private def foldStates(events: DataFrame, groupCols: Seq[String],
      value: StructType): DataFrame = {
    val st = col("state")
    val aggs: Seq[Column] = value.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: ArrayType | _: MapType => Seq(
          max(st.getField(s"${f.name}__rmd").getField("topTs"))
            .as(s"__top_${f.name}"),
          flatten(collect_list(st.getField(s"${f.name}__rmd").getField("active")))
            .as(s"__act_${f.name}"),
          flatten(collect_list(st.getField(s"${f.name}__rmd").getField("deleted")))
            .as(s"__del_${f.name}"))
        case _ => Seq(
          max(struct(
            coalesce(st.getField(s"${f.name}__ts"), lit(Long.MinValue)).as("ts"),
            st.getField(f.name).cast("string").as("vs"),
            st.getField(f.name).as("v"))).as(s"__m_${f.name}"))
      }
    }
    val grouped = events
      .groupBy(groupCols.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
    val stateFields: Seq[Column] = value.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: ArrayType =>
          mergedArray(f, col(s"__top_${f.name}"),
            col(s"__act_${f.name}"), col(s"__del_${f.name}"))
        case mt: MapType =>
          mergedMap(f, mt, col(s"__top_${f.name}"),
            col(s"__act_${f.name}"), col(s"__del_${f.name}"))
        case _ => Seq(
          col(s"__m_${f.name}").getField("v").as(f.name),
          col(s"__m_${f.name}").getField("ts").as(s"${f.name}__ts"))
      }
    }
    grouped.select(groupCols.map(col) :+ struct(stateFields: _*).as("state"): _*)
  }

  def mergeEvents(events: DataFrame, keys: Seq[String],
      value: StructType, keepRmd: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)
    val outNames =
      if (keepRmd) (value.fieldNames ++ rmdSchema(value).fieldNames).toSeq
      else value.fieldNames.toSeq
    // phase 1 bounds per-task memory to the input slice; phase 2 merges the
    // ≤ numPartitions partials per key — both through the same native
    // bag-merge ([[foldStates]]); [[joinStates]] remains the pairwise
    // reference semantics (property-tested equivalent)
    val partial = foldStates(
      events.withColumn("__slice", spark_partition_id()),
      keys :+ "__slice", value).drop("__slice")
    foldStates(partial, keys, value)
      .select(keyCols ++ outNames.map(n =>
        col("state").getField(n).as(n)): _*)
  }
}
