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
  *  - scalar field f  → rmd ts long; LWW on (ts, tie-key). The tie-key is
  *    the value string by default; with `byteTieBreak` (per-store
  *    StoreConfig.lwwByteTieBreak) it is the Avro-serialized bytes — a
  *    deterministic byte-defined total order (NOT the reference's
  *    hashCode-based tie order, which its own TODO flags as
  *    collision-non-deterministic; see [[tieKey]]) — at field AND
  *    element level.
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

  /** Equal-timestamp tie-break ordering key for a value. Default: the
    * string rendering (deterministic, codegen'd). `byteTieBreak = true`
    * (per-store: StoreConfig.lwwByteTieBreak) ranks by the Avro-serialized
    * bytes instead: Spark's BinaryType compare is unsigned lexicographic
    * over the serialized record, giving a DETERMINISTIC, byte-defined
    * total order where string and byte order disagree (e.g. numerics:
    * "10" < "9" as strings but 10 > 9 as zigzag varints... for SMALL
    * values — zigzag length-prefix effects can invert large ones, e.g.
    * 127 → 0xFE 0x01 sorts above 128 → 0x80 0x02).
    *
    * This is NOT the reference's tie-break, which is itself not a byte
    * order: record-level equal-ts ties go through hashCode comparison
    * with nulls WINNING so deletes prevail (MergeUtils/
    * MergeConflictResolver; JVM-run-dependent, i.e. not reproducible
    * cross-engine), and collection-element ties through Avro's logical
    * GenericData.compare order. Neither is replayable bit-for-bit in a
    * SQL oracle, so this engine trades fidelity-to-an-unstable-order for
    * a stable serialized-byte order; convergence (all replicas agree) is
    * what CRDT correctness needs and is preserved under any total order.
    * A null FIELD VALUE loses to any non-null in both of our orders
    * (Avro's null union branch serializes below any value branch);
    * delete-wins-on-tie is handled structurally by the deleted/tombstone
    * rank, not by this key — so the reference's "nulls win because
    * deletes win" intent is preserved where null means delete. */
  private def tieKey(v: Column, byteTieBreak: Boolean): Column =
    if (byteTieBreak)
      graft.functions.AvroBinaryExpr.avroBinary(struct(v.as("v")))
    else v.cast("string")

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

  /** Map-field twin of [[mergedArray]] (per-entry LWW; equal-ts entries
    * tie-break on [[tieKey]] — value string by default, Avro bytes of the
    * TYPED value under byteTieBreak). */
  private def mergedMap(f: StructField, mt: MapType, topTs: Column,
      actRaw: Column, delRaw: Column, byteTieBreak: Boolean): Seq[Column] = {
    // byte-parity ties: sort by (key, ts, bytes(value:valueType)) via a
    // widened temp struct, then strip back to the entryTs shape — the
    // LAST_WIN dedup below then keeps the byte-order winner per key
    val actEntries =
      if (!byteTieBreak) array_sort(actRaw)
      else transform(
        array_sort(transform(actRaw, e => struct(
          e.getField("key").as("key"), e.getField("ts").as("ts"),
          tieKey(e.getField("value").cast(mt.valueType), byteTieBreak = true)
            .as("bin"),
          e.getField("value").as("value")))),
        e => struct(e.getField("key").as("key"), e.getField("ts").as("ts"),
          e.getField("value").as("value")))
    val delEntries = array_sort(delRaw)
    // entries sorted by (key, ts, tie-key) + LAST_WIN ⇒ per key the
    // max-(ts, tie-key) entry survives (LWW, deterministic ties)
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
  def joinStates(a: Column, b: Column, value: StructType,
      byteTieBreak: Boolean = false): Column = {
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
              coalesce(rb.getField("deleted"), array().cast(ArrayType(elemTs)))),
            byteTieBreak)
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
              (va.isNull ||
                tieKey(vb, byteTieBreak) > tieKey(va, byteTieBreak)))
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
    * Scale shape: everything PARTIAL-AGGREGATES. Scalars (and each
    * collection's top-level put ts) fold through a codegen'd
    * `max(struct(ts, value-string, value))` per key — the LWW tie-break IS
    * lexicographic struct ordering (null-first matches "null loses", the
    * string leg matches the value-string tie-break). Collection
    * element/entry ops are EXPLODED to long format and LWW-reduced per
    * (key, element) with the same native max — per-element max is
    * associative, so the map-side combine does almost all the work and a
    * hot key with millions of pending ops shrinks to its distinct elements
    * BEFORE any shuffle or bag materializes. (An earlier
    * collect_list-of-bags formulation allocated one small array per op and
    * died of GC at 10M ops on one key; this shape folds the same input in
    * seconds.) Per-task state is a spillable hash-agg map — nothing is
    * ever O(key history). Reference intent: Venice folds per-record
    * incrementally and never buffers a key's history
    * (MergeConflictResolver.java:111-255 — semantics pointer, not code).
    * [[joinStates]] remains the pairwise reference semantics; CrdtMergeSpec
    * proves convergence under permuted folds and equality with the model.
    *
    * `keepRmd = true` also emits the merged RMD sibling columns
    * (f__ts / f__rmd) — the compaction shape: persisting them with the
    * value lets a repushed version keep resolving against late
    * out-of-order events (Venice stores RMD next to the value for exactly
    * this reason). */
  def mergeEvents(events: DataFrame, keys: Seq[String],
      value: StructType, keepRmd: Boolean = false,
      byteTieBreak: Boolean = false): DataFrame = {
    val keyCols = keys.map(col)
    val st = col("state")
    val outNames =
      if (keepRmd) (value.fieldNames ++ rmdSchema(value).fieldNames).toSeq
      else value.fieldNames.toSeq

    // per-key scalar LWW + per-collection top-level put ts: one shuffle of
    // already-reduced partials, all codegen'd max aggregates
    val scalarAggs: Seq[Column] = value.fields.toSeq.map { f =>
      f.dataType match {
        case _: ArrayType | _: MapType =>
          max(st.getField(s"${f.name}__rmd").getField("topTs"))
            .as(s"__top_${f.name}")
        case _ =>
          max(struct(
            coalesce(st.getField(s"${f.name}__ts"), lit(Long.MinValue)).as("ts"),
            tieKey(st.getField(f.name), byteTieBreak).as("vs"),
            st.getField(f.name).as("v"))).as(s"__m_${f.name}")
      }
    }
    var merged = events.groupBy(keyCols: _*)
      .agg(scalarAggs.head, scalarAggs.tail: _*)

    // per-element LWW bag for an array-style entry set {elem, ts}: explode,
    // reduce max ts per (key, elem) — partial-agged — then one tiny
    // collect_list of the ≤ |distinct elements| winners per key
    def elemBag(entries: Column, out: String): DataFrame =
      events.select(keyCols :+ explode(entries).as("__e"): _*)
        .select(keyCols ++ Seq(col("__e").getField("elem").as("__el"),
          col("__e").getField("ts").as("__ts")): _*)
        .groupBy(keyCols :+ col("__el"): _*)
        .agg(max(col("__ts")).as("__ts"))
        .groupBy(keyCols: _*)
        .agg(collect_list(struct(col("__el").as("elem"),
          col("__ts").as("ts"))).as(out))

    // map-entry twin {key, ts, value}: per-entry LWW = max(struct(ts,
    // tie-key)) — the same deterministic tie-break as scalars (value
    // string by default, Avro bytes of the typed value under byteTieBreak)
    def entryBag(entries: Column, valueType: DataType,
        out: String): DataFrame =
      events.select(keyCols :+ explode(entries).as("__e"): _*)
        .select(keyCols ++ Seq(col("__e").getField("key").as("__el"),
          struct(col("__e").getField("ts").as("ts"),
            (if (byteTieBreak)
              tieKey(col("__e").getField("value").cast(valueType),
                byteTieBreak = true)
            else col("__e").getField("value")).as("tk"),
            col("__e").getField("value").as("value")).as("__tv")): _*)
        .groupBy(keyCols :+ col("__el"): _*)
        .agg(max(col("__tv")).as("__tv"))
        .groupBy(keyCols: _*)
        .agg(collect_list(struct(col("__el").as("key"),
          col("__tv").getField("ts").as("ts"),
          col("__tv").getField("value").as("value"))).as(out))

    value.fields.toSeq.foreach { f =>
      val rmd = st.getField(s"${f.name}__rmd")
      f.dataType match {
        case _: ArrayType =>
          merged = merged
            .join(elemBag(rmd.getField("active"), s"__act_${f.name}"),
              keys, "left")
            .join(elemBag(rmd.getField("deleted"), s"__del_${f.name}"),
              keys, "left")
        case mt: MapType =>
          merged = merged
            .join(entryBag(rmd.getField("active"), mt.valueType,
              s"__act_${f.name}"), keys, "left")
            .join(elemBag(rmd.getField("deleted"), s"__del_${f.name}"),
              keys, "left")
        case _ => ()
      }
    }

    val stateFields: Seq[Column] = value.fields.toSeq.flatMap { f =>
      f.dataType match {
        case _: ArrayType =>
          mergedArray(f, col(s"__top_${f.name}"),
            coalesce(col(s"__act_${f.name}"), array().cast(ArrayType(elemTs))),
            coalesce(col(s"__del_${f.name}"), array().cast(ArrayType(elemTs))))
        case mt: MapType =>
          mergedMap(f, mt, col(s"__top_${f.name}"),
            coalesce(col(s"__act_${f.name}"), array().cast(ArrayType(entryTs))),
            coalesce(col(s"__del_${f.name}"), array().cast(ArrayType(elemTs))),
            byteTieBreak)
        case _ => Seq(
          col(s"__m_${f.name}").getField("v").as(f.name),
          col(s"__m_${f.name}").getField("ts").as(s"${f.name}__ts"))
      }
    }
    merged
      .select(keyCols :+ struct(stateFields: _*).as("state"): _*)
      .select(keyCols ++ outNames.map(n =>
        col("state").getField(n).as(n)): _*)
  }

  /** [[mergeEvents]] for a frame that already holds exactly ONE state per
    * key: the same per-field canonicalization the fold applies (collection
    * bags → live elements via [[mergedArray]]/[[mergedMap]], null scalar ts
    * → bottom) WITHOUT the keyed shuffle. This is the A/A read fast path
    * for keys with no pending ops — at any real delta cadence the
    * overwhelming majority of a 100-TB store — whose snapshot states must
    * not pay a fold that is the identity on them. Fold-of-one equivalence
    * is pinned by EngineSpec. */
  def flattenStates(events: DataFrame, keys: Seq[String], value: StructType,
      keepRmd: Boolean = false, byteTieBreak: Boolean = false): DataFrame = {
    val st = col("state")
    val stateFields: Seq[Column] = value.fields.toSeq.flatMap { f =>
      val rmd = st.getField(s"${f.name}__rmd")
      f.dataType match {
        case _: ArrayType =>
          mergedArray(f, rmd.getField("topTs"),
            coalesce(rmd.getField("active"), array().cast(ArrayType(elemTs))),
            coalesce(rmd.getField("deleted"), array().cast(ArrayType(elemTs))))
        case mt: MapType =>
          mergedMap(f, mt, rmd.getField("topTs"),
            coalesce(rmd.getField("active"), array().cast(ArrayType(entryTs))),
            coalesce(rmd.getField("deleted"), array().cast(ArrayType(elemTs))),
            byteTieBreak)
        case _ => Seq(
          st.getField(f.name).as(f.name),
          coalesce(st.getField(s"${f.name}__ts"), lit(Long.MinValue))
            .as(s"${f.name}__ts"))
      }
    }
    val outNames =
      if (keepRmd) (value.fieldNames ++ rmdSchema(value).fieldNames).toSeq
      else value.fieldNames.toSeq
    events
      .select(keys.map(col) :+ struct(stateFields: _*).as("state"): _*)
      .select(keys.map(col) ++ outNames.map(n =>
        col("state").getField(n).as(n)): _*)
  }
}
