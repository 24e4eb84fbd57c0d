package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Venice write-compute (partial updates), re-expressed as Catalyst column
  * folds — W2 (UpdateBuilder), W3 (apply), W4 (update-schema derivation),
  * W8 (update squash).
  *
  * Reference semantics (NOT code):
  *  - WriteComputeSchemaConverter.java:43 — every value field becomes
  *    "NoOp | collection-ops | T"; here: a nullable field + explicit
  *    `__set_fields` list (so set-to-null stays expressible), and sibling
  *    `f__setUnion` / `f__setDiff` (arrays), `f__mapUnion` / `f__mapDiff`
  *    (maps) columns.
  *  - WriteComputeHandlerV1.java:29-119 apply, :135-163 arrays (set-union /
  *    set-diff), :215-235 maps (put entries / remove keys), NoOp skip.
  *  - UpdateBuilderImpl: conflicting set + collection-op calls throw.
  *
  * The per-key application is `collect updates → sort by ts → aggregate()
  * fold` — a higher-order-function expression, fully codegen'd, one shuffle
  * on the key. Group size = pending updates per key (bounded in practice by
  * compaction cadence), so no driver-side or unbounded state.
  */
object WriteCompute {

  val SetFieldsCol = "__set_fields"
  val TsCol = "__ts_ms"

  def unionCol(f: String) = s"${f}__setUnion"
  def diffCol(f: String) = s"${f}__setDiff"
  def mapUnionCol(f: String) = s"${f}__mapUnion"
  def mapDiffCol(f: String) = s"${f}__mapDiff"

  /** Update-schema fields for one value level (no SetFieldsCol — paths in
    * the TOP-level set list address nested branches as "field.branch"). */
  private def updateFields(value: StructType): Array[StructField] =
    value.fields.flatMap { f =>
      f.dataType match {
        case at: ArrayType => Seq(
          StructField(f.name, at, nullable = true),
          StructField(unionCol(f.name), at, nullable = true),
          StructField(diffCol(f.name), at, nullable = true))
        case mt: MapType => Seq(
          StructField(f.name, mt, nullable = true),
          StructField(mapUnionCol(f.name), mt, nullable = true),
          StructField(mapDiffCol(f.name), ArrayType(mt.keyType), nullable = true))
        case st: StructType =>
          // union-as-struct-of-optionals (SURVEY §1.2) / nested record:
          // the update schema recurses, mirroring Venice's recursion into
          // unions (WriteComputeHandlerV1.updateUnion/mergeUnion — which
          // locates collection branches inside a union and applies
          // collection semantics there rather than whole-field set)
          Seq(StructField(f.name, StructType(updateFields(st)),
            nullable = true))
        case dt => Seq(StructField(f.name, dt, nullable = true))
      }
    }

  /** W4: derive the update (write-compute) schema from a value schema. */
  def deriveUpdateSchema(value: StructType): StructType =
    StructType(updateFields(value) :+
      StructField(SetFieldsCol, ArrayType(StringType)))

  /** W3: apply one update struct onto an accumulator value struct.
    * `valueSchema` drives per-field semantics. */
  private def applyOne(acc: Column, u: Column,
      valueSchema: StructType): Column = {
    val setFields = coalesce(u.getField(SetFieldsCol),
      array().cast("array<string>"))
    struct(valueSchema.fields.map(f =>
      applyField(acc.getField(f.name), n => u.getField(n), f, f.name,
        setFields).as(f.name)).toIndexedSeq: _*)
  }

  private def applyField(cur: Column, getU: String => Column, f: StructField,
      path: String, setFields: Column): Column = {
    val explicitlySet = array_contains(setFields, path)
    f.dataType match {
      case at: ArrayType =>
        val base = when(explicitlySet, getU(f.name)).otherwise(cur)
        val empty = array().cast(at)
        val adds = getU(unionCol(f.name))
        val removes = getU(diffCol(f.name))
        when(base.isNull && adds.isNull && removes.isNull,
          lit(null).cast(at))
          .otherwise(array_except(
            array_union(coalesce(base, empty), coalesce(adds, empty)),
            coalesce(removes, empty)))
      case mt: MapType =>
        val base = when(explicitlySet, getU(f.name)).otherwise(cur)
        val emptyM = map().cast(mt)
        val emptyK = array().cast(ArrayType(mt.keyType))
        val adds = getU(mapUnionCol(f.name))
        val removes = getU(mapDiffCol(f.name))
        when(base.isNull && adds.isNull && removes.isNull,
          lit(null).cast(mt))
          .otherwise(map_filter(
            map_concat(coalesce(base, emptyM), coalesce(adds, emptyM)),
            (k, _) => !array_contains(coalesce(removes, emptyK), k)))
      case st: StructType =>
        // recurse per branch; a whole-union set is expressed as setting
        // every branch path (the at-most-one-non-null discipline lives in
        // UpdateBuilder.setUnionField)
        val sub = getU(f.name)
        val touched = exists(setFields, p => p.startsWith(lit(path + ".")))
        val applied = struct(st.fields.map(sf =>
          applyField(cur.getField(sf.name), n => sub.getField(n), sf,
            s"$path.${sf.name}", setFields).as(sf.name)).toIndexedSeq: _*)
        when(cur.isNull && sub.isNull && !touched, lit(null).cast(st))
          .otherwise(applied.cast(st))
      case _ => when(explicitlySet, getU(f.name)).otherwise(cur)
    }
  }

  /** W8 at scale: squash an update log to ONE update row per key.
    *
    * Chunked hierarchical fold: `row_number` over a (key, ts)-sorted
    * window slices each key's history into ts-contiguous chunks of
    * `chunkSize`; each chunk squashes to one partial update (a bounded
    * array fold), then the partials squash in chunk order. Legal because
    * squashExpr is associative over ts-contiguous runs (WriteComputeProps:
    * squash ≡ sequential apply for arbitrary op pairs). The window sort is
    * Spark's external spilling sort, so no task ever materializes more
    * than max(chunkSize, numOps/chunkSize) updates for one key — a hot key
    * with 10M pending ops folds through ~4k-element arrays instead of one
    * 10M-element collect_list. Reference intent: Venice compacts the
    * write-compute stream incrementally, never buffering a key's history
    * (semantics pointer: WriteComputeHandlerV1.java:29-119).
    *
    * Output schema = input schema with one row per key and TsCol = max ts.
    */
  def squashUpdates(updates0: DataFrame, keys: Seq[String],
      valueSchema: StructType, chunkSize: Int = 4096): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val keyCols = keys.map(col)
    val updates = conformUpdates(updates0, keys, valueSchema)
    val uNames = deriveUpdateSchema(valueSchema).fieldNames.toSeq
    val w = Window.partitionBy(keyCols: _*).orderBy(col(TsCol))
    val chunked = updates
      .select(keyCols :+ col(TsCol) :+ struct(uNames.map(col): _*).as("__u"): _*)
      .withColumn("__chunk",
        ((row_number().over(w) - 1) / chunkSize).cast("long"))
    // custom comparator: structs holding maps aren't orderable, but the
    // lambda only compares the ordering field
    def fold(df: DataFrame, groupCols: Seq[Column], ord: Column): DataFrame = df
      .groupBy(groupCols: _*)
      .agg(max(col(TsCol)).as(TsCol),
        array_sort(
          collect_list(struct(ord.as("o"), col("__u").as("u"))),
          (l, r) => when(l.getField("o") < r.getField("o"), -1)
            .when(l.getField("o") > r.getField("o"), 1)
            .otherwise(0)).as("__us"))
      .withColumn("__u",
        aggregate(slice(col("__us"), lit(2), size(col("__us")) - 1),
          element_at(col("__us"), 1).getField("u"),
          (acc, e) => squashExpr(acc, e.getField("u"), valueSchema)))
      .drop("__us")
    val partials = fold(chunked, keyCols :+ col("__chunk"), col(TsCol))
    fold(partials, keyCols, col("__chunk"))
      .select(keyCols ++ uNames.map(n => col("__u").getField(n).as(n))
        :+ col(TsCol): _*)
  }

  /** W3 at scale: apply every pending update (in ts order) onto the
    * snapshot value, per key. Updates on unknown keys build a row from a
    * null base (Venice applies the update to the schema default record).
    *
    * Shape: squash the whole log to one update per key via the chunked
    * [[squashUpdates]] (bounded per-task memory), then ONE applyOne against
    * the snapshot — equivalent to the sequential ts-ordered fold by the
    * squash ≡ sequential-apply property, without ever holding a key's
    * history in a task. */
  def applyUpdates(snapshot: DataFrame, updates: DataFrame,
      keys: Seq[String]): DataFrame = {
    val valueSchema = StructType(
      snapshot.schema.fields.filterNot(f => keys.contains(f.name)))
    val keyCols = keys.map(col)

    val snapStruct = snapshot.select(keyCols :+
      struct(valueSchema.fieldNames.map(col): _*).as("__value"): _*)

    val uNames = deriveUpdateSchema(valueSchema).fieldNames.toSeq
    val pending = squashUpdates(updates, keys, valueSchema)
      .select(keyCols :+ struct(uNames.map(col): _*).as("__u") :+
        lit(true).as("__has_update"): _*)

    val base = coalesce(col("__value"), lit(null).cast(valueSchema))
    snapStruct.join(pending, keys, "full_outer")
      // the no-update guard is load-bearing: applyOne(base, all-null-u) is
      // NOT identity (array_union dedups a base array's duplicates)
      .withColumn("__merged",
        when(col("__has_update").isNull, base)
          .otherwise(applyOne(base, col("__u"), valueSchema)))
      .select(keyCols ++ valueSchema.fieldNames
        .map(n => col("__merged").getField(n).as(n)): _*)
  }

  /** Conform an update-log frame to the schema derived from `valueSchema`:
    * op columns an older writer's update schema lacked become typed nulls
    * (= NoOp — exactly how Venice resolves an old write-compute record
    * against an evolved value schema), widened numerics cast. Lets one log
    * directory hold updates written under several registered schemas. */
  private def conformUpdates(updates: DataFrame, keys: Seq[String],
      valueSchema: StructType): DataFrame = {
    val target = StructType(
      updates.schema.fields.filter(f => keys.contains(f.name)) ++
        deriveUpdateSchema(valueSchema).fields :+
        StructField(TsCol, LongType))
    graft.core.SchemaEvolution.conform(updates, target)
  }

  /** W8: squash two pending update rows (u1 earlier, u2 later) into one —
    * used to compact the update log before applying. Expressed by folding
    * both updates onto a null base is NOT equivalent (set-vs-op history
    * matters), so squashing merges op columns directly:
    * u2 set wins; otherwise collection ops compose. */
  def squashExpr(u1: Column, u2: Column, valueSchema: StructType): Column = {
    val set1 = coalesce(u1.getField(SetFieldsCol), array().cast("array<string>"))
    val set2 = coalesce(u2.getField(SetFieldsCol), array().cast("array<string>"))
    val outFields = squashFields(n => u1.getField(n), n => u2.getField(n),
      valueSchema, "", set1, set2)
    struct((outFields :+
      array_union(set1, set2).as(SetFieldsCol)).toIndexedSeq: _*)
  }

  private def squashFields(g1: String => Column, g2: String => Column,
      value: StructType, prefix: String, set1: Column,
      set2: Column): Seq[Column] =
    value.fields.toSeq.flatMap { f =>
      val path = prefix + f.name
      val in2 = array_contains(set2, path)
      val in1 = array_contains(set1, path)
      f.dataType match {
        case at: ArrayType =>
          val empty = array().cast(at)
          // if u2 sets the field outright, u1's ops are dead; else if u1 set
          // it, fold u2's ops into the set value; else compose op lists
          val setVal = when(in2, g2(f.name))
            .when(in1, array_except(
              array_union(coalesce(g1(f.name), empty),
                coalesce(g2(unionCol(f.name)), empty)),
              coalesce(g2(diffCol(f.name)), empty)))
            .otherwise(lit(null).cast(at))
          val union = when(in2 || in1, lit(null).cast(at)).otherwise(
            array_except(
              array_union(coalesce(g1(unionCol(f.name)), empty),
                coalesce(g2(unionCol(f.name)), empty)),
              coalesce(g2(diffCol(f.name)), empty)))
          val diff = when(in2 || in1, lit(null).cast(at)).otherwise(
            array_union(
              array_except(coalesce(g1(diffCol(f.name)), empty),
                coalesce(g2(unionCol(f.name)), empty)),
              coalesce(g2(diffCol(f.name)), empty)))
          Seq(setVal.as(f.name), union.as(unionCol(f.name)),
            diff.as(diffCol(f.name)))
        case mt: MapType =>
          val emptyM = map().cast(mt)
          val emptyK = array().cast(ArrayType(mt.keyType))
          val setVal = when(in2, g2(f.name))
            .when(in1, map_filter(
              map_concat(coalesce(g1(f.name), emptyM),
                coalesce(g2(mapUnionCol(f.name)), emptyM)),
              (k, _) => !array_contains(
                coalesce(g2(mapDiffCol(f.name)), emptyK), k)))
            .otherwise(lit(null).cast(mt))
          val union = when(in2 || in1, lit(null).cast(mt)).otherwise(
            map_filter(
              map_concat(coalesce(g1(mapUnionCol(f.name)), emptyM),
                coalesce(g2(mapUnionCol(f.name)), emptyM)),
              (k, _) => !array_contains(
                coalesce(g2(mapDiffCol(f.name)), emptyK), k)))
          val diff = when(in2 || in1, lit(null).cast(ArrayType(mt.keyType)))
            .otherwise(array_union(
              array_except(coalesce(g1(mapDiffCol(f.name)), emptyK),
                map_keys(coalesce(g2(mapUnionCol(f.name)), emptyM))),
              coalesce(g2(mapDiffCol(f.name)), emptyK)))
          Seq(setVal.as(f.name), union.as(mapUnionCol(f.name)),
            diff.as(mapDiffCol(f.name)))
        case st: StructType =>
          // union branch / nested record: compose per branch path; both
          // sides NoOp (null, no set paths underneath) stays NoOp
          val (s1c, s2c) = (g1(f.name), g2(f.name))
          val updSt = StructType(updateFields(st))
          val touched = exists(array_union(set1, set2),
            p => p.startsWith(lit(path + ".")))
          val merged = struct(squashFields(n => s1c.getField(n),
            n => s2c.getField(n), st, path + ".", set1, set2): _*)
          Seq(when(s1c.isNull && s2c.isNull && !touched,
            lit(null).cast(updSt)).otherwise(merged.cast(updSt)).as(f.name))
        case dt =>
          Seq(when(in2, g2(f.name))
            .when(in1, g1(f.name))
            .otherwise(lit(null).cast(dt)).as(f.name))
      }
    }
}
