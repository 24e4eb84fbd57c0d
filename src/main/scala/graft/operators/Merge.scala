package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Venice CRDT conflict resolution, value-level (W5/W6): last-writer-wins on
  * timestamp, deterministic tie-break, delete-wins-on-equal-timestamp.
  *
  * Reference semantics: clients/da-vinci-client/.../replication/merge/
  * MergeConflictResolver.java:111-202 and AbstractMerge.java:17-64 — a PUT
  * wins when its timestamp is strictly greater, ties are broken by comparing
  * the serialized values (unsigned byte order); a DELETE wins when
  * oldTs <= deleteTs, and the tombstone keeps the delete timestamp.
  *
  * Spark shape: union snapshot+log, one shuffle on the key, pick the max row
  * under (ts, tieBreak) with delete preferred on full ties. Tombstones are
  * rows with `deleted = true`; `dropTombstones` produces the serving view.
  */
object Merge {

  /** LWW-merge a snapshot with an update log.
    *
    * Both inputs must share the schema: key cols ++ value cols ++
    * (tsCol: long, deleted: boolean). The tie-break column stands in for
    * Venice's equal-ts value compare (MergeByteBuffer →
    * MergeUtils.compareAndReturn — hashCode order, collision-unstable by
    * its own TODO): pass a deterministic rendering of the value columns.
    */
  def lww(snapshot: DataFrame, log: DataFrame, keys: Seq[String],
      tsCol: Column, tieBreak: Column,
      deletedCol: Column = col("deleted")): DataFrame = {
    val all = snapshot.unionByName(log)
    // delete-wins-on-equal-ts: rank deletes above puts at the same ts
    Compaction.latestPerKey(all, keys,
      Seq(tsCol, deletedCol.cast("int"), tieBreak))
  }

  def dropTombstones(merged: DataFrame,
      deletedCol: Column = col("deleted")): DataFrame =
    merged.filter(!deletedCol)
}
