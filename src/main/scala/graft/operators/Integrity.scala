package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** W11: data-integrity validation (DIV) — per-producer gapless-sequence and
  * checksum auditing over an ingest log.
  *
  * Reference semantics: DataIntegrityValidator tracks (producer GUID,
  * segment, sequence) per partition and flags MISSING / DUPLICATE / CORRUPT
  * records (KafkaMessageEnvelope carries producer metadata). Spark shape:
  * one window pass per producer ordered by sequence — a single shuffle,
  * no per-record driver state.
  */
object Integrity {

  /** Audit (producerCol, seqCol): emits rows where the sequence is not the
    * predecessor+1, classified DUPLICATE (same seq repeats) or MISSING
    * (gap). First record per producer is exempt (new segment). */
  def sequenceAudit(df: DataFrame, producerCol: Column, seqCol: Column): DataFrame = {
    val w = Window.partitionBy(producerCol).orderBy(seqCol)
    df.withColumn("__prev", lag(seqCol, 1).over(w))
      .withColumn("issue",
        when(col("__prev").isNull, lit(null).cast("string"))
          .when(seqCol === col("__prev"), "DUPLICATE")
          .when(seqCol > col("__prev") + 1, "MISSING_BEFORE")
          .otherwise(lit(null).cast("string")))
      .filter(col("issue").isNotNull)
      .drop("__prev")
  }

  /** Per-producer segment summary: count, min/max seq, gap count — the
    * checkpointable DIV state. */
  def producerState(df: DataFrame, producerCol: Column, seqCol: Column): DataFrame =
    df.groupBy(producerCol.as("producer"))
      .agg(count(lit(1)).as("n_records"),
        min(seqCol).as("min_seq"), max(seqCol).as("max_seq"),
        // duplicates must not mask gaps → distinct seq count
        (max(seqCol) - min(seqCol) + 1 - countDistinct(seqCol)).as("missing"))
}
