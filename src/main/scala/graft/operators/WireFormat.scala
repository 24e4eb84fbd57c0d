package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** B6/B12/W9/W10: wire-form serialization, ETL normalization, chunking
  * emulation and compression config — the push-job plumbing stages.
  */
object WireFormat {

  /** B6: project decoded rows to the wire triple (key, value, ts). JSON
    * stands in for Avro binary (no Avro connector in this build); the plan
    * shape — serialize in executors, never on the driver — is identical. */
  def toWire(df: DataFrame, keyFields: Seq[String], tsCol: Column): DataFrame = {
    val valueFields = df.columns.filterNot(keyFields.contains)
    df.select(
      to_json(struct(keyFields.map(col): _*)).as("key"),
      to_json(struct(valueFields.map(col): _*)).as("value"),
      tsCol.as("ts_ms"))
  }

  /** B6 inverse: decode a wire frame back to columns. */
  def fromWire(df: DataFrame, keySchema: StructType,
      valueSchema: StructType): DataFrame =
    df.select(
      from_json(col("key"), keySchema).as("k"),
      from_json(col("value"), valueSchema).as("v"),
      col("ts_ms"))
      .select(col("k.*"), col("v.*"), col("ts_ms"))

  /** B12: ETL-source normalization — inputs whose value arrives as a
    * nullable union get coalesced to the live column (Venice:
    * ETLValueSchemaTransformation). */
  def normalizeEtl(df: DataFrame, unionPairs: Seq[(String, String)]): DataFrame =
    unionPairs.foldLeft(df) { case (d, (liveCol, deletedCol)) =>
      d.withColumn(liveCol, coalesce(col(liveCol), col(deletedCol)))
        .drop(deletedCol)
    }

  /** W9: chunking emulation — split oversized value blobs into chunk rows
    * with a manifest, for byte-exact repush emulation tests ONLY (Parquet
    * has no message-size cap, so production pushes never chunk; see
    * SURVEY §1.3 "absorbed by the format"). */
  def chunk(df: DataFrame, keyCol: Column, valueCol: Column,
      maxBytes: Int): DataFrame = {
    df.select(keyCol.as("key"), valueCol.as("value"))
      .withColumn("n_bytes", octet_length(col("value")).cast("long"))
      .withColumn("n_chunks",
        ceil(col("n_bytes").cast("double") / maxBytes).cast("int"))
      .withColumn("chunk_no", explode(sequence(lit(0), col("n_chunks") - 1)))
      .withColumn("chunk",
        expr(s"substring(value, cast(chunk_no as int) * $maxBytes + 1, $maxBytes)"))
      .select(col("key"), col("chunk_no"), col("n_chunks"), col("chunk"))
  }

  /** W9 inverse: reassemble chunks in order (B5's repush assembly). */
  def assemble(chunks: DataFrame): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    chunks
      .groupBy(col("key"))
      .agg(array_sort(collect_list(struct(col("chunk_no"), col("chunk"))))
        .as("parts"))
      .select(col("key"),
        aggregate(col("parts"), lit("").cast("binary"),
          (acc, p) => concat(acc, p.getField("chunk"))).as("value"))
  }

  /** W10: compression strategy → Parquet codec (NO_OP/GZIP/ZSTD). The zstd
    * dictionary training step is obsolete under columnar encoding; the
    * sampling op survives as plain `df.sample` for stats. */
  def codecFor(strategy: String): String = strategy.toUpperCase match {
    case "NO_OP" => "uncompressed"
    case "GZIP" => "gzip"
    case "ZSTD" | "ZSTD_WITH_DICT" => "zstd"
    case other => throw new IllegalArgumentException(s"unknown strategy $other")
  }
}
