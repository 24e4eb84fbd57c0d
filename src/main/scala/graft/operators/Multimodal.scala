package graft.operators

import java.security.MessageDigest
import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) column handling for training pipelines.
  *
  * Media lives in opaque `binary` columns with typed metadata alongside —
  * the Spark-side plumbing (schema, partition-parallel batch decode via
  * mapPartitions, typed records) is real; the codec itself is a
  * clearly-marked deterministic STUB because no image/audio libraries exist
  * in this environment. Swapping `stubDecode` for a real decoder (JNI/
  * javacpp-ffmpeg, etc.) changes no plan shape: decode stays a narrow,
  * shuffle-free map over payload batches.
  */
object Multimodal {

  /** A decoded media record (what a real decoder would emit). */
  final case class Decoded(
      media_id: Long,
      n_bytes: Long,
      content_hash: String,
      width: Int,
      height: Int)

  private def md5hex(b: Array[Byte]): String =
    MessageDigest.getInstance("MD5").digest(b)
      .map(x => f"$x%02x").mkString

  /** STUB decoder: byte length + md5 + md5-derived fake dimensions.
    * A real implementation would parse the codec header here. The maths is
    * md5-based so the DuckDB oracle can reproduce it. */
  def stubDecode(id: Long, payload: Array[Byte]): Decoded = {
    val h = md5hex(payload)
    val w = java.lang.Integer.parseInt(h.substring(0, 4), 16) % 192 + 64
    val ht = java.lang.Integer.parseInt(h.substring(4, 8), 16) % 192 + 64
    Decoded(id, payload.length.toLong, h, w, ht)
  }

  /** Wrap a text table as fake media: payload = utf8 bytes. */
  def asMedia(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.select(col(idCol).cast("long").as("media_id"),
      col(textCol).cast("binary").as("payload"))

  /** Partition-parallel batch decode: one decoder instance per partition,
    * no shuffle, rows stream through in batches (the mapInPandas shape). */
  def decode(media: DataFrame): Dataset[Decoded] = {
    val spark = media.sparkSession
    import spark.implicits._
    media.select(col("media_id"), col("payload"))
      .as[(Long, Array[Byte])]
      .mapPartitions { it =>
        // per-partition setup: a real decoder would init its codec here
        it.map { case (id, payload) => stubDecode(id, payload) }
      }
  }

  /** "Resize" metadata transform (pure column math on decoded meta). */
  def resizeMeta(decoded: DataFrame, maxSide: Int): DataFrame =
    decoded.withColumn("scale",
      least(lit(1.0), lit(maxSide) / greatest(col("width"), col("height"))
        .cast("double")))
      .withColumn("out_width", floor(col("width") * col("scale")).cast("int"))
      .withColumn("out_height", floor(col("height") * col("scale")).cast("int"))

  /** Audio plumbing: treat the payload as PCM16 mono whose source sample
    * rate a real decoder would read from the container header — the STUB
    * derives it deterministically from the content hash (md5-based so the
    * DuckDB oracle reproduces it). All durations/counts are exact integer
    * arithmetic (multiply before divide — no float drift across engines).
    */
  val AudioRates: Seq[Int] = Seq(8000, 16000, 22050, 44100, 48000)

  def audioMeta(media: DataFrame): DataFrame =
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("n_samples", expr("n_bytes div 2"))
      .withColumn("src_rate",
        element_at(
          array(AudioRates.map(lit): _*),
          (conv(substring(md5(col("payload")), 1, 4), 16, 10).cast("long")
            % AudioRates.size + 1).cast("int")))
      .withColumn("duration_us",
        expr("(n_samples * 1000000L) div src_rate"))

  /** "Resample" to targetRate: the sample-count math is the real contract
    * (out_samples = floor(n·target/src), exact in integers); the byte
    * transform is a stub truncation a real resampler (libsamplerate etc.)
    * would replace — swapping it in changes no plan shape: still a narrow,
    * shuffle-free map. */
  def resampleAudio(media: DataFrame, targetRate: Int): DataFrame =
    audioMeta(media)
      .withColumn("out_samples",
        expr(s"(n_samples * ${targetRate}L) div src_rate"))
      .withColumn("out_bytes", expr("out_samples * 2"))
      .withColumn("resampled",
        expr("substring(payload, 1, cast(least(out_bytes, n_bytes) as int))"))

  /** Frame sampling for "video" payloads: split the payload into n equal
    * chunks and emit (media_id, frame_no, frame_bytes) — an explode, still
    * shuffle-free. */
  def frameSample(media: DataFrame, frames: Int): DataFrame = {
    media
      .withColumn("n_bytes", octet_length(col("payload")).cast("long"))
      .withColumn("frame_no", explode(sequence(lit(0), lit(frames - 1))))
      .withColumn("chunk_size",
        greatest(lit(1L), ceil(col("n_bytes").cast("double") / frames).cast("long")))
      .withColumn("frame_bytes",
        expr("substring(payload, cast(frame_no * chunk_size + 1 as int), cast(chunk_size as int))"))
      .filter(octet_length(col("frame_bytes")) > 0)
      .select(col("media_id"), col("frame_no"), col("frame_bytes"))
  }
}
