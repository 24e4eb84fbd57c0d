package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** B1: batch input scan with key/value field extraction — the push job's
  * input stage (reference shape: VeniceHdfsSource + VeniceAvroRecordReader
  * extract configurable key/value fields from each input record).
  *
  * parquet/orc/json/csv resolve through the standard DSv2 registry; avro —
  * the reference's primary push format — goes through [[AvroInput]] (a
  * HadoopRDD over the public avro-mapred input format, since no Spark Avro
  * connector ships in this build).
  */
object InputSource {

  val supportedFormats: Set[String] = Set("parquet", "orc", "json", "csv", "avro")

  /** Read an input directory and project Venice-style (key, value) columns:
    * keyField names the key column(s); everything else is the value. */
  def read(spark: SparkSession, format: String, path: String,
      options: Map[String, String] = Map.empty): DataFrame = {
    require(supportedFormats(format), s"unsupported format $format " +
      s"(available: ${supportedFormats.mkString(", ")})")
    if (format == "avro") AvroInput.read(spark, path)
    else spark.read.format(format).options(options).load(path)
  }

  /** Normalize to the push-job's three-column wire shape:
    * (key string-rendered, value struct, ts). Decoded-layout engines keep
    * the struct; byte-layout emulation would serialize here (B6). */
  def toKeyValue(df: DataFrame, keyFields: Seq[String]): DataFrame = {
    val valueFields = df.columns.filterNot(keyFields.contains)
    df.select(
      concat_ws("|", keyFields.map(col): _*).as("key"),
      struct(valueFields.map(col): _*).as("value"))
  }
}
