package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.types.StructType

/** The external-topic seam for B2 (PubSub scan): where ingestion's rows come
  * FROM, decoupled from what ingestion does with them.
  *
  * Reference shape (semantics, not code): the Venice push job's Spark path
  * reads a raw pubsub topic as a DataFrame of topic records
  * (VeniceRawPubsubSource.java:21; SparkConstants.java:86 defines the
  * key/value/offset row schema) and the ingestion task consumes the RT topic.
  * Here the seam is a one-method trait: any system that can present its
  * records as a streaming DataFrame is a topic.
  *
  * Two implementations:
  *  - [[FileTopicSource]] — a parquet directory as the topic (the in-env
  *    adapter; a store's upsert log IS such a directory, so cross-store
  *    replication needs no other transport).
  *  - [[KafkaTopicSource]] — the real-broker binding: constructs the
  *    standard `readStream.format("kafka")` plan. The Kafka connector jar
  *    does not ship in this environment, so CONSTRUCTING the case class is
  *    always safe (options are data); materializing the stream requires the
  *    jar at runtime, exactly like any Spark deployment.
  *
  * With the seam, a user with a real topic writes
  * `StreamIngest.ingestFrom(engine, store, KafkaTopicSource(...), cp)` and
  * nothing else changes — the absorption of Venice's pubsub layer is now an
  * interface in code, not a paragraph in the README. */
trait TopicSource {
  /** The topic as an unbounded streaming DataFrame. */
  def stream(spark: SparkSession): DataFrame
}

/** A directory of parquet files as a topic: every new file is a batch of
  * records (the file-source offset log is the consumer checkpoint). The
  * in-environment adapter — also the store-to-store replication transport,
  * since an upsert log is exactly such a directory. */
final case class FileTopicSource(path: String,
    schema: Option[StructType] = None) extends TopicSource {
  override def stream(spark: SparkSession): DataFrame = {
    val s = schema.getOrElse(spark.read.parquet(path).schema)
    spark.readStream.schema(s).parquet(path)
  }
}

/** The Kafka binding of the seam: `readStream.format("kafka")` with the
  * standard source options (the shape every Spark+Kafka deployment uses —
  * public Structured Streaming API, no Venice code). `valueSchema` + the
  * default `parse` assume JSON-encoded values; pass a custom `parse` for
  * Avro or other wire formats. Requires the spark-sql-kafka connector jar
  * on the classpath at `stream(...)` time — constructing and inspecting the
  * source never does. */
final case class KafkaTopicSource(bootstrapServers: String, topic: String,
    startingOffsets: String = "earliest",
    valueSchema: Option[StructType] = None,
    parse: DataFrame => DataFrame = KafkaTopicSource.passthrough)
    extends TopicSource {

  /** The options readStream receives — exposed so deployments (and specs)
    * can audit the binding without a broker. */
  def sourceOptions: Map[String, String] = Map(
    "kafka.bootstrap.servers" -> bootstrapServers,
    "subscribe" -> topic,
    "startingOffsets" -> startingOffsets)

  override def stream(spark: SparkSession): DataFrame = {
    val raw = sourceOptions.foldLeft(spark.readStream.format("kafka")) {
      case (r, (k, v)) => r.option(k, v)
    }.load()
    val parsed = valueSchema match {
      case Some(s) => raw.select(org.apache.spark.sql.functions
        .from_json(org.apache.spark.sql.functions.col("value")
          .cast("string"), s).as("r")).select("r.*")
      case None => raw
    }
    parse(parsed)
  }
}

object KafkaTopicSource {
  private val passthrough: DataFrame => DataFrame = identity
}
