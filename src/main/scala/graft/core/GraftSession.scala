package graft.core

import org.apache.spark.sql.SparkSession

/** Session factory with the engine's standard configuration. */
object GraftSession {

  /** Confs required for correctness on the testdata (applied by every main
    * and test suite). */
  val requiredConfs: Seq[(String, String)] = Seq(
    // DSv2 surface: serve graft-format relations via the analysis-time
    // rewrite + bucket-pruning optimizer rule (sources/GraftExtensions)
    "spark.sql.extensions" -> "graft.sources.GraftExtensions",
    // events.parquet uses TIMESTAMP(NANOS); Spark 4 reads it only as Long.
    "spark.sql.legacy.parquet.nanosAsLong" -> "true",
    // CrdtMerge/WriteCompute rely on LAST_WIN map dedup (sorted entries ⇒
    // max-ts entry per element survives)
    "spark.sql.mapKeyDedupPolicy" -> "LAST_WIN",
    "spark.sql.session.timeZone" -> "UTC")

  /** Perf posture for local[N]; on a real cluster these come from submit conf. */
  def tuningConfs(cpus: Int): Seq[(String, String)] = Seq(
    "spark.sql.shuffle.partitions" -> cpus.toString,
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.coalescePartitions.enabled" -> "true",
    "spark.sql.autoBroadcastJoinThreshold" -> (64 * 1024 * 1024).toString,
    "spark.ui.enabled" -> "false")

  def build(cpus: Int = Runtime.getRuntime.availableProcessors.min(32),
      appName: String = "graft"): SparkSession = {
    val b = SparkSession.builder().master(s"local[$cpus]").appName(appName)
    (requiredConfs ++ tuningConfs(cpus)).foreach { case (k, v) => b.config(k, v) }
    val s = b.getOrCreate()
    s.sparkContext.setLogLevel("WARN")
    s
  }
}
