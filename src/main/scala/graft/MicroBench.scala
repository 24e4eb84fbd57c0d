package graft

import java.nio.file.Files
import org.apache.spark.sql.functions._
import graft.core.{GraftEngine, GraftSession, Tables}

/** Measures the BASELINE.md engine slots: batch push, batchGet, read-compute
  * dot product, CRDT merge throughput. Prints one JSON line. */
object MicroBench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = GraftSession.build(appName = "microbench")
    import spark.implicits._
    val root = graft.core.TmpStores.dir("graft-mb").toString
    val engine = new GraftEngine(spark, root)

    def timed[A](f: => A): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // warmup session
    Tables.lineitem(spark, sfDir).count()

    engine.createStore("lineitem", Seq("l_orderkey", "l_linenumber"))
    val liCount = Tables.lineitem(spark, sfDir).count()
    val pushSec = timed(engine.push("lineitem", Tables.lineitem(spark, sfDir)))

    engine.createStore("customer", Seq("c_custkey"))
    engine.push("customer", Tables.customer(spark, sfDir))
    val keys = (1L to 1000L).toDF("c_custkey")
    engine.batchGet("customer", keys).write.format("noop").mode("overwrite").save() // warm
    val batchGetSec = timed(
      engine.batchGet("customer", keys).write.format("noop").mode("overwrite").save())

    engine.createStore("emb", Seq("vec_id"))
    engine.push("emb", Tables.embeddings(spark, sfDir))
    val p = (0 until 64).map(i => ((i * 37) % 19 - 9) / 10.0)
    val nVec = Tables.embeddings(spark, sfDir).count()
    val computeSec = timed(
      engine.compute("emb").project("label").dotProduct("embedding", p, "dot")
        .execute().write.format("noop").mode("overwrite").save())

    // CRDT merge throughput: LWW-fold all events per user (events = updates)
    val ev = Tables.events(spark, sfDir)
    val nEv = ev.count()
    val crdtSec = timed {
      graft.operators.Compaction.latestPerKey(
        ev, Seq("user_id"), Seq(col("ts"), col("event_id")))
        .write.format("noop").mode("overwrite").save()
    }

    // nearline ingestion: 20 sink microbatches (the writeStream.format
    // delivery unit — one atomic log append + O(1) commit record each)
    engine.createStore("nl", Seq("user_id"))
    engine.push("nl", graft.operators.Compaction.latestPerKey(
      ev, Seq("user_id"), Seq(col("event_id"))))
    val slice = ev.select(col("user_id"), col("event_id"), col("event_type"),
      col("value")).limit(20000).persist()
    val nSink = slice.count() * 20
    val sinkSec = timed {
      (0 until 20).foreach { b =>
        graft.sources.GraftStreamSink(root, "nl",
          Map("tsms" -> (1000L + b).toString))
          .addBatch(b.toLong, slice)
      }
    }
    slice.unpersist()

    println(s"""{"push_lineitem_rows":$liCount,"push_sec":$pushSec,""" +
      s""""batchget_1k_sec":$batchGetSec,""" +
      s""""compute_dot_rows":$nVec,"compute_dot_sec":$computeSec,""" +
      s""""crdt_merge_rows":$nEv,"crdt_merge_sec":$crdtSec,""" +
      s""""sink_batches":20,"sink_rows":$nSink,"sink_sec":$sinkSec,""" +
      s""""sf":"$sfDir"}""")
    spark.stop()
  }
}
