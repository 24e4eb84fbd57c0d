package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Ordered, attributed multi-step conversion funnel.
  *
  * Step k's first-event time must STRICTLY follow step k−1's first
  * qualifying time AND land within `windowMs` of it — so a click that
  * precedes the user's first view never counts, and a purchase months
  * later attributes to nothing. A plain per-type min (or an unwindowed
  * EXISTS) violates both rules.
  *
  * Scale shape: one partial-agged groupBy per step over only that step's
  * events (filter pushes to the scan), then equi-joins on the user key —
  * co-partitioned after the first shuffle, so steps 2..n reuse the
  * exchange. Never a per-user sort or a session window; event volume per
  * user is unbounded but each step's state is one min per user.
  */
object Funnel {

  /** @param ev      events with `userCol`, `typeCol`, `tsMsCol` (epoch ms)
    * @param steps   ordered event-type names, first step unwindowed
    * @param windowMs max gap between consecutive step times (attribution)
    * @return per user: `stage` (0..steps.length) + `ts_<i>` first
    *         qualifying time per reached step + `conv_ms` (last − first)
    *         for full converters */
  def stages(ev: DataFrame, userCol: String, typeCol: String,
      tsMsCol: String, steps: Seq[String], windowMs: Long): DataFrame = {
    require(steps.nonEmpty, "funnel needs at least one step")
    val users = ev.select(col(userCol)).distinct()
    val first = ev.filter(col(typeCol) === steps.head)
      .groupBy(col(userCol)).agg(min(col(tsMsCol)).as("ts_0"))
    val resolved = steps.zipWithIndex.drop(1)
      .foldLeft(Seq(first)) { case (acc, (st, i)) =>
        val prev = acc.last
        val next = ev.filter(col(typeCol) === st)
          .join(prev, userCol)
          .filter(col(tsMsCol) > col(s"ts_${i - 1}") &&
            col(tsMsCol) <= col(s"ts_${i - 1}") + windowMs)
          .groupBy(col(userCol)).agg(min(col(tsMsCol)).as(s"ts_$i"))
        acc :+ next
      }
    val joined = resolved.foldLeft(users) { (acc, df) =>
      acc.join(df, Seq(userCol), "left")
    }
    // build the CASE chain so the HIGHEST reached step is the outermost
    // test (ts_i set implies ts_{i-1} set, so testing low steps first
    // would always answer 1)
    val stage = steps.indices
      .foldLeft(lit(0L)) { (els, i) =>
        when(col(s"ts_$i").isNotNull, lit(i + 1L)).otherwise(els)
      }
    joined
      .withColumn("stage", stage)
      .withColumn("conv_ms",
        col(s"ts_${steps.length - 1}") - col("ts_0"))
  }
}
