package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window
import graft.core.Tables
import graft.functions.{HashOps, TextOps, VectorOps}

/** A named operator query plus (when SQL-expressible) its DuckDB oracle.
  *
  * Cross-engine determinism rules used throughout:
  *  - money sums = per-row round(x*100) to integer cents, then exact integer
  *    sums (order-independent, bit-exact in any engine);
  *  - vector math = sequential double folds, rounded at the end;
  *  - timestamps surfaced as epoch millis (unix_millis ↔ epoch_ms);
  *  - hashing = md5 (identical hex in Spark and DuckDB);
  *  - every result deterministically ORDER BY'd.
  */
final case class QueryDef(
    name: String,
    fn: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    /** headline queries are the ones Bench times */
    headline: Boolean = false)

object Queries {

  private def t(s: SparkSession, dir: String, name: String): DataFrame =
    Tables.load(s, dir, name)

  // ---------------------------------------------------------------------------
  // Relational core (bench headliners)
  // ---------------------------------------------------------------------------

  /** TPC-H Q1-style pricing summary: partial aggregation map-side, one
    * shuffle on the (tiny-cardinality) group keys — scales linearly. */
  val q1Agg = QueryDef(
    "q1_agg",
    (s, dir) => {
      val li = t(s, dir, "lineitem")
      li.filter(col("l_shipdate") <= lit("1998-09-02").cast("timestamp"))
        .groupBy(col("l_returnflag"), col("l_linestatus"))
        .agg(
          sum(col("l_quantity")).cast("long").as("sum_qty"),
          sum(round(col("l_extendedprice") * 100).cast("long")).as("sum_base_cents"),
          sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
            .cast("long")).as("sum_disc_cents"),
          count(lit(1)).as("count_order"))
        .orderBy(col("l_returnflag"), col("l_linestatus"))
    },
    Some("""SELECT l_returnflag, l_linestatus,
            CAST(sum(l_quantity) AS BIGINT) AS sum_qty,
            CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS sum_base_cents,
            CAST(sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS BIGINT) AS sum_disc_cents,
            count(*) AS count_order
            FROM lineitem
            WHERE l_shipdate <= TIMESTAMP '1998-09-02'
            GROUP BY l_returnflag, l_linestatus
            ORDER BY l_returnflag, l_linestatus"""),
    headline = true)

  /** TPC-H Q3-style: revenue per order for a market segment. Dim side
    * (customer ⋉ segment) broadcast; single shuffle for the orders join. */
  val q3JoinTopk = QueryDef(
    "q3_join_topk",
    (s, dir) => {
      val cust = t(s, dir, "customer").filter(col("c_mktsegment") === "BUILDING")
      val ord = t(s, dir, "orders")
      val li = t(s, dir, "lineitem")
      li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .groupBy(col("l_orderkey"))
        .agg(sum(round(col("l_extendedprice") * (lit(1) - col("l_discount")) * 100)
          .cast("long")).as("revenue_cents"))
        .orderBy(col("revenue_cents").desc, col("l_orderkey"))
        .limit(10)
    },
    Some("""SELECT l_orderkey,
            sum(CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)) AS revenue_cents
            FROM lineitem JOIN orders ON l_orderkey = o_orderkey
            JOIN customer ON o_custkey = c_custkey
            WHERE c_mktsegment = 'BUILDING'
            GROUP BY l_orderkey
            ORDER BY revenue_cents DESC, l_orderkey
            LIMIT 10"""),
    headline = true)

  // ---------------------------------------------------------------------------
  // Venice read path (SURVEY §2.1)
  // ---------------------------------------------------------------------------

  /** R1 get: point lookup — partition-pruned parquet scan at scale. */
  val r1Get = QueryDef(
    "r1_get",
    (s, dir) => t(s, dir, "customer").filter(col("c_custkey") === 42L)
      .orderBy(col("c_custkey")),
    Some("SELECT * FROM customer WHERE c_custkey = 42 ORDER BY c_custkey"))

  private val batchKeys = Seq(1L, 5L, 7L, 11L, 19L, 42L, 77L, 101L, 128L, 149L)

  /** R2 batchGet: broadcast-hash left-semi join against the key set
    * (missing keys omitted — Venice batchGet semantics). */
  val r2BatchGet = QueryDef(
    "r2_batchget",
    (s, dir) => {
      import s.implicits._
      val keys = batchKeys.toDF("c_custkey")
      t(s, dir, "customer").join(broadcast(keys), Seq("c_custkey"), "left_semi")
        .orderBy(col("c_custkey"))
    },
    Some(s"""SELECT * FROM customer
             WHERE c_custkey IN (${batchKeys.mkString(", ")})
             ORDER BY c_custkey"""))

  /** R3 project: server-side field projection → Catalyst column pruning
    * (ReadSchema in the parquet scan shows only these columns). */
  val r3Project = QueryDef(
    "r3_project",
    (s, dir) => t(s, dir, "part")
      .select(col("p_partkey"), col("p_name"), col("p_retailprice"))
      .orderBy(col("p_partkey")),
    Some("SELECT p_partkey, p_name, p_retailprice FROM part ORDER BY p_partkey"))

  // ---------------------------------------------------------------------------
  // Venice write path / batch ETL (SURVEY §2.2–2.3)
  // ---------------------------------------------------------------------------

  /** B3 TTL filter: drop records older than the TTL start (repush TTL). */
  val b3Ttl = QueryDef(
    "b3_ttl_filter",
    (s, dir) => Tables.events(s, dir)
      .filter(col("ts") >= lit("2024-01-15 00:00:00").cast("timestamp"))
      .select(col("event_id"), unix_millis(col("ts")).as("ts_ms"),
        col("user_id"), col("event_type"), col("value"))
      .orderBy(col("event_id")),
    Some("""SELECT event_id, epoch_ms(ts) AS ts_ms, user_id, event_type, value
            FROM events WHERE ts >= TIMESTAMP '2024-01-15 00:00:00'
            ORDER BY event_id"""))

  /** B4 compaction: keep the latest record per key — one shuffle on the key,
    * rank inside partitions (Venice: per-key max offset; here (ts, event_id)
    * is the total order). */
  val b4Compaction = QueryDef(
    "b4_compaction",
    (s, dir) => {
      val w = Window.partitionBy(col("user_id"))
        .orderBy(col("ts").desc, col("event_id").desc)
      Tables.events(s, dir)
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") === 1)
        .select(col("user_id"), col("event_id"), col("event_type"),
          unix_millis(col("ts")).as("ts_ms"), col("value"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_id, event_type, epoch_ms(ts) AS ts_ms, value
            FROM events
            QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
            ORDER BY user_id"""),
    headline = true)

  // ---------------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------------

  val all: Seq[QueryDef] = Seq(
    q1Agg, q3JoinTopk,
    r1Get, r2BatchGet, r3Project,
    b3Ttl, b4Compaction)

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
