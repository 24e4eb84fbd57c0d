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
  // Venice read compute (SURVEY §2.1 R4–R10) over the embeddings table
  // ---------------------------------------------------------------------------

  /** Deterministic 64-dim request param vector; exact short decimals so the
    * Scala literal and the SQL literal parse to identical doubles. */
  private val pvec: Seq[Double] = (0 until 64).map(i => ((i * 37) % 19 - 9) / 10.0)
  private val pvecSql: String =
    pvec.map(_.toString).mkString("[", ",", "]") + "::DOUBLE[]"

  /** R4 dotProduct: codegen'd zip_with+aggregate fold — no UDF, stays in
    * WholeStageCodegen; DuckDB's list_dot_product is bit-identical. */
  val r4Dot = QueryDef(
    "r4_dotproduct",
    (s, dir) => t(s, dir, "embeddings")
      .select(col("vec_id"),
        round(VectorOps.dotProduct(col("embedding"), pvec), 6).as("dot"))
      .orderBy(col("vec_id")),
    Some(s"""SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], $pvecSql), 6) AS dot
             FROM embeddings ORDER BY vec_id"""),
    headline = true)

  /** R5 cosineSimilarity: dot/sqrt(‖v‖²·‖p‖²), param norm constant-folded. */
  val r5Cosine = QueryDef(
    "r5_cosine",
    (s, dir) => t(s, dir, "embeddings")
      .select(col("vec_id"),
        round(VectorOps.cosineSimilarity(col("embedding"), pvec), 6).as("cos_sim"))
      .orderBy(col("vec_id")),
    Some(s"""SELECT vec_id,
             round(list_dot_product(embedding::DOUBLE[], $pvecSql)
               / sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])
                      * list_dot_product($pvecSql, $pvecSql)), 6) AS cos_sim
             FROM embeddings ORDER BY vec_id"""))

  /** R6 hadamardProduct: element-wise product array. */
  val r6Hadamard = QueryDef(
    "r6_hadamard",
    (s, dir) => t(s, dir, "embeddings")
      .select(col("vec_id"),
        transform(VectorOps.hadamardProduct(col("embedding"), pvec),
          x => round(x, 6) + lit(0.0)).as("hprod"))
      .orderBy(col("vec_id")),
    // `+ 0.0` normalizes IEEE −0.0 (engines differ in keeping the sign)
    Some(s"""SELECT vec_id,
             list_transform(list_zip(embedding::DOUBLE[], $pvecSql),
               t -> round(t[1] * t[2], 6) + 0.0) AS hprod
             FROM embeddings ORDER BY vec_id"""))

  /** R7 count: collection size (null → −1, Venice's error default). */
  val r7Count = QueryDef(
    "r7_count",
    (s, dir) => t(s, dir, "embeddings")
      .select(col("vec_id"),
        VectorOps.countElements(col("embedding")).as("n_elems"))
      .orderBy(col("vec_id")),
    Some("SELECT vec_id, len(embedding) AS n_elems FROM embeddings ORDER BY vec_id"))

  /** R8 compute-request validation semantics: an op with a mismatched param
    * length yields 0.0 plus an entry in the __veniceComputationError__ map
    * (surfaced here as sorted keys + the message for hash-comparability). */
  val r8ComputeErrors = QueryDef(
    "r8_compute_errors",
    (s, dir) => {
      val errs = VectorOps.computationErrors(Seq(("dotProduct", col("embedding"), 32)))
      t(s, dir, "embeddings")
        .select(col("vec_id"), col("label"),
          round(VectorOps.dotProduct(col("embedding"),
            (0 until 32).map(i => ((i * 37) % 19 - 9) / 10.0)), 6).as("dot_bad"),
          array_join(array_sort(map_keys(errs)), ",").as("err_ops"),
          element_at(errs, "dotProduct").as("err_msg"))
        .orderBy(col("vec_id"))
    },
    Some("""SELECT vec_id, label, 0.0 AS dot_bad, 'dotProduct' AS err_ops,
            'array length ' || len(embedding) || ' does not match param length 32' AS err_msg
            FROM embeddings ORDER BY vec_id"""))

  /** R9 prefix-predicate compute scan: filter on leading key field range +
    * projection + computed field — min/max row-group pruning at scale. */
  val r9Prefix = QueryDef(
    "r9_prefix_scan",
    (s, dir) => t(s, dir, "orders")
      .filter(col("o_custkey") >= 100L && col("o_custkey") < 200L)
      .select(col("o_orderkey"), col("o_custkey"),
        round(col("o_totalprice") * 100).cast("long").as("total_cents"),
        when(col("o_orderpriority").startsWith("1") ||
          col("o_orderpriority").startsWith("2"), "high")
          .otherwise("low").as("priority_class"))
      .orderBy(col("o_orderkey")),
    Some("""SELECT o_orderkey, o_custkey,
            CAST(round(o_totalprice * 100) AS BIGINT) AS total_cents,
            CASE WHEN o_orderpriority LIKE '1%' OR o_orderpriority LIKE '2%'
                 THEN 'high' ELSE 'low' END AS priority_class
            FROM orders WHERE o_custkey >= 100 AND o_custkey < 200
            ORDER BY o_orderkey"""))

  /** R10 predicate algebra: and/or/anyOf/comparisons — 1:1 Catalyst. */
  val r10Predicates = QueryDef(
    "r10_predicates",
    (s, dir) => t(s, dir, "lineitem")
      .filter((col("l_quantity") >= 30 && col("l_discount") < 0.05) ||
        (col("l_returnflag") === "R" && col("l_suppkey").isin(1L, 3L, 5L)))
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"),
        col("l_returnflag"), col("l_suppkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber")),
    Some("""SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag, l_suppkey
            FROM lineitem
            WHERE (l_quantity >= 30 AND l_discount < 0.05)
               OR (l_returnflag = 'R' AND l_suppkey IN (1, 3, 5))
            ORDER BY l_orderkey, l_linenumber"""))

  // ---------------------------------------------------------------------------
  // Venice write path continued (W5 LWW merge, B7 quota, B8 partitioner)
  // ---------------------------------------------------------------------------

  /** W5/W6 value-level CRDT merge: snapshot (events before Jan 15) merged
    * with an update log (events after, 'error' type acting as DELETE).
    * LWW on ts, delete-wins-on-equal-ts, deterministic tie-break. */
  val w5Lww = QueryDef(
    "w5_lww_merge",
    (s, dir) => {
      val ev = Tables.events(s, dir).select(
        col("user_id"),
        col("event_type"), col("value"),
        unix_millis(col("ts")).as("ts_ms"),
        (col("event_type") === "error").as("deleted"),
        col("event_id"))
      val cutoff = lit("2024-01-15 00:00:00").cast("timestamp")
      val snapshot = ev.filter(unix_millis(cutoff) > col("ts_ms"))
      val log = ev.filter(unix_millis(cutoff) <= col("ts_ms"))
      val merged = graft.operators.Merge.lww(
        snapshot, log, Seq("user_id"), col("ts_ms"), col("event_id"))
      graft.operators.Merge.dropTombstones(merged)
        .select(col("user_id"), col("event_type"), col("value"),
          col("ts_ms"), col("event_id"))
        .orderBy(col("user_id"))
    },
    Some("""SELECT user_id, event_type, value, ts_ms, event_id FROM (
              SELECT user_id, event_type, value, epoch_ms(ts) AS ts_ms, event_id,
                row_number() OVER (PARTITION BY user_id
                  ORDER BY epoch_ms(ts) DESC,
                           CASE WHEN event_type = 'error' THEN 1 ELSE 0 END DESC,
                           event_id DESC) AS rn
              FROM events)
            WHERE rn = 1 AND event_type <> 'error'
            ORDER BY user_id"""))

  /** B7 storage-quota enforcement: total serialized key+value bytes
    * (distributed sum, the single collected row is the quota verdict). */
  val b7Quota = QueryDef(
    "b7_quota",
    (s, dir) => t(s, dir, "customer")
      .agg(sum(octet_length(col("c_custkey").cast("string")) +
        octet_length(col("c_name")) + octet_length(col("c_mktsegment")))
        .as("total_bytes"),
        count(lit(1)).as("n_records")),
    Some("""SELECT sum(strlen(CAST(c_custkey AS VARCHAR))
                 + strlen(c_name) + strlen(c_mktsegment)) AS total_bytes,
            count(*) AS n_records FROM customer"""))

  /** B8 Venice-style md5-mod partitioner: per-partition record counts
    * (the partition+sort stage's audit; reproducible cross-engine). */
  val b8Partition = QueryDef(
    "b8_partition_counts",
    (s, dir) => t(s, dir, "customer")
      .select(HashOps.partitionId(col("c_custkey"), 16).as("partition_id"))
      .groupBy(col("partition_id")).agg(count(lit(1)).as("n"))
      .orderBy(col("partition_id")),
    Some("""SELECT (('0x' || substr(md5(CAST(c_custkey AS VARCHAR)), 1, 15))::BIGINT % 16)::INT
              AS partition_id, count(*) AS n
            FROM customer GROUP BY 1 ORDER BY partition_id"""))

  // ---------------------------------------------------------------------------
  // Registry
  // ---------------------------------------------------------------------------

  val all: Seq[QueryDef] = Seq(
    q1Agg, q3JoinTopk,
    r1Get, r2BatchGet, r3Project,
    r4Dot, r5Cosine, r6Hadamard, r7Count, r8ComputeErrors, r9Prefix,
    r10Predicates,
    b3Ttl, b4Compaction, b7Quota, b8Partition,
    w5Lww)

  def byName: Map[String, QueryDef] = all.map(q => q.name -> q).toMap
}
