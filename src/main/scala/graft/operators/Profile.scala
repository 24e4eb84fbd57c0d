package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** One-pass table profiling (the ANALYZE a pipeline runs before picking
  * partition counts, salt factors, and layout columns): per column — null
  * count, distinct count, min/max, and mean string length.
  *
  * Plan shape: TWO aggregates, each one scan. The null/min/max/length
  * stats are a plain partial-agged pass; the exact distinct counts run as
  * their own aggregate because Spark rewrites multi-DISTINCT with an
  * Expand (one duplicated stream per DISTINCT column), and a combined
  * aggregate drags every min/max input column through all those duplicated
  * streams — measured 4.6 s vs 3.3 s split at sf0.1, with the gap growing
  * in the data-proportional term (the split Expand rows carry one value
  * each, the combined ones the whole table width). Exact is what an oracle
  * can check; at 100 TB call with `approxDistinct = true` and the distinct
  * pass collapses into the FIRST aggregate as one pass of HLL sketches
  * (±2%), the same downgrade DuckDB's own SUMMARIZE makes. The per-column
  * rows come from ONE result row unpivoted driver-side (O(#columns), not
  * O(rows)).
  *
  * Engine-neutral canonicalization: min/max surface as strings — longs and
  * epoch-millis timestamps print as integers, doubles in cents (x100, so no
  * float-formatting split), strings verbatim. Mean length in x100 fixed
  * point via exact integer sums.
  */
object Profile {

  private def canon(c: Column, dt: DataType): Column = dt match {
    case LongType | IntegerType | ShortType | ByteType =>
      c.cast("long").cast("string")
    case DoubleType | FloatType | _: DecimalType =>
      round(c.cast("double") * 100).cast("long").cast("string")
    case TimestampType | TimestampNTZType =>
      unix_millis(c.cast("timestamp")).cast("string")
    case DateType => c.cast("string")
    case BooleanType => c.cast("string")
    case StringType => c
    case _ => lit(null).cast("string") // arrays/maps/structs: no total order
  }

  private def lenOf(c: Column, dt: DataType): Column = dt match {
    case StringType => length(c).cast("long")
    case ArrayType(_, _) => size(c).cast("long")
    case _ => lit(null).cast("long")
  }

  /** Profile every column of `df`. Output: one row per column —
    * (col_name, n_rows, n_null, n_distinct, min_v, max_v, avg_len_x100).
    * (`col_name`, not `column` — the latter is a reserved word in ANSI
    * engines the oracle replays on.) */
  def columns(df: DataFrame, approxDistinct: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val fields = df.schema.fields.toSeq
    val statAggs: Seq[Column] = count(lit(1)).as("__n") +: fields.flatMap { f =>
      val c = col(f.name)
      val approx =
        if (approxDistinct)
          Seq(approx_count_distinct(c).as(s"__dist_${f.name}"))
        else Seq.empty
      Seq(
        sum(when(c.isNull, 1L).otherwise(0L)).as(s"__null_${f.name}"),
        canon(min(c), f.dataType).as(s"__min_${f.name}"),
        canon(max(c), f.dataType).as(s"__max_${f.name}"),
        sum(lenOf(c, f.dataType)).as(s"__lensum_${f.name}"),
        count(lenOf(c, f.dataType)).as(s"__lencnt_${f.name}")) ++ approx
    }
    val row = df.agg(statAggs.head, statAggs.tail: _*).collect()(0)
    val distRow =
      if (approxDistinct) row
      else {
        val distAggs = fields.map(f =>
          countDistinct(col(f.name)).as(s"__dist_${f.name}"))
        df.agg(distAggs.head, distAggs.tail: _*).collect()(0)
      }
    val nRows = row.getAs[Long]("__n")
    val out = fields.map { f =>
      val lenCnt = row.getAs[Long](s"__lencnt_${f.name}")
      val avgLen =
        if (lenCnt == 0L) None
        else Some(row.getAs[Long](s"__lensum_${f.name}") * 100L / lenCnt)
      (f.name, nRows,
        row.getAs[Long](s"__null_${f.name}"),
        distRow.getAs[Long](s"__dist_${f.name}"),
        Option(row.getAs[String](s"__min_${f.name}")),
        Option(row.getAs[String](s"__max_${f.name}")),
        avgLen)
    }
    out.toDF("col_name", "n_rows", "n_null", "n_distinct",
        "min_v", "max_v", "avg_len_x100")
      .orderBy(col("col_name"))
  }
}
