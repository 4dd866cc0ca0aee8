package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ANALYZE-style catalog statistics — the per-column profile a
  * cost-based optimizer (and every data catalog) consumes: row counts,
  * null counts, and distinct-value cardinality. NDV is where the
  * engineering lives at 100 TB: an exact count-distinct per column is
  * a full shuffle per column, so production stats collectors (Spark's
  * own ANALYZE TABLE, Trino's stats, Iceberg/Delta file stats) carry
  * an HLL estimate instead. This operator computes BOTH — the exact
  * column doubles as the verification the graded report needs — using
  * q110's engine-portable md5-register HLL so the estimate itself
  * hash-matches DuckDB bit for bit.
  */
object Stats {

  /** HLL geometry shared with the oracle: m registers over a 40-bit
    * md5-prefix hash, Flajolet α as per-mille (the q110 constants).
    */
  val M = 64
  val AlphaPerMille = 709L

  /** Graded q150: column statistics for a fixed (table, column) list
    * spanning the star schema's join keys and the corpus dimensions —
    * exactly the columns whose NDV a join planner needs.
    *
    * Scale shape: each table is scanned ONCE — its stat columns melt
    * through `stack` into a persisted (column, value-as-string) long
    * table, and every downstream branch (basic counts, exact NDV, HLL
    * registers) re-aggregates that cache. The register path is the
    * scale path: a map-side-combined max-aggregate bounded at
    * m·|columns| rows with NO expand and NO distinct; the exact-NDV
    * branch is the verification column a production run drops, as in
    * q110. Estimates join back by broadcast (|columns| rows).
    */
  def tableStats(spark: SparkSession, dir: String): DataFrame = {
    val specs = Seq(
      "documents" -> Seq("source", "lang"),
      "events" -> Seq("user_id", "event_type"),
      "lineitem" -> Seq("l_orderkey", "l_partkey", "l_suppkey"),
      "orders" -> Seq("o_orderkey", "o_custkey"))
    specs.map { case (t, cols) =>
      tableColumnStats(Tables(spark, dir, t), t, cols)
    }.reduce(_ unionByName _)
      .orderBy("table_name", "column_name")
  }

  /** One table's stats: melt the stat columns into long format (one
    * scan), then count/NDV/sketch per column off the cache.
    */
  def tableColumnStats(df: DataFrame, table: String,
      cols: Seq[String]): DataFrame = {
    val stackArgs = cols.map(c => s"'$c', CAST($c AS STRING)")
      .mkString(", ")
    val melted = CachedStages.track(df
      .select(expr(s"stack(${cols.size}, $stackArgs) AS (column_name, val)"))
      .persist())
    val restBits = 40 - Integer.numberOfTrailingZeros(M)
    val kMax = restBits + 1
    val numerator = AlphaPerMille * M.toLong * M.toLong * (1L << kMax)
    val reg = melted.filter(col("val").isNotNull)
      .select(col("column_name"), expr(
        "CAST(conv(substring(md5(concat('hll:', val)), 1, 10), 16, 10)" +
          " AS BIGINT)").as("h"))
      .select(col("column_name"), (col("h") % M).as("idx"),
        expr(s"CASE WHEN h div $M = 0 THEN $kMax " +
          s"ELSE $kMax - length(bin(h div $M)) END").as("rho"))
      .groupBy("column_name", "idx").agg(max(col("rho")).as("mj"))
    val est = reg.groupBy("column_name")
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $kMax - mj)"))
          .as("s_present"))
      .select(col("column_name"), expr(
        s"$numerator div (1000 * (s_present + " +
          s"(${M.toLong} - n_present) * ${1L << kMax}))").as("ndv_hll"))
    melted.groupBy("column_name")
      .agg(count(lit(1)).as("n_rows"),
        sum(when(col("val").isNull, 1L).otherwise(0L)).as("n_nulls"),
        countDistinct(col("val")).as("ndv_exact"))
      .join(broadcast(est), Seq("column_name"))
      .select(lit(table).as("table_name"), col("column_name"),
        col("n_rows"), col("n_nulls"), col("ndv_exact"), col("ndv_hll"),
        expr("abs(ndv_hll - ndv_exact) * 1000000 div ndv_exact")
          .as("err_ppm"))
  }
}
