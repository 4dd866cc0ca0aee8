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

  /** The portable NDV sketch over a `(column_name, val)` long frame:
    * md5-register HLL → one `ndv_hll` row per column. Shared by the
    * q150 stats collector and q153's join estimator.
    */
  def ndvSketch(melted: DataFrame): DataFrame = {
    val restBits = 40 - Integer.numberOfTrailingZeros(M)
    val kMax = restBits + 1
    val numerator = AlphaPerMille * M.toLong * M.toLong * (1L << kMax)
    melted.filter(col("val").isNotNull)
      .select(col("column_name"), expr(
        "CAST(conv(substring(md5(concat('hll:', val)), 1, 10), 16, 10)" +
          " AS BIGINT)").as("h"))
      .select(col("column_name"), (col("h") % M).as("idx"),
        expr(s"CASE WHEN h div $M = 0 THEN $kMax " +
          s"ELSE $kMax - length(bin(h div $M)) END").as("rho"))
      .groupBy("column_name", "idx").agg(max(col("rho")).as("mj"))
      .groupBy("column_name")
      .agg(count(lit(1)).as("n_present"),
        sum(expr(s"shiftleft(CAST(1 AS BIGINT), $kMax - mj)"))
          .as("s_present"))
      .select(col("column_name"), expr(
        s"$numerator div (1000 * (s_present + " +
          s"(${M.toLong} - n_present) * ${1L << kMax}))").as("ndv_hll"))
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
    val est = ndvSketch(melted)
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

  /** Graded q153: JOIN-CARDINALITY ESTIMATION vs truth — the planner
    * arithmetic itself under test. Every cost-based optimizer sizes an
    * equi-join with the containment/uniformity estimate
    * `|L ⋈ R| ≈ |L|·|R| / max(ndv_L, ndv_R)` (Selinger et al., SIGMOD
    * 1979) over exactly the catalog stats q150 collects; this operator
    * runs that formula with the PORTABLE-HLL NDVs on the star schema's
    * three foreign-key joins and reports it against the measured join
    * size — the error column is the planner's real-world risk, made a
    * graded, regression-tracked artifact.
    *
    * Scale shape: per join, the estimate branch touches only row
    * counts and the m-register sketches (map-side-combined, no
    * distinct); the actual-count branch is the expensive verification
    * column a production run drops — and it is the JOIN ITSELF, so
    * the report costs what one real join costs, no more. All five
    * inputs are 1-row frames crossed by broadcast; the product
    * `|L|·|R|` routes through DECIMAL(38).
    */
  def joinEstimates(spark: SparkSession, dir: String): DataFrame = {
    val joins = Seq(
      ("customer_orders", ("customer", "c_custkey"), ("orders", "o_custkey")),
      ("orders_lineitem", ("orders", "o_orderkey"), ("lineitem", "l_orderkey")),
      ("part_lineitem", ("part", "p_partkey"), ("lineitem", "l_partkey")))
    joins.map { case (name, (lt, lc), (rt, rc)) =>
      val l = Tables(spark, dir, lt)
      val r = Tables(spark, dir, rt)
      def ndv(df: DataFrame, c: String, out: String) =
        ndvSketch(df.select(lit(c).as("column_name"),
          col(c).cast("string").as("val")))
          .select(col("ndv_hll").as(out))
      val actual = l.select(col(lc).as("k"))
        .join(r.select(col(rc).as("k")), Seq("k"))
        .agg(count(lit(1)).as("actual_rows"))
      l.agg(count(lit(1)).as("n_left"))
        .crossJoin(broadcast(r.agg(count(lit(1)).as("n_right"))))
        .crossJoin(broadcast(ndv(l, lc, "ndv_left")))
        .crossJoin(broadcast(ndv(r, rc, "ndv_right")))
        .crossJoin(broadcast(actual))
        .select(lit(name).as("join_name"), col("n_left"), col("n_right"),
          col("ndv_left"), col("ndv_right"),
          expr("""CAST(CAST(n_left AS DECIMAL(38, 0)) * n_right
            | div greatest(ndv_left, ndv_right) AS BIGINT)""".stripMargin)
            .as("est_rows"),
          col("actual_rows"))
        .withColumn("err_ppm", expr(
          "abs(est_rows - actual_rows) * 1000000 div actual_rows"))
    }.reduce(_ unionByName _).orderBy("join_name")
  }
}
