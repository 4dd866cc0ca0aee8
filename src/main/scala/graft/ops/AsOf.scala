package graft.ops

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Backward as-of join — an operator Spark has no built-in for (pandas
  * `merge_asof` / DuckDB `ASOF JOIN` territory). Composed from built-ins
  * (preference (a) of the custom-operator ladder): tag both sides, union,
  * and carry the right side's latest values forward with an
  * `last(..., ignoreNulls)` running window.
  *
  * Cost model: one shuffle on the partition keys + one per-key sort —
  * exactly what a dedicated sort-merge as-of implementation would pay, so
  * nothing is lost vs a custom SparkPlan, and AQE/skew handling stay free.
  * (A `BinaryExecNode` + zipPartitions variant only wins when both sides
  * are already co-partitioned and sorted on disk.)
  */
object AsOf {

  /** For each left row, attach the right row with the greatest
    * `timeCol <= left.timeCol` within the same `partitionCols` group.
    *
    * @param rightVals right columns to carry (must not clash with left)
    * @param timeCol   ordering column present on BOTH sides (numeric or
    *                  timestamp); ties match (right row at the same
    *                  instant is visible to the left row)
    */
  def backward(left: DataFrame, right: DataFrame, partitionCols: Seq[String],
      timeCol: String, rightVals: Seq[String]): DataFrame = {
    val l = left.withColumn("__side", lit(1))
    // The right row travels as ONE struct so the carry is atomic: a null
    // inside the latest right row stays null (last(...ignoreNulls) on
    // individual columns would skip it and surface a stale older value).
    val rCols = partitionCols.map(col) ++ Seq(
      col(timeCol), lit(0).as("__side"),
      struct(col(timeCol).as("__rt") +: rightVals.map(col): _*).as("__rv"))
    val r = right.select(rCols: _*)
    // union with side tag; right rows sort before left rows at equal time.
    // Ties among right rows at the same instant break on the value tuple,
    // so the carried row is deterministic under any partitioning.
    val u = l.unionByName(r, allowMissingColumns = true)
    val w = Window.partitionBy(partitionCols.map(col): _*)
      .orderBy(col(timeCol).asc, col("__side").asc, col("__rv").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    u.withColumn("__rv", last(col("__rv"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)
      .withColumn("matched_time", col("__rv.__rt"))
      .transform(df => rightVals.foldLeft(df)((d, v) =>
        d.withColumn(v, col(s"__rv.$v"))))
      .drop("__side", "__rv")
  }
}
