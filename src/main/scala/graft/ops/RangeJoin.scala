package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Grid-bucketed range join — the second operator family Spark lacks a
  * dedicated physical operator for (after as-of, see AsOf.scala).
  *
  * A naive `points JOIN intervals ON p >= start AND p < end` has no
  * equi-key, so Spark plans BroadcastNestedLoopJoin: O(|points| ·
  * |intervals|) comparisons — unusable at scale. The standard rewrite
  * buckets both sides onto a fixed-size grid: each interval is exploded
  * to the cells it covers, each point maps to exactly one cell, and the
  * join becomes a hash equi-join on the cell id followed by an exact
  * containment filter. Cost: O(|points| + Σ interval_len/cell) with a
  * plain shuffle/broadcast hash join — AQE, skew handling and codegen
  * all apply.
  */
object RangeJoin {

  /** Join each point row to every interval row containing it
    * (`start <= point < end`, all long-typed on the same axis).
    *
    * @param cellSize grid granularity; choose ~ the median interval
    *                 length so intervals explode to O(1) cells
    */
  def pointInInterval(points: DataFrame, intervals: DataFrame,
      pointCol: String, startCol: String, endCol: String,
      cellSize: Long): DataFrame = {
    // Empty/inverted intervals (end <= start) contain no points, but
    // sequence(a, b) DESCENDS when b < a — without this guard an inverted
    // row would explode to cells for a nonsense interval (and the exact
    // containment filter below would then drop them one join later than
    // it should, after paying the fan-out). Filter them out up front.
    val cells = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn("__cell",
        explode(expr(s"sequence($startCol div $cellSize, ($endCol - 1) div $cellSize)")))
    val p = points.withColumn("__cell", expr(s"$pointCol div $cellSize"))
    p.join(cells, "__cell")
      .filter(col(pointCol) >= col(startCol) && col(pointCol) < col(endCol))
      .drop("__cell")
  }
}
