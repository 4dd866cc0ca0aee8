package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Shared synthetic fixtures, so suites that must agree on a shape have
  * one source of truth.
  */
object TestData {

  /** n time windows laid over the sf0.001 events range: 7-hour stride
    * from 2024-01-01T00:00Z, lengths cycling 1..5 hours — microsecond
    * longs (w_id, s, e). Non-overlapping by construction, so each event
    * matches at most one window and (event, window) pairs are unique.
    */
  def syntheticWindows(spark: SparkSession, n: Int): DataFrame =
    spark.range(n).select(
      col("id").as("w_id"),
      (lit(1704067200000000L) + col("id") * 25200000000L).as("s"),
      (lit(1704067200000000L) + col("id") * 25200000000L +
        ((col("id") % 5) + 1) * 3600000000L).as("e"))
}
