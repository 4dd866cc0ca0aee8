package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

/** Unit tests for the generic AsOf operator, including carried right-side
  * value columns (the graded q24 uses only matched_time).
  */
class AsOfSpec extends SparkSpec {

  private def df(schema: StructType, rows: Seq[Row]) =
    spark.createDataFrame(spark.sparkContext.parallelize(rows), schema)

  val leftSchema = StructType(Seq(
    StructField("k", StringType), StructField("t", LongType),
    StructField("payload", StringType)))
  val rightSchema = StructType(Seq(
    StructField("k", StringType), StructField("t", LongType),
    StructField("price", DoubleType)))

  test("backward as-of carries the latest right values per key") {
    val trades = df(leftSchema, Seq(
      Row("a", 10L, "t1"), Row("a", 25L, "t2"), Row("a", 5L, "t0"),
      Row("b", 10L, "t3")))
    val quotes = df(rightSchema, Seq(
      Row("a", 8L, 1.0), Row("a", 20L, 2.0), Row("a", 30L, 3.0),
      Row("c", 1L, 9.0)))
    val out = AsOf.backward(trades, quotes, Seq("k"), "t", Seq("price"))
      .select("k", "t", "payload", "matched_time", "price")
      .collect().map(r => (r.getString(0), r.getLong(1), r.getString(2),
        Option(r.get(3)), Option(r.get(4)))).toSet
    assert(out == Set(
      ("a", 5L, "t0", None, None),           // no quote yet
      ("a", 10L, "t1", Some(8L), Some(1.0)), // latest quote at t=8
      ("a", 25L, "t2", Some(20L), Some(2.0)), // t=30 is in the future
      ("b", 10L, "t3", None, None)))         // key never quoted
  }

  test("right row at the exact same time is visible (ties match)") {
    val l = df(leftSchema, Seq(Row("a", 10L, "x")))
    val r = df(rightSchema, Seq(Row("a", 10L, 7.0)))
    val row = AsOf.backward(l, r, Seq("k"), "t", Seq("price")).head
    assert(row.getAs[Double]("price") == 7.0)
    assert(row.getAs[Long]("matched_time") == 10L)
  }

  test("distinct right rows at the same instant resolve deterministically (greatest value tuple)") {
    val l = df(leftSchema, Seq(Row("a", 10L, "x")))
    val r = df(rightSchema, Seq(Row("a", 9L, 1.0), Row("a", 9L, 2.0)))
    (1 to 3).foreach { _ =>
      val row = AsOf.backward(l, r, Seq("k"), "t", Seq("price")).head
      assert(row.getAs[Double]("price") == 2.0)
    }
  }

  test("a null value inside the LATEST right row is carried, not skipped for a stale one") {
    val l = df(leftSchema, Seq(Row("a", 10L, "x")))
    val r = df(rightSchema, Seq(Row("a", 5L, 1.0), Row("a", 8L, null)))
    val row = AsOf.backward(l, r, Seq("k"), "t", Seq("price")).head
    assert(row.getAs[Long]("matched_time") == 8L)
    assert(row.isNullAt(row.fieldIndex("price"))) // the t=8 row's null, not 1.0
  }
}
