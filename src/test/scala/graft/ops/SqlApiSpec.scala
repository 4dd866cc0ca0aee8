package graft.ops

import graft.SparkSpec

/** The engine is equally drivable through `spark.sql` — temp views over
  * the same parquet give the full SQL surface, and Catalyst plans the SQL
  * and DataFrame formulations identically.
  */
class SqlApiSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("spark.sql TPC-H Q1 equals the DataFrame formulation") {
    Tables.all.foreach {
      case "events" => // TIMESTAMP(NANOS) parquet needs the dedicated reader
        Events.events(spark, dir).createOrReplaceTempView("events")
      case t => Tables(spark, dir, t).createOrReplaceTempView(t)
    }
    val sql = spark.sql(
      """SELECT l_returnflag, l_linestatus,
        |  CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
        |  COUNT(*) AS count_order
        |FROM lineitem
        |WHERE l_shipdate <= TIMESTAMP '1998-09-02'
        |GROUP BY l_returnflag, l_linestatus
        |ORDER BY l_returnflag, l_linestatus""".stripMargin)
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSeq
    val df = Relational.pricingSummary(spark, dir)
      .select("l_returnflag", "l_linestatus", "sum_qty", "count_order")
      .collect().map(r => (r.getString(0), r.getString(1), r.getDouble(2),
        r.getLong(3))).toSeq
    assert(sql == df)
  }

  test("registered cosine_sim works from SQL") {
    graft.functions.CosineSimilarity.register(spark)
    Tables(spark, dir, "embeddings").createOrReplaceTempView("embeddings")
    val r = spark.sql(
      "SELECT cosine_sim(embedding, embedding) AS c FROM embeddings LIMIT 5")
      .collect()
    assert(r.forall(row => math.abs(row.getDouble(0) - 1.0) < 1e-9))
  }
}
