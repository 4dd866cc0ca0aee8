package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class KmvDistinctSpec extends SparkSpec {

  test("exact regime: under k distinct values, sketch returns the exact count") {
    import spark.implicits._
    KmvDistinct.register(spark)
    val df = (1 to 1000).map(i => i % 40).toDF("x")
      .repartition(8) // force partial buffers + merges
      .withColumn("hv", expr(
        "CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
    val r = df.agg(expr("kmv_distinct(hv)").as("s"))
      .select("s.est_distinct", "s.kth_hash").head
    assert(r.getDouble(0) == 40.0)
    assert(r.isNullAt(1))
  }

  // k=64 gives relative std error ~1/sqrt(k-2) ≈ 12.7%; assert within ~3σ
  test("estimator regime: within ~38% of truth for 1000 distinct, and merge-order independent") {
    import spark.implicits._
    KmvDistinct.register(spark)
    def run(partitions: Int): (Double, Long) = {
      val df = (1 to 5000).map(i => i % 1000).toDF("x")
        .repartition(partitions)
        .withColumn("hv", expr(
          "CAST(conv(substring(md5(CAST(x AS STRING)), 1, 15), 16, 10) AS BIGINT)"))
      val r = df.agg(expr("kmv_distinct(hv)").as("s"))
        .select("s.est_distinct", "s.kth_hash").head
      (r.getDouble(0), r.getLong(1))
    }
    val (est2, kth2) = run(2)
    val (est16, kth16) = run(16)
    assert(est2 == est16 && kth2 == kth16) // order/partitioning independent
    assert(math.abs(est2 - 1000) / 1000.0 < 0.38, s"est=$est2")
  }
}
