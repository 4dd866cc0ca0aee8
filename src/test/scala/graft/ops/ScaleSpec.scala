package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scale-technique tests: these assert PLAN SHAPES, not just results —
  * the properties that matter at 100 TB (shuffle placement, bucket
  * pruning) are decided at plan time and are checkable at any data size.
  */
class ScaleSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("salted join returns exactly the unsalted result") {
    val li = Tables(spark, dir, "lineitem")
    // synthetic skew: fold most keys onto one hot key
    val fact = li.select(
      when(col("l_orderkey") % 7 =!= 0, lit(42L)).otherwise(col("l_orderkey"))
        .as("k"),
      col("l_linenumber"), col("l_quantity"))
    val dim = fact.select(col("k")).distinct()
      .withColumn("dim_tag", col("k") * 2)
    val plain = fact.join(dim, "k")
    val salted = SkewJoin.salted(fact, dim, "k", 8, col("l_linenumber"))
    assert(salted.count() == plain.count())
    val a = salted.groupBy("k").agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      .orderBy("k").collect().toSeq
    val b = plain.groupBy("k").agg(count(lit(1)).as("n"), sum("l_quantity").as("s"))
      .orderBy("k").collect().toSeq
    assert(a == b)
  }

  test("salted join shuffles on (key, salt), spreading the hot key") {
    val li = Tables(spark, dir, "lineitem")
    val fact = li.select(lit(1L).as("k"), col("l_linenumber"))
    val dim = fact.select(col("k")).distinct().withColumn("d", lit(true))
    val salted = SkewJoin.salted(fact, dim, "k", 8, col("l_linenumber"))
    val plan = salted.queryExecution.sparkPlan.toString
    assert(plan.contains("__salt"), plan)
  }

  test("date-partitioned writes prune partitions at the scan") {
    import java.nio.file.Files
    val out = Files.createTempDirectory("events_part").toString
    Events.events(spark, dir)
      .withColumn("day", to_date(col("ts_utc")))
      .write.partitionBy("day").mode("overwrite").parquet(out)
    val pruned = spark.read.parquet(out)
      .filter(col("day") === "2024-01-05")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters"), scan)
    val expected = Events.events(spark, dir)
      .filter(to_date(col("ts_utc")) === "2024-01-05").count()
    assert(pruned.count() == expected)
    // the pruned scan reads only 1 of ~30 day-directories
    val dirs = new java.io.File(out).listFiles.count(_.getName.startsWith("day="))
    assert(dirs > 10, s"expected many day partitions, got $dirs")
  }

  test("grid-bucketed range join avoids the nested-loop plan and matches the naive join") {
    val ev = Events.events(spark, dir).select(col("ts_us"), col("event_id"))
    val windows = spark.range(20).select(
      col("id").as("w_id"),
      (lit(1704067200000000L) + col("id") * 25200000000L).as("s"),
      (lit(1704067200000000L) + col("id") * 25200000000L +
        ((col("id") % 5) + 1) * 3600000000L).as("e"))
    val bucketed = RangeJoin.pointInInterval(ev, windows, "ts_us", "s", "e",
      3600000000L)
    val plan = bucketed.queryExecution.sparkPlan.toString
    assert(!plan.contains("NestedLoop"), plan)
    val naive = ev.join(windows, col("ts_us") >= col("s") && col("ts_us") < col("e"))
    assert(naive.queryExecution.sparkPlan.toString.contains("NestedLoop"))
    val a = bucketed.select("event_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val b = naive.select("event_id", "w_id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(a == b && a.nonEmpty)
  }

  test("bucketed tables co-locate: the join plans with zero shuffles") {
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      Tables(spark, dir, "lineitem")
        .select("l_orderkey", "l_quantity", "l_extendedprice")
        .write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
        .mode("overwrite").saveAsTable("li_bucketed")
      Tables(spark, dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
        .mode("overwrite").saveAsTable("ord_bucketed")
      val joined = spark.table("li_bucketed")
        .join(spark.table("ord_bucketed"),
          col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(!plan.contains("Exchange"), s"bucketed join still shuffles:\n$plan")
      // and the result is still correct
      val expected = Tables(spark, dir, "lineitem")
        .join(Tables(spark, dir, "orders"),
          col("l_orderkey") === col("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.sql("DROP TABLE IF EXISTS li_bucketed")
      spark.sql("DROP TABLE IF EXISTS ord_bucketed")
      spark.conf.set("spark.sql.adaptive.enabled", "true")
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
    }
  }
}
