package graft.ops

import graft.SparkSpec
import java.sql.Date

/** Decay-weighted spend (q75) and min–max scaling (q76). */
class FeaturesSpec extends SparkSpec {
  import spark.implicits._

  test("decayed spend: hand-computed fixed-point sum") {
    // one customer, orders 10.00, 20.00, 40.00 on consecutive days:
    //   t=1: 1000 div 2                           = 500
    //   t=2: 2000 div 2 + 1000 div 4              = 1250
    //   t=3: 4000 div 2 + 2000 div 4 + 1000 div 8 = 2625
    val orders = Seq(
      (7L, 1L, Date.valueOf("2024-01-01"), 10.0),
      (7L, 2L, Date.valueOf("2024-01-02"), 20.0),
      (7L, 3L, Date.valueOf("2024-01-03"), 40.0)
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = Features.decayedSpendOf(orders, 16).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 500L, 2L -> 1250L, 3L -> 2625L))
  }

  test("decayed spend: floor division is per-term, not on the sum") {
    // 0.01 then 0.01: t=2 gets 1 div 2 + 1 div 4 = 0 + 0, NOT (1+1) div 4
    val orders = Seq(
      (1L, 1L, Date.valueOf("2024-01-01"), 0.01),
      (1L, 2L, Date.valueOf("2024-01-02"), 0.01)
    ).toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    val got = Features.decayedSpendOf(orders, 16).collect()
      .map(r => r.getLong(1) -> r.getLong(2)).toMap
    assert(got == Map(1L -> 0L, 2L -> 0L))
  }

  test("decayed spend: history truncates at the lag budget") {
    // 17 orders of 655.36 (65536 cents); at the 17th, the first order
    // sits at lag 16 — beyond a 16-lag budget it contributes nothing,
    // within a 17-lag budget it contributes 65536 div 2^17 = 0... use a
    // big head value so the difference is visible: head 1310.72
    // (131072 cents) at lag 16 under lags=17 adds 131072 div 2^17 = 1
    val head = (5L, 100L, Date.valueOf("2024-01-01"), 1310.72)
    val tail = (1 to 16).map(i =>
      (5L, 100L + i, Date.valueOf(f"2024-01-${i + 1}%02d"), 655.36))
    val orders = (head +: tail)
      .toDF("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
    def last(lags: Int): Long =
      Features.decayedSpendOf(orders, lags).collect()
        .find(_.getLong(1) == 116L).get.getLong(2)
    assert(last(17) == last(16) + 1L)
  }

  test("decayed spend: per-customer isolation and graded determinism") {
    val a = Features.decayedSpend(spark, "/root/testdata/sf0.001").collect()
    val b = Features.decayedSpend(spark, "/root/testdata/sf0.001").collect()
    assert(a.nonEmpty && a.sameElements(b))
    // a customer's first order decays only itself: cents div 2
    val orders = Tables(spark, "/root/testdata/sf0.001", "orders")
      .select("o_custkey", "o_orderkey", "o_orderdate", "o_totalprice")
      .collect()
      // o_orderdate surfaces as a timestamp here; ISO string order ==
      // chronological order, which is all the min-pick needs
      .map(r => (r.getLong(0), r.getLong(1), r.get(2).toString,
        r.getDouble(3)))
    val firsts = orders.groupBy(_._1).values.map(_.minBy(o =>
      (o._3, o._2))).map(o =>
      o._2 -> math.round(o._4 * 100) / 2).toMap
    val got = a.map(r => r.getLong(1) -> r.getLong(2)).toMap
    firsts.foreach { case (ok, want) => assert(got(ok) == want, s"order $ok") }
  }

  test("min-max scaling: hand case with a constant dimension") {
    val vecs = Seq(
      (1L, Seq(1.0f, 5.0f, 7.0f)),
      (2L, Seq(3.0f, 5.0f, 3.0f)),
      (3L, Seq(5.0f, 5.0f, 5.0f))
    ).toDF("vec_id", "embedding")
    val got = Features.minmaxScaledOf(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(got((1L, 0L)) == 0.0 && got((2L, 0L)) == 0.5 &&
      got((3L, 0L)) == 1.0)
    // constant dim pinned to 0, not NaN
    Seq(1L, 2L, 3L).foreach(v => assert(got((v, 1L)) == 0.0))
    assert(got((1L, 2L)) == 1.0 && got((2L, 2L)) == 0.0 &&
      got((3L, 2L)) == 0.5)
  }

  test("embedding drift: volumes exact, statistic bounded and falsifiable") {
    val rows = Features.embeddingDriftReport(spark, "/root/testdata/sf0.001", 16)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3)))
    assert(rows.length == 64)
    val nVecs = Tables(spark, "/root/testdata/sf0.001", "embeddings").count()
    rows.foreach { case (_, full, half, drift) =>
      assert(full == nVecs)
      assert(half <= full && half > 0)
      // |Σ(2h−f)| ≤ Σ|2h−f| ≤ 2·full; an unshifted hash-half stays low
      assert(drift >= math.abs(2 * half - full) && drift <= 2 * full)
    }
    // falsifiability: plant a REAL shift — give md5-half members value
    // 0 and the rest value 1, so the half's mass sits entirely in the
    // bottom bucket. Expected drift = n exactly (|2h−f| = h in the
    // bottom bucket + f in the top), vs ≈|2·n_half − n| for an
    // unshifted candidate.
    import spark.implicits._
    val n = 200
    val members = spark.range(n).toDF("vec_id")
      .withColumn("in_half",
        org.apache.spark.sql.functions.expr(
          Sampling.bucketExpr("vec_id")) < 50)
      .collect().map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    val planted = (0 until n).map(i =>
      (i.toLong, Seq(if (members(i.toLong)) 0.0f else 1.0f)))
      .toDF("vec_id", "embedding")
    val drift = Features.embeddingDriftReportOf(planted, 4).collect()
      .map(r => r.getLong(0) -> r.getLong(3)).toMap
    assert(drift(0L) == n.toLong, s"planted shift must score n: $drift")
  }

  test("min-max scaling: graded output lands in [0,1] and spans it") {
    val rows = Features.minmaxScaledEmbeddings(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(1), r.getDouble(2)))
    assert(rows.nonEmpty)
    assert(rows.forall { case (_, s) => s >= 0.0 && s <= 1.0 })
    // every dimension with spread realizes both endpoints
    rows.groupBy(_._1).values.foreach { dim =>
      val vals = dim.map(_._2)
      if (vals.distinct.length > 1)
        assert(vals.min == 0.0 && vals.max == 1.0)
    }
  }
}
