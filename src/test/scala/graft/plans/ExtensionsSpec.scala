package graft.plans

import graft.SparkSpec
import graft.ops.Events
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The SparkSessionExtensions path: a session built with
  * `GraftExtensions` plans the NAIVE point-in-interval predicate as the
  * grid-bucketed equi-join when the cell-size conf is set — same query
  * text, no library call, no nested-loop join.
  */
class ExtensionsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def withExtSession[A](f: SparkSession => A): A = {
    val base = spark // force SparkSpec's shared session to exist first
    SparkSession.clearActiveSession()
    SparkSession.clearDefaultSession()
    // The builder call sits INSIDE the try: if getOrCreate throws, the
    // finally must still restore base as default/active or every later
    // suite in this JVM inherits an unset session.
    try {
      // reuses base's SparkContext; builds a NEW session so the
      // extensions actually register (they only apply at session build)
      val ext = SparkSession.builder()
        .withExtensions(new GraftExtensions)
        .getOrCreate()
      f(ext)
    } finally {
      SparkSession.setDefaultSession(base)
      SparkSession.setActiveSession(base)
    }
  }

  private def naiveJoin(s: SparkSession) = {
    val ev = Events.events(s, dir).select(col("ts_us"), col("event_id"))
    val windows = graft.TestData.syntheticWindows(s, 20)
    ev.join(windows, col("ts_us") >= col("s") && col("ts_us") < col("e"))
  }

  test("naive range join is rewritten to a hash join when the conf is set") {
    withExtSession { ext =>
      ext.conf.set(RangeJoinRewrite.CellSizeKey, "3600000000")
      try {
        val joined = naiveJoin(ext)
        val plan = joined.queryExecution.sparkPlan.toString
        assert(!plan.contains("NestedLoop"), plan)
        // identical results to the same query with the rule disabled —
        // rows, not sets: the rewrite must not change multiplicity
        val got = joined.select("event_id", "w_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == got.toSet.size, "rewrite duplicated rows")
        ext.conf.unset(RangeJoinRewrite.CellSizeKey)
        val naive = naiveJoin(ext)
        assert(naive.queryExecution.sparkPlan.toString.contains("NestedLoop"))
        val expected = naive.select("event_id", "w_id").collect()
          .map(r => (r.getLong(0), r.getLong(1)))
        assert(got.length == expected.length && got.toSet == expected.toSet
          && got.nonEmpty)
      } finally ext.conf.unset(RangeJoinRewrite.CellSizeKey)
    }
  }

  test("rewritten join == driver-side containment scan, random intervals incl. inverted & negative") {
    import org.scalacheck.Gen
    import org.scalacheck.rng.Seed
    def sample[A](g: Gen[A], seed: Long): A =
      g(Gen.Parameters.default, Seed(seed)).getOrElse(fail(s"no sample @ $seed"))
    withExtSession { ext =>
      import ext.implicits._
      ext.conf.set(RangeJoinRewrite.CellSizeKey, "7")
      try {
        (0 until 4).foreach { i =>
          val seed = 4000L + i
          val points = sample(Gen.listOfN(40, Gen.chooseNum(-50L, 50L)), seed).distinct
          val intervals = sample(Gen.listOfN(12, for {
            s <- Gen.chooseNum(-50L, 50L)
            e <- Gen.chooseNum(-50L, 50L) // unordered: ~half inverted/empty
          } yield (s, e)), seed + 500)
            .zipWithIndex.map { case ((s, e), idx) => (idx.toLong, s, e) }
          val expected = (for {
            p <- points
            (id, s, e) <- intervals if p >= s && p < e
          } yield (id, p)).toSet
          val joined = points.toDF("p").join(intervals.toDF("w_id", "s", "e"),
            col("p") >= col("s") && col("p") < col("e"))
          assert(!joined.queryExecution.sparkPlan.toString.contains("NestedLoop"))
          val rows = joined.select("w_id", "p").collect()
            .map(r => (r.getLong(0), r.getLong(1)))
          val got = rows.toSet
          // (w_id, p) pairs are unique, so row count pins multiplicity
          assert(rows.length == expected.size && got == expected,
            s"seed $seed: missed ${(expected -- got).take(3)}, " +
              s"extra ${(got -- expected).take(3)}")
        }
      } finally ext.conf.unset(RangeJoinRewrite.CellSizeKey)
    }
  }

  test("cosine_sim resolves without registration in an extensions session") {
    withExtSession { ext =>
      import ext.implicits._
      val df = Seq((Array(0.1f, 0.2f), Array(0.1f, 0.2f))).toDF("a", "b")
      val one = df.selectExpr("cosine_sim(a, b)").head.getDouble(0)
      assert(math.abs(one - 1.0) < 1e-12)
      // wrong arity fails with a clear message at analysis, not an
      // IndexOutOfBoundsException from inside the builder
      val err = intercept[Throwable] { df.selectExpr("cosine_sim(a)") }
      val msgs = Iterator.iterate(err)(_.getCause).takeWhile(_ != null)
        .map(t => String.valueOf(t.getMessage)).toSeq
      assert(msgs.exists(_.contains("exactly 2 arguments")), msgs.mkString(" | "))
    }
  }

  test("the rule leaves non-matching joins and other sessions untouched") {
    withExtSession { ext =>
      ext.conf.set(RangeJoinRewrite.CellSizeKey, "3600000000")
      try {
        // equi-join: not the range-join shape, must not be touched
        val ev = Events.events(ext, dir).select("ts_us", "event_id")
        val eq = ev.as("a").join(ev.as("b"), "event_id")
        assert(eq.count() > 0)
        // the base session has no extensions: same conf key, still BNLJ
        spark.conf.set(RangeJoinRewrite.CellSizeKey, "3600000000")
        try {
          val basePlan = naiveJoin(spark).queryExecution.sparkPlan.toString
          assert(basePlan.contains("NestedLoop"), basePlan)
        } finally spark.conf.unset(RangeJoinRewrite.CellSizeKey)
      } finally ext.conf.unset(RangeJoinRewrite.CellSizeKey)
    }
  }
}
