package graft.tools

import scala.collection.mutable

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{DupExec, SparkSpec}

/** The duplicate-execution detector must catch the q120 HITS bug shape
  * (an unpersisted frame traversed twice compiles into two physical
  * executions of the same join+aggregate subtree) and must stay quiet
  * once the frame is persisted — the before/after of the round-17 fix.
  */
class DupExecSpec extends SparkSpec {
  import spark.implicits._

  private def occsOf(df: DataFrame): Seq[DupExec.Occ] = {
    val buf = mutable.Buffer[DupExec.Occ]()
    df.count() // materialize so AQE's executedPlan is the final plan
    DupExec.collect(0, df.queryExecution.executedPlan, buf)
    buf.toSeq
  }

  /** q120 shape in miniature: groupBy-sum frame, max-normalized by a
    * self-referencing crossJoin — the unpersisted `raw` is traversed
    * twice and both traversals execute.
    */
  private def rawSums: DataFrame = {
    val edges = (1 to 400).map(i => (i % 20, i % 7, i.toDouble))
      .toDF("k", "g", "w")
    edges.groupBy("k").agg(sum("w").as("s"))
  }

  test("intra: unpersisted twice-traversed aggregate is flagged") {
    val raw = rawSums
    val normalized = raw.crossJoin(broadcast(raw.agg(max("s").as("mx"))))
      .select($"k", ($"s" / $"mx").as("score"))
    val flags = DupExec.analyze(occsOf(normalized))
    assert(flags.nonEmpty, "expected the duplicated aggregate subtree to flag")
    assert(flags.exists(f => f.kind == "intra" &&
      f.classes.exists(_.contains("Aggregate"))))
  }

  test("persisted frame: both traversals read the cache — no flags") {
    val raw = rawSums.persist()
    try {
      raw.count() // materialize the cache first, as hitsHalfRound does
      val normalized = raw.crossJoin(broadcast(raw.agg(max("s").as("mx"))))
        .select($"k", ($"s" / $"mx").as("score"))
      val flags = DupExec.analyze(occsOf(normalized))
      assert(flags.isEmpty, s"persisted plan must not flag: $flags")
    } finally { raw.unpersist(blocking = true); () }
  }

  test("inter: pure from-files recompute across two actions is flagged") {
    val dir = java.nio.file.Files.createTempDirectory("dupexec").toString
    (1 to 500).map(i => (i % 30, i.toDouble)).toDF("k", "v")
      .write.mode("overwrite").parquet(dir)
    val agg = spark.read.parquet(dir).groupBy("k").agg(sum("v").as("s"))
    val occs = mutable.Buffer[DupExec.Occ]()
    agg.count()
    DupExec.collect(0, agg.queryExecution.executedPlan, occs)
    // a second action on the SAME unpersisted frame re-executes it; the
    // detector sees that as a fresh QueryExecution of an identical
    // all-file-leaf subtree
    val again = spark.read.parquet(dir).groupBy("k").agg(sum("v").as("s"))
    again.count()
    DupExec.collect(1, again.queryExecution.executedPlan, occs)
    val flags = DupExec.analyze(occs.toSeq)
    assert(flags.exists(_.kind == "inter"), s"expected inter flag: $flags")
  }

  test("self-join on raw scans alone (no heavy dup) stays quiet") {
    val t = (1 to 100).map(i => (i, i * 2)).toDF("a", "b")
    // the duplicated subtree is just the local scan — scan-only
    // duplication is normal self-join behavior, not a recompute bug
    val j = t.as("l").join(broadcast(t.as("r")), $"l.a" === $"r.b")
    val flags = DupExec.analyze(occsOf(j))
    assert(!flags.exists(_.classes.forall(c =>
      !c.contains("Join") && !c.contains("Aggregate"))) || flags.isEmpty)
    // the join itself appears once; nothing heavy is duplicated
    assert(flags.isEmpty, s"scan-only self-join must not flag: $flags")
  }

  test("single-reader report: a persist read once flags, read twice doesn't") {
    val once = rawSums.persist()
    val twice = rawSums.persist()
    try {
      val df1 = once.filter($"s" > 0) // one scan of `once`
      val df2 = twice.filter($"s" > 0)
        .union(twice.filter($"s" < 0)) // two scans of `twice`
      val o1 = occsOf(df1)
      val o2 = occsOf(df2)
      assert(DupExec.singleReaders(o1).size == 1, o1.map(_.node.detail))
      assert(DupExec.singleReaders(o2).isEmpty, o2.map(_.node.detail))
    } finally {
      once.unpersist(blocking = true); twice.unpersist(blocking = true); ()
    }
  }

  test("maximal-only: a duplicated parent subsumes its children") {
    val raw = rawSums
    // duplicate a parent that CONTAINS the aggregate: union of two
    // identical filter-over-aggregate branches
    val branch = raw.filter($"s" > 0)
    val u = branch.union(branch)
    val flags = DupExec.analyze(occsOf(u))
    // exactly one maximal flag for the duplicated branch, not one per
    // nested level (aggregate + exchange + filter would be three)
    assert(flags.count(_.kind == "intra") == 1, s"expected 1 maximal: $flags")
  }
}
