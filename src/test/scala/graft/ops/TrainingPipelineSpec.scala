package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Cross-operator invariants of the q45 curation pipeline — value-level
  * correctness is the DuckDB oracle; these pin the COMPOSITION contracts
  * between the stages that the oracle (one fused query) cannot localize.
  */
class TrainingPipelineSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  lazy val out: Map[Long, (Long, String)] =
    TrainingPipeline.curatedSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap

  test("every non-canonical cluster member is dropped, every canonical kept or quality-filtered") {
    val comps = Dedup.dedupClusters(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val nonCanonical = comps.filter { case (d, c) => d != c }.map(_._1).toSet
    assert(nonCanonical.nonEmpty, "fixture lost its planted duplicates")
    assert(out.keySet.intersect(nonCanonical).isEmpty,
      s"non-canonical docs survived: ${out.keySet.intersect(nonCanonical).take(3)}")
    // a canonical doc missing from the output can only have been
    // quality-filtered, never dedup-dropped — so every cluster still has
    // a chance to be represented
    val canonical = comps.filter { case (d, c) => d == c }.map(_._1).toSet
    assert(canonical.exists(out.contains),
      "no canonical representative survived at all")
  }

  test("splits agree with q44's standalone assignment and quality respects the floor") {
    val splits = Sampling.hashSplit(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getString(2)).toMap
    out.foreach { case (id, (quality, split)) =>
      assert(quality >= 60, s"doc $id survived with quality $quality")
      // planted docs (id >= 1,000,000) are outside the documents table;
      // every original survivor must land in the SAME split q44 assigns —
      // the join-compatibility guarantee the hash split exists for
      if (id < 1000000L)
        assert(splits(id) == split,
          s"doc $id: pipeline split $split != standalone ${splits(id)}")
    }
  }
}
