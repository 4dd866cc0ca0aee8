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

  test("curated packing holds only train docs and tiles windows exactly") {
    val pieces = TrainingPipeline.curatedPackedSequences(spark, dir, 64L)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(4)))
    assert(pieces.nonEmpty)
    // leak check: every packed doc is a TRAIN survivor — validation and
    // test buckets must never enter the mounted artifact
    val packedIds = pieces.map(_._1).toSet
    val trainIds = out.collect {
      case (id, (_, "train")) => id
    }.toSet
    assert(packedIds == trainIds,
      s"packed set != curated train split (diff ${(packedIds -- trainIds).take(3)} / ${(trainIds -- packedIds).take(3)})")
    // windows tile exactly: within each seq, pieces sum to 64 except the
    // final ragged window
    val total = pieces.map(_._4).sum
    val lastSeq = (total - 1) / 64L
    pieces.groupBy(_._2).foreach { case (seq, ps) =>
      val at = ps.map(_._4).sum
      if (seq < lastSeq) assert(at == 64L, s"seq $seq not full: $at")
    }
  }
}
