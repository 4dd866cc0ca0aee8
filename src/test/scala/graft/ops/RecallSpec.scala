package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Recall probes for the LSH-bucketed ANN family (q29/q30).
  *
  * This is the one correctness signal the driver's DuckDB hash-match
  * oracle structurally CANNOT provide: an ANN that finds nothing (or a
  * degenerate candidate set) still hash-matches, because both engines
  * compute the same wrong answer identically. The planted near-dup
  * corpus (`Similarity.plantedCorpus`) and the brute-force q21 ranking
  * (`cosineTopK`) are the ground truths these tests compare against.
  */
class RecallSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** (q_id, vec_id) membership set of lshAnn's top-k at the given LSH
    * parameterization.
    */
  private def annHits(nTables: Int, bitsPerTable: Int): Set[(Long, Long)] =
    Similarity.lshAnn(spark, dir, nTables, bitsPerTable, k = 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** Ground truth (computed once per suite): brute-force cosine top-3
    * per query, and the coarse 2x4 ANN hit set — both reused by the
    * recall-floor and monotonicity tests.
    */
  private lazy val brute: Set[(Long, Long)] =
    Similarity.cosineTopK(spark, dir)
      .filter(col("rn") <= 3).select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
  private lazy val hits24: Set[(Long, Long)] = annHits(2, 4)

  test("q30: embeddingNearDups recovers 100% of planted pairs at graded params") {
    // every 50th vector is re-added verbatim under vec_id + 100,000;
    // 500 vectors -> 10 planted identical pairs, and the synthetic
    // embeddings have no natural cosine >= 0.999. Graded defaults are
    // 2 tables x 12 bits (4096 buckets/table): near-identical vectors
    // agree on every hyperplane sign, so recall survives narrow buckets.
    val expected = (0L until 500L by 50L).map(id => (id, id + 100000L)).toSet
    val got = Similarity.embeddingNearDups(spark, dir)
      .select("id_a", "id_b", "cos").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(got.map(p => (p._1, p._2)).toSet == expected,
      s"planted-pair recall != 1.0: got ${got.toSeq.sortBy(_._1)}")
    // identical vectors: cosine rounds to exactly 1.0
    assert(got.forall(_._3 == 1.0))
  }

  test("q30: planted-pair recall is 1.0 across the parameter grid") {
    // Identical vectors agree on EVERY hyperplane sign, so they share a
    // bucket in every table at any parameterization — near-dup recall
    // survives the candidate-count knob (unlike top-k ANN recall, which
    // trades against it). This is exactly why the graded default could
    // move from 4 to 12 bits, and why at 100 TB bits can keep growing
    // toward log2(N).
    val expected = (0L until 500L by 50L).map(id => (id, id + 100000L)).toSet
    for ((t, bpt) <- Seq((2, 4), (4, 8), (1, 16))) {
      val got = Similarity
        .embeddingNearDups(spark, dir, nTables = t, bitsPerTable = bpt)
        .select("id_a", "id_b").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      assert(got == expected, s"recall != 1.0 at ${t}x$bpt: $got")
    }
  }

  test("q29: lshAnn top-3 recall — the graded 16x4 shape, and both levers") {
    assert(brute.size == 8 * 3)
    def recall(t: Int, bpt: Int): Double =
      brute.intersect(if (t == 2 && bpt == 4) hits24 else annHits(t, bpt))
        .size.toDouble / brute.size
    // This corpus is a HARD case for sign-LSH: true top-3 neighbors sit
    // at only ~0.4 cosine (~64 deg), so per-plane agreement is ~0.64 and
    // a 4-bit table catches a true neighbor with p ~ 0.17. All recalls
    // here are deterministic (planes are fixed by global index) and
    // asserted as floors so a silent candidate-generation regression to
    // ~0 recall fails here.
    val coarse = recall(2, 4)
    assert(coarse >= 0.25, f"2x4 recall $coarse%.3f < 0.25")
    // the intermediate lever point: 8 tables x 4 bits measures 0.625 —
    // a recall a 100 TB deployment would NOT ship, which is why the
    // graded parameterization moved past it
    val mid = recall(8, 4)
    assert(mid >= 0.6, f"8x4 recall $mid%.3f < 0.6")
    // the graded default (SparkEntry's LshAnnTables x LshAnnBits):
    // 16 tables x 4 bits measures 0.875 on this corpus — more tables =
    // more candidate unions (cost: 16 bucket joins, still no cross join)
    val graded = recall(16, 4)
    assert(graded >= 0.85, f"graded 16x4 recall $graded%.3f < 0.85")
    assert(graded > coarse + 0.3, "the nTables lever must materially raise recall")
  }

  test("q41: multi-probe reaches multi-table recall at a fraction of the tables") {
    // Hamming-1 probing makes a table catch a true neighbor that
    // disagrees on exactly one hyperplane sign. Probing 1+4 of 16
    // buckets across 2 tables must (a) strictly beat single-probe at
    // the same 2x4 (candidate superset: probe f=bk is included), and
    // (b) reach the recall neighborhood of 8 single-probe tables —
    // the memory-for-lookups trade a deployment actually makes.
    val mp = Similarity.lshAnnMultiProbe(spark, dir, 2, 4, k = 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val mpRecall = brute.intersect(mp).size.toDouble / brute.size
    val single = brute.intersect(hits24).size.toDouble / brute.size
    assert(mpRecall > single,
      f"multi-probe 2x4 $mpRecall%.3f did not beat single-probe $single%.3f")
    val eight = brute.intersect(annHits(8, 4)).size.toDouble / brute.size
    assert(mpRecall >= eight - 0.1,
      f"multi-probe 2x4 $mpRecall%.3f far below 8x4 single-probe $eight%.3f")
  }

  test("q41: recall floor at the GRADED parameterization (4x4)") {
    // the graded point (SparkEntry.MultiProbeTables x MultiProbeBits =
    // 4x4) measures 1.000 here and 0.958 at sf0.01 — the floor asserts
    // the deployment-grade regime survives corpus drift, the same
    // ratchet q29 carries at its graded 16x4
    val mp = Similarity.lshAnnMultiProbe(spark, dir, 4, 4, k = 3)
      .select("q_id", "vec_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val rec = brute.intersect(mp).size.toDouble / brute.size
    assert(rec >= 0.8, f"graded 4x4 multi-probe recall $rec%.3f < 0.8")
  }

  test("q29: the nTables lever monotonically improves recall") {
    // with the same bitsPerTable, tables 0..1 of the 4-table variant use
    // the SAME hyperplanes as the 2-table variant (planes are derived
    // from their global index), so the 4-table candidate set is a strict
    // superset and top-k recall cannot decrease. This is the lever a
    // 100 TB deployment turns when recall matters more than cost.
    val r2 = brute.intersect(hits24).size.toDouble / brute.size
    val r4 = brute.intersect(annHits(4, 4)).size.toDouble / brute.size
    assert(r4 >= r2, f"recall(4x4)=$r4%.3f < recall(2x4)=$r2%.3f")
  }
}
