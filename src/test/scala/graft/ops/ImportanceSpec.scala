package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._

class ImportanceSpec extends SparkSpec {

  import spark.implicits._

  /** Controlled corpus sized for the smoothed ratio: the 'en' docs speak
    * vocabulary A, the 'de' docs vocabulary B, one planted 'de' doc
    * speaks vocabulary A. Occurrence totals must be comparable to
    * [[Importance.NumBuckets]] for the add-one smoothing to leave the
    * prior's shadow (a 19-gram corpus decides every bucket by the +1
    * alone) — hence 60 docs x 59 bigrams per side, not six toy rows.
    */
  private val aText = Seq.fill(10)("alpha beta gamma delta epsilon zeta")
    .mkString(" ")
  private val bText = Seq.fill(10)("zig zag zorn zug uhr berg").mkString(" ")
  private def corpus = {
    val en = (1L to 60L).map(id => (id, "en", aText))
    val de = (101L to 160L).map(id => (id, "de", bText))
    val planted = Seq((999L, "de", aText)) // A-vocab under a de label
    val single = Seq((1000L, "en", "zz")) // one token: no bigrams
    (en ++ de ++ planted ++ single).toDF("doc_id", "lang", "text")
  }

  test("target-vocabulary docs are kept, off-vocabulary docs dropped") {
    val out = Importance.importanceReportOf(corpus, "en").collect()
    val byId = out.map(r => r.getLong(0) -> r).toMap
    // the single-token doc has no bigram: excluded from the report
    assert(!byId.contains(1000L))
    assert(byId.size == 121)
    def keep(id: Long) = byId(id).getBoolean(3)
    assert((1L to 60L).forall(keep), "en docs over A-vocab must be kept")
    assert((101L to 160L).forall(id => !keep(id)),
      "de docs over B-vocab must be dropped")
    // the planted A-vocab doc is kept DESPITE its non-target label —
    // importance weighting scores content, not metadata
    assert(keep(999L), "A-vocab doc with de label must be kept")
  }

  test("n_grams counts bigram occurrences, not distinct bigrams") {
    val out = Importance.importanceReportOf(corpus, "en").collect()
    val grams = out.map(r => r.getLong(0) -> r.getLong(1)).toMap
    // every repeated doc has 60 tokens -> 59 bigram occurrences, only
    // ~6 distinct bigrams
    assert(grams(1L) == 59L)
    assert(grams(101L) == 59L)
    assert(grams(999L) == 59L)
  }

  test("verdict counts are internally consistent") {
    Importance.importanceReportOf(corpus, "en").collect().foreach {
      case Row(id: Long, n: Long, pos: Long, keep: Boolean) =>
        assert(pos >= 0 && pos <= n, s"doc $id")
        assert(keep == (pos * 2 > n), s"doc $id majority rule")
    }
  }

  test("hashed bigram counts partition the occurrence total") {
    val counts = Importance.hashedBigramCounts(corpus)
    val total = counts.agg(sum("cnt")).collect()(0).getLong(0)
    // 121 docs x 59 occurrences (the single-token doc contributes none)
    assert(total == 121L * 59L)
    val buckets = counts.select("bucket").distinct().collect()
      .map(_.getLong(0))
    assert(buckets.forall(b => b >= 0 && b < Importance.NumBuckets))
  }

  test("unplanted report covers every multi-token document, verdicts consistent") {
    // The synthetic corpus draws ALL languages from one shared 31-word
    // vocabulary, so `lang` carries no bigram-distribution signal — the
    // smoothed likelihood ratio correctly leans almost nowhere and the
    // UNPLANTED keep-rate is near zero ON THIS DATA (both engines
    // agree; the separability tests above run on controlled
    // vocabularies, and the graded corpus plants one — next test).
    val dir = "/root/testdata/sf0.001"
    val docs = Tables(spark, dir, "documents")
    val out = Importance.importanceReportOf(docs, "en").collect()
    val expected = TextOps.tokenized(spark, dir)
      .filter(size($"toks") >= 2).count()
    assert(out.length.toLong == expected)
    out.foreach {
      case Row(id: Long, n: Long, pos: Long, keep: Boolean) =>
        assert(n >= 1 && pos <= n && keep == (pos * 2 > n), s"doc $id")
    }
    CachedStages.release(spark)
  }

  test("graded corpus plants make both verdict branches live at the graded scale") {
    // sf0.01 is the scale the driver grades; the plant density is sized
    // so the tonic vocabulary out-leans the smoothing there
    val out = Importance.importanceReport(spark, "/root/testdata/sf0.01")
      .collect().map(r => r.getLong(0) -> r.getBoolean(3)).toMap
    val enPlanted = out.keys.filter(id => id >= 2000000L && id < 3000000L)
    val xxTonic = out.keys.filter(id => id >= 3000000L && id < 4000000L)
    val xxJunk = out.keys.filter(id => id >= 4000000L)
    assert(enPlanted.nonEmpty && xxTonic.nonEmpty && xxJunk.nonEmpty)
    assert(enPlanted.forall(out), "en-labeled tonic docs must be kept")
    assert(xxTonic.forall(out),
      "xx-labeled tonic docs must be kept — content over metadata")
    assert(xxJunk.forall(id => !out(id)), "junk-vocab docs must be dropped")
    CachedStages.release(spark)
  }
}
