package graft.ops

import graft.SparkSpec
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based check of the q101 BPE trainer: over random small
  * vocabularies, `TextOps.bpeTrain`'s learned merge table AND its final
  * rewritten vocabulary must equal an independent driver-side reference
  * implementation of Sennrich-style BPE (count adjacent pairs weighted
  * by word frequency, adopt the max with ties on the "lhs rhs" string
  * ascending, greedy left-to-right non-overlapping rewrite). The
  * three-letter alphabet makes repeated-symbol words ("aaaa" class)
  * common, exercising the overlap semantics of the spaced-string
  * `replace` rewrite that the single QueriesSpec fixture can't cover,
  * and small vocabs routinely exhaust their pairs before round k,
  * exercising the early-stop path.
  */
class BpePropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(
      fail(s"generator produced no sample for seed $seed"))

  private val genWord: Gen[String] =
    Gen.chooseNum(1, 6).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf('a', 'b', 'c')).map(_.mkString))
  private val genVocab: Gen[Map[String, Long]] =
    Gen.chooseNum(1, 12).flatMap(n =>
      Gen.listOfN(n, Gen.zip(genWord, Gen.chooseNum(1L, 20L))).map(_.toMap))

  /** Driver-side reference BPE trainer (independent of the Spark plan):
    * returns (merge table rows, final vocab as symbol lists).
    */
  private def refBpe(words: Seq[(String, Long)], k: Int)
      : (Seq[(Long, String, String, String, Long)], Seq[(String, Vector[String], Long)]) = {
    var vocab = words.map { case (w, f) => (w, w.map(_.toString).toVector, f) }
    val out = scala.collection.mutable.ArrayBuffer
      .empty[(Long, String, String, String, Long)]
    var step = 1
    var done = false
    while (step <= k && !done) {
      val counts = scala.collection.mutable.Map.empty[(String, String), Long]
      for ((_, syms, f) <- vocab; i <- 0 until syms.length - 1) {
        val p = (syms(i), syms(i + 1))
        counts(p) = counts.getOrElse(p, 0L) + f
      }
      if (counts.isEmpty) done = true
      else {
        val ((lhs, rhs), n) =
          counts.toSeq.minBy { case ((l, r), c) => (-c, l + " " + r) }
        out += ((step.toLong, lhs, rhs, lhs + rhs, n))
        vocab = vocab.map { case (w, syms, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < syms.length) {
            if (i + 1 < syms.length && syms(i) == lhs && syms(i + 1) == rhs) {
              b += lhs + rhs; i += 2
            } else { b += syms(i); i += 1 }
          }
          (w, b.result(), f)
        }
      }
      step += 1
    }
    (out.toSeq, vocab)
  }

  test("bpeTrain merges and final vocab == driver-side reference, random vocabs") {
    (0 until 8).foreach { i =>
      val words = sample(genVocab, 4400L + i).toSeq.sortBy(_._1)
      val k = i % 5 + 1
      val (refMerges, refVocab) = refBpe(words, k)
      val (mergesDf, vocabDf) = TextOps.bpeTrain(
        words.toDF("word", "freq"), k)
      val gotMerges = mergesDf.collect()
        .map(r => (r.getLong(0), r.getString(1), r.getString(2),
          r.getString(3), r.getLong(4))).toSeq
      assert(gotMerges == refMerges, s"seed ${4400L + i} k=$k words=$words")
      // the rewritten vocabulary must agree too — same spaced-symbol
      // encoding the q102 encoder consumes
      val gotVocab = vocabDf.collect()
        .map(r => (r.getString(0), r.getString(1), r.getLong(2)))
        .sortBy(_._1).toSeq
      val expVocab = refVocab.map { case (w, syms, f) =>
        (w, syms.mkString(" ", "  ", " "), f)
      }.sortBy(_._1)
      assert(gotVocab == expVocab, s"seed ${4400L + i} k=$k words=$words")
    }
  }

  test("bpeTrain on a pair-exhausted vocabulary stops without wiping the vocab") {
    // all single-char words: no adjacent pairs exist at all — the merge
    // table is empty and the vocabulary survives untouched (before the
    // early-stop fix the empty-winner cross-join emptied it)
    val (merges, vocab) = TextOps.bpeTrain(
      Seq(("a", 3L), ("b", 2L)).toDF("word", "freq"), 4)
    assert(merges.count() == 0)
    assert(merges.columns.toSeq ==
      Seq("step", "lhs", "rhs", "merged", "n_occ"))
    assert(vocab.orderBy("word").collect().map(r =>
      (r.getString(0), r.getString(1), r.getLong(2))).toSeq ==
      Seq(("a", " a ", 3L), ("b", " b ", 2L)))
  }
}
