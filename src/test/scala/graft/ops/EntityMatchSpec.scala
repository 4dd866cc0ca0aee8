package graft.ops

import graft.SparkSpec

/** Deletion-neighborhood fuzzy matching (q73): hand-computed edit-1
  * families, brute-force equality on random strings (the losslessness
  * claim), and the graded-surface shape.
  */
class EntityMatchSpec extends SparkSpec {
  import spark.implicits._

  private def lev(a: String, b: String): Int = {
    val d = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      d(i)(j) = math.min(math.min(d(i - 1)(j) + 1, d(i)(j - 1) + 1),
        d(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    d(a.length)(b.length)
  }

  private def run(names: Seq[(Long, String)]): Set[(Long, Long, Long)] =
    EntityMatch.fuzzyMatchesOf(names.toDF("id", "name"))
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist")))
      .toSet

  test("hand case: substitution, deletion, insertion all found") {
    val names = Seq(1L -> "abc", 2L -> "abd", 3L -> "ab",
      4L -> "abcd", 5L -> "xyz")
    // lev<=1 pairs: abc~abd (sub), abc~ab (del), abc~abcd (ins),
    // ab~abd (ins), abd~abcd (ins); xyz isolated
    assert(run(names) == Set(
      (1L, 2L, 1L), (1L, 3L, 1L), (1L, 4L, 1L),
      (2L, 3L, 1L), (2L, 4L, 1L)))
  }

  test("random strings: blocking is lossless vs brute force") {
    val rnd = new scala.util.Random(19)
    for (trial <- 1 to 3) {
      val names = (1L to 60L).map { i =>
        i -> (1 to 3 + rnd.nextInt(5)).map(_ => ('a' + rnd.nextInt(3)).toChar)
          .mkString
      }
      val want = (for {
        (ia, na) <- names; (ib, nb) <- names
        if ia < ib && lev(na, nb) <= 1
      } yield (ia, ib, lev(na, nb).toLong)).toSet
      assert(run(names) == want, s"trial $trial")
    }
  }

  test("duplicate names match at distance 0") {
    val names = Seq(1L -> "same", 2L -> "same", 3L -> "other")
    assert(run(names) == Set((1L, 2L, 0L)))
  }

  test("graded surface: digit-neighbor families, symmetric-free, sorted") {
    val out = EntityMatch.fuzzyNameMatches(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getAs[Long]("id_a"), r.getAs[Long]("id_b"),
        r.getAs[Long]("dist")))
    assert(out.nonEmpty)
    assert(out.forall { case (a, b, d) => a < b && d == 1L })
    // Customer#%09d: edit-1 pairs are exactly one-digit substitutions;
    // spot-check a known family (0 vs 1..9 in the last position)
    val zeroNbrs = out.filter(_._1 == 0L).map(_._2).toSet
    assert((1L to 9L).toSet.subsetOf(zeroNbrs))
    assert(out.sortBy(t => (t._1, t._2)).sameElements(out))
  }
}
