package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property-based invariants over randomly generated inputs for the
  * parameterizable operators (the fixture corpora exercise one data
  * shape; these cover the edges that shape can't reach). Plain
  * ScalaCheck generators with fixed seeds, like TransformsPropSpec —
  * deterministic runs, and each expectation is an INDEPENDENT
  * driver-side Scala implementation, not the Spark plan under test.
  */
class OpsPropSpec extends SparkSpec {
  import spark.implicits._

  private def sample[A](g: Gen[A], seed: Long): A =
    g(Gen.Parameters.default, Seed(seed)).getOrElse(
      fail(s"generator produced no sample for seed $seed"))

  // small vocabulary => heavy fingerprint collisions => the
  // within-value (sh_a == sh_b) pair logic gets exercised, not just
  // the cross-value banding
  private val vocab =
    Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "eta", "theta")
  private val genDoc: Gen[String] =
    Gen.chooseNum(1, 10).flatMap(n =>
      Gen.listOfN(n, Gen.oneOf(vocab)).map(_.mkString(" ")))
  private val genCorpus: Gen[List[String]] =
    Gen.chooseNum(5, 25).flatMap(n => Gen.listOfN(n, genDoc))

  test("simhash banded near-dup pairs == driver-side brute force, random corpora") {
    (0 until 6).foreach { i =>
      val texts = sample(genCorpus, 1000L + i)
      val df = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val bits = if (i % 2 == 0) 16 else 64
      val fp = Dedup.withSimhash(df, bits).select("doc_id", "simhash")
        .collect().map(r => (r.getLong(0), r.getLong(1))).sortBy(_._1)
      val expected = (for {
        a <- fp.indices; b <- fp.indices if fp(a)._1 < fp(b)._1
        h = java.lang.Long.bitCount(fp(a)._2 ^ fp(b)._2).toLong if h <= 3
      } yield (fp(a)._1, fp(b)._1, h)).toSet
      val got = Dedup.simhashNearDupPairs(df, bits, nBands = 4)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(got == expected,
        s"seed ${1000L + i} bits $bits: missed ${(expected -- got).take(3)}, " +
          s"extra ${(got -- expected).take(3)}")
    }
  }

  /** Independent driver-side SimHash: same md5-hex bit rule as the SQL
    * form (bit b < 32: low bit of hex digit b; b >= 32: bit (b div 32)
    * of hex digit (b mod 32)), so a hex-indexing or bit-order bug in
    * either implementation breaks the equality below.
    */
  private def simhashScala(text: String, bits: Int, weighted: Boolean): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val all = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
    val toks = if (weighted) all else all.distinct
    val hexes = toks.map(t =>
      md.digest(t.getBytes("UTF-8")).map("%02x".format(_)).mkString)
    (0 until bits).foldLeft(0L) { (acc, b) =>
      val vote = hexes.map { h =>
        val digit = Integer.parseInt(h.charAt(b % 32).toString, 16)
        if (((digit >> (b / 32)) & 1) == 1) 1 else -1
      }.sum
      if (vote >= 0) acc | (1L << b) else acc
    }
  }

  test("simhash (weighted and distinct) == independent driver-side implementation") {
    (0 until 4).foreach { i =>
      val texts = sample(genCorpus, 5000L + i)
      val df = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      for (weighted <- Seq(false, true); bits <- Seq(16, 64)) {
        val got = Dedup.withSimhash(df, bits, weighted)
          .select("doc_id", "simhash").collect()
          .map(r => r.getLong(0) -> r.getLong(1)).toMap
        texts.zipWithIndex.foreach { case (t, id) =>
          val exp = simhashScala(t, bits, weighted)
          assert(got(id.toLong) == exp,
            s"seed ${5000L + i} doc $id bits=$bits weighted=$weighted: " +
              s"spark=${got(id.toLong)} scala=$exp")
        }
      }
      // the small vocabulary repeats tokens heavily, so the weighted and
      // distinct forms must actually diverge somewhere in the corpus
      val w = Dedup.withSimhash(df, 64, weighted = true)
        .select("doc_id", "simhash").collect().map(r => r.getLong(1)).toSeq
      val d = Dedup.withSimhash(df, 64)
        .select("doc_id", "simhash").collect().map(r => r.getLong(1)).toSeq
      assert(w != d, "weighted fingerprints never diverged; test is vacuous")
    }
  }

  test("the 64-bit fingerprint's low 16 bits ARE the 16-bit fingerprint") {
    // bit terms 0..15 are identical at both widths, so the widths must
    // agree on the shared bits — a regression here means the graded
    // 16-bit oracle (q20/q31) and the production 64-bit path have
    // silently diverged
    val texts = sample(genCorpus, 7L)
    val df = texts.zipWithIndex
      .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
    def fps(bits: Int): Map[Long, Long] =
      Dedup.withSimhash(df, bits).select("doc_id", "simhash")
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val f16 = fps(16)
    val f64 = fps(64)
    assert(f16.keySet == f64.keySet)
    f16.foreach { case (id, v) =>
      assert((f64(id) & 0xffffL) == v,
        s"doc $id: 64-bit ${f64(id)} low bits != 16-bit $v")
    }
  }

  test("backward as-of == driver-side scan, random event streams") {
    // random streams with heavy timestamp ties and null values: for each
    // left row the match must be the right row with the greatest
    // (time, value-tuple) at time <= left time within the key — the
    // exact semantics AsOf.backward encodes via the struct-ordered
    // running window (round-1 review found tie/null bugs here that the
    // DuckDB oracle could not see; this pins them closed)
    (0 until 6).foreach { i =>
      val seed = 3000L + i
      val left = sample(Gen.listOfN(30, for {
        k <- Gen.oneOf("a", "b", "c")
        t <- Gen.chooseNum(0L, 20L)
      } yield (k, t)), seed)
        .zipWithIndex.map { case ((k, t), id) => (k, t, id.toLong) }
      val right = sample(Gen.listOfN(25, for {
        k <- Gen.oneOf("a", "b", "c", "d") // "d": right-only key
        t <- Gen.chooseNum(0L, 20L)
        p <- Gen.option(Gen.chooseNum(1, 9).map(_.toDouble))
      } yield (k, t, p)), seed + 500)
      val expected = left.map { case (k, lt, id) =>
        val cand = right.filter(r => r._1 == k && r._2 <= lt)
        if (cand.isEmpty) (id, None, None)
        else {
          // nulls sort smallest inside the struct, like Spark's asc
          val best = cand.maxBy { case (_, rt, p) =>
            (rt, p.getOrElse(Double.NegativeInfinity)) }
          (id, Some(best._2), best._3)
        }
      }.toSet
      val got = AsOf.backward(
          left.toDF("k", "t", "row_id"), right.toDF("k", "t", "price"),
          Seq("k"), "t", Seq("price"))
        .select("row_id", "matched_time", "price").collect()
        .map(r => (r.getLong(0),
          if (r.isNullAt(1)) None else Some(r.getLong(1)),
          if (r.isNullAt(2)) None else Some(r.getDouble(2)))).toSet
      assert(got == expected,
        s"seed $seed: missed ${(expected -- got).take(3)}, " +
          s"extra ${(got -- expected).take(3)}")
    }
  }

  private val genInterval: Gen[(Long, Long)] = for {
    s <- Gen.chooseNum(-50L, 50L)
    e <- Gen.chooseNum(-50L, 50L) // unordered on purpose: ~half inverted/empty
  } yield (s, e)

  test("grid range join == driver-side containment scan, random intervals incl. inverted & negative") {
    // negative coordinates matter: `div` truncates toward zero, so cell 0
    // spans (-cell, cell) — correctness relies only on truncating
    // division being monotone, and this property proves it holds
    (0 until 6).foreach { i =>
      val seed = 2000L + i
      val points = sample(Gen.listOfN(40, Gen.chooseNum(-50L, 50L)), seed)
        .distinct
      val intervals = sample(Gen.listOfN(12, genInterval), seed + 500)
        .zipWithIndex.map { case ((s, e), idx) => (idx.toLong, s, e) }
      val cellSize = Seq(1L, 3L, 7L, 10L)(i % 4)
      val expected = (for {
        p <- points
        (id, s, e) <- intervals if p >= s && p < e
      } yield (id, p)).toSet
      val rows = RangeJoin.pointInInterval(
          points.toDF("p"), intervals.toDF("w_id", "s", "e"),
          "p", "s", "e", cellSize)
        .select("w_id", "p").collect()
        .map(r => (r.getLong(0), r.getLong(1)))
      val got = rows.toSet
      // (w_id, p) pairs are unique, so row count pins multiplicity
      assert(rows.length == expected.size && got == expected,
        s"seed $seed cell $cellSize: missed ${(expected -- got).take(3)}, " +
          s"extra ${(got -- expected).take(3)}")
    }
  }

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def trigramsScala(text: String): Set[String] = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
    if (toks.size < 3) Set.empty[String]
    else toks.sliding(3).map(_.mkString(" ")).toSet
  }

  // bases plus per-base mutations (exact dup / one-token suffix /
  // unrelated), so every threshold has pairs on both sides of it —
  // random independent docs alone would make high-t runs vacuous
  private val genNearDupCorpus: Gen[List[String]] = for {
    bases <- Gen.chooseNum(4, 10).flatMap(n => Gen.listOfN(n, genDoc))
    picks <- Gen.listOfN(bases.size, Gen.chooseNum(0, 2))
    extras <- Gen.listOfN(bases.size, genDoc)
  } yield bases ++ bases.lazyZip(picks).lazyZip(extras).map {
    case (b, 0, _) => b
    case (b, 1, _) => b + " extra"
    case (_, _, x) => x
  }

  test("prefix-filtered n-gram Jaccard join == driver-side all-pairs brute force") {
    // the prefix/size/positional filters claim to be LOSSLESS — the one
    // property the graded brute-force oracle checks on a single corpus
    // shape, re-proven here across random corpora and three thresholds
    (0 until 6).foreach { i =>
      val seed = 4000L + i
      val texts = sample(genNearDupCorpus, seed)
      val df = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      val (tNum, tDen) = Seq((1, 2), (4, 5), (2, 3))(i % 3)
      val grams = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, trigramsScala(t)) }
      val expected = (for {
        (ia, ga) <- grams; (ib, gb) <- grams
        if ia < ib && ga.nonEmpty && gb.nonEmpty
        nc = ga.intersect(gb).size
        if nc * tDen >= tNum * (ga.size + gb.size - nc)
      } yield (ia, ib, nc.toDouble / (ga.size + gb.size - nc))).toSet
      val rows = Dedup.ngramJaccardPairs(df, tNum, tDen).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
      // doc pairs are unique, so row count pins multiplicity
      assert(rows.length == expected.size && rows.toSet == expected,
        s"seed $seed t=$tNum/$tDen: missed ${(expected -- rows.toSet).take(3)}, " +
          s"extra ${(rows.toSet -- expected).take(3)}")
    }
  }

  /** Independent driver-side winnowing: same 6-hex-digit md5 base hash
    * and (acc*B + h) mod 2^25 k-gram fold as the SQL form.
    */
  private def winnowScala(text: String, k: Int, w: Int): Vector[Long] = {
    val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toVector
    if (toks.size < k + w - 1) Vector.empty
    else {
      val th = toks.map(t => java.lang.Long.parseLong(md5hex(t).take(6), 16))
      val kh = th.sliding(k)
        .map(_.foldLeft(0L)((a, h) => (a * 1000003L + h) % (1L << 25))).toVector
      kh.sliding(w).map(_.min).toVector.distinct.sorted
    }
  }

  test("winnowing fingerprints == driver-side reimplementation, random corpora") {
    (0 until 6).foreach { i =>
      val seed = 6000L + i
      val texts = sample(genCorpus, seed)
      val df = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      // (3,4) is the graded shape; (2,5) exercises k != 3; (1,1) is the
      // degenerate keep-every-token-hash edge
      val (k, w) = Seq((3, 4), (2, 5), (1, 1))(i % 3)
      val got = TextOps.winnowFingerprintsOf(df, k, w).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toVector
      val expected = texts.zipWithIndex.flatMap { case (t, id) =>
        winnowScala(t, k, w).map(fp => (id.toLong, fp)) }.toVector.sorted
      assert(got == expected,
        s"seed $seed k=$k w=$w: missed ${(expected.toSet -- got.toSet).take(3)}, " +
          s"extra ${(got.toSet -- expected.toSet).take(3)}")
    }
  }

  test("connected components == driver-side union-find, random graphs incl. chains") {
    (0 until 4).foreach { i =>
      val seed = 9000L + i
      // random edges plus a long path: the path's diameter forces the
      // label-propagation loop through many rounds, which a clustered
      // near-dup corpus never would
      val random = sample(Gen.listOfN(20, for {
        a <- Gen.chooseNum(0L, 30L)
        d <- Gen.chooseNum(1L, 5L)
      } yield (a, a + d)), seed)
      val chain = (40L until 52L).map(j => (j, j + 1))
      val edges = random ++ chain
      val got = Dedup.connectedComponents(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
      // driver-side union-find with path compression
      val parent = scala.collection.mutable.Map[Long, Long]()
      def find(x: Long): Long = {
        val p = parent.getOrElseUpdate(x, x)
        if (p == x) x else { val r = find(p); parent(x) = r; r }
      }
      edges.foreach { case (a, b) =>
        val (ra, rb) = (find(a), find(b))
        if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
      }
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct
      // root-find alone does not give the min id of the component (the
      // union order does not guarantee it); take min over members
      val byRoot = nodes.groupBy(find).map { case (_, m) => m.min -> m }
      val expected = byRoot.flatMap { case (mn, m) => m.map(_ -> mn) }.toMap
      assert(got == expected,
        s"seed $seed: ${(expected.toSet -- got.toSet).take(3)} missing, " +
          s"${(got.toSet -- expected.toSet).take(3)} extra")
    }
  }

  test("winnowing guarantee: docs sharing a k+w-1 token run share a fingerprint") {
    // the SIGMOD'03 selection property the parameters encode: a shared
    // run of k+w-1 tokens yields w identical consecutive k-gram hashes,
    // i.e. one full shared window, whose min both documents must select
    val k = 3; val w = 4
    (0 until 4).foreach { i =>
      val seed = 8000L + i
      val run = sample(Gen.listOfN(k + w - 1, Gen.oneOf(vocab)), seed)
        .mkString(" ")
      val d1 = s"${sample(genDoc, seed + 1)} $run ${sample(genDoc, seed + 2)}"
      val d2 = s"${sample(genDoc, seed + 3)} $run ${sample(genDoc, seed + 4)}"
      val byDoc = TextOps.winnowFingerprintsOf(
          Seq((0L, d1), (1L, d2)).toDF("doc_id", "text"), k, w)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
        .groupBy(_._1).map { case (id, a) => id -> a.map(_._2).toSet }
      assert(byDoc(0L).intersect(byDoc(1L)).nonEmpty,
        s"seed $seed: no shared fingerprint for shared run '$run'")
    }
  }

  /** Independent driver-side DSIR verdict: same tokenizer regex, bigram
    * occurrences, md5-prefix bucket, add-one cross-multiplied ratio and
    * majority vote — in BigInt so the decimal(38,0) products can't be
    * the thing being tested against itself.
    */
  private def dsirScala(corpus: Seq[(Long, String, String)], target: String)
      : Map[Long, (Long, Long, Boolean)] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    def buckets(text: String): Seq[Long] = {
      val toks = "[a-z0-9]+".r.findAllIn(text.toLowerCase).toSeq
      toks.sliding(2).filter(_.length == 2).map(_.mkString(" ")).map { g =>
        val hex = md.digest(g.getBytes("UTF-8"))
          .map("%02x".format(_)).mkString.take(6)
        java.lang.Long.parseLong(hex, 16) % Importance.NumBuckets
      }.toSeq
    }
    val perDoc = corpus.map { case (id, lang, t) => (id, lang, buckets(t)) }
    val all = perDoc.flatMap { case (_, lang, bs) => bs.map(lang -> _) }
    val rCnt = all.groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val tCnt = all.filter(_._1 == target)
      .groupBy(_._2).view.mapValues(_.size.toLong).toMap
    val (rTot, tTot) = (all.size.toLong,
      all.count(_._1 == target).toLong)
    val B = Importance.NumBuckets.toLong
    def leans(b: Long): Boolean =
      BigInt(tCnt.getOrElse(b, 0L) + 1) * BigInt(rTot + B) >
        BigInt(rCnt.getOrElse(b, 0L) + 1) * BigInt(tTot + B)
    perDoc.collect { case (id, _, bs) if bs.nonEmpty =>
      val pos = bs.count(leans).toLong
      id -> ((bs.size.toLong, pos, pos * 2 > bs.size))
    }.toMap
  }

  test("DSIR importance report == driver-side recompute, random corpora") {
    val genLangDoc: Gen[(String, String)] = for {
      lang <- Gen.oneOf("en", "de", "fr")
      doc <- genDoc
    } yield (lang, doc)
    (0 until 4).foreach { i =>
      val seed = 4000L + i
      val rows = sample(Gen.chooseNum(6, 20)
        .flatMap(n => Gen.listOfN(n, genLangDoc)), seed)
        .zipWithIndex.map { case ((lang, t), id) => (id.toLong, lang, t) }
      val df = rows.toDF("doc_id", "lang", "text")
      val got = Importance.importanceReportOf(df, "en").collect()
        .map(r => r.getLong(0) -> ((r.getLong(1), r.getLong(2),
          r.getBoolean(3)))).toMap
      val expected = dsirScala(rows, "en")
      assert(got == expected, s"seed $seed: got ${got.size} docs, " +
        s"expected ${expected.size}; first diff ${
          (expected.toSet -- got.toSet).take(2)}")
      CachedStages.release(spark)
    }
  }

  /** Independent driver-side quantized top-k (IEEE doubles end-to-end,
    * same left-to-right norm fold and floor rule).
    */
  test("quantized KNN == driver-side brute force, random vector sets") {
    val genVec: Gen[Seq[Float]] =
      Gen.listOfN(6, Gen.chooseNum(-100, 100)).map(_.map(_ / 10.0f))
    (0 until 4).foreach { i =>
      val seed = 5000L + i
      val vecs = sample(Gen.chooseNum(10, 24)
        .flatMap(n => Gen.listOfN(n, genVec)), seed)
        .zipWithIndex.map { case (v, id) => (id.toLong, v) }
      def quant(v: Seq[Float]): Seq[Long] = {
        val norm = math.sqrt(v.foldLeft(0.0)((a, x) =>
          a + x.toDouble * x.toDouble))
        if (norm == 0) v.map(_ => 0L)
        else v.map(x => math.floor(x.toDouble / norm * 127.0 + 0.5).toLong)
      }
      val q = vecs.map { case (id, v) => id -> quant(v) }.toMap
      val expected = (for {
        (qid, qv) <- q.toSeq if qid < 8
        ranked = q.toSeq.filter(_._1 != qid)
          .map { case (cid, cv) =>
            (cid, qv.zip(cv).map { case (a, b) => a * b }.sum) }
          .sortBy { case (cid, dot) => (-dot, cid) }.take(3)
        ((cid, dot), rn) <- ranked.zipWithIndex
      } yield (qid, rn + 1L, cid, dot)).toSet
      val got = Quantization.quantizedTopKOf(
        vecs.toDF("vec_id", "embedding"), 3)
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSet
      assert(got == expected, s"seed $seed: missed ${
        (expected -- got).take(3)}, extra ${(got -- expected).take(3)}")
    }
  }

  test("CMS heavy hitters == driver-side sketch replay, random corpora") {
    import spark.implicits._
    def bucket(j: Int, t: String, w: Int): Long = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(s"cms$j:$t".getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      java.lang.Long.parseLong(hex.substring(0, 6), 16) % w
    }
    (0 until 5).foreach { i =>
      val texts = sample(genCorpus, 9300L + i)
      val df = texts.zipWithIndex
        .map { case (t, id) => (id.toLong, t) }.toDF("doc_id", "text")
      // widths small enough that collisions actually happen (8 vocab
      // words into 4-16 buckets), so the min-over-rows logic is load-
      // bearing, not a pass-through of clean cells
      val (w, d, k) = (if (i % 2 == 0) 4 else 16, i % 3 + 1, 5)
      val counts = texts.flatMap(_.split(" ")).filter(_.nonEmpty)
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val counters = (for { (t, n) <- counts.toSeq; j <- 0 until d }
        yield ((j, bucket(j, t, w)), n))
        .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
      val exp = counts.toSeq.sortBy { case (t, n) => (-n, t) }.take(k)
        .map { case (t, n) =>
          val est = (0 until d).map(j => counters((j, bucket(j, t, w)))).min
          (t, n, est, est - n)
        }
      val got = TextOps.cmsHeavyHittersOf(df, w, d, k).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
        .toSeq
      assert(got == exp, s"seed ${9300L + i} w=$w d=$d: got $got exp $exp")
      // the CMS bound holds for every reported token
      assert(got.forall(_._4 >= 0), s"undercount at seed ${9300L + i}")
    }
  }
  test("token drift TV == driver-side BigInt replay, random corpora with sources") {
    val genSrcDoc: Gen[(String, String)] = for {
      src <- Gen.oneOf("s0", "s1", "s2")
      doc <- genDoc
    } yield (src, doc)
    (0 until 5).foreach { i =>
      val rows = sample(Gen.chooseNum(6, 30)
        .flatMap(n => Gen.listOfN(n, genSrcDoc)), 7000L + i)
      val df = rows.zipWithIndex
        .map { case ((src, t), id) => (id.toLong, src, t) }
        .toDF("doc_id", "source", "text")
      val counts = scala.collection.mutable.Map[(String, String), Long]()
      rows.foreach { case (src, t) =>
        t.split(" ").filter(_.nonEmpty).foreach { tok =>
          counts((src, tok)) = counts.getOrElse((src, tok), 0L) + 1
        }
      }
      val vocabN = counts.groupBy(_._1._2)
        .map { case (t, m) => t -> m.values.sum }
      val nTotal = counts.values.sum
      val expect = counts.groupBy(_._1._1).toSeq.map { case (src, m) =>
        val nSrc = m.values.sum
        val num = vocabN.toSeq.map { case (t, nTok) =>
          (BigInt(m.getOrElse((src, t), 0L)) * nTotal
            - BigInt(nTok) * nSrc).abs
        }.sum
        (src, nSrc, m.size.toLong,
          (num * 1000000 / (BigInt(2) * nSrc * nTotal)).toLong)
      }.sortBy(_._1)
      val got = TextOps.tokenDriftOf(df).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3))).toSeq
      assert(got == expect, s"seed ${7000 + i}: $got != $expect")
      // TV bounds hold on every random corpus
      assert(got.forall(r => r._4 >= 0 && r._4 <= 1000000))
      CachedStages.release(spark)
    }
  }

  test("trimmed/winsorized stats == driver-side sorted replay, random value streams") {
    val genVals: Gen[List[(String, Double)]] = for {
      n <- Gen.chooseNum(3, 60)
      vs <- Gen.listOfN(n, for {
        t <- Gen.oneOf("a", "b")
        cents <- Gen.chooseNum(0L, 99999L)
      } yield (t, cents / 100.0))
    } yield vs
    (0 until 5).foreach { i =>
      val rows = sample(genVals, 8000L + i)
      val df = rows.zipWithIndex.map { case ((t, v), id) =>
        (id.toLong, t, v)
      }.toDF("event_id", "event_type", "value")
      val expect = rows.groupBy(_._1).toSeq.map { case (t, g) =>
        val cents = g.map(v => (BigDecimal(v._2).setScale(2,
          BigDecimal.RoundingMode.HALF_UP) * 100).toLongExact).sorted
        val n = cents.length.toLong
        val cut = (n * 5 / 100).toInt
        val kept = cents.slice(cut, cents.length - cut)
        val lo = cents(cut)
        val hi = cents(cents.length - cut - 1)
        val sum = cents.map(BigInt(_)).sum
        val tsum = kept.map(BigInt(_)).sum
        (t, n, cut.toLong, lo, hi,
          (sum * 10000 / n).toLong,
          (tsum * 10000 / (n - 2 * cut)).toLong,
          ((tsum + BigInt(cut) * (lo + hi)) * 10000 / n).toLong)
      }.sortBy(_._1)
      val got = Events.trimmedStatsOf(df, 5).collect()
        .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
          r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7))).toSeq
      assert(got == expect, s"seed ${8000 + i}: $got != $expect")
      CachedStages.release(spark)
    }
  }
}
