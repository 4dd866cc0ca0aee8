package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The round-6 curation operators: n-gram repetition filters (q46),
  * benchmark decontamination (q47), PII scrubbing (q48), stratified
  * per-source capping (q49). Each is checked against hand-computed
  * expectations on tiny corpora the suite controls — the graded oracle
  * pins the full-corpus values; these pin the SEMANTICS on inputs where
  * the right answer is obvious by eye.
  */
class CurationSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"
  import spark.implicits._

  // --- q63: token accounting ---

  test("token accounting: hand-computed whitespace tokens and pretokenizer pieces") {
    val docs = Seq(
      (1L, "hello, world! 42 foo-bar"),
      (2L, "   "),               // whitespace-only: 0 / 0
      (3L, ""),                  // empty: 0 / 0
      (4L, "abc123def"),         // class switches split pieces: 3 of 1 ws token
      (5L, "A B\tC")             // tabs are whitespace; case folds
    ).toDF("doc_id", "text")
    val out = TextOps.tokenAccountingOf(docs).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1 ws: [hello,][world!][42][foo-bar];
    // pieces: hello , world ! 42 foo - bar
    assert(out(1L) == ((4L, 8L)))
    assert(out(2L) == ((0L, 0L)))
    assert(out(3L) == ((0L, 0L)))
    assert(out(4L) == ((1L, 3L)))
    assert(out(5L) == ((3L, 3L)))
  }

  test("token accounting: pieces never undercount whitespace tokens") {
    // every non-space run is at least one piece, so n_pieces >= n_ws
    val bad = TextOps.tokenAccounting(spark, dir)
      .filter($"n_pieces" < $"n_ws_tokens").count()
    assert(bad == 0L)
  }

  // --- q46: repetition stats ---

  test("repetition stats: hand-computed grams on a repetitive doc") {
    val docs = Seq(
      (1L, "a b a b a b"),          // 5 bigrams (3x "a b", 2x "b a"), 4 trigrams all dup
      (2L, "one two three four five") // all grams unique
    ).toDF("doc_id", "text")
    val rows = TextOps.repetitionStatsOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    val rep = rows(1L)
    assert(rep.getAs[Long]("n_2grams") == 5 && rep.getAs[Long]("top2_n") == 3)
    assert(rep.getAs[Long]("n_3grams") == 4 && rep.getAs[Long]("dup_3grams") == 4)
    assert(rep.getAs[Long]("repetitive") == 1L)
    val clean = rows(2L)
    assert(clean.getAs[Long]("dup_3grams") == 0 && clean.getAs[Long]("top2_n") == 1)
    assert(clean.getAs[Long]("repetitive") == 0L)
  }

  test("repetition stats: docs under 3 tokens are excluded") {
    val docs = Seq((1L, "just two"), (2L, "one two three")).toDF("doc_id", "text")
    assert(TextOps.repetitionStatsOf(docs).select("doc_id")
      .collect().map(_.getLong(0)).toSeq == Seq(2L))
  }

  test("repetition flag fires on the top-bigram rule alone") {
    // "x y" appears 3 of 12 bigrams (>= 10%), but no trigram repeats
    // enough to trip the 20% dup rule on its own at this length
    val text = "x y a x y b x y c d e f g"
    val r = TextOps.repetitionStatsOf(Seq((1L, text)).toDF("doc_id", "text"))
      .collect().head
    assert(r.getAs[Long]("top2_n") * 10 >= r.getAs[Long]("n_2grams"))
    assert(r.getAs[Long]("repetitive") == 1L)
  }

  // --- q47: decontamination ---

  test("contamination finds exactly the overlapping docs; decontaminate drops them") {
    val bench = Seq((100L, "alpha beta gamma delta")).toDF("bench_id", "text")
    val train = Seq(
      (1L, "zz alpha beta gamma yy"),    // shares shingle "alpha beta gamma"
      (2L, "alpha beta zz gamma delta"), // bigram overlap only — NOT a shared trigram
      (3L, "completely different words here")
    ).toDF("doc_id", "text")
    val report = Dedup.contaminationOf(train, bench).collect()
    assert(report.map(_.getLong(0)).toSet == Set(1L))
    assert(report.head.getAs[Long]("n_benchmarks") == 1L)
    assert(report.head.getAs[Long]("n_shared_grams") == 1L)
    val clean = Dedup.decontaminate(train, bench)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(clean == Set(2L, 3L))
  }

  test("graded contamination report flags every planted near-copy") {
    val planted = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 100 === 0)
      .collect().map(_.getAs[Long]("doc_id") + 1000000L).toSet
    val flagged = Dedup.contaminationReport(spark, dir)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // every planted near-copy of a benchmark doc shares almost all its
    // trigrams with the benchmark original, so all must be flagged
    assert(planted.subsetOf(flagged), (planted -- flagged).toString)
    // and no benchmark doc can flag itself (they are excluded from train)
    assert(flagged.forall(id => id % 100 != 0 || id >= 1000000L))
  }

  // --- q55: decontamination at production gram width ---

  test("13-gram decontamination needs a true 13-token run; trigrams do not") {
    val bench = Seq(
      (100L, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 w14")
    ).toDF("bench_id", "text")
    val train = Seq(
      // shares the 13-gram "w1 .. w13" with the benchmark
      (1L, "pre w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11 w12 w13 post"),
      // one substituted token: shares many trigrams but NO 13-gram
      (2L, "w1 w2 w3 w4 w5 w6 zz w8 w9 w10 w11 w12 w13 w14"),
      (3L, "unrelated text entirely")
    ).toDF("doc_id", "text")
    val wide = Dedup.contaminationOf(train, bench, n = 13).collect()
    assert(wide.map(_.getLong(0)).toSet == Set(1L))
    assert(wide.head.getAs[Long]("n_shared_grams") == 1L)
    // at the graded trigram width the substituted doc IS flagged — the
    // width is the precision knob production pipelines turn up
    val narrow = Dedup.contaminationOf(train, bench, n = 3).collect()
    assert(narrow.map(_.getLong(0)).toSet == Set(1L, 2L))
    assert(Dedup.decontaminate(train, bench, n = 13).select("doc_id")
      .collect().map(_.getLong(0)).toSet == Set(2L, 3L))
  }

  test("graded wide decontamination flags planted copies of long benchmarks") {
    // a planted near-copy (verbatim + 3-token suffix) shares every
    // 13-gram of its original whenever the original has >= 13 tokens;
    // shorter benchmark docs have no 13-grams to share at all
    val longBench = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 100 === 0)
      .filter(size(expr(TextOps.tokensExpr)) >= 13)
      .collect().map(_.getAs[Long]("doc_id") + 1000000L).toSet
    assert(longBench.nonEmpty)
    val flagged = Dedup.contaminationReportAt(spark, dir, 13)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(longBench.subsetOf(flagged), (longBench -- flagged).toString)
  }

  // --- q54: duplicate spans ---

  test("duplicate spans: a repeated 10-token run is counted, unique docs score 0") {
    val run = "a1 a2 a3 a4 a5 a6 a7 a8 a9 a10"
    val docs = Seq(
      (1L, s"$run filler1 filler2 $run"), // the run recurs inside one doc
      (2L, "b1 b2 b3 b4 b5 b6 b7 b8 b9 b10 b11"), // every span unique
      (3L, "too short for any window")
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicateSpansOf(docs, window = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // doc 1: 22 tokens -> 13 windows; exactly windows 1 and 13 hold the
    // repeated run, every other window straddles filler tokens
    assert(rows(1L).getAs[Long]("n_windows") == 13L)
    assert(rows(1L).getAs[Long]("n_dup_windows") == 2L)
    assert(rows(1L).getAs[Double]("dup_frac") == 2.0 / 13)
    // doc 2: 11 tokens -> 2 windows, both globally unique
    assert(rows(2L).getAs[Long]("n_windows") == 2L)
    assert(rows(2L).getAs[Long]("n_dup_windows") == 0L)
    // doc 3: under the window width -> no row at all
    assert(!rows.contains(3L))
  }

  test("duplicate spans: a span shared ACROSS documents flags both") {
    val run = "c1 c2 c3 c4 c5 c6 c7 c8 c9 c10"
    val docs = Seq(
      (1L, s"x1 x2 $run"),
      (2L, s"$run y1 y2")
    ).toDF("doc_id", "text")
    val rows = Dedup.duplicateSpansOf(docs, window = 10).collect()
      .map(r => r.getLong(0) -> r).toMap
    // each doc has 3 windows; only the pure run window is shared
    Seq(1L, 2L).foreach { id =>
      assert(rows(id).getAs[Long]("n_windows") == 3L)
      assert(rows(id).getAs[Long]("n_dup_windows") == 1L)
      assert(rows(id).getAs[Double]("dup_frac") == 1.0 / 3)
    }
  }

  // --- q56: block dedup-and-reassemble ---

  test("block dedup keeps first occurrence and reassembles survivors in order") {
    val docs = Seq(
      (1L, "a b c a b c"),   // blocks [a b c][a b c]: second is a dup
      (2L, "a b c d e"),     // blocks [a b c][d e]: first already seen in doc 1
      (3L, "d e")            // block [d e] seen at doc 2 pos 1
    ).toDF("doc_id", "text")
    val rows = Dedup.blockDedupOf(docs, blockSize = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[Long]("n_blocks") == 2L)
    assert(rows(1L).getAs[Long]("n_kept") == 1L)
    assert(rows(1L).getAs[String]("clean_text") == "a b c")
    assert(rows(2L).getAs[Long]("n_blocks") == 2L)
    assert(rows(2L).getAs[Long]("n_kept") == 1L)
    assert(rows(2L).getAs[String]("clean_text") == "d e")
    // doc 3's only block was first seen at (2, 1) -> fully deduped,
    // but the doc still appears with an empty clean_text
    assert(rows(3L).getAs[Long]("n_blocks") == 1L)
    assert(rows(3L).getAs[Long]("n_kept") == 0L)
    assert(rows(3L).getAs[String]("clean_text") == "")
  }

  test("block dedup first-occurrence order is (doc_id, pos), not arrival order") {
    // the dup block sits EARLIER in the higher-id doc; (doc_id, pos)
    // ordering must still keep doc 1's copy
    val docs = Seq(
      (5L, "z z z w1 w2 w3"),
      (1L, "w4 w5 w6 z z z")
    ).toDF("doc_id", "text")
    val rows = Dedup.blockDedupOf(docs, blockSize = 3).collect()
      .map(r => r.getLong(0) -> r).toMap
    assert(rows(1L).getAs[String]("clean_text") == "w4 w5 w6 z z z")
    assert(rows(5L).getAs[String]("clean_text") == "w1 w2 w3")
    assert(rows(5L).getAs[Long]("n_kept") == 1L)
  }

  // --- q58: bigram-LM quality score ---

  test("lm quality score matches a hand-built bigram model with add-one smoothing") {
    // tokens: doc1 [a b a b], doc2 [a b], doc3 [c]
    // unigrams a:3 b:3 c:1, V=3
    // transitions doc1: (a,b)(b,a)(a,b); doc2: (a,b)
    // P(a->b) = (3+1)/(3+3) = 2/3,  P(b->a) = (1+1)/(3+3) = 1/3
    val docs = Seq(
      (1L, "a b a b"), (2L, "a b"), (3L, "c")
    ).toDF("doc_id", "text")
    val rows = TextOps.lmQualityScoreOf(docs).collect()
      .map(r => r.getLong(0) -> r).toMap
    def r6(x: Double): Double =
      BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(rows(1L).getAs[Long]("n_transitions") == 3L)
    assert(rows(1L).getAs[Double]("avg_logp") ==
      r6((2 * math.log(2.0 / 3) + math.log(1.0 / 3)) / 3))
    assert(rows(2L).getAs[Long]("n_transitions") == 1L)
    assert(rows(2L).getAs[Double]("avg_logp") == r6(math.log(2.0 / 3)))
    // doc 3 has no transitions -> no row, but its token still counted
    // in V (asserted implicitly: V=3 is baked into the expectations)
    assert(!rows.contains(3L))
  }

  test("lm quality score ranks a garbled doc below a repeated common phrase") {
    val docs = Seq(
      (1L, "the cat sat on the mat and the cat sat on the mat again"),
      (2L, "mat the on sat zz cat qq the again and on xx")
    ).toDF("doc_id", "text")
    val rows = TextOps.lmQualityScoreOf(docs).collect()
      .map(r => r.getLong(0) -> r.getAs[Double]("avg_logp")).toMap
    assert(rows(1L) > rows(2L))
  }

  // --- q48: PII scrub ---

  test("pii scrub detects planted rows and redacts them completely") {
    val rows = Privacy.piiScrub(spark, dir).collect()
    val expected = Tables(spark, dir, "documents")
      .filter(col("doc_id") % 50 === 0)
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(rows.map(_.getLong(0)).toSet == expected)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_emails") == 1 && r.getAs[Long]("n_phones") == 1)
      val red = r.getAs[String]("redacted")
      assert(red.contains("[EMAIL]") && red.contains("[PHONE]"))
      // nothing matching either pattern survives redaction
      assert(!red.matches(s".*${Privacy.EmailRe}.*"))
      assert(!red.matches(s".*${Privacy.PhoneRe}.*"))
    }
  }

  test("pii scrub counts multiple hits and leaves clean text alone") {
    val docs = Seq(
      (1L, "mail a@b.co and c.d@e-f.org or 123-456-7890 then 555-000-1111"),
      (2L, "no personal data at all"),
      (3L, "just an at sign @ alone")
    ).toDF("doc_id", "text")
    val out = Privacy.piiScrubOf(docs).collect()
    assert(out.map(_.getLong(0)).toSeq == Seq(1L))
    assert(out.head.getAs[Long]("n_emails") == 2)
    assert(out.head.getAs[Long]("n_phones") == 2)
    assert(out.head.getAs[String]("redacted") ==
      "mail [EMAIL] and [EMAIL] or [PHONE] then [PHONE]")
  }

  // --- q49: stratified cap ---

  test("stratified cap bounds every stratum and is deterministic") {
    val a = Sampling.stratifiedCap(spark, dir).collect()
    val b = Sampling.stratifiedCap(spark, dir).collect()
    assert(a.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq ==
      b.map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq)
    val perSource = a.groupBy(_.getString(0))
    perSource.foreach { case (src, g) =>
      assert(g.length <= 10, s"$src over cap")
      assert(g.map(_.getLong(1)).sorted.toSeq == (1L to g.length).toSeq)
    }
  }

  // --- q50: tf-idf ---

  test("tfidf ranks rarer terms above common ones at equal tf") {
    val rows = TextOps.tfidfTopTerms(spark, dir).collect()
    // every doc contributes exactly k rows with contiguous ranks
    rows.groupBy(_.getLong(0)).foreach { case (_, g) =>
      assert(g.map(_.getAs[Long]("rn")).sorted.toSeq == Seq(1L, 2L, 3L))
      val byRank = g.sortBy(_.getAs[Long]("rn")).map(_.getAs[Double]("tfidf"))
      assert(byRank.zip(byRank.tail).forall { case (a, b) => a >= b })
    }
    // score formula holds exactly: tfidf = round(tf * N / df, 6)
    val nDocs = Tables(spark, dir, "documents").count()
    rows.foreach { r =>
      val expected = BigDecimal(
        r.getAs[Long]("tf").toDouble * nDocs / r.getAs[Long]("df"))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(r.getAs[Double]("tfidf") == expected, r.toString)
    }
  }

  // --- q51: mixture sampling ---

  test("mixture sampling flattens a skewed source distribution") {
    import spark.implicits._
    // 10 docs in 'small', 1000 in 'big' -> big keeps ~sqrt(10/1000)=10%
    val docs = ((1L to 10L).map(i => (i, "small")) ++
      (100L to 1099L).map(i => (i, "big"))).toDF("doc_id", "source")
    val out = Sampling.mixtureSampleOf(docs, "source").collect()
    val bySrc = out.groupBy(_.getString(0)).map { case (s, g) => s -> g }
    // the smallest source keeps everything (pct = 100)
    assert(bySrc("small").length == 10)
    assert(bySrc("small").forall(_.getAs[Long]("pct") == 100L))
    // the big source is downsampled to ~10% (hash-uniform: wide slack)
    assert(bySrc("big").forall(_.getAs[Long]("pct") == 10L))
    val kept = bySrc("big").length
    assert(kept > 50 && kept < 200, s"big kept $kept of 1000")
    // membership is exactly the md5-bucket rule
    val keptIds = bySrc("big").map(_.getAs[Long]("doc_id")).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    (100L to 1099L).foreach { id =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val expected = java.lang.Long.parseLong(hex, 16) % 100 < 10
      assert(keptIds.contains(id) == expected, s"doc $id")
    }
  }

  test("stratified cap keeps whole strata smaller than the cap") {
    val docs = Seq(
      (1L, "small"), (2L, "small"),
      (3L, "big"), (4L, "big"), (5L, "big"), (6L, "big")
    ).toDF("doc_id", "source")
    val out = Sampling.stratifiedCapOf(docs, "source", cap = 3)
      .collect().map(r => (r.getString(0), r.getLong(2)))
    assert(out.count(_._1 == "small") == 2)
    assert(out.count(_._1 == "big") == 3)
  }

  // --- q96: dedup threshold sensitivity ---

  test("threshold sweep: bands legal, planted near-dups surface at the top") {
    val rows = Dedup.thresholdSensitivity(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(rows.nonEmpty)
    rows.foreach { case (band, n, lo, hi) =>
      assert(band >= 0 && band <= 10 && n > 0)
      // the decile boundaries really contain their min/max
      assert(lo >= band / 10.0 && hi < (band + 1) / 10.0 + 1e-12,
        s"band $band: [$lo, $hi]")
    }
    // the planted suffix near-dups (Jaccard ~0.9) must populate a top band
    assert(rows.exists { case (band, n, _, _) => band >= 9 && n > 0 },
      rows.mkString(","))
    CachedStages.release(spark)
  }

  // --- q94: surgical decontamination ---

  test("span surgery excises exactly the benchmark-overlapping windows") {
    val bench = Seq((100L, "secret bench gram extra")).toDF("bench_id", "text")
    val train = Seq(
      (1L, "x1 x2 secret bench gram x3 x4"), // one match at pos 3
      (2L, "clean words only here nothing shared"),
      (3L, "secret bench gram extra trailing"), // overlapping matches 1,2
      (4L, "ab")) // shorter than a gram: untouchable
      .toDF("doc_id", "text")
    val out = Dedup.decontaminateSpansOf(train, bench, 3).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2), r.getString(3)))
      .toMap
    assert(out(1L) == ((7L, 3L, "x1 x2 x3 x4")), out.toString)
    assert(out(2L) == ((6L, 0L, "clean words only here nothing shared")))
    // overlapping tainted windows MERGE: positions 1-3 ∪ 2-4 = 1-4
    assert(out(3L) == ((5L, 4L, "trailing")), out.toString)
    assert(out(4L) == ((1L, 0L, "ab")), out.toString)
  }

  test("graded span surgery: planted copies lose most tokens, others keep all") {
    val rows = Dedup.decontaminateSpans(spark, dir, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    // every planted near-copy of a benchmark doc (+1e6 ids) overlaps its
    // original on nearly every window — surgery must strip most of it
    val planted = rows.filter(_._1 >= 1000000L)
    assert(planted.nonEmpty)
    planted.foreach { case (id, n, removed) =>
      assert(removed * 2 > n, s"doc $id: only $removed of $n removed") }
    // and surgery never invents removals: n_removed <= n_toks, >= 0
    rows.foreach { case (_, n, removed) =>
      assert(removed >= 0 && removed <= n) }
  }

  // --- q92: content-defined chunk dedup ---

  test("CDC chunking re-syncs after a prefix insertion; fixed blocks share nothing") {
    val baseToks = (1 to 60).map(i => f"w$i%02d")
    val base = baseToks.mkString(" ")
    val corpus = Seq((1L, base), (2L, "pp qq rr " + base))
      .toDF("doc_id", "text")
    val rep = Dedup.cdcChunkDedupOf(corpus, 3, 16).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // driver-side replay of the boundary rule and the sharing count
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(s: String) =
      md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    def chunksOf(toks: Seq[String]): Seq[String] = {
      val th = toks.map(t => java.lang.Long.parseLong(hex(t).take(6), 16))
      val kh = if (toks.size >= 3)
        (0 to toks.size - 3).map(i => (0 until 3).foldLeft(0L) {
          (acc, o) => (acc * 1000003L + th(i + o)) % (1L << 25) })
      else Seq.empty[Long]
      val cuts = kh.zipWithIndex.collect {
        case (h, i) if h % 16 == 0 => i + 3 }
      val bounds = (Seq(0) ++ cuts ++ Seq(toks.size)).distinct.sorted
      bounds.zip(bounds.tail).map { case (a, b) =>
        hex(toks.slice(a, b).mkString(" ")) }
    }
    val c1 = chunksOf(baseToks)
    val c2 = chunksOf(Seq("pp", "qq", "rr") ++ baseToks)
    def sharedWith(mine: Seq[String], other: Seq[String]) =
      mine.count(other.toSet)
    assert(rep(1L) == ((c1.size.toLong, sharedWith(c1, c2).toLong)), rep.toString)
    assert(rep(2L) == ((c2.size.toLong, sharedWith(c2, c1).toLong)), rep.toString)
    // the content-defined boundaries RE-SYNC: the pair genuinely shares
    // chunks despite the 3-token shift...
    assert(rep(1L)._2 > 0 && rep(2L)._2 > 0, rep.toString)
    // ...while fixed-width blocks all shifted: q56 on the same pair
    // finds nothing to dedup (every block of both docs survives)
    val blocks = Dedup.blockDedupOf(corpus, 20).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    blocks.foreach { case (id, (nBlocks, nKept)) =>
      assert(nBlocks == nKept, s"doc $id: fixed blocks unexpectedly shared")
    }
  }

  test("CDC chunk lengths measure near the mask: corpus mean within [mask/2, 2*mask]") {
    val chunks = Dedup.cdcChunksOf(
      Tables(spark, dir, "documents").select("doc_id", "text"), 3, 16)
      .collect()
    val toks = Tables(spark, dir, "documents").collect().map { r =>
      val t = r.getAs[String]("text")
      if (t == null) 0
      else "[a-z0-9]+".r.findAllIn(t.toLowerCase).length
    }.sum
    val mean = toks.toDouble / chunks.length
    assert(mean >= 8 && mean <= 32,
      s"mean chunk length $mean outside the mask-16 band")
  }

  test("CDC chunk table: chunks partition each doc, short docs are one chunk") {
    val corpus = Seq((1L, "aa bb"), (2L, "")).toDF("doc_id", "text")
    val rows = Dedup.cdcChunksOf(corpus, 3, 16).collect()
    // a 2-token doc has no 3-token window => exactly one whole-doc chunk;
    // an empty doc chunks to nothing
    assert(rows.length == 1 && rows.head.getLong(0) == 1L)
    val md = java.security.MessageDigest.getInstance("MD5")
    val expect = md.digest("aa bb".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    assert(rows.head.getString(2) == expect)
  }

  // --- q85: incremental snapshot dedup ---

  test("snapshot dedup classifies re-crawls, revisions, and new pages") {
    val base = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    val old = Seq(
      (1L, base),
      (2L, "one two three four five six seven eight nine ten"),
      (3L, "totally different ancient content here still unrelated"))
      .toDF("doc_id", "text")
    val nw = Seq(
      (101L, base),                          // byte-identical re-crawl
      (102L, base + " qq ww"),               // light revision of doc 1
      (103L, "fresh unseen vocabulary page about nothing prior"))
      .toDF("new_id", "text")
    val out = Dedup.snapshotDedupOf(old, nw).collect()
      .map(r => r.getLong(0) -> (r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toMap
    assert(out(101L) == ("exact_dup", 1L))
    // the revision keeps all 8 of doc 1's shingles and adds 2 (Jaccard
    // 8/10 >= 1/2); a band collides unless BOTH added shingles out-hash
    // all 8 kept ones under all 4 seeds — verified found on this input
    assert(out(102L) == ("near_dup", 1L))
    assert(out(103L) == ("new", -1L))
  }

  test("snapshot dedup never pairs old docs with each other") {
    // two old docs are near-identical — an incremental pass must NOT
    // report anything about them (only the delta is classified)
    val old = Seq(
      (1L, "alpha beta gamma delta epsilon zeta"),
      (2L, "alpha beta gamma delta epsilon zeta eta"))
      .toDF("doc_id", "text")
    val nw = Seq((101L, "entirely novel snapshot content page"))
      .toDF("new_id", "text")
    val rows = Dedup.snapshotDedupOf(old, nw).collect()
    assert(rows.map(_.getLong(0)).toSeq == Seq(101L))
    assert(rows.head.getString(1) == "new")
  }
}
