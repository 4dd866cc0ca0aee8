package graft.functions

import graft.SparkSpec
import graft.ops.{Dedup, Tables, TextOps}
import org.apache.spark.sql.functions._

/** word_shingles must be a drop-in replacement for the composed HOF
  * form (regexp tokenize → transform/concat_ws → array_distinct) it
  * fuses — the dedup operators' oracle SQL still spells out that form,
  * so any divergence is an oracle break.
  */
class WordShinglesSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def composed(df: org.apache.spark.sql.DataFrame) =
    df.withColumn("toks", expr(TextOps.tokensExpr))
      .withColumn("expected", expr(Dedup.shinglesExpr))

  test("fused kernel equals the composed form on the whole corpus") {
    WordShingles.register(spark)
    val rows = composed(Tables(spark, dir, "documents"))
      .withColumn("actual", expr("word_shingles(text, 3)"))
      .select("doc_id", "expected", "actual")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.get(0)}")
    }
  }

  test("word_ngrams equals the composed occurrence form on the whole corpus") {
    WordShingles.register(spark)
    val rows = Tables(spark, dir, "documents")
      .withColumn("toks", expr(TextOps.tokensExpr))
      .withColumn("expected", expr(graft.ops.Importance.bigramsExpr))
      .withColumn("actual", expr("word_ngrams(text, 2)"))
      .select("doc_id", "expected", "actual")
      .collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getSeq[String](1) == r.getSeq[String](2), s"doc ${r.get(0)}")
    }
  }

  test("word_ngrams keeps duplicate occurrences in corpus order") {
    import spark.implicits._
    WordShingles.register(spark)
    val out = Seq((1L, "a b c a b c a b"))
      .toDF("doc_id", "text")
      .select(expr("word_ngrams(text, 2)")).head.getSeq[String](0)
    assert(out == Seq("a b", "b c", "c a", "a b", "b c", "c a", "a b"))
  }

  test("edge cases: short, empty, case, punctuation, digits, dedup order") {
    import spark.implicits._
    WordShingles.register(spark)
    val cases = Seq(
      "",                        // no tokens
      "one",                     // < n tokens -> empty
      "one two",                 // exactly n-1
      "one two three",           // exactly one shingle
      "ONE Two THREE four",      // case folding
      "a-b_c d!e f",             // punctuation splits tokens
      "x1 2y z3 44 5",           // digits are token chars
      "a b c a b c a b c",       // repeated shingles dedup, order kept
      "  leading   spaces  and trailing   ")
    val rows = composed(cases.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text"))
      .withColumn("actual", expr("word_shingles(text, 3)"))
      .collect()
    // columns: doc_id(0), text(1), toks(2), expected(3), actual(4)
    rows.foreach { r =>
      assert(r.getSeq[String](3) == r.getSeq[String](4), s"text ${r.get(1)}")
    }
    // dedup preserves first occurrence exactly like array_distinct
    val rep = rows.find(_.getAs[String]("text").startsWith("a b c a")).get
    assert(rep.getSeq[String](4) == Seq("a b c", "b c a", "c a b"))
  }

  test("n = 2 and n = 1 widths") {
    import spark.implicits._
    WordShingles.register(spark)
    val df = Seq((1L, "alpha beta alpha beta gamma")).toDF("doc_id", "text")
    assert(df.select(expr("word_shingles(text, 2)")).head.getSeq[String](0) ==
      Seq("alpha beta", "beta alpha", "beta gamma"))
    assert(df.select(expr("word_shingles(text, 1)")).head.getSeq[String](0) ==
      Seq("alpha", "beta", "gamma"))
  }

  test("codegen and interpreted eval agree") {
    import spark.implicits._
    WordShingles.register(spark)
    val texts = Tables(spark, dir, "documents").select("text")
      .limit(50).collect().map(_.getString(0))
    texts.foreach { t =>
      val direct = WordShingles
        .compute(org.apache.spark.unsafe.types.UTF8String.fromString(t), 3,
          distinct = true)
      val viaPlan = Seq(t).toDF("text")
        .select(expr("word_shingles(text, 3)")).head.getSeq[String](0)
      assert(direct.numElements() == viaPlan.length)
      (0 until direct.numElements()).foreach { i =>
        assert(direct.getUTF8String(i).toString == viaPlan(i))
      }
    }
  }

  test("rejects non-string input and non-literal n") {
    WordShingles.register(spark)
    import spark.implicits._
    val df = Seq((1L, "x")).toDF("doc_id", "text")
    intercept[Exception] {
      df.select(expr("word_shingles(doc_id, 3)")).collect()
    }
    intercept[Exception] {
      df.select(expr("word_shingles(text, doc_id)")).collect()
    }
  }
}
