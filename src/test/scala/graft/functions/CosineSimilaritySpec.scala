package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

class CosineSimilaritySpec extends SparkSpec {

  test("cosine_sim matches the composed HOF formulation bit-for-bit") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq(
      (Array(1.0f, 2.0f, 3.0f), Array(3.0f, 2.0f, 1.0f)),
      (Array(0.5f, -0.25f), Array(0.5f, -0.25f)),
      (Array(1e-4f, 2e-4f, -3e-4f), Array(5e-4f, -1e-4f, 2e-4f)))
      .toDF("a", "b")
    val hof =
      """aggregate(zip_with(transform(a, x -> CAST(x AS DOUBLE)),
        |                   transform(b, x -> CAST(x AS DOUBLE)),
        |                   (x, y) -> x * y),
        |          CAST(0 AS DOUBLE), (acc, x) -> acc + x)
        | / (sqrt(aggregate(transform(a, x -> CAST(x AS DOUBLE) * x),
        |          CAST(0 AS DOUBLE), (acc, x) -> acc + x))
        |  * sqrt(aggregate(transform(b, x -> CAST(x AS DOUBLE) * x),
        |          CAST(0 AS DOUBLE), (acc, x) -> acc + x)))""".stripMargin
    val rows = df.select(expr("cosine_sim(a, b)").as("fused"),
      expr(hof).as("composed")).collect()
    rows.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
      s"fused=${r.getDouble(0)} composed=${r.getDouble(1)}"))
  }

  test("identical vectors have cosine 1; nulls propagate") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val one = Seq((Array(0.1f, 0.2f), Array(0.1f, 0.2f))).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).head.getDouble(0)
    assert(math.abs(one - 1.0) < 1e-12)
    val n = Seq((Array(0.1f), Option.empty[Array[Float]])).toDF("a", "b")
      .select(expr("cosine_sim(a, b)")).head
    assert(n.isNullAt(0))
  }

  test("length-mismatched vectors raise in both codegen and interpreted paths") {
    import spark.implicits._
    CosineSimilarity.register(spark)
    val df = Seq((Array(1.0f, 2.0f, 3.0f), Array(1.0f, 2.0f))).toDF("a", "b")
    def messages(t: Throwable): Seq[String] =
      Iterator.iterate(t)(_.getCause).takeWhile(_ != null)
        .map(x => String.valueOf(x.getMessage)).toSeq
    // codegen path
    val eGen = intercept[Throwable] {
      df.select(expr("cosine_sim(a, b)")).collect()
    }
    assert(messages(eGen).exists(_.contains("vector length mismatch")),
      messages(eGen).mkString(" | "))
    // interpreted path (NO_CODEGEN forces nullSafeEval — plain
    // wholeStage=false still uses expression-level codegen). The session
    // is shared across suites: save and restore the prior conf values,
    // and mutate only inside the try so a failed set can't leak state.
    val savedWs = spark.conf.getOption("spark.sql.codegen.wholeStage")
    val savedFm = spark.conf.getOption("spark.sql.codegen.factoryMode")
    try {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
      val eInt = intercept[Throwable] {
        df.select(expr("cosine_sim(a, b)")).collect()
      }
      assert(messages(eInt).exists(_.contains("vector length mismatch")),
        messages(eInt).mkString(" | "))
    } finally {
      savedWs.fold(spark.conf.unset("spark.sql.codegen.wholeStage"))(
        spark.conf.set("spark.sql.codegen.wholeStage", _))
      savedFm.fold(spark.conf.unset("spark.sql.codegen.factoryMode"))(
        spark.conf.set("spark.sql.codegen.factoryMode", _))
    }
  }

  test("whole-stage codegen and interpreted eval agree on real embeddings") {
    CosineSimilarity.register(spark)
    val emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
      .limit(50)
    val q = emb.select(col("embedding").as("a")).limit(1)
    val joined = emb.crossJoin(broadcast(q))
    val withCodegen = joined
      .select(expr("cosine_sim(a, embedding)").as("c")).collect().map(_.getDouble(0))
    val noCodegen = {
      spark.conf.set("spark.sql.codegen.wholeStage", "false")
      try joined.select(expr("cosine_sim(a, embedding)").as("c"))
        .collect().map(_.getDouble(0))
      finally spark.conf.set("spark.sql.codegen.wholeStage", "true")
    }
    assert(withCodegen.toSeq == noCodegen.toSeq)
  }
}
