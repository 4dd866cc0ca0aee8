package graft.functions

import graft.SparkSpec
import graft.ops.{Similarity, Tables}
import org.apache.spark.sql.functions._

/** lsh_buckets must be a drop-in replacement for the composed HOF form
  * (per-table `aggregate(transform(sequence(...)))` over a shipped
  * `__planes` literal) it fuses — the LSH oracle SQL (`lshBucketSql`)
  * still spells out that form in DuckDB, so any numeric divergence
  * (accumulation order, widening) is an oracle break.
  */
class LshBucketsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  /** The pre-fusion composed form, verbatim: interpreted folds over the
    * plane literal. Kept here as the semantic spec of the kernel.
    */
  private def composedBuckets(df: org.apache.spark.sql.DataFrame,
      nTables: Int, bitsPerTable: Int): org.apache.spark.sql.DataFrame = {
    def tableExpr(lo: Int): String =
      s"""aggregate(transform(sequence($lo, ${lo + bitsPerTable - 1}), p ->
         |  IF(aggregate(sequence(1, 64), CAST(0 AS DOUBLE), (acc, i) ->
         |       acc + CAST(element_at(v, i) AS DOUBLE) *
         |             element_at(element_at(__planes, p + 1), i))
         |     >= 0, shiftleft(1, p - $lo), 0)),
         |  0, (acc, x) -> acc + x)""".stripMargin
    val withPlanes = df.withColumn("__planes",
      typedLit(Similarity.hyperplanes(nTables * bitsPerTable)))
    (0 until nTables).foldLeft(withPlanes) { (acc, t) =>
      acc.withColumn(s"e$t", expr(tableExpr(t * bitsPerTable)))
    }.drop("__planes")
  }

  private def vectors = Tables(spark, dir, "embeddings")
    .select(col("vec_id"), col("embedding").as("v"))

  test("fused kernel equals the composed fold on the whole corpus, all graded params") {
    LshBuckets.register(spark)
    // the three graded parameterizations: q29 (16x4), q30 (2x12), q41 (2x4)
    for ((t, bits) <- Seq((16, 4), (2, 12), (2, 4))) {
      val rows = composedBuckets(vectors, t, bits)
        .withColumn("bks", expr(s"lsh_buckets(v, $t, $bits)"))
        .collect()
      assert(rows.nonEmpty)
      rows.foreach { r =>
        val fused = r.getSeq[Int](r.fieldIndex("bks"))
        val composed = (0 until t).map(i => r.getInt(r.fieldIndex(s"e$i")))
        assert(fused == composed,
          s"${t}x$bits vec ${r.get(0)}: fused $fused != composed $composed")
      }
    }
  }

  test("bucket ids stay within [0, 2^bits) and use every table slot") {
    LshBuckets.register(spark)
    val rows = vectors.withColumn("bks", expr("lsh_buckets(v, 16, 4)"))
      .select("bks").collect().map(_.getSeq[Int](0))
    assert(rows.forall(_.length == 16))
    assert(rows.forall(_.forall(b => b >= 0 && b < 16)))
    // the synthetic corpus is diverse enough that no table collapses
    // to a single bucket — a sign-extraction bug (e.g. always-positive
    // dots) would trip this
    val perTable = (0 until 16).map(t => rows.map(_(t)).distinct.length)
    assert(perTable.forall(_ > 1), s"degenerate table: $perTable")
  }

  test("wrong-length vectors fail loudly, nulls stay null") {
    import spark.implicits._
    LshBuckets.register(spark)
    val bad = Seq((1L, Array.fill(63)(0.5f))).toDF("vec_id", "v")
    val e = intercept[Exception] {
      bad.withColumn("bks", expr("lsh_buckets(v, 2, 4)")).collect()
    }
    assert(e.getMessage != null)
    val withNull = Seq((1L, Option.empty[Array[Float]])).toDF("vec_id", "v")
    val out = withNull.withColumn("bks", expr("lsh_buckets(v, 2, 4)"))
      .select("bks").collect()
    assert(out.head.isNullAt(0))
  }

  test("interpreted eval matches codegen") {
    // force the interpreted path via a filter on the expression in a
    // context Spark evaluates without codegen (literal fold on driver):
    // compare compute() directly against the SQL path for a few rows
    LshBuckets.register(spark)
    val viaSql = vectors.limit(5)
      .withColumn("bks", expr("lsh_buckets(v, 4, 8)"))
      .select("vec_id", "v", "bks").collect()
    viaSql.foreach { r =>
      val vec = r.getSeq[Float](1).toArray
      val direct = LshBuckets.compute(
        org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(vec), 4, 8)
      assert(direct.toIntArray().toSeq == r.getSeq[Int](2),
        s"vec ${r.get(0)}")
    }
  }
}
