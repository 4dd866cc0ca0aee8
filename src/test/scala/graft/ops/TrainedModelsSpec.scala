package graft.ops

import graft.SparkSpec

/** The VERDICT r15 #6 shared-training contract: the k-means/PQ model
  * chain trains ONCE per session, and memoization is INVISIBLE in the
  * results — a warm call returns bit-for-bit what a fresh training run
  * returns (training is deterministic, and both paths run the same
  * final literal-argmin assignment). The sweep-level proof is the
  * 270-query oracle run, where every chain query after the first is a
  * warm hit; this spec isolates the equivalence and the hit itself.
  */
class TrainedModelsSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  private def rows(df: org.apache.spark.sql.DataFrame): Seq[Seq[Any]] =
    df.collect().map(_.toSeq.map {
      case s: Seq[_] => s.toList
      case x => x
    }.toList).toList

  /** Run `body` with the memo in a known state, restoring it after. */
  private def withMemo[T](enabled: Boolean)(body: => T): T = {
    val prior = TrainedModels.enabled
    TrainedModels.clear(spark)
    TrainedModels.enabled = enabled
    try body
    finally {
      TrainedModels.enabled = prior
      TrainedModels.clear(spark)
      CachedStages.release(spark)
      spark.catalog.clearCache()
    }
  }

  test("kmeans: memo-disabled, cold-memoized, and warm calls are bit-identical") {
    val fresh = withMemo(enabled = false) {
      rows(Clustering.kmeans(spark, dir, 4, 3))
    }
    withMemo(enabled = true) {
      val cold = rows(Clustering.kmeans(spark, dir, 4, 3)) // trains + memoizes
      val warm = rows(Clustering.kmeans(spark, dir, 4, 3)) // memo hit
      assert(fresh.nonEmpty && cold == fresh,
        "memoizing path diverged from memo-disabled training")
      assert(warm == fresh, "warm memo hit diverged from fresh training")
      // the second call really was a hit: the memo already holds the
      // key, so a poisoned train thunk must never run
      val cs = TrainedModels.getOrTrain[Seq[(Long, Seq[Double])]](
        spark, s"kmeans|$dir|4|3|true") {
        fail("kmeans memo key missing — second call retrained")
      }
      assert(cs.size == 4 && cs.forall(_._2.size == 64))
    }
  }

  test("kmeans: exact and scale update modes memoize under distinct keys") {
    withMemo(enabled = true) {
      rows(Clustering.kmeans(spark, dir, 4, 3, exact = true))
      rows(Clustering.kmeans(spark, dir, 4, 3, exact = false))
      Seq(true, false).foreach { e =>
        TrainedModels.getOrTrain[Seq[(Long, Seq[Double])]](
          spark, s"kmeans|$dir|4|3|$e") {
          fail(s"kmeans exact=$e memo key missing")
        }
      }
    }
  }

  test("pq: memo-disabled, cold-memoized, and warm calls are bit-identical") {
    val fresh = withMemo(enabled = false) {
      rows(Quantization.pqAdcTopK(spark, dir, 4, 16, 4, 2, 3))
    }
    withMemo(enabled = true) {
      val cold = rows(Quantization.pqAdcTopK(spark, dir, 4, 16, 4, 2, 3))
      val warm = rows(Quantization.pqAdcTopK(spark, dir, 4, 16, 4, 2, 3))
      assert(fresh.nonEmpty && cold == fresh,
        "memoizing PQ path diverged from memo-disabled training")
      assert(warm == fresh, "warm PQ memo hit diverged from fresh training")
      val cs = TrainedModels.getOrTrain[Seq[(Int, Long, Seq[Double])]](
        spark, s"pq|$dir|4|16|4|2") {
        fail("pq memo key missing — second call retrained")
      }
      assert(cs.size == 16 && cs.forall(_._3.size == 16)) // m·kSub, subDim
    }
  }

  test("chain consumers agree on one model: q42 assignment == q57's cluster column") {
    withMemo(enabled = true) {
      val km = Clustering.kmeans(spark, dir, 4, 3).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      // semanticDedup assigns the AUGMENTED corpus against the same
      // frozen model — base ids must land in identical clusters
      val sd = Clustering.semanticDedup(spark, dir).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(km.nonEmpty)
      km.foreach { case (id, cl) =>
        assert(sd(id) == cl, s"vec $id cluster diverged across the chain")
      }
    }
  }

  test("clear() forces a retrain; fixture-frame pqModel callers never memoize") {
    withMemo(enabled = true) {
      rows(Clustering.kmeans(spark, dir, 4, 3))
      TrainedModels.clear(spark)
      var trained = false
      TrainedModels.getOrTrain[java.lang.Integer](spark,
        s"kmeans|$dir|4|3|true") { trained = true; 1 }
      assert(trained, "clear() left the kmeans model cached")
      // no-key pqModel (the spec/streaming entry) must not populate
      // the memo under any key
      import spark.implicits._
      val tiny = (0L until 8L)
        .map(i => (i, Seq.tabulate(64)(d => (i + d).toFloat)))
        .toDF("vec_id", "v")
      TrainedModels.clear(spark)
      Quantization.pqModel(tiny, 4, 16, 4, 2)._2.count()
      var pqTrained = false
      TrainedModels.getOrTrain[java.lang.Integer](spark,
        s"pq|$dir|4|16|4|2") { pqTrained = true; 1 }
      assert(pqTrained, "keyless pqModel call unexpectedly memoized")
    }
  }
}
