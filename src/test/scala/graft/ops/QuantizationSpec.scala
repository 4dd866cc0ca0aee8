package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class QuantizationSpec extends SparkSpec {

  import spark.implicits._

  val dir = "/root/testdata/sf0.001"

  /** The quantizer formula, recomputed independently in Scala math. */
  private def quantize(v: Seq[Float]): Seq[Int] = {
    val norm = math.sqrt(v.map(x => x.toDouble * x.toDouble).sum)
    if (norm == 0) v.map(_ => 0)
    else v.map(x => math.floor(x.toDouble / norm * 127.0 + 0.5).toInt)
  }

  test("quantizer matches the independent Scala recompute exactly") {
    val inputs = Seq(
      (1L, Seq(1.0f, -0.5f, 0.25f, 0.0f)),
      (2L, Seq(0.0f, 0.0f, 0.0f, 0.0f)), // all-zero: no divide-by-zero
      (3L, Seq(-2.0f, 2.0f, 1.0f, -1.0f)),
      (4L, Seq(1.0f, 0.0f, 0.0f, 0.0f)) // axis vector: exact ±127
    )
    val q = Quantization.quantizedOf(inputs.toDF("vec_id", "embedding"))
      .collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("qvec"))).toMap
    inputs.foreach { case (id, v) =>
      assert(q(id) == quantize(v), s"vec $id")
    }
    assert(q(2L) == Seq(0, 0, 0, 0))
    assert(q(4L) == Seq(127, 0, 0, 0))
  }

  test("quantized values stay within the int8 range") {
    val q = Quantization.quantizedVectors(spark, dir)
      .select(explode($"qvec").as("v"))
      .agg(min("v"), max("v")).collect()(0)
    assert(q.getInt(0) >= -127 && q.getInt(1) <= 127)
  }

  test("quantized vectors reconstruct to approximately unit norm") {
    // after L2 normalization, sum(q_i^2) must sit near 127^2: per-dim
    // error <= 0.5 bounds the drift by 127*||u||_1 + dims/4
    val bad = Quantization.quantizedVectors(spark, dir)
      .filter($"norm" > 0)
      .withColumn("q2", expr(
        "aggregate(transform(qvec, x -> cast(x as bigint) * x), cast(0 as bigint), (a, s) -> a + s)"))
      .filter($"q2" < 127L * 127 - 1100 || $"q2" > 127L * 127 + 1100)
      .count()
    assert(bad == 0L)
  }

  test("quantized top-k ranking agrees with float cosine top-1 on most probes") {
    // recall is a MEASURED property of the quantizer, not an assumption:
    // compare quantized top-1 against full-precision cosine top-1
    val qTop = Quantization.quantizedTopK(spark, dir, 3)
      .filter($"rn" === 1).select($"q_id", $"vec_id".as("q_pick"))
    val cTop = Similarity.cosineTopK(spark, dir)
      .filter($"rn" === 1).select($"q_id", $"vec_id".as("c_pick"))
    val agree = qTop.join(cTop, "q_id")
      .withColumn("hit", when($"q_pick" === $"c_pick", 1).otherwise(0))
      .agg(sum("hit").cast("double") / count(lit(1))).collect()(0).getDouble(0)
    // int8 on unit vectors keeps ~2 decimal digits of each direction;
    // measured top-1 agreement on this corpus is 1.0 — floor at 0.75 to
    // absorb corpus drift
    assert(agree >= 0.75, s"quantized/float top-1 agreement $agree")
  }

  test("IVF+int8 == driver-side in-cluster brute force over the same codes") {
    // replay the whole composition independently: take the trained
    // cluster assignments and the quantized codes, and brute-force the
    // integer ranking inside each probe's own cluster
    val assigned = Clustering.kmeans(spark, dir).collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Number]("cluster").longValue).toMap
    val codes = Quantization.quantizedVectors(spark, dir).collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("qvec"))).toMap
    val got = Quantization.ivfQuantizedKnn(spark, dir).collect()
      .map(r => (r.getLong(0), r.getAs[Number]("probe_cluster").longValue,
        r.getLong(2), r.getLong(3), r.getLong(4)))
    assert(got.nonEmpty)
    got.groupBy(_._1).foreach { case (q, rows) =>
      val cluster = rows.head._2
      // the probed cluster must be the query's own home cluster here
      // (a vector is closest to the centroid it converged under)
      assert(cluster == assigned(q), s"probe $q")
      val expected = codes.toSeq
        .filter { case (id, _) => id != q && assigned(id) == cluster }
        .map { case (id, c) =>
          (id, c.zip(codes(q)).map { case (a, b) => a.toLong * b }.sum) }
        .sortBy { case (id, dot) => (-dot, id) }.take(3)
      val gotRanked = rows.sortBy(_._3).map(r => (r._4, r._5)).toSeq
      assert(gotRanked == expected, s"probe $q: $gotRanked vs $expected")
    }
  }

  test("q61 output shape: 3 neighbors per probe, ordered, self excluded") {
    val rows = Quantization.quantizedTopK(spark, dir, 3).collect()
    val byQ = rows.groupBy(_.getLong(0))
    assert(byQ.size == 8 && byQ.values.forall(_.length == 3))
    rows.foreach { r =>
      assert(r.getLong(2) != r.getLong(0), "self must be excluded")
    }
    byQ.values.foreach { g =>
      val dots = g.sortBy(_.getLong(1)).map(_.getLong(3))
      assert(dots.sameElements(dots.sorted.reverse), "descending by qdot")
    }
  }

  test("binary codes MEASURE against float cosine: top-1 recovered in hamming top-5") {
    // the q91 doc claims ranking parity is a measured property — measure
    // it: for each probe, does the float-cosine top-1 neighbor appear in
    // the hamming top-5? 1-bit codes are coarse; demand a floor, not
    // perfection, and record the observed rate in the assertion message.
    val k = 5
    val hamm = Quantization.binaryHammingTopK(spark, dir, k).collect()
      .map(r => (r.getLong(0), r.getLong(2)))
      .groupBy(_._1).map { case (q, g) => q -> g.map(_._2).toSet }
    val cosTop1 = Similarity.cosineTopK(spark, dir).collect()
      .filter(_.getAs[Long]("rn") == 1L)
      .map(r => (r.getAs[Long]("q_id"), r.getAs[Long]("vec_id")))
    assert(cosTop1.nonEmpty)
    val recovered = cosTop1.count { case (q, v) => hamm(q).contains(v) }
    assert(recovered * 2 >= cosTop1.length,
      s"hamming top-$k recovered only $recovered/${cosTop1.length} cosine top-1s")
  }

  test("binary hamming KNN equals a driver-side sign-pack + popcount replay") {
    val k = 3
    val rows = Quantization.binaryHammingTopK(spark, dir, k).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(rows.nonEmpty)
    val all = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray)
    def code(v: Array[Float]): (Long, Long) = {
      var lo = 0L; var hi = 0L
      (0 until 32).foreach { i => if (v(i) > 0f) lo |= 1L << i }
      (32 until 64).foreach { i => if (v(i) > 0f) hi |= 1L << (i - 32) }
      (lo, hi)
    }
    val codes = all.map { case (id, v) => id -> code(v) }.toMap
    rows.groupBy(_._1).foreach { case (qId, g) =>
      val (qlo, qhi) = codes(qId)
      val expect = codes.toSeq.filter(_._1 != qId)
        .map { case (id, (lo, hi)) =>
          (id, java.lang.Long.bitCount(lo ^ qlo).toLong +
            java.lang.Long.bitCount(hi ^ qhi)) }
        .sortBy { case (id, h) => (h, id) }.take(k)
      val got = g.sortBy(_._2).map(r => (r._3, r._4)).toSeq
      assert(got == expect, s"probe $qId: $got != $expect")
    }
  }

  /** Driver-side replay of the FULL PQ pipeline (pqModel + ADC search):
    * per-sub-space Lloyd with vec_id < kSub seeding, (dist, cluster)
    * ties, sorted-fold centroid means, then the sub-order lookup-table
    * fold — every double added in the same order the operator adds it.
    */
  private def naivePq(vecs: Seq[(Long, Array[Float])], m: Int, subDim: Int,
      kSub: Int, iters: Int, kNeighbors: Int): Seq[(Long, Long, Long, Double)] = {
    val sliced = vecs.flatMap { case (id, v) =>
      (0 until m).map(s => (id, s, v.slice(s * subDim, (s + 1) * subDim)))
    }
    def d2(sv: Array[Float], c: Array[Double]): Double = {
      var acc = 0.0
      var i = 0
      while (i < subDim) {
        val d = sv(i).toDouble - c(i); acc += d * d; i += 1
      }
      acc
    }
    var cents: Map[(Int, Long), Array[Double]] = sliced
      .filter(_._1 < kSub)
      .map { case (id, s, sv) => (s, id) -> sv.map(_.toDouble) }.toMap
    def assign(): Seq[(Long, Int, Array[Float], Long)] =
      sliced.map { case (id, s, sv) =>
        val best = (0L until kSub.toLong)
          .map(cl => (d2(sv, cents((s, cl))), cl)).minBy(identity)
        (id, s, sv, best._2)
      }
    var assigned = assign()
    for (_ <- 1 until iters) {
      cents = assigned.groupBy(a => (a._2, a._4)).map { case ((s, cl), g) =>
        val c = (0 until subDim).map { dim =>
          val vals = g.map(_._3(dim).toDouble).sorted
          vals.reduceLeft(_ + _) / g.size
        }.toArray
        (s, cl) -> c
      }
      assigned = assign()
    }
    val codes = assigned.groupBy(_._1)
      .map { case (id, g) => id -> g.sortBy(_._2).map(_._4).toArray }
    val probes = vecs.filter(_._1 < 8)
    probes.flatMap { case (qId, qv) =>
      // dtab in (sub, cluster) order, exactly the operator's sort key
      val dtab = (0 until m).flatMap(s =>
        (0L until kSub.toLong).map(cl =>
          d2(qv.slice(s * subDim, (s + 1) * subDim), cents((s, cl))))).toArray
      codes.toSeq.filter(_._1 != qId).map { case (id, cs) =>
        var acc = 0.0
        (0 until m).foreach(s => acc += dtab(s * kSub + cs(s).toInt))
        (id, acc)
      }.sortBy { case (id, d) => (d, id) }.take(kNeighbors)
        .zipWithIndex.map { case ((id, d), i) =>
          (qId, (i + 1).toLong, id,
            BigDecimal(d).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble)
        }
    }.sortBy(r => (r._1, r._2))
  }

  test("PQ ADC top-k equals the driver-side train+encode+search replay") {
    val vecs = Tables(spark, dir, "embeddings").collect()
      .map(r => r.getAs[Long]("vec_id") ->
        r.getAs[Seq[Float]]("embedding").toArray).toSeq
    val got = Quantization.pqAdcTopK(spark, dir, 4, 16, 4, 2, 3).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getDouble(3)))
      .toSeq.sortBy(r => (r._1, r._2))
    val expect = naivePq(vecs, 4, 16, 4, 2, 3)
    assert(got.map(r => (r._1, r._2, r._3)) ==
      expect.map(r => (r._1, r._2, r._3)),
      s"ranking mismatch:\n$got\n$expect")
    got.zip(expect).foreach { case (g, e) =>
      assert(math.abs(g._4 - e._4) < 1e-9, s"$g vs $e")
    }
    CachedStages.release(spark)
  }

  test("PQ codes stay within the codebook range") {
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    val (cents, codes) = Quantization.pqModel(vecs, 4, 16, 4, 2)
    assert(cents.count() == 16L) // m * kSub codebook rows
    val bad = codes
      .select(explode(col("codes")).as("c"))
      .filter(col("c") < 0 || col("c") >= 4).count()
    assert(bad == 0L)
    assert(codes.select(expr("size(codes)")).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(4))
    CachedStages.release(spark)
  }
}
