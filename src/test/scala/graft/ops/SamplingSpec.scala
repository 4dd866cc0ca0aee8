package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SamplingSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("hash split is total, disjoint, and matches a driver-side recompute") {
    val rows = Sampling.hashSplit(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getString(2)))
    val all = Tables(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    // total and exactly-once: every document gets exactly one split
    assert(rows.map(_._1).toSet == all && rows.length == all.size)
    // driver-side recompute of the bucket function (same md5-prefix rule)
    val md = java.security.MessageDigest.getInstance("MD5")
    rows.foreach { case (id, bucket, split) =>
      val hex = md.digest(id.toString.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString.take(6)
      val expected = java.lang.Long.parseLong(hex, 16) % 100
      assert(bucket == expected, s"doc $id: bucket $bucket != $expected")
      val expSplit = if (bucket < 90) "train"
        else if (bucket < 95) "validation" else "test"
      assert(split == expSplit)
    }
    // the ratios are what the bucket thresholds say (hash-uniform: give
    // the 500-doc corpus generous slack, but all three must be nonempty)
    val counts = rows.groupBy(_._3).map { case (s, a) => s -> a.length }
    assert(counts.getOrElse("train", 0) > 400 &&
      counts.getOrElse("validation", 0) > 0 &&
      counts.getOrElse("test", 0) > 0, counts.toString)
  }

  test("hash sample is deterministic, monotone in pct, and exact at the ends") {
    val docs = Tables(spark, dir, "documents")
    def ids(pct: Int): Set[Long] =
      Sampling.hashSample(docs, "doc_id", pct).select("doc_id")
        .collect().map(_.getLong(0)).toSet
    assert(ids(0).isEmpty)
    assert(ids(100).size == docs.count())
    val s10 = ids(10)
    val s20 = ids(20)
    // monotone nesting is what makes "grow the debug slice" reproducible
    assert(s10.nonEmpty && s10.subsetOf(s20) && s20.size > s10.size)
    // re-running is the SAME slice — the property RNG sampling lacks
    assert(ids(10) == s10)
  }
}
