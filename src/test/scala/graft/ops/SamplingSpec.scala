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

  test("token shards match a driver-side naive global prefix sum") {
    val rows = Sampling.tokenShards(spark, dir, shardSize = 2000L).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    val all = Tables(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(rows.map(_._1).toSet == all && rows.length == all.size)
    // naive single-threaded recompute of the global layout: sort by
    // (md5-hash, id), accumulate — the two-phase decomposition must
    // reproduce it EXACTLY, token for token
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(id: Long) =
      md.digest(id.toString.getBytes("UTF-8")).map("%02x".format(_)).mkString
    val byId = rows.map(r => r._1 -> r).toMap
    var running = 0L
    rows.map(r => (hex(r._1), r._1)).sorted.foreach { case (_, id) =>
      val (_, nToks, startTok, shard) = byId(id)
      assert(startTok == running, s"doc $id: start $startTok != $running")
      assert(shard == running / 2000L)
      running += nToks
    }
    // the last shard boundary covers the whole corpus
    assert(running == rows.map(_._2).sum)
    // a doc never starts mid-gap: shards are dense from 0
    val shards = rows.map(_._4).toSet
    assert(shards == (0L to shards.max).toSet)
  }

  test("packed sequences tile the layout exactly and split boundary docs") {
    import spark.implicits._
    val seqLen = 7L
    val corpus = Seq(
      (1L, "a b c d e"),          // 5 tokens
      (2L, "f g h i j k l m n"),  // 9 tokens — must straddle a boundary
      (3L, ""),                   // 0 tokens — occupies no layout space
      (4L, "o p q"),              // 3 tokens
      (5L, "r s t u v w x y z aa bb cc dd ee ff gg")) // 16 toks, >=3 pieces
      .toDF("doc_id", "text")
    val rows = Sampling.packSequencesOf(corpus, seqLen).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // zero-token docs emit no piece; everyone else appears
    assert(!rows.exists(_._1 == 3L))
    assert(rows.map(_._1).toSet == Set(1L, 2L, 4L, 5L))
    // per-doc pieces reassemble the doc: doc_offs are contiguous from 0
    // and piece sizes sum to the doc's token count
    val nToks = Map(1L -> 5L, 2L -> 9L, 4L -> 3L, 5L -> 16L)
    nToks.foreach { case (id, n) =>
      val pieces = rows.filter(_._1 == id).sortBy(_._4)
      assert(pieces.map(_._5).sum == n, s"doc $id pieces != $n toks")
      var off = 0L
      pieces.foreach { p =>
        assert(p._4 == off, s"doc $id: doc_off ${p._4} != $off")
        off += p._5
      }
    }
    // per-sequence pieces tile the window: seq_starts contiguous from 0,
    // every window except the last exactly seqLen full
    val total = nToks.values.sum
    val lastSeq = (total - 1) / seqLen
    rows.groupBy(_._2).foreach { case (seq, ps) =>
      val sorted = ps.sortBy(_._3)
      var at = 0L
      sorted.foreach { p =>
        assert(p._3 == at, s"seq $seq: seq_start ${p._3} != $at")
        at += p._5
      }
      if (seq < lastSeq) assert(at == seqLen, s"seq $seq not full: $at")
      else assert(at == total - seqLen * lastSeq)
    }
    // sequences are dense from 0 — the loader never sees a hole
    assert(rows.map(_._2).toSet == (0L to lastSeq).toSet)
    // a straddling doc's pieces land in CONSECUTIVE windows (16 tokens
    // over 7-token windows: 3 or 4 pieces depending on its layout offset)
    val d5 = rows.filter(_._1 == 5L).sortBy(_._4).map(_._2)
    assert(d5.length >= 3 && d5.zip(d5.tail).forall(p => p._2 == p._1 + 1))
  }

  test("epoch order: per-epoch permutations matching a naive driver recompute") {
    val epochs = 3
    val rows = Sampling.epochOrder(spark, dir, epochs).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)))
    val all = Tables(spark, dir, "documents").select("doc_id")
      .collect().map(_.getLong(0)).toSet
    val md = java.security.MessageDigest.getInstance("MD5")
    def hex(e: Long, id: Long) =
      md.digest(s"${e}_$id".getBytes("UTF-8")).map("%02x".format(_)).mkString
    (0L until epochs).foreach { e =>
      val ep = rows.filter(_._1 == e)
      // a permutation: every doc exactly once, positions dense from 0
      assert(ep.map(_._2).toSet == all && ep.length == all.size)
      assert(ep.map(_._3).sorted.toSeq == (0L until all.size).toSeq)
      // the naive recompute: global sort by (md5(e_id), id)
      val expect = all.toSeq.map(id => (hex(e, id), id)).sorted
        .zipWithIndex.map { case ((_, id), i) => id -> i.toLong }.toMap
      ep.foreach { case (_, id, pos) =>
        assert(pos == expect(id), s"epoch $e doc $id: $pos != ${expect(id)}")
      }
    }
    // epochs are genuinely different orders
    val o0 = rows.filter(_._1 == 0L).sortBy(_._3).map(_._2).toSeq
    val o1 = rows.filter(_._1 == 1L).sortBy(_._3).map(_._2).toSeq
    assert(o0 != o1)
    CachedStages.release(spark)
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
