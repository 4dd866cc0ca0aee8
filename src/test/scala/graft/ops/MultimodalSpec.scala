package graft.ops

import java.io.ByteArrayInputStream
import javax.imageio.ImageIO

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("image table carries real PNG payloads with typed metadata") {
    val m = Multimodal.imageTable(spark, dir).limit(5).collect()
    assert(m.forall(_.meta.mime == "image/png"))
    // PNG signature: 0x89 'P' 'N' 'G'
    m.foreach { r =>
      assert((r.content(0) & 0xff) == 0x89 && r.content(1) == 'P' &&
        r.content(2) == 'N' && r.content(3) == 'G')
    }
  }

  test("ImageIO decode recovers the planted pixel arithmetic exactly") {
    val feats = Multimodal.decodeImages(spark, dir)
      .filter(_.doc_id < 10).collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 10)
    feats.foreach { case (id, f) =>
      // expected values recomputed here with an INDEPENDENT inline loop
      // (the same arithmetic the oracle SQL evaluates)
      val w = (4 + id % 5).toInt
      val h = (3 + id % 4).toInt
      var (sr, sg, sb) = (0L, 0L, 0L)
      for (y <- 0 until h; x <- 0 until w) {
        sr += (id * 31 + x * 7 + y * 13) % 256
        sg += (id * 17 + x * 3 + y * 5) % 256
        sb += (id * 11 + x + y) % 256
      }
      assert(f.width == w && f.height == h && f.n_pixels == w.toLong * h)
      assert(f.sum_red == sr, s"doc $id red")
      assert(f.sum_green == sg, s"doc $id green")
      assert(f.sum_blue == sb, s"doc $id blue")
    }
  }

  test("resize rescales to the target dimensions; same-size resize is lossless") {
    val media = Multimodal.imageTable(spark, dir).filter(_.doc_id < 5)
    val resized = Multimodal.resizeImages(spark, media, 2, 2).collect()
    assert(resized.length == 5)
    resized.foreach { r =>
      val img = ImageIO.read(new ByteArrayInputStream(r.content))
      assert(img.getWidth == 2 && img.getHeight == 2)
    }
    // doc 0 is 4x3: resizing to its own dimensions must preserve every
    // pixel (nearest-neighbor at scale 1 is the identity)
    val d0 = Multimodal.imageTable(spark, dir).filter(_.doc_id == 0)
    val same = Multimodal.resizeImages(spark, d0, 4, 3).collect().head
    val orig = ImageIO.read(new ByteArrayInputStream(d0.collect().head.content))
    val round = ImageIO.read(new ByteArrayInputStream(same.content))
    for (y <- 0 until 3; x <- 0 until 4)
      assert((round.getRGB(x, y) & 0xffffff) == (orig.getRGB(x, y) & 0xffffff))
  }

  test("audio table carries real WAV payloads (RIFF/WAVE container)") {
    val m = Multimodal.audioTable(spark, dir).limit(5).collect()
    assert(m.forall(_.meta.mime == "audio/wav"))
    m.foreach { r =>
      assert(new String(r.content.take(4), "US-ASCII") == "RIFF")
      assert(new String(r.content.slice(8, 12), "US-ASCII") == "WAVE")
    }
  }

  test("AudioSystem decode recovers the planted sample arithmetic exactly") {
    val feats = Multimodal.decodeAudio(spark, dir)
      .filter(_.doc_id < 10).collect().map(f => f.doc_id -> f).toMap
    assert(feats.size == 10)
    feats.foreach { case (id, f) =>
      // independent inline recompute — the same arithmetic the oracle
      // SQL evaluates
      val n = (50 + id % 32).toInt
      val samples = (0 until n).map(i => ((id * 131 + i * 37) % 65536).toInt - 32768)
      val expectedCross = samples.sliding(2).count {
        case Seq(a, b) => a.toLong * b < 0
        case _ => false
      }
      assert(f.n_samples == n.toLong, s"doc $id n_samples")
      assert(f.sum_abs == samples.map(s => math.abs(s.toLong)).sum, s"doc $id sum_abs")
      assert(f.peak == samples.map(s => math.abs(s.toLong)).max, s"doc $id peak")
      assert(f.n_zero_cross == expectedCross.toLong, s"doc $id zero_cross")
    }
  }

  test("WAV round trip is lossless for hand-built sample sequences") {
    // encode uses the SAME codec path the table uses; decode must see
    // sign flips and zero samples exactly (zero breaks a crossing run)
    val bytes = Multimodal.AudioCodec.encode(7L)
    val f = Multimodal.AudioCodec.decode(7L, "en", bytes)
    assert(f.n_samples == Multimodal.AudioCodec.nSamples(7L).toLong)
    val expected = (0 until Multimodal.AudioCodec.nSamples(7L))
      .map(Multimodal.AudioCodec.sample(7L, _))
    assert(f.peak == expected.map(s => math.abs(s.toLong)).max)
  }

  test("audio decimation keeps exactly every k-th sample, re-encoded as WAV") {
    val media = Multimodal.audioTable(spark, dir).filter(_.doc_id < 5)
    val halved = Multimodal.decimateAudio(spark, media, 2).collect()
      .map(r => r.doc_id -> r).toMap
    assert(halved.size == 5)
    halved.foreach { case (id, r) =>
      val f = Multimodal.AudioCodec.decode(id, "en", r.content)
      val n = Multimodal.AudioCodec.nSamples(id)
      assert(f.n_samples == (n + 1) / 2, s"doc $id sample count")
      // decoded samples must be the ORIGINAL even-index samples
      val expected = (0 until n by 2)
        .map(i => Multimodal.AudioCodec.sample(id, i))
      assert(f.sum_abs == expected.map(s => math.abs(s.toLong)).sum,
        s"doc $id decimated content")
    }
    // factor 1 is the identity
    val same = Multimodal.decimateAudio(spark, media, 1).collect().head
    val f1 = Multimodal.AudioCodec.decode(same.doc_id, "en", same.content)
    assert(f1.n_samples == Multimodal.AudioCodec.nSamples(same.doc_id).toLong)
  }

  test("frame sampling emits every k-th fixed-size byte frame") {
    val media = Multimodal.imageTable(spark, dir).filter(_.doc_id == 0)
    val content = media.collect().head.content
    val frames = Multimodal.sampleFrames(spark, media, frameSize = 32, every = 2)
      .collect().sortBy(_.frame_idx)
    val nFrames = math.ceil(content.length / 32.0).toInt
    assert(frames.length == (nFrames + 1) / 2)
    assert(frames.forall(_.frame_idx % 2 == 0))
    assert(frames.head.frame.sameElements(content.take(32)))
    frames.foreach { f =>
      assert(f.frame.sameElements(
        content.slice(f.frame_idx * 32, (f.frame_idx + 1) * 32)))
    }
  }

  /** Arithmetic replay of the q129 dHash from the textured formulas. */
  private def naiveDHash(base: Long, pert: Boolean): (Long, Long, Long) = {
    val w = Multimodal.ImageCodec.width(base)
    val h = Multimodal.ImageCodec.height(base)
    def luma(x: Int, y: Int): Long = {
      val r = if (pert && x == 0 && y == 0) (base * 31 + 40) % 256
        else Multimodal.TexturedCodec.red(base, x, y).toLong
      299L * r + 587L * Multimodal.TexturedCodec.green(base, x, y) +
        114L * Multimodal.TexturedCodec.blue(base, x, y)
    }
    var hash = 0L
    var idx = 0
    for (y <- 0 until h; x <- 0 until w - 1) {
      if (luma(x + 1, y) > luma(x, y)) hash |= 1L << idx
      idx += 1
    }
    (w.toLong, h.toLong, hash)
  }

  test("q129: decoded dHashes equal the arithmetic replay, clones included") {
    val got = Multimodal.imageDHashes(spark, dir).collect()
      .map(r => r.doc_id -> (r.w, r.h, r.dhash)).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, t) =>
      val (base, pert) =
        if (id >= 1000000L) (id - 1000000L, true) else (id, false)
      assert(t == naiveDHash(base, pert), s"img $id")
    }
    // the retouch flips at most one bit of its original's hash
    got.keys.filter(_ >= 1000000L).foreach { cid =>
      val (_, _, ch) = got(cid)
      val (_, _, bh) = got(cid - 1000000L)
      assert(java.lang.Long.bitCount(ch ^ bh) <= 1, s"clone $cid")
    }
    CachedStages.release(spark)
  }

  test("q129: report equals a driver-side brute force; every planted clone recovered") {
    val hashes = Multimodal.imageDHashes(spark, dir).collect()
      .map(r => (r.doc_id, r.w, r.h, r.dhash))
    val brute = hashes.groupBy(r => (r._2, r._3)).map { case (dims, g) =>
      val pairs = for {
        a <- g; b <- g if a._1 < b._1
        hm = java.lang.Long.bitCount(a._4 ^ b._4).toLong if hm <= 3
      } yield (hm, if (b._1 - a._1 == 1000000L) 1L else 0L)
      dims -> ((g.length.toLong, pairs.length.toLong,
        pairs.map(_._1).sum, pairs.map(_._2).sum))
    }
    val got = Multimodal.imageNearDups(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1)) ->
        ((r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5)))).toMap
    assert(got == brute, s"got $got\nbrute $brute")
    // recovery: one near-dup pair per planted clone, all found
    val nClones = hashes.count(_._1 >= 1000000L).toLong
    assert(nClones > 0 && got.values.map(_._4).sum == nClones)
    CachedStages.release(spark)
  }

  /** Arithmetic replay of the q130 sign-bit fingerprint. */
  private def naiveAudioFp(base: Long, pert: Boolean): Long = {
    var fp = 0L
    for (i <- 0 until Multimodal.AudioFpBits) {
      if (Multimodal.TexturedAudio.sample(base, i, pert) >= 0) fp |= 1L << i
    }
    fp
  }

  test("q130: decoded audio fingerprints equal the arithmetic replay, clones included") {
    val got = Multimodal.audioFingerprints(spark, dir).collect()
      .map(r => r.doc_id -> r.fp).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, fp) =>
      val (base, pert) =
        if (id >= 1000000L) (id - 1000000L, true) else (id, false)
      assert(fp == naiveAudioFp(base, pert), s"clip $id")
    }
    CachedStages.release(spark)
  }

  test("q130: report equals a driver-side brute force; every planted clone recovered") {
    val fps = Multimodal.audioFingerprints(spark, dir).collect()
      .map(r => (r.doc_id, r.fp))
    val pairs = for {
      a <- fps; b <- fps if a._1 < b._1
      hm = java.lang.Long.bitCount(a._2 ^ b._2).toLong if hm <= 3
    } yield (hm, if (b._1 - a._1 == 1000000L) 1L else 0L)
    val row = Multimodal.audioNearDups(spark, dir).collect()(0)
    assert((row.getLong(0), row.getLong(1), row.getLong(2), row.getLong(3)) ==
      ((fps.length.toLong, pairs.length.toLong,
        pairs.map(_._1).sum, pairs.map(_._2).sum)))
    val nClones = fps.count(_._1 >= 1000000L).toLong
    assert(nClones > 0 && row.getLong(3) == nClones)
    CachedStages.release(spark)
  }
}
