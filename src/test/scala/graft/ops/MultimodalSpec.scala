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
}
