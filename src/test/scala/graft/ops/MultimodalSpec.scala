package graft.ops

import graft.SparkSpec

class MultimodalSpec extends SparkSpec {

  val dir = "/root/testdata/sf0.001"

  test("media table carries binary payloads with typed metadata") {
    val m = Multimodal.mediaTable(spark, dir).limit(5).collect()
    assert(m.forall(_.content.nonEmpty))
    assert(m.forall(_.meta.mime == "text/plain"))
  }

  test("feature extraction matches a direct byte computation") {
    val f = Multimodal.extractFeatures(spark, dir)
      .filter(_.doc_id == 0).collect().head
    val text = Tables(spark, dir, "documents")
      .filter("doc_id = 0").head.getAs[String]("text")
    val bytes = text.getBytes("UTF-8")
    assert(f.byte_len == bytes.length)
    assert(f.first_byte == (bytes(0) & 0xff))
    assert(f.byte_sum == bytes.map(_ & 0xff).map(_.toLong).sum)
  }

  test("resize truncates or zero-pads to the target length") {
    val resized = Multimodal.resizeContent(spark,
      Multimodal.mediaTable(spark, dir).limit(10), 64).collect()
    assert(resized.forall(_.content.length == 64))
    val original = Multimodal.mediaTable(spark, dir).limit(10).collect()
      .map(r => r.doc_id -> r.content).toMap
    resized.foreach { r =>
      val orig = original(r.doc_id)
      if (orig.length >= 64) assert(r.content.sameElements(orig.take(64)))
      else {
        assert(r.content.take(orig.length).sameElements(orig))
        assert(r.content.drop(orig.length).forall(_ == 0)) // zero padding
      }
    }
  }

  test("frame sampling emits every k-th fixed-size frame") {
    val media = Multimodal.mediaTable(spark, dir).filter(_.doc_id == 0)
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
