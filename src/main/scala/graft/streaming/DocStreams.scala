package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Streaming formulation of the curation surface (graft.ops.TextOps /
  * Privacy): documents arriving as files are quality-scored and
  * PII-scrubbed in flight. Both passes are STATELESS projections —
  * no watermark, no state store, no shuffle — so the streaming plan is
  * the identical codegen'd pipeline the batch operators run, applied
  * per micro-batch: the ingestion-edge shape where curation belongs at
  * scale (score documents as they land, not in a nightly re-scan of
  * the corpus).
  *
  * DocStreamsSpec asserts batch equality: the streamed result set must
  * match the batch operators row-for-row on the same input.
  */
object DocStreams {

  /** File-source schema of the documents parquet layout. */
  val docSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  /** Open a documents directory as a stream. */
  def readDocStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(docSchema).parquet(dir)

  /** Per-document quality band (TextOps' integer score) — the streaming
    * twin of q16's per-doc scoring stage: the same shared tokenization
    * chain, and the same STORED `n_chars` column feeding the length
    * band (re-deriving length(text) here could silently diverge from
    * the batch band whenever n_chars was counted differently upstream).
    * One stateless projection.
    */
  def scoredDocs(stream: DataFrame): DataFrame =
    graft.ops.TextOps.tokenizedOf(stream)
      .withColumn("quality", graft.ops.TextOps.qualityCol(
        col("n_chars"), col("n_toks"), col("stop_hits")))
      .select("doc_id", "quality")

  /** PII scrub in flight — the streaming twin of q48. The RLIKE
    * prefilter and redaction are the same expressions; rows without PII
    * pass through the filter and never pay extraction.
    */
  def scrubbedDocs(stream: DataFrame): DataFrame =
    graft.ops.Privacy.piiScrubOf(stream.select("doc_id", "text"))
}
