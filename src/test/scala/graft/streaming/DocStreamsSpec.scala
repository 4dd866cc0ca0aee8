package graft.streaming

import graft.SparkSpec
import graft.ops.{Privacy, Tables, TextOps}
import java.nio.file.{Files, Paths}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.OutputMode

/** The streaming curation passes must agree with their batch twins on
  * the same documents (stateless projections: the plans are literally
  * the batch pipelines applied per micro-batch).
  */
class DocStreamsSpec extends SparkSpec {

  lazy val streamDir: String = {
    val d = Files.createTempDirectory("docs_stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/documents.parquet"),
      d.resolve("documents.parquet"))
    d.toString
  }

  test("streaming quality scores match the batch scoring stage") {
    val stream = DocStreams.readDocStream(spark, streamDir)
    EventStreams.runToMemory(DocStreams.scoredDocs(stream),
      "doc_quality", OutputMode.Append())
    val streamed = spark.table("doc_quality").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // q16's per-doc stage: the stored n_chars column feeds the length
    // band, exactly as the streaming twin must
    val batch = TextOps.tokenized(spark, "/root/testdata/sf0.001")
      .withColumn("quality", TextOps.qualityCol(
        col("n_chars"), col("n_toks"), col("stop_hits")))
      .select("doc_id", "quality").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(streamed == batch && streamed.nonEmpty)
  }

  test("streaming pii scrub matches the batch scrub") {
    // plant PII the same way the batch graded query does, as files
    val in = Files.createTempDirectory("docs_pii_in").toString
    Privacy.corpusWithPii(spark, "/root/testdata/sf0.001")
      .write.mode("overwrite").parquet(in)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING").parquet(in)
    EventStreams.runToMemory(DocStreams.scrubbedDocs(stream),
      "doc_scrub", OutputMode.Append())
    val streamed = spark.table("doc_scrub").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    val batch = Privacy.piiScrub(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
      .toSet
    assert(streamed == batch && streamed.size == 10)
  }
}
