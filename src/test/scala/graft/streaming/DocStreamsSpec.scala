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

  test("streaming importance scoring matches the batch report under a frozen model") {
    val batchDocs = Tables(spark, "/root/testdata/sf0.001", "documents")
    // fit on the batch corpus, ship the lean set to the stream
    val model = graft.ops.Importance.leanBucketSet(batchDocs, "en")
    val stream = DocStreams.readDocStream(spark, streamDir)
    EventStreams.runToMemory(
      DocStreams.importanceScoredDocs(stream, model),
      "doc_importance", OutputMode.Append())
    val streamed = spark.table("doc_importance").collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    val batch = graft.ops.Importance.importanceReportOf(batchDocs, "en")
      .collect()
      .map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getBoolean(3))))
      .toMap
    assert(streamed.nonEmpty && streamed == batch)
    graft.ops.CachedStages.release(spark)
  }

  test("streaming quantization matches the batch quantizer") {
    val d = Files.createTempDirectory("emb_stream")
    Files.copy(Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val stream = EmbeddingStreams.readEmbeddingStream(spark, d.toString)
    EventStreams.runToMemory(EmbeddingStreams.quantizedVectors(stream),
      "emb_quant", OutputMode.Append())
    val streamed = spark.table("emb_quant").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("qvec"))).toMap
    val batch = graft.ops.Quantization
      .quantizedVectors(spark, "/root/testdata/sf0.001").collect()
      .map(r => r.getLong(0) -> r.getSeq[Int](r.fieldIndex("qvec"))).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming min-max scaling under a frozen range model matches batch") {
    val src = "/root/testdata/sf0.001"
    val vecs = graft.ops.Tables(spark, src, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    // freeze the model from the SAME corpus the batch op normalizes, so
    // the in-flight projection must reproduce q76 row for row
    val (mins, maxs) = EmbeddingStreams.fitMinmaxRanges(vecs)
    assert(mins.length == maxs.length && mins.length == 64)
    val d = Files.createTempDirectory("emb_minmax_stream")
    Files.copy(Paths.get(s"$src/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val stream = EmbeddingStreams.readEmbeddingStream(spark, d.toString)
    EventStreams.runToMemory(
      EmbeddingStreams.minmaxScaledVectors(stream, mins, maxs),
      "emb_minmax", OutputMode.Append())
    val streamed = spark.table("emb_minmax").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val batch = graft.ops.Features.minmaxScaledOf(vecs).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming decontamination screen under a frozen benchmark matches the batch q103 flags") {
    val src = "/root/testdata/sf0.001"
    val corpus = graft.ops.Similarity.rawVectors(spark, src)
    val bench = EmbeddingStreams.fitBenchmark(corpus)
    assert(bench.nonEmpty && bench.forall(_.length == 64))
    val d = Files.createTempDirectory("emb_screen_stream")
    Files.copy(Paths.get(s"$src/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val stream = EmbeddingStreams.readEmbeddingStream(spark, d.toString)
    EventStreams.runToMemory(
      EmbeddingStreams.screenedVectors(spark, stream, bench, 0.95),
      "emb_screen", OutputMode.Append())
    val streamed = spark.table("emb_screen").collect()
      .map(r => r.getLong(0) -> r.getBoolean(r.fieldIndex("contaminated")))
      .toMap
    // independent batch formulation: the q103 pair scorer's flag per
    // vector (same benchmark derivation, same kernel, same rounding)
    graft.functions.CosineSimilarity.register(spark)
    val benchDf = corpus.filter(col("vec_id") % 100 === 0)
      .select(expr("transform(v, x -> CAST(x * CAST(2 AS FLOAT) AS FLOAT))")
        .as("b_vec"))
    val batch = corpus.crossJoin(broadcast(benchDf))
      .withColumn("cos", round(expr("cosine_sim(b_vec, v)"), 6))
      .groupBy("vec_id")
      .agg(max(when(col("cos") >= 0.95, 1).otherwise(0)).as("flag"))
      .collect().map(r => r.getLong(0) -> (r.getInt(1) == 1)).toMap
    assert(streamed.nonEmpty && streamed == batch)
    // the planted twins are live in this fixture: every 100th flagged
    assert(streamed.filter(_._2).keySet ==
      streamed.keySet.filter(_ % 100 == 0))
  }

  test("streaming drift histogram equals the batch reference histogram") {
    val src = "/root/testdata/sf0.001"
    val vecs = graft.ops.Tables(spark, src, "embeddings")
      .select(org.apache.spark.sql.functions.col("vec_id"),
        org.apache.spark.sql.functions.col("embedding"))
    val (mins, maxs) = EmbeddingStreams.fitMinmaxRanges(vecs)
    val d = Files.createTempDirectory("emb_drift_stream")
    Files.copy(Paths.get(s"$src/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val stream = EmbeddingStreams.readEmbeddingStream(spark, d.toString)
    EventStreams.runToMemory(
      EmbeddingStreams.driftHistogram(stream, mins, maxs, 16),
      "emb_drift", OutputMode.Complete())
    val streamed = spark.table("emb_drift").collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    // the whole corpus streamed through => the candidate histogram must
    // equal the batch reference bucket for bucket (shared bucketCol)
    val batch = graft.ops.Features.embeddingHistogramOf(vecs, 16).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("stream-static snapshot classification agrees with the batch exact stage") {
    import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}
    val src = "/root/testdata/sf0.001"
    val old = Tables(spark, src, "documents")
    val d = Files.createTempDirectory("snap_stream")
    graft.ops.Dedup.nextSnapshot(spark, src)
      .select(col("new_id").as("doc_id"), col("text"))
      .write.parquet(d.toString + "/data")
    val schema = StructType(Seq(StructField("doc_id", LongType),
      StructField("text", StringType)))
    val stream = spark.readStream.schema(schema).parquet(d.toString + "/data")
    EventStreams.runToMemory(
      DocStreams.snapshotClassifiedDocs(stream, old),
      "snap_cls", OutputMode.Append())
    val streamed = spark.table("snap_cls").collect()
      .map(r => (r.getLong(0), r.getString(1),
        if (r.isNullAt(2)) -1L else r.getLong(2))).toSet
    // batch reference: q85's report with the near-dup stage collapsed —
    // in flight only the exact gate decides; everything else forwards
    val batch = graft.ops.Dedup.snapshotDedup(spark, src).collect().map { r =>
      val exact = r.getString(1) == "exact_dup"
      (r.getLong(0), if (exact) "exact_dup" else "candidate",
        if (exact) r.getLong(2) else -1L)
    }.toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("streaming dedup drops cross-batch duplicates against the state store") {
    import java.nio.file.attribute.FileTime
    import spark.implicits._
    val in = Files.createTempDirectory("docs_dedup_in")
    def writeFile(sub: String, rows: Seq[(Long, String)], mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("docs_dedup_tmp").toString
      rows.toDF("doc_id", "text").coalesce(1).write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = in.resolve(sub)
      Files.copy(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    // file B re-sends doc 1's content under a new id: the second batch
    // must drop it against state from the first
    writeFile("a.parquet", Seq((1L, "aaa"), (2L, "bbb")), 1000000L)
    writeFile("b.parquet", Seq((3L, "aaa"), (4L, "ccc")), 2000000L)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING")
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    EventStreams.runToMemory(DocStreams.dedupedDocs(stream),
      "doc_dedup", OutputMode.Append())
    val kept = spark.table("doc_dedup").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(kept.keySet == Set(1L, 2L, 4L))
    assert(kept(1L) == "aaa" && kept(4L) == "ccc")
  }

  test("watermarked dedup suppresses in-horizon dups and re-admits beyond the horizon") {
    import java.nio.file.attribute.FileTime
    import java.sql.Timestamp
    import spark.implicits._
    val in = Files.createTempDirectory("docs_wm_in")
    val t0 = 1700000000000L // fixed epoch for determinism
    def ts(offsetMs: Long) = new Timestamp(t0 + offsetMs)
    def writeFile(sub: String, rows: Seq[(Long, String, Timestamp)],
        mtime: Long): Unit = {
      val tmp = Files.createTempDirectory("docs_wm_tmp").toString
      rows.toDF("doc_id", "text", "arrival_ts").coalesce(1)
        .write.mode("overwrite").parquet(tmp)
      val part = new java.io.File(tmp).listFiles()
        .filter(_.getName.endsWith(".parquet")).head
      val dst = in.resolve(sub)
      Files.copy(part.toPath, dst)
      Files.setLastModifiedTime(dst, FileTime.fromMillis(mtime))
    }
    val hour = 3600000L
    // batch 1: content X plus an in-batch duplicate -> one survives
    writeFile("a.parquet",
      Seq((1L, "xxx", ts(0)), (2L, "xxx", ts(1000)), (3L, "yyy", ts(0))),
      1000000L)
    // batch 2: unrelated content an hour later advances the watermark
    // far past X's 10-minute retention
    writeFile("b.parquet", Seq((4L, "zzz", ts(hour))), 2000000L)
    // batches 3 and 4: X returns long after its 10-minute horizon.
    // State eviction runs at batch COMMIT with that batch's watermark,
    // so the first post-horizon copy (doc 5) still sees the stale entry
    // and is dropped — the API's contract is only "no duplicates WITHIN
    // the delay; beyond it, best effort" — while the next one (doc 6)
    // arrives after eviction and is re-admitted.
    writeFile("c.parquet", Seq((5L, "xxx", ts(hour + 1000))), 3000000L)
    writeFile("d.parquet", Seq((6L, "xxx", ts(hour + 2000))), 4000000L)
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, arrival_ts TIMESTAMP")
      .option("maxFilesPerTrigger", "1")
      .parquet(in.toString)
    EventStreams.runToMemory(
      DocStreams.dedupedDocsWithinWatermark(stream, "10 minutes"),
      "doc_dedup_wm", OutputMode.Append())
    val kept = spark.table("doc_dedup_wm").collect()
      .map(_.getLong(0)).toSet
    // doc 2 (in-horizon dup) suppressed for sure; the horizon is real:
    // X is re-admitted once its state ages out (doc 6), which an
    // unbounded dropDuplicates would never do
    assert(!kept.contains(2L))
    assert(Set(1L, 3L, 4L).subsetOf(kept))
    assert(kept.contains(6L) || kept.contains(5L))
  }

  test("q203 twin: streamed (token, doc) counts derive the identical " +
    "burstiness table") {
    val stream = DocStreams.readDocStream(spark, streamDir)
    EventStreams.runToMemory(DocStreams.tokenDocCountStream(stream),
      "token_doc_counts", OutputMode.Complete())
    val state = spark.table("token_doc_counts").localCheckpoint()
    val streamed = TextOps.burstinessOfCounts(state, 20L, 20).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    graft.ops.CachedStages.release(spark)
    val batch = TextOps.tokenBurstiness(spark, "/root/testdata/sf0.001")
      .collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSeq
    assert(streamed == batch && batch.nonEmpty)
    // the state the twin exists for: one row per (token, doc) pair
    assert(state.groupBy("token", "doc_id").count()
      .filter(col("count") > 1).count() == 0L)
    graft.ops.CachedStages.release(spark)
  }
  test("q109 twin: streamed CMS counters equal the batch sketch cell for cell") {
    val w = 64 // small width forces real collisions through the twin
    val d = 3
    val stream = DocStreams.readDocStream(spark, streamDir)
    EventStreams.runToMemory(
      DocStreams.cmsCounterStream(stream, w, d),
      "cms_counters", OutputMode.Complete())
    val streamed = spark.table("cms_counters").collect()
      .map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    // batch sketch over the exact vocab counts of the same corpus —
    // sum associativity is what makes the n=1 streaming feed equivalent
    val batch = TextOps.cmsCountersOf(
      Tables(spark, "/root/testdata/sf0.001", "documents")
        .filter(col("doc_id").isNotNull)
        .select(explode(expr(TextOps.tokensExpr)).as("token"))
        .groupBy("token").agg(count(lit(1)).as("n")), w, d)
      .collect().map(r => ((r.getInt(0), r.getLong(1)), r.getLong(2))).toMap
    assert(streamed.nonEmpty && streamed == batch)
    // the state bound the twin exists for: never more than d*w cells
    assert(streamed.size <= d * w)
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

  test("q123 twin: streaming chunker equals the batch chunk set") {
    val stream = spark.readStream
      .schema("doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG")
      .parquet(streamDir)
    EventStreams.runToMemory(DocStreams.chunkedDocs(stream),
      "doc_chunks", OutputMode.Append())
    val streamed = spark.table("doc_chunks").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    val batch = TextOps.ragChunks(spark, "/root/testdata/sf0.001").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getString(5))).toSet
    assert(streamed.nonEmpty && streamed == batch)
  }

  test("q117 twin: streaming PQ encode under frozen codebooks equals the batch codes") {
    val src = "/root/testdata/sf0.001"
    val vecs = Tables(spark, src, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
    // train offline on the SAME corpus the stream replays, so the
    // in-flight encoder must reproduce pqModel's assignment exactly
    val cb = EmbeddingStreams.fitPqCodebooks(vecs, 4, 16, 4, 2)
    assert(cb.length == 4 && cb.forall(_.length == 4) &&
      cb.forall(_.forall(_.length == 16)))
    val d = Files.createTempDirectory("emb_pq_stream")
    Files.copy(Paths.get(s"$src/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val stream = EmbeddingStreams.readEmbeddingStream(spark, d.toString)
    EventStreams.runToMemory(
      EmbeddingStreams.pqEncodedVectors(stream, cb, 16),
      "emb_pq", OutputMode.Append())
    val streamed = spark.table("emb_pq").collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    val (_, codes) = graft.ops.Quantization.pqModel(vecs, 4, 16, 4, 2)
    val batch = codes.collect()
      .map(r => r.getLong(0) -> r.getSeq[Long](1).toSeq).toMap
    assert(streamed.nonEmpty && streamed == batch)
    graft.ops.CachedStages.release(spark)
  }
  test("q141 twin: streamed drift counts match batch cell for cell, TVs row for row") {
    val stream = DocStreams.readDocStream(spark, streamDir)
    EventStreams.runToMemory(
      DocStreams.driftCounterStream(stream),
      "drift_counters", OutputMode.Complete())
    // localCheckpoint: the memory-sink view can't self-join (its plan
    // carries fixed attribute ids), and the TV computation reads the
    // count matrix from four branches
    val streamedCounts = spark.table("drift_counters").localCheckpoint()
    val got = streamedCounts.collect()
      .map(r => ((r.getString(0), r.getString(1)), r.getLong(2))).toMap
    val batchDocs = Tables(spark, "/root/testdata/sf0.001", "documents")
    val batchCounts = batchDocs.filter(col("doc_id").isNotNull)
      .select(col("source"), explode(expr(TextOps.tokensExpr)).as("token"))
      .groupBy("source", "token").agg(count(lit(1)).as("n"))
      .collect().map(r => ((r.getString(0), r.getString(1)), r.getLong(2)))
      .toMap
    assert(got.nonEmpty && got == batchCounts)
    // the maintained matrix feeds the IDENTICAL TV arithmetic
    val streamedTv = TextOps.tokenDriftOfCounts(streamedCounts).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    val batchTv = TextOps.tokenDriftOf(batchDocs).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .toSeq
    assert(streamedTv == batchTv)
    graft.ops.CachedStages.release(spark)
  }
  test("q148 twin: streamed dim moments equal batch; derivation equals q148") {
    val d = Files.createTempDirectory("emb_dimstats")
    Files.copy(Paths.get("/root/testdata/sf0.001/embeddings.parquet"),
      d.resolve("embeddings.parquet"))
    val stream = EmbeddingStreams.readEmbeddingStream(spark, d.toString)
    EventStreams.runToMemory(EmbeddingStreams.dimMomentStream(stream),
      "dim_moments", OutputMode.Complete())
    val streamedMoments = spark.table("dim_moments").localCheckpoint()
    val batchVecs = Tables(spark, "/root/testdata/sf0.001", "embeddings")
      .select(col("vec_id"), col("embedding"))
    def key(r: org.apache.spark.sql.Row) =
      (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getDecimal(6)))
    val got = streamedMoments.collect().map(key).toMap
    val batch = graft.ops.Features.dimMomentsOf(batchVecs).collect()
      .map(key).toMap
    assert(got.nonEmpty && got == batch)
    // state bound: one row per dimension
    assert(got.size == 64)
    // the read-time derivation over the MAINTAINED cells equals q148
    val derived = graft.ops.Features.dimStatsFromMoments(streamedMoments)
      .collect().map(r => (r.getLong(0), r.getLong(5), r.getLong(6))).toSet
    val q148 = graft.ops.Features.dimStats(spark, "/root/testdata/sf0.001")
      .collect().map(r => (r.getLong(0), r.getLong(5), r.getLong(6))).toSet
    assert(derived == q148)
    graft.ops.CachedStages.release(spark)
  }
}
