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

  /** Exact dedup in flight — the streaming twin of q17's content-hash
    * dedup: the FIRST arrival of each distinct text passes; every later
    * copy (same batch or any later batch) is dropped against the state
    * store keyed by md5(text). State is one 32-byte hash per distinct
    * content seen — unbounded over an infinite stream, which is exactly
    * the q17 semantics ("a duplicate is a duplicate forever"); use
    * `dedupedDocsWithinWatermark` when the dedup horizon is bounded.
    */
  def dedupedDocs(stream: DataFrame): DataFrame =
    stream.select(col("doc_id"), col("text"))
      .withColumn("content_hash", md5(col("text")))
      .dropDuplicates("content_hash")

  /** State-BOUNDED streaming dedup: duplicates are only suppressed
    * within `horizon` of event time, and the state store evicts hashes
    * older than the watermark — the shape an always-on ingestion
    * pipeline actually runs (state cannot grow with all history; a
    * re-crawl months later is allowed to re-admit a document, and the
    * batch dedup pass downstream owns cross-horizon exactness).
    * `stream` must carry an `arrival_ts` timestamp column.
    */
  def dedupedDocsWithinWatermark(stream: DataFrame,
      horizon: String = "10 minutes"): DataFrame =
    stream.select(col("doc_id"), col("text"), col("arrival_ts"))
      .withColumn("content_hash", md5(col("text")))
      .withWatermark("arrival_ts", horizon)
      .dropDuplicatesWithinWatermark("content_hash")

  /** DSIR importance scoring in flight — the streaming twin of q60.
    * The target-leaning bucket set is a FROZEN MODEL ARTIFACT fitted by
    * the batch pass (`Importance.leanBucketSet`, ≤ NumBuckets longs —
    * the hashed-n-gram analogue of shipping classifier weights to a
    * scorer); with the model inlined as a literal, the per-document
    * verdict needs no shuffle, no state, and no stream-side
    * aggregation: hash the document's bigrams, count membership, vote.
    * Exactly what an ingestion edge runs: score-and-route documents as
    * they land against last night's fitted distribution.
    */
  def importanceScoredDocs(stream: DataFrame,
      leanBuckets: Seq[Long]): DataFrame = {
    graft.functions.WordShingles.register(stream.sparkSession)
    val leanLit = typedlit(leanBuckets.sorted)
    stream
      .withColumn("buckets", expr(
        s"""transform(word_ngrams(text, 2),
           |  g -> ${graft.ops.Importance.bucketOf("g")})""".stripMargin))
      .withColumn("n_grams", size(col("buckets")).cast("long"))
      .filter(col("n_grams") >= 1)
      .withColumn("n_target_leaning",
        size(filter(col("buckets"), b => array_contains(leanLit, b)))
          .cast("long"))
      .withColumn("dsir_keep", col("n_target_leaning") * 2 > col("n_grams"))
      .select("doc_id", "n_grams", "n_target_leaning", "dsir_keep")
  }

  /** Snapshot classification in flight — the streaming twin of q85's
    * EXACT stage as a STREAM-STATIC join: each arriving document's
    * content hash probes the frozen corpus index (`old`: the curated
    * corpus as of the last batch pass) and is either routed out as
    * `exact_dup` immediately or forwarded as a `candidate` for the batch
    * near-dup pass. This is the ingestion-edge division of labor at
    * 100 TB: the exact gate — which kills the bulk of a re-crawl —
    * costs one md5 and one join probe per arriving row, needs NO stream
    * state (the static side is the state, refreshed per micro-batch
    * from storage), and the expensive LSH machinery only ever sees the
    * survivors.
    */
  def snapshotClassifiedDocs(stream: DataFrame, old: DataFrame): DataFrame = {
    val idx = old
      .filter(col("doc_id").isNotNull)
      .groupBy(md5(col("text")).as("h"))
      .agg(min(col("doc_id")).as("matched_id"))
    stream
      .select(col("doc_id").as("new_id"), md5(col("text")).as("h"))
      .join(idx, Seq("h"), "left")
      .select(col("new_id"),
        when(col("matched_id").isNotNull, "exact_dup")
          .otherwise("candidate").as("verdict"),
        col("matched_id"))
  }

  /** Streaming twin of q109's count-min sketch: the SAME `(j, b)`
    * counter aggregation (`TextOps.cmsCountersOf` — shared code, shared
    * md5 bucket rule) maintained over the arriving token stream. Each
    * micro-batch's tokens land with n=1 and sum into the counters;
    * state is FIXED at d×w rows forever — the whole point of CMS at
    * the ingestion edge, where exact per-token counts would grow with
    * the vocabulary. No watermark needed: the key space IS the sketch
    * geometry, bounded by construction. DocStreamsSpec asserts the
    * streamed counters equal the batch sketch cell for cell.
    */
  def cmsCounterStream(stream: DataFrame, w: Int = 1024,
      d: Int = 4): DataFrame =
    graft.ops.TextOps.cmsCountersOf(
      stream.filter(col("doc_id").isNotNull)
        .select(explode(expr(graft.ops.TextOps.tokensExpr)).as("token"),
          lit(1L).as("n")),
      w, d)

  /** q203's twin state: the (token, doc_id, n) count matrix maintained
    * Complete-mode at the ingestion edge — state bounded by
    * |vocabulary|·|docs-per-token|, monotone counts, no watermark.
    * `TextOps.burstinessOfCounts` derives the graded burstiness table
    * from this state through the IDENTICAL arithmetic the batch
    * operator uses (cf = Σn, df = row count per token).
    */
  def tokenDocCountStream(stream: DataFrame): DataFrame =
    stream.filter(col("doc_id").isNotNull)
      .select(col("doc_id"),
        explode(expr(graft.ops.TextOps.tokensExpr)).as("token"))
      .groupBy("token", "doc_id")
      .agg(count(lit(1)).as("n"))

  /** q123's twin: chunk arriving documents for retrieval ingestion in
    * flight — `TextOps.ragChunkRows` shared VERBATIM (the chunker is a
    * pure per-row generator: no sort, no window, no state), so a
    * document chunks identically whether it arrives by batch backfill
    * or live feed and the retrieval store sees ONE chunking.
    */
  def chunkedDocs(stream: DataFrame, chunkSize: Int = 64,
      overlap: Int = 16): DataFrame =
    graft.ops.TextOps.ragChunkRows(stream, chunkSize, overlap)

  /** Streaming twin of q141's drift monitor: the SAME `(source, token,
    * n)` unigram count matrix (the exact aggregation `TextOps.
    * tokenDriftOf` builds in batch) maintained over the arriving
    * document stream — each micro-batch's tokens sum in, and the sink
    * (or a foreachBatch hook) feeds the counts into `TextOps.
    * tokenDriftOfCounts` for the IDENTICAL integer TV arithmetic.
    * State is bounded by |sources| x |vocabulary| — the same bound the
    * batch op's persisted count table has, and the reason the monitor
    * keeps counts rather than documents. No watermark: unigram counts
    * are a monotone CRDT-style sum, never retracted. DocStreamsSpec
    * asserts the streamed matrix equals the batch one cell for cell
    * and that the TVs computed from it match batch q141 row for row.
    */
  def driftCounterStream(stream: DataFrame): DataFrame =
    stream.filter(col("doc_id").isNotNull)
      .select(col("source"), explode(expr(graft.ops.TextOps.tokensExpr))
        .as("token"))
      .groupBy("source", "token")
      .agg(count(lit(1)).as("n"))
}

/** Streaming formulation of the embedding surface: vectors arriving as
  * files are int8-quantized in flight (the q61 quantizer) — one
  * stateless codegen'd projection, the write-path shape a vector store
  * runs so the ANN index ingests quantized codes directly.
  */
object EmbeddingStreams {

  /** File-source schema of the embeddings parquet layout. */
  val embeddingSchema: StructType = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType)),
    StructField("label", IntegerType)))

  def readEmbeddingStream(spark: SparkSession, dir: String): DataFrame =
    spark.readStream.schema(embeddingSchema).parquet(dir)

  /** Quantize in flight — the streaming twin of q61's quantization
    * stage, sharing `Quantization.quantizedOf` verbatim.
    */
  def quantizedVectors(stream: DataFrame): DataFrame =
    graft.ops.Quantization.quantizedOf(
      stream.select(col("vec_id"), col("embedding")))

  /** Min–max scale in flight under a FROZEN range model — the q76
    * normalization as an ingestion-edge projection. The batch-fitted
    * per-dimension `(min, max)` vector ships as a literal (the DSIR
    * frozen-model pattern), so scaling each arriving vector is
    * stateless: no shuffle, no state store, no stream-side aggregation.
    * Serving and training then share ONE normalization — the
    * train/serve-skew guard feature platforms exist to provide.
    */
  def minmaxScaledVectors(stream: DataFrame,
      mins: Seq[Double], maxs: Seq[Double]): DataFrame = {
    require(mins.length == maxs.length && mins.nonEmpty,
      s"range model mismatch: ${mins.length} mins vs ${maxs.length} maxs")
    val minLit = typedlit(mins)
    val maxLit = typedlit(maxs)
    stream
      .select(col("vec_id"),
        posexplode(col("embedding")).as(Seq("dim", "raw")))
      .select(col("vec_id"), col("dim").cast("long").as("dim"),
        when(element_at(maxLit, col("dim").cast("int") + 1) >
            element_at(minLit, col("dim").cast("int") + 1),
          (col("raw").cast("double") -
            element_at(minLit, col("dim").cast("int") + 1)) /
            (element_at(maxLit, col("dim").cast("int") + 1) -
              element_at(minLit, col("dim").cast("int") + 1)))
          .otherwise(lit(0.0)).as("scaled"))
  }

  /** Fit the frozen range model for `minmaxScaledVectors` from a batch
    * corpus: per-dimension `(min, max)` as driver-side vectors (|dims|
    * doubles — model-sized, not data-sized).
    */
  def fitMinmaxRanges(vecs: org.apache.spark.sql.DataFrame)
      : (Seq[Double], Seq[Double]) = {
    val rows = graft.ops.Features.minmaxRangesOf(vecs).collect()
      .map(r => (r.getAs[Int]("dim"), r.getAs[Double]("min_x"),
        r.getAs[Double]("max_x")))
      .sortBy(_._1)
    (rows.map(_._2).toSeq, rows.map(_._3).toSeq)
  }

  /** Fit the frozen benchmark model for [[screenedVectors]] from the
    * batch corpus: the q103 benchmark derivation (every 100th vector,
    * ×2-rescaled) collected driver-side as the literal the screen
    * ships. The third documented frozen-model fitter (with
    * `Importance.leanBucketSet` and [[fitMinmaxRanges]]): the result is
    * |benchmark| × dims floats — eval-set-sized by NATURE (a benchmark
    * is small or it is not a benchmark), never corpus-sized.
    */
  def fitBenchmark(corpus: DataFrame): Seq[Seq[Float]] =
    corpus.filter(col("vec_id") % 100 === 0)
      .select(expr("transform(v, x -> CAST(x * CAST(2 AS FLOAT) AS FLOAT))"))
      .collect().map(_.getSeq[Float](0).toSeq).toSeq

  /** Screen arriving vectors against the FROZEN benchmark in flight —
    * the streaming twin of q103's embedding decontamination and the
    * gate an ingestion edge applies BEFORE a leaked eval vector ever
    * lands in the training store. The benchmark ships as a literal
    * (the [[minmaxScaledVectors]]/DSIR frozen-model pattern), each
    * arriving vector folds the fused cosine kernel over it inside one
    * `exists(...)` projection, and the emitted row carries the
    * verdict: stateless — no shuffle, no watermark, no state store,
    * and the same 6-decimal rounding as batch, so the in-flight
    * verdict equals the batch report's row for row.
    */
  def screenedVectors(spark: SparkSession, stream: DataFrame,
      bench: Seq[Seq[Float]], tau: Double): DataFrame = {
    require(bench.nonEmpty, "empty benchmark: nothing to screen against")
    graft.functions.CosineSimilarity.register(spark)
    val benchLit = typedlit(bench)
    stream.select(col("vec_id"), col("label"), col("embedding"),
      exists(benchLit, b =>
        round(call_function("cosine_sim", b, col("embedding")), 6)
          >= lit(tau)).as("contaminated"))
  }

  /** Fit the frozen PQ codebooks for [[pqEncodedVectors]] from a batch
    * corpus: `Quantization.pqCodebookModel`'s trained centroids as
    * nested driver-side vectors — m × kSub × subDim doubles
    * (model-sized: 4·4·16 = 256 here), the fourth documented
    * frozen-model fitter. The training path already collects the model
    * (the bounded-collect class); fitting through `pqModel` instead
    * used to pay that PLUS a dead corpus-wide encode pass whose codes
    * this fitter never read.
    */
  def fitPqCodebooks(vecs: DataFrame, m: Int = 4, subDim: Int = 16,
      kSub: Int = 4, iters: Int = 2): Seq[Seq[Seq[Double]]] = {
    val rows =
      graft.ops.Quantization.pqCodebookModel(vecs, m, subDim, kSub, iters)
    (0 until m).map(s => (0L until kSub.toLong).map(cl =>
      rows.find(r => r._1 == s && r._2 == cl)
        .getOrElse(throw new IllegalStateException(
          s"codebook missing centroid (sub=$s, cluster=$cl)"))._3).toSeq).toSeq
  }

  /** PQ-encode arriving vectors under FROZEN codebooks — the streaming
    * twin of q117's encoding stage and the shape a vector-ingestion
    * edge actually runs: codebooks train offline (batch, [[fitPqCodebooks]]),
    * ship as a literal (the frozen-model pattern), and each arriving
    * vector collapses to its m codes in one stateless projection — no
    * shuffle, no state store, m·kSub·subDim flops per row. The
    * distance folds run index-order like batch, and the code is the
    * FIRST minimum (`array_position` of `array_min`), which is exactly
    * the batch (dist asc, cluster asc) tie rule — DocStreamsSpec
    * asserts code-for-code equality with `pqModel`'s assignment.
    */
  /** q148's twin: per-dimension MOMENT maintenance at the vector-
    * ingestion edge — `Features.dimMomentsOf` shared VERBATIM (counts,
    * zero counts, min/max, offset sums: all merge-by-sum-or-extremum,
    * the streaming-aggregate contract), state fixed at |dims| rows
    * forever. The divide-time derivation (`dimStatsFromMoments`) runs
    * at read, so the live dead-dim/variance dashboard and batch q148
    * are the SAME arithmetic over the same maintained cells.
    */
  def dimMomentStream(stream: DataFrame): DataFrame =
    graft.ops.Features.dimMomentsOf(
      stream.select(col("vec_id"), col("embedding")))

  def pqEncodedVectors(stream: DataFrame,
      codebooks: Seq[Seq[Seq[Double]]], subDim: Int): DataFrame = {
    require(codebooks.nonEmpty && codebooks.forall(_.nonEmpty),
      "empty PQ codebook")
    val m = codebooks.length
    val kSub = codebooks.head.length
    require(codebooks.forall(_.length == kSub),
      "ragged codebook: every sub-space needs the same cluster count")
    stream
      .withColumn("cb", typedlit(codebooks))
      .withColumn("dists", expr(
        s"""transform(sequence(0, ${m - 1}), s ->
           |  transform(sequence(0, ${kSub - 1}), cl ->
           |    aggregate(sequence(1, $subDim), CAST(0 AS DOUBLE),
           |      (acc, i) -> acc +
           |        (CAST(element_at(embedding, s * $subDim + i) AS DOUBLE)
           |          - element_at(element_at(element_at(cb, s + 1), cl + 1), i))
           |        * (CAST(element_at(embedding, s * $subDim + i) AS DOUBLE)
           |          - element_at(element_at(element_at(cb, s + 1), cl + 1), i)))))"""
          .stripMargin))
      .select(col("vec_id"), expr(
        "transform(dists, ds -> array_position(ds, array_min(ds)) - 1)")
        .as("codes"))
  }

  /** Streaming drift histogram under the same frozen range model — the
    * live tail of the q82 monitor. Arriving vectors bucket against the
    * batch-fitted `(min, max)` literals (identical FP formula, so a
    * vector lands in the SAME bucket it would batch-side) and aggregate
    * to per-(dim, bucket) counts in Complete mode; the caller compares
    * each emitted snapshot against the frozen reference histogram. The
    * only state is the ≤ dims·B-row count table — the stream itself is
    * never retained.
    */
  def driftHistogram(stream: DataFrame,
      mins: Seq[Double], maxs: Seq[Double], buckets: Int): DataFrame = {
    require(mins.length == maxs.length && mins.nonEmpty,
      s"range model mismatch: ${mins.length} mins vs ${maxs.length} maxs")
    require(buckets >= 2, s"need >= 2 buckets, got $buckets")
    val minLit = typedlit(mins)
    val maxLit = typedlit(maxs)
    val i = col("dim").cast("int") + 1
    stream
      .select(posexplode(col("embedding")).as(Seq("dim", "raw")))
      .select(col("dim").cast("long").as("dim"),
        graft.ops.Features.bucketCol(col("raw").cast("double"),
          element_at(minLit, i), element_at(maxLit, i), buckets)
          .as("bucket"))
      .groupBy("dim", "bucket")
      .agg(count(lit(1)).as("n"))
  }
}
