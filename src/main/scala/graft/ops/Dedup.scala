package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication operators: exact (content-hash groupBy), MinHash+LSH
  * near-dup (shingle → minhash → band → bucket self-join → Jaccard
  * verify), SimHash fingerprints, and n-gram Jaccard verification.
  *
  * The synthetic `documents` corpus contains no natural duplicates
  * (500/500 distinct texts), so the dedup queries plant deterministic
  * duplicates in-query — every 100th document is re-added under
  * `doc_id + 1_000_000`, either verbatim (exact dedup) or with a 3-token
  * suffix (near-dup). The oracle SQL plants the identical rows, so both
  * engines see the same corpus.
  *
  * Scale notes: exact dedup is one hash-shuffle on md5(text) — the
  * canonical 100 TB dedup shape. The LSH path never compares all pairs:
  * candidates come from equi-joining on (band, minhash) buckets, so the
  * join fan-out is bounded by bucket collision counts, and only
  * candidates pay the exact-Jaccard verification.
  */
object Dedup {

  /** 3-word shingles (distinct) of the tokenized text. `toks` must exist. */
  val shinglesExpr: String =
    """CASE WHEN size(toks) >= 3 THEN
      |  array_distinct(transform(sequence(1, size(toks) - 2),
      |    i -> concat_ws(' ', element_at(toks, i), element_at(toks, i + 1),
      |                   element_at(toks, i + 2))))
      |ELSE array() END""".stripMargin

  /** Seeded MinHash over the shingle set: min over shingles of
    * md5(seed || shingle), as a hex string (lexicographic min — identical
    * in any engine).
    */
  def minhashExpr(seed: Int): String =
    s"array_min(transform(shingles, s -> md5(concat('seed$seed', s))))"

  /** documents corpus with every 100th doc re-added verbatim under
    * doc_id + 1,000,000 (planted exact duplicates).
    */
  def corpusWithExactDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"), col("text")))
  }

  /** documents corpus with every 100th doc re-added with a 3-token suffix
    * (planted near-duplicates: Jaccard just under 1).
    */
  def corpusWithNearDups(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables(spark, dir, "documents").select("doc_id", "text")
    docs.unionByName(
      docs.filter(col("doc_id") % 100 === 0)
        .select((col("doc_id") + 1000000L).as("doc_id"),
          concat(col("text"), lit(" qq ww ee")).as("text")))
  }

  /** Exact dedup: group by md5(text), emit groups with >1 copy as
    * (canonical_id, n_copies, content_hash).
    */
  def exactDuplicates(spark: SparkSession, dir: String): DataFrame =
    corpusWithExactDups(spark, dir)
      .groupBy(md5(col("text")).as("content_hash"))
      .agg(min(col("doc_id")).as("canonical_id"), count(lit(1)).as("n_copies"))
      .filter(col("n_copies") > 1)
      .select("canonical_id", "n_copies", "content_hash")
      .orderBy("canonical_id")

  /** Per-document 4-seed MinHash signature (on the unmodified corpus). */
  def minhashSignatures(spark: SparkSession, dir: String): DataFrame =
    Tables(spark, dir, "documents")
      .withColumn("toks", expr(TextOps.tokensExpr))
      .withColumn("shingles", expr(shinglesExpr))
      .select(col("doc_id") +: (0 until 4).map(k =>
        expr(minhashExpr(k)).as(s"mh$k")): _*)
      .orderBy("doc_id")

  /** Full LSH near-dup pipeline on the planted-near-dup corpus:
    * shingle → 4 minhashes → 4 bands of 1 → bucket self-join → distinct
    * candidate pairs → exact Jaccard on shingle sets → keep >= 0.5.
    */
  def nearDupPairs(spark: SparkSession, dir: String): DataFrame = {
    // Signatures feed three joins; at 100 TB they would be materialized
    // to a table between stages. An in-query .persist() measured a <3%
    // win here while pinning storage memory for the session (a returned
    // lazy DataFrame has no unpersist point), so recompute is the better
    // trade at this operator's scale.
    val sigs = corpusWithNearDups(spark, dir)
      .withColumn("toks", expr(TextOps.tokensExpr))
      .withColumn("shingles", expr(shinglesExpr))
      .select(col("doc_id") +: col("shingles") +: (0 until 4).map(k =>
        expr(minhashExpr(k)).as(s"mh$k")): _*)

    // (doc_id, band, h): one row per band; bucket key is (band, h).
    val bands = sigs.select(col("doc_id"), posexplode(
      array((0 until 4).map(k => col(s"mh$k")): _*)).as(Seq("band", "h")))

    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.h") === col("b.h") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("doc_a"), col("b.doc_id").as("doc_b"))
      .distinct()

    val sa = sigs.select(col("doc_id").as("doc_a"), col("shingles").as("sh_a"))
    val sb = sigs.select(col("doc_id").as("doc_b"), col("shingles").as("sh_b"))
    cand.join(sa, "doc_a").join(sb, "doc_b")
      .withColumn("n_common",
        size(array_intersect(col("sh_a"), col("sh_b"))))
      .withColumn("jaccard", col("n_common").cast("double") /
        (size(col("sh_a")) + size(col("sh_b")) - col("n_common")))
      .filter(col("jaccard") >= 0.5)
      .select("doc_a", "doc_b", "jaccard")
      .orderBy("doc_a", "doc_b")
  }

  /** Attach a 16-bit SimHash fingerprint column: for each bit b, majority
    * vote over distinct tokens of bit b of md5(token) (the low bit of the
    * b-th hex digit). Pure higher-order expressions — no explode, no
    * shuffle; each document is fingerprinted in place.
    */
  def withSimhash(corpus: DataFrame): DataFrame = {
    val hexOdd = "('1','3','5','7','9','b','d','f')"
    corpus
      .withColumn("toks", expr(s"array_distinct(${TextOps.tokensExpr})"))
      .withColumn("simhash", expr(
        s"""CAST(aggregate(
           |  transform(sequence(0, 15), b ->
           |    IF(aggregate(toks, 0, (a2, t) ->
           |         a2 + IF(substring(md5(t), b + 1, 1) IN $hexOdd, 1, -1))
           |       >= 0, shiftleft(1, b), 0)),
           |  0, (acc, x) -> acc + x) AS BIGINT)""".stripMargin))
      .drop("toks")
  }

  /** SimHash fingerprints of the unmodified corpus (graded q20). */
  def simhashFingerprints(spark: SparkSession, dir: String): DataFrame =
    withSimhash(Tables(spark, dir, "documents"))
      .select("doc_id", "simhash")
      .orderBy("doc_id")

  /** SimHash near-dup pairs on the planted-near-dup corpus: candidates
    * from nibble banding (hamming <= 3 on 16 bits ⇒ pigeonhole: at least
    * one of the four 4-bit nibbles is equal), verified with
    * bit_count(xor). Same band-then-verify shape as MinHash LSH, but on
    * the compact 16-bit fingerprint — the cheapest of the near-dup
    * family at scale (8 bytes of state per document).
    */
  def simhashNearDups(spark: SparkSession, dir: String): DataFrame = {
    // Band and verify at the DISTINCT-VALUE level, not the document
    // level: many documents share a fingerprint (16-bit space, ~2× here,
    // far more at scale), so candidate generation and the hamming check
    // run once per value pair; doc pairs are expanded only for surviving
    // value pairs. This is the general dedupe-before-join pattern for
    // banded similarity at 100 TB.
    // persist: the value table feeds banding + two expansion joins and is
    // small (one row per distinct fingerprint). The cached blocks are
    // released by Spark's ContextCleaner once the query's plan is
    // unreachable; a caller-visible unpersist point doesn't exist for a
    // lazily returned DataFrame.
    val vals = withSimhash(corpusWithNearDups(spark, dir))
      .groupBy("simhash")
      .agg(expr("sort_array(collect_list(doc_id))").as("docs"))
      .persist()
    val bands = vals.select(col("simhash"), posexplode(
      expr("transform(sequence(0, 3), b -> (simhash div shiftleft(1, b * 4)) % 16)"))
      .as(Seq("band", "nibble")))
    val vcand = bands.as("a")
      .join(bands.as("b"),
        col("a.band") === col("b.band") && col("a.nibble") === col("b.nibble") &&
          col("a.simhash") <= col("b.simhash"))
      .select(col("a.simhash").as("sh_a"), col("b.simhash").as("sh_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sh_a").bitwiseXOR(col("sh_b"))).cast("long"))
      .filter(col("hamming") <= 3)
    vcand
      .join(vals.select(col("simhash").as("sh_a"), col("docs").as("docs_a")), "sh_a")
      .join(vals.select(col("simhash").as("sh_b"), col("docs").as("docs_b")), "sh_b")
      .select(col("hamming"), col("sh_a"), col("sh_b"),
        explode(col("docs_a")).as("da"), col("docs_b"))
      .select(col("hamming"), col("sh_a"), col("sh_b"), col("da"),
        explode(col("docs_b")).as("db"))
      // within one value (sh_a == sh_b) keep each unordered pair once
      .filter(col("sh_a") =!= col("sh_b") || col("da") < col("db"))
      .select(least(col("da"), col("db")).as("doc_a"),
        greatest(col("da"), col("db")).as("doc_b"), col("hamming"))
      .orderBy("doc_a", "doc_b")
  }
}
