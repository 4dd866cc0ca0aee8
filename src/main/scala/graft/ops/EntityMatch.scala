package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Fuzzy entity matching: edit-distance self-join without all-pairs.
  *
  * The curation problem: the same entity (author, domain, customer)
  * appears under near-identical strings — one typo, one dropped
  * character — and exact dedup (q17) cannot see it. The naive fix,
  * `levenshtein` over the full cross join, is O(N²) string
  * comparisons: dead at 10⁸ names.
  *
  * Scale shape is the FastSS / deletion-neighborhood algorithm
  * (Bocek et al. 2007, also Karch et al.'s "neighborhood generation"):
  * for edit distance ≤ 1, two strings match only if they share a key in
  * {the string itself} ∪ {the string with one position deleted} —
  * substitutions meet at the same-position deletion, insert/delete
  * meets the shorter string itself, equality meets the identity key.
  * Key generation is a per-row explode (|s|+1 keys), candidates come
  * from ONE equi-join on the key (shuffle-partitioned, AQE-splittable),
  * and the exact `levenshtein` verifier runs only on candidates. The
  * DuckDB oracle is the deliberately-unmirrored BRUTE-FORCE cross join,
  * so a hash-match proves the blocking lossless — the q38 pattern.
  */
object EntityMatch {

  /** Graded q73: all customer-name pairs within edit distance 1.
    * TPC-H-ish names (`Customer#%09d`) make a dense, fully-deterministic
    * near-match graph: every pair of keys whose zero-padded decimal
    * forms differ in exactly one digit.
    */
  def fuzzyNameMatches(spark: SparkSession, dir: String): DataFrame = {
    val c = Tables(spark, dir, "customer")
      .select(col("c_custkey").as("id"), col("c_name").as("name"))
    fuzzyMatchesOf(c)
      .select(col("id_a"), col("id_b"), col("dist"))
      .orderBy("id_a", "id_b")
  }

  /** Core deletion-neighborhood match over any `(id, name)` frame:
    * returns `(id_a, id_b, dist)` with `id_a < id_b` and
    * `levenshtein ≤ 1`.
    */
  def fuzzyMatchesOf(entities: DataFrame): DataFrame = {
    // identity key + every delete-one-position variant
    val keyed = entities.select(col("id"), col("name"),
      explode(expr(
        """array_union(
          |  array(name),
          |  transform(sequence(1, length(name)),
          |    i -> concat(substring(name, 1, i - 1),
          |                substring(name, i + 1, length(name)))))"""
          .stripMargin)).as("k"))
    // dedup candidates as BARE ID PAIRS (a name pair can meet in many
    // buckets — identity + every shared deletion): the distinct
    // shuffles two ints per row instead of dragging both strings
    // through the exchange; names rejoin once per SURVIVING pair
    val a = keyed.select(col("k"), col("id").as("id_a"))
    val b = keyed.select(col("k"), col("id").as("id_b"))
    val cands = a.join(b, "k")
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val namesA = entities.select(col("id").as("id_a"),
      col("name").as("name_a"))
    val namesB = entities.select(col("id").as("id_b"),
      col("name").as("name_b"))
    cands.join(namesA, "id_a").join(namesB, "id_b")
      .withColumn("dist",
        levenshtein(col("name_a"), col("name_b")).cast("long"))
      .filter(col("dist") <= 1)
      .select("id_a", "name_a", "id_b", "name_b", "dist")
  }
}
