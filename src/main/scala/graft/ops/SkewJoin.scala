package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys.
  *
  * When one join key dominates (a viral document, a null-ish default id),
  * a plain shuffle sends that key's every row to one reducer and the
  * stage runs at the speed of that single task. Salting splits the hot
  * key across `saltBuckets` reducers: the fact side gets a deterministic
  * salt in [0, n), the dim side is replicated n times, and the join key
  * becomes (key, salt). Results are identical to the unsalted join; the
  * shuffle is n-way wider on the hot key.
  *
  * AQE's skew-join handling covers sort-merge joins automatically; this
  * utility is for the cases AQE can't re-plan (aggregations keyed on the
  * hot key upstream, or deliberate pre-partitioning), and to make the
  * technique first-class and testable.
  */
object SkewJoin {

  /** Inner-join `fact ⨝ dim` on `key`, salted `saltBuckets` ways.
    *
    * @param saltSource deterministic per-row expression to derive the
    *                   salt from (e.g. a fine-grained id column); using a
    *                   column rather than rand() keeps runs reproducible
    */
  def salted(fact: DataFrame, dim: DataFrame, key: String,
      saltBuckets: Int, saltSource: Column): DataFrame = {
    val saltedFact = fact.withColumn("__salt",
      pmod(hash(saltSource), lit(saltBuckets)))
    val saltedDim = dim.withColumn("__salt",
      explode(array((0 until saltBuckets).map(lit): _*)))
    saltedFact.join(saltedDim, Seq(key, "__salt")).drop("__salt")
  }
}
