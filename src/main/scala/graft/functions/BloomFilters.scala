package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.BloomFilterMightContain
import org.apache.spark.sql.catalyst.expressions.aggregate.BloomFilterAggregate

/** SQL access to Spark's NATIVE Bloom-filter expressions —
  * `BloomFilterAggregate` / `BloomFilterMightContain`
  * (org.apache.spark.sql.catalyst.expressions), the same pair Catalyst
  * injects for runtime row-level join pruning. Spark ships them
  * unregistered (they are internal to `InjectRuntimeFilter`), so this
  * exposes them under session-local names:
  *
  *  - `bloom_filter_agg(xxhash64(col), est_items, num_bits)` → BINARY
  *  - `bloom_might_contain(bloom, xxhash64(col))` → BOOLEAN
  *
  * Both sides must hash with `xxhash64` — the aggregate's put and the
  * probe's lookup key are raw 64-bit hashes. A Bloom filter has NO
  * false negatives by construction, so `bloom_might_contain` is a safe
  * PREFILTER: every true member passes, and false positives are
  * eliminated by whatever exact join follows (see
  * `Dedup.contaminationOfBloom`).
  *
  * Registration is skip-if-present, mirroring `WordShingles.register`.
  */
object BloomFilters {
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(new FunctionIdentifier("bloom_filter_agg")))
      registry.createOrReplaceTempFunction("bloom_filter_agg",
        exprs => new BloomFilterAggregate(exprs(0), exprs(1), exprs(2)),
        "built-in")
    if (!registry.functionExists(
        new FunctionIdentifier("bloom_might_contain")))
      registry.createOrReplaceTempFunction("bloom_might_contain",
        exprs => BloomFilterMightContain(exprs(0), exprs(1)), "built-in")
  }
}
