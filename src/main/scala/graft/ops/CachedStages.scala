package graft.ops

import org.apache.spark.sql.DataFrame

/** Registry of the small intermediate stages operators `persist()` (LSH
  * bucketed stages, dedup content/signature tables, k-means vectors).
  *
  * A lazily returned DataFrame gives the operator no safe point to
  * unpersist its own stage — the caller has not run an action yet — and
  * Spark's CacheManager keeps SQL-cached plans registered until they are
  * explicitly unpersisted (the ContextCleaner never releases them just
  * because the DataFrame became unreachable). Bench/Verify clear the
  * whole session cache between queries; a LIBRARY caller composing
  * several operators in one long-lived session instead calls
  * [[releaseAll]] after consuming each result, so cached stages do not
  * accumulate for the session's lifetime.
  *
  * Stages are held weakly: a stage whose DataFrame was already collected
  * by the GC simply drops out of the registry (its cache entry, if any,
  * is then only clearable via `spark.catalog.clearCache()` — one more
  * reason callers should release promptly).
  */
object CachedStages {

  private val stages =
    new java.util.concurrent.ConcurrentLinkedQueue[
      java.lang.ref.WeakReference[DataFrame]]()

  /** Record a just-persisted stage; returns it unchanged. */
  private[ops] def track(df: DataFrame): DataFrame = {
    stages.add(new java.lang.ref.WeakReference(df))
    df
  }

  /** Unpersist every stage tracked since the last release. Safe to call
    * at any time: results already materialized are unaffected, and a
    * subsequent operator call re-persists its own stages.
    */
  def releaseAll(blocking: Boolean = false): Unit = {
    var ref = stages.poll()
    while (ref != null) {
      val df = ref.get()
      if (df != null) {
        try df.unpersist(blocking)
        catch { case _: IllegalStateException => () } // session already stopped
      }
      ref = stages.poll()
    }
  }
}
