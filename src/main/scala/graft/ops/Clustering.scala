package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** K-means clustering (Lloyd's algorithm) over the embeddings table —
  * the TRAINING step the IVF family needs: q22/q28 probe centroids that
  * came with the data (`label`), this learns them from the vectors
  * alone. Deterministic end to end, so the DuckDB oracle replays the
  * identical iterations and the assignments hash-match bit-for-bit:
  *
  *  - seeding: the first k vectors (vec_id < k) are the initial
  *    centroids — no RNG;
  *  - fixed iteration count (no convergence test): both engines run
  *    exactly `iters` assign/update rounds;
  *  - assignment: squared-L2 computed as a SEQUENTIAL index-order fold
  *    (bit-identical doubles on both engines), ties broken by cluster
  *    id via ROW_NUMBER;
  *  - update (exact mode): per-(cluster, dim) mean via the sorted
  *    sequential fold of q23 — both engines add the same doubles in the
  *    same order.
  *
  * Scale shape: each assignment is one broadcast of k centroid rows
  * against a streaming corpus scan (no shuffle), and each update is one
  * partial-aggregable groupBy of k*64 groups. The driver loop runs
  * O(iters) tiny jobs and localCheckpoints each round's centroids —
  * iterative lineage otherwise nests every prior round into the plan
  * (see Dedup.connectedComponents). exact=true carries per-group sorted
  * value lists and exists for oracle bit-parity; production runs use
  * exact=false, whose `avg` keeps O(1) state per (cluster, dim) —
  * ScaleSpec asserts the plan shape and the numeric agreement.
  */
object Clustering {

  /** Sequential squared-L2 between `v` (float array) and `c` (double
    * array) — index-order fold, never a reassociated sum.
    */
  private val distExpr: String =
    """aggregate(sequence(1, 64), CAST(0 AS DOUBLE),
      |  (acc, i) -> acc + (CAST(element_at(v, i) AS DOUBLE) - element_at(c, i))
      |                  * (CAST(element_at(v, i) AS DOUBLE) - element_at(c, i)))"""
      .stripMargin

  def kmeans(spark: SparkSession, dir: String, k: Int = 4, iters: Int = 3,
      exact: Boolean = true): DataFrame = {
    require(k >= 1 && iters >= 1, s"need k >= 1 and iters >= 1, got k=$k iters=$iters")
    val vecs = Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").as("v"))
      .persist()
    var cents = vecs.filter(col("vec_id") < k)
      .select(col("vec_id").as("cluster"),
        expr("transform(v, x -> CAST(x AS DOUBLE))").as("c"))
      .localCheckpoint()
    val w = Window.partitionBy("vec_id")
      .orderBy(col("dist").asc, col("cluster").asc)
    def assign(): DataFrame = vecs.crossJoin(broadcast(cents))
      .withColumn("dist", expr(distExpr))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select("vec_id", "v", "cluster", "dist")
      .localCheckpoint()
    var assigned = assign()
    for (_ <- 1 until iters) {
      cents = updateCentroids(assigned, exact).localCheckpoint()
      assigned = assign()
    }
    assigned
      .select(col("vec_id"), col("cluster"), round(col("dist"), 6).as("dist"))
      .orderBy("vec_id")
  }

  /** One Lloyd update: per-(cluster, dim) mean of the assigned vectors,
    * re-assembled into centroid arrays. Split out (and not yet
    * checkpointed) so ScaleSpec can assert the exact/scale plan shapes
    * directly — inside `kmeans` the eager localCheckpoint truncates the
    * executed plan, which would make any plan-string assertion on the
    * returned DataFrame vacuous.
    */
  private[ops] def updateCentroids(assigned: DataFrame,
      exact: Boolean): DataFrame = {
    val perDim = assigned
      .select(col("cluster"), posexplode(col("v")).as(Seq("dim", "val")))
      .withColumn("val", col("val").cast("double"))
    val agged =
      if (exact)
        perDim.groupBy("cluster", "dim")
          .agg(sort_array(collect_list(col("val"))).as("vals"),
            count(lit(1)).as("n"))
          .withColumn("cd", expr(
            "aggregate(slice(vals, 2, size(vals)), vals[0], (a, x) -> a + x)") /
            col("n"))
      else
        perDim.groupBy("cluster", "dim").agg(avg(col("val")).as("cd"))
    // the 64-struct re-assembly is O(64) state per cluster at any scale
    agged.groupBy("cluster")
      .agg(expr(
        "transform(array_sort(collect_list(struct(dim, cd))), s -> s.cd)")
        .as("c"))
  }
}
