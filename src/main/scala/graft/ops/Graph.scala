package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Iterative graph analytics over relationship tables. Companion to the
  * connected-components loop in [[Dedup.connectedComponents]] (q40) —
  * that one answers "which rows are the same entity"; PageRank answers
  * "which entities matter", the weighting Common-Crawl-style curation
  * applies to URLs/domains before sampling (the reference has no graph
  * surface at all — its only relationship is the tracks⟕features merge,
  * `scripts/transform.py:156`).
  */
object Graph {

  /** Fixed-point scale: ranks live as bigint units of 1e-12. All
    * arithmetic below is integer (floor division via `div`, damping
    * 0.85 as the exact ratio 17/20), so every engine that runs the same
    * iteration count produces BIT-IDENTICAL ranks — the hash-stability
    * trick the FP formulation cannot offer (per-node sums would depend
    * on Spark's reduction order). Max intermediate: 17 × total mass
    * (1e12) ≈ 1.7e13, far inside int64.
    */
  val RankScale: Long = 1000000000000L

  /** Graded q69: PageRank over the part co-purchase graph — parts are
    * linked when some order contains both (the classic item-item graph;
    * rank = centrality in the catalog). Damping 0.85, fixed iteration
    * count, teleport mass `0.15/N`.
    *
    * Scale shape: the edge list is built once — distinct
    * `(order, part)` pairs self-joined on the order key (fan-out is
    * bounded by order size, so no skew blow-up) — and persisted
    * PRE-JOINED with each source's out-degree, partitioned by `src`.
    * Each iteration then joins the current rank vector (|nodes| rows —
    * BROADCAST) to the stationary edge table: the 100-TB-shaped edge
    * set never re-shuffles, and the only per-iteration exchange is the
    * map-side-combined partial sum by `dst` (≤ |nodes| rows per
    * partition). Ranks are `localCheckpoint`ed per round to keep the
    * plan flat (same discipline as q40's components loop). For graphs
    * whose rank vector outgrows a broadcast, the same loop holds with
    * the broadcast hint dropped — AQE picks the shuffle join and the
    * edge table's `src` partitioning is reused.
    *
    * The co-purchase graph is symmetric, so every node has out-degree
    * ≥ 1 and the mass a node emits always lands on ranked nodes —
    * never-ordered parts are not graph nodes (documented, not a bug:
    * rank is defined over entities with at least one relationship).
    */
  def copurchasePagerank(spark: SparkSession, dir: String,
      iters: Int = 5): DataFrame = {
    val li = Tables(spark, dir, "lineitem")
      .select(col("l_orderkey").as("k"), col("l_partkey").as("p"))
      .distinct()
    val edges = li.join(li.withColumnRenamed("p", "p2"), Seq("k"))
      .filter(col("p") =!= col("p2"))
      .select(col("p").as("src"), col("p2").as("dst"))
      .distinct()
    pagerank(edges, iters)
      .select(col("id").as("part_id"), col("rank_fp"))
      .orderBy(col("rank_fp").desc, col("part_id").asc)
  }

  /** Core PageRank over any directed `(src, dst)` edge list in which
    * every node has out-degree ≥ 1 (callers with dangling nodes add
    * self-loops or drop them first). Returns `(id, rank_fp)` with
    * `rank_fp` in [[RankScale]] fixed-point units.
    */
  def pagerank(edges: DataFrame, iters: Int): DataFrame = {
    require(iters >= 1, s"need at least one iteration, got $iters")
    val spark = edges.sparkSession
    // stationary per-iteration input: edges carrying their source's
    // out-degree, built once, partitioned by src for the rank join
    val deg = edges.groupBy("src").agg(count(lit(1)).as("deg"))
    val edgesDeg = CachedStages.track(
      edges.join(deg, "src").repartition(col("src")).persist())
    // node set and |N| both read the persisted stage — the expensive
    // distinct self-join upstream runs exactly once
    val nodes = edgesDeg.select(col("src")).distinct().localCheckpoint()
    val n = nodes.count()
    require(n > 0, "empty edge list")
    val teleport = 3L * RankScale / (20L * n)

    var ranks = nodes.select(col("src").as("id"),
      lit(RankScale / n).as("rank_fp")).localCheckpoint()
    for (_ <- 1 to iters) {
      ranks = edgesDeg
        .join(broadcast(ranks), col("src") === col("id"))
        .select(col("dst"),
          expr("rank_fp div deg").as("contrib"))
        .groupBy(col("dst"))
        .agg(sum(col("contrib")).as("mass"))
        .select(col("dst").as("id"),
          (lit(teleport) + expr("17 * mass div 20")).as("rank_fp"))
        .localCheckpoint()
    }
    ranks
  }
}
