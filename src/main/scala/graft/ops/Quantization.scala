package graft.ops

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Int8 scalar quantization of the embedding column + exact-integer
  * quantized KNN — the memory/bandwidth lever every vector store pulls
  * before ANN indexing (FAISS `SQ8`, Lucene/Elasticsearch
  * `int8_hnsw`): 4 bytes/dim float32 → 1 byte/dim, which at 100 TB of
  * embeddings is the difference between spilling and staying resident.
  *
  * Quantizer (normalize-then-fixed-scale, the FAISS/Lucene int8 path):
  * the vector is first L2-normalized — `u_i = x_i / ||x||` — and the
  * unit vector quantized with the FIXED scale 127: `q_i = floor(u_i *
  * 127 + 0.5)`; an all-zero vector quantizes to zeros. The scale must
  * be per-DATASET, not per-vector: a per-vector scale divides each dot
  * product by a different constant and silently changes the ranking
  * metric, whereas on unit vectors `qdot ≈ cosine * 127²` — integer
  * ranking approximates cosine ranking, and the approximation error is
  * quantization error alone. `floor(u*127 + 0.5)` is used instead of
  * half-up `round` deliberately: IEEE-754 `floor(double)` is
  * bit-identical across engines, while `round` routes through decimal
  * string conversion in Spark and C rounding in DuckDB — the
  * quantizer's exact tie behavior matters less than it being THE SAME
  * everywhere the data is read.
  *
  * Similarity on quantized vectors is a plain integer dot product —
  * exact 64-bit arithmetic, no float summation order to reconcile — so
  * the graded top-k is hash-stable by construction (ties broken by
  * vec_id). Ranking parity with full-precision cosine is a RECALL
  * property, measured in the spec, not assumed.
  *
  * Scale shape: quantization is one codegen'd projection (no shuffle,
  * no UDF); the q61 probe is brute-force over the quantized corpus —
  * the `q21` shape at a quarter of the memory traffic — and composes
  * with the IVF/LSH candidate generation of q28/q29 unchanged (quantize
  * the residuals inside each bucket).
  */
object Quantization {

  /** vec_id, norm (double), qvec (array<int>) for every embedding. */
  def quantizedVectors(spark: SparkSession, dir: String): DataFrame =
    quantizedOf(Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")))

  /** Quantize any (vec_id, embedding) frame; preserves other columns.
    * The norm is a left-to-right fold in array order — the same order
    * the oracle's `list_sum` evaluates, so both engines see the same
    * double before the floor.
    */
  def quantizedOf(vecs: DataFrame): DataFrame =
    vecs
      .withColumn("norm", expr(
        """sqrt(aggregate(
          |  transform(embedding, x -> cast(x as double) * cast(x as double)),
          |  cast(0 as double), (acc, s) -> acc + s))""".stripMargin))
      .withColumn("qvec", expr(
        """CASE WHEN norm = 0D THEN transform(embedding, x -> 0)
          |ELSE transform(embedding,
          |  x -> cast(floor(cast(x as double) / norm * 127.0D + 0.5D) as int))
          |END""".stripMargin))
      .drop("embedding")

  /** Exact integer dot product of two int arrays as bigint. */
  private def qdotExpr(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> cast(x as bigint) * cast(y as bigint)),
       |  cast(0 as bigint), (acc, p) -> acc + p)""".stripMargin

  /** Graded q66: the SCALE PATH for quantized search — IVF + int8, the
    * FAISS `IVF,SQ8` composition. The k-means index is trained by
    * `Clustering.kmeansModel` (broadcast-assign Lloyd rounds), the
    * probe picks its nearest centroid in full precision (index probes
    * stay float — only the stored corpus is quantized), and the search
    * runs exact integer dot products over the ONE probed cluster
    * instead of the whole corpus. Quantization here reads the model's
    * double vectors; floats widen to double losslessly, so the codes
    * are bit-identical to [[quantizedOf]]'s and the oracle's.
    */
  def ivfQuantizedKnn(spark: SparkSession, dir: String, k: Int = 4,
      iters: Int = 3, kNeighbors: Int = 3): DataFrame = {
    val (cents, assigned) = Clustering.kmeansModel(spark, dir, k, iters)
    val quant = assigned.select(col("vec_id"), col("v"), col("cluster"))
      .withColumn("nrm", expr(
        // square AFTER widening to double — identical to quantizedOf and
        // the oracle's embedding::DOUBLE[]; a float-precision square
        // could shift the norm's low bits and flip a code that sits
        // within rounding distance of a floor boundary
        """sqrt(aggregate(
          |  transform(v, x -> cast(x as double) * cast(x as double)),
          |  cast(0 as double), (acc, s) -> acc + s))""".stripMargin))
      .withColumn("qvec", expr(
        """CASE WHEN nrm = 0D THEN transform(v, x -> 0)
          |ELSE transform(v,
          |  x -> cast(floor(cast(x as double) / nrm * 127.0D + 0.5D) as int))
          |END""".stripMargin))
    val probe = quant.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("v").as("q_vec"),
        col("qvec").as("q_qvec"))
      .crossJoin(broadcast(cents))
      .withColumn("dist", expr(Clustering.distExpr("q_vec")))
      .withColumn("rn", row_number().over(Window.partitionBy("q_id")
        .orderBy(col("dist").asc, col("cluster").asc)))
      .filter(col("rn") === 1)
      .select(col("q_id"), col("q_qvec"), col("cluster").as("probe_cluster"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("qdot").desc, col("vec_id").asc)
    quant.select(col("vec_id"), col("qvec"), col("cluster"))
      .join(broadcast(probe), col("cluster") === col("probe_cluster"))
      .filter(col("q_id") =!= col("vec_id"))
      .withColumn("qdot", expr(qdotExpr("q_qvec", "qvec")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= kNeighbors)
      .select("q_id", "probe_cluster", "rn", "vec_id", "qdot")
      .orderBy("q_id", "rn")
  }

  /** Graded q61: top-3 neighbors per probe (vec_id < 8, the q21 probe
    * set) under the quantized integer dot product, self excluded.
    */
  def quantizedTopK(spark: SparkSession, dir: String, k: Int = 3): DataFrame =
    quantizedTopKOf(Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")), k)

  /** Core of `quantizedTopK` over any `(vec_id, embedding)` frame —
    * split out so OpsPropSpec can compare it against a driver-side
    * brute force on random vector sets.
    */
  def quantizedTopKOf(vecs: DataFrame, k: Int): DataFrame = {
    val quant = quantizedOf(vecs)
    val probes = quant.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("qvec").as("q_qvec"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("qdot").desc, col("vec_id").asc)
    quant.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("qdot", expr(qdotExpr("q_qvec", "qvec")))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "rn", "vec_id", "qdot")
      .orderBy("q_id", "rn")
  }

  /** 1-BIT binary codes: each dimension's SIGN, packed into two 32-bit
    * halves (`lo` = dims 1–32, `hi` = dims 33–64) carried as longs —
    * two halves rather than one 64-bit word so no engine ever shifts
    * into the sign bit. 64 dims × 4 bytes → 8 bytes/vector: the extreme
    * end of the quantization ladder (float32 → q61's int8 → this), and
    * the similarity becomes POPCOUNT-of-XOR, the cheapest distance a
    * vector database knows.
    */
  def binaryCodesOf(vecs: DataFrame): DataFrame = {
    def half(lowDim: Int): String =
      s"""aggregate(sequence($lowDim, ${lowDim + 31}), cast(0 as bigint),
         |  (acc, i) -> acc + IF(element_at(embedding, i) > 0,
         |    shiftleft(cast(1 as bigint), i - $lowDim), cast(0 as bigint)))"""
        .stripMargin
    vecs.select(col("vec_id"),
      expr(half(1)).as("lo"), expr(half(33)).as("hi"))
  }

  /** Graded q91: Hamming-distance KNN over the binary codes (the q21
    * probe set, top-k by popcount(xor), vec_id ties). Ranking parity
    * with cosine is again a measured recall property — what the 1-bit
    * code buys is that the WHOLE corpus index is 16 bytes/row
    * (id + code), so at 100 TB of source embeddings the search
    * structure still fits a broadcast-or-bucket layout; candidates it
    * surfaces get re-ranked by q61/q21's finer metrics.
    */
  def binaryHammingTopK(spark: SparkSession, dir: String,
      k: Int = 3): DataFrame = {
    val codes = binaryCodesOf(Tables(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding")))
    val probes = codes.filter(col("vec_id") < 8)
      .select(col("vec_id").as("q_id"), col("lo").as("q_lo"),
        col("hi").as("q_hi"))
    val w = Window.partitionBy("q_id")
      .orderBy(col("hamming").asc, col("vec_id").asc)
    codes.crossJoin(broadcast(probes))
      .filter(col("vec_id") =!= col("q_id"))
      .withColumn("hamming",
        (bit_count(col("lo").bitwiseXOR(col("q_lo"))) +
          bit_count(col("hi").bitwiseXOR(col("q_hi")))).cast("long"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= k)
      .select("q_id", "rn", "vec_id", "hamming")
      .orderBy("q_id", "rn")
  }
}
