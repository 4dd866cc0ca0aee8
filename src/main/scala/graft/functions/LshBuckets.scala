package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, FloatType, IntegerType}

/** All `nTables` sign-random-projection LSH bucket ids of a 64-dim
  * `array<float>` vector, fused into ONE native expression.
  *
  * Semantically IDENTICAL to the composed form `Similarity.lshBucketed`
  * previously inlined per table — `aggregate(transform(sequence(lo,
  * lo+bits-1), p -> IF(dot(v, plane_p) >= 0, shiftleft(1, p-lo), 0)),
  * 0, +)` with `dot` itself an interpreted `aggregate` fold — so the
  * DuckDB oracle SQL (`lshBucketSql`, which still spells out that form
  * with `list_reduce`) is unchanged. The fusion matters because the
  * nested HOFs do not participate in whole-stage codegen: at 16 tables
  * x 4 bits each row paid 64 interpreted 64-dim lambda folds plus the
  * per-plane sequence/transform allocations. This is one flat loop over
  * a precomputed plane matrix (nPlanes x 64 doubles, cached per
  * parameterization), spliced into the generated stage.
  *
  * Numerics are bit-identical to both the fold and the oracle: plane
  * values are exactly +-1.0 (md5("p_i") first-hex-digit parity — the
  * same global plane indexing `Similarity.hyperplanes` ships to DuckDB),
  * elements widen float->double (exact), and each dot product
  * accumulates sequentially in index order from 0.0 — the same
  * left-to-right order as `aggregate(..., 0.0D, (acc, i) -> acc + ...)`
  * and DuckDB's `list_reduce` over the element-wise product list.
  */
case class LshBuckets(child: Expression, nTables: Int, bitsPerTable: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) if nTables >= 1 && bitsPerTable >= 1 &&
        bitsPerTable <= 31 =>
      TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"lsh_buckets expects (array<float>, nTables >= 1, 1 <= bits <= 31), " +
        s"got (${other.simpleString}, $nTables, $bitsPerTable)")
  }

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "lsh_buckets"

  override def nullSafeEval(input: Any): Any =
    LshBuckets.compute(input.asInstanceOf[ArrayData], nTables, bitsPerTable)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.LshBuckets.compute($c, $nTables, $bitsPerTable)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object LshBuckets {

  /** Vector dimensionality the planes are derived for — the corpus
    * contract (`range(1, 65)` in the oracle SQL). A wrong-length vector
    * fails loudly instead of silently hashing a truncated prefix.
    */
  val Dims = 64

  /** Flat nPlanes*64 plane matrix for a given plane count, cached so the
    * md5 derivation runs once per parameterization per JVM, not per row
    * or per task. Values are exactly +-1.0; derivation must stay in
    * lockstep with `lshBucketSql` (SparkEntry) and
    * `Similarity.hyperplanes`: plane p (0-based), dim i (1-based),
    * md5("p_i") first hex digit odd -> +1 else -1.
    */
  private val planeCache = new ConcurrentHashMap[Integer, Array[Double]]()

  private[graft] def flatPlanes(nPlanes: Int): Array[Double] =
    planeCache.computeIfAbsent(nPlanes, { _ =>
      val md = java.security.MessageDigest.getInstance("MD5")
      val out = new Array[Double](nPlanes * Dims)
      var p = 0
      while (p < nPlanes) {
        var i = 1
        while (i <= Dims) {
          val digest = md.digest(s"${p}_$i".getBytes("UTF-8"))
          val firstHexDigit = (digest(0) >> 4) & 0xf
          out(p * Dims + i - 1) = if ((firstHexDigit & 1) == 1) 1.0 else -1.0
          i += 1
        }
        p += 1
      }
      out
    })

  def lengthMismatch(n: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"lsh_buckets: expected a $Dims-dim vector, got $n elements")

  /** One fused pass: for each of nTables*bitsPerTable planes, a
    * sequential 64-dim dot product; sign bits pack little-endian within
    * each table (bit p-lo of table t's bucket). Called from both eval
    * paths.
    */
  def compute(vec: ArrayData, nTables: Int, bitsPerTable: Int): ArrayData = {
    if (vec.numElements() != Dims) throw lengthMismatch(vec.numElements())
    val planes = flatPlanes(nTables * bitsPerTable)
    val out = new Array[Int](nTables)
    var t = 0
    while (t < nTables) {
      var bucket = 0
      var b = 0
      while (b < bitsPerTable) {
        val base = (t * bitsPerTable + b) * Dims
        var dot = 0.0
        var i = 0
        while (i < Dims) {
          dot += vec.getFloat(i).toDouble * planes(base + i)
          i += 1
        }
        if (dot >= 0) bucket |= 1 << b
        b += 1
      }
      out(t) = bucket
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Expression builder for SQL registration:
    * lsh_buckets(vec, nTables, bitsPerTable) with literal int knobs.
    */
  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 3) {
      throw new IllegalArgumentException(
        s"lsh_buckets expects exactly 3 arguments, got ${exprs.length}")
    }
    def lit(e: Expression, what: String): Int = e match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"lsh_buckets: $what must be an integer literal, got $other")
    }
    LshBuckets(exprs(0), lit(exprs(1), "nTables"), lit(exprs(2), "bitsPerTable"))
  }

  /** Register `lsh_buckets(vec, nTables, bits)` for SQL/expr use.
    * Register-if-absent, matching the other graft functions.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("lsh_buckets")))
      registry.createOrReplaceTempFunction("lsh_buckets", build, "built-in")
  }
}
