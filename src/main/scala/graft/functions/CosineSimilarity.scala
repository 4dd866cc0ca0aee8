package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Fused cosine similarity over two `array<float>` columns, as a native
  * Catalyst expression with whole-stage codegen.
  *
  * Why not `zip_with` + `aggregate`: higher-order functions evaluate via
  * interpreted lambda dispatch and allocate an intermediate array per row
  * pair; inside a KNN cross join that is the entire hot path. This
  * expression is one fused loop — three accumulators, no allocation — and
  * `doGenCode` splices it straight into the generated stage.
  *
  * Numerics are kept bit-identical to the composed form (and to the
  * DuckDB oracle): elements are widened float→double (exact), the three
  * sums accumulate sequentially in index order, and the result is
  * dot / (sqrt(xx) * sqrt(yy)).
  */
case class CosineSimilarity(left: Expression, right: Expression)
  extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"cosine_sim expects two array<float> arguments, got " +
        s"(${left.dataType.simpleString}, ${right.dataType.simpleString})")
  }
  override def dataType: DataType = DoubleType
  override def prettyName: String = "cosine_sim"

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = a.numElements()
    if (b.numElements() != n) {
      throw CosineSimilarity.lengthMismatch(n, b.numElements())
    }
    var xy = 0.0; var xx = 0.0; var yy = 0.0
    var i = 0
    while (i < n) {
      val x = a.getFloat(i).toDouble
      val y = b.getFloat(i).toDouble
      xy += x * y; xx += x * x; yy += y * y
      i += 1
    }
    xy / (math.sqrt(xx) * math.sqrt(yy))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val xy = ctx.freshName("xy"); val xx = ctx.freshName("xx")
      val yy = ctx.freshName("yy"); val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val x = ctx.freshName("x"); val y = ctx.freshName("y")
      s"""
         |double $xy = 0.0; double $xx = 0.0; double $yy = 0.0;
         |int $n = $a.numElements();
         |if ($b.numElements() != $n) {
         |  throw graft.functions.CosineSimilarity.lengthMismatch(
         |    $n, $b.numElements());
         |}
         |for (int $i = 0; $i < $n; $i++) {
         |  double $x = (double) $a.getFloat($i);
         |  double $y = (double) $b.getFloat($i);
         |  $xy += $x * $y; $xx += $x * $x; $yy += $y * $y;
         |}
         |${ev.value} = $xy / (java.lang.Math.sqrt($xx) * java.lang.Math.sqrt($yy));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

object CosineSimilarity {
  /** A corrupt row (e.g. a 63-dim vector in a 64-dim corpus) must fail
    * loudly, not truncate to the shorter array and yield a plausible
    * cosine. Called from both the interpreted and generated paths.
    */
  def lengthMismatch(n: Int, m: Int): IllegalArgumentException =
    new IllegalArgumentException(
      s"cosine_sim: vector length mismatch ($n vs $m)")

  /** Expression builder shared by both registration paths (temp
    * function and SparkSessionExtensions). Arity-checked so a wrong
    * call count fails with a clear message at analysis, not an
    * IndexOutOfBoundsException from inside the analyzer.
    */
  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) {
      throw new IllegalArgumentException(
        s"cosine_sim expects exactly 2 arguments, got ${exprs.length}")
    }
    CosineSimilarity(exprs(0), exprs(1))
  }

  /** Register `cosine_sim(a, b)` for SQL/expr use in this session.
    * Register-if-absent: `GraftExtensions` (or a prior operator call)
    * may already have installed it, and re-registering logs a
    * "replaced a previously registered function" warning per call.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("cosine_sim")))
      registry.createOrReplaceTempFunction("cosine_sim", build, "built-in")
  }
}
