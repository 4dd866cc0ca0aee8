package graft.functions

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types.{ArrayType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct n-word shingles of a text column, as one fused native
  * expression: tokenize (maximal `[a-z0-9]+` runs of the lowercased
  * text), join every `n` consecutive tokens with single spaces, and
  * dedup preserving first occurrence.
  *
  * Semantically IDENTICAL to the composed form the dedup operators
  * previously inlined —
  * `array_distinct(transform(sequence(1, size(toks) - n + 1), i ->
  * concat_ws(' ', ...)))` over
  * `regexp_extract_all(lower(text), '[a-z0-9]+', 0)` — including the
  * "< n tokens → empty array" rule, so the DuckDB oracle SQL (which
  * still spells out that form) is unchanged. The fusion matters because
  * the HOF chain does NOT participate in whole-stage codegen (lambda
  * dispatch is interpreted) and allocates the token array, the index
  * sequence, and the pre-dedup shingle array per document; this is one
  * pass over the string with no regex machinery, and `doGenCode`
  * splices a static call into the generated stage so the surrounding
  * operators stay fused.
  *
  * Tokenizer equivalence: the kernel lowercases through the SAME
  * `UTF8String.toLowerCase` that implements Spark's `lower()` (so even
  * multi-char Unicode lowercasings like İ → i̇ agree), then scans for
  * maximal runs of the 36 literal `[a-z0-9]` characters.
  */
case class WordShingles(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_shingles expects (string, n >= 1), got " +
        s"(${child.dataType.simpleString}, $n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_shingles"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct = true)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.compute($c, $n, true)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** ALL n-word-gram occurrences (no dedup, corpus order) — the sibling
  * of [[WordShingles]] for occurrence-counting consumers (importance
  * weighting, LM scoring): set semantics would silently change their
  * statistics. Same fused kernel, same tokenizer equivalence; exists
  * because the composed `transform(sequence(...), i -> concat_ws(...))`
  * HOF form is not just interpreted — under project-collapse the
  * tokenizer alias is substituted into the lambda and re-evaluated per
  * element (the q38 pushdown bug class), which measured 11.8s vs 0.4s
  * on the sf0.1 corpus for the SAME bigrams.
  */
case class WordNgrams(child: Expression, n: Int)
  extends UnaryExpression {

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType && n >= 1) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"word_ngrams expects (string, n >= 1), got " +
        s"(${child.dataType.simpleString}, $n)")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def prettyName: String = "word_ngrams"

  override def nullSafeEval(input: Any): Any =
    WordShingles.compute(input.asInstanceOf[UTF8String], n, distinct = false)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, c =>
      s"graft.functions.WordShingles.compute($c, $n, false)")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object WordShingles {

  /** One pass: lowercase+tokenize into [a-z0-9]+ runs, shingle, and
    * (when `distinct`) dedup in first-occurrence order. Called from the
    * eval paths of both [[WordShingles]] and [[WordNgrams]].
    */
  def compute(text: UTF8String, n: Int, distinct: Boolean): ArrayData = {
    // the same lowercase Spark's lower() applies, THEN a literal scan —
    // identical to regexp_extract_all(lower(text), '[a-z0-9]+')
    val s = text.toLowerCase.toString
    val tokens = new java.util.ArrayList[String]()
    val len = s.length
    var i = 0
    while (i < len) {
      val c = s.charAt(i)
      if ((c >= 'a' && c <= 'z') || (c >= '0' && c <= '9')) {
        val start = i
        i += 1
        while (i < len && {
          val c2 = s.charAt(i)
          (c2 >= 'a' && c2 <= 'z') || (c2 >= '0' && c2 <= '9')
        }) i += 1
        tokens.add(s.substring(start, i))
      } else {
        i += 1
      }
    }
    val m = tokens.size - n + 1
    if (m <= 0) return new GenericArrayData(Array.empty[Any])
    // LinkedHashSet when deduping; ArrayList (insertion order, dups
    // kept) for the occurrence variant — one branch, shared loop
    val seen: java.util.Collection[String] =
      if (distinct) new java.util.LinkedHashSet[String]()
      else new java.util.ArrayList[String](m)
    var j = 0
    while (j < m) {
      val sb = new java.lang.StringBuilder(tokens.get(j))
      var k = 1
      while (k < n) {
        sb.append(' ').append(tokens.get(j + k))
        k += 1
      }
      seen.add(sb.toString)
      j += 1
    }
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var p = 0
    while (it.hasNext) {
      out(p) = UTF8String.fromString(it.next())
      p += 1
    }
    new GenericArrayData(out)
  }

  /** Expression builder for SQL registration: word_shingles(text, n). */
  def build(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) {
      throw new IllegalArgumentException(
        s"word_shingles expects exactly 2 arguments, got ${exprs.length}")
    }
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_shingles: n must be an integer literal, got $other")
    }
    WordShingles(exprs(0), n)
  }

  /** Register `word_shingles(text, n)` for SQL/expr use. Idempotent:
    * a session built with `GraftExtensions` (or an operator that already
    * called this) has the function installed, and re-registering would
    * log a "replaced a previously registered function" warning per call
    * — so registration is skipped when the name already resolves.
    */
  def register(spark: SparkSession): Unit = {
    val registry = spark.sessionState.functionRegistry
    if (!registry.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("word_shingles")))
      registry.createOrReplaceTempFunction("word_shingles", build, "built-in")
    if (!registry.functionExists(
        new org.apache.spark.sql.catalyst.FunctionIdentifier("word_ngrams")))
      registry.createOrReplaceTempFunction("word_ngrams", buildNgrams, "built-in")
  }

  /** Expression builder for SQL registration: word_ngrams(text, n). */
  def buildNgrams(exprs: Seq[Expression]): Expression = {
    if (exprs.length != 2) {
      throw new IllegalArgumentException(
        s"word_ngrams expects exactly 2 arguments, got ${exprs.length}")
    }
    val n = exprs(1) match {
      case org.apache.spark.sql.catalyst.expressions.Literal(v: Int, _) => v
      case other => throw new IllegalArgumentException(
        s"word_ngrams: n must be an integer literal, got $other")
    }
    WordNgrams(exprs(0), n)
  }
}
