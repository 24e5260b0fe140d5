package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, ExpectsInputTypes, Expression, Predicate}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, DataType, IntegerType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Regex match/count against a COLUMN-typed pattern with a compiled-
  * pattern cache — the fan-out predicate's hot path (SURVEY §7.4#6).
  *
  * Stock Spark compiles a non-literal regex per ROW (`RLike` caches only
  * a foldable right side) or per pattern CHANGE (`RegExpCount` rides
  * RegExpExtractAll's single-entry `lastRegex`). In the standing-query
  * fan-out the pattern column comes from the broadcast conditions side of
  * a crossJoin, so it changes on EVERY consecutive evaluation — N
  * conditions × B posts means N·B `Pattern.compile` calls per predicate
  * term, and compilation dominates the actual matching (measured in
  * SCALE.md's fanout section). There are only N distinct patterns alive;
  * [[RegexEval]]'s JVM-wide bounded map compiles each once per executor.
  *
  * Semantics are bit-identical to `rlike` / `regexp_count` (same
  * `java.util.regex` engine, same find() walk, null-propagating), pinned
  * by CachedRegexSpec. */
case class RLikeCached(left: Expression, right: Expression)
    extends BinaryExpression with Predicate with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def prettyName: String = "rlike_cached"

  override protected def nullSafeEval(t: Any, p: Any): Any =
    RegexEval.find(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"org.apache.spark.sql.graft.RegexEval.find($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RLikeCached {
  def apply(text: Column, pattern: Column): Column =
    ExpressionUtils.column(RLikeCached(
      ExpressionUtils.expression(text), ExpressionUtils.expression(pattern)))
}

/** `regexp_count` with the [[RegexEval]] pattern cache — see
  * [[RLikeCached]]. */
case class RegexpCountCached(left: Expression, right: Expression)
    extends BinaryExpression with ExpectsInputTypes {

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType, StringType)
  override def dataType: DataType = IntegerType
  override def prettyName: String = "regexp_count_cached"

  override protected def nullSafeEval(t: Any, p: Any): Any =
    RegexEval.count(t.asInstanceOf[UTF8String], p.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, (t, p) =>
      s"org.apache.spark.sql.graft.RegexEval.count($t, $p)")

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): Expression = copy(left = newLeft, right = newRight)
}

object RegexpCountCached {
  def apply(text: Column, pattern: Column): Column =
    ExpressionUtils.column(RegexpCountCached(
      ExpressionUtils.expression(text), ExpressionUtils.expression(pattern)))
}

/** Static-forwarder implementation (the TermCountsEval convention) plus
  * the JVM-wide compiled-pattern cache. `Pattern` is immutable and
  * thread-safe (each call gets its own `Matcher`); the map is bounded by
  * a crude clear-at-capacity — the working set is the N standing
  * conditions' patterns (⋘ the bound), so a clear only ever happens
  * under pathological pattern churn, where stock per-row compilation is
  * the behavior anyway. */
object RegexEval {

  private val MaxPatterns = 8192
  private val cache =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.regex.Pattern]()

  private def pattern(p: UTF8String): java.util.regex.Pattern = {
    val k = p.toString
    val hit = cache.get(k)
    if (hit != null) hit
    else {
      // an invalid pattern throws PatternSyntaxException here, exactly
      // like stock rlike/regexp_count raise per row
      val compiled = java.util.regex.Pattern.compile(k)
      if (cache.size >= MaxPatterns) cache.clear()
      cache.put(k, compiled)
      compiled
    }
  }

  def find(t: UTF8String, p: UTF8String): Boolean =
    pattern(p).matcher(t.toString).find(0)

  def count(t: UTF8String, p: UTF8String): Int = {
    val m = pattern(p).matcher(t.toString)
    var c = 0
    while (m.find()) c += 1
    c
  }
}
