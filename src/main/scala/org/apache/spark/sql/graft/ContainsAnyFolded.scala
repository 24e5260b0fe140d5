package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{ExpectsInputTypes, Expression, Predicate, UnaryExpression}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{AbstractDataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Does the (already case-folded) text contain ANY of the N literal
  * needles? ONE Aho–Corasick pass over the text — O(|text|) whatever the
  * needle count — where both a per-needle `contains` loop and a Java
  * regex alternation pay O(|text|·N) (Java's Pattern tries each
  * alternation branch at every position; the measured 1 000-branch
  * prefilter cost nearly as much as the pair loop it was screening —
  * SCALE.md fanout section). This is the standing-query fan-out's
  * include PREFILTER engine ([[graft.operators.FilterCascade
  * .includePrefilter]]): needles are lowercased REQUIRED literals
  * extracted from the include regexes, the text arrives through
  * `lower(translate(...))` (see the prefilter for the exact four-char
  * Unicode→ASCII fold table and its exhaustiveness spec), so
  * `contains(needle)` is a sound SUPERSET of `(?iu)regex` matching.
  *
  * The automaton is immutable after construction and built lazily once
  * per (deserialized) expression instance; matching allocates nothing. */
case class ContainsAnyFolded(child: Expression, needles: Seq[String])
    extends UnaryExpression with Predicate with ExpectsInputTypes {

  require(needles.nonEmpty && needles.forall(_.nonEmpty),
    "ContainsAnyFolded needs at least one non-empty needle")

  override def inputTypes: Seq[AbstractDataType] = Seq(StringType)
  override def prettyName: String = "contains_any_folded"

  @transient lazy val automaton: AhoCorasick = AhoCorasick(needles)

  override protected def nullSafeEval(input: Any): Any =
    automaton.containsAny(input.asInstanceOf[UTF8String].toString)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // reference the EXPRESSION instance: its lazy automaton is built once
    // per task-deserialized instance, and the generated call stays inside
    // whole-stage codegen
    val ref = ctx.addReferenceObj("containsAny", this, this.getClass.getName)
    defineCodeGen(ctx, ev, c => s"$ref.automaton().containsAny($c.toString())")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object ContainsAnyFolded {
  def apply(text: Column, needles: Seq[String]): Column =
    ExpressionUtils.column(
      ContainsAnyFolded(ExpressionUtils.expression(text), needles))
}

/** Classic Aho–Corasick existence automaton over chars (goto table as a
  * per-node sorted char/next pair array — needle alphabets are tiny, and
  * binary search beats a hash per step at these sizes). Existence-only:
  * any node flagged terminal (its own needle ends there, or a suffix
  * link reaches a terminal) short-circuits the scan. */
final class AhoCorasick private (gotoChars: Array[Array[Char]],
    gotoNext: Array[Array[Int]], fail: Array[Int], hit: Array[Boolean]) {

  def containsAny(text: String): Boolean = {
    var s = 0
    var i = 0
    val n = text.length
    while (i < n) {
      val c = text.charAt(i)
      var state = s
      var next = -1
      while (next < 0) {
        val idx = java.util.Arrays.binarySearch(gotoChars(state), c)
        if (idx >= 0) next = gotoNext(state)(idx)
        else if (state == 0) next = 0
        else state = fail(state)
      }
      if (hit(next)) return true
      s = next
      i += 1
    }
    false
  }
}

object AhoCorasick {

  def apply(needles: Seq[String]): AhoCorasick = {
    // trie build over a growable node list
    val children = scala.collection.mutable.ArrayBuffer(
      scala.collection.mutable.TreeMap.empty[Char, Int])
    val terminal = scala.collection.mutable.ArrayBuffer(false)
    needles.foreach { w =>
      var s = 0
      w.foreach { c =>
        s = children(s).getOrElseUpdate(c, {
          children += scala.collection.mutable.TreeMap.empty[Char, Int]
          terminal += false
          children.size - 1
        })
      }
      terminal(s) = true
    }
    // BFS failure links; hit(s) = terminal reachable via suffix links
    val n = children.size
    val fail = new Array[Int](n)
    val hit = terminal.toArray
    val queue = scala.collection.mutable.Queue.empty[Int]
    children(0).foreach { case (_, s) => fail(s) = 0; queue += s }
    while (queue.nonEmpty) {
      val s = queue.dequeue()
      hit(s) = hit(s) || hit(fail(s))
      children(s).foreach { case (c, t) =>
        var f = fail(s)
        while (f != 0 && !children(f).contains(c)) f = fail(f)
        fail(t) = children(f).getOrElse(c, 0) match {
          case `t` => 0 // the root child's self-case: fall to root
          case other => other
        }
        queue += t
      }
    }
    val gotoChars = children.map(_.keysIterator.toArray).toArray
    val gotoNext = children.map(_.valuesIterator.toArray).toArray
    new AhoCorasick(gotoChars, gotoNext, fail, hit)
  }
}
