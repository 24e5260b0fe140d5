package org.apache.spark.sql.graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.classic.ExpressionUtils
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Token count of a text under a FIXED merges-table BPE — the real
  * budget arithmetic a training-data pipeline runs on (how many tokens
  * does this document cost?), replacing the whitespace/regex proxies
  * (ns12/ns32) for the paths where the count must match a tokenizer.
  *
  * Algorithm (GPT-2-style merge loop, reference behavior: token-count
  * budget fields in /root/reference/src/algos/starrysky.ts post
  * filtering): lowercase, split on spaces; each word starts as its
  * character sequence, then repeatedly the adjacent pair with the
  * LOWEST merge rank is merged — all its occurrences at once — until no
  * adjacent pair is in the table; the count is the total surviving
  * symbols. Two deliberate simplifications from GPT-2 proper, both
  * documented properties of [[graft.operators.Bpe]]'s trainer rather
  * than hidden drift: no byte-level alphabet (the corpus is plain
  * ASCII words), and NO self-merges (l == r is never emitted by the
  * trainer) — with l ≠ r, occurrences of a pair can never overlap, so
  * one merge step is position-parallel: every occurrence can be
  * rewritten independently, which is what lets the DuckDB oracle
  * replay the loop as a per-position list expression (ns78) and keeps
  * a vectorized implementation possible.
  *
  * Scale shape: the merges table is a driver-side constant (a few
  * hundred entries), shipped once per executor via the expression's
  * reference object — never a join side. Per-word results are memoized
  * in a bounded per-table cache ([[BpeTable]]): natural-language word
  * frequency is zipfian, so at any corpus scale the hit rate makes the
  * per-row cost approach one hash probe per word; the cache is
  * capacity-capped, not corpus-sized. */
case class BpeCount(child: Expression, merges: Seq[(String, String)])
    extends UnaryExpression {

  override def dataType: DataType = LongType

  override def prettyName: String = "bpe_count"

  @transient private lazy val table = BpeTable(merges)

  override protected def nullSafeEval(input: Any): Any =
    BpeEval.count(input.asInstanceOf[UTF8String], table)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val t = ctx.addReferenceObj("bpeTable", table,
      classOf[BpeTable].getName)
    defineCodeGen(ctx, ev, a =>
      s"org.apache.spark.sql.graft.BpeEval.count($a, $t)")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object BpeCount {
  def apply(text: Column, merges: Seq[(String, String)]): Column =
    ExpressionUtils.column(
      BpeCount(ExpressionUtils.expression(text), merges))
}

/** The executor-side form of a merges table: rank lookup keyed
  * `"l r"` (symbols never contain spaces — they are concatenations of
  * non-space word characters) plus a bounded word→count memo. One
  * instance per expression tree, shared by every row the task
  * evaluates; thread-safe because tasks may share the reference object
  * across threads in local mode. */
final class BpeTable(val merges: Seq[(String, String)])
    extends java.io.Serializable {
  require(merges.forall { case (l, r) => l != r },
    "self-merges (l == r) are excluded by construction — they would make " +
      "merge application order-dependent (see BpeCount's scaladoc)")

  @transient lazy val ranks: java.util.HashMap[String, Integer] = {
    val m = new java.util.HashMap[String, Integer](merges.size * 2)
    merges.zipWithIndex.foreach { case ((l, r), i) =>
      m.put(l + " " + r, Integer.valueOf(i))
    }
    m
  }

  /** Word-count memo, capacity-capped: zipfian word frequency gives a
    * high hit rate long before the cap; on overflow the map is simply
    * cleared (crude, but the steady state re-fills with the head of the
    * distribution within a few rows — an LRU's bookkeeping buys nothing
    * at this size). */
  @transient private lazy val memo =
    new java.util.concurrent.ConcurrentHashMap[String, java.lang.Long](4096)
  private val MemoCap = 65536

  def cached(word: String): java.lang.Long = memo.get(word)
  def cache(word: String, n: Long): Unit = {
    if (memo.size() >= MemoCap) memo.clear()
    memo.put(word, java.lang.Long.valueOf(n))
    ()
  }
}

object BpeTable {
  def apply(merges: Seq[(String, String)]): BpeTable = new BpeTable(merges)
}

object BpeEval {

  /** Total BPE token count of `text` under `table` (lowercased, space
    * tokenization, empty words skipped — the exact contract the ns78
    * oracle SQL replays). */
  def count(text: UTF8String, table: BpeTable): Long = {
    val s = text.toString.toLowerCase
    var total = 0L
    var i = 0
    val n = s.length
    while (i < n) {
      // manual space scan instead of String.split: no regex, no array
      // allocation per row
      while (i < n && s.charAt(i) == ' ') i += 1
      val start = i
      while (i < n && s.charAt(i) != ' ') i += 1
      if (i > start) total += wordCount(s.substring(start, i), table)
    }
    total
  }

  /** Symbols remaining after running the merge loop on one word. */
  def wordCount(word: String, table: BpeTable): Long = {
    val hit = table.cached(word)
    if (hit != null) return hit.longValue()
    val n = encode(word, table).length.toLong
    table.cache(word, n)
    n
  }

  /** The merge loop itself, exposed for specs and the trainer's
    * differential reference: start from characters, repeatedly apply
    * the lowest-ranked adjacent pair until none is in the table. */
  def encode(word: String, table: BpeTable): Array[String] = {
    var syms = new Array[String](word.length)
    var i = 0
    while (i < word.length) { syms(i) = String.valueOf(word.charAt(i)); i += 1 }
    val ranks = table.ranks
    var done = syms.length <= 1
    while (!done) {
      // lowest-ranked adjacent pair present
      var best = Int.MaxValue
      var j = 0
      while (j < syms.length - 1) {
        val r = ranks.get(syms(j) + " " + syms(j + 1))
        if (r != null && r.intValue() < best) best = r.intValue()
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        // merge ALL occurrences of the chosen pair; with l != r
        // guaranteed, occurrences cannot overlap and one left-to-right
        // pass is exact
        val key = {
          // recover (l, r) by scanning for the first occurrence — the
          // pair objects aren't kept beside the rank
          var k = 0
          var found: (String, String) = null
          while (found == null && k < syms.length - 1) {
            val r = ranks.get(syms(k) + " " + syms(k + 1))
            if (r != null && r.intValue() == best) found = (syms(k), syms(k + 1))
            k += 1
          }
          found
        }
        val (l, r) = key
        val out = new java.util.ArrayList[String](syms.length)
        var k = 0
        while (k < syms.length) {
          if (k < syms.length - 1 && syms(k) == l && syms(k + 1) == r) {
            out.add(l + r)
            k += 2
          } else {
            out.add(syms(k))
            k += 1
          }
        }
        syms = out.toArray(new Array[String](out.size()))
        if (syms.length <= 1) done = true
      }
    }
    syms
  }
}
