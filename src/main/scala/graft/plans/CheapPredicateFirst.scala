package graft.plans

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.{Filter, LogicalPlan}
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: order a Filter's top-level conjuncts cheapest-first.
  *
  * Catalyst pushes and prunes predicates but never reorders the conjuncts
  * of one Filter by evaluation cost, and codegen'd `AND` short-circuits —
  * so `regex_match(text) && key = 'x'` evaluates the regex on every row
  * even when the equality already rejects it. The filter cascade's
  * standing-query predicates (SURVEY §2.2 P3-P10) mix both kinds; this
  * rule makes the cheap structural checks (comparisons, null tests, array
  * membership) run before string-function predicates, and those before
  * regex-class predicates (SURVEY §4.1 — the reference hand-orders its
  * cascade the same way, cheap string ops before network-priced joins).
  *
  * Only applies when every conjunct is deterministic (reordering
  * non-deterministic or side-effecting predicates would change observable
  * behavior); the sort is stable, so equal-cost conjuncts keep their
  * written order and the rewrite is idempotent (no optimizer loop churn).
  *
  * ANSI safety (Spark 4 defaults to ANSI mode): a conjunct that can RAISE
  * at eval time — casts, arithmetic overflow, division, array/map
  * indexing, UDFs — must never be hoisted ahead of a conjunct the user
  * wrote before it, because `guard AND dangerous` relies on short-circuit
  * order (`s rlike '^[0-9]+$' AND CAST(s AS INT) > 5` would start throwing
  * if the cheap cast ran first). Such conjuncts get their sort key pinned
  * to the running maximum of everything written before them, so the stable
  * sort keeps every original predecessor in front; moving a *non-throwing*
  * conjunct earlier is always safe (evaluating it early is side-effect
  * free, and it can only make a later throwable conjunct run on FEWER
  * rows — a subset of the row-states it originally saw).
  */
object CheapPredicateFirst extends Rule[LogicalPlan] {

  /** Conservative: can evaluating this expression raise a runtime error
    * (ANSI or otherwise)? Unknown/extension expressions default to safe
    * only for the whitelisted structural kinds matched in [[costClass]];
    * here we blacklist the error-capable families Spark ships. */
  private def mayThrow(e: Expression): Boolean = e.exists {
    case c: Cast => c.evalMode != EvalMode.TRY &&
      !Cast.canUpCast(c.child.dataType, c.dataType)
    case b: BinaryArithmetic => b.evalMode != EvalMode.TRY // overflow / div-by-zero
    case _: ElementAt | _: GetArrayItem | _: GetMapValue => true // invalid index
    case _: ScalaUDF => true // arbitrary user code
    case _: Conv | _: JsonToStructs | _: RaiseError => true
    case _ => false
  }

  /** 0 = structural (compare/null/bool/array membership), 1 = string
    * functions, 2 = regex machinery. The class of a conjunct is its most
    * expensive sub-expression. */
  private def costClass(e: Expression): Int = {
    var cls = 0
    e.foreach {
      case _: RLike | _: Like | _: RegExpExtractAll | _: RegExpExtract |
          _: RegExpReplace | _: RegExpCount | _: RegExpInStr |
          // the engine's cached-regex pair is the same matching machinery
          // minus the compile — still a text walk, still class 2 (the
          // fan-out predicate's include/exclude terms must sort AFTER the
          // structural enum/null/array checks)
          _: org.apache.spark.sql.graft.RLikeCached |
          _: org.apache.spark.sql.graft.RegexpCountCached => cls = math.max(cls, 2)
      case _: StringPredicate | _: StringTrim | _: StringSplit | _: Lower |
          _: Upper | _: Substring | _: StringInstr | _: ConcatWs | _: Levenshtein |
          // one linear automaton pass: string-function priced, not regex
          _: org.apache.spark.sql.graft.ContainsAnyFolded =>
        cls = math.max(cls, 1)
      case _ =>
    }
    cls
  }

  private def flatten(e: Expression): Seq[Expression] = e match {
    case And(l, r) => flatten(l) ++ flatten(r)
    case other => Seq(other)
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, child) =>
      val conjuncts = flatten(cond)
      if (conjuncts.length < 2 || conjuncts.exists(!_.deterministic)) f
      else {
        // Effective sort key: a throw-capable conjunct is pinned to the max
        // key of everything written before it (see ANSI-safety note above),
        // so no original predecessor can end up after it.
        var runMax = 0
        val keyed = conjuncts.map { c =>
          val cls = costClass(c)
          val eff = if (mayThrow(c)) math.max(runMax, cls) else cls
          runMax = math.max(runMax, eff)
          (c, eff)
        }
        val ordered = keyed.sortBy(_._2).map(_._1) // stable: ties keep written order
        if (ordered == conjuncts) f
        else Filter(ordered.reduceLeft(And), child)
      }
  }
}
