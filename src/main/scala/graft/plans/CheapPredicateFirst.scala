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
  */
object CheapPredicateFirst extends Rule[LogicalPlan] {

  /** 0 = structural (compare/null/bool/array membership), 1 = string
    * functions, 2 = regex machinery. The class of a conjunct is its most
    * expensive sub-expression. */
  private def costClass(e: Expression): Int = {
    var cls = 0
    e.foreach {
      case _: RLike | _: Like | _: RegExpExtractAll | _: RegExpExtract |
          _: RegExpReplace | _: RegExpCount | _: RegExpInStr => cls = math.max(cls, 2)
      case _: StringPredicate | _: StringTrim | _: StringSplit | _: Lower |
          _: Upper | _: Substring | _: StringInstr | _: ConcatWs | _: Levenshtein =>
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
        val ordered = conjuncts.sortBy(costClass) // stable: ties keep written order
        if (ordered == conjuncts) f
        else Filter(ordered.reduceLeft(And), child)
      }
  }
}
