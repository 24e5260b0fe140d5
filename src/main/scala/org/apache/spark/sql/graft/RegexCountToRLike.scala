package org.apache.spark.sql.graft

import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.catalyst.rules.Rule

/** Optimizer rule: a match-COUNT compared against zero is a match-EXISTENCE
  * test — rewrite `regexp_count(x, p) > 0` (and its mirrored/negated
  * forms) to `x RLIKE p`. RegExpCount scans every match in the string;
  * RLike stops at the first. The filter cascade's include-regex (SURVEY
  * P3) is exactly this shape, so on long documents the predicate does a
  * fraction of the regex work. Semantics are identical: count > 0 ⇔ a
  * match exists (same Java regex engine underneath).
  *
  * Injected via graft.GraftExtensions (injectOptimizerRule).
  */
object RegexCountToRLike extends Rule[LogicalPlan] {

  private object Zero {
    def unapply(e: Expression): Boolean = e match {
      case Literal(0, _) => true
      case Cast(Literal(0, _), _, _, _) => true
      case _ => false
    }
  }

  /** regexp_count before AND after RuntimeReplaceable expansion
    * (ReplaceExpressions may have already rewritten it to
    * size(regexp_extract_all(x, p, 0))). */
  private object MatchCount {
    def unapply(e: Expression): Option[(Expression, Expression)] = e match {
      case RegExpCount(x, p) => Some((x, p))
      case Size(RegExpExtractAll(x, p, Literal(0, _)), _) => Some((x, p))
      case _ => None
    }
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformAllExpressions {
    // regexp_count(x, p) > 0  /  0 < regexp_count(x, p)  → x rlike p
    case GreaterThan(MatchCount(x, p), Zero()) => RLike(x, p)
    case LessThan(Zero(), MatchCount(x, p)) => RLike(x, p)
    // regexp_count(x, p) >= 1 → x rlike p
    case GreaterThanOrEqual(MatchCount(x, p), Literal(1, _)) => RLike(x, p)
    // regexp_count(x, p) = 0 / <= 0 → NOT (x rlike p)
    case EqualTo(MatchCount(x, p), Zero()) => Not(RLike(x, p))
    case LessThanOrEqual(MatchCount(x, p), Zero()) => Not(RLike(x, p))
  }
}
