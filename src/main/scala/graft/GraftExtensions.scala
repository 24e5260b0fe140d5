package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo}
import org.apache.spark.sql.graft.{DotFp, RegexCountToRLike}

/** Engine extensions: registers the native functions with the session's
  * FunctionRegistry (usable from SQL text as well as the Column API) and
  * the optimizer rules. Install via `.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("dot_fp"),
      new ExpressionInfo(classOf[DotFp].getName, "dot_fp"),
      (children: Seq[Expression]) => DotFp(children(0), children(1))))
    ext.injectOptimizerRule(_ => RegexCountToRLike)
    ext.injectOptimizerRule(_ => graft.plans.CheapPredicateFirst)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
  }
}
