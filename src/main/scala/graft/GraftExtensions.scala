package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
import org.apache.spark.sql.graft._

/** Engine extensions: registers the native functions with the session's
  * FunctionRegistry (usable from SQL text as well as the Column API) and
  * the optimizer rules. Install via `.withExtensions(new GraftExtensions)`
  * or `spark.sql.extensions=graft.GraftExtensions`.
  *
  * Only expressions whose extra parameters are SQL-expressible literals
  * register here; the model-carrying ones (NearestCells, SQ8 encoders —
  * their centroid/bounds payload is a driver object, not a column) stay
  * Column-API-only by design.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  /** A required-literal scalar parameter (e.g. minhash_sig's k): evaluate
    * the parsed argument if it is a foldable literal, or fail with the
    * function's usage instead of a ClassCastException. */
  private def litInt(fn: String, e: Expression): Int = e match {
    case Literal(v: Int, _) => v
    case Literal(v: Long, _) => v.toInt
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal integer parameter, got $e")
  }

  private def litBool(fn: String, e: Expression): Boolean = e match {
    case Literal(v: Boolean, _) => v
    case _ => throw new IllegalArgumentException(
      s"$fn expects a literal boolean parameter, got $e")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression,
        clazz: Class[_]): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))

    register("dot_fp", cs => DotFp(cs(0), cs(1)), classOf[DotFp])
    // term_counts(words_array) -> array<struct<term,tf>> (in-row tf)
    register("term_counts", cs => TermCounts(cs(0)), classOf[TermCounts])
    // minhash_sig(words_array, k) -> array<string> of k band minima
    register("minhash_sig",
      cs => MinHashSig(cs(0), litInt("minhash_sig", cs(1))), classOf[MinHashSig])
    // simhash_bits(words_array, bits) -> long
    register("simhash_bits",
      cs => SimHashBits(cs(0), litInt("simhash_bits", cs(1))), classOf[SimHashBits])
    // md5_gram_keys(words_array, n, distinct) -> array<long> 60-bit keys
    register("md5_gram_keys",
      cs => Md5GramKeys(cs(0), litInt("md5_gram_keys", cs(1)),
        litBool("md5_gram_keys", cs(2))), classOf[Md5GramKeys])
    // intersect_size_sorted(sorted_a, sorted_b) -> long (merge-walk)
    register("intersect_size_sorted",
      cs => IntersectSizeSorted(cs(0), cs(1)), classOf[IntersectSizeSorted])
    // dot_codes(packed_a, packed_b) -> long (SQ8 binary-code dot)
    register("dot_codes", cs => DotCodes(cs(0), cs(1)), classOf[DotCodes])

    ext.injectOptimizerRule(_ => RegexCountToRLike)
    ext.injectOptimizerRule(_ => graft.plans.CheapPredicateFirst)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
  }
}
