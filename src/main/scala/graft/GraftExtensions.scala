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

  /** A required-literal scalar parameter (e.g. minhash_sig's k): folds any
    * foldable argument (so `2+1` or a cast literal works from SQL text, not
    * just a bare Literal) and fails with the function's usage instead of a
    * ClassCastException otherwise. */
  private def litInt(fn: String, e: Expression): Int =
    (if (e.foldable) e.eval() else null) match {
      case v: Int  => v
      case v: Long => v.toInt
      case v: Short => v.toInt
      case v: Byte => v.toInt
      case _ => throw new IllegalArgumentException(
        s"$fn expects a foldable integer parameter, got $e")
    }

  private def litBool(fn: String, e: Expression): Boolean =
    (if (e.foldable) e.eval() else null) match {
      case v: Boolean => v
      case _ => throw new IllegalArgumentException(
        s"$fn expects a foldable boolean parameter, got $e")
    }

  /** Arity check before indexing `cs` — a wrong-arity SQL call must raise
    * the function's usage, not IndexOutOfBoundsException. */
  private def arity(fn: String, cs: Seq[Expression], n: Int, usage: String): Unit =
    if (cs.length != n) throw new IllegalArgumentException(
      s"$fn expects $n arguments ($usage), got ${cs.length}")

  override def apply(ext: SparkSessionExtensions): Unit = {
    def register(name: String, builder: Seq[Expression] => Expression,
        clazz: Class[_]): Unit =
      ext.injectFunction((
        new FunctionIdentifier(name),
        new ExpressionInfo(clazz.getName, name), builder))

    register("dot_fp", cs => {
      arity("dot_fp", cs, 2, "vec_a, vec_b")
      DotFp(cs(0), cs(1))
    }, classOf[DotFp])
    // bpe_count(text) -> bigint token count under the committed fixture
    // merges table (graft.operators.Bpe.Fixture — the one table the SQL
    // surface can name; arbitrary tables stay Column-API-only, same
    // rule as the model-carrying expressions)
    register("bpe_count", cs => {
      arity("bpe_count", cs, 1, "text")
      BpeCount(cs(0), graft.operators.Bpe.Fixture)
    }, classOf[BpeCount])
    // term_counts(words_array) -> array<struct<term,tf>> (in-row tf)
    register("term_counts", cs => {
      arity("term_counts", cs, 1, "words_array")
      TermCounts(cs(0))
    }, classOf[TermCounts])
    // minhash_sig(words_array, k) -> array<string> of k band minima
    register("minhash_sig", cs => {
      arity("minhash_sig", cs, 2, "words_array, k")
      MinHashSig(cs(0), litInt("minhash_sig", cs(1)))
    }, classOf[MinHashSig])
    // simhash_bits(words_array, bits) -> long
    register("simhash_bits", cs => {
      arity("simhash_bits", cs, 2, "words_array, bits")
      SimHashBits(cs(0), litInt("simhash_bits", cs(1)))
    }, classOf[SimHashBits])
    // md5_gram_keys(words_array, n, distinct) -> array<long> 60-bit keys
    register("md5_gram_keys", cs => {
      arity("md5_gram_keys", cs, 3, "words_array, n, distinct")
      Md5GramKeys(cs(0), litInt("md5_gram_keys", cs(1)),
        litBool("md5_gram_keys", cs(2)))
    }, classOf[Md5GramKeys])
    // intersect_size_sorted(sorted_a, sorted_b) -> long (merge-walk)
    register("intersect_size_sorted", cs => {
      arity("intersect_size_sorted", cs, 2, "sorted_a, sorted_b")
      IntersectSizeSorted(cs(0), cs(1))
    }, classOf[IntersectSizeSorted])
    // dot_codes(packed_a, packed_b) -> long (SQ8 binary-code dot)
    register("dot_codes", cs => {
      arity("dot_codes", cs, 2, "packed_a, packed_b")
      DotCodes(cs(0), cs(1))
    }, classOf[DotCodes])
    // bucket_counts(words_array, buckets) -> array<long> hashed token mass
    register("bucket_counts", cs => {
      arity("bucket_counts", cs, 2, "words_array, buckets")
      BucketCounts(cs(0), litInt("bucket_counts", cs(1)))
    }, classOf[BucketCounts])
    // dot_longs(a, b) -> long (exact integer array dot)
    register("dot_longs", cs => {
      arity("dot_longs", cs, 2, "array_a, array_b")
      DotLongs(cs(0), cs(1))
    }, classOf[DotLongs])
    // rlike_cached(text, pattern) / regexp_count_cached(text, pattern):
    // stock-identical semantics with a compiled-pattern cache — for
    // COLUMN-typed patterns (stock compiles those per row); with a
    // literal pattern stock is already cached, use the builtins
    register("rlike_cached", cs => {
      arity("rlike_cached", cs, 2, "text, pattern")
      RLikeCached(cs(0), cs(1))
    }, classOf[RLikeCached])
    register("regexp_count_cached", cs => {
      arity("regexp_count_cached", cs, 2, "text, pattern")
      RegexpCountCached(cs(0), cs(1))
    }, classOf[RegexpCountCached])
    // contains_any_folded(text, needle, ...) -> boolean: one Aho-Corasick
    // pass; needles are required-literal strings (foldable)
    register("contains_any_folded", cs => {
      if (cs.length < 2) throw new IllegalArgumentException(
        "contains_any_folded expects (text, needle, ...), got " + cs.length)
      val needles = cs.tail.map { e =>
        (if (e.foldable) e.eval() else null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case s: String => s
          case _ => throw new IllegalArgumentException(
            "contains_any_folded needles must be foldable strings, got " + e)
        }
      }
      ContainsAnyFolded(cs.head, needles)
    }, classOf[ContainsAnyFolded])

    ext.injectOptimizerRule(_ => RegexCountToRLike)
    ext.injectOptimizerRule(_ => graft.plans.CheapPredicateFirst)
    ext.injectPlannerStrategy(_ => org.apache.spark.sql.graft.TopKPerKeyStrategy)
  }
}
