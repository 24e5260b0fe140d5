package org.apache.spark.sql.graft

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.classic.{Dataset => ClassicDataset, SparkSession => ClassicSparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{AllTuples, ClusteredDistribution, Distribution, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}

/** Whole-operator custom plan: per-key bounded top-K selection — keep, for
  * every key group, the first `k` rows under `order` (the retention/paging
  * primitive, SURVEY W1/K1).
  *
  * The built-in formulation (`row_number over (partition by key order
  * by …) <= k`) SORTS every partition: O(n log n) per key group and a full
  * sort buffer even when k is tiny. This physical operator keeps a
  * k-bounded binary heap per key inside one pass over each partition —
  * O(n log k) compares, memory O(keys × k rows). At a 2000-row retention
  * cap over billions of rows per feed, the sort buffer IS the bottleneck;
  * the heap never holds more than the survivors.
  *
  * The planner emits TWO heap passes, mirroring partial aggregation: a
  * map-side pass with no distribution requirement cuts each input
  * partition to ≤ keys×k rows BEFORE the exchange (at a billion rows per
  * feed and k=2000, the shuffle moves the survivors, not the corpus), then
  * the clustered (or, for the global keyless form, single-partition) final
  * pass merges the per-partition survivors — the same shape
  * TakeOrderedAndProject uses for global LIMIT, generalized per key.
  *
  * Output row order within a key is unspecified (like any selection);
  * callers order downstream if they need to (the catalog query does).
  */
case class TopKPerKeyNode(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, child: LogicalPlan) extends UnaryNode {
  require(k >= 1, "k must be >= 1")
  override def output: Seq[Attribute] = child.output
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): LogicalPlan =
    copy(child = newChild)
}

case class TopKPerKeyExec(keys: Seq[Expression], order: Seq[SortOrder],
    k: Int, partial: Boolean, child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output

  /** Partial pass runs wherever the data already is; the final pass needs
    * each key's survivors in one partition — Spark inserts the hash
    * shuffle (or reuses an existing clustering), and the keyless global
    * form gathers to a single partition exactly like the final step of
    * TakeOrderedAndProject. */
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else if (keys.isEmpty) AllTuples :: Nil
    else ClusteredDistribution(keys) :: Nil

  /** The operator filters rows in place — the child's clustering survives,
    * so a downstream groupBy/join on the same keys skips its exchange. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val schema = child.output
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    // The PARTIAL pass's heap map is BOUNDED: its per-partition key
    // cardinality is whatever the upstream clustering left (a
    // term-partitioned upstream puts rows of ~every document into one
    // partition — the unbounded map measurably OOMed at 2 M keys × k
    // copied rows), so when the buffered rows reach the cap the current
    // survivors are EMITTED and the map cleared. Partial output is a
    // per-key superset filter — flushing early only costs shuffle
    // compression, never correctness (the final pass re-heaps after the
    // exchange). The FINAL pass never flushes: its required distribution
    // co-locates each key, so its map is bounded by the keys it owns —
    // flushing there would emit more than k rows per key.
    // Default 256k buffered rows per task: an UnsafeRow copy plus its
    // map/heap entry costs ~250B, and every core runs a partial task
    // concurrently — 256k × 250B × 32 tasks ≈ 2 GB peak, which leaves the
    // heap to the window/shuffle machinery around it (the 1M-row default
    // still OOMed the 2M-doc tfidf smoke under 32-way parallelism).
    val flushKeys =
      if (!partial) Int.MaxValue
      else math.max(1024, (org.apache.spark.sql.internal.SQLConf.get
        .getConfString("spark.graft.topk.partialBufferRows", (1 << 18).toString)
        .toInt) / limit)
    child.execute().mapPartitionsInternal { iter =>
      val keyProj = UnsafeProjection.create(keyExprs, schema)
      val ord = RowOrdering.create(sortOrder, schema)
      import scala.jdk.CollectionConverters._
      new scala.collection.AbstractIterator[InternalRow] {
        // heap head = WORST retained row (reverse ordering), so admission
        // is one compare against the head and replacement is O(log k)
        private var heaps = new java.util.HashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()
        private var out: Iterator[InternalRow] = Iterator.empty
        private def drain(): Iterator[InternalRow] = {
          val old = heaps
          heaps = new java.util.HashMap()
          old.values().asScala.iterator.flatMap(_.iterator().asScala)
        }
        private def advance(): Boolean = {
          while (!out.hasNext && (iter.hasNext || !heaps.isEmpty)) {
            while (iter.hasNext && heaps.size() < flushKeys) {
              val row = iter.next()
              var heap = heaps.get(keyProj(row))
              if (heap == null) {
                heap = new java.util.PriorityQueue[InternalRow](limit + 1, ord.reverse)
                heaps.put(keyProj(row).copy(), heap)
              }
              if (heap.size < limit) heap.add(row.copy())
              else if (ord.lt(row, heap.peek())) {
                heap.poll()
                heap.add(row.copy())
              }
            }
            if (!iter.hasNext || heaps.size() >= flushKeys) out = drain()
          }
          out.hasNext
        }
        override def hasNext: Boolean = advance()
        override def next(): InternalRow = {
          if (!advance()) throw new NoSuchElementException("empty iterator")
          out.next()
        }
      }
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): SparkPlan =
    copy(child = newChild)
}

/** Planner strategy: logical node → map-side partial heap, exchange (from
  * the final pass's required distribution), final heap. */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

object TopKPerKey {
  /** Keep the first `k` rows per key under `order` — (column, descending)
    * pairs resolved by name against `df` (computed sort keys: `withColumn`
    * first). Column-API expressions are deliberately not accepted: the
    * analyzer does not resolve lazy ColumnNode wrappers inside third-party
    * logical nodes, so name-based resolution here is the stable contract.
    * `keys` may be empty: global top-k (partial heaps per partition, one
    * single-partition merge — TakeOrderedAndProject's shape).
    *
    * Ties AT the k boundary retain an arbitrary k-subset of the tied rows
    * (exactly like `row_number`'s arbitrary tie pick) — pass a total
    * order (unique tiebreak column) for fully deterministic output. */
  def apply(df: DataFrame, keys: Seq[String], order: Seq[(String, Boolean)],
      k: Int): DataFrame = {
    val analyzed = df.queryExecution.analyzed
    val resolver = df.sparkSession.sessionState.analyzer.resolver
    def attr(name: String): Attribute =
      analyzed.output.find(a => resolver(a.name, name)).getOrElse(
        throw new IllegalArgumentException(s"column $name not in ${analyzed.output.map(_.name)}"))
    val sortOrder = order.map { case (name, desc) =>
      SortOrder(attr(name),
        if (desc) org.apache.spark.sql.catalyst.expressions.Descending
        else org.apache.spark.sql.catalyst.expressions.Ascending)
    }
    ClassicDataset.ofRows(df.sparkSession.asInstanceOf[ClassicSparkSession],
      TopKPerKeyNode(keys.map(attr), sortOrder, k, analyzed))
  }

  /** Name of a Column that is a plain (possibly qualified) attribute
    * reference; None for computed expressions. */
  def attrName(c: Column): Option[String] = c.node match {
    case a: org.apache.spark.sql.internal.UnresolvedAttribute => Some(a.nameParts.last)
    case _ => None
  }

  /** Column-API adapter for operators whose public surface takes Columns
    * (Retention, Paging): routes through the native plan when every
    * key/order column is a plain attribute reference, returns None (caller
    * falls back to the window/sort formulation) otherwise. */
  def fromColumns(df: DataFrame, keys: Seq[Column], order: Seq[(Column, Boolean)],
      k: Int): Option[DataFrame] = {
    val keyNames = keys.map(attrName)
    val orderNames = order.map { case (c, desc) => attrName(c).map(_ -> desc) }
    if (keyNames.forall(_.isDefined) && orderNames.forall(_.isDefined))
      Some(apply(df, keyNames.flatten, orderNames.flatten, k))
    else None
  }
}
