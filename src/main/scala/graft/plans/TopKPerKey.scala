package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Descending, Expression, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.execution.metric.{SQLMetric, SQLMetrics}
import org.apache.spark.sql.graft.Bridge

/** Top-k-per-key as a first-class operator: logical node + planner strategy
  * + two-phase physical operator, the whole-operator extension path
  * (`LogicalPlan` → `SparkStrategy` → `SparkPlan`) from SURVEY.md §2.8.
  *
  * Why not `row_number().over(Window...)  WHERE rn <= k`? That plan
  * shuffles EVERY row of the input to its key's reducer and sorts full
  * partitions there — at 100 TB the shuffle materializes the whole table
  * for a result that keeps only k rows per key. This operator instead runs
  * a bounded per-key heap on the map side (exactly like partial
  * aggregation), so at most k rows per (key, input partition) reach the
  * shuffle; the reduce side merges heaps. Shuffle volume scales with
  * k·|keys|·partitions touched, not with |input|.
  *
  * Memory: a map-side heap holds ≤ k rows per distinct key seen in the
  * partition. Unlike partial hash aggregation (which falls back to
  * sort-based spill), a naive heap map would grow without bound on
  * high-cardinality keys — so the partial stage caps the map at
  * [[TopKPerKeyExec.PartialMaxKeys]] distinct keys and, when a new key
  * would exceed the cap, FLUSHES the current heaps downstream and starts
  * fresh. Early emission is safe because the final stage re-merges per
  * key; the cost of a flush is only extra shuffle rows (toward
  * pass-through), never wrong results or an executor OOM.
  *
  * The reference has no native query operators at all (it is a streaming
  * source, CustomMicroBatchStream.java:21-84); this operator belongs to
  * the LLM-pipeline extension surface (top-k per group is the shape of
  * "best k docs per dedup cluster / per source / per query vector").
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKeyNode =
    copy(child = newChild)
}

/** Physical operator. `partial = true` instances accept any input
  * distribution (map side); the `partial = false` instance requires
  * clustering on the keys, which `EnsureRequirements` satisfies with a
  * hash exchange over exactly the ≤ k-per-key-per-partition survivors.
  */
case class TopKPerKeyExec(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) Seq(UnspecifiedDistribution) else Seq(ClusteredDistribution(keys))
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)

  // Observability for the bounded-memory contract: how often the partial
  // stage hit its key cap and emitted early. A busy metric on a sized
  // workload means extra shuffle rows, not wrongness — but it is the
  // signal to raise PartialMaxKeys or pre-bucket the input.
  override lazy val metrics: Map[String, SQLMetric] = Map(
    "partialFlushes" -> SQLMetrics.createMetric(sparkContext,
      "partial heaps flushed at key cap"))

  override protected def doExecute(): RDD[InternalRow] = {
    val keyExprs = keys
    val sortOrder = order
    val limit = k
    val childOutput = child.output
    // The final stage must hold every key of its (hash-clustered) partition
    // to guarantee ≤ k rows per key; only the partial stage may flush.
    val maxKeys = if (partial) TopKPerKeyExec.PartialMaxKeys else Int.MaxValue
    val flushMetric = longMetric("partialFlushes")
    child.execute().mapPartitions({ iter =>
      // Codegen'd projection/ordering are created per task (they are not
      // serializable); only expressions + attributes are captured.
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)
      // Max-heap w.r.t. the sort order: head = worst kept row, so a new
      // row either beats the head (replace) or is discarded in O(log k).
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      val heaps = new java.util.LinkedHashMap[UnsafeRow, java.util.PriorityQueue[InternalRow]]()

      // Snapshot + clear the map, yielding each heap best-first.
      def drain(): Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        val snapshot = heaps.values.asScala.toArray
        heaps.clear()
        snapshot.iterator.flatMap { h =>
          val out = new Array[InternalRow](h.size)
          var i = out.length - 1
          while (i >= 0) { out(i) = h.poll(); i -= 1 } // drain worst-first → reverse
          out.iterator
        }
      }

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def fill(): Unit = {
          while (!out.hasNext && (iter.hasNext || !heaps.isEmpty)) {
            var flushed = false
            while (iter.hasNext && !flushed) {
              val row = iter.next()
              val key = keyProj(row) // reused buffer; bytes-equality lookup is safe
              var heap = heaps.get(key)
              if (heap == null) {
                if (heaps.size >= maxKeys) {
                  // Cap hit and a NEW key arrived: emit current heaps to the
                  // shuffle and start fresh rather than growing unboundedly.
                  flushMetric.add(1)
                  out = drain()
                  flushed = true
                }
                heap = new java.util.PriorityQueue[InternalRow](limit + 1, cmp)
                heaps.put(key.copy(), heap)
              }
              if (heap.size < limit) heap.add(row.copy())
              else if (ord.compare(row, heap.peek()) < 0) {
                heap.poll(); heap.add(row.copy())
              }
            }
            if (!flushed && !iter.hasNext && !heaps.isEmpty) out = drain()
          }
        }
        override def hasNext: Boolean = { fill(); out.hasNext }
        override def next(): InternalRow = { fill(); out.next() }
      }
    }, preservesPartitioning = true)
  }
}

object TopKPerKeyExec {
  /** Max distinct keys the PARTIAL stage buffers before flushing. At the
    * default k≈10 this bounds map-side state to ~1.3M rows per task —
    * comparable to a partial hash aggregate's in-memory map — while a
    * low-cardinality keyspace (the common top-k-per-group case) never
    * comes near it. A var only so tests can force the flush path with a
    * tiny cap; production code should not touch it.
    */
  @volatile var PartialMaxKeys: Int = 1 << 17
}

/** Plans the logical node as final(partial(child)) — the partial runs
  * map-side, the final's ClusteredDistribution draws the one exchange.
  */
object TopKPerKeyStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerKeyNode(keys, order, k, child) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child))) :: Nil
    case _ => Nil
  }
}

/** User-facing API for graft's custom whole-plan operators. */
object GraftPlans {
  /** Keep the first `k` rows per key group under `orderBy`
    * ((column, ascending) pairs) — semantically `row_number() OVER
    * (PARTITION BY keys ORDER BY ...) <= k`, planned as a map-side
    * bounded heap + single hash exchange. Make the order total (add a
    * unique tie-break column) for deterministic results.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int): DataFrame = {
    require(k > 0, s"topKPerKey: k must be positive, got $k")
    require(keys.nonEmpty && orderBy.nonEmpty, "topKPerKey: keys and orderBy required")
    val spark = df.sparkSession
    Bridge.addStrategy(spark, TopKPerKeyStrategy)
    val analyzed = df.queryExecution.analyzed
    val resolver = spark.sessionState.analyzer.resolver
    def attr(n: String): Attribute = analyzed.output.find(a => resolver(a.name, n))
      .getOrElse(throw new IllegalArgumentException(
        s"topKPerKey: column '$n' not in ${analyzed.output.map(_.name).mkString(", ")}"))
    val order = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    Bridge.ofRows(spark, TopKPerKeyNode(keys.map(attr), order, k, analyzed))
  }
}
