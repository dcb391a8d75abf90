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
/** Which rank-family semantics bound the per-key keep-set. `RowNumberMode`
  * keeps exactly k rows (make the order total for determinism); the rank
  * modes keep TIES, so their keep-set is deterministic even on a non-total
  * order — `RankMode` keeps every row with `rank() <= k` (all boundary
  * ties survive, so the count can exceed k), `DenseRankMode` keeps the
  * rows of the k best DISTINCT order-key values.
  */
sealed trait TopKMode extends Serializable
case object RowNumberMode extends TopKMode
case object RankMode extends TopKMode
case object DenseRankMode extends TopKMode

/** Logical top-k-per-key node: child's rows restricted to the best `k`
  * per `keys` group under `order`, with `mode` picking the rank-family
  * bound ([[TopKMode]]). Output schema/attributes are the child's —
  * the operator only filters. Planned by [[TopKPerKeyStrategy]] as a
  * partial/final [[TopKPerKeyExec]] pair; constructed via
  * [[GraftPlans.topKPerKey]] (resolved attributes required) or rewritten
  * from `row_number()`-filter windows by
  * [[graft.plans.RewriteRowNumberTopK]].
  */
case class TopKPerKeyNode(
    keys: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan,
    mode: TopKMode = RowNumberMode) extends UnaryNode {
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
    child: SparkPlan,
    mode: TopKMode = RowNumberMode) extends UnaryExecNode {

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
    val keepMode = mode
    val childOutput = child.output
    // The final stage must hold every key of its (hash-clustered) partition
    // to guarantee the per-key contract; only the partial stage may flush.
    val maxKeys = if (partial) TopKPerKeyExec.PartialMaxKeys else Int.MaxValue
    val flushMetric = longMetric("partialFlushes")
    child.execute().mapPartitions({ iter =>
      // Codegen'd projection/ordering are created per task (they are not
      // serializable); only expressions + attributes are captured.
      val keyProj = UnsafeProjection.create(keyExprs, childOutput)
      val ord = RowOrdering.create(sortOrder, childOutput)

      /** Per-key keep-set. `insert` sees a possibly-reused row buffer and
        * must copy anything it keeps; `drain` yields best-first and is
        * called at most once.
        */
      sealed trait KeyState {
        def insert(row: InternalRow): Unit
        def drain(): Iterator[InternalRow]
      }

      // RowNumberMode: max-heap w.r.t. the sort order (head = worst kept
      // row), so a new row either beats the head (replace) or is discarded
      // in O(log k). Exactly k rows; memory is k rows per key.
      val cmp = new java.util.Comparator[InternalRow] {
        override def compare(a: InternalRow, b: InternalRow): Int = ord.compare(b, a)
      }
      final class HeapState extends KeyState {
        private val heap = new java.util.PriorityQueue[InternalRow](limit + 1, cmp)
        override def insert(row: InternalRow): Unit =
          if (heap.size < limit) heap.add(row.copy())
          else if (ord.compare(row, heap.peek()) < 0) { heap.poll(); heap.add(row.copy()) }
        override def drain(): Iterator[InternalRow] = {
          val out = new Array[InternalRow](heap.size)
          var i = out.length - 1
          while (i >= 0) { out(i) = heap.poll(); i -= 1 } // drain worst-first → reverse
          out.iterator
        }
      }

      // Rank modes group kept rows by distinct order-key value (TreeMap
      // entry = one value, best first). DenseRankMode keeps ≤ k groups;
      // RankMode keeps groups while strictly-better rows number < k
      // (`rank <= k` ⟺ fewer than k rows strictly better). Memory is k
      // rows/values per key PLUS boundary ties — ties are part of the
      // result, so that growth is the output's, not the algorithm's.
      final class RankState(dense: Boolean) extends KeyState {
        private val groups =
          new java.util.TreeMap[InternalRow, java.util.ArrayList[InternalRow]](ord)
        private var total = 0
        private def put(row: InternalRow): Unit = {
          val c = row.copy()
          val list = new java.util.ArrayList[InternalRow](4)
          list.add(c)
          groups.put(c, list)
          total += 1
        }
        private def removeLast(): Unit =
          total -= groups.pollLastEntry().getValue.size
        // Drop worst value-groups that k strictly-better rows already
        // exclude; never fires while fewer than k better rows exist.
        private def pruneRank(): Unit =
          while (groups.size > 1 && total - groups.lastEntry().getValue.size >= limit)
            removeLast()
        override def insert(row: InternalRow): Unit = {
          val tied = groups.get(row)
          if (tied != null) { tied.add(row.copy()); total += 1; if (!dense) pruneRank() }
          else if (dense) {
            if (groups.size < limit) put(row)
            else if (ord.compare(row, groups.lastKey()) < 0) { removeLast(); put(row) }
            // else: k better distinct values exist → dense_rank > k, discard
          } else {
            // All `total` kept rows strictly better than a worse-than-last
            // row → rank ≥ total+1 > k once total ≥ k: discard. Otherwise
            // the row may still make rank ≤ k — keep and re-prune.
            if (total < limit || ord.compare(row, groups.lastKey()) < 0) {
              put(row); pruneRank()
            }
          }
        }
        override def drain(): Iterator[InternalRow] = {
          import scala.jdk.CollectionConverters._
          groups.values().asScala.iterator.flatMap(_.asScala)
        }
      }

      def newState(): KeyState = keepMode match {
        case RowNumberMode => new HeapState
        case RankMode      => new RankState(dense = false)
        case DenseRankMode => new RankState(dense = true)
      }

      val states = new java.util.LinkedHashMap[UnsafeRow, KeyState]()

      // Snapshot + clear the map, yielding each key's keep-set best-first.
      def drainAll(): Iterator[InternalRow] = {
        import scala.jdk.CollectionConverters._
        val snapshot = states.values.asScala.toArray
        states.clear()
        snapshot.iterator.flatMap(_.drain())
      }

      new Iterator[InternalRow] {
        private var out: Iterator[InternalRow] = Iterator.empty
        private def fill(): Unit = {
          while (!out.hasNext && (iter.hasNext || !states.isEmpty)) {
            var flushed = false
            while (iter.hasNext && !flushed) {
              val row = iter.next()
              val key = keyProj(row) // reused buffer; bytes-equality lookup is safe
              var state = states.get(key)
              if (state == null) {
                if (states.size >= maxKeys) {
                  // Cap hit and a NEW key arrived: emit current keep-sets to
                  // the shuffle and start fresh rather than growing
                  // unboundedly. Safe in every mode — the final stage
                  // re-merges per key, and a row dropped before the flush
                  // had ≥ k rows (RankMode: strictly better / DenseRankMode:
                  // k better distinct values) in its own segment alone.
                  flushMetric.add(1)
                  out = drainAll()
                  flushed = true
                }
                state = newState()
                states.put(key.copy(), state)
              }
              state.insert(row)
            }
            if (!flushed && !iter.hasNext && !states.isEmpty) out = drainAll()
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
    case TopKPerKeyNode(keys, order, k, child, mode) =>
      TopKPerKeyExec(keys, order, k, partial = false,
        TopKPerKeyExec(keys, order, k, partial = true, planLater(child), mode),
        mode) :: Nil
    case _ => Nil
  }
}

/** User-facing API for graft's custom whole-plan operators. */
object GraftPlans {
  /** Keep the first `k` rows per key group under `orderBy`
    * ((column, ascending) pairs) — semantically `row_number() OVER
    * (PARTITION BY keys ORDER BY ...) <= k`, planned as a map-side
    * bounded heap + single hash exchange. Make the order total (add a
    * unique tie-break column) for deterministic results. `mode` switches
    * to the keep-ties rank semantics ([[RankMode]]: `rank() <= k`;
    * [[DenseRankMode]]: `dense_rank() <= k`), whose keep-SET is
    * deterministic even on a non-total order.
    */
  def topKPerKey(df: DataFrame, keys: Seq[String],
      orderBy: Seq[(String, Boolean)], k: Int,
      mode: TopKMode = RowNumberMode): DataFrame = {
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
    Bridge.ofRows(spark, TopKPerKeyNode(keys.map(attr), order, k, analyzed, mode))
  }
}
