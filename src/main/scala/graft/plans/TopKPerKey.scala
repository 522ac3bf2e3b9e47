package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, AttributeReference, AttributeSet, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.LongType

/** Whole-operator Catalyst extension: top-k rows per key via bounded
  * per-partition heaps — the third rung of the extension ladder (after
  * codegen'd Expressions and the DotProductFusion optimizer rule), the
  * pattern for semantics Spark's built-ins CAN express but only
  * wastefully.
  *
  * The declarative form — `row_number().over(partitionBy(key).orderBy(o))
  * <= k` — plans as WindowExec: shuffle on key, then FULL SORT of every
  * partition's rows on (key, o), then rank and discard. The sort is the
  * waste: top-k needs only a k-bounded heap per key, O(n log k) with no
  * sort buffer, the same reason global top-k uses TakeOrderedAndProject
  * and never Sort+Limit. This operator is that idea applied per key:
  *
  *   - logical [[TopKPerKey]]: declares the contract — child rows, k,
  *     key and a TOTAL per-key order (caller must include a tiebreak;
  *     bounded eviction with a partial order would be nondeterministic);
  *     appends a `rn` column (1..k in order) to the child's output.
  *   - [[TopKStrategy]] (a [[SparkStrategy]]): maps it to the physical
  *     node — registered per-session via `experimental.extraStrategies`
  *     (idempotently, by the op that uses it) and usable through
  *     `SparkSessionExtensions.injectPlannerStrategy` alike.
  *   - physical [[TopKPerKeyExec]]: demands
  *     `ClusteredDistribution(key)` — EnsureRequirements/AQE insert the
  *     one hash exchange — then per partition keeps a k-bounded heap per
  *     key (head = current worst; a new row either evicts it or is
  *     dropped on the spot) and emits each key's survivors in rank
  *     order. State is keys-per-partition × k ROWS — the same hash-state
  *     shape as a partial aggregate and far below WindowExec's
  *     all-rows-of-the-partition sort buffer; rows that can never rank
  *     are dropped at first sight, before any buffering.
  *
  * At 100 TB: one shuffle on the key (identical to the window form), heap
  * state bounded by k per key, no sort spill. The win_topk_heap op pins
  * the result hash-identical to the ROW_NUMBER oracle, and PlanShapeSpec
  * asserts the plan carries TopKPerKeyExec and NO WindowExec/Sort below
  * it.
  *
  * KNOWN LIMIT — no spill: state is k rows × keys-per-partition held in
  * an on-heap map. That is orders of magnitude below WindowExec's
  * all-rows sort buffer (the thing it replaces), but unlike WindowExec it
  * does NOT spill to disk: with K distinct keys per partition the
  * operator holds ~K·k rows regardless of memory pressure. Deployments
  * where K·k rows per partition can exceed executor memory (k large, or
  * keys near-unique so the operator degenerates to a passthrough) should
  * either pre-partition so K drops, or fall back to the window form —
  * backing the map with a TaskMemoryManager-tracked spillable structure
  * is the upgrade path. The ordering must also be TOTAL per key — the
  * caller supplies a tiebreak (totality is not machine-checkable at
  * construction, so it is a documented contract): bounded eviction under
  * a partial order would silently drop different rows on different runs.
  */
case class TopKPerKey(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    child: LogicalPlan,
    // a constructor parameter, NOT a body val: optimizer rules copy() the
    // node, and a body val would mint a fresh exprId on every copy while
    // parents stay resolved against the original — the classic
    // ATTRIBUTE_NOT_FOUND trap for custom nodes
    rnAttr: AttributeReference = AttributeReference("rn", LongType, nullable = false)())
  extends UnaryNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)
  override def maxRows: Option[Long] = child.maxRows

  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerKey =
    copy(child = newChild)
}

object TopKStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case t: TopKPerKey =>
      TopKPerKeyExec(t.k, t.keys, t.order, t.rnAttr, planLater(t.child)) :: Nil
    case _ => Nil
  }

  /** Idempotent, race-free session registration — the one home for the
    * `experimental.extraStrategies` mutation (mirrors `NGrams.register`).
    * The bare check-then-append the ops used to inline is a read-modify-
    * write on a plain var: two threads registering concurrently (a future
    * parallel bench) could double-append or lose an unrelated strategy.
    * Serialized on the session object; sessions built with
    * `GraftExtensions` already carry the strategy via
    * injectPlannerStrategy and skip the append.
    */
  def ensureRegistered(s: org.apache.spark.sql.SparkSession): Unit =
    s.synchronized {
      if (!s.experimental.extraStrategies.contains(this))
        s.experimental.extraStrategies = s.experimental.extraStrategies :+ this
    }
}

case class TopKPerKeyExec(
    k: Int,
    keys: Seq[Expression],
    order: Seq[SortOrder],
    rnAttr: Attribute,
    child: SparkPlan)
  extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output :+ rnAttr
  // rn is minted here, not consumed — without this the plan printer flags
  // the node with the missing-input `!` marker
  override def producedAttributes: AttributeSet = AttributeSet(rnAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(keys) :: Nil

  // rows are emitted with only the rn column appended; the child's
  // clustering is preserved
  override def outputPartitioning: Partitioning = child.outputPartitioning

  override protected def doExecute(): RDD[InternalRow] = {
    val childOutput = child.output
    val kLocal = k
    val keysLocal = keys
    val orderLocal = order
    child.execute().mapPartitions({ iter =>
      val keyProj = UnsafeProjection.create(keysLocal, childOutput)
      // ascending "better-first" ordering per the SortOrder directions;
      // the mutable.PriorityQueue dequeues its MAXIMUM, i.e. the current
      // worst retained row — exactly the eviction candidate
      val ord = GenerateOrdering.generate(orderLocal, childOutput)
      val heaps = mutable.LinkedHashMap.empty[InternalRow, mutable.PriorityQueue[InternalRow]]
      iter.foreach { row =>
        val key = keyProj(row)
        heaps.get(key) match {
          case Some(heap) =>
            if (heap.size < kLocal) heap.enqueue(row.copy())
            else if (ord.compare(row, heap.head) < 0) {
              heap.dequeue()
              heap.enqueue(row.copy())
            }
          case None =>
            val heap = mutable.PriorityQueue.empty[InternalRow](ord)
            heap.enqueue(row.copy())
            heaps.put(key.copy(), heap)
        }
      }
      val joined = new JoinedRow
      val rnRow = new GenericInternalRow(1)
      // parents (e.g. the exchange under a later sort) require UnsafeRow;
      // the projection's buffer is reused per emitted row, the standard
      // streaming-operator contract
      val toUnsafe = UnsafeProjection.create(childOutput :+ rnAttr, childOutput :+ rnAttr)
      heaps.iterator.flatMap { case (_, heap) =>
        // dequeueAll drains worst-first; reverse = rank order 1..k
        val drained: Seq[InternalRow] = heap.dequeueAll[InternalRow]
        drained.reverseIterator.zipWithIndex.map { case (row, i) =>
          rnRow.setLong(0, i + 1L)
          toUnsafe(joined(row, rnRow))
        }
      }
    }, preservesPartitioning = true)
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerKeyExec =
    copy(child = newChild)
}

/** Optimizer rule for the custom operator: push a deterministic predicate
  * on the GROUP KEYS below [[TopKPerKey]] — the rule Catalyst's own
  * PushPredicateThroughNonJoin cannot apply because it doesn't know the
  * node. Semantics: a key-only predicate keeps or drops WHOLE groups, and
  * per-key top-k of the surviving groups is unchanged — so
  * Filter(keyPred, TopKPerKey(child)) ≡ TopKPerKey(Filter(keyPred, child)).
  * The payoff: user-injected rules run after the stock pushdown batches,
  * so the predicate stops at the operator's child — but that is already
  * below the hash exchange EnsureRequirements inserts, so rows of
  * discarded groups are dropped map-side, before they are shuffled or
  * ever touch a heap (on a 100 TB input filtered to one group, the
  * shuffle shrinks by the filter's selectivity). Predicates
  * touching non-key columns (or the minted rn) stay above — filtering
  * in-group rows before ranking WOULD change the ranks. Conjuncts split:
  * the key-only part sinks, the rest stays.
  */
object PushFilterThroughTopKPerKey
    extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
    with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
  import org.apache.spark.sql.catalyst.expressions.And
  import org.apache.spark.sql.catalyst.plans.logical.Filter

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
    case f @ Filter(cond, t: TopKPerKey) =>
      // only keys that ARE child attributes admit pushdown reasoning;
      // complex key expressions contribute nothing to the pushable set
      val keyAttrs = AttributeSet(t.keys.collect { case a: Attribute => a })
      val (down, stay) = splitConjunctivePredicates(cond).partition { p =>
        p.deterministic && p.references.nonEmpty && p.references.subsetOf(keyAttrs)
      }
      if (down.isEmpty) f
      else {
        val pushed = t.copy(child = Filter(down.reduce(And), t.child))
        stay.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
      }
  }
}
