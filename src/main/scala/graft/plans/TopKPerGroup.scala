package graft.plans

import scala.collection.mutable

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions._
import org.apache.spark.sql.catalyst.expressions.codegen.LazilyGeneratedOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode, Window => LogicalWindow}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.{SparkPlan, SparkStrategy, UnaryExecNode}
import org.apache.spark.sql.types.IntegerType

/** Whole-operator top-k-per-group (SURVEY §7.3 preference (c): custom
  * `LogicalPlan` + `Rule` + `SparkStrategy` + `SparkPlan`, registered
  * via `SparkSessionExtensions`).
  *
  * The idiomatic Spark form — `row_number() OVER (PARTITION BY g ORDER
  * BY o) <= k` — SORTS every partition's full row set before discarding
  * all but k rows per group. This operator keeps a bounded k-row heap
  * per group instead: a map-side partial pass cuts each partition to
  * ≤ k rows per group BEFORE the shuffle (the combiner analog), the
  * post-shuffle final pass merges heaps and emits ranks. No sort of the
  * input ever happens, shuffle volume is ≤ k·|groups per partition|
  * rows, and memory is k rows per live group — the partial-aggregation
  * footprint class, not the sort-buffer class.
  *
  * The `order` must be a TOTAL order (append a unique tie-break key,
  * as every top-k query in this repo already does) — with ties at the
  * k boundary the kept representative is otherwise arrival-dependent,
  * exactly as it is for `row_number` itself. */
case class TopKPerGroup(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Attribute,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output :+ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr)
  override def maxRows: Option[Long] = child.maxRows
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

/** Optimizer rule rewriting the idiomatic window top-k —
  * `Filter(row_number() OVER (PARTITION BY … ORDER BY …) <= k, Window)`
  * — into [[TopKPerGroup]]. Conservative match: exactly one window
  * expression, plain `row_number` over the default running frame, a
  * non-empty PARTITION BY (a global top-k belongs to
  * TakeOrderedAndProject), and a filter that is a single rank-vs-
  * integer-literal comparison. Opt-in per session (it changes plans
  * session-wide): injected by [[GraftExtensions]] for `withExtensions`
  * builders, or via `TopK.registerRewrite`. */
object RewriteWindowTopK extends Rule[LogicalPlan] {

  val MaxK = 10000

  private def rankLimit(cond: Expression, rn: ExprId): Option[Int] = cond match {
    case LessThanOrEqual(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rn => Some(v)
    case LessThan(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rn => Some(v - 1)
    case GreaterThanOrEqual(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(v)
    case GreaterThan(Literal(v: Int, IntegerType), a: AttributeReference) if a.exprId == rn => Some(v - 1)
    case EqualTo(a: AttributeReference, Literal(v: Int, IntegerType)) if a.exprId == rn && v == 1 => Some(1)
    case _ => None
  }

  /** User-provided rules run AFTER Spark's InferWindowGroupLimit, which
    * may already have inserted a WindowGroupLimit (sort-based group
    * limit) below the matched Window for this same spec — the heap
    * operator subsumes it, so strip it rather than sorting twice. */
  private def stripGroupLimit(p: LogicalPlan,
      part: Seq[Expression], ord: Seq[SortOrder]): LogicalPlan = p match {
    case org.apache.spark.sql.catalyst.plans.logical.WindowGroupLimit(p2, o2, _, _, inner)
        if p2 == part && o2 == ord =>
      inner
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformUp {
    case f @ org.apache.spark.sql.catalyst.plans.logical.Filter(cond,
        LogicalWindow(
          Seq(alias @ Alias(WindowExpression(RowNumber(),
            WindowSpecDefinition(_, _,
              SpecifiedWindowFrame(RowFrame, UnboundedPreceding, CurrentRow))), _)),
          partitionSpec, orderSpec, child, _))
        if partitionSpec.nonEmpty && orderSpec.nonEmpty =>
      rankLimit(cond, alias.exprId) match {
        case Some(k) if k > 0 && k <= MaxK =>
          TopKPerGroup(k, partitionSpec, orderSpec, alias.toAttribute,
            stripGroupLimit(child, partitionSpec, orderSpec))
        case _ => f
      }
  }
}

/** Plans [[TopKPerGroup]] as a partial/final [[TopKPerGroupExec]] pair;
  * EnsureRequirements inserts the group-keyed exchange between them. */
object TopKPerGroupStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(k, part, ord, rankAttr, child) =>
      val partial = TopKPerGroupExec(k, part, ord, None, planLater(child))
      TopKPerGroupExec(k, part, ord, Some(rankAttr), partial) :: Nil
    case _ => Nil
  }
}

/** Bounded-heap top-k per group. `rankAttr = None` is the map-side
  * partial (no required distribution, emits surviving rows unranked);
  * `Some(attr)` is the final pass (requires clustering on the group
  * keys, emits ranks 1..k per group). */
case class TopKPerGroupExec(
    k: Int,
    partitionExprs: Seq[Expression],
    order: Seq[SortOrder],
    rankAttr: Option[Attribute],
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output ++ rankAttr
  override def producedAttributes: AttributeSet = AttributeSet(rankAttr.toSeq)
  override def requiredChildDistribution: Seq[Distribution] =
    if (rankAttr.isDefined) ClusteredDistribution(partitionExprs) :: Nil
    else UnspecifiedDistribution :: Nil
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)

  override lazy val metrics = Map(
    "numOutputRows" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of output rows"),
    "numGroups" -> org.apache.spark.sql.execution.metric.SQLMetrics
      .createMetric(sparkContext, "number of groups"))

  protected override def doExecute(): RDD[InternalRow] = {
    // locals only — the closure must not capture the SparkPlan itself
    val numOutputRows = longMetric("numOutputRows")
    val numGroups = longMetric("numGroups")
    val kLocal = k
    // group keys must canonicalize -0.0/NaN like every built-in keyed
    // operator (NormalizeFloatingNumbers doesn't visit custom nodes)
    val part = partitionExprs.map(org.apache.spark.sql.graft.GraftSqlBridge.normalizeFloats)
    val ord = order
    val childOutput = child.output
    val outAttrs = output
    val ranked = rankAttr.isDefined
    val maxGroups = TopKPerGroupExec.MaxPartialGroups
    child.execute().mapPartitions { iter =>
      val grpProj = UnsafeProjection.create(part, childOutput)
      val rowOrd = new LazilyGeneratedOrdering(ord, childOutput)
      // max-first heap per group: head = worst kept row
      val heaps = mutable.HashMap.empty[UnsafeRow, mutable.PriorityQueue[InternalRow]]
      if (!ranked) {
        // PARTIAL: streaming. The heap map is bounded at maxGroups live
        // groups — past the cap, rows of NEW groups pass through to the
        // shuffle un-limited (a superset is always correct; the final
        // pass enforces k). This keeps the partial a pure optimization
        // instead of an OOM risk on near-unique group keys, where
        // map-side limiting can't help anyway.
        val streamed = iter.flatMap { row =>
          val key = grpProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < kLocal) heap.enqueue(row.copy())
              else if (rowOrd.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row.copy())
              }
              Iterator.empty
            case None if heaps.size < maxGroups =>
              val heap = new mutable.PriorityQueue[InternalRow]()(rowOrd)
              heap.enqueue(row.copy())
              heaps.put(key.copy(), heap)
              Iterator.empty
            case None =>
              Iterator.single(row)
          }
        }
        // ++ is by-name: heaps flush only after the input is drained
        (streamed ++ heaps.valuesIterator.flatMap(_.iterator))
          .map { r => numOutputRows += 1; r }
      } else {
        // FINAL: post-shuffle, clustered on the group keys — every row
        // of a group is in this partition, so the map holds the
        // partition's own groups only (k rows each).
        iter.foreach { row =>
          val key = grpProj(row)
          heaps.get(key) match {
            case Some(heap) =>
              if (heap.size < kLocal) heap.enqueue(row.copy())
              else if (rowOrd.compare(row, heap.head) < 0) {
                heap.dequeue(); heap.enqueue(row.copy())
              }
            case None =>
              val heap = new mutable.PriorityQueue[InternalRow]()(rowOrd)
              heap.enqueue(row.copy())
              heaps.put(key.copy(), heap)
          }
        }
        numGroups += heaps.size
        val outProj = UnsafeProjection.create(outAttrs, outAttrs)
        val joined = new JoinedRow
        val rankRow = new GenericInternalRow(1)
        heaps.valuesIterator.flatMap { heap =>
          // dequeueAll is max-first; reversed = rank order
          val sorted = heap.dequeueAll.reverse
          sorted.iterator.zipWithIndex.map { case (r, i) =>
            rankRow.update(0, i + 1)
            numOutputRows += 1
            outProj(joined(r, rankRow))
          }
        }
      }
    }
  }
}

object TopKPerGroupExec {
  /** Live-group cap for the map-side partial pass: past this many
    * groups in one input partition, new groups' rows flow to the
    * shuffle un-limited instead of growing the heap map — near-unique
    * keys get no benefit from map-side limiting, so the cap converts an
    * OOM risk into a no-op. */
  val MaxPartialGroups: Int = 1 << 17
}

/** User-facing API + per-session registration. */
object TopK {

  /** Idempotently add the planner strategy for [[TopKPerGroup]] to a
    * live session (it matches only this node, so it cannot affect any
    * other plan). */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKPerGroupStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKPerGroupStrategy

  /** Opt-in: enable the window-top-k rewrite session-wide. The rewrite
    * emits [[TopKPerGroup]] nodes, so the strategy that plans them must
    * ride along — without it a fresh session would rewrite into an
    * unplannable node. */
  def registerRewrite(spark: SparkSession): Unit = {
    ensureStrategy(spark)
    if (!spark.experimental.extraOptimizations.contains(RewriteWindowTopK))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ RewriteWindowTopK
  }

  def unregisterRewrite(spark: SparkSession): Unit =
    spark.experimental.extraOptimizations =
      spark.experimental.extraOptimizations.filterNot(_ == RewriteWindowTopK)

  /** Top-k rows per group, ranked 1..k, via the bounded-heap operator.
    * `orderBy` is (column, ascending) pairs and MUST form a total order
    * (append a unique key). The rank column is appended as `rankName`. */
  def perGroup(df: DataFrame, k: Int, groupCols: Seq[String],
      orderBy: Seq[(String, Boolean)], rankName: String = "rank"): DataFrame = {
    require(k > 0, s"k must be positive, got $k")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val analyzed = df.queryExecution.analyzed
    val byName = analyzed.output.groupBy(_.name)
    def attr(n: String): Attribute = byName.getOrElse(n,
      throw new IllegalArgumentException(
        s"no column '$n' in ${analyzed.output.map(_.name).mkString(",")}")) match {
      case Seq(one) => one
      case many => throw new IllegalArgumentException(
        s"ambiguous column '$n' (${many.size} matches) — disambiguate before TopK.perGroup")
    }
    val sortOrders = orderBy.map { case (n, asc) =>
      SortOrder(attr(n), if (asc) Ascending else Descending)
    }
    val rankAttr = AttributeReference(rankName, IntegerType, nullable = false)()
    org.apache.spark.sql.graft.GraftSqlBridge.ofRows(spark,
      TopKPerGroup(k, groupCols.map(attr), sortOrders, rankAttr, analyzed))
  }
}
