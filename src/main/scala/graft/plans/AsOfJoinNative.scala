package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow
}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Native as-of join: the full custom-operator stack (builder brief
  * rung (c)) — a LogicalPlan node, a planner Strategy, and a physical
  * SparkPlan registered through SparkSessionExtensions /
  * ExperimentalMethods. Complements the composed implementation in
  * operators.AsOfJoin (union + running-last window): same semantics,
  * but executed as a CO-PARTITIONED SORTED MERGE — each partition
  * advances one buffered right pointer per left row, O(|L|+|R|) with
  * no window state machinery, the classic shape for fact-fact
  * temporal alignment at scale.
  *
  * Semantics: for each left row, the LAST right row (in (key, time,
  * payload) ascending order) with the same key and right.time <=
  * left.time; unmatched left rows carry nulls. Right rows sharing
  * (key, time) resolve deterministically to the sort-greatest payload
  * — identical to operators.AsOfJoin's tie-break.
  */
object AsOfJoinNative {

  /** Logical node: output = left columns ++ right columns (nullable). */
  final case class AsOfJoinNode(
      left: LogicalPlan,
      right: LogicalPlan,
      leftKeys: Seq[Attribute],
      rightKeys: Seq[Attribute],
      leftTime: Attribute,
      rightTime: Attribute
  ) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan,
        newRight: LogicalPlan): AsOfJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Optimizer rule: push left-side filters through [[AsOfJoinNode]].
    *
    * Catalyst's PushDownPredicates knows nothing about the custom
    * node, so a `.filter` applied after [[leftAsOf]] stalls directly
    * above the join: every left row pays the exchange + sort + merge
    * before being discarded, and nothing reaches the parquet scan's
    * PushedFilters. The push is SAFE for exactly the predicates that
    * reference only left-side columns and are deterministic: the
    * as-of join emits each left row exactly once and computes its
    * match independently of every other left row, so dropping left
    * rows early cannot change any surviving row's match. Right-side
    * predicates must NOT move (below the join they would filter
    * CANDIDATES — different semantics from filtering results).
    *
    * The rule also walks the pushed filter through adjacent
    * alias-only Projects (the [[leftAsOf]] freshen step) by alias
    * substitution, because the standard pushdown batches have already
    * run by the time user-provided rules fire — without that hop the
    * filter would stop one node short of the scan. Physical planning
    * happens after all optimizer batches, so a filter landing on the
    * relation still becomes a PushedFilters entry (PlansSpec pins
    * scan-level pushdown end to end).
    */
  object PushLeftFilterThroughAsOfJoin
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.expressions.And
    import org.apache.spark.sql.catalyst.plans.logical.{Filter, Project}

    /** Sink `cond` as deep as alias-only deterministic Projects allow. */
    private def sink(cond: Expression, plan: LogicalPlan): LogicalPlan = plan match {
      case p @ Project(fields, child) if fields.forall(_.deterministic) =>
        p.copy(child = sink(replaceAlias(cond, getAliasMap(p)), child))
      case other => Filter(cond, other)
    }

    override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
      case f @ Filter(cond, aj: AsOfJoinNode) =>
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic && p.references.subsetOf(aj.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = aj.copy(left = sink(push.reduce(And), aj.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Planner strategy: AsOfJoinNode -> AsOfJoinExec. */
  object AsOfJoinStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsOfJoinNode(l, r, lk, rk, lt, rt) =>
        AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
      case _ => Nil
    }
  }

  /** Physical co-partitioned sorted-merge as-of join. */
  final case class AsOfJoinExec(
      leftKeys: Seq[Expression],
      rightKeys: Seq[Expression],
      leftTime: Expression,
      rightTime: Expression,
      left: SparkPlan,
      right: SparkPlan
  ) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // Both sides hash-cluster on their keys; EnsureRequirements makes
    // the two exchanges compatible (the SortMergeJoin mechanism), so
    // zipPartitions sees co-partitioned inputs.
    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

    // (key, time) ascending on both sides; the right side additionally
    // orders by its remaining orderable columns so same-(key, time)
    // ties resolve to a deterministic (sort-greatest) payload under
    // any partitioning.
    override def requiredChildOrdering: Seq[Seq[SortOrder]] = {
      val l = (leftKeys :+ leftTime).map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))
      val tieBreak = right.output
        .filterNot(a => rightKeys.contains(a) || a == rightTime)
        .filter(a => RowOrdering.isOrderable(a.dataType))
      val r = (rightKeys ++ (rightTime +: tieBreak))
        .map(SortOrder(_, org.apache.spark.sql.catalyst.expressions.Ascending))
      Seq(l, r)
    }

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override lazy val metrics = Map(
      "numOutputRows" ->
        org.apache.spark.sql.execution.metric.SQLMetrics
          .createMetric(sparkContext, "number of output rows"),
      "numMatchedRows" ->
        org.apache.spark.sql.execution.metric.SQLMetrics
          .createMetric(sparkContext, "number of matched rows"))

    override protected def doExecute(): RDD[InternalRow] = {
      val numOutputRows = longMetric("numOutputRows")
      val numMatchedRows = longMetric("numMatchedRows")
      val leftOut = left.output
      val rightOut = right.output
      val outAttrs = output
      val lKeys = leftKeys
      val rKeys = rightKeys
      val lTime = leftTime
      val rTime = rightTime
      left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
        val lKeyProj = UnsafeProjection.create(lKeys, leftOut)
        val rKeyProj = UnsafeProjection.create(rKeys, rightOut)
        val lTimeProj = UnsafeProjection.create(Seq(lTime), leftOut)
        val rTimeProj = UnsafeProjection.create(Seq(rTime), rightOut)
        val keyOrd = RowOrdering.createNaturalAscendingOrdering(lKeys.map(_.dataType))
        val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(lTime.dataType))
        // bind against the nullability-WIDENED right schema: unmatched
        // lefts substitute an all-null right row, and BoundReference
        // only null-checks when the input schema says nullable
        val outProj =
          UnsafeProjection.create(outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
        val nullRight = new GenericInternalRow(rightOut.size)
        val joined = new JoinedRow
        val rBuf = rIter.buffered
        // one candidate per current key: the latest qualifying right row
        var lastKey: UnsafeRow = null
        var lastRow: InternalRow = null
        lIter.map { lrow =>
          val lk = lKeyProj(lrow)
          val lt = lTimeProj(lrow)
          var scan = true
          while (scan && rBuf.hasNext) {
            val rk = rKeyProj(rBuf.head)
            val kc = keyOrd.compare(rk, lk)
            if (kc < 0) {
              // stale key: can never match this or any later left row
              rBuf.next(); lastKey = null; lastRow = null
            } else if (kc == 0 && timeOrd.compare(rTimeProj(rBuf.head), lt) <= 0) {
              lastKey = rk.copy(); lastRow = rBuf.next().copy()
            } else scan = false
          }
          val matched = lastKey != null && keyOrd.compare(lastKey, lk) == 0
          numOutputRows += 1
          if (matched) numMatchedRows += 1
          outProj(joined(lrow, if (matched) lastRow else nullRight))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan,
        newRight: SparkPlan): AsOfJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Install the strategy into a live session (idempotent; also
    * injectable at build time via GraftExtensions).
    */
  def install(spark: SparkSession): Unit = {
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy)) {
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    }
    if (!spark.experimental.extraOptimizations.contains(PushLeftFilterThroughAsOfJoin)) {
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ PushLeftFilterThroughAsOfJoin
    }
  }

  /** DataFrame API: left as-of join on equality keys + time columns.
    * Right-side column names must not clash with left's (pre-alias).
    */
  def leftAsOf(
      left: DataFrame,
      right: DataFrame,
      keyCols: Seq[String],
      leftTimeCol: String,
      rightTimeCol: String
  ): DataFrame = {
    val spark = left.sparkSession
    install(spark)
    // Re-alias each side with FRESH exprIds: when both inputs derive
    // from the same relation, the analyzer's DeduplicateRelations
    // rewrites one subtree's attribute ids, and key attributes
    // captured inside a custom node would go stale (observed: column
    // pruning then drops the join key). Alias-produced ids are owned
    // by this Project, so they survive deduplication untouched.
    import org.apache.spark.sql.catalyst.expressions.Alias
    import org.apache.spark.sql.catalyst.plans.logical.Project
    def freshen(plan: LogicalPlan): (LogicalPlan, Seq[Attribute]) = {
      val aliases = plan.output.map(a => Alias(a, a.name)())
      (Project(aliases, plan), aliases.map(_.toAttribute))
    }
    val (lPlan, lAttrs) = freshen(left.queryExecution.analyzed)
    val (rPlan, rAttrs) = freshen(right.queryExecution.analyzed)
    def attr(attrs: Seq[Attribute], name: String): Attribute =
      attrs.find(_.name == name).getOrElse(
        throw new IllegalArgumentException(
          s"column $name not in ${attrs.map(_.name).mkString(",")}"))
    val node = AsOfJoinNode(
      lPlan,
      rPlan,
      keyCols.map(attr(lAttrs, _)),
      keyCols.map(attr(rAttrs, _)),
      attr(lAttrs, leftTimeCol),
      attr(rAttrs, rightTimeCol)
    )
    // project away the right-side key copies so the result keeps one
    // unambiguous column per key (the left one)
    val keep = node.output.take(lAttrs.size) ++
      node.output.drop(lAttrs.size).filterNot(a => keyCols.contains(a.name))
    org.apache.spark.sql.graft.PlanBridge.dataFrame(
      spark,
      org.apache.spark.sql.catalyst.plans.logical.Project(keep, node))
  }
}
