package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, GraftBridge}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}

/** Whole-operator Catalyst integration (the (c) rung of the custom-op
  * ladder): the as-of join as its own LogicalPlan node, planner
  * Strategy, and sort-merge SparkPlan — instead of the tagged-union +
  * window rewrite in [[graft.ops.AsofJoin]].
  *
  * Physical shape: both sides hash-cluster on the key and sort by
  * (key, ts) — declared via requiredChildDistribution/Ordering, so
  * EnsureRequirements plans the exchanges — then one streaming merge
  * walk per partition emits, for every left row, the latest right row
  * with the same key and ts ≤ left ts (right columns null when none).
  * State per partition is ONE buffered right row: no window buffers,
  * no union materialization — at scale this halves the shuffled bytes
  * vs the rewrite (the right side doesn't ride along through a
  * window).
  *
  * Reference semantics: pandas merge_asof (the reference's nearest-
  * previous enrichment shape); ties on (key, ts) resolve to the last
  * row in sort order — give the right side unique (key, ts) for
  * deterministic output (the DataFrame-rewrite twin has the same
  * requirement).
  */
object AsofJoinNative {

  /** Logical node: output = left ++ right (right side nullable). */
  case class AsofJoinNode(left: LogicalPlan, right: LogicalPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinNode =
      copy(left = newLeft, right = newRight)
  }

  /** Optimizer rule: a custom logical node BLOCKS Catalyst's built-in
    * filter pushdown (PushDownPredicates only knows core nodes), so a
    * Filter above the as-of join would keep the parquet scan
    * unfiltered. This rule splits the conjunction and pushes every
    * deterministic, left-only predicate below the node — at 100 TB
    * that is the difference between scanning the partition and
    * scanning the table. Left side only: a right-side filter would
    * change which rows are "most recent" (not semantics-preserving). */
  object FilterPushdown
      extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan]
      with org.apache.spark.sql.catalyst.expressions.PredicateHelper {
    import org.apache.spark.sql.catalyst.expressions.And
    import org.apache.spark.sql.catalyst.plans.logical.Filter
    override def apply(plan: LogicalPlan): LogicalPlan = plan.transform {
      case f @ Filter(cond, a: AsofJoinNode) =>
        val (push, keep) = splitConjunctivePredicates(cond)
          .partition(p => p.deterministic &&
            p.references.subsetOf(a.left.outputSet))
        if (push.isEmpty) f
        else {
          val pushed = a.copy(left = Filter(push.reduce(And), a.left))
          keep.reduceOption(And).map(Filter(_, pushed)).getOrElse(pushed)
        }
    }
  }

  /** Planner strategy — inject via `spark.experimental.extraStrategies`
    * or GraftExtensions. */
  object Strategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinNode(l, r, lk, rk, lts, rts) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lts, rts) :: Nil
      case _ => Nil
    }
  }

  case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    override def requiredChildDistribution: Seq[Distribution] =
      ClusteredDistribution(leftKey :: Nil) ::
        ClusteredDistribution(rightKey :: Nil) :: Nil

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning

    override def outputOrdering: Seq[SortOrder] =
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending))

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)

    override protected def doExecute(): RDD[InternalRow] = {
      val lOut = left.output
      val rOut = right.output
      val lkB = BindReferences.bindReference(leftKey, lOut)
      val ltB = BindReferences.bindReference(leftTs, lOut)
      val rkB = BindReferences.bindReference(rightKey, rOut)
      val rtB = BindReferences.bindReference(rightTs, rOut)
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      val rWidth = rOut.size
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val rBuf = rIt.buffered
        val nullRight = new GenericInternalRow(rWidth)
        val joined = new JoinedRow
        val project = UnsafeProjection.create(outAttrs, outAttrs)
        var cand: InternalRow = null
        var candKey: Any = null
        lIt.map { l =>
          val lk = lkB.eval(l)
          val lt = ltB.eval(l)
          if (lk == null || lt == null) {
            project(joined(l, nullRight))
          } else {
            // advance the right side up to (lk, lt]; remember the
            // last row whose key matches — one buffered row of state
            var advance = true
            while (advance && rBuf.hasNext) {
              val rk = rkB.eval(rBuf.head)
              val cmp = if (rk == null) -1 else keyOrd.compare(rk, lk)
              if (cmp < 0) { rBuf.next(); () }
              else if (cmp == 0) {
                val rt = rtB.eval(rBuf.head)
                if (rt != null && tsOrd.compare(rt, lt) <= 0) {
                  cand = rBuf.next().copy()
                  candKey = rk
                } else if (rt == null) { rBuf.next(); () }
                else advance = false
              } else advance = false
            }
            val matched = cand != null && candKey != null &&
              keyOrd.compare(candKey, lk) == 0
            project(joined(l, if (matched) cand else nullRight))
          }
        }
      }
    }
  }

  /** Public API: as-of join `left` to `right` — for each left row the
    * most recent right row with equal key and right.ts ≤ left.ts.
    * Right columns must not collide with left's (rename first). */
  def asof(left: DataFrame, right: DataFrame, leftKey: String,
      rightKey: String, leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(Strategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ Strategy
    if (!spark.experimental.extraOptimizations.contains(FilterPushdown))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ FilterPushdown
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n in ${p.output}"))
    GraftBridge.ofRows(spark, AsofJoinNode(lp, rp,
      attr(lp, leftKey), attr(rp, rightKey),
      attr(lp, leftTs), attr(rp, rightTs)))
  }
}
