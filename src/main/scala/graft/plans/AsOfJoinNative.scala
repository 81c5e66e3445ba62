package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, InterpretedOrdering, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.graftshim.GraftSqlShim

/** Native as-of join — the full custom-operator stack (SURVEY §2b
  * preference (c)): logical plan + planner strategy + physical operator.
  * Reference motivation: joining each worklog to the latest user snapshot
  * at-or-before its `start_date` (`dags/fetch_jira_tempo_worklogs.py:84-91`
  * author_id → `dags/fetch_jira_users.py:75` account_id, re-upserted
  * daily so history needs time alignment). Implemented
  * beside the compose-from-builtins formulation in
  * [[graft.operators.AsOfJoin]] (union + last-ignoreNulls window). Both are
  * correctness-gated against the same SQL oracle (q22 / q80).
  *
  * Semantics: for each left row, the LATEST right row (by `rightTime`) with
  * equal keys and `rightTime <= leftTime`; left rows without a match keep
  * nulls on the right (left-outer). Keys compare by Catalyst ordering, so
  * null keys group together (IS NOT DISTINCT matching) — filter them out
  * beforehand for SQL-join null semantics. Among right rows tied on
  * (keys, rightTime) the survivor is unspecified (the child sort has no
  * further key): pre-aggregate the right side if (key, time) isn't unique.
  *
  * 100 TB posture: exactly the sort-merge-join cost model — each side
  * shuffles once on its keys (ClusteredDistribution lets EnsureRequirements
  * co-partition or reuse existing partitioning), sorts within partitions by
  * (keys, time), then a single forward merge pass holds ONE candidate right
  * row at a time: O(1) state, no window buffering of the union (the
  * compose path sorts left+right rows together; this keeps each side's
  * sort independent and streams the merge).
  */
case class AsOfJoinPlan(left: LogicalPlan, right: LogicalPlan,
    leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression)
  extends BinaryNode {

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): LogicalPlan =
    copy(left = newLeft, right = newRight)
}

/** Column pruning through [[AsOfJoinPlan]] — Catalyst's own ColumnPruning
  * can't see inside an unknown binary node, so without this a
  * `select(few)` above the join still scans every column of both sides.
  * Pushes each child's referenced-or-required attributes (output ∩ (parent
  * references ∪ keys ∪ time)) into a child Project; the parquet scan then
  * prunes (`ReadSchema` shrinks). Injected beside the strategy.
  */
object AsOfJoinPruning
  extends org.apache.spark.sql.catalyst.rules.Rule[LogicalPlan] {

  import org.apache.spark.sql.catalyst.expressions.AttributeSet
  import org.apache.spark.sql.catalyst.plans.logical.Project

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case p @ Project(_, j: AsOfJoinPlan) =>
      val needed = AttributeSet(p.references ++
        j.leftKeys.flatMap(_.references) ++ j.rightKeys.flatMap(_.references) ++
        j.leftTime.references ++ j.rightTime.references)
      val lKeep = j.left.output.filter(needed.contains)
      val rKeep = j.right.output.filter(needed.contains)
      if (lKeep.length == j.left.output.length &&
        rKeep.length == j.right.output.length) p
      else {
        // Rebuild the join over pruned children, then re-project: dropped
        // right columns can't be referenced by p (they weren't in needed)
        p.copy(child = j.copy(
          left = Project(lKeep, j.left), right = Project(rKeep, j.right)))
      }
  }
}

/** Plans [[AsOfJoinPlan]] as [[AsOfJoinExec]]; injected via
  * `spark.experimental.extraStrategies` (see [[AsOfJoinNative.apply]]) or
  * [[GraftExtensions]].
  */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(lk, rk, lt, rt, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKeys: Seq[Expression], rightKeys: Seq[Expression],
    leftTime: Expression, rightTime: Expression,
    left: SparkPlan, right: SparkPlan)
  extends SparkPlan with BinaryExecNode {

  require(leftKeys.map(_.dataType) == rightKeys.map(_.dataType),
    "as-of join key types must match")
  require(leftTime.dataType == rightTime.dataType,
    "as-of join time types must match")

  override def output: Seq[Attribute] =
    left.output ++ right.output.map(_.withNullability(true))

  // each side clustered on its keys; EnsureRequirements co-partitions the
  // two children (or reuses an existing compatible partitioning/bucketing)
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKeys) :: ClusteredDistribution(rightKeys) :: Nil

  // (keys..., time) sort within partitions enables the streaming merge
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    leftKeys.map(SortOrder(_, Ascending)) :+ SortOrder(leftTime, Ascending),
    rightKeys.map(SortOrder(_, Ascending)) :+ SortOrder(rightTime, Ascending))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): SparkPlan =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val leftOut = left.output
    val rightOut = right.output
    val outAttrs = output
    val lKeyExprs = leftKeys
    val rKeyExprs = rightKeys
    val lTimeExpr = leftTime
    val rTimeExpr = rightTime
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKey = UnsafeProjection.create(lKeyExprs, leftOut)
      val rKey = UnsafeProjection.create(rKeyExprs, rightOut)
      val lTime = UnsafeProjection.create(Seq(lTimeExpr), leftOut)
      val rTime = UnsafeProjection.create(Seq(rTimeExpr), rightOut)
      val keyOrd = InterpretedOrdering.forSchema(keyTypes)
      val timeOrd = InterpretedOrdering.forSchema(Seq(timeType))
      val nullRight = new GenericInternalRow(rightOut.length)
      val joined = new JoinedRow
      // bind against NULLABLE right attrs: binding the (nullable) output
      // against the child's non-nullable originals elides the isNullAt
      // check and reads primitive zeros out of the all-null no-match row
      val outProj = UnsafeProjection.create(outAttrs,
        leftOut ++ rightOut.map(_.withNullability(true)))
      val rBuf = rIter.buffered
      // the single held candidate: latest right row ≤ current left time for
      // the current key (copied — sorter iterators reuse row buffers)
      var heldRight: InternalRow = null
      var heldKey: InternalRow = null
      lIter.map { l =>
        val lk = lKey(l)
        val lt = lTime(l)
        if (heldKey != null && keyOrd.compare(heldKey, lk) != 0) {
          heldRight = null; heldKey = null
        }
        var advance = true
        while (advance && rBuf.hasNext) {
          val r = rBuf.head
          val rk = rKey(r)
          val c = keyOrd.compare(rk, lk)
          if (c < 0) rBuf.next() // right key already passed: discard
          else if (c == 0 && timeOrd.compare(rTime(r), lt) <= 0) {
            heldRight = r.copy(); heldKey = rk.copy(); rBuf.next()
          } else advance = false // right is ahead of this left row
        }
        outProj(joined(l, if (heldRight != null) heldRight else nullRight))
      }
    }
  }
}

/** DataFrame-level entry point for the native operator. */
object AsOfJoinNative {

  /** As-of join `left` to `right` on equal `keys` with
    * `right(rightTime) <= left(leftTime)`, keeping the latest match (nulls
    * when none). Right columns must be named distinctly from left's.
    */
  def apply(left: DataFrame, right: DataFrame,
      leftKeys: Seq[String], rightKeys: Seq[String],
      leftTime: String, rightTime: String): DataFrame = {
    val spark = SparkSession.active
    if (!spark.experimental.extraStrategies.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy
    if (!spark.experimental.extraOptimizations.contains(AsOfJoinPruning))
      spark.experimental.extraOptimizations =
        spark.experimental.extraOptimizations :+ AsOfJoinPruning
    // re-alias the right side: fresh output attribute ids keep a self-join
    // (same source both sides) unambiguous
    val r2 = right.select(right.columns.map(n => col(n).as(n)).toSeq: _*)
    val lp = left.queryExecution.analyzed
    val rp = r2.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"as-of join: no column '$n' in [${p.output.map(_.name).mkString(", ")}]"))
    GraftSqlShim.ofRows(spark, AsOfJoinPlan(lp, rp,
      leftKeys.map(attr(lp, _)), rightKeys.map(attr(rp, _)),
      attr(lp, leftTime), attr(rp, rightTime)))
  }
}
