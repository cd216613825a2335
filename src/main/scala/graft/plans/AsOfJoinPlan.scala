package graft.plans

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{
  Ascending, Attribute, BindReferences, Expression, GenericInternalRow,
  JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.unsafe.types.UTF8String

/** Whole-operator custom plan: a native sort-merge AS-OF join
  * (logical node → planner strategy → physical exec), registered via
  * `GraftExtensions.injectPlannerStrategy`.
  *
  * The composed formulation (`operators.AsOf.asofJoin`: union + running
  * `last(ignoreNulls)` window) is semantically identical, but pays for
  * null-padding every left row through the union and buffering rows in
  * the window operator. This exec merges the two sorted streams in one
  * pass per partition: each side shuffles ONCE on the key (the same
  * `ClusteredDistribution` contract as SortMergeJoin, so co-partitioning
  * and AQE apply), sorts within partitions, and streams — O(1) state per
  * key (the latest right payload), no buffering proportional to group
  * size. That constant-state property is what survives a 100 TB key
  * group that a window buffer would spill on.
  */
case class AsOfJoinNode(left: LogicalPlan, right: LogicalPlan,
    leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightSeq: Attribute,
    rightVals: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinNode =
    copy(left = newLeft, right = newRight)
}

object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinNode(l, r, lk, lt, rk, rt, rs, rv) =>
      AsOfJoinExec(lk, lt, rk, rt, rs, rv, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

case class AsOfJoinExec(leftKey: Attribute, leftTs: Attribute,
    rightKey: Attribute, rightTs: Attribute, rightSeq: Attribute,
    rightVals: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ rightVals.map(_.withNullability(true))

  /** Same contract as SortMergeJoin: cluster both sides by the key —
    * EnsureRequirements co-partitions them (one shuffle per side, or
    * zero if a side is already hash-partitioned on the key). */
  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  /** Within partitions: left by (key, ts); right by (key, ts, seq) so
    * the last qualifying right row is the deterministic max-seq pick. */
  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending),
      SortOrder(rightSeq, Ascending)))

  /** The merge preserves the left child's partitioning (zipPartitions
    * is partition-wise) and its (key, ts) sort order (left rows stream
    * through in order) — advertising both lets a downstream groupBy or
    * window on the key skip its exchange and sort, the same property
    * forwarding SortMergeJoinExec does. */
  override def outputPartitioning: org.apache.spark.sql.catalyst.plans.physical.Partitioning =
    left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): org.apache.spark.rdd.RDD[InternalRow] = {
    val lKeyB = BindReferences.bindReference(leftKey: Expression, left.output)
    val lTsB = BindReferences.bindReference(leftTs: Expression, left.output)
    val rKeyB = BindReferences.bindReference(rightKey: Expression, right.output)
    val rTsB = BindReferences.bindReference(rightTs: Expression, right.output)
    val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
    val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
    val rightValsLocal = rightVals
    val rightOutput = right.output
    val outputLocal = output
    val leftOutput = left.output

    left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
      val payloadProj = UnsafeProjection.create(
        rightValsLocal.map(v => BindReferences.bindReference(v: Expression, rightOutput)))
      // the payload side must bind as NULLABLE — unmatched left rows get
      // the all-null payload row, and a non-nullable binding would read
      // those slots as zeros instead of nulls
      val outProj = UnsafeProjection.create(outputLocal,
        leftOutput ++ rightValsLocal.map(_.withNullability(true)))
      val nullPayload = new GenericInternalRow(rightValsLocal.length)
      val joined = new JoinedRow
      // buffer-backed values (strings, structs, arrays, maps) must be
      // copied before the sort iterator reuses the backing UnsafeRow —
      // an uncopied reference silently goes stale on the next row
      def own(a: Any): Any = a match {
        case u: UTF8String => u.clone()
        case r: InternalRow => r.copy()
        case arr: org.apache.spark.sql.catalyst.util.ArrayData => arr.copy()
        case m: org.apache.spark.sql.catalyst.util.MapData => m.copy()
        case x => x
      }

      var rCur: InternalRow = if (rIt.hasNext) rIt.next() else null
      var matchKey: Any = null      // key the buffered payload belongs to
      var matchPayload: InternalRow = null

      lIt.map { l =>
        val lk = lKeyB.eval(l)
        val lt = lTsB.eval(l)
        if (lk == null || lt == null) {
          // SQL join semantics: a null key/ts matches nothing
          outProj(joined(l, nullPayload))
        } else {
          // advance the right side through every row at-or-before
          // (lk, lt), keeping only the latest qualifying payload —
          // O(1) state per key
          var advancing = true
          while (advancing && rCur != null) {
            val rk = rKeyB.eval(rCur)
            val rt = if (rk == null) null else rTsB.eval(rCur)
            if (rk == null || rt == null) {
              // null-keyed right rows sort first and match nothing
              rCur = if (rIt.hasNext) rIt.next() else null
            } else {
              val c = keyOrd.compare(rk, lk)
              if (c < 0) {
                rCur = if (rIt.hasNext) rIt.next() else null
              } else if (c == 0 && tsOrd.compare(rt, lt) <= 0) {
                matchKey = own(rk)
                matchPayload = payloadProj(rCur).copy()
                rCur = if (rIt.hasNext) rIt.next() else null
              } else advancing = false
            }
          }
          val payload =
            if (matchPayload != null && keyOrd.compare(matchKey, lk) == 0) matchPayload
            else nullPayload
          outProj(joined(l, payload))
        }
      }
    }
  }
}
