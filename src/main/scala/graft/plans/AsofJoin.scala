package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.SparkStrategy

/** As-of join as a first-class operator (SURVEY §2 custom-operator tier
  * (c): LogicalPlan + Strategy + SparkPlan), registered through
  * [[graft.GraftExtensions]].
  *
  * Semantics: left outer backward as-of — for every left row, the right
  * row with the greatest `rightTime <= leftTime` within the same key,
  * or nulls. Equivalent to DuckDB/kdb `ASOF LEFT JOIN` and to the
  * composed union+window form in `Analytics.asofPurchaseView` — but
  * planned as ONE sort-merge pass: both sides hash-cluster on the key
  * and sort by (key, time), then a streaming per-partition merge emits
  * matches with O(1) memory per key. No union, no window state, and the
  * sorts/exchanges are visible to (and reusable by) the rest of the
  * plan.
  *
  * Keys and times must be integral/timestamp-typed (evaluated as
  * longs) — the general case would carry orderings, not needed here.
  */
case class AsofJoin(left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))
  override protected def withNewChildrenInternal(l: LogicalPlan, r: LogicalPlan): AsofJoin =
    copy(left = l, right = r)
}

case class AsofJoinExec(left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTime: Expression, rightTime: Expression,
    rightTiebreak: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    // the tiebreak makes the held match deterministic under (key, time)
    // ties: last-in-order wins, i.e. the max tiebreak value
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending),
      SortOrder(rightTiebreak, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning

  // rows stream out in the left child's required order — declare it so
  // downstream consumers of (key, time) order don't re-sort
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(l: SparkPlan, r: SparkPlan): AsofJoinExec =
    copy(left = l, right = r)

  override protected def doExecute(): RDD[InternalRow] = {
    val leftOut = left.output
    val rightOut = right.output
    val lKey = leftKey
    val rKey = rightKey
    val lTime = leftTime
    val rTime = rightTime
    val schema = output
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lkProj = UnsafeProjection.create(Seq(lKey, lTime), leftOut)
      val rkProj = UnsafeProjection.create(Seq(rKey, rTime), rightOut)
      // bind against nullable-marked right attrs: the null-fill row for
      // unmatched left rows needs the projection to null-check them
      val outProj = UnsafeProjection.create(schema, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow
      val rBuf = rIter.buffered

      // last right row matching the current key with time <= left time
      var heldKey = 0L
      var heldValid = false
      var held: InternalRow = null

      lIter.map { lRow =>
        val lk = lkProj(lRow)
        if (lk.anyNull) {
          // SQL join semantics: null keys/times never match
          outProj(joined(lRow, nullRight))
        } else {
          val key = lk.getLong(0)
          val time = lk.getLong(1)
          if (heldValid && heldKey != key) heldValid = false
          // advance the right side up to (key, time)
          var advancing = true
          while (advancing && rBuf.hasNext) {
            val peekKeys = rkProj(rBuf.head)
            if (peekKeys.anyNull) { rBuf.next() } // null-keyed right rows never match
            else {
              val rk = peekKeys.getLong(0)
              val rt = peekKeys.getLong(1)
              if (rk < key || (rk == key && rt <= time)) {
                val r = rBuf.next()
                if (rk == key) { held = r.copy(); heldKey = key; heldValid = true }
              } else advancing = false
            }
          }
          if (heldValid && heldKey == key) outProj(joined(lRow, held))
          else outProj(joined(lRow, nullRight))
        }
      }
    }
  }
}

/** Planner strategy mapping the logical node to its exec. */
object AsofJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsofJoin(l, r, lk, rk, lt, rt, tb) =>
      AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tb) :: Nil
    case _ => Nil
  }
}
