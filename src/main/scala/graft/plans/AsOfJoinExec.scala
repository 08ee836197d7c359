package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Expression, GenericInternalRow, JoinedRow, RowOrdering, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.execution.metric.SQLMetrics
import org.apache.spark.sql.internal.SQLConf

/** Sort-merge as-of join.
  *
  * Physical contract — the same shape as a shuffled sort-merge join's
  * first phase, with the probe phase replaced by a single forward-only
  * merge:
  *
  *   - both children hash-clustered on their join keys (one shuffle each,
  *     or none when an upstream exchange already satisfies it);
  *   - both children sorted by (keys..., time) ascending;
  *   - one pass per co-partition: advance a right-side cursor alongside
  *     the left rows, remembering only the latest right row whose time is
  *     <= (or <, when strict) the current left row's time for the current
  *     key. O(|left| + |right|) per partition, O(1) state — exactly one
  *     buffered right row — and exactly one output row per left row
  *     (inner drops left rows with no match; left_outer null-extends).
  *
  * Versus the built-in composition (equi join with a range residual plus a
  * rank-1 window): no fact x versions fan-out between operators, no second
  * shuffle/sort to pick rank 1, no window state. Determinism: ties on
  * (keys, time) on the right side resolve to the last row in partition
  * order, so callers wanting bit-stable output should keep (keys, time)
  * unique on the build side — same contract as the reference's
  * `ORDER BY from DESC TOP 1`.
  */
case class AsOfJoinExec(
    left: SparkPlan,
    right: SparkPlan,
    leftKeys: Seq[Expression],
    rightKeys: Seq[Expression],
    leftTime: Expression,
    rightTime: Expression,
    joinType: JoinType,
    strict: Boolean) extends BinaryExecNode {

  require(joinType == Inner || joinType == LeftOuter,
    s"as-of join supports inner and left_outer, got $joinType")
  require(leftTime.dataType == rightTime.dataType,
    s"as-of time columns must share a type, got ${leftTime.dataType} vs ${rightTime.dataType}")

  override def output: Seq[Attribute] = joinType match {
    case LeftOuter => left.output ++ right.output.map(_.withNullability(true))
    case _         => left.output ++ right.output
  }

  override lazy val metrics = Map(
    "numOutputRows" -> SQLMetrics.createMetric(sparkContext, "number of output rows"))

  override def requiredChildDistribution: Seq[Distribution] = {
    val requireAll = conf.getConf(SQLConf.REQUIRE_ALL_CLUSTER_KEYS_FOR_CO_PARTITION)
    ClusteredDistribution(leftKeys, requireAllClusterKeys = requireAll) ::
      ClusteredDistribution(rightKeys, requireAllClusterKeys = requireAll) :: Nil
  }

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    (leftKeys :+ leftTime).map(SortOrder(_, Ascending)),
    (rightKeys :+ rightTime).map(SortOrder(_, Ascending)))

  // left rows pass through in their incoming partition and order
  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = left.outputOrdering

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  override protected def doExecute(): RDD[InternalRow] = {
    val numOutputRows = longMetric("numOutputRows")
    val keyTypes = leftKeys.map(_.dataType)
    val timeType = leftTime.dataType
    val isInner = joinType == Inner
    val strictLt = strict
    val leftOut = left.output
    val rightOut = right.output
    val (lk, rk, lt, rt) = (leftKeys, rightKeys, leftTime, rightTime)
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val lKeyProj = UnsafeProjection.create(lk, leftOut)
      val rKeyProj = UnsafeProjection.create(rk, rightOut)
      val lTimeProj = UnsafeProjection.create(Seq(lt), leftOut)
      val rTimeProj = UnsafeProjection.create(Seq(rt), rightOut)
      val keyOrd = RowOrdering.createNaturalAscendingOrdering(keyTypes)
      val timeOrd = RowOrdering.createNaturalAscendingOrdering(Seq(timeType))
      // bind against nullable right attributes: on left_outer the joined
      // row can carry an all-null right side, and a projection bound to the
      // original non-nullable attrs would elide the null checks
      val resultProj = UnsafeProjection.create(
        outAttrs, leftOut ++ rightOut.map(_.withNullability(true)))
      val nullRight = new GenericInternalRow(rightOut.size)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        // cursor: the next unconsumed right row (projection buffers are
        // reused, so only the candidate is ever copied)
        private var rRow: InternalRow = if (rIter.hasNext) rIter.next() else null
        private var candidate: InternalRow = null
        private var candidateKey: UnsafeRow = null
        private var outRow: InternalRow = null
        private var ready = false

        private def advanceRight(): Unit =
          rRow = if (rIter.hasNext) rIter.next() else null

        private def computeNext(): Unit = {
          outRow = null
          while (outRow == null && lIter.hasNext) {
            val l = lIter.next()
            val lKey = lKeyProj(l)
            val lTime = lTimeProj(l) // valid until the next left row
            // a candidate buffered for a previous key is stale
            if (candidate != null && keyOrd.compare(candidateKey, lKey) != 0) {
              candidate = null; candidateKey = null
            }
            var done = false
            while (!done && rRow != null) {
              val rKey = rKeyProj(rRow)
              val c = keyOrd.compare(rKey, lKey)
              if (c < 0) advanceRight() // right is behind every remaining left key
              else if (c == 0) {
                val cmp = timeOrd.compare(rTimeProj(rRow), lTime)
                if (if (strictLt) cmp < 0 else cmp <= 0) {
                  // newest usable version so far for this key — keep it
                  candidate = rRow.copy()
                  candidateKey = rKey.copy()
                  advanceRight()
                } else done = true // future version; later left rows may use it
              } else done = true // right is ahead; no versions for this key
            }
            if (candidate != null) {
              outRow = resultProj(joined(l, candidate)); numOutputRows += 1
            } else if (!isInner) {
              outRow = resultProj(joined(l, nullRight)); numOutputRows += 1
            }
          }
        }

        override def hasNext: Boolean = {
          if (!ready) { computeNext(); ready = true }
          outRow != null
        }

        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty iterator")
          ready = false
          outRow
        }
      }
    }
  }
}
