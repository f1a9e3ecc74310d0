package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, Cast, Expression, JoinedRow, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType

/** Native point-in-time (as-of) join: the whole-operator tier (c) of
  * the custom-operator ladder — a Catalyst `LogicalPlan` node, a
  * `SparkStrategy`, and a physical merge `SparkPlan`, next to the
  * composition-tier implementation in [[graft.operators.AsOfJoin]]
  * (reference semantics: each left row picks up the latest right row
  * with rightTime <= leftTime on the same key; inner flavor — left
  * rows with no prior right row drop).
  *
  * Physical shape: both sides hash-cluster on the key (ONE shuffle
  * each — exactly a sort-merge join's movement) and sort within
  * partitions by (key, time); a single forward-merge pass then emits
  * matches. No window state, no union of mismatched schemas, no
  * running `last(ignoreNulls)` over interleaved rows — the merge holds
  * ONE buffered right row at a time, so memory is O(1) per partition
  * where the window formulation keeps a frame. At 100 TB both sides
  * shuffle once on the key, identically to a regular equi-join.
  */
case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    payload: Seq[Attribute]) extends BinaryNode {
  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))
  override protected def withNewChildrenInternal(
      newLeft: LogicalPlan, newRight: LogicalPlan): AsOfJoinPlan =
    copy(left = newLeft, right = newRight)
}

/** Planner strategy mapping the logical node to the physical merge. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, lt, rk, rt, payload) =>
      AsOfJoinExec(lk, lt, rk, rt, payload, planLater(l), planLater(r)) :: Nil
    case _ => Nil
  }
}

/** Physical as-of merge join. Children are required to be clustered on
  * the join key and sorted by (key, time) — EnsureRequirements inserts
  * the (single) exchange and sorts; AQE coordinates co-partitioning
  * the same way it does for sort-merge joins. */
case class AsOfJoinExec(
    leftKey: Expression, leftTime: Expression,
    rightKey: Expression, rightTime: Expression,
    payload: Seq[Attribute],
    left: SparkPlan, right: SparkPlan) extends BinaryExecNode {

  override def output: Seq[Attribute] =
    left.output ++ payload.map(_.withNullability(true))

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(Seq(leftKey)) :: ClusteredDistribution(Seq(rightKey)) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTime, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTime, Ascending)))

  override def outputPartitioning: Partitioning = left.outputPartitioning
  override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

  override protected def withNewChildrenInternal(
      newLeft: SparkPlan, newRight: SparkPlan): AsOfJoinExec =
    copy(left = newLeft, right = newRight)

  protected override def doExecute(): RDD[InternalRow] = {
    val lOut = left.output
    val rOut = right.output
    val lk = leftKey; val lt = leftTime
    val rk = rightKey; val rt = rightTime
    val pay = payload
    val outAttrs = output

    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      // (key, time) extractors — unsafe rows are reused, so longs are
      // pulled out immediately; payload rows are copied when buffered
      val lkt = UnsafeProjection.create(Seq(lk, lt), lOut)
      val rkt = UnsafeProjection.create(Seq(rk, rt), rOut)
      val payProj = UnsafeProjection.create(pay, rOut)
      val resProj = UnsafeProjection.create(outAttrs, lOut ++ pay)
      val joined = new JoinedRow

      new Iterator[InternalRow] {
        private var lastPayload: UnsafeRow = null
        private var lastPayloadKey = 0L
        private var rHead: InternalRow = null
        private var rHeadKey = 0L
        private var rHeadTime = 0L
        private var nextOut: InternalRow = null

        advanceRight()

        private def advanceRight(): Unit = {
          rHead = null
          while (rHead == null && rIter.hasNext) {
            val row = rIter.next()
            val kt = rkt(row)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              rHead = row; rHeadKey = kt.getLong(0); rHeadTime = kt.getLong(1)
            }
          }
        }

        private def computeNext(): Unit = {
          nextOut = null
          while (nextOut == null && lIter.hasNext) {
            val lRow = lIter.next()
            val kt = lkt(lRow)
            if (!kt.isNullAt(0) && !kt.isNullAt(1)) {
              val key = kt.getLong(0); val time = kt.getLong(1)
              // consume right rows at-or-before (key, time); only the
              // latest one per key is buffered
              while (rHead != null &&
                  (rHeadKey < key || (rHeadKey == key && rHeadTime <= time))) {
                if (rHeadKey == key) {
                  lastPayload = payProj(rHead).copy()
                  lastPayloadKey = key
                }
                advanceRight()
              }
              if (lastPayload != null && lastPayloadKey == key)
                nextOut = resProj(joined(lRow, lastPayload))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextOut == null) computeNext()
          nextOut != null
        }
        override def next(): InternalRow = {
          if (nextOut == null) computeNext()
          val r = nextOut; nextOut = null; r
        }
      }
    }
  }
}

/** DataFrame-level entry point (same contract as the composed
  * [[graft.operators.AsOfJoin.asOf]]). */
object AsOfJoinNative {
  /** Idempotently register the planner strategy on any session —
    * sessions built with `spark.sql.extensions=graft.GraftExtensions`
    * get it at construction instead. */
  def ensureStrategy(spark: SparkSession): Unit = {
    val cur = spark.experimental.extraStrategies
    if (!cur.contains(AsOfJoinStrategy))
      spark.experimental.extraStrategies = cur :+ AsOfJoinStrategy
  }

  def asOf(left: DataFrame, leftKey: String, leftTime: String,
      right: DataFrame, rightKey: String, rightTime: String,
      rightPayload: Seq[String]): DataFrame = {
    val spark = left.sparkSession
    ensureStrategy(spark)
    val lPlan = left.queryExecution.analyzed
    val rPlan = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        sys.error(s"column $n not found in ${p.output.map(_.name)}"))
    def asLong(a: Attribute): Expression =
      if (a.dataType == LongType) a else Cast(a, LongType)
    val plan = AsOfJoinPlan(lPlan, rPlan,
      asLong(attr(lPlan, leftKey)), attr(lPlan, leftTime),
      asLong(attr(rPlan, rightKey)), attr(rPlan, rightTime),
      rightPayload.map(attr(rPlan, _)))
    org.apache.spark.sql.GraftSqlBridge.ofRows(spark, plan)
  }
}
