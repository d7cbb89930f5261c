package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.LongType
import org.apache.spark.sql.GraftBridge

/** Native as-of join: the full custom-operator tier (SURVEY §7.4 /
  * guide preference (c)) — a logical node, a planner Strategy, and a
  * physical BinaryExecNode that merge-joins two (key, ts)-sorted streams
  * partition-by-partition.
  *
  * Semantics are identical to [[graft.ops.AsofOps.asofJoin]] (left row
  * picks up the latest right row with equal key and right.ts ≤ left.ts;
  * unmatched lefts keep nulls) — asserted in AsofNativeSpec and against
  * q80's DuckDB ASOF JOIN oracle. The physical shape differs: instead of
  * unioning both inputs through one window, each side shuffles ONCE on
  * its own key, sorts within partitions, and streams through a constant-
  * memory two-pointer merge — the plan a purpose-built engine would run,
  * with the smaller total sort volume of keeping the sides separate.
  *
  * v1 restriction: key and ts must be LongType (what the engine's event
  * surface uses); generic orderings would swap the two comparisons for
  * `TypeUtils.getInterpretedOrdering`.
  */
object AsofJoinNative {

  /** Logical node; constructed already-resolved from analyzed children. */
  case class AsofJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTs: Attribute, rightTs: Attribute) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: logical → physical. */
  object AsofStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinPlan(l, r, lk, rk, lt, rt) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
      case _ => Nil
    }
  }

  case class AsofJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))

    // co-cluster both sides on their keys; EnsureRequirements inserts the
    // exchanges (and keeps them compatible, as for SortMergeJoin)
    override def requiredChildDistribution: Seq[Distribution] =
      Seq(ClusteredDistribution(Seq(leftKey)), ClusteredDistribution(Seq(rightKey)))

    override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
      Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
      Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

    override def outputPartitioning: Partitioning = left.outputPartitioning
    override def outputOrdering: Seq[SortOrder] = requiredChildOrdering.head

    override protected def doExecute(): RDD[InternalRow] = {
      val lKeyB = BindReferences.bindReference(leftKey, left.output)
      val lTsB = BindReferences.bindReference(leftTs, left.output)
      val rKeyB = BindReferences.bindReference(rightKey, right.output)
      val rTsB = BindReferences.bindReference(rightTs, right.output)
      val rightArity = right.output.size
      val outAttrs = output
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val nullRight = new GenericInternalRow(rightArity)
        val joined = new JoinedRow
        // lookahead on the right stream
        var rNext: InternalRow = if (rIt.hasNext) rIt.next() else null
        var rCur: InternalRow = null // latest right row already consumed
        var rCurKey = 0L
        lIt.map { lRow =>
          val k = lKeyB.eval(lRow).asInstanceOf[Long]
          val t = lTsB.eval(lRow).asInstanceOf[Long]
          var advancing = true
          while (advancing && rNext != null) {
            val nk = rKeyB.eval(rNext).asInstanceOf[Long]
            if (nk < k || (nk == k && rTsB.eval(rNext).asInstanceOf[Long] <= t)) {
              rCur = rNext.copy(); rCurKey = nk
              rNext = if (rIt.hasNext) rIt.next() else null
            } else advancing = false
          }
          val r = if (rCur != null && rCurKey == k) rCur else nullRight
          proj(joined(lRow, r))
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Public API: as-of join `left` with `right` on LongType key/ts columns.
    * Right-side column names must not collide with the left's. Registers
    * the strategy on the session (idempotent). */
  def asofJoinNative(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    if (!spark.experimental.extraStrategies.contains(AsofStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsofStrategy
    val lp = left.queryExecution.analyzed
    val rp = right.queryExecution.analyzed
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"no column $n"))
    val (lk, lt) = (attr(lp, leftKey), attr(lp, leftTs))
    val (rk, rt) = (attr(rp, rightKey), attr(rp, rightTs))
    require(lk.dataType == LongType && lt.dataType == LongType &&
      rk.dataType == LongType && rt.dataType == LongType,
      "asofJoinNative v1 requires LongType key/ts")
    GraftBridge.ofRows(spark, AsofJoinPlan(lp, rp, lk, rk, lt, rt))
  }
}
