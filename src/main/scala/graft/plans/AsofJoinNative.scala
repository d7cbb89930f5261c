package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Ascending, BindReferences, Expression, GenericInternalRow, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.catalyst.util.TypeUtils
import org.apache.spark.sql.GraftBridge

/** Native as-of join: the full custom-operator tier (SURVEY §7.4 /
  * guide preference (c)) — a logical node, a planner Strategy, and a
  * physical BinaryExecNode that merge-joins two (key, ts)-sorted streams
  * partition-by-partition.
  *
  * Semantics are identical to [[graft.ops.AsofOps.asofJoin]] — backward
  * (latest right with ts ≤ left.ts), forward (earliest right with
  * ts ≥ left.ts), nearest (closer of the two, ties backward), with
  * per-side tolerance; unmatched lefts keep nulls — asserted in
  * AsofNativeSpec and against q80/q90's DuckDB ASOF JOIN oracles. The
  * physical shape differs: instead of
  * unioning both inputs through one window, each side shuffles ONCE on
  * its own key, sorts within partitions, and streams through a constant-
  * memory two-pointer merge — the plan a purpose-built engine would run,
  * with the smaller total sort volume of keeping the sides separate.
  *
  * Key and ts may be any orderable atomic types (interpreted orderings
  * from TypeUtils); rows with null key or ts never match (filtered from
  * the right, null-joined on the left).
  */
object AsofJoinNative {

  /** Logical node; constructed already-resolved from analyzed children. */
  case class AsofJoinPlan(
      left: LogicalPlan, right: LogicalPlan,
      leftKey: Attribute, rightKey: Attribute,
      leftTs: Attribute, rightTs: Attribute,
      direction: String, tolerance: Option[Long]) extends BinaryNode {
    override def output: Seq[Attribute] =
      left.output ++ right.output.map(_.withNullability(true))
    override protected def withNewChildrenInternal(
        newLeft: LogicalPlan, newRight: LogicalPlan): AsofJoinPlan =
      copy(left = newLeft, right = newRight)
  }

  /** Planner strategy: logical → physical. */
  object AsofStrategy extends SparkStrategy {
    override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
      case AsofJoinPlan(l, r, lk, rk, lt, rt, dir, tol) =>
        AsofJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, dir, tol) :: Nil
      case _ => Nil
    }
  }

  case class AsofJoinExec(
      left: SparkPlan, right: SparkPlan,
      leftKey: Expression, rightKey: Expression,
      leftTs: Expression, rightTs: Expression,
      direction: String, tolerance: Option[Long]) extends BinaryExecNode {

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
      val keyOrd = TypeUtils.getInterpretedOrdering(leftKey.dataType)
      val tsOrd = TypeUtils.getInterpretedOrdering(leftTs.dataType)
      val dir = direction
      val tol = tolerance
      left.execute().zipPartitions(right.execute()) { (lIt, rIt) =>
        val proj = UnsafeProjection.create(outAttrs, outAttrs)
        val nullRight = new GenericInternalRow(rightArity)
        val joined = new JoinedRow
        // ts distance only exists for integral/temporal ts (enforced at
        // the API for nearest/tolerance); internal values are Numbers
        @inline def num(v: Any): Long = v.asInstanceOf[Number].longValue
        // lookahead on the right stream; rows with null key/ts are skipped
        def nextRight(): InternalRow = {
          while (rIt.hasNext) {
            val r = rIt.next()
            if (rKeyB.eval(r) != null && rTsB.eval(r) != null) return r
          }
          null
        }
        var rNext: InternalRow = nextRight()
        var rCur: InternalRow = null // latest right row already consumed
        var rCurKey: Any = null
        var rCurTs: Any = null
        lIt.map { lRow =>
          val k = lKeyB.eval(lRow)
          val t = lTsB.eval(lRow)
          if (k == null || t == null) proj(joined(lRow, nullRight))
          else {
            var advancing = true
            while (advancing && rNext != null) {
              val nk = rKeyB.eval(rNext)
              val c = keyOrd.compare(nk, k)
              if (c < 0 || (c == 0 && tsOrd.compare(rTsB.eval(rNext), t) <= 0)) {
                // Re-derive key/ts from the COPIED row: for non-primitive
                // keys (UTF8String, Decimal) `nk` may point into a buffer the
                // upstream sort iterator reuses once we advance past rNext.
                rCur = rNext.copy(); rCurKey = rKeyB.eval(rCur); rCurTs = rTsB.eval(rCur)
                rNext = nextRight()
              } else advancing = false
            }
            // backward candidate: latest consumed right with this key
            val backRow = if (rCur != null && keyOrd.compare(rCurKey, k) == 0) rCur
              else null
            // forward candidate: a consumed right at EXACTLY t (distance 0),
            // else the lookahead row when it still has this key (it is the
            // earliest right with rts > t, by sort order). rNext is safe to
            // emit un-copied: it is projected into the output before the
            // merge ever advances past it.
            val fwdRow =
              if (dir == "backward") null
              else if (backRow != null && tsOrd.compare(rCurTs, t) == 0) backRow
              else if (rNext != null && keyOrd.compare(rKeyB.eval(rNext), k) == 0) rNext
              else null
            val fwdTs: Any =
              if (fwdRow == null) null
              else if (fwdRow eq backRow) rCurTs
              else rTsB.eval(rNext)
            val chosen = dir match {
              case "backward" =>
                if (backRow != null && tol.forall(num(t) - num(rCurTs) <= _)) backRow
                else nullRight
              case "forward" =>
                if (fwdRow != null && tol.forall(num(fwdTs) - num(t) <= _)) fwdRow
                else nullRight
              case _ => // nearest: tolerance per side, smaller distance wins, tie → backward
                val dB = if (backRow == null) -1L else num(t) - num(rCurTs)
                val dF = if (fwdRow == null) -1L else num(fwdTs) - num(t)
                val okB = backRow != null && tol.forall(dB <= _)
                val okF = fwdRow != null && tol.forall(dF <= _)
                if (okB && (!okF || dB <= dF)) backRow
                else if (okF) fwdRow
                else nullRight
            }
            proj(joined(lRow, chosen))
          }
        }
      }
    }

    override protected def withNewChildrenInternal(
        newLeft: SparkPlan, newRight: SparkPlan): AsofJoinExec =
      copy(left = newLeft, right = newRight)
  }

  /** Public API: as-of join `left` with `right`; full
    * [[graft.ops.AsofOps.asofJoin]] parity — backward/forward/nearest
    * plus an optional tolerance (pandas merge_asof semantics: tolerance
    * is applied per side BEFORE nearest picks a winner; ties go
    * backward). Right-side column names must not collide with the
    * left's. Registers the strategy on the session (idempotent).
    * `nearest` and `tolerance` need a ts type with subtraction —
    * integral or temporal. */
  def asofJoinNative(left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown asof direction: $direction")
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
    require(org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(lk.dataType) &&
      org.apache.spark.sql.catalyst.expressions.RowOrdering.isOrderable(lt.dataType) &&
      lk.dataType == rk.dataType && lt.dataType == rt.dataType,
      "asofJoinNative requires matching orderable key/ts types")
    if (direction == "nearest" || tolerance.nonEmpty) {
      import org.apache.spark.sql.types._
      require(Seq(ByteType, ShortType, IntegerType, LongType, DateType,
        TimestampType, TimestampNTZType).contains(lt.dataType),
        "nearest/tolerance need an integral or temporal ts column")
    }
    GraftBridge.ofRows(spark, AsofJoinPlan(lp, rp, lk, rk, lt, rt, direction, tolerance))
  }
}
