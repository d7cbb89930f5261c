package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** As-of (point-in-time) join — the canonical "operator Spark lacks"
  * (guide preference order (a): compose built-ins before writing a custom
  * SparkPlan, and the composition here is fully scalable).
  *
  * Semantics (pandas merge_asof parity): for each left row, attach one
  * right row with the same key —
  *  - `backward` (default): the latest right with right.ts ≤ left.ts
  *  - `forward`: the earliest right with right.ts ≥ left.ts
  *  - `nearest`: whichever of the two is closer (ties → backward)
  * plus an optional `tolerance`: matches farther than `tolerance` in ts
  * units are nulled out (requires a numeric ts column, e.g. epoch-µs).
  *
  * Implementation: tag both sides, union, and take
  * `last(right_payload, ignoreNulls)` over a (key)-partitioned window
  * ordered by (ts, side) — ONE shuffle on the key, no range cross-join,
  * no per-key collect. `forward` is the same window with the order
  * reversed; `nearest` runs both windows over the SAME exchange (two
  * in-partition sorts, still one shuffle). This is exactly how you'd run
  * it over 100 TB: each row shuffles once and the windows are linear
  * scans per key partition.
  */
object AsofOps {

  /** @param leftCols  columns of `left` to carry through (must exist)
    * @param rightCols columns of `right` to attach, nulled when no right
    *                  row matches under `direction`/`tolerance`
    * @param direction "backward" | "forward" | "nearest"
    * @param tolerance max |left.ts − right.ts| for a match to stand, in
    *                  the ts column's own units (numeric ts only) */
  def asofJoin(
      left: DataFrame, right: DataFrame,
      key: String, ts: String,
      leftCols: Seq[String], rightCols: Seq[String],
      direction: String = "backward",
      tolerance: Option[Long] = None): DataFrame = {
    require(Set("backward", "forward", "nearest")(direction),
      s"unknown asof direction: $direction")
    // right ts rides inside the payload so tolerance/nearest can measure
    // the match distance after the window picks it
    val payload = struct((rightCols.map(col) :+ col(ts).as("__rts")): _*)
    val l = left.select(
      (Seq(col(key), col(ts), lit(1).as("__side"), lit(null).cast(
        right.select(payload).schema.head.dataType).as("__payload")) ++
        leftCols.map(col)): _*)
    val r = right.select(
      (Seq(col(key), col(ts), lit(0).as("__side"), payload.as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c))): _*)
    val part = Window.partitionBy(col(key))
    val wBack = part.orderBy(col(ts).asc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val wFwd = part.orderBy(col(ts).desc, col("__side").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    var u = l.unionByName(r)
    if (direction != "forward")
      u = u.withColumn("__b", last(col("__payload"), ignoreNulls = true).over(wBack))
    if (direction != "backward")
      u = u.withColumn("__f", last(col("__payload"), ignoreNulls = true).over(wFwd))
    val joined = u.filter(col("__side") === 1)
    // tolerance is applied PER SIDE before nearest picks a winner
    // (pandas merge_asof parity: when the nearer side is out of
    // tolerance but the other side is within it, the in-tolerance
    // match wins — nulling only after the pick would drop it)
    def within(c: Column): Column = tolerance match {
      case Some(t) => when(abs(col(ts) - c.getField("__rts")) <= t, c)
      case None => c
    }
    val chosen = direction match {
      case "backward" => within(col("__b"))
      case "forward" => within(col("__f"))
      case "nearest" =>
        val b = within(col("__b"))
        val f = within(col("__f"))
        when(b.isNull, f)
          .when(f.isNull, b)
          .when(col(ts) - b.getField("__rts") <= f.getField("__rts") - col(ts), b)
          .otherwise(f)
    }
    val outCols: Seq[Column] =
      (Seq(col(key), col(ts)) ++ leftCols.map(col)) ++
        rightCols.map(c => chosen.getField(c).as(s"asof_$c"))
    joined.select(outCols: _*)
  }
}
