package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.Det
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time operators over the `events` table (SURVEY §2.7 extensions):
  * tumbling/sliding time windows, session windows, pivot. These are the
  * batch forms; the identical plans run under Structured Streaming with
  * `withWatermark` (graft.streaming). Window boundaries are exported as
  * epoch-microsecond BIGINTs — timestamp *values* round-trip differently
  * between engines (ns vs µs), µs integers do not.
  */
object EventQueries {

  private val DecV = "decimal(18,2)"

  /** Tumbling 1-hour event-time windows: count + exact sum per window. */
  def tumbling(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    e.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))
      .orderBy(col("win_start_us"), col("event_type"))
  }

  private val tumblingSql =
    s"""SELECT epoch_ns(date_trunc('hour', ts)) // 1000 AS win_start_us,
       |  event_type, COUNT(*) AS n,
       |  ${Det.sqlSum("value")} AS sum_value
       |FROM events
       |GROUP BY 1, 2
       |ORDER BY win_start_us, event_type""".stripMargin

  /** Sliding windows: 1-hour length, 30-minute slide — every event lands
    * in exactly two windows. Oracle reproduces the window assignment by
    * unioning the two candidate starts per event. */
  def sliding(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    e.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("value")).as("sum_value"))
      .select(
        unix_micros(col("window.start")).as("win_start_us"),
        col("n"), col("sum_value"))
      .orderBy(col("win_start_us"))
  }

  private val slidingSql =
    s"""WITH assigned AS (
       |  SELECT epoch_ns(time_bucket(INTERVAL '30 minutes', ts)) // 1000 AS win_start_us,
       |         value
       |  FROM events
       |  UNION ALL
       |  SELECT epoch_ns(time_bucket(INTERVAL '30 minutes', ts) - INTERVAL '30 minutes') // 1000,
       |         value
       |  FROM events
       |)
       |SELECT win_start_us, COUNT(*) AS n, ${Det.sqlSum("value")} AS sum_value
       |FROM assigned
       |GROUP BY 1
       |ORDER BY win_start_us""".stripMargin

  /** Session windows per user with a 5-minute inactivity gap (batch form
    * of session_window; streaming variant in graft.streaming). Session
    * end = last event + gap. */
  def sessions(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    e.groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"), Det.dsum(col("value")).as("sum_value"))
      .select(
        col("user_id"),
        unix_micros(col("session_window.start")).as("sess_start_us"),
        unix_micros(col("session_window.end")).as("sess_end_us"),
        col("n_events"), col("sum_value"))
      .orderBy(col("user_id"), col("sess_start_us"))
  }

  private val sessionsSql =
    s"""WITH t AS (
       |  SELECT user_id, value, epoch_ns(ts) // 1000 AS ts_us,
       |    CASE WHEN epoch_ns(ts) // 1000
       |           - lag(epoch_ns(ts) // 1000) OVER
       |             (PARTITION BY user_id ORDER BY ts, event_id)
       |           >= 300000000
       |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL
       |    THEN 1 ELSE 0 END AS new_sess
       |  FROM events
       |), s AS (
       |  SELECT *, SUM(new_sess) OVER
       |    (PARTITION BY user_id ORDER BY ts_us
       |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
       |  FROM t
       |)
       |SELECT user_id,
       |  MIN(ts_us) AS sess_start_us,
       |  MAX(ts_us) + 300000000 AS sess_end_us,
       |  COUNT(*) AS n_events,
       |  ${Det.sqlSum("value")} AS sum_value
       |FROM s
       |GROUP BY user_id, sess_id
       |ORDER BY user_id, sess_start_us""".stripMargin

  /** Pivot: one column per event_type holding that type's exact sum
    * (absent combinations are NULL in both engines). */
  def pivotTypes(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    e.groupBy(col("user_id"))
      .pivot("event_type", Seq("click", "error", "purchase", "signup", "view"))
      .agg(Det.dsum(col("value")))
      .orderBy(col("user_id"))
  }

  private val pivotTypesSql = {
    def f(t: String) =
      s"""CAST(SUM(CAST(value AS DECIMAL(38,6))) FILTER (event_type = '$t') AS DOUBLE) AS "$t""""
    s"""SELECT user_id,
       |  ${Seq("click", "error", "purchase", "signup", "view").map(f).mkString(",\n  ")}
       |FROM events
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin
  }

  /** Strict-order conversion funnel view → click → purchase: per user,
    * the first view, the first click AT OR AFTER that view, and the
    * first purchase at or after that click — the product-analytics
    * staple. Expressed as CHAINED whole-partition window minima over one
    * user_id partitioning: each stage's condition references the
    * previous stage's window result, so all three dependent minima (and
    * the final per-user collapse) ride a SINGLE hash exchange — no joins
    * anywhere (the naive formulation joins events back per stage and
    * re-shuffles on every widening key; PlanSpec pins this one at one
    * exchange). Times are epoch-µs BIGINTs (cross-engine, like every
    * event query here); `stage` = how far the user got. */
  def funnel(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("view_us",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("click_us",
        min(when(col("event_type") === "click" &&
          col("ts_us") >= col("view_us"), col("ts_us"))).over(w))
      .withColumn("purchase_us",
        min(when(col("event_type") === "purchase" &&
          col("ts_us") >= col("click_us"), col("ts_us"))).over(w))
      .filter(col("view_us").isNotNull) // funnel entry requires a view
      .groupBy(col("user_id"))
      .agg(min(col("view_us")).as("view_us"),
        min(col("click_us")).as("click_us"),
        min(col("purchase_us")).as("purchase_us"))
      .select(col("user_id"), col("view_us"), col("click_us"),
        col("purchase_us"),
        (lit(1) + when(col("click_us").isNotNull, 1).otherwise(0)
          + when(col("purchase_us").isNotNull, 1).otherwise(0)).as("stage"))
      .orderBy(col("user_id"))
  }

  private val funnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
      |), v AS (
      |  SELECT user_id, MIN(ts_us) AS view_us FROM e
      |  WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, v.view_us, MIN(e.ts_us) AS click_us
      |  FROM e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts_us >= v.view_us
      |  GROUP BY 1, 2
      |), p AS (
      |  SELECT e.user_id, c.view_us, c.click_us, MIN(e.ts_us) AS purchase_us
      |  FROM e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts_us >= c.click_us
      |  GROUP BY 1, 2, 3
      |)
      |SELECT v.user_id, v.view_us, c.click_us, p.purchase_us,
      |  1 + CASE WHEN c.click_us IS NOT NULL THEN 1 ELSE 0 END
      |    + CASE WHEN p.purchase_us IS NOT NULL THEN 1 ELSE 0 END AS stage
      |FROM v
      |LEFT JOIN c ON v.user_id = c.user_id AND v.view_us = c.view_us
      |LEFT JOIN p ON v.user_id = p.user_id AND v.view_us = p.view_us
      |  AND c.click_us = p.click_us
      |ORDER BY v.user_id""".stripMargin

  /** Weekly cohort retention: users grouped by first-activity week, then
    * distinct active users counted per (cohort, week offset) — the
    * retention triangle. Week buckets and offsets are exact epoch-µs
    * BIGINT arithmetic (`div` by the 7-day µs constant), so the matrix
    * is engine-identical. Two aggregates + one join, all keyed on
    * user_id / (cohort, offset). */
  def cohortRetention(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"),
        unix_micros(date_trunc("week", col("ts"))).as("wk_us"))
      .distinct()
    val cohorts = e.groupBy(col("user_id")).agg(min(col("wk_us")).as("cohort_us"))
    e.join(cohorts, "user_id")
      .select(col("cohort_us"),
        expr("(wk_us - cohort_us) div 604800000000").as("week_offset"))
      .groupBy(col("cohort_us"), col("week_offset"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("cohort_us"), col("week_offset"))
  }

  private val cohortSql =
    """WITH a AS (
      |  SELECT DISTINCT user_id, epoch_ns(date_trunc('week', ts)) // 1000
      |    AS wk_us
      |  FROM events
      |), f AS (
      |  SELECT user_id, MIN(wk_us) AS cohort_us FROM a GROUP BY 1
      |)
      |SELECT cohort_us, (wk_us - cohort_us) // 604800000000 AS week_offset,
      |  COUNT(*) AS n_users
      |FROM a JOIN f USING (user_id)
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Event-type transition matrix: per-user consecutive event pairs
    * (lag/lead over one user_id window) aggregated to (from, to) counts —
    * the Markov/sankey view of user journeys next to the funnel. One
    * window exchange + one aggregate. */
  def transitions(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("to_type", lead(col("event_type"), 1).over(w))
      .filter(col("to_type").isNotNull)
      .groupBy(col("event_type").as("from_type"), col("to_type"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("from_type"), col("to_type"))
  }

  private val transitionsSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), t AS (
      |  SELECT event_type AS from_type,
      |    lead(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS to_type
      |  FROM e
      |)
      |SELECT from_type, to_type, COUNT(*) AS n
      |FROM t WHERE to_type IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY from_type, to_type""".stripMargin

  /** Latest-wins snapshot per key — the CDC-compaction staple: keep each
    * user's most recent event (rank-1 window, partial WindowGroupLimit
    * keeps the per-partition top-1 before the shuffle). */
  def latestState(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us").desc, col("event_id").desc)
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_id"), col("event_type"),
        col("value"), col("ts_us"))
      .orderBy(col("user_id"))
  }

  private val latestStateSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, value,
      |    epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), r AS (
      |  SELECT *, row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts_us DESC, event_id DESC) AS rn
      |  FROM e
      |)
      |SELECT user_id, event_id, event_type, value, ts_us
      |FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** As-of join: each view event picks up the user's latest prior (or
    * simultaneous) purchase. Oracle: DuckDB's native ASOF LEFT JOIN. */
  def asofViewPurchase(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"),
        col("value").as("purchase_value"))
    graft.ops.AsofOps.asofJoin(
        views, purchases, key = "user_id", ts = "ts_us",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("ts_us", "purchase_value"))
      .withColumnRenamed("asof_ts_us", "purchase_ts_us")
      .withColumnRenamed("asof_purchase_value", "purchase_value")
      .orderBy(col("event_id"))
  }

  private val asofSql =
    """WITH e AS (
      |  SELECT *, epoch_ns(ts) // 1000 AS ts_us FROM events
      |), views AS (
      |  SELECT user_id, ts_us, event_id, value FROM e WHERE event_type = 'view'
      |), purchases AS (
      |  SELECT user_id, ts_us, value AS purchase_value FROM e
      |  WHERE event_type = 'purchase'
      |)
      |SELECT v.user_id, v.ts_us, v.event_id, v.value,
      |  p.ts_us AS purchase_ts_us, p.purchase_value
      |FROM views v
      |ASOF LEFT JOIN purchases p
      |  ON v.user_id = p.user_id AND v.ts_us >= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** Forward as-of: each view attaches the user's NEXT purchase (earliest
    * purchase at-or-after the view) — merge_asof direction="forward".
    * DuckDB's ASOF picks the direction from the inequality's sense. */
  def asofForward(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("ts_us"),
        col("value").as("purchase_value"))
    graft.ops.AsofOps.asofJoin(
        views, purchases, key = "user_id", ts = "ts_us",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("ts_us", "purchase_value"),
        direction = "forward")
      .withColumnRenamed("asof_ts_us", "purchase_ts_us")
      .withColumnRenamed("asof_purchase_value", "purchase_value")
      .orderBy(col("event_id"))
  }

  private val asofForwardSql =
    """WITH e AS (
      |  SELECT *, epoch_ns(ts) // 1000 AS ts_us FROM events
      |), views AS (
      |  SELECT user_id, ts_us, event_id, value FROM e WHERE event_type = 'view'
      |), purchases AS (
      |  SELECT user_id, ts_us, value AS purchase_value FROM e
      |  WHERE event_type = 'purchase'
      |)
      |SELECT v.user_id, v.ts_us, v.event_id, v.value,
      |  p.ts_us AS purchase_ts_us, p.purchase_value
      |FROM views v
      |ASOF LEFT JOIN purchases p
      |  ON v.user_id = p.user_id AND v.ts_us <= p.ts_us
      |ORDER BY event_id""".stripMargin

  /** Banded range join: orders (points in time) against per-supplier
    * activity windows (intervals) as an equi-join on coarse time buckets +
    * residual filter — no theta/cartesian join. Oracle: DuckDB's native
    * non-equi BETWEEN join. */
  def rangeJoinOrders(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val o = Catalog.load(spark, dir, "orders")
    val windows = li.groupBy(col("l_suppkey"))
      .agg(min(datediff(col("l_shipdate").cast("date"), lit("1970-01-01").cast("date")))
        .cast("long").as("lo"))
      .withColumn("hi", col("lo") + 30)
    val points = o.select(
      datediff(col("o_orderdate").cast("date"), lit("1970-01-01").cast("date"))
        .cast("long").as("d"),
      col("o_totalprice"))
    graft.ops.RangeJoinOps.pointInInterval(points, "d", windows, "lo", "hi", bucket = 32L)
      .groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_orders"), Det.dsum(col("o_totalprice")).as("volume"))
      .orderBy(col("l_suppkey"))
  }

  private val rangeJoinSql =
    s"""WITH w AS (
       |  SELECT l_suppkey,
       |    CAST(MIN(CAST(l_shipdate AS DATE) - DATE '1970-01-01') AS BIGINT) AS lo
       |  FROM lineitem GROUP BY 1
       |), p AS (
       |  SELECT CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS d,
       |         o_totalprice
       |  FROM orders
       |)
       |SELECT l_suppkey, COUNT(*) AS n_orders,
       |  ${Det.sqlSum("o_totalprice")} AS volume
       |FROM p JOIN w ON p.d BETWEEN w.lo AND w.lo + 30
       |GROUP BY 1
       |ORDER BY 1""".stripMargin

  /** Same as-of semantics through the custom physical operator
    * (plans/AsofJoinNative: logical node + strategy + BinaryExecNode
    * sort-merge) — shares q80's DuckDB ASOF JOIN oracle. */
  def asofNative(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts_us").as("p_ts_us"),
        col("value").as("purchase_value"))
    graft.plans.AsofJoinNative.asofJoinNative(
        views, purchases, "user_id", "p_user_id", "ts_us", "p_ts_us")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"),
        col("p_ts_us").as("purchase_ts_us"), col("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Forward as-of through the native physical operator — proves the
    * custom-operator tier carries the full direction/tolerance surface
    * of the composed op; shares q90's DuckDB oracle. */
  def asofNativeForward(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts_us").as("p_ts_us"),
        col("value").as("purchase_value"))
    graft.plans.AsofJoinNative.asofJoinNative(
        views, purchases, "user_id", "p_user_id", "ts_us", "p_ts_us",
        direction = "forward")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"),
        col("p_ts_us").as("purchase_ts_us"), col("purchase_value"))
      .orderBy(col("event_id"))
  }

  /** Per-event session ASSIGNMENT (batch): each event gets its user's
    * running session ordinal — new session when the gap from the
    * previous event reaches Streams.GapUs (same gap as the streaming
    * sessionizer). The lag + conditional cumulative-sum idiom: one
    * shuffle on user_id, two window passes over the same sort. The
    * assignment form (vs q47's aggregate-per-session) is what labeling
    * jobs join back onto events. */
  def sessionAssign(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val gap = graft.streaming.Streams.GapUs
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("session_seq",
        sum(when(col("prev").isNull || col("ts_us") - col("prev") >= gap, 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("user_id"), col("event_id"), col("ts_us"), col("session_seq"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  private val sessionAssignSql = {
    val gap = graft.streaming.Streams.GapUs
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events
       |), m AS (
       |  SELECT *, lag(ts_us) OVER (
       |    PARTITION BY user_id ORDER BY ts_us, event_id) AS prev
       |  FROM e
       |)
       |SELECT user_id, event_id, ts_us,
       |  CAST(SUM(CASE WHEN prev IS NULL OR ts_us - prev >= $gap
       |             THEN 1 ELSE 0 END)
       |    OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |          ROWS UNBOUNDED PRECEDING) AS BIGINT) AS session_seq
       |FROM m
       |ORDER BY user_id, ts_us, event_id""".stripMargin
  }

  /** Event-time interval join (batch form of the stream-stream
    * attribution join, Streams.viewPurchaseJoin — StreamsSpec asserts the
    * streaming twin emits the identical set): each view matched to the
    * same user's purchases within the next 10 minutes. */
  def intervalJoin(spark: SparkSession, dir: String): DataFrame =
    graft.streaming.Streams.viewPurchaseJoin(
        Catalog.load(spark, dir, "events"), windowMinutes = 10)
      .orderBy(col("view_id"), col("purchase_id"))

  private val intervalJoinSql =
    """SELECT v.event_id AS view_id, p.event_id AS purchase_id, v.user_id,
      |  epoch_ns(v.ts) // 1000 AS view_us,
      |  epoch_ns(p.ts) // 1000 AS purchase_us,
      |  p.value
      |FROM events v JOIN events p
      |  ON v.event_type = 'view' AND p.event_type = 'purchase'
      |  AND v.user_id = p.user_id
      |  AND epoch_ns(p.ts) // 1000 >= epoch_ns(v.ts) // 1000
      |  AND epoch_ns(p.ts) // 1000 <= epoch_ns(v.ts) // 1000 + 600000000
      |ORDER BY view_id, purchase_id""".stripMargin

  /** First/last-touch attribution: each purchase credited to the user's
    * earliest and latest PRECEDING non-purchase events. The preceding
    * touch is found with plain min/max windows over a BIGINT encoding
    * (row ordinal ×8 + touch-type index): SQL min/max skip NULLs on
    * every engine, which sidesteps the engine-specific
    * `last_value IGNORE NULLS` window syntax entirely. One shuffle on
    * user_id; decode back to the type name on output. */
  def attribution(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val idx = expr("CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1 " +
      "WHEN 'signup' THEN 2 WHEN 'view' THEN 3 END")
    def decode(c: org.apache.spark.sql.Column) = {
      val m = pmod(c, lit(8L)) // enc ≥ 0, so pmod == the oracle's %
      when(m === 0, "click").when(m === 1, "error")
        .when(m === 2, "signup").when(m === 3, "view")
    }
    val pre = w.rowsBetween(Window.unboundedPreceding, -1)
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("enc",
        when(col("event_type") =!= "purchase", col("rn") * 8 + idx))
      .withColumn("first_enc", min(col("enc")).over(pre))
      .withColumn("last_enc", max(col("enc")).over(pre))
      .withColumn("n_touches", count(col("enc")).over(pre))
      .filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"),
        decode(col("first_enc")).as("first_touch"),
        decode(col("last_enc")).as("last_touch"),
        col("n_touches"))
      .orderBy(col("event_id"))
  }

  private val attributionSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000 AS ts_us FROM events
      |), r AS (
      |  SELECT *, CAST(row_number() OVER (
      |      PARTITION BY user_id ORDER BY ts_us, event_id) AS BIGINT) AS rn
      |  FROM e
      |), enc AS (
      |  SELECT *, CASE WHEN event_type <> 'purchase' THEN rn * 8 +
      |    CASE event_type WHEN 'click' THEN 0 WHEN 'error' THEN 1
      |         WHEN 'signup' THEN 2 WHEN 'view' THEN 3 END END AS enc
      |  FROM r
      |), att AS (
      |  SELECT *,
      |    MIN(enc) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS first_enc,
      |    MAX(enc) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS last_enc,
      |    CAST(COUNT(enc) OVER (PARTITION BY user_id ORDER BY ts_us, event_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS BIGINT)
      |      AS n_touches
      |  FROM enc
      |)
      |SELECT event_id, user_id,
      |  CASE first_enc % 8 WHEN 0 THEN 'click' WHEN 1 THEN 'error'
      |       WHEN 2 THEN 'signup' WHEN 3 THEN 'view' END AS first_touch,
      |  CASE last_enc % 8 WHEN 0 THEN 'click' WHEN 1 THEN 'error'
      |       WHEN 2 THEN 'signup' WHEN 3 THEN 'view' END AS last_touch,
      |  n_touches
      |FROM att
      |WHERE event_type = 'purchase'
      |ORDER BY event_id""".stripMargin

  /** Time-weighted average value per user (TWAP): each event's value
    * holds until the user's next event, so its weight is that gap in
    * epoch-µs (the last event carries no weight — its holding period is
    * unobserved). Durations are exact BIGINTs; the value·duration
    * products sum through the decimal recipe, one final IEEE division.
    * One user_id exchange for the lead window and the aggregate. */
  def twap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    import graft.ops.Det
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("value"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("dur", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("dur").isNotNull)
      .groupBy(col("user_id"))
      // cast value to decimal BEFORE the multiply: decimal × bigint is
      // exact, so the engines can't disagree on a rounded double product
      .agg(sum(col("value").cast(Det.Dec) * col("dur"))
        .cast("double").as("vw"),
        sum(col("dur")).as("total_us"))
      .select(col("user_id"),
        (col("vw") / col("total_us").cast("double")).as("twap"),
        col("total_us"))
      .orderBy(col("user_id"))
  }

  private val twapSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, value,
       |    epoch_ns(ts) // 1000 AS ts_us FROM events
       |), d AS (
       |  SELECT user_id, value,
       |    lead(ts_us) OVER (PARTITION BY user_id
       |      ORDER BY ts_us, event_id) - ts_us AS dur
       |  FROM e
       |)
       |SELECT user_id,
       |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6)) * dur) AS VARCHAR)
       |    AS DOUBLE) /
       |    CAST(CAST(SUM(dur) AS BIGINT) AS DOUBLE) AS twap,
       |  CAST(SUM(dur) AS BIGINT) AS total_us
       |FROM d WHERE dur IS NOT NULL
       |GROUP BY user_id
       |ORDER BY user_id""".stripMargin

  /** SCD-2 intervalization: compress each user's event stream into
    * validity intervals of its event_type "state" — rows where the state
    * changes open an interval (`valid_from_us`), closed by the next
    * change (`valid_to_us`, NULL while current), with a per-user version
    * ordinal. The warehouse history-table build (CDC → slowly-changing
    * dimension type 2); q118 is its SCD-1 (latest-wins) sibling. Single
    * user_id exchange shared by both window passes. */
  def scd2(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val changes = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag(col("event_type"), 1).over(ordered))
      .filter(not(col("prev") <=> col("event_type")))
    changes
      .withColumn("version", row_number().over(ordered).cast("long"))
      .withColumn("valid_to_us", lead(col("ts_us"), 1).over(ordered))
      .select(col("user_id"), col("version"),
        col("event_type").as("state"),
        col("ts_us").as("valid_from_us"), col("valid_to_us"))
      .orderBy(col("user_id"), col("version"))
  }

  private val scd2Sql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000 AS ts_us,
      |    lag(event_type) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
      |  FROM events
      |), ch AS (
      |  SELECT * FROM e WHERE prev IS DISTINCT FROM event_type
      |)
      |SELECT user_id,
      |  CAST(row_number() OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS BIGINT) AS version,
      |  event_type AS state,
      |  ts_us AS valid_from_us,
      |  lead(ts_us) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS valid_to_us
      |FROM ch
      |ORDER BY user_id, version""".stripMargin

  /** Exact trailing-7-day distinct users per day. The day spine is tiny
    * (one row per distinct day), so Spark broadcasts it and the range
    * join never shuffles the fact side by anything but its day — each
    * (day, user) pair fans out to ≤ 7 spine days, the bounded-expansion
    * form of windowed COUNT DISTINCT (which no sliding frame can do
    * exactly). */
  def rollingDistinct(spark: SparkSession, dir: String): DataFrame = {
    val du = Catalog.load(spark, dir, "events")
      .select(to_date(col("ts")).as("day"), col("user_id"))
      .filter(col("day").isNotNull)
      .distinct()
    val spine = du.select(col("day").as("d")).distinct()
    du.join(broadcast(spine), datediff(col("d"), col("day")).between(0, 6))
      .groupBy(col("d"))
      .agg(countDistinct(col("user_id")).as("users_7d"),
        countDistinct(when(col("day") === col("d"), col("user_id")))
          .as("users_1d"))
      .select(datediff(col("d"), lit("2024-01-01").cast("date"))
          .cast("long").as("day_idx"),
        date_format(col("d"), "yyyy-MM-dd").as("day"),
        col("users_7d"), col("users_1d"))
      .orderBy(col("day_idx"))
  }

  private val rollingDistinctSql =
    """WITH du AS (
      |  SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events
      |  WHERE ts IS NOT NULL
      |), spine AS (
      |  SELECT DISTINCT day AS d FROM du
      |)
      |SELECT CAST(d - DATE '2024-01-01' AS BIGINT) AS day_idx,
      |  strftime(d, '%Y-%m-%d') AS day,
      |  CAST(COUNT(DISTINCT u.user_id) AS BIGINT) AS users_7d,
      |  CAST(COUNT(DISTINCT u.user_id)
      |    FILTER (u.day = s.d) AS BIGINT) AS users_1d
      |FROM spine s JOIN du u ON u.day BETWEEN s.d - 6 AND s.d
      |GROUP BY s.d
      |ORDER BY day_idx""".stripMargin

  /** MAD-based robust outlier profile per event_type: median, median
    * absolute deviation, and the count beyond 3·MAD. The robust twin of
    * q136's z-score scan — MAD shrugs off the very outliers that inflate
    * a standard deviation. Two grouped exact-median passes; the per-type
    * stats frame (5 rows) broadcasts back for the outlier count. */
  def madOutliers(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("event_type"), col("value"))
    val med = e.groupBy(col("event_type"))
      .agg(median(col("value")).as("med"))
    val dev = e.join(broadcast(med), Seq("event_type"))
      .withColumn("adev", abs(col("value") - col("med")))
    val stats = dev.groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), median(col("adev")).as("mad"))
    dev.select(col("event_type"), col("adev"))
      .join(broadcast(stats), Seq("event_type"))
      .groupBy(col("event_type"))
      .agg(max(col("med")).as("med"), max(col("mad")).as("mad"),
        count(when(col("adev") > lit(3.0) * col("mad"), lit(1)))
          .as("n_outliers"),
        count(lit(1)).as("n"))
      .orderBy(col("event_type"))
  }

  private val madOutliersSql =
    """WITH med AS (
      |  SELECT event_type, median(value) AS med FROM events GROUP BY 1
      |), dev AS (
      |  SELECT e.event_type, abs(e.value - m.med) AS adev, m.med
      |  FROM events e JOIN med m USING (event_type)
      |), st AS (
      |  SELECT event_type, max(med) AS med, median(adev) AS mad
      |  FROM dev GROUP BY 1
      |)
      |SELECT d.event_type, max(s.med) AS med, max(s.mad) AS mad,
      |  CAST(COUNT(*) FILTER (d.adev > 3.0 * s.mad) AS BIGINT)
      |    AS n_outliers,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM dev d JOIN st s USING (event_type)
      |GROUP BY d.event_type
      |ORDER BY d.event_type""".stripMargin

  /** Per-type OLS trend (closed form): slope/intercept of value against
    * hours-since-2024-01-01, from one aggregate pass of exact moments —
    * Σx, Σx² as BIGINTs, Σy, Σxy through the decimal-sum recipe — then
    * a single mirrored double evaluation of
    * `(n·Σxy − Σx·Σy) / (n·Σx² − Σx·Σx)`. Exact sums make the final
    * doubles engine-identical; the x offset keeps every product far
    * inside both 2⁵³ and the decimal range. */
  def trend(spark: SparkSession, dir: String): DataFrame = {
    val startUs = 1704067200000000L // 2024-01-01T00:00:00Z
    val e = Catalog.load(spark, dir, "events")
      .filter(col("ts").isNotNull && col("value").isNotNull)
      .select(col("event_type"),
        expr(s"(unix_micros(ts) - ${startUs}L) div 3600000000L").as("x"),
        col("value"))
    e.groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"),
        sum(col("x") * col("x")).as("sxx"),
        Det.dsum(col("value")).as("sy"),
        Det.dsum(col("x").cast("double") * col("value")).as("sxy"))
      .withColumn("slope",
        (col("n").cast("double") * col("sxy")
          - col("sx").cast("double") * col("sy")) /
          (col("n").cast("double") * col("sxx").cast("double")
            - col("sx").cast("double") * col("sx").cast("double")))
      .withColumn("intercept",
        (col("sy") - col("slope") * col("sx").cast("double")) /
          col("n").cast("double"))
      .select(col("event_type"), col("n"), col("slope"), col("intercept"))
      .orderBy(col("event_type"))
  }

  private val trendSql = {
    val sy = Det.sqlSum("value")
    val sxy = Det.sqlSum("CAST(x AS DOUBLE) * value")
    """WITH e AS (
      |  SELECT event_type,
      |    (epoch_ns(ts) // 1000 - 1704067200000000) // 3600000000 AS x,
      |    value
      |  FROM events WHERE ts IS NOT NULL AND value IS NOT NULL
      |), m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    SY AS sy,
      |    SXY AS sxy
      |  FROM e GROUP BY 1
      |)
      |SELECT event_type, n,
      |  (CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) AS slope,
      |  (sy - ((CAST(n AS DOUBLE) * sxy - CAST(sx AS DOUBLE) * sy) /
      |    (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
      |      - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)))
      |    * CAST(sx AS DOUBLE)) / CAST(n AS DOUBLE) AS intercept
      |FROM m
      |ORDER BY event_type""".stripMargin
      .replace("SY", sy).replace("SXY", sxy)
  }

  /** Forward-fill (LOCF): each event carries the most recent non-error
    * value at-or-before it for its user. `last(_, ignoreNulls)` over an
    * explicit ROWS running frame is the distributed gap-fill primitive —
    * one user_id exchange + sort-within-partition, no self-join, no
    * collect, and the frame never buffers more than the frame head. The
    * filled value passes through unchanged (no arithmetic), so
    * cross-engine equality is structural. */
  def forwardFill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"),
        when(col("event_type") =!= "error", col("value")).as("v"))
      .withColumn("filled", last(col("v"), ignoreNulls = true).over(w))
      .select(col("user_id"), col("ts_us"), col("event_id"), col("filled"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  private val forwardFillSql =
    """SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
      |  LAST_VALUE(CASE WHEN event_type <> 'error' THEN value END IGNORE NULLS)
      |    OVER (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id
      |          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled
      |FROM events
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** Finite-horizon EWMA with dyadic weights 8/4/2/1 over the last four
    * events per user. Dyadic weights make every product IEEE-exact and
    * the fixed-shape left-to-right sum evaluates identically on both
    * engines; missing lags drop out of the numerator (COALESCE 0) and the
    * divisor (conditional weight) together. One window exchange, three
    * lags riding the same sort. */
  def ewma(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("value"))
      .withColumn("v1", lag(col("value"), 1).over(w))
      .withColumn("v2", lag(col("value"), 2).over(w))
      .withColumn("v3", lag(col("value"), 3).over(w))
      .select(col("user_id"), col("ts_us"), col("event_id"),
        ((col("value") * lit(8.0)
          + coalesce(col("v1"), lit(0.0)) * lit(4.0)
          + coalesce(col("v2"), lit(0.0)) * lit(2.0)
          + coalesce(col("v3"), lit(0.0)))
          / (lit(8)
            + when(col("v1").isNotNull, 4).otherwise(0)
            + when(col("v2").isNotNull, 2).otherwise(0)
            + when(col("v3").isNotNull, 1).otherwise(0)).cast("double"))
          .as("ewma"))
      .orderBy(col("user_id"), col("ts_us"), col("event_id"))
  }

  private val ewmaSql =
    """WITH l AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id, value,
      |    lag(value, 1) OVER w AS v1,
      |    lag(value, 2) OVER w AS v2,
      |    lag(value, 3) OVER w AS v3
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id
      |               ORDER BY epoch_ns(ts) // 1000, event_id)
      |)
      |SELECT user_id, ts_us, event_id,
      |  (value * 8.0 + COALESCE(v1, 0.0) * 4.0
      |   + COALESCE(v2, 0.0) * 2.0 + COALESCE(v3, 0.0))
      |  / CAST(8 + CASE WHEN v1 IS NOT NULL THEN 4 ELSE 0 END
      |           + CASE WHEN v2 IS NOT NULL THEN 2 ELSE 0 END
      |           + CASE WHEN v3 IS NOT NULL THEN 1 ELSE 0 END AS DOUBLE)
      |  AS ewma
      |FROM l
      |ORDER BY user_id, ts_us, event_id""".stripMargin

  /** Per-user modal event type (grouped MODE with a deterministic
    * lexicographic tie-break — engine mode() builtins break ties
    * arbitrarily, so they can't be hash-compared). Count aggregate +
    * top-1 window on the already-aggregated (user, type) table: the
    * window input is ≤ |users|·|types| rows, never the raw events. */
  def modeType(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    Catalog.load(spark, dir, "events")
      .filter(col("event_type").isNotNull)
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("n"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("user_id"))
          .orderBy(col("n").desc, col("event_type"))))
      .filter(col("rn") === 1)
      .select(col("user_id"), col("event_type").as("mode_type"), col("n"))
      .orderBy(col("user_id"))
  }

  private val modeTypeSql =
    """WITH c AS (
      |  SELECT user_id, event_type, COUNT(*) AS n
      |  FROM events WHERE event_type IS NOT NULL
      |  GROUP BY 1, 2
      |), r AS (
      |  SELECT user_id, event_type, n,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |                       ORDER BY n DESC, event_type) AS rn
      |  FROM c
      |)
      |SELECT user_id, event_type AS mode_type, n
      |FROM r WHERE rn = 1
      |ORDER BY user_id""".stripMargin

  /** Dwell time: per event type, exact median/p90 of the µs gap to the
    * user's NEXT event (lead window) — the engagement-latency profile.
    * Gaps are exact BIGINT µs; percentiles by explicit rank selection
    * ([[graft.ops.StatsOps.rankPercentiles]]) so both engines pick the
    * same elements. Two window exchanges (user_id, then event_type). */
  def dwellTime(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gaps = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("gap_us", lead(col("ts_us"), 1).over(w) - col("ts_us"))
      .filter(col("gap_us").isNotNull && col("event_type").isNotNull)
    graft.ops.StatsOps
      .rankPercentiles(gaps, col("event_type"), col("gap_us"), col("event_id"))
      .withColumnRenamed("k", "event_type")
      .orderBy(col("event_type"))
  }

  private val dwellTimeSql =
    """WITH g AS (
      |  SELECT event_type,
      |    lead(epoch_ns(ts) // 1000, 1) OVER
      |      (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000, event_id)
      |      - epoch_ns(ts) // 1000 AS gap_us,
      |    event_id
      |  FROM events
      |), r AS (
      |  SELECT event_type, gap_us,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |                       ORDER BY gap_us, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM g WHERE gap_us IS NOT NULL AND event_type IS NOT NULL
      |)
      |SELECT event_type, MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN gap_us END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN gap_us END) AS p90
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Chi-square independence scan of event_type × hour-of-day — the
    * drift/association test behind data-quality monitors (is traffic mix
    * time-dependent?). Observed/expected from one contingency aggregate +
    * whole-table window totals; each cell's (o−e)²∕e is a mirrored IEEE
    * evaluation over exact BIGINT totals, and the per-type cell sum runs
    * through the decimal-cast recipe so partitioning can't reorder it. */
  def chiSquare(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val cells = Catalog.load(spark, dir, "events")
      .filter(col("event_type").isNotNull && col("ts").isNotNull)
      .groupBy(col("event_type"), hour(col("ts")).as("hr"))
      .agg(count(lit(1)).as("o"))
    val withTotals = cells
      .withColumn("rt", sum(col("o")).over(Window.partitionBy(col("event_type"))))
      .withColumn("ct", sum(col("o")).over(Window.partitionBy(col("hr"))))
      .withColumn("n", sum(col("o")).over(Window.partitionBy()))
    withTotals
      .withColumn("e",
        col("rt").cast("double") * col("ct").cast("double") / col("n").cast("double"))
      .withColumn("term",
        (col("o").cast("double") - col("e")) * (col("o").cast("double") - col("e"))
          / col("e"))
      .groupBy(col("event_type"))
      .agg(max(col("rt")).as("n_row"),
        count(lit(1)).as("n_cells"),
        Det.dsum(col("term")).as("chi2_part"))
      .orderBy(col("event_type"))
  }

  private val chiSquareSql = {
    val term = Det.sqlSum("term")
    s"""WITH c AS (
       |  SELECT event_type, EXTRACT(hour FROM ts) AS hr, COUNT(*) AS o
       |  FROM events WHERE event_type IS NOT NULL AND ts IS NOT NULL
       |  GROUP BY 1, 2
       |), t AS (
       |  SELECT event_type, hr, o,
       |    SUM(o) OVER (PARTITION BY event_type) AS rt,
       |    SUM(o) OVER (PARTITION BY hr) AS ct,
       |    SUM(o) OVER () AS n
       |  FROM c
       |), x AS (
       |  SELECT event_type, rt,
       |    (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
       |    * (CAST(o AS DOUBLE) - CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE))
       |    / (CAST(rt AS DOUBLE) * CAST(ct AS DOUBLE) / CAST(n AS DOUBLE)) AS term
       |  FROM t
       |)
       |SELECT event_type, CAST(MAX(rt) AS BIGINT) AS n_row,
       |  COUNT(*) AS n_cells, $term AS chi2_part
       |FROM x
       |GROUP BY event_type
       |ORDER BY event_type""".stripMargin
  }

  /** Day-over-day revenue change: exact decimal daily sums from orders,
    * then a lag window and ONE mirrored double division for the percent
    * change — period-over-period reporting with no engine-specific
    * rounding. Day buckets are epoch-µs BIGINTs like every event query
    * here. */
  def popChange(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate"))).as("day_us"))
      .agg(Det.dsum(col("o_totalprice")).as("revenue"))
    daily
      .withColumn("prev", lag(col("revenue"), 1).over(
        Window.partitionBy().orderBy(col("day_us"))))
      .select(col("day_us"), col("revenue"),
        ((col("revenue") - col("prev")) / col("prev") * lit(100.0))
          .as("pct_change"))
      .orderBy(col("day_us"))
  }

  private val popChangeSql = {
    val rev = Det.sqlSum("o_totalprice")
    s"""WITH d AS (
       |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000 AS day_us,
       |    $rev AS revenue
       |  FROM orders WHERE o_orderdate IS NOT NULL
       |  GROUP BY 1
       |)
       |SELECT day_us, revenue,
       |  (revenue - lag(revenue, 1) OVER (ORDER BY day_us))
       |    / lag(revenue, 1) OVER (ORDER BY day_us) * 100.0 AS pct_change
       |FROM d
       |ORDER BY day_us""".stripMargin
  }

  /** CUSUM drift detection over the daily-revenue series. The textbook
    * recursion S_t = max(0, S_(t-1) + (x_t - mean)) is not a SQL window
    * function, but it has a closed drawdown form: with c_t the running
    * sum of deviations, S_t = c_t - min(0, min_(i<=t) c_i) (and the
    * downward arm T_t = max(0, max_(i<=t) c_i) - c_t) — two ordinary
    * prefix windows. Everything stays in exact integers: revenues as
    * BIGINT cents, deviations scaled by n (dev = n*x - total) so the
    * mean never becomes a quotient. A day drifts when the upward arm
    * exceeds five mean-days, i.e. scaled CUSUM > 5*total — an integer
    * compare, so both engines flag the identical days. The series is one
    * row per day (bounded at any corpus scale), so the single-partition
    * ordering window is safe; the heavy work — reducing order lines to
    * daily cents — is an ordinary distributed aggregate. */
  def cusum(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate"))).as("day_us"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
    val stats = daily.agg(count(lit(1)).as("n_days"),
      sum(col("rev_c")).as("total_c"))
    val ord = Window.partitionBy().orderBy(col("day_us"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.crossJoin(broadcast(stats))
      .withColumn("dev", col("n_days") * col("rev_c") - col("total_c"))
      .withColumn("c", sum(col("dev")).over(ord))
      .select(col("day_us"), col("rev_c"),
        (col("c") - least(lit(0L), min(col("c")).over(ord))).as("cusum_up"),
        (greatest(lit(0L), max(col("c")).over(ord)) - col("c")).as("cusum_down"),
        (col("c") - least(lit(0L), min(col("c")).over(ord)) >
          lit(5L) * col("total_c")).as("drifted"))
      .orderBy(col("day_us"))
  }

  private val cusumSql =
    """WITH daily AS (
      |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000 AS day_us,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1
      |), st AS (
      |  SELECT COUNT(*) AS n_days, CAST(SUM(rev_c) AS BIGINT) AS total_c
      |  FROM daily
      |), c AS (
      |  SELECT day_us, rev_c, total_c,
      |    CAST(SUM(n_days * rev_c - total_c) OVER
      |      (ORDER BY day_us ROWS UNBOUNDED PRECEDING) AS BIGINT) AS c
      |  FROM daily, st
      |)
      |SELECT day_us, rev_c,
      |  c - LEAST(0, CAST(MIN(c) OVER (ORDER BY day_us ROWS UNBOUNDED
      |    PRECEDING) AS BIGINT)) AS cusum_up,
      |  GREATEST(0, CAST(MAX(c) OVER (ORDER BY day_us ROWS UNBOUNDED
      |    PRECEDING) AS BIGINT)) - c AS cusum_down,
      |  c - LEAST(0, CAST(MIN(c) OVER (ORDER BY day_us ROWS UNBOUNDED
      |    PRECEDING) AS BIGINT)) > 5 * total_c AS drifted
      |FROM c
      |ORDER BY day_us""".stripMargin

  /** Seasonality-adjusted revenue outliers: each day is compared against
    * the exact median of ITS weekday (day-of-week from pure epoch-day
    * integer arithmetic — `(epoch_day + 4) mod 7`, Sunday=0; never an
    * engine-specific dayofweek whose origin differs), and flagged when
    * the residual exceeds 3× that weekday's MAD. The robust twin of
    * q136's z-scores with q142's MAD machinery, answering the question
    * those can't: "is this Monday low FOR A MONDAY?" All heavy work is
    * the one daily-cents aggregate; the weekday stats are 7 rows,
    * broadcast back. */
  def seasonalOutliers(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate"))).as("day_us"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      .withColumn("dow",
        pmod(expr("day_us div 86400000000") + lit(4L), lit(7L)))
    val med = daily.groupBy(col("dow")).agg(median(col("rev_c")).as("med"))
    val resid = daily.join(broadcast(med), Seq("dow"))
      .withColumn("resid", col("rev_c") - col("med"))
    val mad = resid.groupBy(col("dow"))
      .agg(median(abs(col("resid"))).as("mad"))
    resid.join(broadcast(mad), Seq("dow"))
      .select(col("day_us"), col("dow"), col("rev_c"), col("resid"),
        (abs(col("resid")) > lit(3.0) * col("mad")).as("is_outlier"))
      .orderBy(col("day_us"))
  }

  private val seasonalOutliersSql =
    """WITH daily AS (
      |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000 AS day_us,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1
      |), d AS (
      |  SELECT day_us, rev_c,
      |    (day_us // 86400000000 + 4) % 7 AS dow
      |  FROM daily
      |), med AS (
      |  SELECT dow, median(rev_c) AS med FROM d GROUP BY 1
      |), r AS (
      |  SELECT d.day_us, d.dow, d.rev_c, d.rev_c - m.med AS resid
      |  FROM d JOIN med m USING (dow)
      |), mad AS (
      |  SELECT dow, median(abs(resid)) AS mad FROM r GROUP BY 1
      |)
      |SELECT r.day_us, r.dow, r.rev_c, r.resid,
      |  abs(r.resid) > 3.0 * mad.mad AS is_outlier
      |FROM r JOIN mad USING (dow)
      |ORDER BY r.day_us""".stripMargin

  /** NEGATIVE-pattern funnel: users whose first view converts to a
    * purchase with NO error event in between — the exclusion constraint
    * ("A then B without C between") that positive-match funnels (q111,
    * q198) cannot express and that real journey analysis always needs
    * (did checkout succeed CLEANLY?). Three user-keyed conditional
    * aggregates chained by time bounds — no event self-join, no
    * per-event window: stage 1 pins the first view, stage 2 the first
    * purchase after it, stage 3 counts errors strictly between. All
    * epoch-µs integers. */
  def cleanPathConversion(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .localCheckpoint(false) // three bounded re-joins below
    val tv = ev.filter(col("event_type") === "view")
      .groupBy(col("user_id")).agg(min(col("ts_us")).as("tv_us"))
    val tp = ev.filter(col("event_type") === "purchase")
      .join(tv, "user_id")
      .filter(col("ts_us") > col("tv_us"))
      .groupBy(col("user_id"), col("tv_us"))
      .agg(min(col("ts_us")).as("tp_us"))
    val err = ev.filter(col("event_type") === "error")
      .join(tp, "user_id")
      .filter(col("ts_us") > col("tv_us") && col("ts_us") < col("tp_us"))
      .groupBy(col("user_id")).agg(count(lit(1)).as("n_err"))
    tp.join(err, Seq("user_id"), "left")
      .select(col("user_id"), col("tv_us"), col("tp_us"),
        coalesce(col("n_err"), lit(0L)).as("n_errors_between"),
        (coalesce(col("n_err"), lit(0L)) === 0L).as("clean"))
      .orderBy(col("user_id"))
  }

  private val cleanPathConversionSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), tv AS (
      |  SELECT user_id, MIN(ts_us) AS tv_us FROM ev
      |  WHERE event_type = 'view' GROUP BY 1
      |), tp AS (
      |  SELECT e.user_id, tv.tv_us, MIN(e.ts_us) AS tp_us
      |  FROM ev e JOIN tv ON e.user_id = tv.user_id
      |  WHERE e.event_type = 'purchase' AND e.ts_us > tv.tv_us
      |  GROUP BY 1, 2
      |), err AS (
      |  SELECT e.user_id, CAST(COUNT(*) AS BIGINT) AS n_err
      |  FROM ev e JOIN tp ON e.user_id = tp.user_id
      |  WHERE e.event_type = 'error'
      |    AND e.ts_us > tp.tv_us AND e.ts_us < tp.tp_us
      |  GROUP BY 1
      |)
      |SELECT tp.user_id, tp.tv_us, tp.tp_us,
      |  COALESCE(err.n_err, 0) AS n_errors_between,
      |  COALESCE(err.n_err, 0) = 0 AS clean
      |FROM tp LEFT JOIN err ON tp.user_id = err.user_id
      |ORDER BY tp.user_id""".stripMargin

  /** SAX symbolic discretization of the daily-revenue series (Lin et
    * al. 2003, robust variant): each day's revenue is normalized by the
    * series MEDIAN/MAD (exact rank-selected cents — unlike µ/σ the
    * inputs stay exactly-representable doubles, so the one mirrored
    * division per day is engine-exact), cut at the standard 4-symbol
    * breakpoints (±0.6745, 0), and the per-epoch-week symbols assemble
    * into SAX WORDS via ordered listagg — the discrete alphabet that
    * turns motif/novelty search over a 10⁹-point series into string
    * matching. One daily aggregate, one broadcast 1-row stats join, one
    * week rollup. */
  def saxWords(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate"))).as("day_us"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
    val med = daily.agg(median(col("rev_c")).as("med"))
    val mad = daily.crossJoin(broadcast(med))
      .agg(median(abs(col("rev_c") - col("med"))).as("mad"),
        first(col("med")).as("med"))
    daily.crossJoin(broadcast(mad))
      .selectExpr("day_us", "rev_c",
        "(rev_c - med) / (1.4826 * mad) AS z")
      .selectExpr("day_us",
        """CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
          |     WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym""".stripMargin)
      .groupBy(expr("day_us div 604800000000").as("epoch_week"))
      .agg(count(lit(1)).as("n_days"),
        expr("listagg(sym, '') WITHIN GROUP (ORDER BY day_us)")
          .as("sax_word"))
      .orderBy(col("epoch_week"))
  }

  private val saxWordsSql =
    """WITH daily AS (
      |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000 AS day_us,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1
      |), st AS (
      |  SELECT median(rev_c) AS med FROM daily
      |), st2 AS (
      |  SELECT st.med, median(abs(d.rev_c - st.med)) AS mad
      |  FROM daily d CROSS JOIN st GROUP BY st.med
      |), z AS (
      |  SELECT day_us, (rev_c - med) / (1.4826 * mad) AS z
      |  FROM daily CROSS JOIN st2
      |), s AS (
      |  SELECT day_us,
      |    CASE WHEN z < -0.6745 THEN 'a' WHEN z < 0.0 THEN 'b'
      |         WHEN z < 0.6745 THEN 'c' ELSE 'd' END AS sym
      |  FROM z
      |)
      |SELECT day_us // 604800000000 AS epoch_week,
      |  CAST(COUNT(*) AS BIGINT) AS n_days,
      |  string_agg(sym, '' ORDER BY day_us) AS sax_word
      |FROM s
      |GROUP BY 1
      |ORDER BY epoch_week""".stripMargin

  /** Wilson-score lower bound on the hourly purchase rate — the
    * ranking-safe conversion metric (a 3-of-5 hour never outranks a
    * 300-of-500 hour, which the raw rate allows). The bound's algebra is
    * ONE SHARED FORMULA STRING between the Spark plan and the oracle
    * ([[wilsonExpr]]): every literal (1.96, 3.8416) parses to the same
    * double via correctly-rounded strtod in both engines, and +,*,/ and
    * sqrt are all IEEE correctly-rounded single ops, so identical text =
    * identical 64-bit results — no decimal detour needed even though the
    * expression nests nine float ops. Inputs are exact integer counts
    * from one partial→final aggregate; hour-of-day comes from pure
    * epoch-µs arithmetic (no engine hour() origin/timezone skew). */
  def wilsonCtr(spark: SparkSession, dir: String): DataFrame = {
    val hourly = Catalog.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .groupBy(pmod(expr("unix_micros(ts) div 3600000000"), lit(24L)).as("h"))
      .agg(count(lit(1)).as("n"),
        count(when(col("event_type") === "purchase", 1)).as("c"))
    hourly
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("wilson_lo", expr(wilsonExpr))
      .orderBy(col("h"))
  }

  /** Shared Spark/DuckDB formula text — see [[wilsonCtr]]. */
  private val wilsonExpr =
    "(p + 3.8416 / (2 * n) - 1.96 * sqrt(p * (1 - p) / n" +
      " + 3.8416 / (4 * n * n))) / (1 + 3.8416 / n)"

  private val wilsonCtrSql =
    s"""WITH hourly AS (
       |  SELECT (epoch_ns(ts) // 1000 // 3600000000) % 24 AS h,
       |    COUNT(*) AS n,
       |    CAST(COUNT(*) FILTER (event_type = 'purchase') AS BIGINT) AS c
       |  FROM events WHERE ts IS NOT NULL
       |  GROUP BY 1
       |), r AS (
       |  SELECT h, n, c, CAST(c AS DOUBLE) / n AS p FROM hourly
       |)
       |SELECT h, n, c, p,
       |  $wilsonExpr AS wilson_lo
       |FROM r
       |ORDER BY h""".stripMargin

  /** Funnel drop-off table: q111's strict-order per-user stages reduced
    * to three step rows with users-remaining and conversion-from-previous
    * (nullif-guarded mirrored divisions — empty inputs yield empty, a
    * zero step yields NULL on both engines, never an ANSI error). The
    * per-user funnel is the only data-sized work; the step table is a
    * projection of one aggregate row. */
  def funnelDropoff(spark: SparkSession, dir: String): DataFrame = {
    // lazy checkpoint: the three step projections reuse ONE computed
    // aggregate row instead of re-running the funnel per step
    val agg = funnel(spark, dir).agg(
      count(lit(1)).as("n1"),
      count(col("click_us")).as("n2"),
      count(col("purchase_us")).as("n3")).localCheckpoint(false)
    def pct(num: org.apache.spark.sql.Column, den: org.apache.spark.sql.Column) =
      num.cast("double") / nullif(den, lit(0)) * lit(100.0)
    val steps = Seq(
      (1, "view", col("n1"), lit(100.0)),
      (2, "click", col("n2"), pct(col("n2"), col("n1"))),
      (3, "purchase", col("n3"), pct(col("n3"), col("n2"))))
    steps.map { case (i, nm, users, conv) =>
      agg.select(lit(i).as("step"), lit(nm).as("step_name"),
        users.as("users"), conv.as("conv_pct"))
    }.reduce(_.unionByName(_)).orderBy(col("step"))
  }

  private val funnelDropoffSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us FROM events
      |), v AS (
      |  SELECT user_id, MIN(ts_us) AS view_us FROM e
      |  WHERE event_type = 'view' GROUP BY 1
      |), c AS (
      |  SELECT e.user_id, MIN(e.ts_us) AS click_us
      |  FROM e JOIN v USING (user_id)
      |  WHERE e.event_type = 'click' AND e.ts_us >= v.view_us
      |  GROUP BY 1
      |), p AS (
      |  SELECT e.user_id, MIN(e.ts_us) AS purchase_us
      |  FROM e JOIN c USING (user_id)
      |  WHERE e.event_type = 'purchase' AND e.ts_us >= c.click_us
      |  GROUP BY 1
      |), a AS (
      |  SELECT (SELECT COUNT(*) FROM v) AS n1,
      |    (SELECT COUNT(*) FROM c) AS n2,
      |    (SELECT COUNT(*) FROM p) AS n3
      |)
      |SELECT step, step_name, users, conv_pct FROM (
      |  SELECT 1 AS step, 'view' AS step_name, n1 AS users,
      |    100.0 AS conv_pct FROM a
      |  UNION ALL
      |  SELECT 2, 'click', n2,
      |    CAST(n2 AS DOUBLE) / nullif(n1, 0) * 100.0 FROM a
      |  UNION ALL
      |  SELECT 3, 'purchase', n3,
      |    CAST(n3 AS DOUBLE) / nullif(n2, 0) * 100.0 FROM a
      |)
      |ORDER BY step""".stripMargin

  /** Shipments in flight per day by SWEEP LINE: each order contributes a
    * [first-ship-day, last-ship-day] interval; instead of range-joining
    * every interval against a date spine (q141's shape — O(intervals ×
    * days-covered) pairs), each interval emits exactly TWO delta events
    * (+1 at start, −1 past end) and a running sum over day order
    * reconstructs the concurrent-interval count. O(n) rows regardless of
    * interval length — the 100 TB answer to interval stacking, where a
    * month-long interval would otherwise fan out 30×. Output is the
    * standard compressed step function: one row per change day. All
    * integer epoch-days and BIGINT sums. */
  def sweepLine(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val spans = Catalog.load(spark, dir, "lineitem")
      .filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(expr("min(unix_micros(l_shipdate) div 86400000000)").as("s"),
        expr("max(unix_micros(l_shipdate) div 86400000000)").as("e"))
    val deltas = spans.select(col("s").as("day"), lit(1L).as("d"))
      .unionByName(spans.select((col("e") + 1).as("day"), lit(-1L).as("d")))
    val ord = Window.partitionBy().orderBy(col("day"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    deltas.groupBy(col("day")).agg(sum(col("d")).as("delta"))
      .withColumn("in_flight", sum(col("delta")).over(ord))
      .select((col("day") * 86400000000L).as("day_us"),
        col("delta"), col("in_flight"))
      .orderBy(col("day_us"))
  }

  private val sweepLineSql =
    """WITH spans AS (
      |  SELECT l_orderkey,
      |    MIN(epoch_ns(l_shipdate) // 1000 // 86400000000) AS s,
      |    MAX(epoch_ns(l_shipdate) // 1000 // 86400000000) AS e
      |  FROM lineitem WHERE l_shipdate IS NOT NULL
      |  GROUP BY 1
      |), deltas AS (
      |  SELECT s AS day, CAST(1 AS BIGINT) AS d FROM spans
      |  UNION ALL
      |  SELECT e + 1, CAST(-1 AS BIGINT) FROM spans
      |), daily AS (
      |  SELECT day, CAST(SUM(d) AS BIGINT) AS delta FROM deltas GROUP BY 1
      |)
      |SELECT day * 86400000000 AS day_us, delta,
      |  CAST(SUM(delta) OVER (ORDER BY day ROWS UNBOUNDED PRECEDING)
      |    AS BIGINT) AS in_flight
      |FROM daily
      |ORDER BY day_us""".stripMargin

  /** Daily active users split into NEW vs RETURNING: a user's first-seen
    * day (one min-aggregate) joined back to the distinct (day, user)
    * activity pairs — the daily companion to q112's weekly cohort
    * matrix, and the decomposition growth dashboards actually plot.
    * Two shuffles total (both on user_id-sized keys); the broadcast is
    * never needed because the join key is the user id on both
    * user-sized frames. */
  def newVsReturning(spark: SparkSession, dir: String): DataFrame = {
    val act = Catalog.load(spark, dir, "events")
      .filter(col("ts").isNotNull)
      .select(col("user_id"),
        unix_micros(date_trunc("day", col("ts"))).as("day_us"))
      .distinct()
    val first = act.groupBy(col("user_id")).agg(min(col("day_us")).as("first_us"))
    act.join(first, "user_id")
      .groupBy(col("day_us"))
      .agg(count(lit(1)).as("n_active"),
        count(when(col("day_us") === col("first_us"), 1)).as("n_new"))
      .withColumn("n_returning", col("n_active") - col("n_new"))
      .orderBy(col("day_us"))
  }

  private val newVsReturningSql =
    """WITH act AS (
      |  SELECT DISTINCT user_id,
      |    epoch_ns(date_trunc('day', ts)) // 1000 AS day_us
      |  FROM events WHERE ts IS NOT NULL
      |), f AS (
      |  SELECT user_id, MIN(day_us) AS first_us FROM act GROUP BY 1
      |)
      |SELECT a.day_us, COUNT(*) AS n_active,
      |  CAST(COUNT(*) FILTER (a.day_us = f.first_us) AS BIGINT) AS n_new,
      |  COUNT(*) - CAST(COUNT(*) FILTER (a.day_us = f.first_us) AS BIGINT)
      |    AS n_returning
      |FROM act a JOIN f USING (user_id)
      |GROUP BY a.day_us
      |ORDER BY a.day_us""".stripMargin

  /** Deterministic A/B experiment readout: users split into two arms by
    * the q153 multiplicative hash (same assignment on every engine and
    * every run — no stored assignment table needed), outcome = "user
    * ever purchased", per-arm conversion with the q169 Wilson lower
    * bound (same shared-IEEE-formula trick). The entire analysis is two
    * exact aggregates + two rows of float algebra — the experimentation
    * loop a data platform runs daily, and the deterministic-assignment
    * property is what makes it replayable on 100 TB of history. */
  def abTest(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    val perUser = Catalog.load(spark, dir, "events")
      .filter(col("user_id").isNotNull)
      .groupBy(col("user_id"))
      .agg(max(when(col("event_type") === "purchase", 1).otherwise(0))
        .as("converted"))
    perUser
      .withColumn("arm",
        pmod(pmod(pmod(col("user_id"), lit(p)) * lit(2654435761L), lit(p)),
          lit(2L)))
      .groupBy(col("arm"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("c"))
      .withColumn("p", col("c").cast("double") / col("n"))
      .withColumn("wilson_lo", expr(wilsonExpr))
      .orderBy(col("arm"))
  }

  private val abTestSql =
    s"""WITH u AS (
       |  SELECT user_id,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS converted
       |  FROM events WHERE user_id IS NOT NULL
       |  GROUP BY 1
       |), a AS (
       |  SELECT ((user_id % 1000000007) * 2654435761) % 1000000007 % 2
       |      AS arm,
       |    COUNT(*) AS n, CAST(SUM(converted) AS BIGINT) AS c
       |  FROM u GROUP BY 1
       |), r AS (
       |  SELECT arm, n, c, CAST(c AS DOUBLE) / n AS p FROM a
       |)
       |SELECT arm, n, c, p, $wilsonExpr AS wilson_lo
       |FROM r ORDER BY arm""".stripMargin

  /** Week-over-week change aligned to the SAME WEEKDAY: each day joins
    * the day exactly 7 days earlier by integer µs arithmetic (never
    * `lag(7)` over row positions, which silently misaligns across gaps),
    * so Mondays compare to Mondays — q155's day-over-day without the
    * weekend artifact. Left join keeps the first week with NULL change;
    * nullif guards the division per house rule. */
  def wowChange(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate"))).as("day_us"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
    val prev = daily.select((col("day_us") + 604800000000L).as("day_us"),
      col("rev_c").as("prev_c"))
    daily.join(prev, Seq("day_us"), "left")
      .select(col("day_us"), col("rev_c"), col("prev_c"),
        ((col("rev_c") - col("prev_c")).cast("double")
          / nullif(col("prev_c"), lit(0L)) * lit(100.0)).as("wow_pct"))
      .orderBy(col("day_us"))
  }

  private val wowChangeSql =
    """WITH daily AS (
      |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000 AS day_us,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT d.day_us, d.rev_c, p.rev_c AS prev_c,
      |  CAST(d.rev_c - p.rev_c AS DOUBLE) / nullif(p.rev_c, 0) * 100.0
      |    AS wow_pct
      |FROM daily d
      |LEFT JOIN daily p ON p.day_us + 604800000000 = d.day_us
      |ORDER BY d.day_us""".stripMargin

  /** Order-fulfillment latency percentiles per priority class: each
    * order's days from placement to its LAST line shipping (one
    * order-keyed aggregate over lineitem joined to orders), then q151's
    * exact rank-selected median/p90 per priority — the SLA readout
    * "does priority actually predict fulfillment speed?". All integer
    * day arithmetic; the join is orders⨝(per-order max), both keyed by
    * the same 8-byte orderkey. */
  def fulfillment(spark: SparkSession, dir: String): DataFrame = {
    val lastShip = Catalog.load(spark, dir, "lineitem")
      .filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_orderkey"))
      .agg(expr("max(unix_micros(l_shipdate) div 86400000000)").as("ship_d"))
    val lat = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_orderkey"), col("o_orderpriority"),
        expr("unix_micros(o_orderdate) div 86400000000").as("order_d"))
      .join(lastShip, col("o_orderkey") === col("l_orderkey"))
      .select(col("o_orderpriority"), col("o_orderkey"),
        (col("ship_d") - col("order_d")).as("lat_days"))
    graft.ops.StatsOps
      .rankPercentiles(lat, col("o_orderpriority"), col("lat_days"),
        col("o_orderkey"))
      .withColumnRenamed("k", "o_orderpriority")
      .orderBy(col("o_orderpriority"))
  }

  private val fulfillmentSql =
    """WITH ls AS (
      |  SELECT l_orderkey,
      |    MAX(epoch_ns(l_shipdate) // 1000 // 86400000000) AS ship_d
      |  FROM lineitem WHERE l_shipdate IS NOT NULL
      |  GROUP BY 1
      |), lat AS (
      |  SELECT o_orderpriority, o_orderkey,
      |    ship_d - epoch_ns(o_orderdate) // 1000 // 86400000000 AS lat_days
      |  FROM orders JOIN ls ON o_orderkey = l_orderkey
      |  WHERE o_orderdate IS NOT NULL
      |), r AS (
      |  SELECT o_orderpriority, lat_days,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY lat_days, o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM lat
      |)
      |SELECT o_orderpriority, MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_days END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN lat_days END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN lat_days END)
      |    AS p90
      |FROM r
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Markov next-event prediction with the train/eval split INSIDE the
    * engine — the model-evaluation loop a data platform runs before
    * shipping a heuristic: consecutive event pairs are split by time at
    * min + 3·(max−min)/5 (integer µs, data-derived, engine-exact),
    * transition counts on the train side become an argmax-next model
    * (ties → lexicographically smallest), and accuracy is scored on the
    * held-out pairs. Pairs ride one user-key window; the model is a
    * ≤|event types|² aggregate joined back broadcast-sized. */
  def markovEval(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("t"), col("event_id"))
    val pairs = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("t"), col("event_type").as("nxt"))
      .withColumn("prev", lag(col("nxt"), 1).over(w))
      .filter(col("prev").isNotNull)
    val bounds = pairs.agg(min(col("t")).as("lo"), max(col("t")).as("hi"))
    val cut = pairs.crossJoin(broadcast(bounds))
      .withColumn("thr", expr("lo + (hi - lo) * 3 div 5"))
      .localCheckpoint(false) // feeds both the train and eval slices
    val model = cut.filter(col("t") < col("thr"))
      .groupBy(col("prev"), col("nxt")).agg(count(lit(1)).as("c"))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("prev"))
          .orderBy(col("c").desc, col("nxt"))))
      .filter(col("rk") === 1)
      .select(col("prev"), col("nxt").as("predicted"))
    cut.filter(col("t") >= col("thr"))
      .join(broadcast(model), Seq("prev"), "left")
      .groupBy(col("prev"))
      .agg(count(lit(1)).as("n_test"),
        count(when(col("nxt") === col("predicted"), 1)).as("n_correct"),
        max(col("predicted")).as("predicted"))
      .withColumn("accuracy",
        col("n_correct").cast("double") / col("n_test").cast("double"))
      .orderBy(col("prev"))
  }

  private val markovEvalSql =
    """WITH p0 AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS t,
      |    event_type AS nxt,
      |    lag(event_type, 1) OVER (PARTITION BY user_id
      |      ORDER BY epoch_ns(ts) // 1000, event_id) AS prev
      |  FROM events
      |), pairs AS (SELECT * FROM p0 WHERE prev IS NOT NULL
      |), b AS (SELECT MIN(t) AS lo, MAX(t) AS hi FROM pairs
      |), cut AS (
      |  SELECT pairs.*, lo + (hi - lo) * 3 // 5 AS thr FROM pairs, b
      |), model AS (
      |  SELECT prev, nxt AS predicted FROM (
      |    SELECT prev, nxt, COUNT(*) AS c,
      |      row_number() OVER (PARTITION BY prev
      |        ORDER BY COUNT(*) DESC, nxt) AS rk
      |    FROM cut WHERE t < thr GROUP BY prev, nxt)
      |  WHERE rk = 1
      |)
      |SELECT prev, CAST(COUNT(*) AS BIGINT) AS n_test,
      |  CAST(COUNT(*) FILTER (nxt = predicted) AS BIGINT) AS n_correct,
      |  MAX(predicted) AS predicted,
      |  CAST(COUNT(*) FILTER (nxt = predicted) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS accuracy
      |FROM cut LEFT JOIN model USING (prev)
      |WHERE t >= thr
      |GROUP BY prev ORDER BY prev""".stripMargin

  /** Theil–Sen robust trend per region: the median of all pairwise
    * slopes of the monthly-revenue series — the estimator that shrugs
    * off the outlier months that pull q144's least-squares line. The
    * pair join runs on the MONTH-AGGREGATED series (≈84 points per
    * region at any corpus scale, since the calendar — not the data —
    * bounds it), so the O(n²) pair set is a few thousand rows per
    * region regardless of order volume; the median is the exact
    * rank-selected one. Revenue in integer cents, slopes one double
    * division each, identical formula both engines. */
  def theilSen(spark: SparkSession, dir: String): DataFrame = {
    val months = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Catalog.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Catalog.load(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("rev_c"))
      // lazy checkpoint: the month series feeds both sides of the pair
      // self-join — don't run the 4-table join twice for a ~400-row frame
      .localCheckpoint(false)
    val a = months.select(col("r_name"), col("m").as("m1"),
      col("rev_c").as("r1"))
    val b = months.select(col("r_name").as("r_name2"), col("m").as("m2"),
      col("rev_c").as("r2"))
    val slopes = a.join(b,
        col("r_name") === col("r_name2") && col("m1") < col("m2"))
      .select(col("r_name"),
        ((col("r2") - col("r1")).cast("double")
          / (col("m2") - col("m1")).cast("double")).as("slope"),
        (col("m1") * 10000 + col("m2")).as("pair_id"))
    graft.ops.StatsOps
      .rankPercentiles(slopes, col("r_name"), col("slope"), col("pair_id"))
      .select(col("k").as("r_name"), col("n").as("n_pairs"),
        col("median").as("ts_slope"))
      .orderBy(col("r_name"))
  }

  private val theilSenSql =
    """WITH months AS (
      |  SELECT r_name,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
      |    SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2
      |), slopes AS (
      |  SELECT a.r_name,
      |    CAST(b.rev_c - a.rev_c AS DOUBLE) / CAST(b.m - a.m AS DOUBLE)
      |      AS slope,
      |    a.m * 10000 + b.m AS pair_id
      |  FROM months a JOIN months b
      |    ON a.r_name = b.r_name AND a.m < b.m
      |), r AS (
      |  SELECT r_name, slope,
      |    ROW_NUMBER() OVER (PARTITION BY r_name
      |      ORDER BY slope, pair_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY r_name) AS n
      |  FROM slopes
      |)
      |SELECT r_name, MAX(n) AS n_pairs,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN slope END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN slope END)) / 2 AS ts_slope
      |FROM r GROUP BY r_name ORDER BY r_name""".stripMargin

  /** Two-regressor OLS per group (multiple regression via the 2×2
    * normal equations): l_extendedprice ~ l_quantity + l_discount per
    * return flag. The nine raw moments are decimal-exact
    * order-independent sums (all products are decimal-shaped); the
    * closed-form solve (centered covariances → determinant → β₁, β₂,
    * intercept, R²) is a staged chain of single IEEE ops mirrored
    * verbatim in the oracle. One partial→final aggregate over lineitem
    * — the same single-exchange shape as q144's one-regressor trend. */
  def ols2(spark: SparkSession, dir: String): DataFrame = {
    val x1 = col("l_quantity"); val x2 = col("l_discount")
    val y = col("l_extendedprice")
    val m = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        Det.dsum(x1).as("s1"), Det.dsum(x2).as("s2"), Det.dsum(y).as("sy"),
        Det.dsum(x1 * x1).as("s11"), Det.dsum(x2 * x2).as("s22"),
        Det.dsum(x1 * x2).as("s12"),
        Det.dsum(x1 * y).as("s1y"), Det.dsum(x2 * y).as("s2y"),
        Det.dsum(y * y).as("syy"))
      .withColumn("nd", col("n").cast("double"))
      .withColumn("c11", col("s11") - col("s1") * col("s1") / col("nd"))
      .withColumn("c22", col("s22") - col("s2") * col("s2") / col("nd"))
      .withColumn("c12", col("s12") - col("s1") * col("s2") / col("nd"))
      .withColumn("c1y", col("s1y") - col("s1") * col("sy") / col("nd"))
      .withColumn("c2y", col("s2y") - col("s2") * col("sy") / col("nd"))
      .withColumn("cyy", col("syy") - col("sy") * col("sy") / col("nd"))
      .withColumn("det", col("c11") * col("c22") - col("c12") * col("c12"))
      .withColumn("b1",
        (col("c1y") * col("c22") - col("c2y") * col("c12")) / col("det"))
      .withColumn("b2",
        (col("c2y") * col("c11") - col("c1y") * col("c12")) / col("det"))
    m.select(col("l_returnflag"), col("n"), col("b1"), col("b2"),
        (col("sy") / col("nd") - col("b1") * (col("s1") / col("nd"))
          - col("b2") * (col("s2") / col("nd"))).as("b0"),
        ((col("b1") * col("c1y") + col("b2") * col("c2y")) / col("cyy"))
          .as("r2"))
      .orderBy(col("l_returnflag"))
  }

  private val ols2Sql = {
    def ds(e: String) = Det.sqlSum(e)
    s"""WITH m AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${ds("l_quantity")} AS s1, ${ds("l_discount")} AS s2,
       |    ${ds("l_extendedprice")} AS sy,
       |    ${ds("l_quantity * l_quantity")} AS s11,
       |    ${ds("l_discount * l_discount")} AS s22,
       |    ${ds("l_quantity * l_discount")} AS s12,
       |    ${ds("l_quantity * l_extendedprice")} AS s1y,
       |    ${ds("l_discount * l_extendedprice")} AS s2y,
       |    ${ds("l_extendedprice * l_extendedprice")} AS syy
       |  FROM lineitem GROUP BY 1
       |), c AS (
       |  SELECT *, CAST(n AS DOUBLE) AS nd FROM m
       |), cc AS (
       |  SELECT *,
       |    s11 - s1 * s1 / nd AS c11, s22 - s2 * s2 / nd AS c22,
       |    s12 - s1 * s2 / nd AS c12, s1y - s1 * sy / nd AS c1y,
       |    s2y - s2 * sy / nd AS c2y, syy - sy * sy / nd AS cyy
       |  FROM c
       |), d AS (
       |  SELECT *, c11 * c22 - c12 * c12 AS det FROM cc
       |), b AS (
       |  SELECT *,
       |    (c1y * c22 - c2y * c12) / det AS b1,
       |    (c2y * c11 - c1y * c12) / det AS b2
       |  FROM d
       |)
       |SELECT l_returnflag, n, b1, b2,
       |  sy / nd - b1 * (s1 / nd) - b2 * (s2 / nd) AS b0,
       |  (b1 * c1y + b2 * c2y) / cyy AS r2
       |FROM b ORDER BY l_returnflag""".stripMargin
  }

  /** Conversion latency: per user, microseconds from the FIRST view to
    * the first purchase at-or-after it, then exact rank-selected
    * median/p90 across converting users. Two conditional min-aggregates
    * per user (one user-key exchange) — no event self-join — then the
    * percentile windows run over the user-level frame. Integer µs end
    * to end. */
  def conversionLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val perUser = e.groupBy(col("user_id"))
      .agg(min(when(col("event_type") === "view", col("t"))).as("v0"))
      .join(e.filter(col("event_type") === "purchase"), Seq("user_id"))
      .filter(col("t") >= col("v0"))
      .groupBy(col("user_id"), col("v0"))
      .agg(min(col("t")).as("p0"))
      .select(col("user_id"), (col("p0") - col("v0")).as("lat_us"))
    graft.ops.StatsOps
      .globalRankPercentiles(perUser, col("lat_us"), col("user_id"))
  }

  private val conversionLatencySql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t FROM events
      |), v AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN t END) AS v0
      |  FROM e GROUP BY 1
      |), lat AS (
      |  SELECT e.user_id, MIN(e.t) - MAX(v.v0) AS lat_us
      |  FROM e JOIN v ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase' AND e.t >= v.v0
      |  GROUP BY e.user_id, v.v0
      |), r AS (
      |  SELECT user_id, lat_us,
      |    ROW_NUMBER() OVER (ORDER BY lat_us, user_id) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM lat
      |)
      |SELECT MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN lat_us END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN lat_us END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN lat_us END)
      |    AS p90
      |FROM r""".stripMargin

  /** MATCH_RECOGNIZE-lite complex event processing: per user, encode
    * the time-ordered event stream as a symbol string (one char per
    * event) and count regex occurrences of the conversion pattern
    * `V[VC]*P` — a view leading to a purchase through only views and
    * clicks. Sequence assembly is one user-key exchange + a compiled
    * sort/transform; the pattern runs leftmost-first/greedy, identical
    * in Java and RE2, so the oracle replays it verbatim. Per-user
    * strings are session-sized — the same bounded-state contract as the
    * funnel and path-mining ops (q111/q158), with arbitrary regex
    * instead of a fixed step list. */
  def eventPattern(spark: SparkSession, dir: String): DataFrame = {
    val sym = element_at(
      map(lit("view"), lit("V"), lit("click"), lit("C"),
        lit("purchase"), lit("P"), lit("signup"), lit("S"),
        lit("error"), lit("E")),
      col("event_type"))
    val matches = regexp_extract_all(col("seq"), lit("V[VC]*P"), lit(0))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"),
        struct(unix_micros(col("ts")).as("t"), col("event_id").as("e"),
          sym.as("s")).as("ev"))
      .groupBy(col("user_id"))
      .agg(sort_array(collect_list(col("ev"))).as("evs"))
      .select(col("user_id"),
        array_join(transform(col("evs"), e => e("s")), "").as("seq"))
      .select(col("user_id"), length(col("seq")).cast("long").as("n_events"),
        size(matches).cast("long").as("n_matches"),
        coalesce(array_max(transform(matches, m => length(m))), lit(0))
          .cast("long").as("longest"))
      .orderBy(col("user_id"))
  }

  private val eventPatternSql =
    """WITH s AS (
      |  SELECT user_id,
      |    string_agg(CASE event_type WHEN 'view' THEN 'V'
      |      WHEN 'click' THEN 'C' WHEN 'purchase' THEN 'P'
      |      WHEN 'signup' THEN 'S' WHEN 'error' THEN 'E' END, ''
      |      ORDER BY epoch_ns(ts) // 1000, event_id) AS seq
      |  FROM events GROUP BY user_id
      |)
      |SELECT user_id, CAST(length(seq) AS BIGINT) AS n_events,
      |  CAST(len(regexp_extract_all(seq, 'V[VC]*P')) AS BIGINT)
      |    AS n_matches,
      |  CAST(COALESCE(list_max(list_transform(
      |    regexp_extract_all(seq, 'V[VC]*P'), m -> length(m))), 0)
      |    AS BIGINT) AS longest
      |FROM s ORDER BY user_id""".stripMargin

  /** Welch's unequal-variance t-test between two order-priority groups
    * on o_totalprice. Counts and decimal-cast sums/sum-of-squares are
    * exact and order-independent (Det recipe — prices and their squares
    * are decimal-shaped); every downstream step (mean, variance,
    * standard errors, t, Welch–Satterthwaite df) is a single IEEE op on
    * already-identical values, staged so both engines execute the same
    * operation sequence. One aggregate over the filtered rows; the
    * two-group pivot is conditional aggregation on a 2-row frame. */
  def welchT(spark: SparkSession, dir: String): DataFrame = {
    val g1 = "1-URGENT"; val g2 = "5-LOW"
    val g = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderpriority").isin(g1, g2))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"), Det.dsum(col("o_totalprice")).as("s"),
        Det.dsum(col("o_totalprice") * col("o_totalprice")).as("ss"))
      .withColumn("mean", col("s") / col("n").cast("double"))
      .withColumn("vr",
        (col("ss") - col("n").cast("double") * col("mean") * col("mean"))
          / (col("n") - 1).cast("double"))
    def pick(c: String, grp: String) =
      max(when(col("o_orderpriority") === grp, col(c)))
    g.agg(
        pick("n", g1).as("n1"), pick("n", g2).as("n2"),
        pick("mean", g1).as("mean1"), pick("mean", g2).as("mean2"),
        pick("vr", g1).as("var1"), pick("vr", g2).as("var2"))
      .withColumn("se1", col("var1") / col("n1").cast("double"))
      .withColumn("se2", col("var2") / col("n2").cast("double"))
      .withColumn("sesum", col("se1") + col("se2"))
      .select(col("n1"), col("n2"), col("mean1"), col("mean2"),
        col("var1"), col("var2"),
        ((col("mean1") - col("mean2")) / sqrt(col("sesum"))).as("t_stat"),
        (col("sesum") * col("sesum") /
          (col("se1") * col("se1") / (col("n1") - 1).cast("double")
            + col("se2") * col("se2") / (col("n2") - 1).cast("double")))
          .as("df"))
  }

  private val welchTSql = {
    val s = Det.sqlSum("o_totalprice")
    val ss = Det.sqlSum("o_totalprice * o_totalprice")
    s"""WITH g AS (
       |  SELECT o_orderpriority, COUNT(*) AS n, $s AS s, $ss AS ss
       |  FROM orders
       |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
       |  GROUP BY 1
       |), m AS (
       |  SELECT o_orderpriority, n, s, ss, s / CAST(n AS DOUBLE) AS mean
       |  FROM g
       |), v AS (
       |  SELECT o_orderpriority, n, mean,
       |    (ss - CAST(n AS DOUBLE) * mean * mean) / CAST(n - 1 AS DOUBLE)
       |      AS vr
       |  FROM m
       |), piv AS (
       |  SELECT
       |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN n END) AS n1,
       |    MAX(CASE WHEN o_orderpriority = '5-LOW' THEN n END) AS n2,
       |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN mean END) AS mean1,
       |    MAX(CASE WHEN o_orderpriority = '5-LOW' THEN mean END) AS mean2,
       |    MAX(CASE WHEN o_orderpriority = '1-URGENT' THEN vr END) AS var1,
       |    MAX(CASE WHEN o_orderpriority = '5-LOW' THEN vr END) AS var2
       |  FROM v
       |), se AS (
       |  SELECT *, var1 / CAST(n1 AS DOUBLE) AS se1,
       |    var2 / CAST(n2 AS DOUBLE) AS se2
       |  FROM piv
       |), f AS (SELECT *, se1 + se2 AS sesum FROM se)
       |SELECT n1, n2, mean1, mean2, var1, var2,
       |  (mean1 - mean2) / sqrt(sesum) AS t_stat,
       |  sesum * sesum /
       |    (se1 * se1 / CAST(n1 - 1 AS DOUBLE)
       |      + se2 * se2 / CAST(n2 - 1 AS DOUBLE)) AS df
       |FROM f""".stripMargin
  }

  /** Mann–Whitney U (rank-sum) test between the same two priority
    * groups — the non-parametric sibling of [[welchT]], and unlike it
    * EXACT end to end: average-tie ranks are kept in DOUBLED integer
    * units (2·rank_min + ties − 1), so rank sums and both U statistics
    * are BIGINT arithmetic with one answer on any engine; only the
    * final normal-approximation z goes through (identical) IEEE ops.
    * Ranks come from the DISTINCT-VALUE frame: per value, the min rank
    * is (cumulative count − ties + 1), with the cumulative count an
    * exact [[graft.ops.GlobalRank.withRunningSum]] — no fact-sized
    * single-partition window, and the per-group rank sums collapse to
    * Σ countᵍ(x)·r2(x) over distinct values. */
  def mannWhitney(spark: SparkSession, dir: String): DataFrame = {
    val g1 = "1-URGENT"; val g2 = "5-LOW"
    val o = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderpriority").isin(g1, g2))
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"))
    val byX = o.groupBy(col("x")).agg(
      count(lit(1)).as("ties"),
      count(when(col("g") === g1, 1)).as("c1"),
      count(when(col("g") === g2, 1)).as("c2"))
    val ranked = graft.ops.GlobalRank.withRunningSum(
        byX, Seq(col("x")), col("ties"), "cumn")
      .withColumn("rmin", col("cumn") - col("ties") + 1)
      .withColumn("r2", lit(2L) * col("rmin") + col("ties") - 1L)
    ranked.groupBy()
      .agg(
        sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"),
        sum(col("c1") * col("r2")).as("r1_x2"))
      .withColumn("u1_x2",
        col("r1_x2") - col("n1") * (col("n1") + 1L))
      .withColumn("u2_x2",
        lit(2L) * col("n1") * col("n2") - col("u1_x2"))
      .withColumn("mu_x2", col("n1") * col("n2"))
      .select(col("n1"), col("n2"), col("r1_x2"), col("u1_x2"), col("u2_x2"),
        ((col("u1_x2") - col("mu_x2")).cast("double") / 2.0 /
          sqrt(col("n1").cast("double") * col("n2").cast("double")
            * (col("n1") + col("n2") + 1L).cast("double") / 12.0))
          .as("z_approx"))
  }

  /** Pairwise CLIFF'S DELTA across all ten priority pairs — the
    * distribution-free EFFECT SIZE that belongs next to q193's
    * Mann–Whitney significance: δ = P(X₁ > X₂) − P(X₁ < X₂), computed
    * exactly from the same doubled midrank-U integers
    * (δ = (2U₁ − n₁n₂)/(n₁n₂) — one mirrored division per pair), with
    * the conventional magnitude labels cut at literal thresholds. The
    * pair fan-out happens on the per-(priority, value) AGGREGATE (the
    * distinct-value frame, never the fact rows), and per-pair midranks
    * come from [[graft.ops.GlobalRank.withRunningSum]] over the
    * (pair, value) order with per-pair bases subtracted — 10 window
    * partitions each ~40% of the fact table was the same
    * single-task-funnel class the round-11 sweep retired. A z-test says
    * whether the difference is real; δ says whether anyone should
    * care — the pair matrix shows both extremes on one screen. */
  def cliffsDelta(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val prios = Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED",
      "5-LOW")
    val pairs = (for {
      a <- prios; b <- prios if a < b
    } yield (a, b)).toDF("g1", "g2")
    val byGX = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"), col("o_totalprice").as("x"))
      .groupBy(col("g"), col("x")).agg(count(lit(1)).as("cnt"))
    val byPX = byGX.join(broadcast(pairs),
        col("g") === col("g1") || col("g") === col("g2"))
      .groupBy(col("g1"), col("g2"), col("x"))
      .agg(sum(col("cnt")).as("ties"),
        sum(when(col("g") === col("g1"), col("cnt"))).as("c1"),
        sum(when(col("g") === col("g2"), col("cnt"))).as("c2"))
    val cum = graft.ops.GlobalRank.withRunningSum(byPX,
      Seq(col("g1"), col("g2"), col("x")), col("ties"), "gcum")
    // per-pair prefix = global prefix minus everything before the pair
    // (pairs are contiguous in the global order); the 10-row base frame
    // broadcasts
    val bases = cum.groupBy(col("g1"), col("g2"))
      .agg(min(col("gcum") - col("ties")).as("base"))
    val ranked = cum.join(broadcast(bases), Seq("g1", "g2"))
      .withColumn("rmin", col("gcum") - col("base") - col("ties") + 1)
      .withColumn("r2", lit(2L) * col("rmin") + col("ties") - 1L)
    ranked.groupBy(col("g1"), col("g2"))
      .agg(sum(col("c1")).as("n1"),
        sum(col("c2")).as("n2"),
        sum(col("c1") * col("r2")).as("r1_x2"))
      .withColumn("u1_x2", col("r1_x2") - col("n1") * (col("n1") + 1L))
      .withColumn("cliffs_delta",
        (col("u1_x2") - col("n1") * col("n2")).cast("double") /
          (col("n1") * col("n2")).cast("double"))
      .withColumn("magnitude",
        when(abs(col("cliffs_delta")) < 0.147, "negligible")
          .when(abs(col("cliffs_delta")) < 0.33, "small")
          .when(abs(col("cliffs_delta")) < 0.474, "medium")
          .otherwise("large"))
      .select(col("g1"), col("g2"), col("n1"), col("n2"), col("u1_x2"),
        col("cliffs_delta"), col("magnitude"))
      .orderBy(col("g1"), col("g2"))
  }

  private val cliffsDeltaSql =
    """WITH prios(p) AS (
      |  VALUES ('1-URGENT'), ('2-HIGH'), ('3-MEDIUM'),
      |    ('4-NOT SPECIFIED'), ('5-LOW')
      |), pr(g1, g2) AS (
      |  SELECT a.p, b.p FROM prios a JOIN prios b ON a.p < b.p
      |), expanded AS (
      |  SELECT pr.g1, pr.g2, o.o_orderpriority AS g, o.o_totalprice AS x
      |  FROM orders o JOIN pr
      |    ON o.o_orderpriority = pr.g1 OR o.o_orderpriority = pr.g2
      |), ranked AS (
      |  SELECT g1, g2, g,
      |    CAST(RANK() OVER (PARTITION BY g1, g2 ORDER BY x) AS BIGINT)
      |      AS rmin,
      |    CAST(COUNT(*) OVER (PARTITION BY g1, g2, x) AS BIGINT) AS ties
      |  FROM expanded
      |), agg AS (
      |  SELECT g1, g2,
      |    CAST(COUNT(*) FILTER (g = g1) AS BIGINT) AS n1,
      |    CAST(COUNT(*) FILTER (g = g2) AS BIGINT) AS n2,
      |    CAST(SUM(2 * rmin + ties - 1) FILTER (g = g1) AS BIGINT)
      |      AS r1_x2
      |  FROM ranked GROUP BY 1, 2
      |)
      |SELECT g1, g2, n1, n2,
      |  r1_x2 - n1 * (n1 + 1) AS u1_x2,
      |  CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
      |    / CAST(n1 * n2 AS DOUBLE) AS cliffs_delta,
      |  CASE WHEN abs(CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
      |           / CAST(n1 * n2 AS DOUBLE)) < 0.147 THEN 'negligible'
      |       WHEN abs(CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
      |           / CAST(n1 * n2 AS DOUBLE)) < 0.33 THEN 'small'
      |       WHEN abs(CAST(r1_x2 - n1 * (n1 + 1) - n1 * n2 AS DOUBLE)
      |           / CAST(n1 * n2 AS DOUBLE)) < 0.474 THEN 'medium'
      |       ELSE 'large' END AS magnitude
      |FROM agg
      |ORDER BY g1, g2""".stripMargin

  private val mannWhitneySql =
    """WITH o AS (
      |  SELECT o_orderpriority AS g, o_totalprice AS x FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |), r AS (
      |  SELECT g, x,
      |    CAST(rank() OVER (ORDER BY x) AS BIGINT) AS rmin,
      |    COUNT(*) OVER (PARTITION BY x) AS ties
      |  FROM o
      |), r2 AS (SELECT g, 2 * rmin + ties - 1 AS r2 FROM r
      |), agg AS (
      |  SELECT
      |    COUNT(*) FILTER (g = '1-URGENT') AS n1,
      |    COUNT(*) FILTER (g = '5-LOW') AS n2,
      |    SUM(r2) FILTER (g = '1-URGENT') AS r1_x2
      |  FROM r2
      |), u AS (
      |  SELECT n1, n2, r1_x2,
      |    r1_x2 - n1 * (n1 + 1) AS u1_x2,
      |    2 * n1 * n2 - (r1_x2 - n1 * (n1 + 1)) AS u2_x2,
      |    n1 * n2 AS mu_x2
      |  FROM agg
      |)
      |SELECT CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
      |  CAST(r1_x2 AS BIGINT) AS r1_x2,
      |  CAST(u1_x2 AS BIGINT) AS u1_x2, CAST(u2_x2 AS BIGINT) AS u2_x2,
      |  CAST(u1_x2 - mu_x2 AS DOUBLE) / 2.0 /
      |    sqrt(CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)
      |      * CAST(n1 + n2 + 1 AS DOUBLE) / 12.0) AS z_approx
      |FROM u""".stripMargin

  /** Interval coalescing (merge-overlapping-intervals): per supplier,
    * collapse per-order shipping spans [first ship day, last ship day]
    * into maximal covered intervals. The classic running-max island
    * detector — an interval starts a new island iff its start exceeds
    * the max end seen so far — needs one supplier-key exchange, and the
    * windows run over the per-order aggregate (one row per supplier ×
    * order), not raw line items. Integer day arithmetic end to end. */
  def intervalMerge(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val iv = Catalog.load(spark, dir, "lineitem")
      .filter(col("l_shipdate").isNotNull)
      .groupBy(col("l_suppkey"), col("l_orderkey"))
      .agg(expr("min(unix_micros(l_shipdate) div 86400000000)").as("s"),
        expr("max(unix_micros(l_shipdate) div 86400000000)").as("e"))
    val ord = Window.partitionBy(col("l_suppkey"))
      .orderBy(col("s"), col("e"), col("l_orderkey"))
    iv
      .withColumn("prev_max_e",
        max(col("e")).over(ord.rowsBetween(Window.unboundedPreceding, -1)))
      .withColumn("new_island",
        when(col("prev_max_e").isNull || col("s") > col("prev_max_e"), 1L)
          .otherwise(0L))
      .withColumn("island",
        sum(col("new_island")).over(
          ord.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("l_suppkey"), col("island"))
      .agg(count(lit(1)).as("n_iv"), min(col("s")).as("is_s"),
        max(col("e")).as("is_e"))
      .groupBy(col("l_suppkey"))
      .agg(sum(col("n_iv")).as("n_intervals"),
        count(lit(1)).as("n_islands"),
        sum(col("is_e") - col("is_s") + 1).as("covered_days"),
        max(col("is_e") - col("is_s") + 1).as("max_island_days"))
      .orderBy(col("l_suppkey"))
  }

  private val intervalMergeSql =
    """WITH iv AS (
      |  SELECT l_suppkey, l_orderkey,
      |    MIN(epoch_ns(l_shipdate) // 1000 // 86400000000) AS s,
      |    MAX(epoch_ns(l_shipdate) // 1000 // 86400000000) AS e
      |  FROM lineitem WHERE l_shipdate IS NOT NULL
      |  GROUP BY 1, 2
      |), flag AS (
      |  SELECT l_suppkey, s, e,
      |    CASE WHEN max(e) OVER (PARTITION BY l_suppkey
      |        ORDER BY s, e, l_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) IS NULL
      |      OR s > max(e) OVER (PARTITION BY l_suppkey
      |        ORDER BY s, e, l_orderkey
      |        ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
      |      THEN 1 ELSE 0 END AS new_island,
      |    l_orderkey
      |  FROM iv
      |), isl AS (
      |  SELECT l_suppkey, s, e,
      |    SUM(new_island) OVER (PARTITION BY l_suppkey
      |      ORDER BY s, e, l_orderkey
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS island
      |  FROM flag
      |), grp AS (
      |  SELECT l_suppkey, island, COUNT(*) AS n_iv,
      |    MIN(s) AS is_s, MAX(e) AS is_e
      |  FROM isl GROUP BY 1, 2
      |)
      |SELECT l_suppkey, CAST(SUM(n_iv) AS BIGINT) AS n_intervals,
      |  CAST(COUNT(*) AS BIGINT) AS n_islands,
      |  CAST(SUM(is_e - is_s + 1) AS BIGINT) AS covered_days,
      |  CAST(MAX(is_e - is_s + 1) AS BIGINT) AS max_island_days
      |FROM grp GROUP BY l_suppkey ORDER BY l_suppkey""".stripMargin

  /** Gaps-and-islands: per customer, runs of CONSECUTIVE order months.
    * The classic trick — month ordinal minus the per-customer
    * row_number is constant within an island — needs one custkey
    * exchange, but the windows run over (customer, month) pairs, not
    * raw orders: the distinct aggregate first collapses order volume to
    * at most one row per customer-month, so per-partition window state
    * is bounded by the calendar span regardless of order count. */
  def orderStreaks(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val months = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .distinct()
    months
      .withColumn("grp", col("m") - row_number().over(
        Window.partitionBy(col("o_custkey")).orderBy(col("m"))))
      .groupBy(col("o_custkey"), col("grp"))
      .agg(count(lit(1)).as("len"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_streaks"), max(col("len")).as("longest"),
        sum(col("len")).as("n_months"))
      .orderBy(col("o_custkey"))
  }

  private val orderStreaksSql =
    """WITH m AS (
      |  SELECT DISTINCT o_custkey,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |), g AS (
      |  SELECT o_custkey, m,
      |    m - ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY m) AS grp
      |  FROM m
      |), s AS (
      |  SELECT o_custkey, grp, COUNT(*) AS len FROM g GROUP BY 1, 2
      |)
      |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_streaks,
      |  CAST(MAX(len) AS BIGINT) AS longest,
      |  CAST(SUM(len) AS BIGINT) AS n_months
      |FROM s GROUP BY o_custkey ORDER BY o_custkey""".stripMargin

  /** Model-calibration bins: treating value∕500 as a predicted purchase
    * probability, 10 fixed-width bins compare mean predicted confidence
    * against the empirical purchase rate — the reliability-diagram table
    * behind an ECE readout. Everything flows through integer cents
    * (CAST(round(value·100) AS BIGINT)), so bin edges and both rates are
    * engine-exact; one hash aggregate, no shuffle beyond the 10 bins. */
  def calibrationBins(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(expr("cast(round(value * 100) as bigint)").as("cents"),
        (col("event_type") === "purchase").cast("int").as("pos"))
      .withColumn("bin", least(expr("cents div 5000"), lit(9L)))
    e.groupBy(col("bin"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"),
        sum(col("cents")).as("sum_cents"))
      .select(col("bin"), col("n"), col("n_pos"),
        (col("sum_cents").cast("double") /
          (col("n") * 50000).cast("double")).as("conf"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("acc"))
      .orderBy(col("bin"))
  }

  private val calibrationBinsSql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |), b AS (
      |  SELECT least(cents // 5000, 9) AS bin,
      |    CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos,
      |    CAST(SUM(cents) AS BIGINT) AS sum_cents
      |  FROM e GROUP BY 1
      |)
      |SELECT bin, n, n_pos,
      |  CAST(sum_cents AS DOUBLE) / CAST(n * 50000 AS DOUBLE) AS conf,
      |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS acc
      |FROM b ORDER BY bin""".stripMargin

  /** Exact ROC AUC of value as a purchase ranker, via the tie-aware rank
    * statistic: AUC·2n⁺n⁻ = Σ_scores n⁺(s)·(2·negBelow(s) + n⁻(s)) — an
    * all-integer numerator (every tied pair counts ½), one distinct-score
    * aggregate + a running window, no O(n²) pair join. The single IEEE
    * division at the end is identical in any engine. */
  def rocAuc(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val g = Catalog.load(spark, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(expr("cast(round(value * 100) as bigint)").as("cents"),
        (col("event_type") === "purchase").cast("int").as("pos"))
      .groupBy(col("cents"))
      .agg(sum(col("pos")).as("np"),
        sum(lit(1) - col("pos")).as("nn"))
    // the negatives-below prefix via GlobalRank's exact distributed
    // running sum over the distinct-score frame (no single-partition
    // window)
    val cum = graft.ops.GlobalRank.withRunningSum(
      g, Seq(col("cents")), col("nn"), "cum_nn")
    cum.agg(sum(col("np")).as("n_pos"), sum(col("nn")).as("n_neg"),
        sum(col("np") * (lit(2) * (col("cum_nn") - col("nn")) + col("nn")))
          .as("auc_num2"))
      .select(col("n_pos"), col("n_neg"), col("auc_num2"),
        (col("auc_num2").cast("double") /
          (lit(2) * col("n_pos") * col("n_neg")).cast("double")).as("auc"))
  }

  private val rocAucSql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |), g AS (
      |  SELECT cents, CAST(SUM(pos) AS BIGINT) AS np,
      |    CAST(SUM(1 - pos) AS BIGINT) AS nn
      |  FROM e GROUP BY 1
      |), c AS (
      |  SELECT np, nn,
      |    CAST(SUM(nn) OVER (ORDER BY cents) AS BIGINT) AS cum_nn
      |  FROM g
      |)
      |SELECT CAST(SUM(np) AS BIGINT) AS n_pos,
      |  CAST(SUM(nn) AS BIGINT) AS n_neg,
      |  CAST(SUM(np * (2 * (cum_nn - nn) + nn)) AS BIGINT) AS auc_num2,
      |  CAST(CAST(SUM(np * (2 * (cum_nn - nn) + nn)) AS BIGINT) AS DOUBLE)
      |    / CAST(2 * CAST(SUM(np) AS BIGINT) * CAST(SUM(nn) AS BIGINT)
      |        AS DOUBLE) AS auc
      |FROM c""".stripMargin

  /** Optimal single changepoint in the daily-revenue series (binary-
    * segmentation step 1): the split day maximizing the two-segment
    * between-sum-of-squares gain s₁²/n₁ + s₂²/n₂ − S²/N. Prefix sums
    * ride ONE ordered window over exact integer cents; the gain is a
    * mirrored IEEE expression, argmax ties break to the earliest day.
    * Where q164's CUSUM flags drift, this names the break. */
  def changepoint(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(unix_micros(date_trunc("day", col("o_orderdate")))
        .as("day_us"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
        .as("cents"))
    val w = Window.orderBy(col("day_us"))
    val cum = daily
      .withColumn("n1", row_number().over(w).cast("long"))
      .withColumn("s1", sum(col("cents")).over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("s", sum(col("cents")).over(Window.partitionBy()))
      .filter(col("n1") < col("n")) // a split needs a non-empty tail
      .withColumn("gain",
        col("s1").cast("double") * col("s1").cast("double")
          / col("n1").cast("double") +
          (col("s") - col("s1")).cast("double")
            * (col("s") - col("s1")).cast("double")
            / (col("n") - col("n1")).cast("double") -
          col("s").cast("double") * col("s").cast("double")
            / col("n").cast("double"))
    cum.orderBy(col("gain").desc, col("day_us")).limit(1)
      .select(col("day_us").as("split_day_us"), col("n1").as("n_before"),
        (col("n") - col("n1")).as("n_after"), col("gain"))
  }

  private val changepointSql =
    """WITH daily AS (
      |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000 AS day_us,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
      |), cum AS (
      |  SELECT day_us,
      |    CAST(row_number() OVER (ORDER BY day_us) AS BIGINT) AS n1,
      |    CAST(SUM(cents) OVER (ORDER BY day_us) AS BIGINT) AS s1,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n,
      |    CAST(SUM(cents) OVER () AS BIGINT) AS s
      |  FROM daily
      |), g AS (
      |  SELECT day_us, n1, n - n1 AS n_after,
      |    CAST(s1 AS DOUBLE) * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)
      |      + CAST(s - s1 AS DOUBLE) * CAST(s - s1 AS DOUBLE)
      |        / CAST(n - n1 AS DOUBLE)
      |      - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
      |      AS gain
      |  FROM cum WHERE n1 < n
      |)
      |SELECT day_us AS split_day_us, n1 AS n_before, n_after, gain
      |FROM g ORDER BY gain DESC, day_us LIMIT 1""".stripMargin

  /** Balanced-repeated-replication (half-sample bootstrap) CI for the
    * mean daily revenue: 64 deterministic half-samples — day d joins
    * replicate b iff a quadratic multiplicative hash of (day index + b)
    * is even (quadratic because two LINEAR hashes of the same key are
    * affinely related — a lattice, not a resample) — and the CI is the
    * exact rank-selected p05/p95 of the replicate means. All-integer
    * until the final divisions; at scale this is the Poisson-bootstrap
    * shape: B× fan-out of day aggregates, never of fact rows. */
  def bootstrapCi(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy((unix_micros(date_trunc("day", col("o_orderdate")))
        / lit(86400000000L)).cast("long").as("day_idx"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)"))
        .as("cents"))
    val reps = daily.select(col("day_idx"), col("cents"),
        explode(sequence(lit(0), lit(63))).as("b"))
      .filter((col("day_idx") + col("b")) * (col("day_idx") + col("b"))
        * 2654435761L % 1000003L % 2 === 0)
      .groupBy(col("b"))
      .agg((sum(col("cents")).cast("double") /
        (count(lit(1)) * 100).cast("double")).as("rep_mean"))
    val ranked = reps.withColumn("rk",
      row_number().over(Window.orderBy(col("rep_mean"), col("b"))))
    ranked.agg(
      count(lit(1)).as("n_reps"),
      Det.dsum(col("rep_mean")).as("sum_means"),
      max(when(col("rk") === 4, col("rep_mean"))).as("ci_lo"),
      max(when(col("rk") === 61, col("rep_mean"))).as("ci_hi"))
      .select(col("n_reps"),
        (col("sum_means") / col("n_reps")).as("boot_mean"),
        col("ci_lo"), col("ci_hi"))
  }

  private val bootstrapCiSql = {
    val sm = Det.sqlSum("rep_mean")
    s"""WITH daily AS (
       |  SELECT (epoch_ns(date_trunc('day', o_orderdate)) // 1000)
       |      // 86400000000 AS day_idx,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
       |), reps AS (
       |  SELECT b,
       |    CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) * 100 AS DOUBLE)
       |      AS rep_mean
       |  FROM daily, unnest(range(0, 64)) AS u(b)
       |  WHERE (day_idx + b) * (day_idx + b) * 2654435761 % 1000003 % 2 = 0
       |  GROUP BY b
       |), ranked AS (
       |  SELECT b, rep_mean,
       |    row_number() OVER (ORDER BY rep_mean, b) AS rk
       |  FROM reps
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_reps,
       |  $sm / COUNT(*) AS boot_mean,
       |  MAX(CASE WHEN rk = 4 THEN rep_mean END) AS ci_lo,
       |  MAX(CASE WHEN rk = 61 THEN rep_mean END) AS ci_hi
       |FROM ranked""".stripMargin
  }

  /** Point-in-time (as-of-dimension) join: every purchase event joined
    * to the SCD-2 state interval valid at its timestamp — the
    * leak-proof way to attach dimension history to facts (a plain
    * latest-state join leaks future attribute values into training
    * features). Scale shape: equi-join on user_id with the interval
    * predicate as residual — the fact side shuffles once on its join
    * key, intervals are the (much smaller) change-rows only. */
  def scd2PitJoin(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ordered = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val ev = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val iv = ev
      .withColumn("prev", lag(col("event_type"), 1).over(ordered))
      .filter(not(col("prev") <=> col("event_type")))
      .withColumn("version", row_number().over(ordered).cast("long"))
      .withColumn("to_us", lead(col("ts_us"), 1).over(ordered))
      .select(col("user_id").as("d_user"), col("version"),
        col("event_type").as("state"), col("ts_us").as("from_us"),
        col("to_us"))
    ev.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("user_id"), col("ts_us"))
      .join(iv, col("user_id") === col("d_user") &&
        col("from_us") <= col("ts_us") &&
        (col("to_us").isNull || col("ts_us") < col("to_us")))
      .select(col("event_id"), col("user_id"), col("ts_us"),
        col("version"), col("state"))
      .orderBy(col("event_id"))
  }

  private val scd2PitJoinSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type,
      |    epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), ch AS (
      |  SELECT *, lag(event_type) OVER (PARTITION BY user_id
      |    ORDER BY ts_us, event_id) AS prev
      |  FROM e
      |), iv AS (
      |  SELECT user_id AS d_user,
      |    CAST(row_number() OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS BIGINT) AS version,
      |    event_type AS state, ts_us AS from_us,
      |    lead(ts_us) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS to_us
      |  FROM ch WHERE prev IS DISTINCT FROM event_type
      |)
      |SELECT f.event_id, f.user_id, f.ts_us, iv.version, iv.state
      |FROM e f JOIN iv ON f.user_id = iv.d_user
      |  AND iv.from_us <= f.ts_us
      |  AND (iv.to_us IS NULL OR f.ts_us < iv.to_us)
      |WHERE f.event_type = 'purchase'
      |ORDER BY f.event_id""".stripMargin

  // ---- survival analysis: Kaplan-Meier ingredients ---------------------

  /** Kaplan-Meier hazard table for time-to-first-purchase: per user, the
    * day offset from their first event to their first `purchase`
    * (censored at the global horizon when no purchase exists), then per
    * day the at-risk count, observed events, and censorings — the exact
    * integer ingredients S(t) is a product of. Two shuffled aggregates
    * (per-user reduction, per-day rollup), a 1-row broadcast horizon, and
    * a ~days-sized reverse-cumulative window on the post-aggregate table;
    * the per-user reduction is the only corpus-sized pass, keyed on
    * user_id — the at-scale shape for survival curves over billions of
    * users. Integer `div` day bucketing keeps both engines exact. */
  def kmHazard(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
    val horizon = e.agg(max(col("ts_us")).as("horizon_us"))
    val perUser = e.groupBy(col("user_id")).agg(
      min(col("ts_us")).as("t0_us"),
      min(when(col("event_type") === "purchase", col("ts_us"))).as("tp_us"))
    val durations = perUser.crossJoin(broadcast(horizon))
      .select(
        when(col("tp_us").isNotNull,
          expr("(tp_us - t0_us) div 86400000000"))
          .otherwise(expr("(horizon_us - t0_us) div 86400000000"))
          .as("dur_day"),
        col("tp_us").isNotNull.cast("int").as("observed"))
    val byDay = durations.groupBy(col("dur_day")).agg(
      sum(col("observed")).cast("long").as("n_event"),
      sum(lit(1) - col("observed")).cast("long").as("n_censored"))
    val wRisk = Window.orderBy(col("dur_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n_risk",
        sum(col("n_event") + col("n_censored")).over(wRisk).cast("long"))
      .select(col("dur_day"), col("n_risk"), col("n_event"), col("n_censored"))
      .orderBy(col("dur_day"))
  }

  private val kmHazardSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_type FROM events
      |), h AS (
      |  SELECT MAX(ts_us) AS horizon_us FROM e
      |), u AS (
      |  SELECT user_id, MIN(ts_us) AS t0_us,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS tp_us
      |  FROM e GROUP BY 1
      |), d AS (
      |  SELECT CASE WHEN tp_us IS NOT NULL
      |           THEN (tp_us - t0_us) // 86400000000
      |           ELSE (horizon_us - t0_us) // 86400000000 END AS dur_day,
      |    CASE WHEN tp_us IS NOT NULL THEN 1 ELSE 0 END AS observed
      |  FROM u, h
      |), t AS (
      |  SELECT dur_day, CAST(SUM(observed) AS BIGINT) AS n_event,
      |    CAST(SUM(1 - observed) AS BIGINT) AS n_censored
      |  FROM d GROUP BY 1
      |)
      |SELECT dur_day,
      |  CAST(SUM(n_event + n_censored) OVER (ORDER BY dur_day DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS n_risk,
      |  n_event, n_censored
      |FROM t ORDER BY dur_day""".stripMargin

  // ---- inter-arrival gap distribution ----------------------------------

  /** Per-event-type inter-arrival gaps: for each consecutive pair of a
    * user's events (event-time order, event_id tiebreak), the µs gap is
    * attributed to the leading event's type; per type the gap count,
    * min/max, and EXACT median via the rank-selection recipe (q40's
    * shape) — one user-keyed window for the lead, one type-keyed window
    * for ranks, both on 8-byte keys, no driver state. */
  def interarrival(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val wUser = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    val gaps = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(wUser))
      .filter(col("next_us").isNotNull)
      .select(col("event_type"), col("event_id"),
        (col("next_us") - col("ts_us")).as("gap_us"))
    val wRank = Window.partitionBy(col("event_type"))
      .orderBy(col("gap_us"), col("event_id"))
    val wN = Window.partitionBy(col("event_type"))
    gaps
      .withColumn("rn", row_number().over(wRank))
      .withColumn("n", count(lit(1)).over(wN))
      .groupBy(col("event_type"))
      .agg(
        max(col("n")).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"),
        ((max(when(col("rn") === expr("(n + 1) div 2"), col("gap_us")))
          + max(when(col("rn") === expr("(n + 2) div 2"), col("gap_us"))))
          / 2).as("median_gap_us"))
      .orderBy(col("event_type"))
  }

  private val interarrivalSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), g AS (
      |  SELECT event_type, event_id,
      |    lead(ts_us, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) - ts_us AS gap_us
      |  FROM e
      |), r AS (
      |  SELECT event_type, gap_us,
      |    ROW_NUMBER() OVER (PARTITION BY event_type
      |      ORDER BY gap_us, event_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY event_type) AS n
      |  FROM g WHERE gap_us IS NOT NULL
      |)
      |SELECT event_type, MAX(n) AS n_gaps,
      |  MIN(gap_us) AS min_gap_us, MAX(gap_us) AS max_gap_us,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN gap_us END)) / 2
      |    AS median_gap_us
      |FROM r GROUP BY 1 ORDER BY event_type""".stripMargin

  // ---- burstiness (Fano factor) ----------------------------------------

  /** Hourly burstiness per event type: the Fano factor (variance/mean of
    * hourly arrival counts) from exact BIGINT sufficient statistics —
    * Poisson arrivals give ≈1, bursty traffic >1. Two-level aggregate
    * (hour cell counts, then per-type moment sums; both map-side
    * combinable) and ONE mirrored IEEE division at the end:
    * (H·S2 − S1²) / (H·S1) over exact integers, so the doubles
    * hash-match across engines. */
  def burstiness(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .groupBy(col("event_type"),
        expr("unix_micros(ts) div 3600000000").as("hour_id"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_hours"),
        sum(col("c")).cast("long").as("s1"),
        sum(col("c") * col("c")).cast("long").as("s2"))
      .select(col("event_type"), col("n_hours"), col("s1"),
        ((col("n_hours") * col("s2") - col("s1") * col("s1")).cast("double")
          / (col("n_hours") * col("s1")).cast("double")).as("fano"))
      .orderBy(col("event_type"))

  private val burstinessSql =
    """WITH h AS (
      |  SELECT event_type, epoch_ns(ts) // 1000 // 3600000000 AS hour_id,
      |    COUNT(*) AS c
      |  FROM events GROUP BY 1, 2
      |), a AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_hours,
      |    CAST(SUM(c) AS BIGINT) AS s1, CAST(SUM(c * c) AS BIGINT) AS s2
      |  FROM h GROUP BY 1
      |)
      |SELECT event_type, n_hours, s1,
      |  CAST(n_hours * s2 - s1 * s1 AS DOUBLE)
      |    / CAST(n_hours * s1 AS DOUBLE) AS fano
      |FROM a ORDER BY event_type""".stripMargin

  // ---- sessions-per-user distribution ----------------------------------

  /** Histogram of sessions per user (5-minute gap sessionization — the
    * q103 semantics): how many users had exactly k sessions over the
    * window. Session roll-up shuffles on user_id once; both downstream
    * aggregates are map-side combinable and tiny. The engagement-shape
    * summary a growth dashboard reads daily. */
  def sessionCountHist(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_sessions"))
      .groupBy(col("n_sessions"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_sessions"))

  private val sessionCountHistSql =
    """WITH t AS (
      |  SELECT user_id,
      |    CASE WHEN epoch_ns(ts) // 1000
      |           - lag(epoch_ns(ts) // 1000) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id)
      |           >= 300000000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |), u AS (
      |  SELECT user_id, CAST(SUM(new_sess) AS BIGINT) AS n_sessions
      |  FROM t GROUP BY 1
      |)
      |SELECT n_sessions, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM u GROUP BY 1 ORDER BY n_sessions""".stripMargin

  // ---- user lifecycle shape --------------------------------------------

  /** Active-days histogram: users bucketed by how many distinct calendar
    * days they produced events, with the exact event mass per bucket —
    * the lifecycle/power-user curve. countDistinct compiles to a
    * two-level exact aggregate (no sketch); everything keyed on
    * user_id / the bucket, nothing driver-side. */
  def userLifecycle(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), expr("unix_micros(ts) div 86400000000").as("day"))
      .groupBy(col("user_id"))
      .agg(countDistinct(col("day")).as("n_active_days"),
        count(lit(1)).as("n_events"))
      .groupBy(col("n_active_days"))
      .agg(count(lit(1)).as("n_users"),
        sum(col("n_events")).cast("long").as("sum_events"))
      .orderBy(col("n_active_days"))

  private val userLifecycleSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 // 86400000000 AS day
      |  FROM events
      |), u AS (
      |  SELECT user_id, COUNT(DISTINCT day) AS n_active_days,
      |    COUNT(*) AS n_events
      |  FROM e GROUP BY 1
      |)
      |SELECT n_active_days, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(n_events) AS BIGINT) AS sum_events
      |FROM u GROUP BY 1 ORDER BY n_active_days""".stripMargin

  // ---- weekly churn / retention flow -----------------------------------

  /** Weekly activity flow: per epoch-week, active users, retained (also
    * active next week), churned (not active next week), and new (not
    * active the prior week). One distinct (user, week) reduction, then
    * two self-equi-joins against ±1-week shifts of the SAME distinct
    * table — co-partitioned on (user_id, week), so the shuffles line up
    * and nothing is rescanned. Exact integers; the last week's churn
    * counts everyone by definition. */
  def weeklyChurn(spark: SparkSession, dir: String): DataFrame = {
    val uw = Catalog.load(spark, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 604800000000").as("week"))
      .distinct()
    val nxt = uw.select(col("user_id"), (col("week") - 1).as("week"),
      lit(1).as("has_next"))
    val prv = uw.select(col("user_id"), (col("week") + 1).as("week"),
      lit(1).as("has_prev"))
    uw.join(nxt, Seq("user_id", "week"), "left")
      .join(prv, Seq("user_id", "week"), "left")
      .groupBy(col("week"))
      .agg(
        count(lit(1)).as("n_active"),
        sum(coalesce(col("has_next"), lit(0))).cast("long").as("n_retained"),
        sum(when(col("has_next").isNull, 1L).otherwise(0L))
          .cast("long").as("n_churned"),
        sum(when(col("has_prev").isNull, 1L).otherwise(0L))
          .cast("long").as("n_new"))
      .orderBy(col("week"))
  }

  private val weeklyChurnSql =
    """WITH uw AS (
      |  SELECT DISTINCT user_id, epoch_ns(ts) // 1000 // 604800000000 AS week
      |  FROM events
      |)
      |SELECT a.week,
      |  CAST(COUNT(*) AS BIGINT) AS n_active,
      |  CAST(SUM(CASE WHEN n.user_id IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_retained,
      |  CAST(SUM(CASE WHEN n.user_id IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_churned,
      |  CAST(SUM(CASE WHEN p.user_id IS NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_new
      |FROM uw a
      |LEFT JOIN uw n ON n.user_id = a.user_id AND n.week = a.week + 1
      |LEFT JOIN uw p ON p.user_id = a.user_id AND p.week = a.week - 1
      |GROUP BY 1 ORDER BY a.week""".stripMargin

  // ---- within-session event-type affinity ------------------------------

  /** Market-basket lift between event types co-occurring in the same
    * 5-minute session: for each unordered type pair,
    * lift = P(both) / (P(a)·P(b)) over sessions. Sessionize once
    * (user-keyed, the q103 semantics), collect the ≤5 distinct types per
    * session (bounded set, not a row explosion), pair within the session
    * key, and divide exact BIGINT products once at the end. Type-count
    * and session-count sides broadcast (≤5 rows / 1 row). */
  def typeAffinity(spark: SparkSession, dir: String): DataFrame = {
    val sess = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(collect_set(col("event_type")).as("types"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("sess_us"), col("types"))
    val st = sess.select(col("user_id"), col("sess_us"),
      explode(col("types")).as("t"))
    val nSess = sess.agg(count(lit(1)).as("n_sess"))
    val perType = st.groupBy(col("t")).agg(count(lit(1)).as("n_t"))
    st.select(col("user_id"), col("sess_us"), col("t").as("t1"))
      .join(st.select(col("user_id"), col("sess_us"), col("t").as("t2")),
        Seq("user_id", "sess_us"))
      .filter(col("t1") < col("t2"))
      .groupBy(col("t1"), col("t2")).agg(count(lit(1)).as("n_both"))
      .join(broadcast(perType.select(col("t").as("t1"), col("n_t").as("n1"))),
        "t1")
      .join(broadcast(perType.select(col("t").as("t2"), col("n_t").as("n2"))),
        "t2")
      .crossJoin(broadcast(nSess))
      .select(col("t1"), col("t2"), col("n_both"), col("n1"), col("n2"),
        col("n_sess"),
        ((col("n_both") * col("n_sess")).cast("double")
          / (col("n1") * col("n2")).cast("double")).as("lift"))
      .orderBy(col("t1"), col("t2"))
  }

  private val typeAffinitySql =
    """WITH t AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us,
      |    CASE WHEN epoch_ns(ts) // 1000
      |           - lag(epoch_ns(ts) // 1000) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id)
      |           >= 300000000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |), s AS (
      |  SELECT *, SUM(new_sess) OVER
      |    (PARTITION BY user_id ORDER BY ts_us
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM t
      |), st AS (
      |  SELECT DISTINCT user_id, sess_id, event_type FROM s
      |), ns AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sess
      |  FROM (SELECT DISTINCT user_id, sess_id FROM s) q
      |), pt AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_t
      |  FROM st GROUP BY 1
      |), pr AS (
      |  SELECT a.event_type AS t1, b.event_type AS t2,
      |    CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM st a JOIN st b ON a.user_id = b.user_id
      |    AND a.sess_id = b.sess_id AND a.event_type < b.event_type
      |  GROUP BY 1, 2
      |)
      |SELECT t1, t2, n_both, x.n_t AS n1, y.n_t AS n2, n_sess,
      |  CAST(n_both * n_sess AS DOUBLE) / CAST(x.n_t * y.n_t AS DOUBLE)
      |    AS lift
      |FROM pr JOIN pt x ON x.event_type = t1
      |        JOIN pt y ON y.event_type = t2, ns
      |ORDER BY t1, t2""".stripMargin

  // ---- per-stage funnel latency ----------------------------------------

  /** Stage-to-stage funnel timing: first-signup→first-view and
    * first-view→first-purchase gaps per user (forward-ordered pairs
    * only), with exact rank-selected median/p90 per stage pair — q200's
    * single-hop latency generalized to the staged funnel. One per-user
    * conditional-min aggregate (no event self-join), then the shared
    * rank-percentile machinery per pair. */
  def funnelLatency(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
    val u = e.groupBy(col("user_id")).agg(
      min(when(col("event_type") === "signup", col("t"))).as("t_signup"),
      min(when(col("event_type") === "view", col("t"))).as("t_view"),
      min(when(col("event_type") === "purchase", col("t"))).as("t_purchase"))
    val sToV = u
      .filter(col("t_signup").isNotNull && col("t_view").isNotNull &&
        col("t_view") >= col("t_signup"))
      .select(lit("signup_to_view").as("stage_pair"), col("user_id"),
        (col("t_view") - col("t_signup")).as("gap_us"))
    val vToP = u
      .filter(col("t_view").isNotNull && col("t_purchase").isNotNull &&
        col("t_purchase") >= col("t_view"))
      .select(lit("view_to_purchase").as("stage_pair"), col("user_id"),
        (col("t_purchase") - col("t_view")).as("gap_us"))
    graft.ops.StatsOps.rankPercentiles(sToV.union(vToP),
        col("stage_pair"), col("gap_us"), col("user_id"))
      .withColumnRenamed("k", "stage_pair")
      .orderBy(col("stage_pair"))
  }

  private val funnelLatencySql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t FROM events
      |), u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'signup' THEN t END) AS t_signup,
      |    MIN(CASE WHEN event_type = 'view' THEN t END) AS t_view,
      |    MIN(CASE WHEN event_type = 'purchase' THEN t END) AS t_purchase
      |  FROM e GROUP BY 1
      |), g AS (
      |  SELECT 'signup_to_view' AS stage_pair, user_id,
      |    t_view - t_signup AS gap_us
      |  FROM u WHERE t_signup IS NOT NULL AND t_view IS NOT NULL
      |    AND t_view >= t_signup
      |  UNION ALL
      |  SELECT 'view_to_purchase', user_id, t_purchase - t_view
      |  FROM u WHERE t_view IS NOT NULL AND t_purchase IS NOT NULL
      |    AND t_purchase >= t_view
      |), r AS (
      |  SELECT stage_pair, gap_us,
      |    ROW_NUMBER() OVER (PARTITION BY stage_pair
      |      ORDER BY gap_us, user_id) AS rn,
      |    COUNT(*) OVER (PARTITION BY stage_pair) AS n
      |  FROM g
      |)
      |SELECT stage_pair, MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN gap_us END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN gap_us END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN gap_us END)
      |    AS p90
      |FROM r GROUP BY 1 ORDER BY stage_pair""".stripMargin

  // ---- seasonal-naive forecast error -----------------------------------

  /** Backtest of the seasonal-naive forecaster (ŷ(t) = y(t−7 days)) on
    * daily order revenue: exact integer-cent absolute errors over all
    * day pairs present at both ends, one division for the MAE — the
    * baseline every forecasting pipeline must beat, evaluated
    * engine-exactly. One aggregate + one self-equi-join on the shifted
    * day key. */
  def seasonalNaiveError(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as long)"))
        .cast("long").as("cents"))
    val lagged = d.select((col("day") + 7).as("day"),
      col("cents").as("cents_prev"))
    d.join(lagged, "day")
      .agg(count(lit(1)).as("n_pairs"),
        sum(abs(col("cents") - col("cents_prev")))
          .cast("long").as("sum_abs_err"),
        max(abs(col("cents") - col("cents_prev"))).as("max_abs_err"))
      .select(col("n_pairs"), col("sum_abs_err"), col("max_abs_err"),
        (col("sum_abs_err").cast("double") / col("n_pairs").cast("double"))
          .as("mae_cents"))
  }

  private val seasonalNaiveErrorSql =
    """WITH d AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), j AS (
      |  SELECT a.cents, b.cents AS cents_prev
      |  FROM d a JOIN d b ON a.day = b.day + 7
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(abs(cents - cents_prev)) AS BIGINT) AS sum_abs_err,
      |  CAST(MAX(abs(cents - cents_prev)) AS BIGINT) AS max_abs_err,
      |  CAST(SUM(abs(cents - cents_prev)) AS DOUBLE) / COUNT(*) AS mae_cents
      |FROM j""".stripMargin

  // ---- session abandonment by day --------------------------------------

  /** Daily session-abandonment report: per session-start day, total
    * sessions, purchasing sessions, and abandoned sessions (saw a view,
    * never purchased) — the canonical conversion-health dashboard. One
    * sessionizing aggregate with per-session boolean flags folded in
    * (no second pass over events), then a tiny daily rollup. */
  def abandonment(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(
        max(when(col("event_type") === "view", 1).otherwise(0))
          .as("has_view"),
        max(when(col("event_type") === "purchase", 1).otherwise(0))
          .as("has_purchase"))
      .select(
        expr("unix_micros(session_window.start) div 86400000000").as("day"),
        col("has_view"), col("has_purchase"))
      .groupBy(col("day"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(col("has_purchase")).cast("long").as("n_purchase"),
        sum(when(col("has_view") === 1 && col("has_purchase") === 0, 1L)
          .otherwise(0L)).cast("long").as("n_abandoned"))
      .orderBy(col("day"))

  private val abandonmentSql =
    """WITH t AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS ts_us,
      |    CASE WHEN epoch_ns(ts) // 1000
      |           - lag(epoch_ns(ts) // 1000) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id)
      |           >= 300000000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |), s AS (
      |  SELECT *, SUM(new_sess) OVER
      |    (PARTITION BY user_id ORDER BY ts_us
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM t
      |), sess AS (
      |  SELECT user_id, sess_id, MIN(ts_us) AS start_us,
      |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS has_view,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS has_purchase
      |  FROM s GROUP BY 1, 2
      |)
      |SELECT start_us // 86400000000 AS day,
      |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
      |  CAST(SUM(has_purchase) AS BIGINT) AS n_purchase,
      |  CAST(SUM(CASE WHEN has_view = 1 AND has_purchase = 0 THEN 1
      |    ELSE 0 END) AS BIGINT) AS n_abandoned
      |FROM sess GROUP BY 1 ORDER BY day""".stripMargin

  // ---- first-touch mix -------------------------------------------------

  /** Acquisition-integrity audit: which event type each user's history
    * STARTS with (rank-1 row per user, deterministic (ts, event_id)
    * order), rolled to a type mix — cold-start purchases with no prior
    * view/signup surface here as a tracking bug. One user-keyed window,
    * WindowGroupLimit-prunable to rank 1. */
  def firstTouch(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(col("event_type").as("first_event_type"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("first_event_type"))
  }

  private val firstTouchSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_ns(ts) // 1000 AS ts_us
      |  FROM events
      |), r AS (
      |  SELECT event_type,
      |    ROW_NUMBER() OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) AS rn
      |  FROM e
      |)
      |SELECT event_type AS first_event_type, COUNT(*) AS n_users
      |FROM r WHERE rn = 1
      |GROUP BY 1 ORDER BY first_event_type""".stripMargin

  // ---- inter-arrival gap histogram (log scale) -------------------------

  /** Power-of-two histogram of per-user inter-arrival gaps — q257's
    * percentile view replaced by the full log-scale shape (the
    * heavy-tail diagnostic). Integer bit-length bucketing (q162's
    * trick), no floating log2; zero gaps clamp to the 1 µs bucket
    * identically on both engines. */
  def gapHistogram(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts_us"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("next_us", lead(col("ts_us"), 1).over(w))
      .filter(col("next_us").isNotNull)
      .select(greatest(col("next_us") - col("ts_us"), lit(1L)).as("gap_us"))
      .withColumn("bits", length(conv(col("gap_us"), 10, 2)))
      .withColumn("bucket_lo",
        expr("CAST(shiftleft(CAST(1 AS BIGINT), bits - 1) AS BIGINT)"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_gaps"),
        min(col("gap_us")).as("min_gap_us"),
        max(col("gap_us")).as("max_gap_us"))
      .orderBy(col("bucket_lo"))
  }

  private val gapHistogramSql =
    """WITH e AS (
      |  SELECT user_id, event_id, epoch_ns(ts) // 1000 AS ts_us FROM events
      |), g AS (
      |  SELECT lead(ts_us, 1) OVER (PARTITION BY user_id
      |      ORDER BY ts_us, event_id) - ts_us AS raw_gap
      |  FROM e
      |), f AS (
      |  SELECT greatest(raw_gap, 1) AS gap_us FROM g
      |  WHERE raw_gap IS NOT NULL
      |)
      |SELECT CAST(1 AS BIGINT)
      |    << (length(ltrim(bin(CAST(gap_us AS BIGINT)), '0')) - 1)
      |    AS bucket_lo,
      |  COUNT(*) AS n_gaps, MIN(gap_us) AS min_gap_us,
      |  MAX(gap_us) AS max_gap_us
      |FROM f
      |GROUP BY 1 ORDER BY bucket_lo""".stripMargin

  // ---- session duration percentiles ------------------------------------

  /** Exact session-duration distribution: median/p90 of 5-minute-gap
    * session lengths (close time − start, so a single-event session
    * lasts exactly the gap) via the shared rank-percentile machinery —
    * q260's count histogram complemented by the duration shape. The
    * sessionizing aggregate is the only corpus-sized pass. */
  def sessionDurations(spark: SparkSession, dir: String): DataFrame = {
    val sess = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"), session_window(col("ts"), "5 minutes"))
      .agg(count(lit(1)).as("n_events"))
      .select(col("user_id"),
        unix_micros(col("session_window.start")).as("start_us"),
        (unix_micros(col("session_window.end"))
          - unix_micros(col("session_window.start"))).as("dur_us"))
    graft.ops.StatsOps.globalRankPercentiles(
      sess, col("dur_us"), struct(col("start_us"), col("user_id")))
  }

  private val sessionDurationsSql =
    """WITH t AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us,
      |    CASE WHEN epoch_ns(ts) // 1000
      |           - lag(epoch_ns(ts) // 1000) OVER
      |             (PARTITION BY user_id ORDER BY ts, event_id)
      |           >= 300000000
      |         OR lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
      |           IS NULL
      |    THEN 1 ELSE 0 END AS new_sess
      |  FROM events
      |), s AS (
      |  SELECT *, SUM(new_sess) OVER
      |    (PARTITION BY user_id ORDER BY ts_us
      |     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sess_id
      |  FROM t
      |), sess AS (
      |  SELECT user_id, MIN(ts_us) AS start_us,
      |    MAX(ts_us) + 300000000 - MIN(ts_us) AS dur_us
      |  FROM s GROUP BY user_id, sess_id
      |), r AS (
      |  SELECT dur_us,
      |    ROW_NUMBER() OVER (ORDER BY dur_us, start_us, user_id) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM sess
      |)
      |SELECT MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN dur_us END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN dur_us END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN dur_us END)
      |    AS p90
      |FROM r""".stripMargin

  // ---- repeat-purchase summary -----------------------------------------

  /** One-time vs repeat buyers: purchase-count per user folded into the
    * repeat-rate summary every commerce dashboard leads with — exact
    * integers plus one division. Two combinable aggregates. */
  def repeatPurchase(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .filter(col("event_type") === "purchase")
      .groupBy(col("user_id")).agg(count(lit(1)).as("np"))
      .agg(count(lit(1)).as("n_buyers"),
        sum(when(col("np") === 1, 1L).otherwise(0L))
          .cast("long").as("n_one_time"),
        sum(when(col("np") >= 2, 1L).otherwise(0L))
          .cast("long").as("n_repeat"),
        sum(col("np")).cast("long").as("n_purchases"))
      .select(col("n_buyers"), col("n_one_time"), col("n_repeat"),
        col("n_purchases"),
        (col("n_repeat").cast("double") / col("n_buyers").cast("double"))
          .as("repeat_rate"))

  private val repeatPurchaseSql =
    """WITH u AS (
      |  SELECT user_id, COUNT(*) AS np FROM events
      |  WHERE event_type = 'purchase' GROUP BY 1
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_buyers,
      |  CAST(SUM(CASE WHEN np = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_one_time,
      |  CAST(SUM(CASE WHEN np >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeat,
      |  CAST(SUM(np) AS BIGINT) AS n_purchases,
      |  CAST(SUM(CASE WHEN np >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / COUNT(*) AS repeat_rate
      |FROM u""".stripMargin

  // ---- algebraic partial-aggregate merge -------------------------------

  /** Two-level aggregation exercising the algebraic-merge property every
    * distributed agg relies on: shard the table (event_id parity, standing
    * in for "two ingest partitions computed on different days"), compute
    * per-shard partials (n, Σcents, min, max), then MERGE the partials —
    * Σn, ΣΣ, min-of-mins, max-of-maxes — instead of re-touching rows.
    * The merged result must equal the direct one-pass aggregate (the
    * oracle): that equality is exactly what lets a 100 TB pipeline keep
    * per-partition/per-day partials and fold them without a rescan.
    * Integer cents throughout; one mirrored division for the mean. */
  def partialMerge(spark: SparkSession, dir: String): DataFrame = {
    val partials = Catalog.load(spark, dir, "events")
      .select(col("event_type"), (col("event_id") % 2).as("shard"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .groupBy(col("event_type"), col("shard"))
      .agg(count(lit(1)).as("pn"), sum(col("cents")).cast("long").as("ps"),
        min(col("cents")).as("pmin"), max(col("cents")).as("pmax"))
    partials.groupBy(col("event_type"))
      .agg(sum(col("pn")).cast("long").as("n"),
        sum(col("ps")).cast("long").as("sum_c"),
        min(col("pmin")).as("min_c"), max(col("pmax")).as("max_c"))
      .select(col("event_type"), col("n"), col("sum_c"), col("min_c"),
        col("max_c"),
        (col("sum_c").cast("double") / col("n").cast("double"))
          .as("avg_c"))
      .orderBy(col("event_type"))
  }

  private val partialMergeSql =
    """SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS sum_c,
      |  CAST(MIN(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS min_c,
      |  CAST(MAX(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS max_c,
      |  CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS DOUBLE) / COUNT(*)
      |    AS avg_c
      |FROM events GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- day-of-week × hour activity heatmap -----------------------------

  /** Traffic heatmap: events and distinct users per (ISO weekday, hour)
    * cell — the load-shape profile capacity planning reads. ISO weekday
    * (Mon=1) is the one day-numbering both engines can produce exactly
    * (Spark `weekday()+1` == DuckDB `isodow()`); Sunday-based
    * `dayofweek` disagrees across engines. 168 output cells from one
    * exact aggregate. */
  def dowHourHeat(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .select(expr("CAST(weekday(ts) + 1 AS BIGINT)").as("isodow"),
        expr("CAST(hour(ts) AS BIGINT)").as("hr"), col("user_id"))
      .groupBy(col("isodow"), col("hr"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("user_id")).as("nd_users"))
      .orderBy(col("isodow"), col("hr"))

  private val dowHourHeatSql =
    """SELECT CAST(isodow(ts) AS BIGINT) AS isodow,
      |  CAST(hour(ts) AS BIGINT) AS hr,
      |  CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS nd_users
      |FROM events GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- integer-exact daily volume anomaly flags ------------------------

  /** Daily event-volume anomaly flags (|n − μ| > 2σ over the full span)
    * with ZERO floating point: the 2σ test is algebraically cleared of
    * divisions — (n·d − Σn)² > 4·(d·Σn² − (Σn)²) — and evaluated in
    * DECIMAL(38,0), so the flag is bit-identical on any engine and safe
    * at any scale (the squares overflow BIGINT around 1e9 events/day).
    * One daily aggregate; the moment sums are a 1-row cross-joined
    * rollup of those ~O(days) rows. */
  def dailyAnomaly(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "events")
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"))
      .agg(count(lit(1)).as("n"))
    val m = d.agg(count(lit(1)).as("dcnt"),
      sum(col("n")).cast("long").as("s"),
      sum(col("n") * col("n")).cast("long").as("q"))
    d.crossJoin(m)
      .select(col("day"), col("n"),
        when((col("n") * col("dcnt") - col("s")).cast("decimal(38,0)")
            * (col("n") * col("dcnt") - col("s")).cast("decimal(38,0)")
          > (lit(4).cast("decimal(38,0)") *
              (col("dcnt") * col("q") - col("s") * col("s"))
                .cast("decimal(38,0)")),
          1L).otherwise(0L).as("is_anomaly"))
      .orderBy(col("day"))
  }

  private val dailyAnomalySql =
    """WITH d AS (
      |  SELECT epoch_ns(ts) // 1000 // 86400000000 AS day,
      |    CAST(COUNT(*) AS BIGINT) AS n
      |  FROM events GROUP BY 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS dcnt,
      |    CAST(SUM(n) AS BIGINT) AS s, CAST(SUM(n * n) AS BIGINT) AS q
      |  FROM d
      |)
      |SELECT day, n,
      |  CAST(CASE WHEN
      |      CAST(n * dcnt - s AS DECIMAL(38,0))
      |        * CAST(n * dcnt - s AS DECIMAL(38,0))
      |      > CAST(4 AS DECIMAL(38,0))
      |        * CAST(dcnt * q - s * s AS DECIMAL(38,0))
      |    THEN 1 ELSE 0 END AS BIGINT) AS is_anomaly
      |FROM d, m ORDER BY day""".stripMargin

  // ---- first-event → first-purchase conversion time --------------------

  /** Time-to-convert distribution: whole hours between a user's first
    * event of any kind and their first purchase, summarized as exact
    * rank-selected n/median/p90 via the shared percentile recipe. Two
    * conditional mins in ONE grouped pass (no join of two aggregates),
    * then the ~converted-users-sized percentile window. */
  def timeToConvert(spark: SparkSession, dir: String): DataFrame = {
    val per = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(min(unix_micros(col("ts"))).as("t0"),
        min(when(col("event_type") === "purchase",
          unix_micros(col("ts")))).as("tp"))
      .filter(col("tp").isNotNull)
      .select(col("user_id"),
        expr("(tp - t0) div 3600000000").as("hours"))
    graft.ops.StatsOps.globalRankPercentiles(
      per, col("hours"), col("user_id"))
  }

  private val timeToConvertSql =
    """WITH per AS (
      |  SELECT user_id, MIN(epoch_ns(ts) // 1000) AS t0,
      |    MIN(CASE WHEN event_type = 'purchase'
      |        THEN epoch_ns(ts) // 1000 END) AS tp
      |  FROM events GROUP BY 1
      |), h AS (
      |  SELECT user_id, (tp - t0) // 3600000000 AS hours
      |  FROM per WHERE tp IS NOT NULL
      |), r AS (
      |  SELECT hours, ROW_NUMBER() OVER (ORDER BY hours, user_id) AS rn,
      |    COUNT(*) OVER () AS n
      |  FROM h
      |)
      |SELECT MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN hours END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN hours END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN hours END)
      |    AS p90
      |FROM r""".stripMargin

  // ---- monthly revenue growth-accounting bridge ------------------------

  /** Growth-accounting revenue bridge: each month's revenue split into
    * new (customer's first month), retained (also bought last month) and
    * resurrected (bought before, but not last month), plus the churned
    * column — last month's revenue from customers who did NOT return
    * this month. The four columns are the canonical SaaS/commerce
    * "where did growth come from" decomposition. Everything is one
    * (customer, month) cents aggregate plus self-joins at month−1 —
    * key-partitioned, no window over the whole table, exact integers. */
  def revenueBridge(spark: SparkSession, dir: String): DataFrame = {
    val cm = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey").as("c"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("m"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long").as("v"))
      .localCheckpoint(false)
    val first = cm.groupBy(col("c")).agg(min(col("m")).as("m0"))
    val prev = cm.select(col("c"), (col("m") + 1).as("m"),
      col("v").as("v_prev"))
    val classed = cm.join(first, "c")
      .join(prev, Seq("c", "m"), "left")
      .select(col("m"),
        when(col("m") === col("m0"), col("v")).otherwise(0L).as("new_v"),
        when(col("v_prev").isNotNull && col("m") =!= col("m0"), col("v"))
          .otherwise(0L).as("ret_v"),
        when(col("v_prev").isNull && col("m") =!= col("m0"), col("v"))
          .otherwise(0L).as("res_v"))
      .groupBy(col("m"))
      .agg(sum(col("new_v")).cast("long").as("new_c"),
        sum(col("ret_v")).cast("long").as("retained_c"),
        sum(col("res_v")).cast("long").as("resurrected_c"))
    val churned = prev
      .join(cm.select(col("c"), col("m")), Seq("c", "m"), "left_anti")
      .groupBy(col("m"))
      .agg(sum(col("v_prev")).cast("long").as("churned_c"))
    classed.join(churned, Seq("m"), "left")
      .select(col("m"), col("new_c"), col("retained_c"),
        col("resurrected_c"),
        coalesce(col("churned_c"), lit(0L)).as("churned_c"))
      .orderBy(col("m"))
  }

  private val revenueBridgeSql =
    """WITH cm AS (
      |  SELECT o_custkey AS c,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS m,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS v
      |  FROM orders GROUP BY 1, 2
      |), f AS (
      |  SELECT c, MIN(m) AS m0 FROM cm GROUP BY 1
      |), cl AS (
      |  SELECT cm.m,
      |    CAST(SUM(CASE WHEN cm.m = f.m0 THEN cm.v ELSE 0 END) AS BIGINT)
      |      AS new_c,
      |    CAST(SUM(CASE WHEN p.c IS NOT NULL AND cm.m <> f.m0
      |      THEN cm.v ELSE 0 END) AS BIGINT) AS retained_c,
      |    CAST(SUM(CASE WHEN p.c IS NULL AND cm.m <> f.m0
      |      THEN cm.v ELSE 0 END) AS BIGINT) AS resurrected_c
      |  FROM cm
      |  JOIN f ON f.c = cm.c
      |  LEFT JOIN cm p ON p.c = cm.c AND p.m = cm.m - 1
      |  GROUP BY 1
      |), ch AS (
      |  SELECT p.m + 1 AS m, CAST(SUM(p.v) AS BIGINT) AS churned_c
      |  FROM cm p
      |  LEFT JOIN cm cur ON cur.c = p.c AND cur.m = p.m + 1
      |  WHERE cur.c IS NULL
      |  GROUP BY 1
      |)
      |SELECT cl.m, cl.new_c, cl.retained_c, cl.resurrected_c,
      |  COALESCE(ch.churned_c, 0) AS churned_c
      |FROM cl LEFT JOIN ch ON ch.m = cl.m
      |ORDER BY cl.m""".stripMargin

  // ---- weekly order-value quartile bands -------------------------------

  /** Weekly p25/p50/p75 bands of order value — the spread-over-time view
    * (is the mix shifting, not just the mean). Exact rank selection at
    * ceil(q·n) per epoch-week partition (single-rank, no interpolation —
    * same convention both engines), integer cents, deterministic
    * orderkey tiebreak. One week-keyed window over the order table. */
  def weeklyQuartiles(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val o = Catalog.load(spark, dir, "orders")
      .select(expr("unix_micros(o_orderdate) div 86400000000 div 7")
          .as("week"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        col("o_orderkey"))
    val w = Window.partitionBy(col("week"))
    o.withColumn("rn", row_number().over(
        w.orderBy(col("cents"), col("o_orderkey"))))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy(col("week"))
      .agg(max(col("n")).as("n"),
        max(when(expr("rn = cast(ceil(n * 0.25) as bigint)"),
          col("cents"))).as("p25_c"),
        max(when(expr("rn = cast(ceil(n * 0.5) as bigint)"),
          col("cents"))).as("p50_c"),
        max(when(expr("rn = cast(ceil(n * 0.75) as bigint)"),
          col("cents"))).as("p75_c"))
      .orderBy(col("week"))
  }

  private val weeklyQuartilesSql =
    """WITH o AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 // 7 AS week,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      |  FROM orders
      |), r AS (
      |  SELECT week, cents,
      |    ROW_NUMBER() OVER (PARTITION BY week ORDER BY cents, o_orderkey)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY week) AS n
      |  FROM o
      |)
      |SELECT week, CAST(MAX(n) AS BIGINT) AS n,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN cents END)
      |    AS p25_c,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.5) AS BIGINT) THEN cents END)
      |    AS p50_c,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN cents END)
      |    AS p75_c
      |FROM r GROUP BY week ORDER BY week""".stripMargin

  // ---- cohort LTV curve ------------------------------------------------

  /** Cohort lifetime-value curve: purchase revenue per (signup-week
    * cohort, weeks-since-signup age), with the running cumulative —
    * "how much has the week-N cohort spent by age K", the LTV payback
    * view next to q112's retention matrix. Cohort = the user's first
    * event week (any type). Exact integer cents; the cumulative window
    * runs over the cohort×age aggregate (~weeks² rows), never raw
    * events. */
  def cohortLtv(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ev = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000 div 7").as("wk"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val cohort = ev.groupBy(col("user_id")).agg(min(col("wk")).as("cw"))
    ev.filter(col("event_type") === "purchase")
      .join(cohort, "user_id")
      .groupBy(col("cw"), (col("wk") - col("cw")).as("age"))
      .agg(sum(col("cents")).cast("long").as("rev_c"))
      .withColumn("cum_rev_c",
        sum(col("rev_c")).over(Window.partitionBy(col("cw"))
          .orderBy(col("age"))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
          .cast("long"))
      .orderBy(col("cw"), col("age"))
  }

  private val cohortLtvSql =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    epoch_ns(ts) // 1000 // 86400000000 // 7 AS wk,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), cohort AS (
      |  SELECT user_id, MIN(wk) AS cw FROM ev GROUP BY 1
      |), a AS (
      |  SELECT c.cw, e.wk - c.cw AS age,
      |    CAST(SUM(e.cents) AS BIGINT) AS rev_c
      |  FROM ev e JOIN cohort c ON c.user_id = e.user_id
      |  WHERE e.event_type = 'purchase'
      |  GROUP BY 1, 2
      |)
      |SELECT cw, age, rev_c,
      |  CAST(SUM(rev_c) OVER (PARTITION BY cw ORDER BY age
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS cum_rev_c
      |FROM a ORDER BY cw, age""".stripMargin

  // ---- time-windowed funnel --------------------------------------------

  /** Conversion-window funnel: signup → first view WITHIN 72h → first
    * purchase WITHIN 72h of that view. Unlike q111's unbounded strict
    * order, each step must land inside the attribution window — the
    * form marketing actually reports. Two user-keyed conditional-min
    * joins against the event table (work ∝ events, state ∝ users; no
    * event×event self-join), exact microsecond arithmetic, one row of
    * stage counts with nullif-guarded rates. */
  def windowedFunnel(spark: SparkSession, dir: String): DataFrame = {
    val win = 72L * 3600000000L // 72h in µs
    val ev = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("t"))
      .localCheckpoint(false)
    val s = ev.filter(col("event_type") === "signup")
      .groupBy(col("user_id")).agg(min(col("t")).as("ts0"))
    val v = s.join(ev.filter(col("event_type") === "view"), "user_id")
      .filter(col("t") > col("ts0") && col("t") <= col("ts0") + win)
      .groupBy(col("user_id")).agg(min(col("ts0")).as("ts0"),
        min(col("t")).as("tv"))
    val p = v.join(ev.filter(col("event_type") === "purchase"), "user_id")
      .filter(col("t") > col("tv") && col("t") <= col("tv") + win)
      .groupBy(col("user_id")).agg(count(lit(1)).as("np"))
    val ns = s.agg(count(lit(1)).as("c")).select(col("c"))
    val nv = v.agg(count(lit(1)).as("c")).select(col("c"))
    val np = p.agg(count(lit(1)).as("c")).select(col("c"))
    ns.crossJoin(broadcast(nv.withColumnRenamed("c", "cv")))
      .crossJoin(broadcast(np.withColumnRenamed("c", "cp")))
      .select(col("c").as("n_signup"), col("cv").as("n_view_72h"),
        col("cp").as("n_purchase_72h"),
        (col("cv").cast("double") /
          nullif(col("c"), lit(0)).cast("double")).as("view_rate"),
        (col("cp").cast("double") /
          nullif(col("cv"), lit(0)).cast("double")).as("purchase_rate"))
  }

  private val windowedFunnelSql =
    """WITH ev AS (
      |  SELECT user_id, event_type, epoch_ns(ts) // 1000 AS t FROM events
      |), s AS (
      |  SELECT user_id, MIN(t) AS ts0 FROM ev
      |  WHERE event_type = 'signup' GROUP BY 1
      |), v AS (
      |  SELECT s.user_id, MIN(s.ts0) AS ts0, MIN(e.t) AS tv
      |  FROM s JOIN ev e ON e.user_id = s.user_id
      |  WHERE e.event_type = 'view'
      |    AND e.t > s.ts0 AND e.t <= s.ts0 + 259200000000
      |  GROUP BY 1
      |), p AS (
      |  SELECT v.user_id, COUNT(*) AS np
      |  FROM v JOIN ev e ON e.user_id = v.user_id
      |  WHERE e.event_type = 'purchase'
      |    AND e.t > v.tv AND e.t <= v.tv + 259200000000
      |  GROUP BY 1
      |)
      |SELECT
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM s) AS n_signup,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM v) AS n_view_72h,
      |  (SELECT CAST(COUNT(*) AS BIGINT) FROM p) AS n_purchase_72h,
      |  CAST((SELECT COUNT(*) FROM v) AS DOUBLE)
      |    / nullif((SELECT COUNT(*) FROM s), 0) AS view_rate,
      |  CAST((SELECT COUNT(*) FROM p) AS DOUBLE)
      |    / nullif((SELECT COUNT(*) FROM v), 0) AS purchase_rate""".stripMargin

  // ---- JSON-dimension conversion segments ------------------------------

  /** Conversion rate segmented by a dimension that exists only inside
    * the JSON props payload (k-decile): the parse-then-pivot pattern
    * every semi-structured event store runs. JSON extraction happens
    * once per event in the same scan as the aggregation (no separate
    * parse pass); per bucket: exact distinct users / purchasers and a
    * nullif-guarded rate. */
  def propsSegment(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .select(get_json_object(col("props"), "$.k").cast("long").as("k"),
        col("user_id"), col("event_type"))
      // integer division on BOTH engines: a double-division-then-cast
      // would truncate here but round in the oracle
      .select(expr("k div 10").as("k_decile"), col("user_id"),
        col("event_type"))
      .groupBy(col("k_decile"))
      .agg(countDistinct(col("user_id")).as("n_users"),
        countDistinct(when(col("event_type") === "purchase",
          col("user_id"))).as("n_buyers"))
      .select(col("k_decile"), col("n_users"), col("n_buyers"),
        (col("n_buyers").cast("double") /
          nullif(col("n_users"), lit(0)).cast("double")).as("buy_rate"))
      .orderBy(col("k_decile"))

  private val propsSegmentSql =
    """WITH e AS (
      |  SELECT CAST(json_extract_string(props, '$.k') AS BIGINT) // 10
      |      AS k_decile,
      |    user_id, event_type
      |  FROM events
      |)
      |SELECT k_decile,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
      |    THEN user_id END) AS BIGINT) AS n_buyers,
      |  CAST(COUNT(DISTINCT CASE WHEN event_type = 'purchase'
      |    THEN user_id END) AS DOUBLE)
      |    / nullif(COUNT(DISTINCT user_id), 0) AS buy_rate
      |FROM e GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- feature-store materialization -----------------------------------

  /** Per-user ML feature vector in ONE grouped pass: event volume,
    * purchase count, exact spend cents, active days, tenure, behavioral
    * breadth (distinct types), and recency vs the global horizon — the
    * feature-store materialization a churn model trains on. Every
    * feature is an exact integer; the one scan produces all of them
    * (per-feature queries would rescan the table per feature at
    * 100 TB). */
  def userFeatures(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        expr("unix_micros(ts) div 86400000000").as("day"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
      .localCheckpoint(false)
    val horizon = ev.agg(max(col("day")).as("hmax"))
    ev.groupBy(col("user_id"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .cast("long").as("n_purchases"),
        sum(when(col("event_type") === "purchase", col("cents"))
          .otherwise(0L)).cast("long").as("spend_c"),
        countDistinct(col("day")).as("active_days"),
        countDistinct(col("event_type")).as("n_types"),
        min(col("day")).as("first_day"), max(col("day")).as("last_day"))
      .crossJoin(broadcast(horizon))
      .select(col("user_id"), col("n_events"), col("n_purchases"),
        col("spend_c"), col("active_days"), col("n_types"),
        (col("last_day") - col("first_day")).as("tenure_days"),
        (col("hmax") - col("last_day")).as("recency_days"))
      .orderBy(col("user_id"))
  }

  private val userFeaturesSql =
    """WITH ev AS (
      |  SELECT user_id, event_type,
      |    epoch_ns(ts) // 1000 // 86400000000 AS day,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), h AS (SELECT MAX(day) AS hmax FROM ev)
      |SELECT user_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchases,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN cents ELSE 0 END)
      |    AS BIGINT) AS spend_c,
      |  CAST(COUNT(DISTINCT day) AS BIGINT) AS active_days,
      |  CAST(COUNT(DISTINCT event_type) AS BIGINT) AS n_types,
      |  CAST(MAX(day) - MIN(day) AS BIGINT) AS tenure_days,
      |  CAST(MAX(hmax) - MAX(day) AS BIGINT) AS recency_days
      |FROM ev, h GROUP BY user_id ORDER BY user_id""".stripMargin

  // ---- supervised training frame ---------------------------------------

  /** Supervised-learning training frame: per (user, week) — this week's
    * spend and event count, the two lagged weeks' spend (features), and
    * NEXT week's spend (the label) — the time-shifted frame every
    * forecasting/churn model trains on, materialized with leakage-safe
    * alignment (features strictly before the label window). Lag/lead
    * over the user-week aggregate: state ∝ user-weeks, one user-keyed
    * window exchange. */
  def trainingFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val uw = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"),
        expr("unix_micros(ts) div 86400000000 div 7").as("wk"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase",
          expr("CAST(round(value * 100) AS BIGINT)")).otherwise(0L))
          .cast("long").as("spend_c"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("wk"))
    uw.select(col("user_id"), col("wk"), col("n_events"), col("spend_c"),
        lag(col("spend_c"), 1).over(w).as("spend_lag1"),
        lag(col("spend_c"), 2).over(w).as("spend_lag2"),
        lead(col("spend_c"), 1).over(w).as("label_next_spend"))
      .orderBy(col("user_id"), col("wk"))
  }

  private val trainingFrameSql =
    """WITH uw AS (
      |  SELECT user_id,
      |    epoch_ns(ts) // 1000 // 86400000000 // 7 AS wk,
      |    CAST(COUNT(*) AS BIGINT) AS n_events,
      |    CAST(SUM(CASE WHEN event_type = 'purchase'
      |      THEN CAST(round(value * 100) AS BIGINT) ELSE 0 END) AS BIGINT)
      |      AS spend_c
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT user_id, wk, n_events, spend_c,
      |  lag(spend_c, 1) OVER (PARTITION BY user_id ORDER BY wk)
      |    AS spend_lag1,
      |  lag(spend_c, 2) OVER (PARTITION BY user_id ORDER BY wk)
      |    AS spend_lag2,
      |  lead(spend_c, 1) OVER (PARTITION BY user_id ORDER BY wk)
      |    AS label_next_spend
      |FROM uw ORDER BY user_id, wk""".stripMargin

  // ---- Brier score decomposition -----------------------------------------

  /** MURPHY decomposition of the binned Brier score for q209's
    * value-as-confidence purchase predictor: reliability (how far each
    * bin's forecast sits from its observed rate — the part calibration
    * fixes), resolution (how much the bins separate outcomes — the
    * part only a better feature fixes), and uncertainty (the
    * irreducible base-rate term), with binned Brier = REL − RES + UNC.
    * q209 plots the curve; this scores it and says WHICH defect
    * dominates. Forecasts are the clipped exact value cents / 50000;
    * every per-bin term is a cross-multiplied integer squared over a
    * floored micro-division (10 bins → ≤10 micro-units of floor
    * slack), so the whole decomposition is engine-exact. */
  def brierDecomposition(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val e = Catalog.load(spark, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(least(expr("CAST(round(value * 100) AS BIGINT)"), lit(50000L))
          .as("cc"),
        (col("event_type") === "purchase").cast("long").as("pos"))
      .withColumn("bin", least(expr("cc div 5000"), lit(9L)))
    val bins = e.groupBy(col("bin"))
      .agg(count(lit(1)).as("n_k"), sum(col("pos")).as("p_k"),
        sum(col("cc")).as("s_k"))
    val tot = bins.agg(sum(col("n_k")).as("n"), sum(col("p_k")).as("p"))
    bins.crossJoin(broadcast(tot))
      .select(col("n"), col("p"),
        expr(s"""CAST((CAST(s_k - 50000 * p_k AS $dec)
                 * (s_k - 50000 * p_k) * 1000000)
                 div (CAST(n_k AS $dec) * 2500000000) AS BIGINT)""")
          .as("rel_k"),
        expr(s"""CAST((CAST(p_k AS $dec) * n - CAST(p AS $dec) * n_k)
                 * (CAST(p_k AS $dec) * n - CAST(p AS $dec) * n_k)
                 * 1000000
                 div (CAST(n_k AS $dec) * n * n) AS BIGINT)""").as("res_k"))
      .groupBy(col("n"), col("p"))
      .agg(sum(col("rel_k")).as("rel_micro"),
        sum(col("res_k")).as("res_micro"))
      .select(col("n"), col("p").as("n_pos"),
        col("rel_micro"), col("res_micro"),
        expr(s"""CAST((CAST(p AS $dec) * (n - p) * 1000000)
                 div (CAST(n AS $dec) * n) AS BIGINT)""").as("unc_micro"))
      .withColumn("brier_micro",
        col("rel_micro") - col("res_micro") + col("unc_micro"))
  }

  private val brierDecompositionSql =
    """WITH e AS (
      |  SELECT least(CAST(round(value * 100) AS BIGINT), 50000) AS cc,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |), b AS (
      |  SELECT least(cc // 5000, 9) AS bin, CAST(COUNT(*) AS BIGINT) AS n_k,
      |    CAST(SUM(pos) AS BIGINT) AS p_k, CAST(SUM(cc) AS BIGINT) AS s_k
      |  FROM e GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(n_k) AS BIGINT) AS n, CAST(SUM(p_k) AS BIGINT) AS p
      |  FROM b
      |), k AS (
      |  SELECT n, p,
      |    CAST((CAST(s_k - 50000 * p_k AS HUGEINT)
      |      * (s_k - 50000 * p_k) * 1000000)
      |      // (CAST(n_k AS HUGEINT) * 2500000000) AS BIGINT) AS rel_k,
      |    CAST((CAST(p_k AS HUGEINT) * n - CAST(p AS HUGEINT) * n_k)
      |      * (CAST(p_k AS HUGEINT) * n - CAST(p AS HUGEINT) * n_k)
      |      * 1000000
      |      // (CAST(n_k AS HUGEINT) * n * n) AS BIGINT) AS res_k
      |  FROM b, t
      |), m AS (
      |  SELECT n, p, CAST(SUM(rel_k) AS BIGINT) AS rel_micro,
      |    CAST(SUM(res_k) AS BIGINT) AS res_micro
      |  FROM k GROUP BY 1, 2
      |)
      |SELECT n, p AS n_pos, rel_micro, res_micro,
      |  CAST((CAST(p AS HUGEINT) * (n - p) * 1000000)
      |    // (CAST(n AS HUGEINT) * n) AS BIGINT) AS unc_micro,
      |  rel_micro - res_micro
      |    + CAST((CAST(p AS HUGEINT) * (n - p) * 1000000)
      |      // (CAST(n AS HUGEINT) * n) AS BIGINT) AS brier_micro
      |FROM m""".stripMargin

  // ---- Lin's concordance correlation ---------------------------------------

  /** LIN'S CONCORDANCE correlation between the 7-day seasonal-naive
    * forecast and the actual daily revenue — the agreement metric
    * q270's MAE and Pearson's r both miss: r rewards any linear
    * relation (a forecast that is always 2× actual gets r = 1), CCC
    * demands identity-line agreement, penalizing both scale and
    * location bias. CCC = 2(nΣxy−ΣxΣy) /
    * (nΣx²−(Σx)² + nΣy²−(Σy)² + (Σx−Σy)²) — ONE exact decimal ratio
    * from five moment sums; Pearson r reported next to it so the gap
    * IS the bias readout. */
  def linCcc(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val lagged = d.select((col("day") + 7).as("day"),
      col("cents").as("x"))
    d.select(col("day"), col("cents").as("y"))
      .join(lagged, "day")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr(s"CAST(CAST(x AS $dec) * y AS $dec)")).as("sxy"),
        sum(expr(s"CAST(CAST(x AS $dec) * x AS $dec)")).as("sxx"),
        sum(expr(s"CAST(CAST(y AS $dec) * y AS $dec)")).as("syy"))
      .select(col("n"),
        (expr(s"CAST(2 * (n * sxy - CAST(sx AS $dec) * sy) AS $dec)")
          .cast("double")
          / expr(s"""CAST(n * sxx - CAST(sx AS $dec) * sx
                     + n * syy - CAST(sy AS $dec) * sy
                     + (CAST(sx AS $dec) - sy) * (CAST(sx AS $dec) - sy)
                     AS $dec)""").cast("double")).as("ccc"),
        (expr(s"CAST(n * sxy - CAST(sx AS $dec) * sy AS $dec)")
          .cast("double")
          / sqrt(expr(s"CAST(n * sxx - CAST(sx AS $dec) * sx AS $dec)")
              .cast("double")
            * expr(s"CAST(n * syy - CAST(sy AS $dec) * sy AS $dec)")
              .cast("double"))).as("pearson_r"))
      .withColumn("bias_correction", col("ccc") / col("pearson_r"))
  }

  private val linCccSql =
    """WITH d AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), j AS (
      |  SELECT a.cents AS y, b.cents AS x
      |  FROM d a JOIN d b ON a.day = b.day + 7
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM j
      |)
      |SELECT n,
      |  CAST(CAST(2 * (n * sxy - CAST(sx AS HUGEINT) * sy) AS VARCHAR)
      |    AS DOUBLE)
      |  / CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx
      |      + n * syy - CAST(sy AS HUGEINT) * sy
      |      + (CAST(sx AS HUGEINT) - sy) * (CAST(sx AS HUGEINT) - sy)
      |      AS VARCHAR) AS DOUBLE) AS ccc,
      |  CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR) AS DOUBLE)
      |  / sqrt(CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR)
      |        AS DOUBLE)
      |      * CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS VARCHAR)
      |        AS DOUBLE)) AS pearson_r,
      |  (CAST(CAST(2 * (n * sxy - CAST(sx AS HUGEINT) * sy) AS VARCHAR)
      |    AS DOUBLE)
      |  / CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx
      |      + n * syy - CAST(sy AS HUGEINT) * sy
      |      + (CAST(sx AS HUGEINT) - sy) * (CAST(sx AS HUGEINT) - sy)
      |      AS VARCHAR) AS DOUBLE))

      |  / (CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR)
      |      AS DOUBLE)
      |  / sqrt(CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR)
      |        AS DOUBLE)
      |      * CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS VARCHAR)
      |        AS DOUBLE))) AS bias_correction
      |FROM m""".stripMargin

  // ---- Shapley channel attribution ------------------------------------------

  /** SHAPLEY-value channel attribution over the view/click/signup
    * touch channels with purchase as the outcome — the game-theoretic
    * split that first-touch (q273) and linear (q329) attribution
    * approximate: with k=3 channels there are exactly 8 observable
    * coalitions, v(S) = the conversion rate of users whose touch set
    * is EXACTLY S, and each channel's Shapley value is the closed-form
    * weighted sum of its 4 marginal contributions (weights 2/1/1/2
    * over 6). Coalition rates are floored micro-units of exact counts;
    * unobserved coalitions contribute v = 0 (flagged by the n_* counts
    * in the output). Everything collapses to one 8-row frame after a
    * single per-user aggregate; Σφ = v(full) − v(∅) is reported as the
    * efficiency check. */
  def shapleyAttribution(spark: SparkSession, dir: String): DataFrame = {
    val u = Catalog.load(spark, dir, "events")
      .filter(col("event_type").isNotNull)
      .groupBy(col("user_id"))
      .agg(max((col("event_type") === "view").cast("long")).as("fv"),
        max((col("event_type") === "click").cast("long")).as("fc"),
        max((col("event_type") === "signup").cast("long")).as("fs"),
        max((col("event_type") === "purchase").cast("long")).as("conv"))
    val cells = u.groupBy(col("fv"), col("fc"), col("fs"))
      .agg(count(lit(1)).as("n"), sum(col("conv")).as("c"))
      .withColumn("v_micro", expr("CAST((c * 1000000) div n AS BIGINT)"))
    // pivot the 8 coalitions into one row: v(vcs) named by membership,
    // unobserved coalitions filled with v = 0
    val coalitions = Seq(
      ("0", 0, 0, 0), ("v", 1, 0, 0), ("c", 0, 1, 0), ("s", 0, 0, 1),
      ("vc", 1, 1, 0), ("vs", 1, 0, 1), ("cs", 0, 1, 1), ("vcs", 1, 1, 1))
    val aggs = coalitions.flatMap { case (o, fv, fc, fs) =>
      val m = col("fv") === fv && col("fc") === fc && col("fs") === fs
      Seq(coalesce(max(when(m, col("v_micro"))), lit(0L)).as(s"v_$o"),
        sum(when(m, col("n")).otherwise(0L)).as(s"n_$o"))
    }
    val filled = cells.agg(aggs.head, aggs.tail: _*)
    filled.select(
        expr("""CAST((2 * (v_v - v_0) + (v_vc - v_c) + (v_vs - v_s)
                + 2 * (v_vcs - v_cs)) AS BIGINT)""").as("phi_view_x6"),
        expr("""CAST((2 * (v_c - v_0) + (v_vc - v_v) + (v_cs - v_s)
                + 2 * (v_vcs - v_vs)) AS BIGINT)""").as("phi_click_x6"),
        expr("""CAST((2 * (v_s - v_0) + (v_vs - v_v) + (v_cs - v_c)
                + 2 * (v_vcs - v_vc)) AS BIGINT)""").as("phi_signup_x6"),
        col("v_vcs"), col("v_0"), col("n_vcs"), col("n_0"))
      .withColumn("efficiency_check_x6",
        col("phi_view_x6") + col("phi_click_x6") + col("phi_signup_x6")
          - lit(6L) * (col("v_vcs") - col("v_0")))
  }

  private val shapleyAttributionSql =
    """WITH u AS (
      |  SELECT user_id,
      |    MAX(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END) AS fv,
      |    MAX(CASE WHEN event_type = 'click' THEN 1 ELSE 0 END) AS fc,
      |    MAX(CASE WHEN event_type = 'signup' THEN 1 ELSE 0 END) AS fs,
      |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END) AS conv
      |  FROM events WHERE event_type IS NOT NULL
      |  GROUP BY 1
      |), cells AS (
      |  SELECT fv, fc, fs, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(conv) AS BIGINT) AS c,
      |    CAST((CAST(SUM(conv) AS BIGINT) * 1000000)
      |      // CAST(COUNT(*) AS BIGINT) AS BIGINT) AS v_micro
      |  FROM u GROUP BY 1, 2, 3
      |), p AS (
      |  SELECT
      |    COALESCE(MAX(CASE WHEN fv=0 AND fc=0 AND fs=0 THEN v_micro END), 0) AS v_0,
      |    SUM(CASE WHEN fv=0 AND fc=0 AND fs=0 THEN n ELSE 0 END) AS n_0,
      |    COALESCE(MAX(CASE WHEN fv=1 AND fc=0 AND fs=0 THEN v_micro END), 0) AS v_v,
      |    COALESCE(MAX(CASE WHEN fv=0 AND fc=1 AND fs=0 THEN v_micro END), 0) AS v_c,
      |    COALESCE(MAX(CASE WHEN fv=0 AND fc=0 AND fs=1 THEN v_micro END), 0) AS v_s,
      |    COALESCE(MAX(CASE WHEN fv=1 AND fc=1 AND fs=0 THEN v_micro END), 0) AS v_vc,
      |    COALESCE(MAX(CASE WHEN fv=1 AND fc=0 AND fs=1 THEN v_micro END), 0) AS v_vs,
      |    COALESCE(MAX(CASE WHEN fv=0 AND fc=1 AND fs=1 THEN v_micro END), 0) AS v_cs,
      |    COALESCE(MAX(CASE WHEN fv=1 AND fc=1 AND fs=1 THEN v_micro END), 0) AS v_vcs,
      |    SUM(CASE WHEN fv=1 AND fc=1 AND fs=1 THEN n ELSE 0 END) AS n_vcs
      |  FROM cells
      |)
      |SELECT
      |  CAST(2 * (v_v - v_0) + (v_vc - v_c) + (v_vs - v_s)
      |    + 2 * (v_vcs - v_cs) AS BIGINT) AS phi_view_x6,
      |  CAST(2 * (v_c - v_0) + (v_vc - v_v) + (v_cs - v_s)
      |    + 2 * (v_vcs - v_vs) AS BIGINT) AS phi_click_x6,
      |  CAST(2 * (v_s - v_0) + (v_vs - v_v) + (v_cs - v_c)
      |    + 2 * (v_vcs - v_vc) AS BIGINT) AS phi_signup_x6,
      |  v_vcs, v_0,
      |  CAST(n_vcs AS BIGINT) AS n_vcs, CAST(n_0 AS BIGINT) AS n_0,
      |  CAST((2 * (v_v - v_0) + (v_vc - v_c) + (v_vs - v_s)
      |    + 2 * (v_vcs - v_cs))
      |   + (2 * (v_c - v_0) + (v_vc - v_v) + (v_cs - v_s)
      |    + 2 * (v_vcs - v_vs))
      |   + (2 * (v_s - v_0) + (v_vs - v_v) + (v_cs - v_c)
      |    + 2 * (v_vcs - v_vc))
      |   - 6 * (v_vcs - v_0) AS BIGINT) AS efficiency_check_x6
      |FROM p""".stripMargin

  // ---- logrank survival test ---------------------------------------------------

  /** LOGRANK test: do users whose FIRST event is a view (organic
    * entry) reach their first purchase faster — the standard censored-
    * survival comparison q256's Kaplan–Meier table cannot adjudicate
    * on its own (it draws the curves; logrank says whether they
    * differ). Same survival frame as q256 (time-to-purchase, censored
    * at the horizon), split by the deterministic (ts, event_id)-first
    * event type; at each event day the expected group-1
    * events d·n₁/n and the hypergeometric variance
    * d·n₁·(n−n₁)·(n−d)/(n²(n−1)) are exact floored micro-units over
    * the day-domain frame (at-risk counts are two running sums on the
    * horizon-bounded duration spine); χ² = (O₁−E₁)²/V is one final
    * mirrored double. */
  def logrank(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_id"), col("event_type"))
    val horizon = e.agg(max(col("ts_us")).as("horizon_us"))
    val perUser = e.groupBy(col("user_id")).agg(
      min(col("ts_us")).as("t0_us"),
      min(when(col("event_type") === "purchase", col("ts_us"))).as("tp_us"),
      min(struct(col("ts_us"), col("event_id"), col("event_type")))
        .as("fe"))
      .withColumn("g",
        (col("fe.event_type") === "view").cast("long"))
    val durations = perUser.crossJoin(broadcast(horizon))
      .select(col("g"),
        when(col("tp_us").isNotNull,
          expr("(tp_us - t0_us) div 86400000000"))
          .otherwise(expr("(horizon_us - t0_us) div 86400000000"))
          .as("dur_day"),
        col("tp_us").isNotNull.cast("long").as("observed"))
    val byDay = durations.groupBy(col("dur_day")).agg(
      sum(col("observed") * col("g")).as("d1"),
      sum(col("observed")).as("d"),
      sum(col("g")).as("a1"),
      count(lit(1)).as("a"))
    val wRisk = Window.orderBy(col("dur_day").desc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    byDay
      .withColumn("n1", sum(col("a1")).over(wRisk))
      .withColumn("n", sum(col("a")).over(wRisk))
      .filter(col("d") > 0 && col("n") > 1)
      // the when() guards are belt-and-braces: the fused stage may
      // evaluate the projection on a row the filter is about to drop
      // (observed on the n=1 head of the risk spine), and ANSI div
      // refuses the n-1=0 divisor eagerly
      .select(col("d1"), col("d"),
        when(col("n") > 1,
          expr(s"CAST((CAST(d AS $dec) * n1 * 1000000) div n AS BIGINT)"))
          .as("e1_mu"),
        when(col("n") > 1,
          expr(s"""CAST((CAST(d AS $dec) * n1 * (n - n1) * (n - d)
                   * 1000000)
                   div (CAST(n AS $dec) * n * (n - 1)) AS BIGINT)"""))
          .as("v_mu"))
      .agg(sum(col("d1")).as("o1"), sum(col("d")).as("d_total"),
        sum(col("e1_mu")).as("e1_micro"), sum(col("v_mu")).as("v_micro"))
      .select(col("o1"), col("d_total"), col("e1_micro"), col("v_micro"),
        // V = 0 (a degenerate group split, e.g. a tiny fixture where
        // every at-risk set is single-group) carries no information —
        // chi2 is undefined, not infinite
        when(col("v_micro") > 0,
          expr(s"""CAST((CAST(o1 AS $dec) * 1000000 - e1_micro)
                   * (CAST(o1 AS $dec) * 1000000 - e1_micro) AS $dec)""")
            .cast("double")
            / expr(s"CAST(CAST(v_micro AS $dec) * 1000000 AS $dec)")
              .cast("double"))
          .otherwise(lit(null).cast("double")).as("chi2"))
  }

  private val logrankSql =
    """WITH e AS (
      |  SELECT user_id, epoch_ns(ts) // 1000 AS ts_us, event_id,
      |    event_type
      |  FROM events
      |), h AS (
      |  SELECT MAX(ts_us) AS horizon_us FROM e
      |), fe AS (
      |  SELECT user_id,
      |    CASE WHEN event_type = 'view' THEN 1 ELSE 0 END AS g
      |  FROM (SELECT user_id, event_type,
      |          row_number() OVER (PARTITION BY user_id
      |            ORDER BY ts_us, event_id) AS rn
      |        FROM e) x
      |  WHERE rn = 1
      |), u AS (
      |  SELECT e.user_id, MIN(ts_us) AS t0_us,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS tp_us,
      |    MAX(g) AS g
      |  FROM e JOIN fe ON e.user_id = fe.user_id
      |  GROUP BY 1
      |), d AS (
      |  SELECT g,
      |    CASE WHEN tp_us IS NOT NULL
      |      THEN (tp_us - t0_us) // 86400000000
      |      ELSE (horizon_us - t0_us) // 86400000000 END AS dur_day,
      |    CASE WHEN tp_us IS NOT NULL THEN 1 ELSE 0 END AS observed
      |  FROM u, h
      |), byday AS (
      |  SELECT dur_day, CAST(SUM(observed * g) AS BIGINT) AS d1,
      |    CAST(SUM(observed) AS BIGINT) AS d,
      |    CAST(SUM(g) AS BIGINT) AS a1, CAST(COUNT(*) AS BIGINT) AS a
      |  FROM d GROUP BY 1
      |), risk AS (
      |  SELECT d1, d,
      |    CAST(SUM(a1) OVER w AS BIGINT) AS n1,
      |    CAST(SUM(a) OVER w AS BIGINT) AS n
      |  FROM byday
      |  WINDOW w AS (ORDER BY dur_day DESC
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |), terms AS (
      |  SELECT d1, d,
      |    (CAST(d AS HUGEINT) * n1 * 1000000) // n AS e1_mu,
      |    (CAST(d AS HUGEINT) * n1 * (n - n1) * (n - d) * 1000000)
      |      // (CAST(n AS HUGEINT) * n * (n - 1)) AS v_mu
      |  FROM risk WHERE d > 0 AND n > 1
      |), m AS (
      |  SELECT CAST(SUM(d1) AS BIGINT) AS o1, CAST(SUM(d) AS BIGINT)
      |      AS d_total,
      |    CAST(SUM(e1_mu) AS BIGINT) AS e1_micro,
      |    CAST(SUM(v_mu) AS BIGINT) AS v_micro
      |  FROM terms
      |)
      |SELECT o1, d_total, e1_micro, v_micro,
      |  CASE WHEN v_micro > 0 THEN
      |    CAST(CAST((CAST(o1 AS HUGEINT) * 1000000 - e1_micro)
      |      * (CAST(o1 AS HUGEINT) * 1000000 - e1_micro) AS VARCHAR)
      |      AS DOUBLE)
      |    / CAST(CAST(CAST(v_micro AS HUGEINT) * 1000000 AS VARCHAR)
      |      AS DOUBLE)
      |  END AS chi2
      |FROM m""".stripMargin

  // ---- Youden-optimal threshold ---------------------------------------------

  /** YOUDEN-J optimal operating point for the value→purchase predictor:
    * q210 scores the whole ROC curve (AUC); deployment needs ONE
    * threshold, and Youden's J = TPR − FPR is the standard cut when
    * both error types weigh equally. At every distinct score the
    * confusion counts come from the same exact distributed prefix sums
    * as q210 (GlobalRank over the score-domain frame, no
    * single-partition window); the argmax is the exact integer
    * J-numerator tp·N − fp·P with the smallest threshold as the
    * deterministic tie-break — one TakeOrdered(1), no float compare. */
  def youdenThreshold(spark: SparkSession, dir: String): DataFrame = {
    val g = Catalog.load(spark, dir, "events")
      .filter(col("value").isNotNull && col("event_type").isNotNull)
      .select(expr("cast(round(value * 100) as bigint)").as("cents"),
        (col("event_type") === "purchase").cast("long").as("pos"))
      .groupBy(col("cents"))
      .agg(sum(col("pos")).as("np"), sum(lit(1L) - col("pos")).as("nn"))
    val cum1 = graft.ops.GlobalRank.withRunningSum(
      g, Seq(col("cents")), col("nn"), "cum_nn")
    val cum = graft.ops.GlobalRank.withRunningSum(
      cum1, Seq(col("cents")), col("np"), "cum_np")
    val tot = g.agg(sum(col("np")).as("p"), sum(col("nn")).as("n"))
    cum.crossJoin(broadcast(tot))
      .select(col("cents").as("threshold_cents"),
        (col("p") - col("cum_np") + col("np")).as("tp"),
        (col("n") - col("cum_nn") + col("nn")).as("fp"),
        col("p"), col("n"))
      .select(col("threshold_cents"), col("tp"), col("fp"),
        (col("p") - col("tp")).as("fn"), (col("n") - col("fp")).as("tn"),
        (col("tp") * col("n") - col("fp") * col("p")).as("j_num"),
        col("p"), col("n"))
      .orderBy(col("j_num").desc, col("threshold_cents"))
      .limit(1)
      .select(col("threshold_cents"), col("tp"), col("fp"), col("fn"),
        col("tn"),
        expr("CAST((j_num * 1000000) div (p * n) AS BIGINT)")
          .as("j_micro"),
        (col("tp").cast("double") / col("p").cast("double"))
          .as("sensitivity"),
        (col("tn").cast("double") / col("n").cast("double"))
          .as("specificity"))
  }

  private val youdenThresholdSql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |), g AS (
      |  SELECT cents, CAST(SUM(pos) AS BIGINT) AS np,
      |    CAST(SUM(1 - pos) AS BIGINT) AS nn
      |  FROM e GROUP BY 1
      |), c AS (
      |  SELECT cents, np, nn,
      |    CAST(SUM(nn) OVER w AS BIGINT) AS cum_nn,
      |    CAST(SUM(np) OVER w AS BIGINT) AS cum_np
      |  FROM g
      |  WINDOW w AS (ORDER BY cents ROWS UNBOUNDED PRECEDING)
      |), tot AS (
      |  SELECT CAST(SUM(np) AS BIGINT) AS p, CAST(SUM(nn) AS BIGINT) AS n
      |  FROM g
      |), j AS (
      |  SELECT cents AS threshold_cents,
      |    p - cum_np + np AS tp, n - cum_nn + nn AS fp,
      |    p - (p - cum_np + np) AS fn, n - (n - cum_nn + nn) AS tn,
      |    (p - cum_np + np) * n - (n - cum_nn + nn) * p AS j_num, p, n
      |  FROM c, tot
      |)
      |SELECT threshold_cents, tp, fp, fn, tn,
      |  CAST((j_num * 1000000) // (p * n) AS BIGINT) AS j_micro,
      |  CAST(tp AS DOUBLE) / CAST(p AS DOUBLE) AS sensitivity,
      |  CAST(tn AS DOUBLE) / CAST(n AS DOUBLE) AS specificity
      |FROM j
      |ORDER BY j_num DESC, threshold_cents
      |LIMIT 1""".stripMargin

  // ---- Rayleigh circular-uniformity test --------------------------------------

  /** RAYLEIGH test per event type: is activity uniform around the 24 h
    * CLOCK, or does it concentrate at a preferred hour — the circular
    * statistic the linear family cannot express (q282's dow×hour heat
    * map describes; Rayleigh z = n·R̄² tests). Hour angles enter as a
    * 24-entry INTEGER table of cos/sin scaled by 10⁹ (the q451
    * literal-table recipe — no engine trig in the data path), so the
    * resultant components are exact BIGINT sums and z is one mirrored
    * decimal→double ratio. */
  def rayleighTest(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cosT = Seq(1000000000L, 965925826L, 866025404L, 707106781L,
      500000000L, 258819045L, 0L, -258819045L, -500000000L, -707106781L,
      -866025404L, -965925826L, -1000000000L, -965925826L, -866025404L,
      -707106781L, -500000000L, -258819045L, 0L, 258819045L, 500000000L,
      707106781L, 866025404L, 965925826L)
    val sinT = Seq(0L, 258819045L, 500000000L, 707106781L, 866025404L,
      965925826L, 1000000000L, 965925826L, 866025404L, 707106781L,
      500000000L, 258819045L, 0L, -258819045L, -500000000L, -707106781L,
      -866025404L, -965925826L, -1000000000L, -965925826L, -866025404L,
      -707106781L, -500000000L, -258819045L)
    Catalog.load(spark, dir, "events")
      .filter(col("event_type").isNotNull)
      .select(col("event_type"), hour(col("ts")).as("h"))
      .withColumn("c", element_at(
        array(cosT.map(lit(_)): _*), col("h").cast("int") + 1))
      .withColumn("s", element_at(
        array(sinT.map(lit(_)): _*), col("h").cast("int") + 1))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n"), sum(col("c")).as("sc_scaled"),
        sum(col("s")).as("ss_scaled"))
      .select(col("event_type"), col("n"), col("sc_scaled"),
        col("ss_scaled"),
        (expr(s"""CAST(CAST(sc_scaled AS $dec) * sc_scaled
                  + CAST(ss_scaled AS $dec) * ss_scaled AS $dec)""")
          .cast("double")
          / expr(s"CAST(CAST(n AS $dec) * 1000000000 * 1000000000 AS $dec)")
            .cast("double")).as("rayleigh_z"))
      .orderBy(col("event_type"))
  }

  private val rayleighTestSql =
    """WITH trig(h, c, s) AS (VALUES
      |  (0, 1000000000, 0), (1, 965925826, 258819045),
      |  (2, 866025404, 500000000), (3, 707106781, 707106781),
      |  (4, 500000000, 866025404), (5, 258819045, 965925826),
      |  (6, 0, 1000000000), (7, -258819045, 965925826),
      |  (8, -500000000, 866025404), (9, -707106781, 707106781),
      |  (10, -866025404, 500000000), (11, -965925826, 258819045),
      |  (12, -1000000000, 0), (13, -965925826, -258819045),
      |  (14, -866025404, -500000000), (15, -707106781, -707106781),
      |  (16, -500000000, -866025404), (17, -258819045, -965925826),
      |  (18, 0, -1000000000), (19, 258819045, -965925826),
      |  (20, 500000000, -866025404), (21, 707106781, -707106781),
      |  (22, 866025404, -500000000), (23, 965925826, -258819045)
      |), e AS (
      |  SELECT event_type, hour(ts) AS h FROM events
      |  WHERE event_type IS NOT NULL
      |), m AS (
      |  SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(c) AS BIGINT) AS sc_scaled,
      |    CAST(SUM(s) AS BIGINT) AS ss_scaled
      |  FROM e JOIN trig USING (h)
      |  GROUP BY 1
      |)
      |SELECT event_type, n, sc_scaled, ss_scaled,
      |  CAST(CAST(CAST(sc_scaled AS HUGEINT) * sc_scaled
      |    + CAST(ss_scaled AS HUGEINT) * ss_scaled AS VARCHAR) AS DOUBLE)
      |  / CAST(CAST(CAST(n AS HUGEINT) * 1000000000 * 1000000000
      |    AS VARCHAR) AS DOUBLE) AS rayleigh_z
      |FROM m
      |ORDER BY event_type""".stripMargin

  // ---- Kuiper two-sample circular test ----------------------------------------

  /** KUIPER two-sample test between the view and purchase HOUR-OF-DAY
    * distributions — the circular-data analogue of q227's KS: V =
    * D⁺ + D⁻ is invariant to where the 24 h clock is "cut", so a
    * concentration difference straddling midnight (which KS can read
    * as nothing) still registers. ECDF gaps live as exact integer
    * numerators c₁·n₂ − c₂·n₁ over the fixed 24-hour frame; the
    * cumulative step is a 24×24 literal-bounded self-join (no window
    * at all), and V is one final mirrored division. */
  def kuiperTest(spark: SparkSession, dir: String): DataFrame = {
    val hc = Catalog.load(spark, dir, "events")
      .filter(col("event_type").isin("view", "purchase"))
      .groupBy(hour(col("ts")).as("h"))
      .agg(sum((col("event_type") === "view").cast("long")).as("c1"),
        sum((col("event_type") === "purchase").cast("long")).as("c2"))
    val cum = hc.select(col("h").as("hx"), col("c1"), col("c2"))
      .join(hc.select(col("h")), col("h") >= col("hx"))
      .groupBy(col("h"))
      .agg(sum(col("c1")).as("f1"), sum(col("c2")).as("f2"))
    val tot = hc.agg(sum(col("c1")).as("n1"), sum(col("c2")).as("n2"))
    cum.crossJoin(broadcast(tot))
      .select((col("f1") * col("n2") - col("f2") * col("n1")).as("gap"),
        col("n1"), col("n2"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        max(col("gap")).as("d_plus_num"),
        max(-col("gap")).as("d_minus_num"))
      .select(col("n1"), col("n2"), col("d_plus_num"), col("d_minus_num"),
        ((col("d_plus_num") + col("d_minus_num")).cast("double")
          / (col("n1") * col("n2")).cast("double")).as("kuiper_v"))
  }

  private val kuiperTestSql =
    """WITH hc AS (
      |  SELECT hour(ts) AS h,
      |    CAST(SUM(CASE WHEN event_type = 'view' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS c2
      |  FROM events WHERE event_type IN ('view', 'purchase')
      |  GROUP BY 1
      |), cum AS (
      |  SELECT b.h, CAST(SUM(a.c1) AS BIGINT) AS f1,
      |    CAST(SUM(a.c2) AS BIGINT) AS f2
      |  FROM hc a JOIN hc b ON b.h >= a.h
      |  GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
      |  FROM hc
      |), g AS (
      |  SELECT f1 * n2 - f2 * n1 AS gap, n1, n2 FROM cum, tot
      |), m AS (
      |  SELECT MAX(n1) AS n1, MAX(n2) AS n2,
      |    MAX(gap) AS d_plus_num, MAX(-gap) AS d_minus_num
      |  FROM g
      |)
      |SELECT n1, n2, d_plus_num, d_minus_num,
      |  CAST(d_plus_num + d_minus_num AS DOUBLE)
      |    / CAST(n1 * n2 AS DOUBLE) AS kuiper_v
      |FROM m""".stripMargin

  // ---- forecast skill: MASE + Theil's U2 ---------------------------------------

  /** MASE and THEIL'S U₂ for the 7-day seasonal-naive forecaster —
    * the SCALE-FREE skill scores q270's raw MAE cannot give: both
    * divide by the one-step naive's error on the SAME days, so values
    * below 1 mean the seasonal model genuinely beats the
    * last-observation fallback and numbers compare across datasets.
    * Exact integer absolute-error sums and decimal squared-error sums
    * over the day pairs where both baselines exist; two final mirrored
    * ratios (one under a sqrt). */
  def forecastSkill(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("c"))
      .localCheckpoint(false)
    d.join(d.select((col("day") + 7).as("day"), col("c").as("c7")), "day")
      .join(d.select((col("day") + 1).as("day"), col("c").as("c1")), "day")
      .select(abs(col("c") - col("c7")).as("a7"),
        abs(col("c") - col("c1")).as("a1"))
      .agg(count(lit(1)).as("n"),
        sum(col("a7")).as("sa7"), sum(col("a1")).as("sa1"),
        sum(expr(s"CAST(CAST(a7 AS $dec) * a7 AS $dec)")).as("sq7"),
        sum(expr(s"CAST(CAST(a1 AS $dec) * a1 AS $dec)")).as("sq1"))
      .select(col("n"),
        (col("sa7").cast("double") / col("sa1").cast("double")).as("mase"),
        sqrt(col("sq7").cast("double") / col("sq1").cast("double"))
          .as("theil_u2"))
  }

  private val forecastSkillSql =
    """WITH d AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS c
      |  FROM orders GROUP BY 1
      |), j AS (
      |  SELECT abs(a.c - b.c) AS a7, abs(a.c - e.c) AS a1
      |  FROM d a JOIN d b ON a.day = b.day + 7
      |  JOIN d e ON a.day = e.day + 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(a7) AS BIGINT) AS sa7, CAST(SUM(a1) AS BIGINT) AS sa1,
      |    SUM(CAST(a7 AS HUGEINT) * a7) AS sq7,
      |    SUM(CAST(a1 AS HUGEINT) * a1) AS sq1
      |  FROM j
      |)
      |SELECT n,
      |  CAST(sa7 AS DOUBLE) / CAST(sa1 AS DOUBLE) AS mase,
      |  sqrt(CAST(CAST(sq7 AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(sq1 AS VARCHAR) AS DOUBLE)) AS theil_u2
      |FROM m""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q515_forecast_skill", forecastSkill, Some(forecastSkillSql),
      "MASE and Theil's U2 for the 7-day seasonal naive vs the " +
        "one-step naive on matched days — scale-free forecast skill, " +
        "exact error sums, two mirrored ratios"),
    Q("q510_kuiper", kuiperTest, Some(kuiperTestSql),
      "Kuiper two-sample test between view and purchase hour-of-day " +
        "distributions — the cut-point-invariant circular KS, exact " +
        "integer ECDF gaps over the fixed 24-hour frame"),
    Q("q501_rayleigh_test", rayleighTest, Some(rayleighTestSql),
      "Rayleigh circular-uniformity z per event type over the 24h " +
        "clock — scaled-integer trig table, exact resultant sums, one " +
        "mirrored ratio (the test behind q282's descriptive heat map)"),
    Q("q499_youden_threshold", youdenThreshold, Some(youdenThresholdSql),
      "Youden-J optimal threshold for the value->purchase predictor: " +
        "exact confusion counts at every distinct score via " +
        "distributed prefix sums, integer-argmax operating point"),
    Q("q497_logrank", logrank, Some(logrankSql),
      "logrank test on time-to-first-purchase, view-entry vs other " +
        "first-event users (censored at horizon) — the curve-" +
        "comparison verdict next to q256's Kaplan-Meier table, exact " +
        "micro-unit O/E/V"),
    Q("q494_shapley_attribution", shapleyAttribution,
      Some(shapleyAttributionSql),
      "Shapley channel attribution over view/click/signup coalitions " +
        "with purchase conversion as the value function — exact 8-cell " +
        "closed form with the efficiency identity as a check column"),
    Q("q492_lin_ccc", linCcc, Some(linCccSql),
      "Lin's concordance correlation between the 7-day seasonal-naive " +
        "forecast and actual daily revenue, next to Pearson r — the " +
        "identity-line agreement metric, one exact decimal ratio"),
    Q("q488_brier_decomposition", brierDecomposition,
      Some(brierDecompositionSql),
      "Murphy decomposition of the binned Brier score (reliability - " +
        "resolution + uncertainty) for q209's calibration setup — " +
        "exact micro-unit terms, says which defect dominates"),
    Q("q458_cliffs_delta", cliffsDelta, Some(cliffsDeltaSql),
      "pairwise Cliff's delta effect-size matrix over all ten priority " +
        "pairs — exact doubled midrank-U integers, one mirrored " +
        "division per pair, literal magnitude cuts"),
    Q("q454_clean_path_conversion", cleanPathConversion,
      Some(cleanPathConversionSql),
      "negative-pattern funnel: first view -> first purchase with NO " +
        "error between (A-then-B-without-C) via three chained " +
        "user-keyed conditional aggregates, no event self-join"),
    Q("q448_sax_words", saxWords, Some(saxWordsSql),
      "SAX symbolic discretization of the daily-revenue series: " +
        "median/MAD-normalized (exact inputs), 4-symbol breakpoints, " +
        "per-week words via ordered listagg — motif search as strings"),
    Q("q301_props_segment", propsSegment, Some(propsSegmentSql),
      "conversion by JSON-props k-decile: parse-in-scan, exact distinct " +
        "users/buyers, nullif-guarded rate"),
    Q("q303_user_features", userFeatures, Some(userFeaturesSql),
      "per-user feature-store vector (volume/spend/tenure/recency/" +
        "breadth) — all exact integers from ONE grouped pass"),
    Q("q304_training_frame", trainingFrame, Some(trainingFrameSql),
      "leakage-safe supervised training frame: lagged spend features + " +
        "next-week label via one user-keyed window"),
    Q("q296_windowed_funnel", windowedFunnel, Some(windowedFunnelSql),
      "72h-attribution-window funnel signup->view->purchase: user-keyed " +
        "conditional-min joins, no event self-join, nullif-guarded rates"),
    Q("q293_cohort_ltv", cohortLtv, Some(cohortLtvSql),
      "cohort LTV curve: cumulative purchase cents per (signup week, " +
        "age week), window over the cohort-sized aggregate"),
    Q("q287_weekly_quartiles", weeklyQuartiles, Some(weeklyQuartilesSql),
      "weekly p25/p50/p75 order-value bands: exact single-rank " +
        "selection per epoch-week window, integer cents"),
    Q("q284_time_to_convert", timeToConvert, Some(timeToConvertSql),
      "hours from first event to first purchase: exact rank-selected " +
        "n/median/p90 from one conditional-min pass"),
    Q("q285_revenue_bridge", revenueBridge, Some(revenueBridgeSql),
      "monthly growth-accounting bridge: new/retained/resurrected/" +
        "churned revenue, exact cents, month-1 self-joins only"),
    Q("q280_partial_merge", partialMerge, Some(partialMergeSql),
      "sharded partial aggregates merged algebraically == direct " +
        "one-pass aggregate (the fold every incremental pipeline runs)"),
    Q("q282_dow_hour_heat", dowHourHeat, Some(dowHourHeatSql),
      "ISO-weekday × hour traffic heatmap with exact distinct users " +
        "(the only day numbering both engines share)"),
    Q("q283_daily_anomaly", dailyAnomaly, Some(dailyAnomalySql),
      "daily volume 2-sigma anomaly flags with the variance test " +
        "cleared of divisions — DECIMAL(38,0) integer-exact"),
    Q("q275_session_durations", sessionDurations, Some(sessionDurationsSql),
      "exact median/p90 session duration via the shared rank-percentile " +
        "recipe over the sessionizing aggregate"),
    Q("q276_repeat_purchase", repeatPurchase, Some(repeatPurchaseSql),
      "one-time vs repeat buyer summary: exact integers, one division " +
        "for the repeat rate"),
    Q("q273_first_touch", firstTouch, Some(firstTouchSql),
      "first-event-type mix per user (rank-1 window, acquisition " +
        "tracking audit)"),
    Q("q274_gap_histogram", gapHistogram, Some(gapHistogramSql),
      "power-of-two inter-arrival gap histogram via integer bit-length " +
        "buckets, no floating log2"),
    Q("q270_seasonal_naive", seasonalNaiveError, Some(seasonalNaiveErrorSql),
      "seasonal-naive (t-7d) revenue backtest: exact integer-cent " +
        "errors, one division for MAE"),
    Q("q271_abandonment", abandonment, Some(abandonmentSql),
      "daily session abandonment: per-session view/purchase flags folded " +
        "into the sessionizing aggregate, tiny daily rollup"),
    Q("q268_funnel_latency", funnelLatency, Some(funnelLatencySql),
      "stage-to-stage funnel latency: per-user conditional mins, exact " +
        "rank-selected median/p90 per stage pair"),
    Q("q263_weekly_churn", weeklyChurn, Some(weeklyChurnSql),
      "weekly active/retained/churned/new user flow from one distinct " +
        "(user,week) table self-joined at ±1 week"),
    Q("q265_type_affinity", typeAffinity, Some(typeAffinitySql),
      "within-session event-type pair lift (bounded per-session type " +
        "sets, broadcast marginals, one IEEE division)"),
    Q("q260_session_count_hist", sessionCountHist, Some(sessionCountHistSql),
      "sessions-per-user histogram over 5-min gap sessions (one user " +
        "shuffle, map-side-combinable rollups)"),
    Q("q262_user_lifecycle", userLifecycle, Some(userLifecycleSql),
      "active-days histogram with exact event mass per bucket (exact " +
        "two-level countDistinct, no sketch)"),
    Q("q256_km_hazard", kmHazard, Some(kmHazardSql),
      "Kaplan-Meier hazard table for time-to-first-purchase: exact " +
        "integer at-risk/event/censor counts per day offset"),
    Q("q257_interarrival", interarrival, Some(interarrivalSql),
      "per-type inter-arrival gap stats with exact rank-selected median " +
        "(user-keyed lead window + type-keyed rank window)"),
    Q("q259_burstiness", burstiness, Some(burstinessSql),
      "hourly Fano factor per event type from exact BIGINT moments, one " +
        "mirrored IEEE division"),
    Q("q241_scd2_pit_join", scd2PitJoin, Some(scd2PitJoinSql),
      "point-in-time join: purchases to the SCD-2 state valid at event " +
        "time (equi user join + interval residual, leak-proof features)"),
    Q("q218_changepoint", changepoint, Some(changepointSql),
      "optimal single changepoint by two-segment SS gain over exact " +
        "prefix sums (binary segmentation step)"),
    Q("q221_bootstrap_ci", bootstrapCi, Some(bootstrapCiSql),
      "balanced half-sample bootstrap CI for mean daily revenue: 64 " +
        "hash-deterministic replicates, exact rank CI"),
    Q("q209_calibration_bins", calibrationBins, Some(calibrationBinsSql),
      "reliability-diagram calibration table: integer-cent bins, " +
        "confidence vs empirical purchase rate"),
    Q("q210_roc_auc", rocAuc, Some(rocAucSql),
      "exact tie-aware ROC AUC from an integer rank statistic " +
        "(distinct-score aggregate + running window, no pair join)"),
    Q("q204_markov_eval", markovEval, Some(markovEvalSql),
      "Markov next-event model trained on the first 60% of time and " +
        "scored on the held-out tail (argmax transitions, exact split)"),
    Q("q203_theil_sen", theilSen, Some(theilSenSql),
      "Theil-Sen robust slope per region: median of pairwise slopes " +
        "over the calendar-bounded monthly series"),
    Q("q202_ols2", ols2, Some(ols2Sql),
      "two-regressor OLS per return flag via 2x2 normal equations " +
        "(decimal-exact moments, staged IEEE solve, single exchange)"),
    Q("q200_conversion_latency", conversionLatency,
      Some(conversionLatencySql),
      "first-view to first-purchase latency: conditional min-aggregates " +
        "per user (no event self-join), exact median/p90 in integer us"),
    Q("q198_event_pattern", eventPattern, Some(eventPatternSql),
      "MATCH_RECOGNIZE-lite: per-user symbol stream, regex conversion " +
        "pattern V[VC]*P counted with longest-match stats"),
    Q("q192_welch_t", welchT, Some(welchTSql),
      "Welch's unequal-variance t-test between two priority groups " +
        "(decimal-exact moments, staged single-op IEEE tail)"),
    Q("q193_mann_whitney", mannWhitney, Some(mannWhitneySql),
      "Mann-Whitney U rank-sum test: tie-averaged ranks in doubled " +
        "integer units, BIGINT-exact U statistics, shared-formula z"),
    Q("q189_interval_merge", intervalMerge, Some(intervalMergeSql),
      "interval coalescing: per-supplier shipping spans merged into " +
        "maximal covered intervals via the running-max island detector"),
    Q("q185_order_streaks", orderStreaks, Some(orderStreaksSql),
      "gaps-and-islands: consecutive-order-month streaks per customer " +
        "(windows over collapsed customer-month pairs, not raw orders)"),
    Q("q182_fulfillment", fulfillment, Some(fulfillmentSql),
      "order-fulfillment latency median/p90 per priority (exact " +
        "rank-selected percentiles over integer day gaps)"),
    Q("q180_ab_test", abTest, Some(abTestSql),
      "deterministic A/B readout: hash-assigned arms, exact conversion " +
        "counts, Wilson lower bounds (shared IEEE formula)"),
    Q("q181_wow_change", wowChange, Some(wowChangeSql),
      "week-over-week revenue change aligned to the same weekday by " +
        "integer day arithmetic (no row-position lag misalignment)"),
    Q("q178_new_vs_returning", newVsReturning, Some(newVsReturningSql),
      "daily active users decomposed into new vs returning via " +
        "first-seen-day join (the daily face of q112's cohorts)"),
    Q("q177_sweep_line", sweepLine, Some(sweepLineSql),
      "shipments in flight per day via sweep line: two delta events per " +
        "interval + running sum (no interval x day fan-out)"),
    Q("q175_funnel_dropoff", funnelDropoff, Some(funnelDropoffSql),
      "funnel drop-off table from q111's strict-order stages " +
        "(users-remaining + nullif-guarded conversion percentages)"),
    Q("q169_wilson_ctr", wilsonCtr, Some(wilsonCtrSql),
      "Wilson-score lower bound on hourly purchase rate (one shared " +
        "IEEE formula string, exact integer count inputs)"),
    Q("q168_seasonal_outliers", seasonalOutliers, Some(seasonalOutliersSql),
      "seasonality-adjusted daily-revenue outliers: weekday-median " +
        "residuals vs 3x weekday MAD (integer-epoch dow, exact medians)"),
    Q("q164_cusum", cusum, Some(cusumSql),
      "CUSUM drift detection over daily revenue via the exact-integer " +
        "drawdown identity (two prefix windows, no recursion)"),
    Q("q146_forward_fill", forwardFill, Some(forwardFillSql),
      "forward-fill (LOCF): last non-error value carried forward per " +
        "user via a null-skipping running window"),
    Q("q147_ewma", ewma, Some(ewmaSql),
      "finite-horizon EWMA with dyadic 8/4/2/1 weights over the last " +
        "four events per user (IEEE-exact both engines)"),
    Q("q148_mode", modeType, Some(modeTypeSql),
      "grouped MODE with deterministic tie-break (top-1 window over the " +
        "aggregated contingency, not the raw events)"),
    Q("q151_dwell_time", dwellTime, Some(dwellTimeSql),
      "per-type exact median/p90 dwell time to the next user event " +
        "(BIGINT µs gaps, rank-selected percentiles)"),
    Q("q152_chi_square", chiSquare, Some(chiSquareSql),
      "chi-square independence scan of event_type x hour (drift test; " +
        "mirrored IEEE cells, decimal-exact sum)"),
    Q("q155_pop_change", popChange, Some(popChangeSql),
      "day-over-day revenue percent change (exact decimal daily sums, " +
        "one mirrored division)"),
    Q("q140_scd2", scd2, Some(scd2Sql),
      "SCD-2 intervalization: state-change rows opened/closed into " +
        "validity intervals, one user_id exchange"),
    Q("q141_rolling_distinct", rollingDistinct, Some(rollingDistinctSql),
      "exact trailing-7-day distinct users via broadcast day-spine " +
        "range join"),
    Q("q142_mad_outliers", madOutliers, Some(madOutliersSql),
      "MAD robust outlier profile per event_type (exact medians, " +
        "broadcast stats)"),
    Q("q144_trend", trend, Some(trendSql),
      "closed-form OLS trend per event_type from exact decimal/bigint " +
        "moments"),
    Q("q134_twap", twap, Some(twapSql),
      "time-weighted average value per user: lead-gap weights, decimal " +
        "product sums, one user_id exchange"),
    Q("q121_attribution", attribution, Some(attributionSql),
      "first/last-touch purchase attribution via null-skipping min/max " +
        "windows over an ordinal encoding"),
    Q("q85_interval_join", intervalJoin, Some(intervalJoinSql),
      "event-time interval join (batch twin of the stream-stream join)"),
    Q("q90_asof_forward", asofForward, Some(asofForwardSql),
      "forward as-of join (next purchase at-or-after each view)"),
    Q("q82_asof_join_native", asofNative, Some(asofSql),
      "as-of join via custom LogicalPlan+Strategy+BinaryExecNode (same oracle as q80)"),
    Q("q96_asof_native_forward", asofNativeForward, Some(asofForwardSql),
      "forward as-of through the native operator (same oracle as q90)"),
    Q("q103_session_assign", sessionAssign, Some(sessionAssignSql),
      "per-event session ordinal via lag + conditional running sum"),
    Q("q111_funnel", funnel, Some(funnelSql),
      "strict-order view→click→purchase funnel per user (dependent " +
        "min-aggregates, one shuffle key end-to-end)"),
    Q("q112_cohort_retention", cohortRetention, Some(cohortSql),
      "weekly cohort retention triangle (exact epoch-µs week arithmetic)"),
    Q("q117_transitions", transitions, Some(transitionsSql),
      "event-type transition matrix (per-user lead window → pair counts)"),
    Q("q118_latest_state", latestState, Some(latestStateSql),
      "latest-wins snapshot per user (CDC compaction, partial top-1)"),
    Q("q81_range_join", rangeJoinOrders, Some(rangeJoinSql),
      "banded point-in-interval join (bucket equi-join + residual filter)"),
    Q("q80_asof_join", asofViewPurchase, Some(asofSql),
      "point-in-time as-of join via union+window (one shuffle, no range blowup)"),
    Q("q45_tumbling_window", tumbling, Some(tumblingSql),
      "1h tumbling event-time windows"),
    Q("q46_sliding_window", sliding, Some(slidingSql),
      "1h/30min sliding windows (each event in 2 windows)"),
    Q("q47_session_window", sessions, Some(sessionsSql),
      "5-min-gap session windows per user"),
    Q("q48_pivot_types", pivotTypes, Some(pivotTypesSql),
      "pivot event_type → per-type sums"),
    Q("q158_paths", topPaths, Some(topPathsSql),
      "top-20 early event-type paths (ordered first-8 prefix per user, " +
        "one user_id exchange)"),
    Q("q159_rfm", rfm, Some(rfmSql),
      "RFM quintile segmentation per user (total-ordered ntile over the " +
        "aggregated user frame)"),
    Q("q161_survivorship", survivorship, Some(survivorshipSql),
      "golden-record merge per user: latest non-null attribute values " +
        "(null-skipping max_by, one aggregate pass)"))

  // ---- behavioral-path mining ------------------------------------------

  /** Top-20 early behavior paths: each user's first 8 events (by time,
    * event-id tiebreak) joined into a `a>b>c` path string, counted
    * across users. Path assembly is one user_id exchange — the prefix
    * filter runs BEFORE the aggregation so at most 8 rows per user
    * reach the path builder; the final top-20 is an aggregate-sized
    * sort (TakeOrderedAndProject, not a global sort of users). */
  def topPaths(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"), col("ts"), col("event_id"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 8)
      .groupBy(col("user_id"))
      .agg(array_join(transform(
        array_sort(collect_list(struct(col("rn"), col("event_type")))),
        s => s.getField("event_type")), ">").as("path"))
      .groupBy(col("path")).agg(count(lit(1)).as("n_users"))
      .orderBy(col("n_users").desc, col("path"))
      .limit(20)
  }

  private lazy val topPathsSql =
    """WITH r AS (
      |  SELECT user_id, event_type,
      |    row_number() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
      |  FROM events
      |), p AS (
      |  SELECT user_id, string_agg(event_type, '>' ORDER BY rn) AS path
      |  FROM r WHERE rn <= 8 GROUP BY 1
      |)
      |SELECT path, COUNT(*) AS n_users FROM p GROUP BY 1
      |ORDER BY n_users DESC, path LIMIT 20""".stripMargin

  // ---- user segmentation -----------------------------------------------

  /** RFM segmentation: per-user recency (last event µs), frequency
    * (event count), monetary (decimal-exact value sum) → quintiles under
    * a STRICT total order (metric, user_id), so both engines assign
    * identical buckets. Each quintile pass is [[graft.ops.GlobalRank]]'s
    * distributed exact ntile (range shuffle + per-partition offsets) —
    * bucket-identical to `ntile(5) OVER (ORDER BY …)` with no
    * single-partition window over the 1e9-row user dimension. */
  def rfm(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.{Det, GlobalRank}
    val perUser = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(max(unix_micros(col("ts"))).as("recency_us"),
        count(lit(1)).as("frequency"),
        Det.dsum(col("value")).as("monetary"))
    Seq(("recency_us", "r_q"), ("frequency", "f_q"), ("monetary", "m_q"))
      .foldLeft(perUser) { case (df, (metric, out)) =>
        GlobalRank.withNtile(df, 5, Seq(col(metric), col("user_id")), out)
      }
      .withColumn("segment",
        col("r_q") * 100 + col("f_q") * 10 + col("m_q"))
      .orderBy(col("user_id"))
  }

  private lazy val rfmSql =
    s"""WITH u AS (
       |  SELECT user_id, MAX(epoch_ns(ts) // 1000) AS recency_us,
       |    COUNT(*) AS frequency, ${graft.ops.Det.sqlSum("value")} AS monetary
       |  FROM events GROUP BY 1
       |)
       |SELECT user_id, recency_us, frequency, monetary,
       |  ntile(5) OVER (ORDER BY recency_us, user_id) AS r_q,
       |  ntile(5) OVER (ORDER BY frequency, user_id) AS f_q,
       |  ntile(5) OVER (ORDER BY monetary, user_id) AS m_q,
       |  ntile(5) OVER (ORDER BY recency_us, user_id) * 100
       |    + ntile(5) OVER (ORDER BY frequency, user_id) * 10
       |    + ntile(5) OVER (ORDER BY monetary, user_id) AS segment
       |FROM u ORDER BY user_id""".stripMargin

  // ---- entity resolution -----------------------------------------------

  /** Golden-record merge (survivorship): per user, the LATEST NON-NULL
    * value of each attribute — the standard MDM merge rule. One
    * aggregate pass: `max_by` keyed on the event timestamp with the
    * ordering key nulled out when the attribute is null, mirroring
    * DuckDB's null-skipping `arg_max`. (user_id, ts) is unique in the
    * events table, so the pick is deterministic without a tiebreak. */
  def survivorship(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    def latest(c: String) =
      max_by(col(c), when(col(c).isNotNull, col("ts_us")))
    e.groupBy(col("user_id"))
      .agg(latest("event_type").as("last_type"),
        latest("value").as("last_value"),
        latest("props").as("last_props"),
        count(lit(1)).as("n_events"),
        min(col("ts_us")).as("first_us"),
        max(col("ts_us")).as("last_us"))
      .orderBy(col("user_id"))
  }

  private lazy val survivorshipSql =
    """SELECT user_id,
      |  arg_max(event_type, epoch_ns(ts) // 1000) AS last_type,
      |  arg_max(value, epoch_ns(ts) // 1000) AS last_value,
      |  arg_max(props, epoch_ns(ts) // 1000) AS last_props,
      |  COUNT(*) AS n_events,
      |  MIN(epoch_ns(ts) // 1000) AS first_us,
      |  MAX(epoch_ns(ts) // 1000) AS last_us
      |FROM events GROUP BY 1 ORDER BY user_id""".stripMargin
}
