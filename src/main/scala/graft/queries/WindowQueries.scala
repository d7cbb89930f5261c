package graft.queries

import graft.Q
import graft.catalog.Catalog
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Analytic window functions (SURVEY §2.7): ranking, top-k per group,
  * running/moving frames, lag/lead. Determinism rules: every window
  * ORDER BY is a total order (tiebreak on the unique key) wherever the
  * function is order-sensitive (row_number, ntile, lag, running sums);
  * windowed double sums use the decimal-cast recipe (Det) because engines
  * disagree on frame accumulation order (Spark incremental vs DuckDB
  * segment-tree).
  */
object WindowQueries {

  private val DecV = "decimal(18,2)" // events.value / prices have 2 decimals

  /** Top-3 orders per customer by price — the window top-k pattern.
    * Shuffles once on o_custkey; no global sort. */
  def topkPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 3)
      .select(col("o_custkey"), col("rn"), col("o_orderkey"), col("o_totalprice"))
      .orderBy(col("o_custkey"), col("rn"))
  }

  private val topkPerGroupSql =
    """SELECT o_custkey, rn, o_orderkey, o_totalprice FROM (
      |  SELECT o_custkey, o_orderkey, o_totalprice,
      |    CAST(row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_totalprice DESC, o_orderkey) AS INT) AS rn
      |  FROM orders)
      |WHERE rn <= 3
      |ORDER BY o_custkey, rn""".stripMargin

  /** Ranking family: rank/dense_rank (tie-stable), ntile/percent_rank/
    * cume_dist (over a total order), all per order status. The status
    * dimension has 3 values, so `PARTITION BY o_orderstatus` windows
    * would put ~⅓ of the fact table through each window task; instead
    * every member derives from [[graft.ops.GlobalRank]]'s grouped exact
    * row_number (one range shuffle, per-status bases broadcast):
    *   - per-status rn over the TOTAL order → ntile(4) arithmetically;
    *   - rank = min(rn) and peer-group end = max(rn) over the (status,
    *     price) tie frame (a distributed aggregate + equi-join back);
    *   - dense_rank = the tie frame's own per-status row_number;
    *   - percent_rank = (rank-1)/(n-1), cume_dist = peerEnd/n — the
    *     exact builtin formulas, bit-identical doubles. */
  def rankingPack(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"))
    val r = GlobalRank.withRowNumber(o,
      Seq(col("o_orderstatus"), col("o_totalprice").desc, col("o_orderkey")),
      "grn")
    val statusBounds = r.groupBy(col("o_orderstatus"))
      .agg(min(col("grn")).as("s0"), count(lit(1)).as("sn"))
    val rs = r.join(broadcast(statusBounds), "o_orderstatus")
      .withColumn("rn", col("grn") - col("s0") + 1)
    // tie frame: one row per (status, price) with rank + peer-group end
    val ties = rs.groupBy(col("o_orderstatus").as("ts"),
        col("o_totalprice").as("tp"))
      .agg(min(col("rn")).as("rnk_l"), max(col("rn")).as("hi_l"))
    val td = GlobalRank.withRowNumber(ties,
      Seq(col("ts"), col("tp").desc), "tgrn")
    val tieBounds = td.groupBy(col("ts")).agg(min(col("tgrn")).as("t0"))
    val tiesRanked = td.join(broadcast(tieBounds), "ts")
      .withColumn("drnk_l", col("tgrn") - col("t0") + 1)
      .select(col("ts"), col("tp"), col("rnk_l"), col("hi_l"), col("drnk_l"))
    rs.join(tiesRanked, col("o_orderstatus") === col("ts") &&
        col("o_totalprice") === col("tp"))
      .select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        col("rnk_l").cast("long").as("rnk"),
        col("drnk_l").cast("long").as("drnk"),
        when(col("sn") === 1, lit(0.0))
          .otherwise((col("rnk_l") - 1).cast("double") /
            (col("sn") - 1).cast("double")).as("prk"),
        (col("hi_l").cast("double") / col("sn").cast("double")).as("cd"),
        GlobalRank.ntileFromRowNumber(col("rn"), col("sn"), 4)
          .cast("long").as("quartile"))
      .orderBy(col("o_orderkey"))
  }

  private val rankingPackSql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  CAST(rank() OVER w AS BIGINT) AS rnk,
      |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
      |  percent_rank() OVER w AS prk,
      |  cume_dist() OVER w AS cd,
      |  CAST(ntile(4) OVER (PARTITION BY o_orderstatus
      |    ORDER BY o_totalprice DESC, o_orderkey) AS BIGINT) AS quartile
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice DESC)
      |ORDER BY o_orderkey""".stripMargin

  /** Value-position window functions: first/last/nth over an explicit
    * full-partition frame (last_value's default frame ends at CURRENT ROW
    * — the classic silent-wrong-answer — so the frame is spelled out) on
    * a total order. */
  def valueWindows(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
      .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    o.select(
        col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
        first(col("o_totalprice")).over(w).as("top_price"),
        last(col("o_totalprice")).over(w).as("bottom_price"),
        nth_value(col("o_totalprice"), 3).over(w).as("third_price"))
      .orderBy(col("o_orderkey"))
  }

  private val valueWindowsSql =
    """SELECT o_orderkey, o_orderstatus, o_totalprice,
      |  first_value(o_totalprice) OVER w AS top_price,
      |  last_value(o_totalprice) OVER w AS bottom_price,
      |  nth_value(o_totalprice, 3) OVER w AS third_price
      |FROM orders
      |WINDOW w AS (PARTITION BY o_orderstatus
      |  ORDER BY o_totalprice DESC, o_orderkey
      |  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
      |ORDER BY o_orderkey""".stripMargin

  /** Running (cumulative) sum per user over event time — decimal-cast so
    * the accumulation is order-independent-exact. */
  def runningSum(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    e.select(
        col("event_id"), col("user_id"),
        sum(col("value").cast(DecV)).over(w).cast("double").as("running_value"),
        count(lit(1)).over(w).as("running_n"))
      .orderBy(col("event_id"))
  }

  private val runningSumSql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE) AS running_value,
      |  COUNT(*) OVER w AS running_n
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  /** lag/lead + µs-exact gap to the previous event per user. */
  def lagLead(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    e.select(
        col("event_id"), col("user_id"), col("value"),
        lag(col("value"), 1).over(w).as("prev_value"),
        lead(col("value"), 1).over(w).as("next_value"),
        (unix_micros(col("ts")) - lag(unix_micros(col("ts")), 1).over(w)).as("gap_us"))
      .orderBy(col("event_id"))
  }

  private val lagLeadSql =
    """SELECT event_id, user_id, value,
      |  lag(value, 1) OVER w AS prev_value,
      |  lead(value, 1) OVER w AS next_value,
      |  epoch_ns(ts) // 1000 - lag(epoch_ns(ts) // 1000, 1) OVER w AS gap_us
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |ORDER BY event_id""".stripMargin

  /** Moving aggregate over a bounded rows frame (last 3 events). */
  def movingAvg(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts"), col("event_id"))
      .rowsBetween(-2, Window.currentRow)
    e.select(
        col("event_id"), col("user_id"),
        (sum(col("value").cast(DecV)).over(w).cast("double") /
          count(lit(1)).over(w)).as("moving_avg3"),
        max(col("value")).over(w).as("moving_max3"))
      .orderBy(col("event_id"))
  }

  private val movingAvgSql =
    """SELECT event_id, user_id,
      |  CAST(SUM(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
      |    / COUNT(*) OVER w AS moving_avg3,
      |  max(value) OVER w AS moving_max3
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
      |             ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q35_topk_per_group", topkPerGroup, Some(topkPerGroupSql),
      "row_number top-k per group"),
    Q("q36_ranking_pack", rankingPack, Some(rankingPackSql),
      "rank/dense_rank/ntile/percent_rank/cume_dist"),
    Q("q37_running_sum", runningSum, Some(runningSumSql),
      "cumulative frame per key, decimal-exact"),
    Q("q38_lag_lead", lagLead, Some(lagLeadSql),
      "lag/lead + µs event gaps"),
    Q("q39_moving_avg", movingAvg, Some(movingAvgSql),
      "bounded rows frame moving aggregate"),
    Q("q88_value_windows", valueWindows, Some(valueWindowsSql),
      "first/last/nth_value over explicit full-partition frames"))
}
