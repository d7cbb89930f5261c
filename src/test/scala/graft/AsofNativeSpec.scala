package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.plans.AsofJoinNative

/** The native (custom SparkPlan) as-of join must agree exactly with the
  * composed union+window implementation on real data, handle no-match
  * lefts with nulls, and plan through the custom strategy.
  */
class AsofNativeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  private def sides = {
    val e = Catalog.load(spark, dir, "events")
      .withColumn("ts_us", unix_micros(col("ts")))
    val views = e.filter(col("event_type") === "view")
      .select(col("user_id"), col("ts_us"), col("event_id"), col("value"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id").as("p_user_id"), col("ts_us").as("p_ts_us"),
        col("value").as("p_value"))
    (views, purchases)
  }

  test("native as-of join == composed union+window as-of join") {
    val (views, purchases) = sides
    val native = AsofJoinNative.asofJoinNative(
        views, purchases, "user_id", "p_user_id", "ts_us", "p_ts_us")
      .select(col("event_id"), col("p_ts_us"), col("p_value"))
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    val composed = graft.ops.AsofOps.asofJoin(
        views, purchases.select(col("p_user_id").as("user_id"),
          col("p_ts_us").as("ts_us"), col("p_value")),
        key = "user_id", ts = "ts_us",
        leftCols = Seq("event_id", "value"),
        rightCols = Seq("ts_us", "p_value"))
      .select(col("event_id"), col("asof_ts_us"), col("asof_p_value"))
      .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1)
    assert(native.length == composed.length && native.length > 0)
    assert(native.sameElements(composed))
    // both matched and unmatched lefts occur on this fixture
    assert(native.exists(_._2.isEmpty) && native.exists(_._2.nonEmpty))
  }

  test("plans through AsofJoinExec with one exchange per side") {
    val (views, purchases) = sides
    val df = AsofJoinNative.asofJoinNative(
      views, purchases, "user_id", "p_user_id", "ts_us", "p_ts_us")
    val plan = df.queryExecution.executedPlan.toString
    assert(plan.contains("AsofJoin")) // AsofJoinExec renders without the Exec suffix
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2)
  }

  test("generic types: string keys + timestamp ts; nulls never match") {
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val l = Seq(("u1", ts("2026-01-01 10:00:00"), 1L),
      ("u2", ts("2026-01-01 11:00:00"), 2L),
      (null.asInstanceOf[String], ts("2026-01-01 12:00:00"), 3L))
      .toDF("k", "t", "lv")
    val r = Seq(("u1", ts("2026-01-01 09:30:00"), 7.0),
      ("u3", ts("2026-01-01 09:00:00"), 8.0))
      .toDF("rk", "rt", "rv")
    val out = AsofJoinNative.asofJoinNative(l, r, "k", "rk", "t", "rt")
      .select("lv", "rv").as[(Long, Option[Double])].collect().sortBy(_._1)
    assert(out(0) == ((1L, Some(7.0))))
    assert(out(1) == ((2L, None)))
    assert(out(2) == ((3L, None))) // null key → null-joined, not dropped
  }

  test("asof directions + tolerance: backward/forward/nearest on a known series") {
    val left = Seq((1L, 10L, "a"), (1L, 100L, "b")).toDF("k", "t", "tag")
    val right = Seq((1L, 8L, 8.0), (1L, 12L, 12.0), (1L, 50L, 50.0))
      .toDF("k", "t", "rv")
    def run(dir: String, tol: Option[Long] = None) =
      graft.ops.AsofOps.asofJoin(left, right, "k", "t",
          Seq("tag"), Seq("rv"), direction = dir, tolerance = tol)
        .select("tag", "asof_rv").as[(String, Option[Double])]
        .collect().toMap
    assert(run("backward") == Map("a" -> Some(8.0), "b" -> Some(50.0)))
    assert(run("forward") == Map("a" -> Some(12.0), "b" -> None))
    // nearest: |10-8| == |12-10| → tie goes backward; 100 → 50 (only side)
    assert(run("nearest") == Map("a" -> Some(8.0), "b" -> Some(50.0)))
    // tolerance 5: 10→8 (Δ2 ok); 100→50 (Δ50) nulled out
    assert(run("backward", Some(5L)) == Map("a" -> Some(8.0), "b" -> None))
  }

  test("native directions + tolerance agree with the composed op on real data") {
    val (views, purchases) = sides
    def native(d: String, tol: Option[Long]) =
      AsofJoinNative.asofJoinNative(views, purchases,
          "user_id", "p_user_id", "ts_us", "p_ts_us", d, tol)
        .select(col("event_id"), col("p_ts_us"), col("p_value"))
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    def composed(d: String, tol: Option[Long]) =
      graft.ops.AsofOps.asofJoin(
          views, purchases.select(col("p_user_id").as("user_id"),
            col("p_ts_us").as("ts_us"), col("p_value")),
          key = "user_id", ts = "ts_us",
          leftCols = Seq("event_id", "value"),
          rightCols = Seq("ts_us", "p_value"),
          direction = d, tolerance = tol)
        .select(col("event_id"), col("asof_ts_us"), col("asof_p_value"))
        .as[(Long, Option[Long], Option[Double])].collect().sortBy(_._1).toSeq
    for (d <- Seq("backward", "forward", "nearest");
         tol <- Seq(None, Some(3600L * 1000000L))) { // 1h in µs
      val n = native(d, tol)
      assert(n == composed(d, tol), s"direction=$d tolerance=$tol")
      assert(n.nonEmpty)
    }
  }

  test("native nearest + tolerance on a known series (ties go backward)") {
    val l = Seq((1L, 10L, "a"), (1L, 100L, "b"), (1L, 49L, "c")).toDF("k", "t", "lv")
    val r = Seq((1L, 8L, 8.0), (1L, 12L, 12.0), (1L, 50L, 50.0)).toDF("rk", "rt", "rv")
    def run(d: String, tol: Option[Long]) =
      AsofJoinNative.asofJoinNative(l, r, "k", "rk", "t", "rt", d, tol)
        .select("lv", "rv").as[(String, Option[Double])].collect().toMap
    // nearest: a ties (Δ2 both ways) → backward 8; b → 50; c → 50 (Δ1 fwd < Δ37 back)
    assert(run("nearest", None) ==
      Map("a" -> Some(8.0), "b" -> Some(50.0), "c" -> Some(50.0)))
    // tolerance 5: b's only neighbor is Δ50 away → null
    assert(run("nearest", Some(5L)) ==
      Map("a" -> Some(8.0), "b" -> None, "c" -> Some(50.0)))
    assert(run("forward", Some(5L)) ==
      Map("a" -> Some(12.0), "b" -> None, "c" -> Some(50.0)))
    assert(run("backward", Some(5L)) ==
      Map("a" -> Some(8.0), "b" -> None, "c" -> None))
  }

  test("edge semantics: equal timestamps match; empty right side → all nulls") {
    val l = Seq((1L, 10L, "a"), (1L, 20L, "b"), (2L, 5L, "c"))
      .toDF("k", "t", "lv")
    val r = Seq((1L, 10L, 1.0), (1L, 15L, 2.0), (3L, 1L, 9.9))
      .toDF("rk", "rt", "rv")
    val out = AsofJoinNative.asofJoinNative(l, r, "k", "rk", "t", "rt")
      .select("k", "t", "lv", "rt", "rv")
      .as[(Long, Long, String, Option[Long], Option[Double])]
      .collect().sortBy(x => (x._1, x._2))
    assert(out(0) == ((1L, 10L, "a", Some(10L), Some(1.0)))) // ts-equal matches
    assert(out(1) == ((1L, 20L, "b", Some(15L), Some(2.0)))) // latest prior
    assert(out(2) == ((2L, 5L, "c", None, None)))            // no right key
    val empty = AsofJoinNative.asofJoinNative(
      l, r.filter(col("rk") < 0), "k", "rk", "t", "rt")
    assert(empty.count() == 3 && empty.filter(col("rv").isNotNull).count() == 0)
  }
}
