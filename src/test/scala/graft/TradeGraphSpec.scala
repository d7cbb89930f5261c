package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.queries.TradeGraph

/** The shared memoized trade-graph build: one orders⋈lineitem projection
  * per (frame, dataset), reused across the whole iterative-graph query
  * family — with results bit-identical to a cold per-query rebuild.
  */
class TradeGraphSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("repeated calls return the SAME checkpointed frame (memo hit, " +
    "no rebuild) and register their blocks in liveRddIds") {
    TradeGraph.invalidateAll()
    val b1 = TradeGraph.base(spark, dir)
    val ids1 = TradeGraph.liveRddIds
    assert(ids1.nonEmpty)
    val b2 = TradeGraph.base(spark, dir)
    assert(b1 eq b2) // the memoized instance, not an equal rebuild
    assert(TradeGraph.liveRddIds == ids1)
    // derived frames memoize independently and extend the live set
    val s1 = TradeGraph.symDeg(spark, dir)
    assert(TradeGraph.symDeg(spark, dir) eq s1)
    assert(TradeGraph.liveRddIds.size > ids1.size)
  }

  test("an unpersisted (swept) entry is rebuilt, not returned: a " +
    "localCheckpoint without blocks cannot recompute") {
    TradeGraph.invalidateAll()
    val b1 = TradeGraph.base(spark, dir)
    val n = b1.count() // materialize the checkpoint blocks
    val ids = TradeGraph.liveRddIds
    spark.sparkContext.getPersistentRDDs
      .filter { case (id, _) => ids(id) }
      .values.foreach(_.unpersist(blocking = true))
    val b2 = TradeGraph.base(spark, dir)
    assert(!(b1 eq b2)) // stale entry detected, fresh build returned
    assert(b2.count() == n) // and the rebuild is fully usable
  }

  test("shared frames == cold inline build, bit-for-bit (pageRank over " +
    "symDeg/nodes vs GraphOps.pageRank over raw edges)") {
    TradeGraph.invalidateAll()
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"),
        (col("l_suppkey") * 2 + 1).as("v"))
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val cold = graft.ops.GraphOps.pageRank(edges, iters = 5)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    val shared = graft.ops.GraphOps.pageRankOn(
        TradeGraph.symDeg(spark, dir), TradeGraph.nodes(spark, dir), 5)
      .as[(Long, Double)].collect().sortBy(_._1).toSeq
    assert(shared == cold) // exact, every double bit
    // weighted / count frames carry the exact per-pair aggregates
    val nJoinRows = e0.count() // one row per (order, lineitem) match
    assert(TradeGraph.countWeighted(spark, dir).agg(sum(col("w")))
      .as[Long].head == 2 * nJoinRows) // symmetric: each lineitem twice
    assert(TradeGraph.centsWeighted(spark, dir)
      .filter(col("w") > col("wu")).isEmpty) // out-weight ≥ any edge
  }

  test("warm basket frames: q179/q334 plans read the checkpointed pair " +
    "aggregate, not lineitem (one distinct + one self-join per session, " +
    "shared by the whole co-occurrence family)") {
    graft.queries.BasketFrames.pairCounts(spark, dir).count()       // warm
    graft.queries.BasketFrames.cappedPairCounts(spark, dir).count() // warm
    for (q <- Seq("q179_basket_pairs", "q334_assoc_rules")) {
      val p = SparkEntry.queries(q)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("FileScan"), s"$q re-scans parquet:\n${p.take(1500)}")
      assert(p.contains("ExistingRDD"), s"$q\n${p.take(500)}")
    }
    // and the symmetrized view equals the ordered a != b aggregate
    val it = graft.queries.BasketFrames.items(spark, dir)
    val direct = it.select(col("ok"), col("pk").as("a"))
      .join(it.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") =!= col("b"))
      .groupBy(col("a"), col("b")).agg(count(lit(1)).as("n_ab"))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    val sym = graft.queries.BasketFrames
      .symmetrized(graft.queries.BasketFrames.pairCounts(spark, dir))
      .as[(Long, Long, Long)].collect().sortBy(r => (r._1, r._2)).toSeq
    assert(sym == direct)
  }

  test("warm family plans iterate over the checkpointed blocks — no " +
    "parquet re-scan inside q172's recurrence (adjudication pin)") {
    TradeGraph.symDeg(spark, dir).count() // warm the memo
    val p = SparkEntry.queries("q172_personalized_pagerank")(spark, dir)
      .queryExecution.executedPlan.toString
    // every round joins the shared RDD-backed frames; the orders and
    // lineitem parquet files are never re-read by the query itself
    assert(!p.contains("FileScan"), p.take(2000))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"),
      p.take(500))
  }
}
