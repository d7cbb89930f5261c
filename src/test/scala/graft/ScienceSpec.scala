package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.Row
import graft.queries.ScienceQueries

/** Mathematical invariants of the round-8 applied-stats / geometry
  * family — bounds that hold for ANY input, so a refactor that breaks
  * the arithmetic fails here even if the oracle fixture happens to
  * agree. (Oracle hash-equality is checked by Verify/check.py; these
  * are the stronger always-true properties.)
  */
class ScienceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("gini per segment lands in [0,1); levene W and eta2 are " +
    "non-negative; eta2 <= 1") {
    ScienceQueries.giniSegment(spark, dir).collect().foreach { r =>
      val g = r.getAs[Double]("gini")
      assert(g >= 0.0 && g < 1.0, s"gini $g")
    }
    val w = ScienceQueries.levene(spark, dir).collect()(0)
      .getAs[Double]("w_stat")
    assert(w >= 0.0, s"levene $w")
    val e = ScienceQueries.dowStrength(spark, dir).collect()(0)
    val eta2 = e.getAs[Double]("eta2_dow")
    assert(eta2 >= 0.0 && eta2 <= 1.0, s"eta2 $eta2")
  }

  test("ABC classes partition the catalog: shares sum to 1, parts sum " +
    "to the distinct part count, A-share <= 0.8 + one part's worth") {
    val rows = ScienceQueries.abcClasses(spark, dir).collect()
    val shares = rows.map(_.getAs[Double]("share")).sum
    assert(math.abs(shares - 1.0) < 1e-9, s"share sum $shares")
    val nParts = rows.map(_.getAs[Long]("n_parts")).sum
    val distinct = graft.catalog.Catalog.load(spark, dir, "lineitem")
      .select("l_partkey").distinct().count()
    assert(nParts == distinct)
  }

  test("silhouette is in [-1,1] per label; isotropy ratio is finite and " +
    "mean self-dot positive; clip bounds ordered p01 <= p99 per dim") {
    ScienceQueries.silhouette(spark, dir).collect().foreach { r =>
      val s = r.getAs[Double]("median_silhouette")
      assert(s >= -1.0 && s <= 1.0, s"sil $s")
    }
    val iso = ScienceQueries.isotropy(spark, dir).collect()(0)
    assert(iso.getAs[Double]("mean_self_dot") > 0.0)
    assert(!iso.getAs[Double]("isotropy").isNaN)
    ScienceQueries.dimClip(spark, dir).collect().foreach { r =>
      assert(r.getAs[Long]("p01_scaled") <= r.getAs[Long]("p99_scaled"))
    }
  }

  test("label-centroid cosines are in [-1,1] and the matrix covers all " +
    "unordered label pairs exactly once") {
    val rows = ScienceQueries.labelCentroidSim(spark, dir).collect()
    rows.foreach { r =>
      val c = r.getAs[Double]("cos_sim")
      assert(c >= -1.0 - 1e-12 && c <= 1.0 + 1e-12, s"cos $c")
      assert(r.getAs[Long]("label_a") < r.getAs[Long]("label_b"))
    }
    val k = graft.catalog.Catalog.load(spark, dir, "embeddings")
      .select("label").distinct().count()
    assert(rows.length == (k * (k - 1) / 2))
  }

  test("stickiness in (0,1]; shard imbalance >= 1; growth accounting " +
    "balances: actives(w) = new + retained + resurrected") {
    ScienceQueries.stickiness(spark, dir).collect().foreach { r =>
      val s = r.getAs[Double]("stickiness")
      assert(s > 0.0 && s <= 1.0, s"stickiness $s")
    }
    val sb = ScienceQueries.shardBalance(spark, dir).collect()(0)
    assert(sb.getAs[Double]("imbalance") >= 1.0)
    // growth accounting identity vs an independent weekly-active count
    val ga = ScienceQueries.growthAccounting(spark, dir).collect()
      .map(r => r.getAs[Long]("wk") ->
        (r.getAs[Long]("new_users") + r.getAs[Long]("retained") +
          r.getAs[Long]("resurrected"))).toMap
    import org.apache.spark.sql.functions._
    val actives = graft.catalog.Catalog.load(spark, dir, "events")
      .select(col("user_id"),
        expr("CAST(unix_date(CAST(date_trunc('WEEK', ts) AS DATE)) AS BIGINT)")
          .as("wk"))
      .distinct().groupBy("wk").count()
      .collect().map(r => r.getAs[Long]("wk") -> r.getAs[Long]("count")).toMap
    assert(ga.keySet == actives.keySet)
    ga.foreach { case (wk, n) => assert(n == actives(wk), s"week $wk") }
  }

  test("A/B funnel counts are monotone per arm (viewed >= clicked >= " +
    "purchased) and cover both arms; priority transition rows sum to 1 " +
    "per from-priority") {
    val f = ScienceQueries.abFunnel(spark, dir).collect()
    assert(f.map(_.getAs[Long]("variant")).toSet == Set(0L, 1L))
    f.foreach { r =>
      assert(r.getAs[Long]("n_viewed") >= r.getAs[Long]("n_clicked"))
      assert(r.getAs[Long]("n_clicked") >= r.getAs[Long]("n_purchased"))
    }
    val pt = ScienceQueries.priorityTransitions(spark, dir).collect()
    pt.groupBy(_.getAs[String]("from_pri")).foreach { case (fp, rows) =>
      val s = rows.map(_.getAs[Double]("p")).sum
      assert(math.abs(s - 1.0) < 1e-9, s"$fp sums to $s")
    }
  }

  test("rank convergence L1 deltas are non-increasing after round 2 " +
    "(damped fixed point) and strictly positive while moving") {
    val rows = ScienceQueries.rankConvergence(spark, dir).collect()
      .sortBy(_.getAs[Long]("round"))
    assert(rows.length == 5)
    val deltas = rows.map(_.getAs[Long]("l1_delta_micro"))
    // the 0.85-damped recurrence contracts: each later round moves less
    // than ~the previous (allow equality for tiny graphs)
    (2 until deltas.length).foreach { i =>
      assert(deltas(i) <= deltas(i - 1), deltas.mkString(","))
    }
  }
}
