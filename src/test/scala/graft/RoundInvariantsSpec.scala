package graft

import org.scalatest.funsuite.AnyFunSuite

/** Mathematical invariants of the round-11 statistical/planning queries
  * that an oracle hash-match alone would not protect during a refactor:
  * identities (Shapley efficiency, GE(2) additivity), feasibility bounds
  * (water-fill budget conservation, repeat caps), and order relations
  * (CI brackets the median, confusion counts partition the population).
  * All run on the sf0.001 fixture.
  */
class RoundInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def one(name: String) =
    Registry.byName(name).build(spark, dir).collect().head

  test("q476 water-fill: budget conserved within floor slack, cap respected, " +
    "uncapped sources share one level") {
    val rows = Registry.byName("q476_capped_waterfill")
      .build(spark, dir).collect()
    val b = rows.map(_.getAs[Long]("tokens")).sum
    val alloc = rows.map(_.getAs[Long]("alloc_micro")).sum
    // each floored term loses < 1 micro-unit; k sources ⇒ < k total
    assert(alloc <= b * 1000000L, s"allocated over budget: $alloc vs $b")
    assert(alloc > b * 1000000L - rows.length * 1000000L,
      s"budget left on the table beyond floor slack: $alloc vs $b")
    rows.foreach { r =>
      assert(r.getAs[Long]("repeat_micro") <= 3000000L,
        s"repeat cap violated: $r")
      assert(r.getAs[Long]("alloc_micro") <=
        r.getAs[Long]("cap_tokens") * 1000000L, s"alloc above cap: $r")
    }
    val uncapped = rows.filterNot(_.getAs[Boolean]("capped"))
      .map(_.getAs[Long]("alloc_micro")).distinct
    assert(uncapped.length <= 1,
      s"uncapped sources must share one water level: $uncapped")
  }

  test("q494 Shapley: efficiency identity holds exactly") {
    val r = one("q494_shapley_attribution")
    assert(r.getAs[Long]("efficiency_check_x6") == 0L, r.toString)
  }

  test("q483 GE(2): total = between + within, shares in range") {
    val r = one("q483_ge2_decomposition")
    val t = r.getAs[Double]("ge2_total")
    val b = r.getAs[Double]("ge2_between")
    val w = r.getAs[Double]("ge2_within")
    assert(t >= 0 && b >= -1e-9 && w >= -1e-9, r.toString)
    assert(math.abs(t - (b + w)) <= 1e-12 * math.max(1.0, math.abs(t)))
    val s = r.getAs[Double]("between_share")
    assert(s >= -1e-9 && s <= 1 + 1e-9, r.toString)
  }

  test("q497 logrank: chi2 non-negative when defined, observed bounded") {
    val r = one("q497_logrank")
    if (!r.isNullAt(r.fieldIndex("chi2")))
      assert(r.getAs[Double]("chi2") >= 0, r.toString)
    assert(r.getAs[Long]("o1") <= r.getAs[Long]("d_total"), r.toString)
    assert(r.getAs[Long]("v_micro") >= 0, r.toString)
  }

  test("q499 Youden: confusion counts partition P and N, J in [0, 1]") {
    val r = one("q499_youden_threshold")
    val (tp, fp, fn, tn) = (r.getAs[Long]("tp"), r.getAs[Long]("fp"),
      r.getAs[Long]("fn"), r.getAs[Long]("tn"))
    assert(tp >= 0 && fp >= 0 && fn >= 0 && tn >= 0, r.toString)
    val j = r.getAs[Long]("j_micro")
    assert(j >= 0 && j <= 1000000L, r.toString)
    assert(math.abs(r.getAs[Double]("sensitivity")
      - tp.toDouble / (tp + fn)) < 1e-12)
    assert(math.abs(r.getAs[Double]("specificity")
      - tn.toDouble / (tn + fp)) < 1e-12)
  }

  test("q500 median CI: ranks and values bracket the median") {
    val r = one("q500_median_ci")
    assert(r.getAs[Long]("rank_lo") < r.getAs[Long]("rank_hi"), r.toString)
    val med = r.getAs[Double]("median_cents")
    assert(r.getAs[Long]("ci_lo_cents") <= med
      && med <= r.getAs[Long]("ci_hi_cents"), r.toString)
  }

  test("q482 Mantel-Haenszel: stratified OR sits between 0 and the " +
    "component bounds; micro sums positive") {
    val r = one("q482_mantel_haenszel")
    assert(r.getAs[Long]("r_micro") > 0 && r.getAs[Long]("s_micro") > 0,
      r.toString)
    assert(r.getAs[Double]("or_mh") > 0, r.toString)
  }

  test("q477 aHash pairs: symmetric-free (a<b), hamming within bound, " +
    "ids distinct") {
    val rows = Registry.byName("q477_media_ahash_dups")
      .build(spark, dir).collect()
    rows.foreach { r =>
      assert(r.getAs[Long]("media_a") < r.getAs[Long]("media_b"), r.toString)
      val h = r.getAs[Long]("hamming")
      assert(h >= 0 && h <= 12, r.toString)
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length
      == rows.length)
  }
}
