package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.ops.{DedupOps, StatsOps}

/** Specs for the round-2 analytics ops: moment statistics vs hand
  * computation, rank percentiles vs a known distribution, dup clustering
  * (transitivity, singletons, determinism), corpus-clean rule logic.
  */
class AnalyticsSpec extends AnyFunSuite {

  test("HLL rollup: union-of-day-sketches ≈ exact distinct, == whole-stream sketch") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import org.apache.spark.sql.functions._
    val dir = "/root/testdata/sf0.001"
    val e = graft.catalog.Catalog.load(spark0, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    val approx = graft.queries.AnalyticsQueries.hllRollup(spark0, dir)
      .select("event_type", "approx_users").as[(String, Long)].collect().toMap
    val exact = e.groupBy("event_type").agg(countDistinct("user_id").as("n"))
      .as[(String, Long)].collect().toMap
    for ((t, ex) <- exact)
      assert(math.abs(approx(t) - ex).toDouble / ex < 0.05, s"$t: ${approx(t)} vs $ex")
    // mergeability: union of per-day sketches == one sketch over the stream
    val whole = e.groupBy("event_type")
      .agg(hll_sketch_estimate(hll_sketch_agg(col("user_id"))).as("a"))
      .as[(String, Long)].collect().toMap
    assert(approx == whole)
  }

  test("zorder key: quadrant ordering, interleave roundtrip, SQL registration") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    import graft.functions.ZOrderKey.zorderKey
    import org.apache.spark.sql.functions._
    val pts = (for (a <- 0 until 8; b <- 0 until 8) yield (a.toLong, b.toLong))
      .toDF("a", "b")
    val z = pts.select(col("a"), col("b"), zorderKey(col("a"), col("b")).as("z"))
      .as[(Long, Long, Long)].collect()
    // roundtrip: de-interleaving the key recovers both coordinates
    def undilate(x: Long): Long = {
      var v = x & 0x5555555555555555L
      v = (v | (v >> 1)) & 0x3333333333333333L
      v = (v | (v >> 2)) & 0x0f0f0f0f0f0f0f0fL
      v = (v | (v >> 4)) & 0x00ff00ff00ff00ffL
      v = (v | (v >> 8)) & 0x0000ffff0000ffffL
      (v | (v >> 16)) & 0xffffffffL
    }
    z.foreach { case (a, b, k) =>
      assert(undilate(k) == a && undilate(k >> 1) == b)
    }
    // quadrant property: every key in the (low,low) quadrant sorts before
    // every key in the (high,high) quadrant — the clustering guarantee
    val lo = z.filter(p => p._1 < 4 && p._2 < 4).map(_._3).max
    val hi = z.filter(p => p._1 >= 4 && p._2 >= 4).map(_._3).min
    assert(lo < hi)
    // out-of-range inputs fail loudly instead of silently degrading the
    // layout (only the low 32 bits interleave)
    for (bad <- Seq(-1L, 1L << 33)) {
      val e = intercept[Throwable] {
        Seq((bad, 1L)).toDF("a", "b")
          .select(zorderKey(col("a"), col("b"))).collect()
      }
      def chain(t: Throwable): Seq[Throwable] =
        if (t == null) Nil else t +: chain(t.getCause)
      assert(chain(e).exists(c =>
        String.valueOf(c.getMessage).contains("out of range")))
    }
    // registered as a SQL function via GraftExtensions (same expression)
    org.apache.spark.sql.SparkSession.clearActiveSession()
    org.apache.spark.sql.SparkSession.clearDefaultSession()
    val gs = GraftSession.create(appName = "zorder-sql", master = "local[2]")
    try {
      assert(gs.sql("SELECT zorder_key(5, 3) AS z").head().getLong(0) ==
        (0x11L | (0x5L << 1))) // dilate(5)=0b10001, dilate(3)=0b101
      // nearest_cells also registered: literal 2-centroid model, the
      // vector aligned with the second centroid wins
      val nc = gs.sql(
        """SELECT nearest_cells(array(CAST(0.1 AS FLOAT), CAST(0.9 AS FLOAT)),
          |  array(array(CAST(1.0 AS FLOAT), CAST(0.0 AS FLOAT)),
          |        array(CAST(0.0 AS FLOAT), CAST(1.0 AS FLOAT))), 2) AS c
          |""".stripMargin).head().getSeq[Int](0)
      assert(nc == Seq(1, 0))
    } finally {
      org.apache.spark.sql.SparkSession.setDefaultSession(spark0)
      org.apache.spark.sql.SparkSession.setActiveSession(spark0)
    }
  }

  test("bfsHops: hand-computed path graph — min dist, hop bound, " +
    "unreachable excluded, early exit on empty frontier") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    // directed path a→b→c→d plus shortcut a→c; island x→y unreachable
    val edges = Seq(("a", "b"), ("b", "c"), ("c", "d"), ("a", "c"),
      ("x", "y")).toDF("u", "v")
    val seeds = Seq("a").toDF("n")
    val d3 = graft.ops.GraphOps.bfsHops(edges, seeds, maxHops = 3)
      .as[(String, Long)].collect().toMap
    // shortcut wins: c at 1 hop (not 2), d at 2
    assert(d3 == Map("a" -> 0L, "b" -> 1L, "c" -> 1L, "d" -> 2L))
    // hop bound truncates: maxHops = 1 stops before d
    val d1 = graft.ops.GraphOps.bfsHops(edges, seeds, maxHops = 1)
      .as[(String, Long)].collect().toMap
    assert(d1 == Map("a" -> 0L, "b" -> 1L, "c" -> 1L))
    // multi-source: nearest seed wins; early exit past exhaustion
    val multi = graft.ops.GraphOps.bfsHops(
        edges, Seq("a", "d").toDF("n"), maxHops = 99)
      .as[(String, Long)].collect().toMap
    assert(multi("d") == 0L && multi("c") == 1L)
  }

  test("pageRank: hand-computed star graph, partition-layout independent") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    // undirected star a-b, a-c: deg a=2, b=c=1
    val edges = Seq(("a", "b"), ("b", "a"), ("a", "c"), ("c", "a"))
      .toDF("u", "v")
    val r1 = graft.ops.GraphOps.pageRank(edges, iters = 1)
      .as[(String, Double)].collect().toMap
    // micro-units: r1(a) = 150000 + 85·2000000 div 100 = 1850000;
    // r1(b) = r1(c) = 150000 + 85·500000 div 100 = 575000
    assert(r1("a") == 1850000L / 1e6)
    assert(r1("b") == 575000L / 1e6 && r1("c") == r1("b"))
    val r5 = graft.ops.GraphOps.pageRank(edges, iters = 5)
      .as[(String, Double)].collect().toMap
    val r5b = graft.ops.GraphOps.pageRank(edges.repartition(7), iters = 5)
      .as[(String, Double)].collect().toMap
    assert(r5 == r5b) // decimal rounds: layout cannot move a single bit
    assert(r5("a") > r5("b"))
  }
  lazy val spark = TestSpark.spark
  import spark.implicits._

  test("Misra-Gries heavy hitters: guarantee and error bound hold under " +
    "any partition layout") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val k = 50
    // n=1000: "hot" (60) and "warm" (25) exceed n/k=20 → guaranteed slots
    val words = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 915).map(i => s"w${i % 300}")
    val trueCounts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    for (parts <- Seq(1, 7, 13)) {
      val sk = words.toDS().repartition(parts)
        .select(new graft.ops.StatsOps.HeavyHittersAgg(k).toColumn).head()
      assert(sk.size <= k)
      assert(sk.contains("hot") && sk.contains("warm"))
      // reported counts are lower bounds within n/k of the truth
      sk.foreach { case (w, c) =>
        assert(c <= trueCounts(w) && trueCounts(w) - c <= words.size / k,
          s"$w: sketch=$c true=${trueCounts(w)}")
      }
    }
  }

  test("Count-Min sketch: never underestimates, layout-independent matrix, " +
    "estimates within the 2n/width bound") {
    val spark0 = TestSpark.spark
    import spark0.implicits._
    val agg = new graft.ops.StatsOps.CountMinAgg(depth = 4, width = 256)
    val words = Seq.fill(60)("hot") ++ Seq.fill(25)("warm") ++
      (1 to 915).map(i => s"w${i % 300}")
    val trueCounts = words.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val sketches = Seq(1, 7, 13).map(p =>
      words.toDS().repartition(p).select(agg.toColumn).head())
    // elementwise-add merge → the SAME matrix under any partitioning
    // (unlike Misra-Gries, whose candidate set is layout-dependent)
    assert(sketches.tail.forall(_.sameElements(sketches.head)))
    val sk = sketches.head
    assert(sk.sum == 4L * words.size) // every item lands once per row
    trueCounts.foreach { case (w, c) =>
      assert(agg.estimate(sk, w) >= c,
        s"$w: underestimate ${agg.estimate(sk, w)} < $c")
    }
    // the 2n/width overestimate bound is per-row probabilistic (≤1/2),
    // so the min over 4 rows exceeds it with prob ≤ 2⁻⁴ per item —
    // assert the violation RATE, not each item (the sketch is
    // deterministic, so this is a fixed property of the fixture)
    val violations = trueCounts.count { case (w, c) =>
      agg.estimate(sk, w) - c > 2L * words.size / 256
    }
    assert(violations <= trueCounts.size / 8,
      s"$violations of ${trueCounts.size} items exceed the 2n/width bound")
  }

  test("momentStats matches hand-computed variance/covariance/correlation") {
    val df = Seq(
      ("g", 1.0, 2.0), ("g", 2.0, 4.0), ("g", 3.0, 6.0), ("g", 4.0, 8.0))
      .toDF("k", "x", "y")
    val r = StatsOps.momentStats(df, col("k"), col("x"), col("y"))
      .collect().head
    // x = 1..4: mean 2.5, sample var 5/3; y = 2x exactly correlated
    assert(r.getAs[Long]("n") == 4L)
    assert(math.abs(r.getAs[Double]("mean_x") - 2.5) < 1e-12)
    assert(math.abs(r.getAs[Double]("var_x") - 5.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("stddev_x") - math.sqrt(5.0 / 3)) < 1e-12)
    assert(math.abs(r.getAs[Double]("covar_xy") - 10.0 / 3) < 1e-12)
    assert(math.abs(r.getAs[Double]("corr_xy") - 1.0) < 1e-12)
  }

  test("rankPercentiles: exact median for odd/even group sizes, p90 rank pick") {
    val odd = (1 to 9).map(i => ("odd", i.toDouble, i.toLong))
    val even = (1 to 10).map(i => ("even", i.toDouble, i.toLong))
    val r = StatsOps.rankPercentiles(
        (odd ++ even).toDF("g", "v", "id"), col("g"), col("v"), col("id"))
      .collect().map(x => x.getString(0) -> x).toMap
    assert(r("odd").getAs[Double]("median") == 5.0) // rn 5 both picks
    assert(r("even").getAs[Double]("median") == 5.5) // (5 + 6) / 2
    assert(r("odd").getAs[Double]("p90") == 9.0) // ceil(9*0.9) = 9
    assert(r("even").getAs[Double]("p90") == 9.0) // ceil(10*0.9) = 9
  }

  test("dedupClusters: transitive chains collapse to min doc_id; singletons self-map") {
    // a~b and b~c share ≥50% 3-gram shingles, a~c do not (transitivity
    // must come from propagation, not the pair predicate)
    val docs = Seq(
      (1L, "w1 w2 w3 w4 w5 w6"),
      (2L, "w1 w2 w3 w4 w5 zz"),
      (3L, "yy w2 w3 w4 w5 zz"),
      (9L, "a1 a2 a3 a4 a5 a6")).toDF("doc_id", "text")
    val pairs = DedupOps.jaccardPairs(docs, 3, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)) && pairs.contains((2L, 3L)))
    assert(!pairs.contains((1L, 3L))) // chain, not clique
    val reps = DedupOps.dedupClusters(docs, 3, 0.5)
      .as[(Long, Long)].collect().toMap
    assert(reps == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 9L -> 9L))
  }

  test("jaccardPairsHashed == string-shingle jaccardPairs on the fixture corpus") {
    val docs = graft.catalog.Catalog.load(spark, "/root/testdata/sf0.001", "documents")
    val exact = DedupOps.jaccardPairs(docs, 5, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    val hashed = DedupOps.jaccardPairsHashed(docs, 5, 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(hashed == exact)
  }

  test("dedupClusters: driver union-find == distributed large/small-star") {
    val docs = graft.catalog.Catalog.load(spark, "/root/testdata/sf0.001", "documents")
    val unionFind = DedupOps.dedupClusters(docs) // small graph → driver path
    val propagated = DedupOps.dedupClusters(docs, driverEdgeCap = 0) // force distributed
    assert(unionFind.as[(Long, Long)].collect().toMap ==
      propagated.as[(Long, Long)].collect().toMap)
  }

  test("dedupClusters is partition-layout independent") {
    val docs = graft.catalog.Catalog.load(spark, "/root/testdata/sf0.001", "documents")
    val a = DedupOps.dedupClusters(docs).as[(Long, Long)].collect().toMap
    val b = DedupOps.dedupClusters(docs.repartition(13)).as[(Long, Long)].collect().toMap
    assert(a == b)
    // every rep is a member of its own cluster and is its minimum
    a.groupBy(_._2).foreach { case (rep, members) =>
      assert(members.keys.min == rep)
    }
  }

  test("corpusClean: keeps only quality-cleared cluster reps and exact keepers") {
    val docs = graft.catalog.Catalog.load(spark, "/root/testdata/sf0.001", "documents")
    val kept = DedupOps.corpusClean(docs, 0.38).select("doc_id")
      .as[Long].collect().toSet
    val reps = DedupOps.dedupClusters(docs)
      .filter(col("doc_id") === col("cluster_rep"))
      .select("doc_id").as[Long].collect().toSet
    val keepers = DedupOps.exactGroups(docs)
      .select("keep_id").as[Long].collect().toSet
    val quality = graft.ops.TextOps.qualityScored(docs)
      .filter(col("quality") >= 0.38).select("doc_id").as[Long].collect().toSet
    assert(kept == (reps intersect keepers intersect quality))
    assert(kept.nonEmpty && kept.size < docs.count())
  }
}
