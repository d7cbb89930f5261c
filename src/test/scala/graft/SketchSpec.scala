package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

/** q166's CMS audit on the real documents corpus: the structural
  * overestimate guarantee holds on every reported token and the excess
  * stays within a generous e*N/width envelope. (Matrix mergeability and
  * layout independence are pinned in AnalyticsSpec's CountMinAgg test.)
  */
class SketchSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._

  private val dir = "/root/testdata/sf0.001"

  test("heavy hitters: every token above n/k is a candidate; exact count " +
    "within n/k of the MG lower bound") {
    val docs = graft.catalog.Catalog.load(spark, dir, "documents")
    val toks = graft.ops.TextOps.exploded(docs).select(col("tok")).as[String]
    val n = toks.count()
    val k = 32
    val rows = graft.queries.TextQueries.heavyHitters(spark, dir)
      .select("tok", "exact_n", "mg_lower")
      .as[(String, Long, Long)].collect()
    val cand = rows.map(_._1).toSet
    // no-miss guarantee: anything with true frequency > n/k survives
    val mustHave = toks.toDF("tok").groupBy("tok").count()
      .filter(col("count") > n / k).as[(String, Long)].collect()
    for ((tok, c) <- mustHave)
      assert(cand(tok), s"missed heavy hitter $tok ($c > ${n / k})")
    for ((tok, exact, lower) <- rows) {
      assert(lower <= exact, s"$tok: MG bound $lower above exact $exact")
      assert(exact - lower <= n / k + 1, s"$tok: error ${exact - lower}")
    }
  }

  test("jaro_winkler: canonical vectors, bounds, codegen==eval, and q170 " +
    "resolves every transposed name back to its own key") {
    import graft.functions.JaroWinkler
    def jw(a: String, b: String): Double = JaroWinkler.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(a),
      org.apache.spark.unsafe.types.UTF8String.fromString(b))
    assert(math.abs(jw("MARTHA", "MARHTA") - 0.9611111111111111) < 1e-15)
    assert(math.abs(jw("DWAYNE", "DUANE") - 0.84) < 1e-15)
    assert(jw("", "") == 1.0 && jw("a", "") == 0.0 && jw("same", "same") == 1.0)
    assert(jw("abc", "xyz") == 0.0)
    // interpreted eval matches the codegen path through a real plan
    val viaPlan = Seq(("MARTHA", "MARHTA")).toDF("a", "b")
      .select(JaroWinkler.jaroWinkler(col("a"), col("b")).as("s"))
      .as[Double].head()
    assert(viaPlan == jw("MARTHA", "MARHTA"))
    // q170: every dirtied customer matches its own key with jw >= 0.95
    val er = graft.Registry.byName("q170_jw_er").build(spark, dir)
      .select("dirty_key", "matched_key", "jw")
      .as[(Long, Long, Double)].collect()
    val self = er.filter(r => r._1 == r._2)
    val nCust = graft.catalog.Catalog.load(spark, dir, "customer").count()
    assert(self.length == nCust, s"${self.length} of $nCust self-matches")
    assert(self.forall(_._3 >= 0.95))
  }

  test("cms audit: every estimate >= exact, excess within 10*N/width") {
    val docs = graft.catalog.Catalog.load(spark, dir, "documents")
    val toks = graft.ops.TextOps.exploded(docs).select(col("tok")).as[String]
    val n = toks.count()
    val rows = graft.queries.TextQueries.cmsFreq(spark, dir)
      .select("tok", "exact_n", "est_n", "overest")
      .as[(String, Long, Long, Boolean)].collect()
    assert(rows.length == 20)
    val bound = 10L * n / 1024 + 1
    for ((tok, exact, est, over) <- rows) {
      assert(over && est >= exact, s"$tok: est $est < exact $exact")
      assert(est - exact <= bound, s"$tok: excess ${est - exact} > $bound")
    }
  }

  test("kmv: k-min set == relational slice(sort_array(collect_set)) " +
    "under any partitioning; plain merge associates; estimate near exact") {
    import graft.ops.StatsOps
    val k = 256
    val e = graft.catalog.Catalog.load(spark, dir, "events")
    // relational twin: exact k smallest distinct hashes per group
    val twin = e
      .select(col("event_type"), xxhash64(col("user_id")).as("h"))
      .groupBy("event_type")
      .agg(slice(sort_array(collect_set(col("h"))), 1, k).as("kmins"))
    def sets(df: org.apache.spark.sql.DataFrame) = df
      .select(col("event_type"), col("kmins"))
      .as[(String, Array[Long])].collect().toMap.view.mapValues(_.toSeq).toMap
    val agg = new StatsOps.KmvAgg(k)
    def viaUdaf(parts: Int) = e.repartition(parts)
      .select(col("event_type").cast("string").as("grp"),
        xxhash64(col("user_id")).as("h"))
      .as[(String, Long)].groupByKey(_._1).mapValues(_._2)
      .agg(agg.toColumn.name("kmins")).toDF("event_type", "kmins")
    assert(sets(viaUdaf(1)) == sets(twin))
    assert(sets(viaUdaf(13)) == sets(twin))
    // merge is a k-bounded set union regardless of grouping
    val hs = (1L to 1000L).map(h => h * 2654435761L)
    val (a, b) = hs.splitAt(317)
    val whole = hs.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(
      a.foldLeft(agg.zero)(agg.reduce), b.foldLeft(agg.zero)(agg.reduce))
    assert(merged.hs.toSeq == whole.hs.toSeq)
    // estimator: within 20% of exact on the fixture (deterministic)
    val exact = e.groupBy("event_type")
      .agg(countDistinct(col("user_id")).as("n"))
      .as[(String, Long)].collect().toMap
    val est = graft.queries.AnalyticsQueries.kmvDistinct(spark, dir)
      .select(col("event_type"), col("kmv_est"))
      .as[(String, Double)].collect()
    assert(est.nonEmpty)
    for ((t, v) <- est) {
      val ex = exact(t).toDouble
      assert(math.abs(v - ex) <= 0.2 * ex + 1,
        s"$t: kmv $v vs exact $ex")
    }
  }

  test("bottom-k sample: layout-independent, bit-equal to the relational " +
    "rank-k twin, merge associates, quantile rank error bounded") {
    import graft.ops.StatsOps
    val k = 256
    val e = graft.catalog.Catalog.load(spark, dir, "events")
    def viaUdaf(parts: Int) = e.repartition(parts)
      .select(col("event_type").cast("string").as("grp"),
        xxhash64(col("event_id")).as("h"), col("value").as("v"))
      .as[(String, Long, Double)]
      .groupByKey(_._1).mapValues(t => (t._2, t._3))
      .agg(new StatsOps.BottomKAgg(k).toColumn.name("s"))
      .map { case (g, s) => (g, (s.hs.toSeq, s.vs.toSeq)) }
      .collect().toMap
    val a = viaUdaf(1); val b = viaUdaf(13)
    assert(a == b, "partition layout changed the sample")
    // relational twin: the k smallest (hash, value) rows per group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("grp")).orderBy(col("h"), col("v"))
    val twin = e
      .select(col("event_type").cast("string").as("grp"),
        xxhash64(col("event_id")).as("h"), col("value").as("v"))
      .withColumn("rn", row_number().over(w)).filter(col("rn") <= k)
      .orderBy(col("grp"), col("h"), col("v"))
      .select(col("grp"), col("h"), col("v"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (g, rows) =>
        g -> (rows.map(_._2).toSeq, rows.map(_._3).toSeq) }
    assert(a == twin, "UDAF sample != relational rank-k twin")
    // merge associativity on plain buffers
    val agg = new StatsOps.BottomKAgg(8)
    val items = (1L to 100L).map(i => (i * 2654435761L, i * 1.5))
    val (x, y) = items.splitAt(37)
    val whole = items.foldLeft(agg.zero)(agg.reduce)
    val merged = agg.merge(
      x.foldLeft(agg.zero)(agg.reduce), y.foldLeft(agg.zero)(agg.reduce))
    assert(whole.hs.toSeq == merged.hs.toSeq &&
      whole.vs.toSeq == merged.vs.toSeq)
    // rank-error bound: est_p50 lands within exact ranks [0.35n, 0.65n]
    val q = graft.queries.AnalyticsQueries.sampleQuantiles(spark, dir)
      .select(col("event_type"), col("est_p50"), col("est_p90"))
      .as[(String, Double, Double)].collect()
    assert(q.nonEmpty)
    val byType = e.select(col("event_type").cast("string"), col("value"))
      .as[(String, Double)].collect().groupBy(_._1).view
      .mapValues(_.map(_._2).sorted).toMap
    for ((t, p50, p90) <- q) {
      val vs = byType(t); val n = vs.length
      def rankOf(v: Double) = vs.count(_ <= v).toDouble / n
      assert(rankOf(p50) >= 0.35 && rankOf(p50) <= 0.65,
        s"$t p50 rank ${rankOf(p50)}")
      assert(rankOf(p90) >= 0.80 && rankOf(p90) <= 0.97,
        s"$t p90 rank ${rankOf(p90)}")
    }
  }
}
