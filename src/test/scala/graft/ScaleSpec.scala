package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.ops.SkewOps

/** Scale-pattern specs: salted skew joins, bucketed co-located joins,
  * partition-pruned reads, streaming dedup — each asserting both the
  * result AND the plan property that matters on a cluster.
  */
class ScaleSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("salted join == plain join (skew spreading changes plan, not result)") {
    val li = Catalog.load(spark, dir, "lineitem")
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey").as("l_orderkey"), col("o_totalprice"))
    val plain = li.join(o, Seq("l_orderkey"), "inner")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"),
        graft.ops.Det.dsum(col("o_totalprice")).as("s"))
    val salted = SkewOps.saltedJoin(li, o, "l_orderkey", factor = 8,
        saltFrom = Seq("l_orderkey", "l_linenumber"))
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n"),
        graft.ops.Det.dsum(col("o_totalprice")).as("s"))
    val a = plain.orderBy("l_orderkey").as[(Long, Long, Double)].collect()
    val b = salted.orderBy("l_orderkey").as[(Long, Long, Double)].collect()
    assert(a.sameElements(b))
  }

  test("bucketed tables join without an exchange (co-located join)") {
    val wh = spark.conf.get("spark.sql.warehouse.dir")
    spark.sql("DROP TABLE IF EXISTS li_b"); spark.sql("DROP TABLE IF EXISTS o_b")
    Catalog.load(spark, dir, "lineitem")
      .write.bucketBy(4, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").mode("overwrite").saveAsTable("li_b")
    Catalog.load(spark, dir, "orders")
      .write.bucketBy(4, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/o_b").mode("overwrite").saveAsTable("o_b")
    // at fixture size Catalyst would (rightly) broadcast; disable it to
    // exercise the large-large path bucketing exists for
    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("li_b")
        .join(spark.table("o_b"), col("l_orderkey") === col("o_orderkey"))
      val plan = joined.queryExecution.executedPlan.toString
      assert(plan.contains("SortMergeJoin") || plan.contains("ShuffledHashJoin"))
      assert(!plan.contains("Exchange hashpartitioning"),
        "bucketed join must not reshuffle either side")
      assert(joined.count() ==
        Catalog.load(spark, dir, "lineitem").count()) // FK: every line has an order
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
  }

  test("partition-pruned read: only the matching run_date is scanned") {
    val out = java.nio.file.Files.createTempDirectory("prune").toString
    val df = Seq(("a", "2026-08-11"), ("b", "2026-08-12"), ("c", "2026-08-12"))
      .toDF("v", "run_date")
    df.write.partitionBy("run_date").parquet(s"$out/t")
    val read = spark.read.parquet(s"$out/t").filter(col("run_date") === "2026-08-12")
    val plan = read.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(run_date"))
    assert(read.count() == 2)
    // the pruned partition's files are not in the scan
    assert(!plan.contains("run_date=2026-08-11"))
  }

  test("df-capped dedup candidates: one hot shingle cannot go quadratic") {
    import graft.ops.DedupOps
    // 300 docs all sharing a 12-token boilerplate prefix (8 hot shingles,
    // df=300 each) + unique 30-token tails, plus one genuine near-dup pair
    // built from rare shingles
    val boiler = (1 to 12).map(i => s"boiler$i").mkString(" ")
    val base = (1L to 300L).map { i =>
      (i, s"$boiler " + (1 to 30).map(j => s"u${i}w$j").mkString(" "))
    }
    val nd1 = (900L, (1 to 31).map(j => s"ndw$j").mkString(" "))
    val nd2 = (901L, ((1 to 30).map(j => s"ndw$j") :+ "tailx").mkString(" "))
    val docs = (base :+ nd1 :+ nd2).toDF("doc_id", "text")
    val sh = DedupOps.hashedShingles(docs, 5)
    def candidates(postings: org.apache.spark.sql.DataFrame): Long =
      postings.as("a").join(postings.as("b"),
        col("a.sh_h") === col("b.sh_h") && col("a.doc_id") < col("b.doc_id"))
        .count()
    // uncapped: the hot shingles alone emit 8 × C(300,2) ≈ 3.6e5 pairs
    assert(candidates(sh) > 300000L)
    // capped at maxDf=50: hot shingles dropped, only the near-dup pair's
    // 26 shared rare shingles survive as candidates
    val capped = DedupOps.capHotKeys(sh, Seq("sh_h"), maxDf = 50)
    assert(candidates(capped) <= 30L)
    // the op still finds exactly the true near-dup under the cap (the
    // boilerplate-only pairs are far below τ=0.5 anyway)
    val pairs = DedupOps.jaccardPairsHashed(docs, 5, 0.5, maxDf = 50)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((900L, 901L)))
  }

  test("large/small-star CC == min-label propagation on a skewed " +
    "hot-hub graph, in far fewer rounds") {
    import graft.ops.DedupOps
    // one component shaped like near-dup graphs actually look: a long
    // chain (diameter 41 — worst case for diameter-bound propagation)
    // welded to a hot hub (one vertex with 500 spokes — worst case for
    // per-vertex skew)
    val chain = (0L until 40L).map(i => (i, i + 1))
    val hub = (1L to 500L).map(i => (1000L, 1000L + i))
    val edges0 = (chain ++ hub :+ (40L, 1000L)).toDF("u", "v")
    val sym = edges0.union(edges0.select(col("v").as("u"), col("u").as("v")))
    val (mlp, mlpRounds) = DedupOps.minLabelPropagation(sym, maxIters = 60)
    val (lss, lssRounds) = DedupOps.largeSmallStarLabels(sym, maxIters = 60)
    val a = mlp.as[(Long, Long)].collect().toMap
    val b = lss.as[(Long, Long)].collect().toMap
    assert(a == b)
    assert(b.values.toSet == Set(0L)) // one component, labeled by its min
    assert(b.size == 542)            // every vertex labeled
    info(s"min-label rounds=$mlpRounds, large/small-star rounds=$lssRounds")
    assert(lssRounds < mlpRounds / 2,
      s"expected O(log) rounds vs O(diameter): $lssRounds vs $mlpRounds")
  }

  test("z-order layout: 2-D selective scan reads less than random layout") {
    import graft.functions.ZOrderKey.zorderKey
    val li = Catalog.load(spark, "/root/testdata/sf0.01", "lineitem")
      .withColumn("zkey", zorderKey(col("l_partkey"), col("l_suppkey")))
    val out = java.nio.file.Files.createTempDirectory("zorder").toString
    // clustered: each of 16 files covers one zkey range → tight per-file
    // (l_partkey, l_suppkey) min/max envelopes
    li.repartitionByRange(16, col("zkey")).sortWithinPartitions("zkey")
      .drop("zkey").write.parquet(s"$out/clustered")
    // random: every file spans the full key space
    li.drop("zkey").repartition(16).write.parquet(s"$out/random")
    def scanRows(path: String): Long = {
      val df = spark.read.parquet(path)
        .filter(col("l_partkey") < 100 && col("l_suppkey") < 5)
      df.collect()
      df.queryExecution.executedPlan.collectLeaves()
        .collectFirst {
          case s: org.apache.spark.sql.execution.FileSourceScanExec =>
            s.metrics("numOutputRows").value
        }.get
    }
    val clustered = scanRows(s"$out/clustered")
    val random = scanRows(s"$out/random")
    // same answer, far fewer rows surface from the clustered scan because
    // whole row groups fail the pushed min/max bounds
    assert(clustered < random / 2,
      s"clustered=$clustered random=$random — z-order should prune row groups")
  }

  test("degree orientation bounds wedge fan-out: a 60-degree hub keeps " +
    "out-degree 0") {
    // star graph: hub 0 — leaves 1..60, plus a sparse leaf ring. Naive
    // wedge enumeration at the hub is C(60,2) = 1770 pairs; oriented,
    // every hub edge points INTO the hub (it has the max degree), so the
    // hub contributes zero wedges and the max out-degree stays tiny.
    val star = (1L to 60L).map(i => (0L, i)) ++
      (1L until 60L by 7L).map(i => (i, i + 1))
    val oriented = graft.ops.GraphOps.orient(star.toDF("a", "b"))
    val outdeg = oriented.groupBy($"u").count().as[(Long, Long)].collect().toMap
    assert(!outdeg.contains(0L)) // hub: out-degree 0
    assert(outdeg.values.max <= 2, outdeg) // every leaf: ≤ ring + hub edge
    // and the oriented triangle count still matches the naive enumeration
    // on this graph (PropertySpec covers random graphs)
    val eset = star.map { case (a, b) => (math.min(a, b), math.max(a, b)) }.toSet
    val nodes = star.flatMap(e => Seq(e._1, e._2)).distinct
    val brute = (for {
      a <- nodes; b <- nodes if a < b && eset((a, b))
      c <- nodes if b < c && eset((b, c)) && eset((a, c))
    } yield 1).size.toLong
    val got = graft.ops.GraphOps.trianglesPerNode(star.toDF("a", "b"))
      .agg(sum($"triangles")).as[Option[Long]].collect()(0).getOrElse(0L)
    assert(got == brute * 3) // each triangle counted at its 3 nodes
  }

  test("streaming dedup: dropDuplicates over the stream == batch distinct") {
    val staged = java.nio.file.Files.createTempDirectory("events-dedup")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    // duplicate the file → every event arrives twice
    java.nio.file.Files.copy(
      staged.resolve("events.parquet"), staged.resolve("events2.parquet"))
    val q = graft.streaming.Streams.eventStream(spark, staged.toString)
      .withWatermark("ts", "1 hour")
      .dropDuplicates("event_id")
      .groupBy().count()
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("dedup_stream").as[Long].collect()(0)
    val batch = Catalog.load(spark, dir, "events").count()
    assert(streamed == batch)
  }
}
