package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.catalog.Catalog
import graft.pipelines.Runner

/** S1 round-trip against Spark's bundled embedded Derby: JdbcSink
  * full-replace write → Catalog.loadJdbc partitioned read. No external
  * database — the DB lives in this JVM's memory.
  */
class JdbcSourceSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  // keep Derby's derby.log out of the repo working tree
  System.setProperty("derby.system.home",
    java.nio.file.Files.createTempDirectory("derby-home").toString)
  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("JdbcSink write -> loadJdbc partitioned read round-trips") {
    val nation = Catalog.load(spark, dir, "nation")
    Runner.JdbcSink(url, new java.util.Properties).write(nation, "nation")
    val back = Catalog.loadJdbc(spark, url, "nation",
      partitionCol = "n_nationkey", numPartitions = 4)
    // the scan really is split: one range query per requested partition
    assert(back.rdd.getNumPartitions == 4)
    val a = nation.orderBy("n_nationkey")
      .as[(Int, String, Int)].collect().toSeq
    val b = back.select(col("n_nationkey").cast("int"), col("n_name"),
        col("n_regionkey").cast("int"))
      .orderBy("n_nationkey").as[(Int, String, Int)].collect().toSeq
    assert(a == b)
  }

  test("incremental watermark pull ships only the delta; predicate " +
    "pushed to the database") {
    val rows = (1L to 20L).map(i => (i, s"row$i", i * 10)) // wm = i*10
    Runner.JdbcSink(url, new java.util.Properties)
      .write(rows.toDF("id", "v", "wm"), "inc_src")
    // first pull: everything after wm=0
    val first = Catalog.loadJdbcIncremental(spark, url, "inc_src",
      watermarkCol = "wm", lastSeen = 0L, partitionCol = "id",
      numPartitions = 4)
    assert(first.count() == 20)
    assert(first.rdd.getNumPartitions == 4) // delta read is range-split
    val hwm = first.agg(max(col("wm"))).collect()(0).getLong(0)
    assert(hwm == 200L)
    // second pull from the high-water mark: empty (STRICTLY greater)
    assert(Catalog.loadJdbcIncremental(spark, url, "inc_src",
      "wm", hwm, "id", 4).count() == 0)
    // new rows arrive; only they ship
    Seq((21L, "row21", 210L), (22L, "row22", 220L)).toDF("id", "v", "wm")
      .write.mode("append").jdbc(url, "inc_src", new java.util.Properties)
    val delta = Catalog.loadJdbcIncremental(spark, url, "inc_src",
      "wm", hwm, "id", 4)
    assert(delta.select(col("id").cast("long")).as[Long].collect().toSet ==
      Set(21L, 22L))
  }

  test("full-replace semantics: second write replaces, never appends") {
    val r1 = Catalog.load(spark, dir, "region")
    Runner.JdbcSink(url, new java.util.Properties).write(r1, "region")
    Runner.JdbcSink(url, new java.util.Properties).write(r1, "region")
    val back = Catalog.loadJdbc(spark, url, "region", "r_regionkey", 2)
    assert(back.count() == r1.count())
  }

  test("streaming snapshots publish to JDBC with per-epoch bookkeeping") {
    import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val in = MemoryStream[(Long, Double)]
    val agg = in.toDF().toDF("user_id", "value")
      .groupBy("user_id").agg(sum(col("value")).as("total"))
    val q = graft.streaming.Streams.publishToJdbc(agg, url, "snap").start()
    try {
      in.addData((1L, 2.0), (2L, 3.0)); q.processAllAvailable()
      in.addData((1L, 5.0)); q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "snap").load()
      .as[(Long, Double)].collect().toMap
    assert(back == Map(1L -> 7.0, 2L -> 3.0)) // latest snapshot serves
    val epochs = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "snap_epochs").load()
      .as[Long].collect().toSet
    assert(epochs.size >= 2) // one bookkeeping row per committed batch
  }

  test("empty table degrades to a single-partition read") {
    val empty = Catalog.load(spark, dir, "region").filter(lit(false))
    Runner.JdbcSink(url, new java.util.Properties).write(empty, "region_empty")
    val back = Catalog.loadJdbc(spark, url, "region_empty", "r_regionkey", 8)
    assert(back.count() == 0)
  }
}
