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
