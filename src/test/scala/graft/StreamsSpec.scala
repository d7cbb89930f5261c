package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._
import graft.streaming.Streams
import graft.queries.EventQueries

/** Streaming twins must agree with their batch forms: the memory-sink
  * results of the streaming plans are compared against the batch
  * (oracle-checked) EventQueries outputs on the same fixture.
  */
class StreamsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  import spark.implicits._
  private val dir = "/root/testdata/sf0.001"

  test("streaming tumbling counts == batch tumbling (complete mode)") {
    // file stream sources need a directory: stage the fixture file
    val staged = java.nio.file.Files.createTempDirectory("events-stream")
    java.nio.file.Files.copy(
      java.nio.file.Paths.get(s"$dir/events.parquet"),
      staged.resolve("events.parquet"))
    val q = Streams.tumblingCounts(Streams.eventStream(spark, staged.toString))
      .writeStream.format("memory").queryName("tumb")
      .outputMode("complete").start()
    q.processAllAvailable(); q.stop()
    val streamed = spark.table("tumb")
      .select("win_start_us", "event_type", "n", "sum_value")
      .as[(Long, String, Long, Double)].collect().toSet
    val batch = EventQueries.tumbling(spark, dir)
      .as[(Long, String, Long, Double)].collect().toSet
    assert(streamed == batch)
  }

  test("stateful sessionizer == session_window batch semantics") {
    val events = graft.catalog.Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"), col("value"))
      .as[Streams.Ev]
    val sessions = Streams.sessionize(events)
      .select("user_id", "sess_start_us", "sess_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    val batch = EventQueries.sessions(spark, dir)
      .select("user_id", "sess_start_us", "sess_end_us", "n_events")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(sessions == batch)
  }
}
