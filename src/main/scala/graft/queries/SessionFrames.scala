package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}

/** The session-scoped frame memo behind [[TradeGraph]] and
  * [[BasketFrames]]: each (kind, dataset dir) builds once per
  * SparkSession, `localCheckpoint`s, and is reused by every later
  * caller — with the two staleness checks that make reuse safe (same
  * session; checkpointed RDD still registered, because an unpersisted
  * localCheckpoint cannot recompute). Bench's between-query unpersist
  * sweep consults [[liveRddIds]] to spare exactly these blocks. */
private[graft] object SessionFrames {

  private final case class Entry(session: SparkSession, rddId: Int,
      df: DataFrame)
  private val memo =
    scala.collection.concurrent.TrieMap.empty[(String, String), Entry]

  /** Checkpointed RDD ids currently backing memo entries. */
  def liveRddIds: Set[Int] = memo.values.map(_.rddId).toSet

  /** Drop every memo entry (tests use this to force cold rebuilds). */
  def invalidateAll(): Unit = synchronized { memo.clear() }

  private def rddIdOf(df: DataFrame): Int =
    df.queryExecution.analyzed.collect {
      case l: org.apache.spark.sql.execution.LogicalRDD => l.rdd.id
    }.headOption.getOrElse(throw new IllegalStateException(
      "expected a localCheckpoint-backed frame"))

  def cached(kind: String, dir: String, spark: SparkSession)
      (build: => DataFrame): DataFrame = synchronized {
    memo.get((kind, dir)) match {
      case Some(e) if (e.session eq spark) &&
          spark.sparkContext.getPersistentRDDs.contains(e.rddId) =>
        e.df
      case _ =>
        // lazy checkpoint: materializes inside the first action that
        // uses it; the persist registration (consulted above and by
        // Bench's sweep) happens immediately
        val df = build.localCheckpoint(eager = false)
        memo.put((kind, dir), Entry(spark, rddIdOf(df), df))
        df
    }
  }
}
