package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One registered engine query: a DataFrame builder over a scale-factor dir
  * plus (when SQL-expressible) the DuckDB oracle statement the driver
  * hash-compares against. Column names/aliases MUST match between the two.
  */
final case class Q(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String],
    doc: String = "")

object Registry {
  /** Full declared surface; SparkEntry derives its maps from this. */
  lazy val all: Seq[Q] =
    queries.CoreQueries.all ++
      queries.RefMartQueries.all ++
      queries.BreadthQueries.all ++
      queries.AnalyticsQueries.all ++
      queries.WindowQueries.all ++
      queries.TextQueries.all ++
      queries.DedupQueries.all ++
      queries.VectorQueries.all ++
      queries.EventQueries.all ++
      queries.MultimodalQueries.all ++
      queries.MiningQueries.all ++
      queries.ScienceQueries.all

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
