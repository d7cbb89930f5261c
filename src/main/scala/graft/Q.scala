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
  /** Registered queries grouped by the source file that declares them —
    * the single source [[all]] AND the generated SURVEY §2.7 inventory
    * ([[Survey]]) derive from, so the blueprint can never drift from
    * the registry. */
  lazy val families: Seq[(String, Seq[Q])] = Seq(
    "src/main/scala/graft/queries/CoreQueries.scala" -> queries.CoreQueries.all,
    "src/main/scala/graft/queries/RefMartQueries.scala" -> queries.RefMartQueries.all,
    "src/main/scala/graft/queries/BreadthQueries.scala" -> queries.BreadthQueries.all,
    "src/main/scala/graft/queries/AnalyticsQueries.scala" -> queries.AnalyticsQueries.all,
    "src/main/scala/graft/queries/WindowQueries.scala" -> queries.WindowQueries.all,
    "src/main/scala/graft/queries/TextQueries.scala" -> queries.TextQueries.all,
    "src/main/scala/graft/queries/DedupQueries.scala" -> queries.DedupQueries.all,
    "src/main/scala/graft/queries/VectorQueries.scala" -> queries.VectorQueries.all,
    "src/main/scala/graft/queries/EventQueries.scala" -> queries.EventQueries.all,
    "src/main/scala/graft/queries/MultimodalQueries.scala" -> queries.MultimodalQueries.all,
    "src/main/scala/graft/queries/MiningQueries.scala" -> queries.MiningQueries.all,
    "src/main/scala/graft/queries/ScienceQueries.scala" -> queries.ScienceQueries.all,
    "src/main/scala/graft/queries/InsightQueries.scala" -> queries.InsightQueries.all,
    "src/main/scala/graft/queries/CompositionQueries.scala" -> queries.CompositionQueries.all)

  /** Full declared surface; SparkEntry derives its maps from this. */
  lazy val all: Seq[Q] = families.flatMap(_._2)

  lazy val byName: Map[String, Q] = all.map(q => q.name -> q).toMap
}
