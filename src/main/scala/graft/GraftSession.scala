package graft

import org.apache.spark.sql.SparkSession

/** Session factory: the engine's recommended configuration in one place,
  * so library users get the same posture the queries were designed for.
  *
  *  - Graft extensions (SQL functions + the AbsRangeRewrite optimizer
  *    rule) are always installed.
  *  - AQE stays on with partition coalescing and skew-join splitting —
  *    the runtime re-plan layer the static plans rely on at scale.
  *  - Shuffle partitions default to 2× the executor cores available to
  *    the master (the local heuristic; on a real cluster pass
  *    `shufflePartitions` sized to keep post-filter partitions in the
  *    100-200 MB range at your data scale).
  *  - Session timezone pinned to UTC: timestamp arithmetic must not
  *    depend on where the driver happens to run.
  */
object GraftSession {

  def create(
      appName: String = "graft",
      master: String = s"local[${Runtime.getRuntime.availableProcessors()}]",
      shufflePartitions: Option[Int] = None): SparkSession = {
    val procs = Runtime.getRuntime.availableProcessors()
    val cores = master match {
      case s if s.startsWith("local[") && s.endsWith("]") =>
        // first segment only: "local[4,2]" (N, maxTaskFailures) is a
        // valid master; anything unparseable falls back to the machine
        s.stripPrefix("local[").stripSuffix("]").split(',')(0).trim match {
          case "*" => procs
          case n => n.toIntOption.getOrElse(procs)
        }
      case _ => procs
    }
    SparkSession.builder()
      .appName(appName)
      .master(master)
      .withExtensions(new graft.functions.GraftExtensions)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.shuffle.partitions",
        shufflePartitions.getOrElse(cores * 2).toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      .getOrCreate()
  }
}
