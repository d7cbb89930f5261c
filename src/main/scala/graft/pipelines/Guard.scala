package graft.pipelines

import org.apache.spark.sql.{DataFrame, Observation}
import org.apache.spark.sql.functions._

/** One-pass data-quality guard: attach row-count and per-column
  * null-count metrics to a frame via `observe()`, then validate them
  * AFTER the write action — zero extra scans, unlike the
  * count-then-write double pass most pipelines bolt on (which at 100 TB
  * is a full extra read of the mart). The metrics ride the same job
  * that materializes the data.
  *
  * Usage:
  * {{{
  *   val (guarded, obs) = Guard.withMetrics(mart, Seq("Team", "Goals"))
  *   sink.write(guarded, name)                   // one job
  *   Guard.check(obs, minRows = 1, maxNullFrac = 0.0, Seq("Team"))
  *     .left.foreach(violations => throw ...)    // no second scan
  * }}}
  */
object Guard {

  /** Attach metrics; returns the instrumented frame + its observation. */
  def withMetrics(df: DataFrame, nullCols: Seq[String]): (DataFrame, Observation) = {
    val obs = new Observation()
    val metrics = count(lit(1)).as("rows") +:
      nullCols.map(c => count(when(col(c).isNull, 1)).as(s"nulls_$c"))
    (df.observe(obs, metrics.head, metrics.tail: _*), obs)
  }

  /** Validate collected metrics; Left = human-readable violations. Call
    * only after an action has run on the instrumented frame. */
  def check(obs: Observation, minRows: Long, maxNullFrac: Double,
      nullCols: Seq[String]): Either[Seq[String], Map[String, Long]] = {
    val m = obs.get
    val rows = m("rows").asInstanceOf[Long]
    val nulls = nullCols.map(c => c -> m(s"nulls_$c").asInstanceOf[Long]).toMap
    val violations =
      (if (rows < minRows) Seq(s"rows=$rows below minRows=$minRows") else Nil) ++
        nulls.collect {
          case (c, n) if rows > 0 && n.toDouble / rows > maxNullFrac =>
            s"column $c: $n/$rows nulls exceeds maxNullFrac=$maxNullFrac"
        }
    if (violations.nonEmpty) Left(violations)
    else Right(nulls + ("rows" -> rows))
  }
}
