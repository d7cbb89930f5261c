package graft

import org.scalatest.funsuite.AnyFunSuite

/** Fleet-wide scale guard: NO registered query may plan a
  * CartesianProduct unless it is on the explicit allowlist below with a
  * written justification. At 100 TB an accidental cartesian is the
  * difference between a job and an outage; this sweep catches one the
  * moment a refactor lets it slip in, across the whole surface at once.
  */
class CartesianSweepSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  /** Queries allowed to plan a cartesian, each with the reason it is
    * scale-safe anyway. */
  private val allowed: Map[String, String] = Map(
    "q79_cross_join" -> ("the operator under test IS an explicit cartesian " +
      "of the two smallest dims (5×25 rows, both broadcast-sized)")
  )

  test("no registered query plans a CartesianProduct (allowlist excepted)") {
    val offenders = Registry.all.flatMap { q =>
      if (allowed.contains(q.name)) None
      else {
        val p =
          try q.build(spark, dir).queryExecution.executedPlan.toString
          catch { case e: Throwable => s"BUILD FAILED: ${e.getMessage}" }
        if (p.contains("CartesianProduct") || p.startsWith("BUILD FAILED"))
          Some(q.name -> p.linesIterator
            .filter(l => l.contains("CartesianProduct") || l.startsWith("BUILD"))
            .take(2).mkString("; "))
        else None
      }
    }
    assert(offenders.isEmpty,
      offenders.map { case (n, l) => s"$n: $l" }.mkString("\n"))
  }
}
