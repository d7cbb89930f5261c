package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window => LWindow}

/** TEMPORARY round-11 triage tool: list every registered query whose
  * optimized logical plan contains a Window with an EMPTY partition
  * spec, plus the window's function list — input for WindowSweepSpec's
  * allowlist. Deleted once the sweep lands. */
object WindowScan {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.001"
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    Registry.all.foreach { q =>
      try {
        val plan = q.build(spark, sfDir).queryExecution.optimizedPlan
        val hits = plan.collectWithSubqueries {
          case w: LWindow if w.partitionSpec.isEmpty =>
            w.windowExpressions.map(_.sql).mkString("; ").take(120)
        }
        if (hits.nonEmpty)
          println(s"OFFENDER ${q.name} :: ${hits.mkString(" || ")}")
      } catch {
        case e: Throwable => println(s"BUILDFAIL ${q.name} ${e.getMessage.take(80)}")
      }
    }
    spark.stop()
  }
}
