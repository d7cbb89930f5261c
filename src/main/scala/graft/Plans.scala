package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.ExplainMode

/** Plan-dump tool: prints `explain("formatted")` for the named registry
  * queries (all of them by default). Usage:
  * `runMain graft.Plans <sfDir> [queryName...]` — the source of PLANS.md.
  */
object Plans {
  def main(args: Array[String]): Unit = {
    val dir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.01"
    val names = if (args.length > 1) args.drop(1).toSeq else Registry.all.map(_.name)
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"## $n\n")
      println("```")
      println(Registry.byName(n).build(spark, dir)
        .queryExecution.explainString(ExplainMode.fromString("formatted")))
      println("```")
    }
    spark.stop()
  }
}
