package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: print the formatted physical plan of registered queries
  * (`runMain graft.tools.ExplainOne <sfDir> <name>[,<name>…]`) — the
  * iteration loop behind PlanSpec assertions. */
object ExplainOne {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val names = args(1).split(",").toSeq
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    names.foreach { n =>
      println(s"===== $n =====")
      graft.Registry.byName(n).build(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
