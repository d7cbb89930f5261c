package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev utility: wall-time a single op repeatedly outside the Bench
  * harness (`runMain graft.tools.TimeOp <sfDir> <reps>`) — isolates
  * whether a bench movement lives in the operator or the harness. */
object TimeOp {
  def main(args: Array[String]): Unit = {
    val dir = args(0)
    val reps = if (args.length > 1) args(1).toInt else 5
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.catalog.Catalog.load(spark, dir, "documents")
    (1 to reps).foreach { i =>
      val t0 = System.nanoTime()
      val n = graft.ops.MediaOps.mediaFeatures(docs).count()
      println(f"rep $i: ${(System.nanoTime() - t0) / 1e9}%.3f s ($n rows)")
    }
    spark.stop()
  }
}
