package graft
import org.apache.spark.sql.SparkSession

/** Dev utility (not part of the engine surface): time named registry
  * queries standalone (3 reps each after a warmup) and, with
  * `PROBE_DUMP=<dir>`, dump their results + oracle SQL in the same
  * layout `Verify` writes, so `tools/check.py` can oracle-check a
  * subset without a full 150-query sweep. */
object Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    try { SparkEntry.entry(spark).count() } catch { case _: Throwable => }
    val names = args.toSeq
    names.foreach { n =>
      val fn = SparkEntry.queries(n)
      (1 to 3).foreach { i =>
        val t0 = System.nanoTime()
        val c = fn(spark, sfDir).count()
        println(f"[probe] $n rep$i ${(System.nanoTime()-t0)/1e9}%.3f s rows=$c")
      }
      if (sys.env.contains("PROBE_EXPLAIN"))
        fn(spark, sfDir).explain("formatted")
    }
    sys.env.get("PROBE_DUMP").foreach { out =>
      new java.io.File(out).mkdirs()
      names.foreach { n =>
        SparkEntry.queries(n)(spark, sfDir).coalesce(1)
          .write.mode("overwrite").parquet(s"$out/$n")
      }
      def q(s: String): String = "\"" + s.flatMap {
        case '"' => "\\\""; case '\\' => "\\\\"; case '\n' => "\\n"
        case c if c < ' ' => f"\\u${c.toInt}%04x"; case c => c.toString
      } + "\""
      val json = names.flatMap(n => SparkEntry.oracleSql.get(n).map(n -> _))
        .map { case (k, v) => s"${q(k)}: ${q(v)}" }.mkString("{", ",", "}")
      java.nio.file.Files.writeString(
        java.nio.file.Paths.get(s"$out/oracle_sql.json"), json)
    }
    spark.stop()
  }
}
