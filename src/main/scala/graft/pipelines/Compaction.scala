package graft.pipelines

import java.nio.file.{Files, Paths}
import org.apache.spark.sql.SparkSession

/** Small-file compaction for parquet datasets — the maintenance operator
  * every long-running ingest needs at scale: streaming/micro-batch sinks
  * and over-parallel writes leave thousands of KB-sized files per
  * directory, and at 100 TB the resulting footer reads + scheduler
  * pressure dominate scan cost long before the bytes do.
  *
  * The rewrite sizes its output from the actual byte total
  * (ceil(bytes / targetBytes) files) and republishes through
  * [[Runner.AtomicParquetSink]], so readers see either the old fragmented
  * version or the complete compacted one — never a partial directory.
  *
  * By default partitions merge with `coalesce` (no shuffle — the scale
  * default: compaction should move bytes once, not twice); pass
  * `shuffle = true` to `repartition` instead when inputs are skewed
  * enough that balanced output files matter more than the extra pass.
  */
object Compaction {

  final case class CompactReport(
      filesBefore: Int, filesAfter: Int, bytes: Long, outputFiles: Int)

  private def parquetFiles(dir: String): Seq[java.nio.file.Path] = {
    val listing = Files.list(Paths.get(dir))
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.filter(_.toString.endsWith(".parquet")).toSeq
    } finally listing.close()
  }

  /** Compact `baseDir/name` in place (atomic publish). Flat datasets
    * only: a Hive-partitioned layout (`k=v/` subdirectories) would be
    * silently flattened by a whole-dataset rewrite, so it is rejected —
    * compact each partition directory individually instead. */
  def compact(spark: SparkSession, baseDir: String, name: String,
      targetBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): CompactReport = {
    val dir = s"$baseDir/$name"
    val listing = Files.list(Paths.get(dir))
    val hasPartitionDirs = try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala.exists(p =>
        Files.isDirectory(p) && p.getFileName.toString.contains("="))
    } finally listing.close()
    require(!hasPartitionDirs,
      s"$dir is Hive-partitioned; compact each partition directory, " +
        "not the dataset root (a whole-dataset rewrite drops the layout)")
    val before = parquetFiles(dir)
    val total = before.map(Files.size).sum
    val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
    val df = spark.read.parquet(dir)
    val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
    Runner.AtomicParquetSink(baseDir, s"compact-${System.nanoTime()}")
      .write(sized, name)
    val after = parquetFiles(dir)
    CompactReport(before.size, after.size, total, nOut)
  }
}
