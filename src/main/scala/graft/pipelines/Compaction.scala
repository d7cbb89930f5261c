package graft.pipelines

import org.apache.hadoop.fs.Path
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
  * All listing/sizing goes through the Hadoop `FileSystem` API ([[Fs]]);
  * note the sink's rename-based swap is for HDFS/local — on object
  * stores compact into a [[Versioned]] table instead.
  *
  * By default partitions merge with `coalesce` (no shuffle — the scale
  * default: compaction should move bytes once, not twice); pass
  * `shuffle = true` to `repartition` instead when inputs are skewed
  * enough that balanced output files matter more than the extra pass.
  */
object Compaction {

  final case class CompactReport(
      filesBefore: Int, filesAfter: Int, bytes: Long, outputFiles: Int)

  private def parquetFiles(dir: Path): Seq[org.apache.hadoop.fs.FileStatus] =
    Fs.list(dir).filter(_.getPath.getName.endsWith(".parquet"))

  /** Compact `baseDir/name` in place (atomic publish). Flat datasets
    * only: a Hive-partitioned layout (`k=v/` subdirectories) would be
    * silently flattened by a whole-dataset rewrite, so it is rejected —
    * compact each partition directory individually instead. A directory
    * with no parquet files is likewise rejected (rather than dying later
    * inside schema inference, or being mistaken for a healthy no-op).
    *
    * QUIESCED datasets only, now ENFORCED (r14): the whole
    * listing → rewrite → swap span holds the dataset's writer lease
    * (`<baseDir>/_LEASE_<name>` — the same lease
    * [[Runner.AtomicParquetSink]] takes), so a compaction racing a
    * live producer on the same path is REFUSED with
    * [[Versioned.ConcurrentWriterException]] instead of silently
    * discarding whatever the producer appended between the listing and
    * the swap (the r13 "documented but unguarded" gap). The guard is
    * only as atomic as the connector's exclusive create — see the S3A
    * caveat in [[Fs]]; and producers writing through raw
    * `df.write.parquet` rather than the sink family still bypass it. A
    * dataset with live concurrent appends belongs in [[Versioned]]
    * (whose publishes never replace directories) — compaction there is
    * a new version, not an in-place swap. */
  def compact(spark: SparkSession, baseDir: String, name: String,
      targetBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): CompactReport =
    Versioned.withLeases(Seq(new Path(s"$baseDir/_LEASE_$name"))) {
      val dir = new Path(s"$baseDir/$name")
      val hasPartitionDirs = Fs.list(dir).exists(st =>
        st.isDirectory && st.getPath.getName.contains("="))
      require(!hasPartitionDirs,
        s"$dir is Hive-partitioned; compact each partition directory, " +
          "not the dataset root (a whole-dataset rewrite drops the layout)")
      val before = parquetFiles(dir)
      require(before.nonEmpty,
        s"$dir has no parquet files to compact (missing or empty dataset)")
      val total = before.map(_.getLen).sum
      val nOut = math.max(1L, (total + targetBytes - 1) / targetBytes).toInt
      val df = spark.read.parquet(dir.toString)
      val sized = if (shuffle) df.repartition(nOut) else df.coalesce(nOut)
      Runner.AtomicParquetSink(baseDir, s"compact-${System.nanoTime()}")
        .write(sized, name)
      CompactReport(before.size, parquetFiles(dir).size, total, nOut)
    }

  /** Compact every partition of a Hive-layout dataset, one atomic
    * publish per partition directory — the loop the flat-dataset guard
    * tells users to run, packaged. Partitions compact independently
    * (each is its own [[compact]] call), so a huge table can be
    * maintained incrementally and a failure affects one partition.
    * Returns (partition dir name → report), insertion-ordered. */
  def compactPartitioned(spark: SparkSession, baseDir: String, name: String,
      targetBytes: Long = 128L * 1024 * 1024,
      shuffle: Boolean = false): Seq[(String, CompactReport)] = {
    val root = new Path(s"$baseDir/$name")
    val parts = Fs.list(root).filter(st =>
      st.isDirectory && st.getPath.getName.contains("=")).map(_.getPath.getName)
    require(parts.nonEmpty, s"$root has no partition directories")
    parts.sorted.map { p =>
      p -> compact(spark, root.toString, p, targetBytes, shuffle)
    }
  }
}
