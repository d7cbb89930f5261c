package graft.pipelines

import java.nio.file.{Files, Paths, StandardCopyOption}
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Versioned parquet publishing — the Delta-lite upgrade of the sink
  * family (SURVEY §2.2): every publish writes a NEW immutable version
  * directory (`<name>/_v<k>/`) and then atomically swaps a one-line
  * `_LATEST` pointer file to it. Readers resolve the pointer first, so
  * they always see a complete version; concurrent publishes never touch
  * a directory a reader might be scanning (contrast AtomicParquetSink,
  * which renames over the current path). Old versions stay readable for
  * time travel / rollback until pruned past `keep`.
  *
  * On object storage the pointer swap maps to a conditional PUT and the
  * version directories to immutable prefixes — the same protocol Delta /
  * Iceberg implement with manifest files, reduced to its load-bearing
  * core. Writer concurrency contract: SINGLE writer per table (like a
  * Delta transaction owner) — concurrent publishes would race the
  * version counter; readers need no coordination at all. */
object Versioned {

  private def dir(baseDir: String, name: String) = s"$baseDir/$name"
  private def pointer(baseDir: String, name: String) =
    Paths.get(dir(baseDir, name), "_LATEST")

  /** Highest committed version, or None before the first publish. */
  def latestVersion(baseDir: String, name: String): Option[Long] = {
    val p = pointer(baseDir, name)
    if (Files.exists(p)) Some(Files.readString(p).trim.toLong) else None
  }

  /** Publish `df` as the next version; returns the new version id.
    * Versions older than the newest `keep` are pruned AFTER the pointer
    * moves (a reader that resolved the pointer before the swap may still
    * be scanning keep-1 versions back — size `keep` to exceed your
    * longest query). The next id comes from the on-disk version dirs,
    * not the pointer: a publish that crashed after writing its dir but
    * before the swap leaves an orphan, and deriving from the pointer
    * would collide with it forever (the orphan is skipped, never served,
    * and pruned once the retention window passes it). */
  def publish(df: DataFrame, baseDir: String, name: String,
      keep: Int = 3): Long = {
    require(keep >= 1, "keep must retain at least the current version")
    val base = Paths.get(dir(baseDir, name))
    Files.createDirectories(base)
    val onDisk = {
      val listing = Files.list(base)
      try {
        import scala.jdk.CollectionConverters._
        listing.iterator().asScala.map(_.getFileName.toString)
          .filter(_.startsWith("_v"))
          .map(_.stripPrefix("_v").toLong).maxOption
      } finally listing.close()
    }
    val next = math.max(onDisk.getOrElse(-1L),
      latestVersion(baseDir, name).getOrElse(-1L)) + 1L
    df.write.mode(SaveMode.ErrorIfExists).parquet(s"$base/_v$next")
    // two-step atomic pointer swap: write aside, ATOMIC_MOVE over
    val tmp = base.resolve(s"._LATEST-$next")
    Files.writeString(tmp, next.toString)
    Files.move(tmp, pointer(baseDir, name),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    // prune beyond the retention window
    val cutoff = next - keep + 1
    val listing = Files.list(base)
    try {
      import scala.jdk.CollectionConverters._
      listing.iterator().asScala
        .filter(_.getFileName.toString.startsWith("_v"))
        .filter(_.getFileName.toString.stripPrefix("_v").toLong < cutoff)
        .toSeq.foreach { old =>
          val walk = Files.walk(old)
          try walk.sorted(java.util.Comparator.reverseOrder())
            .forEach(p => Files.delete(p))
          finally walk.close()
        }
    } finally listing.close()
    next
  }

  /** Read the latest version (default) or time-travel to `version`. */
  def read(spark: SparkSession, baseDir: String, name: String,
      version: Option[Long] = None): DataFrame = {
    val v = version.orElse(latestVersion(baseDir, name)).getOrElse(
      throw new IllegalStateException(s"no published version of $name"))
    val path = Paths.get(dir(baseDir, name), s"_v$v")
    if (!Files.exists(path)) throw new IllegalStateException(
      s"version $v of $name is pruned or was never published")
    spark.read.parquet(path.toString)
  }

  /** Roll back: republish an old version's content as the NEW latest
    * (history stays linear — the bad version remains on disk for
    * forensics until pruned). */
  def rollback(spark: SparkSession, baseDir: String, name: String,
      toVersion: Long, keep: Int = 3): Long =
    publish(read(spark, baseDir, name, Some(toVersion)), baseDir, name, keep)
}
