package graft.pipelines

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed (hash-clustered) table publishing — the co-located-join
  * layout. Writing a fact table bucketed on its join key pays the
  * shuffle ONCE at write time; every subsequent join or aggregation on
  * that key reads the buckets back shuffle-free, because Spark's scan
  * reports `HashPartitioning(bucketCol, n)` and the planner drops the
  * Exchange on both sides when the bucket specs line up. At 100 TB this
  * is the difference between re-shuffling the fact table on every
  * pipeline run and never shuffling it again — the same contract as
  * Hive bucketing / Iceberg bucket transforms.
  *
  * Files also arrive sorted within each bucket (`sortBy`), so the
  * co-located join runs as a merge without a per-task sort once the
  * scan's output ordering is usable.
  *
  * Constraints inherited from Spark's bucketing: the table must go
  * through the session catalog (`saveAsTable` — bucket metadata lives
  * there, a bare parquet path has nowhere to carry it), and both sides
  * of a shuffle-free join need the SAME bucket count (or a multiple,
  * with `spark.sql.sources.bucketing.autoBucketedScan.enabled`).
  */
object Bucketed {

  /** Publish `df` as a bucketed, per-bucket-sorted parquet table in the
    * session catalog. Overwrites any previous version of the table. */
  def publish(df: DataFrame, table: String, bucketCol: String,
      nBuckets: Int, sortCols: Seq[String] = Nil): Unit = {
    require(nBuckets > 0, s"nBuckets must be positive, got $nBuckets")
    df.write.mode(SaveMode.Overwrite).format("parquet")
      .bucketBy(nBuckets, bucketCol)
      .sortBy(bucketCol, sortCols: _*)
      .saveAsTable(table)
  }

  /** Read a bucketed table back. The scan carries the bucket
    * partitioning, so joins/aggregates on the bucket column skip their
    * Exchange. */
  def read(spark: SparkSession, table: String): DataFrame =
    spark.table(table)

  /** Shuffle-free equi-join of two tables bucketed on the same column
    * with the same bucket count. This is just `join` — the layout does
    * the work; the method exists to name the contract (and the spec
    * asserts the plan has zero shuffle exchanges). */
  def join(spark: SparkSession, left: String, right: String,
      on: Seq[String]): DataFrame =
    read(spark, left).join(read(spark, right), on)
}
