package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Keyed incremental refresh without a table format — the MERGE INTO
  * core as plain relational algebra: incoming rows replace existing
  * rows with the same key (anti-join keeps the survivors, union appends
  * the new batch). One shuffle on the key; the incoming batch is
  * typically broadcast-sized so Catalyst plans the anti-join broadcast.
  * Composed with [[Versioned]] the result is an upsert with time travel:
  * each refresh publishes a new immutable version, so a bad batch rolls
  * back by pointer swap instead of by restore-from-backup. */
object Incremental {

  /** Pure upsert: `incoming` wins on key collision. Schemas must match
    * by name (unionByName); output keeps `existing`'s column order (the
    * using-columns anti-join would otherwise move key columns first,
    * drifting the published schema between versions). */
  def upsert(existing: DataFrame, incoming: DataFrame,
      keys: Seq[String]): DataFrame =
    existing.join(incoming.select(keys.map(col): _*).distinct(), keys, "left_anti")
      .select(existing.columns.map(col): _*)
      .unionByName(incoming)

  /** Upsert `incoming` into the latest published version of
    * `baseDir/name` (or bootstrap from `incoming` alone) and publish the
    * result as the next version; returns the new version id. */
  def publishUpsert(spark: SparkSession, baseDir: String, name: String,
      incoming: DataFrame, keys: Seq[String], keep: Int = 3): Long = {
    val merged = Versioned.latestVersion(baseDir, name) match {
      case Some(_) => upsert(Versioned.read(spark, baseDir, name), incoming, keys)
      case None => incoming
    }
    Versioned.publish(merged, baseDir, name, keep)
  }
}
