package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.{col, lit}

/** Keyed incremental refresh without a table format — the MERGE INTO
  * core as plain relational algebra: incoming rows replace existing
  * rows with the same key (anti-join keeps the survivors, union appends
  * the new batch). One shuffle on the key; the incoming batch is
  * typically broadcast-sized so Catalyst plans the anti-join broadcast.
  * Composed with [[Versioned]] the result is an upsert with time travel:
  * each refresh publishes a new immutable version, so a bad batch rolls
  * back by republishing the previous version instead of by
  * restore-from-backup.
  *
  * [[publishUpsert]] merges against the WHOLE table — correct anywhere,
  * but at 100 TB a daily 0.1% batch would cost a full-table rewrite.
  * [[publishUpsertPartitioned]] is the scale form: it merges and rewrites
  * ONLY the partitions the incoming batch touches and links every other
  * partition's existing files unchanged into the new version's manifest
  * ([[Versioned.publishDelta]]), so refresh cost is proportional to the
  * touched data, not the table. */
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

  /** Partition-scoped upsert: merge `incoming` only against the
    * partitions (by `partCol` value) it actually contains, rewrite those,
    * and reuse every untouched partition's files by manifest link. An
    * upsert touching 1 of N partitions reads and writes O(1/N) bytes.
    * `partCol` must be one of the table's columns with non-null values;
    * the distinct touched values are collected to the driver (bounded by
    * the partition count — the same cardinality contract Hive-style
    * partitioning itself imposes). A previous flat version is migrated by
    * one full partitioned rewrite; afterwards every refresh is scoped. */
  def publishUpsertPartitioned(spark: SparkSession, baseDir: String,
      name: String, incoming: DataFrame, keys: Seq[String], partCol: String,
      keep: Int = 3): Long = {
    val prevManifest = Versioned.latestVersion(baseDir, name)
      .flatMap(v => Versioned.manifest(baseDir, name, v))
    prevManifest match {
      case None if Versioned.latestVersion(baseDir, name).isEmpty =>
        Versioned.publishPartitioned(incoming, baseDir, name, partCol, keep)
      case None => // flat predecessor: migrate layout with one full rewrite
        Versioned.publishPartitioned(
          upsert(Versioned.read(spark, baseDir, name), incoming, keys),
          baseDir, name, partCol, keep)
      case Some(m) =>
        require(m.partCol == partCol,
          s"table $name is partitioned by ${m.partCol}, not $partCol")
        val touched = incoming.select(col(partCol)).distinct()
          .collect().map(r => String.valueOf(r.get(0))).toSet
        val (touchedEntries, untouched) =
          m.entries.partition { case (value, _) => touched(value) }
        val existing = touchedEntries.map { case (value, rel) =>
          spark.read.parquet(Versioned.resolveRel(baseDir, name, rel))
            .withColumn(partCol, lit(value).cast(m.partType))
        }.reduceOption(_.unionByName(_))
        val merged = existing.map(e => upsert(e, incoming, keys))
          .getOrElse(incoming)
        Versioned.publishDelta(merged, baseDir, name, partCol, untouched, keep)
    }
  }
}
