package graft.pipelines

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col

/** Full-stack right-to-erasure — the composed GDPR path across BOTH
  * stores a served corpus actually lives in: the versioned corpus
  * TABLE and the published ANN INDEX derived from it. Erasing from one
  * without the other is the compliance bug this operator exists to
  * prevent: a row deleted from the table but still servable from the
  * index (or vice versa) is not erased.
  *
  * Legs, in order — INDEX FIRST, deliberately: the tombstone
  * transaction is O(victims) metadata and makes the victims
  * unservable within milliseconds, while the corpus rewrite is
  * O(table). Run the slow leg first and a crash between the two
  * leaves victims fully servable until someone retries; run the fast
  * leg first and the crash state is benign — victims already
  * unservable, the corpus delete retry-safe.
  *   1. index: one O(victims) tombstone transaction
  *      ([[graft.ops.AnnIndex.delete]]) — every subsequent serve
  *      anti-joins the victims out, so nothing erased is returned even
  *      before any rewrite.
  *   2. corpus: anti-join the latest version against the victim keys
  *      and publish the survivors with `keep = 1`
  *      ([[Incremental.publishDelete]]) — the publish immediately
  *      prunes every older version, so time travel to the erased rows
  *      dies with the erase (erasure semantics, not just a new head).
  *   3. optionally (`physical = true`, the default) an immediate
  *      [[graft.ops.AnnIndex.compact]] with `keep = 1`: the codes
  *      rewrite folds the tombstones in and pruning removes the
  *      pre-delete code files — the victims' derived bytes are gone
  *      from disk, not just unreachable. With `physical = false` the
  *      tombstones stand until the next scheduled compact/rebuild
  *      (cheaper; correct serving either way).
  *
  * Cost: O(table survivors) for the corpus rewrite (the table form of
  * delete cannot be cheaper without tombstoning the table too),
  * O(victims) for the index transaction, O(corpus codes) for the
  * optional physical fold — never O(corpus × anything). Returns the
  * new corpus version and the index's (table → version) map.
  * AnnIndexSpec pins the composed contract end-to-end; the registered
  * q518 audit row states it as data per round. */
object Erasure {

  def eraseEverywhere(spark: SparkSession, baseDir: String, table: String,
      keys: Seq[String], indexDir: String, victims: DataFrame,
      vecKey: String = "doc_id", physical: Boolean = true)
      : (Long, Map[String, Long]) = {
    // group-journaled families are NOT erasable through the flat path:
    // the keep=1 flat republish below would prune the versions the
    // family's group journal still references (readGroup and
    // CorpusPublisher.appendBatch would then die on the missing
    // versions, and victims in the OTHER members would survive). Fail
    // loudly toward the family-atomic path instead. Family-aware check
    // (ANY committed journal naming the table, newest-first scan) —
    // the LATEST journal alone would misclassify a family whose last
    // commit predates another family's under the same baseDir.
    val grouped = Versioned.latestGroupVersionsFor(baseDir, table).isDefined
    require(!grouped,
      s"$table is a member of a group-journaled family under $baseDir — " +
        "erase the whole family in one group transaction instead " +
        "(CorpusPublisher.erase for the corpus family), then handle the " +
        "index leg via AnnIndex.delete/compact as needed")
    val vecVictims = victims.select(col(vecKey).as("vec_id"))
    val tombstoned = graft.ops.AnnIndex.delete(vecVictims, indexDir, keep = 1)
    val corpusVersion = Incremental.publishDelete(
      spark, baseDir, table, victims, keys, keep = 1)
    val indexVersions =
      if (physical) graft.ops.AnnIndex.compact(spark, indexDir, keep = 1)
      else tombstoned
    (corpusVersion, indexVersions)
  }
}
