package graft.pipelines

import graft.ops.{DedupOps, TextOps}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** End-to-end TRAINING-CORPUS publisher — the document-side sibling of
  * the ANN index family ([[graft.ops.AnnIndex]]): compose the cleaning,
  * dedup, and split machinery the ops layer already proves into one
  * atomic versioned publish a training job can actually consume.
  *
  * Stages (all existing, spec'd operators — this file only composes):
  *   1. quality gate + exact-dup keeper + near-dup cluster
  *      representative ([[DedupOps.corpusClean]], threshold
  *      `dedupThreshold`);
  *   2. leakage-safe split assignment ([[DedupOps.leakageSafeSplits]])
  *      at a LOOSER `splitThreshold`: documents too dissimilar to
  *      dedup away but similar enough to contaminate an eval set land
  *      in the SAME split — the two-threshold discipline (dedup at
  *      high similarity, contamination-guard at moderate similarity)
  *      that a single-threshold pipeline gets wrong;
  *   3. per-split budget manifest (docs, whitespace tokens, chars) —
  *      the numbers a mixture/curriculum planner reads;
  *   4. ONE [[Versioned.publishGroup]] transaction: `corpus_train` /
  *      `corpus_val` / `corpus_test` (doc_id, lang, quality,
  *      token_count, text) + `corpus_manifest` — readers snapshot all
  *      four consistently via [[Versioned.readGroup]], and a crashed
  *      publish rolls forward exactly like any other group.
  *
  * Scale: every stage is the already-audited operator (hashed-shingle
  * joins under the df cap, no all-pairs stage); the publish itself adds
  * one pass over the kept rows. Rebuilds version the whole family;
  * time travel and rollback come from [[Versioned]] for free.
  */
object CorpusPublisher {

  val TrainTable = "corpus_train"
  val ValTable = "corpus_val"
  val TestTable = "corpus_test"
  val ManifestTable = "corpus_manifest"

  /** The kept, split-assigned corpus rows (pre-publish view):
    * (doc_id, lang, quality, token_count, text, split).
    *
    * The shingle/candidate/verify machinery — the expensive stage at
    * corpus scale — runs ONCE: pairs are scored at the looser
    * `splitThreshold` and the dedup components reuse the same frame
    * filtered to `dedupThreshold` (the threshold only enters the final
    * Jaccard cut, so the filtered set is exactly what scoring at the
    * higher threshold would produce; CorpusPublisherSpec pins equality
    * with the independently-computed [[DedupOps.corpusClean]]). */
  def prepared(docs: DataFrame, qualityMin: Double = 0.38,
      dedupThreshold: Double = 0.5, splitThreshold: Double = 0.3,
      trainPct: Int = 80, valPct: Int = 10): DataFrame = {
    require(splitThreshold <= dedupThreshold,
      "the split scope must be at most as strict as the dedup cut")
    val pairsLow = DedupOps.jaccardPairsHashed(docs,
        threshold = splitThreshold)
      .localCheckpoint(false) // feeds both component solves below
    val repsHigh = DedupOps.clustersFromPairs(docs,
        pairsLow.filter(col("jaccard") >= dedupThreshold))
      .filter(col("doc_id") === col("cluster_rep")).select(col("doc_id"))
    val quality = TextOps.qualityScored(docs)
      .select(col("doc_id"), col("quality"))
    val keepers = DedupOps.exactGroups(docs)
      .select(col("keep_id").as("doc_id"))
    val kept = docs.select(col("doc_id"), col("lang"))
      .join(quality, "doc_id")
      .filter(col("quality") >= qualityMin)
      .join(repsHigh, Seq("doc_id"), "left_semi")
      .join(keepers, Seq("doc_id"), "left_semi")
    val splits = DedupOps.clustersFromPairs(docs, pairsLow)
      .withColumn("split",
        when(col("cluster_rep") % 100 < trainPct, "train")
          .when(col("cluster_rep") % 100 < trainPct + valPct, "val")
          .otherwise("test"))
      .select(col("doc_id"), col("split"))
    kept
      .join(docs.select(col("doc_id"), col("text")), "doc_id")
      .join(splits, "doc_id")
      .select(col("doc_id"), col("lang"), col("quality"),
        size(TextOps.tokens(col("text"))).cast("long").as("token_count"),
        col("text"), col("split"))
  }

  /** Publish the prepared corpus as one atomic versioned group; returns
    * (table → version). */
  def publish(docs: DataFrame, baseDir: String, qualityMin: Double = 0.38,
      dedupThreshold: Double = 0.5, splitThreshold: Double = 0.3,
      trainPct: Int = 80, valPct: Int = 10, keep: Int = 3): Map[String, Long] = {
    val prep = prepared(docs, qualityMin, dedupThreshold, splitThreshold,
        trainPct, valPct)
      .localCheckpoint(false) // three split filters + the manifest below
    val manifest = prep.groupBy(col("split"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("token_count")).cast("long").as("n_tokens"),
        sum(length(col("text")).cast("long")).cast("long").as("n_chars"))
      .orderBy(col("split"))
    def side(s: String) = prep.filter(col("split") === s).drop("split")
    Versioned.publishGroup(Seq(
      TrainTable -> side("train"),
      ValTable -> side("val"),
      TestTable -> side("test"),
      ManifestTable -> manifest), baseDir, keep)
  }
}
