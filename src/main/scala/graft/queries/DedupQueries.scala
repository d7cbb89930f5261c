package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.DedupOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Deduplication surface over `documents` (north-star extensions).
  * Exact and n-gram-Jaccard dedup are oracle-checked; MinHash-LSH and
  * SimHash use engine-specific hashing (xxhash64) so they get rows-only
  * driver checks plus DedupOpsSpec assertions (incl. LSH recall vs the
  * exact pairs).
  */
object DedupQueries {

  private def docs(spark: SparkSession, dir: String) =
    Catalog.load(spark, dir, "documents")

  def exact(spark: SparkSession, dir: String): DataFrame =
    DedupOps.exactGroups(docs(spark, dir)).orderBy(col("text_hash"))

  private val exactSql =
    """SELECT sha256(text) AS text_hash,
      |  MIN(doc_id) AS keep_id, COUNT(*) AS n_copies
      |FROM documents
      |GROUP BY 1
      |ORDER BY text_hash""".stripMargin

  def jaccard(spark: SparkSession, dir: String): DataFrame =
    DedupOps.jaccardPairs(docs(spark, dir), n = 5, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  private val jaccardSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5
      |), card AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |  CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) AS jaccard
      |FROM common
      |JOIN card x ON doc_a = x.doc_id
      |JOIN card y ON doc_b = y.doc_id
      |WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashLshPairs(docs(spark, dir), n = 5, k = 64, r = 4, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  def simhashSigs(spark: SparkSession, dir: String): DataFrame =
    DedupOps.simhash(docs(spark, dir)).orderBy(col("doc_id"))

  val all: Seq[Q] = Seq(
    Q("q60_exact_dedup", exact, Some(exactSql),
      "exact dedup groups via sha256 hash-groupBy"),
    Q("q61_jaccard_pairs", jaccard, Some(jaccardSql),
      "exact 5-gram Jaccard near-dup pairs via shingle join"),
    Q("q62_minhash_lsh", minhashLsh, None,
      "MinHash(64)+LSH(16x4) near-dup pairs, exact-verified (spec-checked)"),
    Q("q63_simhash", simhashSigs, None,
      "64-bit SimHash signatures (spec-checked)"))
}
