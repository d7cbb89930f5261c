package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.TextOps
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Text-analysis surface over `documents` (north-star extensions): token
  * statistics, term frequencies, quality scoring, language ID,
  * fingerprinting. All but the fingerprint (engine-specific hash) are
  * oracle-checked.
  */
object TextQueries {

  private def docs(spark: SparkSession, dir: String) =
    Catalog.load(spark, dir, "documents")

  def tokenStats(spark: SparkSession, dir: String): DataFrame =
    TextOps.tokenStats(docs(spark, dir)).orderBy(col("doc_id"))

  private val tokenStatsSql =
    """SELECT doc_id,
      |  CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct_tokens,
      |  n_chars,
      |  CAST(length(replace(text, ' ', '')) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS avg_token_len,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS DOUBLE)
      |    / len(string_split(text, ' ')) AS lexical_diversity,
      |  CAST(len(regexp_extract_all(text, '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT)
      |    AS n_bpe_tokens
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  def termFreq(spark: SparkSession, dir: String): DataFrame =
    TextOps.termFreq(docs(spark, dir), 20)

  private val termFreqSql =
    """SELECT tok, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
      |FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      |GROUP BY tok
      |ORDER BY freq DESC, tok
      |LIMIT 20""".stripMargin

  def quality(spark: SparkSession, dir: String): DataFrame =
    TextOps.qualityScored(docs(spark, dir)).orderBy(col("doc_id"))

  private val qualitySql = {
    val stops = TextOps.stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), d AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    COUNT(*) FILTER (tok IN ($stops)) AS n_stop,
       |    COUNT(DISTINCT tok) AS n_distinct
       |  FROM t GROUP BY doc_id
       |)
       |SELECT doc_id, n_tokens, n_stop,
       |  least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
       |    + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |    + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3 AS quality
       |FROM d
       |ORDER BY doc_id""".stripMargin
  }

  def langId(spark: SparkSession, dir: String): DataFrame =
    TextOps.langId(docs(spark, dir)).orderBy(col("doc_id"))

  private val langIdSql = {
    val langs = Seq("en", "es", "de", "fr", "zh")
    def stopsOf(l: String) = TextOps.stopwords(l).map(s => s"'$s'").mkString(", ")
    val counts = langs.map(l =>
      s"COUNT(*) FILTER (tok IN (${stopsOf(l)})) AS c_$l").mkString(",\n    ")
    val best = s"greatest(${langs.map(l => s"c_$l").mkString(", ")})"
    val pred = langs.map(l => s"WHEN c_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), v AS (
       |  SELECT doc_id,
       |    $counts
       |  FROM t GROUP BY doc_id
       |)
       |SELECT doc_id, ${langs.map(l => s"c_$l").mkString(", ")},
       |  $pred AS pred_lang
       |FROM v
       |ORDER BY doc_id""".stripMargin
  }

  /** MapType surface: per-doc term-frequency MAP built with
    * map_from_entries(collect_list(struct)), then probed with size /
    * try_element_at (ANSI mode: plain element_at throws on a missing
    * key). The map is a real column in the plan; the outputs project it
    * back to scalars so DuckDB can check the values. */
  def tfMap(spark: SparkSession, dir: String): DataFrame = {
    val t = TextOps.exploded(docs(spark, dir))
    t.groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(map_from_entries(
        sort_array(collect_list(struct(col("tok"), col("c"))))).as("tf"))
      .select(col("doc_id"),
        size(col("tf")).cast("long").as("n_distinct_tokens"),
        coalesce(try_element_at(col("tf"), lit("the")), lit(0L)).as("the_count"),
        coalesce(try_element_at(col("tf"), lit("data")), lit(0L)).as("data_count"))
      .orderBy(col("doc_id"))
  }

  private val tfMapSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |)
      |SELECT doc_id,
      |  COUNT(DISTINCT tok) AS n_distinct_tokens,
      |  CAST(COUNT(*) FILTER (tok = 'the') AS BIGINT) AS the_count,
      |  CAST(COUNT(*) FILTER (tok = 'data') AS BIGINT) AS data_count
      |FROM t GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Corpus bigram frequencies (n-gram LM data prep): compiled n-gram
    * emission, one aggregate, top-20 with deterministic tie-break. */
  def bigramFreq(spark: SparkSession, dir: String): DataFrame =
    TextOps.ngrams(docs(spark, dir), 2)
      .groupBy(col("ngram").as("bigram"))
      .agg(count(lit(1)).as("freq"), countDistinct(col("doc_id")).as("doc_freq"))
      .orderBy(col("freq").desc, col("bigram"))
      .limit(20)

  private val bigramFreqSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), bg AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      |  FROM toks, unnest(range(1, len(t))) AS u(i)
      |  WHERE len(t) >= 2
      |)
      |SELECT bigram, COUNT(*) AS freq, COUNT(DISTINCT doc_id) AS doc_freq
      |FROM bg GROUP BY bigram
      |ORDER BY freq DESC, bigram
      |LIMIT 20""".stripMargin

  /** xxhash64 fingerprint — engine-specific hash, rows-only check;
    * stability is asserted in TextOpsSpec. */
  def fingerprint(spark: SparkSession, dir: String): DataFrame =
    TextOps.fingerprinted(docs(spark, dir)).orderBy(col("doc_id"))

  val all: Seq[Q] = Seq(
    Q("q50_token_stats", tokenStats, Some(tokenStatsSql),
      "per-doc token counts / lexical diversity"),
    Q("q51_term_freq", termFreq, Some(termFreqSql),
      "corpus term frequencies top-20"),
    Q("q52_quality_score", quality, Some(qualitySql),
      "document quality scoring from exact counts"),
    Q("q53_lang_id", langId, Some(langIdSql),
      "stopword-profile language identification"),
    Q("q57_map_pack", tfMap, Some(tfMapSql),
      "MapType term-frequency column probed with size/try_element_at"),
    Q("q68_bigram_freq", bigramFreq, Some(bigramFreqSql),
      "corpus bigram frequencies top-20 (n-gram LM data prep)"),
    Q("q54_fingerprint", fingerprint, None,
      "xxhash64 document fingerprint (rows-only; spec-checked)"),
    Q("q55_winnowed_fingerprints",
      (s, d) => graft.ops.DedupOps.winnowedFingerprints(docs(s, d))
        .orderBy(col("doc_id"), col("fp")), None,
      "winnowed k-gram rolling-hash fingerprints (rows-only; spec-checked)"))
}
