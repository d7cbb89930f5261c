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

  /** Quality-decile duplicate-rate profile — the observability query a
    * training-data pipeline runs before choosing a quality cutoff: does
    * low quality predict duplication? Composes q52's exact quality score
    * with q60's exact-hash dup flag, deciles by deterministic total-order
    * exact ntile ([[graft.ops.GlobalRank.withNtile]] — range shuffle +
    * offsets, no single-partition window over the per-doc frame), and
    * reports one mirrored-division rate per decile. The two data-sized
    * legs are the token aggregate and the 32-byte-hash count. */
  def qualityDupProfile(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = docs(spark, dir)
    val q = TextOps.qualityScored(d).select(col("doc_id"), col("quality"))
    val dupFlag = d.select(col("doc_id"), sha2(col("text"), 256).as("h"))
      .withColumn("n_copies", count(lit(1)).over(
        Window.partitionBy(col("h"))))
      .select(col("doc_id"), (col("n_copies") > 1).as("is_dup"))
    graft.ops.GlobalRank.withNtile(q.join(dupFlag, "doc_id"), 10,
        Seq(col("quality"), col("doc_id")), "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n"),
        count(when(col("is_dup"), 1)).as("n_dup"))
      .select(col("decile"), col("n"), col("n_dup"),
        (col("n_dup").cast("double") / col("n")).as("dup_rate"))
      .orderBy(col("decile"))
  }

  private val qualityDupProfileSql = {
    val stops = TextOps.stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""WITH t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), d AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    COUNT(*) FILTER (tok IN ($stops)) AS n_stop,
       |    COUNT(DISTINCT tok) AS n_distinct
       |  FROM t GROUP BY doc_id
       |), q AS (
       |  SELECT doc_id,
       |    least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
       |      + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |      + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3 AS quality
       |  FROM d
       |), f AS (
       |  SELECT doc_id,
       |    COUNT(*) OVER (PARTITION BY sha256(text)) > 1 AS is_dup
       |  FROM documents
       |), x AS (
       |  SELECT q.doc_id, q.quality, f.is_dup,
       |    CAST(NTILE(10) OVER (ORDER BY q.quality, q.doc_id) AS INT)
       |      AS decile
       |  FROM q JOIN f USING (doc_id)
       |)
       |SELECT decile, COUNT(*) AS n,
       |  CAST(COUNT(*) FILTER (is_dup) AS BIGINT) AS n_dup,
       |  CAST(COUNT(*) FILTER (is_dup) AS DOUBLE) / COUNT(*) AS dup_rate
       |FROM x
       |GROUP BY decile
       |ORDER BY decile""".stripMargin
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

  /** Language-ID confusion matrix: the dataset's `lang` label against
    * the stopword-count heuristic's prediction (q53's exact semantics),
    * rolled to (label, prediction) counts — the accuracy audit a
    * filtering pipeline runs before trusting the classifier at scale.
    * One join on doc_id (both sides doc-keyed) + one combinable
    * aggregate. */
  def langConfusion(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir).select(col("doc_id"), col("lang"))
      .join(TextOps.langId(docs(spark, dir))
        .select(col("doc_id"), col("pred_lang")), "doc_id")
      .groupBy(col("lang"), col("pred_lang"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("lang"), col("pred_lang"))

  private val langConfusionSql =
    s"""WITH pred AS (
       |$langIdSql
       |)
       |SELECT d.lang, p.pred_lang, CAST(COUNT(*) AS BIGINT) AS n
       |FROM documents d JOIN pred p USING (doc_id)
       |GROUP BY 1, 2 ORDER BY lang, pred_lang""".stripMargin

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

  def repetition(spark: SparkSession, dir: String): DataFrame =
    TextOps.repetitionStats(docs(spark, dir)).orderBy(col("doc_id"))

  private val repetitionSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), tok AS (
      |  SELECT doc_id, unnest(t) AS tok FROM toks
      |), uni AS (
      |  SELECT doc_id, MAX(c) AS max_uni, CAST(SUM(c) AS BIGINT) AS n_tokens
      |  FROM (SELECT doc_id, tok, COUNT(*) AS c FROM tok GROUP BY 1, 2)
      |  GROUP BY 1
      |), bg AS (
      |  SELECT doc_id, MAX(c) AS max_bi, CAST(SUM(c) AS BIGINT) AS n_bi
      |  FROM (SELECT doc_id, bigram, COUNT(*) AS c FROM (
      |      SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      |      FROM toks, unnest(range(1, len(t))) AS u(i) WHERE len(t) >= 2)
      |    GROUP BY 1, 2)
      |  GROUP BY 1
      |), g5 AS (
      |  SELECT doc_id, COUNT(*) AS n5, COUNT(DISTINCT g) AS d5 FROM (
      |    SELECT doc_id, array_to_string(t[i:i+4], ' ') AS g
      |    FROM toks, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5)
      |  GROUP BY 1
      |)
      |SELECT u.doc_id, u.n_tokens,
      |  CAST(u.max_uni AS DOUBLE) / u.n_tokens AS top_unigram_frac,
      |  COALESCE(CAST(b.max_bi AS DOUBLE) / b.n_bi, 0.0) AS top_bigram_frac,
      |  COALESCE(1.0 - CAST(g.d5 AS DOUBLE) / g.n5, 0.0) AS dup_5gram_frac
      |FROM uni u LEFT JOIN bg b USING (doc_id) LEFT JOIN g5 g USING (doc_id)
      |ORDER BY doc_id""".stripMargin

  def tfidf(spark: SparkSession, dir: String): DataFrame =
    TextOps.tfidfTop(docs(spark, dir), k = 3)
      .orderBy(col("doc_id"), col("term"))

  private val tfidfSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), tf AS (
      |  SELECT doc_id, tok, COUNT(*) AS tf FROM tok GROUP BY 1, 2
      |), dfreq AS (
      |  SELECT tok, COUNT(*) AS df FROM tf GROUP BY 1
      |), n AS (
      |  SELECT COUNT(*) AS n_docs FROM documents
      |), s AS (
      |  SELECT doc_id, tok AS term, tf, df,
      |    CAST(tf AS DOUBLE) * CAST(n_docs + 1 AS DOUBLE)
      |      / CAST(df + 1 AS DOUBLE) AS tfidf,
      |    ROW_NUMBER() OVER (PARTITION BY doc_id
      |      ORDER BY CAST(tf AS DOUBLE) * CAST(n_docs + 1 AS DOUBLE)
      |        / CAST(df + 1 AS DOUBLE) DESC, tok) AS rk
      |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
      |)
      |SELECT doc_id, term, tf, df, tfidf FROM s WHERE rk <= 3
      |ORDER BY doc_id, term""".stripMargin

  def scrub(spark: SparkSession, dir: String): DataFrame =
    TextOps.scrubbed(docs(spark, dir)).orderBy(col("doc_id"))

  def chunks(spark: SparkSession, dir: String): DataFrame =
    TextOps.chunked(docs(spark, dir), size = 32, overlap = 8)
      .orderBy(col("doc_id"), col("chunk_idx"))

  private val chunksSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |)
      |SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |  array_to_string(t[k * 24 + 1 : least(k * 24 + 32, len(t))], ' ')
      |    AS chunk_text,
      |  CAST(least(k * 24 + 32, len(t)) - k * 24 AS BIGINT) AS n_chunk_tokens
      |FROM toks,
      |  unnest(range(0, CAST(ceil(len(t) / 24.0) AS BIGINT))) AS u(k)
      |ORDER BY doc_id, chunk_idx""".stripMargin

  def packed(spark: SparkSession, dir: String): DataFrame =
    TextOps.packSequences(docs(spark, dir), budget = 2048)
      .orderBy(col("lang"), col("doc_id"))

  private val packedSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, lang, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
      |      - n_tokens AS BIGINT) AS before
      |  FROM t
      |)
      |SELECT doc_id, lang, n_tokens,
      |  before // 2048 AS pack_id, before % 2048 AS pack_offset
      |FROM c ORDER BY lang, doc_id""".stripMargin

  def lengthCut(spark: SparkSession, dir: String): DataFrame =
    TextOps.lengthPercentileFilter(docs(spark, dir), 0.1, 0.9)
      .orderBy(col("lang"), col("doc_id"))

  private val lengthCutSql =
    """WITH t AS (
      |  SELECT doc_id, lang,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), r AS (
      |  SELECT doc_id, lang, n_tokens,
      |    row_number() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM t
      |), b AS (
      |  SELECT lang,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.1) AS BIGINT)
      |      THEN n_tokens END) AS lo,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT)
      |      THEN n_tokens END) AS hi
      |  FROM r GROUP BY 1
      |)
      |SELECT doc_id, t.lang, n_tokens, lo, hi
      |FROM t JOIN b ON t.lang = b.lang
      |WHERE n_tokens >= lo AND n_tokens <= hi
      |ORDER BY t.lang, doc_id""".stripMargin

  def bpePairs(spark: SparkSession, dir: String): DataFrame =
    TextOps.bpePairCandidates(docs(spark, dir), topN = 20)

  private val bpePairsSql =
    """WITH w AS (
      |  SELECT tok, COUNT(*) AS wc
      |  FROM (SELECT unnest(string_split(text, ' ')) AS tok
      |        FROM documents)
      |  GROUP BY tok
      |), p AS (
      |  SELECT tok, wc, substring(tok, CAST(i AS INT), 2) AS pair
      |  FROM w, unnest(range(1, length(tok))) AS t(i)
      |  WHERE length(tok) >= 2
      |)
      |SELECT pair, CAST(SUM(wc) AS BIGINT) AS total_count,
      |  CAST(COUNT(*) AS BIGINT) AS n_positions,
      |  CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_words
      |FROM p GROUP BY pair
      |ORDER BY total_count DESC, pair LIMIT 20""".stripMargin

  /** Train 10 BPE merges on the vocab aggregate, then tokenize the
    * corpus with them (engine-side iterative training → rows-only;
    * DedupTextSpec pins the invariants incl. q188 cross-validation). */
  def bpeEncode(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    TextOps.bpeEncode(d, TextOps.bpeTrainMerges(d, 10))
      .orderBy(col("doc_id"))
  }

  def boilerplate(spark: SparkSession, dir: String): DataFrame =
    TextOps.boilerplateClean(docs(spark, dir), width = 8, minDf = 2)
      .orderBy(col("doc_id"))

  private val boilerplateSql =
    """WITH w AS (
      |  SELECT doc_id, string_split(text, ' ') AS ws FROM documents
      |), segs AS (
      |  SELECT doc_id, i AS seg_idx,
      |    array_to_string(
      |      ws[(CAST(i AS INT) * 8 + 1):(CAST(i AS INT) * 8 + 8)], ' ')
      |      AS seg
      |  FROM w, unnest(range(CAST(ceil(len(ws) / 8.0) AS BIGINT))) AS t(i)
      |), d AS (
      |  SELECT seg, COUNT(DISTINCT doc_id) AS df FROM segs GROUP BY seg
      |), f AS (
      |  SELECT s.doc_id, s.seg_idx, s.seg, d.df
      |  FROM segs s JOIN d USING (seg)
      |)
      |SELECT doc_id,
      |  CAST(COUNT(*) AS BIGINT) AS n_segs,
      |  CAST(COUNT(*) FILTER (df >= 2) AS BIGINT) AS n_boiler,
      |  COALESCE(array_to_string(
      |    list(seg ORDER BY seg_idx) FILTER (df < 2), ' '), '') AS clean_text
      |FROM f GROUP BY doc_id ORDER BY doc_id""".stripMargin

  def stratified(spark: SparkSession, dir: String): DataFrame =
    graft.ops.StatsOps.stratifiedSample(
        docs(spark, dir), col("doc_id"), col("lang"), frac = 0.2)
      .select(col("id").as("doc_id"), col("stratum").as("lang"), col("rk"))
      .orderBy(col("lang"), col("rk"))

  private val stratifiedSql =
    """WITH s AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY ((((doc_id % 1000000007) + 1000000007) % 1000000007)
      |                * 2654435761) % 1000000007, doc_id) AS BIGINT)
      |      AS rk,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM documents
      |)
      |SELECT doc_id, lang, rk FROM s WHERE rk <= ceil(n * 0.2)
      |ORDER BY lang, rk""".stripMargin

  def collocations(spark: SparkSession, dir: String): DataFrame =
    TextOps.collocations(docs(spark, dir), topN = 20, minCount = 5)

  private val collocationsSql =
    """WITH tok AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), uni AS (
      |  SELECT tok, COUNT(*) AS c_tok FROM tok GROUP BY 1
      |), n AS (
      |  SELECT CAST(SUM(c_tok) AS BIGINT) AS n_tok FROM uni
      |), toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), bg AS (
      |  SELECT t[i] || ' ' || t[i+1] AS bigram, t[i] AS w1, t[i+1] AS w2,
      |    COUNT(*) AS c_bg
      |  FROM toks, unnest(range(1, len(t))) AS u(i)
      |  WHERE len(t) >= 2
      |  GROUP BY 1, 2, 3
      |  HAVING COUNT(*) >= 5
      |)
      |SELECT bigram, c_bg, u1.c_tok AS c_w1, u2.c_tok AS c_w2,
      |  CAST(c_bg AS DOUBLE) * n_tok / u1.c_tok / u2.c_tok AS lift
      |FROM bg
      |JOIN uni u1 ON bg.w1 = u1.tok
      |JOIN uni u2 ON bg.w2 = u2.tok
      |CROSS JOIN n
      |ORDER BY lift DESC, bigram
      |LIMIT 20""".stripMargin

  private val scrubSql =
    """SELECT doc_id,
      |  regexp_replace(regexp_replace(regexp_replace(text,
      |    'https?://[^ ]+', '<URL>', 'g'),
      |    '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}', '<EMAIL>', 'g'),
      |    '[0-9]{9,}', '<NUM>', 'g') AS clean_text,
      |  regexp_matches(text, '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}')
      |    AS has_email,
      |  regexp_matches(text, 'https?://[^ ]+') AS has_url,
      |  regexp_matches(text, '[0-9]{9,}') AS has_long_number
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Training-mix composer: apportion a 100-doc budget across sources
    * proportionally to an integer weight (here derived from the source
    * name: srcN → weight N+1) with largest-remainder rounding, then
    * draw each source's quota by deterministic hash rank. */
  def mixture(spark: SparkSession, dir: String): DataFrame =
    graft.ops.StatsOps.mixtureSample(
        docs(spark, dir), col("doc_id"), col("source"),
        expr("CAST(substring(source, 4, 10) AS BIGINT) + 1"), budget = 100L)
      .select(col("id").as("doc_id"), col("stratum").as("source"),
        col("quota"), col("rk"))
      .orderBy(col("source"), col("rk"))

  private val mixtureSql =
    """WITH s AS (
      |  SELECT source, CAST(substr(source, 4) AS BIGINT) + 1 AS w
      |  FROM documents GROUP BY 1
      |), q1 AS (
      |  SELECT source, w, SUM(w) OVER () AS tot FROM s
      |), q2 AS (
      |  SELECT source, (100 * w) // tot AS base, (100 * w) % tot AS rem
      |  FROM q1
      |), q3 AS (
      |  SELECT source, base, 100 - SUM(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, source) AS rk
      |  FROM q2
      |), quotas AS (
      |  SELECT source,
      |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |      AS quota
      |  FROM q3
      |), ranked AS (
      |  SELECT doc_id, source,
      |    CAST(row_number() OVER (PARTITION BY source
      |      ORDER BY ((((doc_id % 1000000007) + 1000000007) % 1000000007)
      |                * 2654435761) % 1000000007, doc_id) AS BIGINT) AS rk
      |  FROM documents
      |)
      |SELECT doc_id, r.source, quota, rk
      |FROM ranked r JOIN quotas USING (source)
      |WHERE rk <= quota
      |ORDER BY r.source, rk""".stripMargin

  /** Temperature-rebalanced training mix (α = 0.5): stratum weight is
    * floor(sqrt(n_lang)·10⁶) instead of n_lang, upweighting rare
    * languages the way multilingual pre-training mixes do, then the same
    * largest-remainder quota + deterministic hash draw as q120. sqrt and
    * the 10⁶ scale are correctly-rounded IEEE ops on integers, so the
    * integer weights — and therefore the whole draw — are bit-identical
    * across engines. */
  def temperatureMix(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(col("lang").isNotNull)
    val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n_lang"))
    val weighted = d.join(broadcast(counts), "lang")
      .withColumn("w",
        floor(sqrt(col("n_lang").cast("double")) * 1e6).cast("long"))
    graft.ops.StatsOps.mixtureSample(
        weighted, col("doc_id"), col("lang"), col("w"), budget = 200L)
      .select(col("id").as("doc_id"), col("stratum").as("lang"),
        col("quota"), col("rk"))
      .orderBy(col("lang"), col("rk"))
  }

  private val temperatureMixSql =
    """WITH s AS (
      |  SELECT lang,
      |    CAST(floor(sqrt(CAST(COUNT(*) AS DOUBLE)) * 1e6) AS BIGINT) AS w
      |  FROM documents WHERE lang IS NOT NULL GROUP BY 1
      |), q1 AS (
      |  SELECT lang, w, SUM(w) OVER () AS tot FROM s
      |), q2 AS (
      |  SELECT lang, (200 * w) // tot AS base, (200 * w) % tot AS rem
      |  FROM q1
      |), q3 AS (
      |  SELECT lang, base, 200 - SUM(base) OVER () AS leftover,
      |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
      |  FROM q2
      |), quotas AS (
      |  SELECT lang,
      |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
      |      AS quota
      |  FROM q3
      |), ranked AS (
      |  SELECT doc_id, lang,
      |    CAST(row_number() OVER (PARTITION BY lang
      |      ORDER BY ((((doc_id % 1000000007) + 1000000007) % 1000000007)
      |                * 2654435761) % 1000000007, doc_id) AS BIGINT) AS rk
      |  FROM documents WHERE lang IS NOT NULL
      |)
      |SELECT doc_id, r.lang, quota, rk
      |FROM ranked r JOIN quotas USING (lang)
      |WHERE rk <= quota
      |ORDER BY r.lang, rk""".stripMargin

  /** Sample-based approximate aggregation with its own error audit: the
    * per-language char-count sum estimated from q109's deterministic
    * 20% stratified sample, scaled by n/n_samp, next to the exact sum
    * and the relative error. At 100 TB this is the pattern that reads a
    * fifth of the data for a dashboard: the sample draw is the hash
    * rank (engine-independent), the integer sums are exact, and the
    * only doubles are the final scale-up and error columns — identical
    * formula strings on both engines. */
  def sampleAgg(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(col("lang").isNotNull)
    val exact = d.groupBy(col("lang")).agg(count(lit(1)).as("n"),
      sum(col("n_chars")).as("exact_sum"))
    val samp = graft.ops.StatsOps
      .stratifiedSample(d, col("doc_id"), col("lang"), frac = 0.2)
      .select(col("id").as("doc_id"))
      .join(d.select(col("doc_id"), col("lang"), col("n_chars")), "doc_id")
      .groupBy(col("lang")).agg(count(lit(1)).as("n_samp"),
        sum(col("n_chars")).as("samp_sum"))
    val est = col("samp_sum").cast("double") *
      (col("n").cast("double") / col("n_samp").cast("double"))
    exact.join(samp, "lang")
      .select(col("lang"), col("n"), col("n_samp"), col("exact_sum"),
        est.as("est_sum"),
        (abs(est - col("exact_sum").cast("double"))
          / col("exact_sum").cast("double") * 100.0).as("rel_err_pct"))
      .orderBy(col("lang"))
  }

  private val sampleAggSql =
    """WITH d AS (
      |  SELECT doc_id, lang, n_chars FROM documents WHERE lang IS NOT NULL
      |), ranked AS (
      |  SELECT doc_id, lang, n_chars,
      |    row_number() OVER (PARTITION BY lang
      |      ORDER BY ((((doc_id % 1000000007) + 1000000007) % 1000000007)
      |                * 2654435761) % 1000000007, doc_id) AS rk,
      |    COUNT(*) OVER (PARTITION BY lang) AS n
      |  FROM d
      |), s AS (
      |  SELECT lang, COUNT(*) AS n_samp, SUM(n_chars) AS samp_sum
      |  FROM ranked WHERE rk <= ceil(n * 0.2) GROUP BY 1
      |), e AS (
      |  SELECT lang, COUNT(*) AS n, SUM(n_chars) AS exact_sum FROM d
      |  GROUP BY 1
      |)
      |SELECT lang, CAST(n AS BIGINT) AS n, CAST(n_samp AS BIGINT) AS n_samp,
      |  CAST(exact_sum AS BIGINT) AS exact_sum,
      |  CAST(samp_sum AS DOUBLE)
      |    * (CAST(n AS DOUBLE) / CAST(n_samp AS DOUBLE)) AS est_sum,
      |  abs(CAST(samp_sum AS DOUBLE)
      |      * (CAST(n AS DOUBLE) / CAST(n_samp AS DOUBLE))
      |      - CAST(exact_sum AS DOUBLE))
      |    / CAST(exact_sum AS DOUBLE) * 100.0 AS rel_err_pct
      |FROM e JOIN s USING (lang)
      |ORDER BY lang""".stripMargin

  /** Bigram LM-proxy quality: per doc, how "corpus-typical" its bigrams
    * are — total corpus hits of its bigrams plus its hapax count
    * (bigrams occurring exactly once corpus-wide). The count join is the
    * exact form; at 100 TB the bigram table df-caps like the dedup
    * postings (hot bigrams carry no signal for hapax detection). */
  def lmScore(spark: SparkSession, dir: String): DataFrame = {
    val bg = TextOps.ngrams(docs(spark, dir), 2)
    val cnt = bg.groupBy(col("ngram")).agg(count(lit(1)).as("c"))
    bg.join(cnt, "ngram")
      .groupBy(col("doc_id")).agg(
        count(lit(1)).as("n_bigrams"),
        sum(col("c")).as("corpus_hits"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"))
      .orderBy(col("doc_id"))
  }

  private val lmScoreSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), bg AS (
      |  SELECT doc_id, t[i] || ' ' || t[i+1] AS bigram
      |  FROM toks, unnest(range(1, len(t))) AS u(i)
      |  WHERE len(t) >= 2
      |), c AS (
      |  SELECT bigram, COUNT(*) AS c FROM bg GROUP BY 1
      |)
      |SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_bigrams,
      |  CAST(SUM(c.c) AS BIGINT) AS corpus_hits,
      |  CAST(SUM(CASE WHEN c.c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax
      |FROM bg JOIN c USING (bigram)
      |GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Token-budget corpus selection: per source, admit documents
    * longest-first until a 1000-token budget fills — the greedy knapsack
    * every pretraining data pipeline runs per source/epoch. One running-
    * sum window per source key; no global order, no driver round-trip. */
  def tokenBudget(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col("source"))
      .orderBy(col("n_tokens").desc, col("doc_id"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs(spark, dir)
      .select(col("doc_id"), col("source"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
      .withColumn("cum_tokens", sum(col("n_tokens")).over(w))
      .filter(col("cum_tokens") <= 1000)
      .select(col("doc_id"), col("source"), col("n_tokens"),
        col("cum_tokens"))
      .orderBy(col("source"), col("cum_tokens"))
  }

  private val tokenBudgetSql =
    """WITH d AS (
      |  SELECT doc_id, source,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
      |  FROM documents
      |), c AS (
      |  SELECT doc_id, source, n_tokens,
      |    CAST(SUM(n_tokens) OVER (PARTITION BY source
      |      ORDER BY n_tokens DESC, doc_id
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM d
      |)
      |SELECT doc_id, source, n_tokens, cum_tokens
      |FROM c WHERE cum_tokens <= 1000
      |ORDER BY source, cum_tokens""".stripMargin

  /** BM25 retrieval scoring (k1 = 1.2, b = 0.75) for a fixed query-term
    * set, top-10 docs per term. The idf keeps Robertson's rational form
    * `(N − df + 0.5) / (df + 0.5)` WITHOUT the log — log is monotone, so
    * ranks are identical, and rational arithmetic over exact counts is
    * engine-identical where ln() is not (same trick as q98's tf-idf).
    * Corpus stats (N, Σdl) are a 1-row broadcast; df is a 3-row
    * broadcast — the only data-sized shuffle is the per-doc tf
    * aggregate. */
  def bm25(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val terms = Seq("join", "vector", "scan")
    val d = docs(spark, dir)
      .select(col("doc_id"), TextOps.tokens(col("text")).as("toks"))
      .withColumn("dl", size(col("toks")).cast("long"))
      .filter(col("dl") > 0)
    val corpus = d.agg(count(lit(1)).as("n_docs"), sum(col("dl")).as("sum_dl"))
    val tf = d.select(col("doc_id"), col("dl"), explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy(col("doc_id"), col("dl"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val dfreq = tf.groupBy(col("term")).agg(count(lit(1)).as("df"))
    val nD = col("n_docs").cast("double")
    val scored = tf.join(broadcast(dfreq), Seq("term"))
      .crossJoin(broadcast(corpus))
      .withColumn("idf",
        (nD - col("df").cast("double") + lit(0.5)) /
          (col("df").cast("double") + lit(0.5)))
      .withColumn("score",
        (col("idf") * (col("tf").cast("double") * lit(2.2))) /
          (col("tf").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") /
                (col("sum_dl").cast("double") / nD)))))
    val w = Window.partitionBy(col("term"))
      .orderBy(col("score").desc, col("doc_id"))
    scored.withColumn("rk", row_number().over(w).cast("long"))
      .filter(col("rk") <= 10)
      .select(col("term"), col("rk"), col("doc_id"), col("tf"), col("dl"),
        col("score"))
      .orderBy(col("term"), col("rk"))
  }

  private val bm25Sql =
    """WITH d AS (
      |  SELECT doc_id, string_split(text, ' ') AS toks,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl
      |  FROM documents WHERE text IS NOT NULL
      |), corpus AS (
      |  SELECT CAST(COUNT(*) AS DOUBLE) AS n_docs,
      |    CAST(SUM(dl) AS DOUBLE) AS sum_dl
      |  FROM d
      |), tf AS (
      |  SELECT doc_id, dl, term, CAST(COUNT(*) AS BIGINT) AS tf
      |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM d)
      |  WHERE term IN ('join', 'vector', 'scan')
      |  GROUP BY 1, 2, 3
      |), dfreq AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df FROM tf GROUP BY 1
      |), s AS (
      |  SELECT tf.term, tf.doc_id, tf.tf, tf.dl,
      |    (n_docs - CAST(df AS DOUBLE) + 0.5)
      |      / (CAST(df AS DOUBLE) + 0.5) AS idf
      |  FROM tf JOIN dfreq USING (term) CROSS JOIN corpus
      |), sc AS (
      |  SELECT term, doc_id, tf, dl,
      |    (idf * (CAST(tf AS DOUBLE) * 2.2)) /
      |      (CAST(tf AS DOUBLE) + 1.2 * (0.25 + 0.75 *
      |        (CAST(dl AS DOUBLE) /
      |          ((SELECT sum_dl FROM corpus) / (SELECT n_docs FROM corpus)))))
      |      AS score
      |  FROM s
      |)
      |SELECT term,
      |  CAST(row_number() OVER (PARTITION BY term
      |    ORDER BY score DESC, doc_id) AS BIGINT) AS rk,
      |  doc_id, tf, dl, score
      |FROM sc
      |QUALIFY rk <= 10
      |ORDER BY term, rk""".stripMargin

  def compression(spark: SparkSession, dir: String): DataFrame =
    TextOps.compressionRatio(docs(spark, dir)).orderBy(col("doc_id"))

  /** Inverted index (search-engine posting lists): term → document
    * frequency + the ordered CSV postings list, for mid-frequency terms
    * (5 ≤ df ≤ 50 — high-df postings belong in a different layout and
    * low-df terms are noise). WITHIN GROUP ordering makes the list
    * deterministic; the build is one explode + distinct + one aggregate,
    * everything keyed on the term, nothing driver-side. */
  def invertedIndex(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .filter(col("text").isNotNull && col("doc_id").isNotNull)
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .distinct()
      .groupBy(col("tok"))
      .agg(count(lit(1)).as("df"),
        expr("listagg(CAST(doc_id AS STRING), ',') WITHIN GROUP (ORDER BY doc_id)")
          .as("postings"))
      .filter(col("df").between(5, 50))
      .orderBy(col("tok"))

  private val invertedIndexSql =
    """WITH t AS (
      |  SELECT DISTINCT doc_id, unnest(string_split(text, ' ')) AS tok
      |  FROM documents WHERE text IS NOT NULL AND doc_id IS NOT NULL
      |)
      |SELECT tok, COUNT(*) AS df,
      |  string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id) AS postings
      |FROM t
      |GROUP BY tok
      |HAVING COUNT(*) BETWEEN 5 AND 50
      |ORDER BY tok""".stripMargin

  /** Deterministic weighted Bernoulli sample: P(keep) = n_chars ∕
    * max(n_chars) — longer documents proportionally more likely, the
    * hash draw replayable on any engine (pure integer arithmetic, the
    * q109 multiplicative-hash family). The corpus max rides a broadcast
    * 1-row join; the draw-vs-threshold compare is cross-multiplied so no
    * division ever happens. */
  def weightedSample(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    val d = docs(spark, dir)
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull)
    val mx = d.agg(max(col("n_chars")).as("mx"))
    d.crossJoin(broadcast(mx))
      .withColumn("draw",
        pmod(pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p)),
          lit(1000000L)))
      .filter(col("draw") * col("mx") < col("n_chars") * lit(1000000L))
      .select(col("doc_id"), col("lang"), col("source"), col("n_chars"))
      .orderBy(col("doc_id"))
  }

  private val weightedSampleSql =
    """WITH m AS (
      |  SELECT MAX(n_chars) AS mx FROM documents
      |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
      |)
      |SELECT doc_id, lang, source, n_chars
      |FROM documents, m
      |WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL
      |  AND ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000 * mx
      |      < n_chars * 1000000
      |ORDER BY doc_id""".stripMargin

  /** Fixed-size weighted sample: the top-10 docs per language by a
    * deterministic weighted priority — the bounded-output counterpart of
    * q150's Bernoulli sampler (which draws a RATE, not a size). Priority
    * is the exponential-race analog done in exact integers: a uniform
    * hash draw FLOOR-DIVIDED by the weight, `(draw * 10^6) div n_chars`,
    * so heavier docs get systematically smaller keys — no log/pow, no
    * float compare, bit-identical ranking on every engine. The per-group
    * top-k runs as one window exchange with Spark's partial
    * WindowGroupLimit doing per-partition pruning before the shuffle
    * (same plan family as q35; the scale path for "sample k per stratum
    * from 100 TB"). */
  def weightedTopK(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = 1000000007L
    docs(spark, dir)
      .filter(col("doc_id").isNotNull && col("n_chars").isNotNull &&
        col("n_chars") > 0)
      .withColumn("draw",
        pmod(pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p)),
          lit(1000000L)))
      .withColumn("prio", expr("(draw * 1000000L) div n_chars"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("lang")).orderBy(col("prio"), col("doc_id"))))
      .filter(col("rn") <= 10)
      .select(col("lang"), col("rn"), col("doc_id"), col("n_chars"),
        col("prio"))
      .orderBy(col("lang"), col("rn"))
  }

  private val weightedTopKSql =
    """WITH d AS (
      |  SELECT lang, doc_id, n_chars,
      |    ((doc_id % 1000000007) * 2654435761) % 1000000007 % 1000000
      |      AS draw
      |  FROM documents
      |  WHERE doc_id IS NOT NULL AND n_chars IS NOT NULL AND n_chars > 0
      |), r AS (
      |  SELECT lang, doc_id, n_chars,
      |    (draw * 1000000) // n_chars AS prio,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY lang
      |      ORDER BY (draw * 1000000) // n_chars, doc_id) AS INT) AS rn
      |  FROM d
      |)
      |SELECT lang, rn, doc_id, n_chars, prio
      |FROM r WHERE rn <= 10
      |ORDER BY lang, rn""".stripMargin

  /** Deterministic k-fold cross-validation assignment (k = 5): fold =
    * multiplicative hash of doc_id mod 5, reported as the fold × lang
    * census (docs, chars, distinct sources) that validates the split is
    * balanced. Pure integer hashing → the same folds on every engine and
    * every run; one aggregate, no sampling state. */
  def kfold(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    docs(spark, dir)
      .filter(col("doc_id").isNotNull)
      .withColumn("fold",
        pmod(pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p)),
          lit(5L)))
      .groupBy(col("fold"), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("sum_chars"),
        countDistinct(col("source")).as("n_sources"))
      .orderBy(col("fold"), col("lang"))
  }

  private val kfoldSql =
    """SELECT ((doc_id % 1000000007) * 2654435761) % 1000000007 % 5 AS fold,
      |  lang, COUNT(*) AS n_docs,
      |  CAST(SUM(n_chars) AS BIGINT) AS sum_chars,
      |  CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
      |FROM documents WHERE doc_id IS NOT NULL
      |GROUP BY 1, 2
      |ORDER BY fold, lang""".stripMargin

  /** Count-min sketch frequency audit — see StatsOps.cmsFreqAudit.
    * Sketch-internal (no SQL oracle, like q106's HLL); SketchSpec pins
    * the overestimate guarantee and the error bound, AnalyticsSpec the
    * matrix's layout independence. */
  def cmsFreq(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.StatsOps.cmsFreqAudit(
      TextOps.exploded(Catalog.load(spark, dir, "documents"))
        .select(col("tok")).as[String])
  }

  /** Two-pass Misra–Gries heavy hitters — see StatsOps.heavyHittersAudit.
    * Candidate SET depends on merge layout (sketch-internal → no SQL
    * oracle); SketchSpec pins the no-miss and error-bound guarantees. */
  def heavyHitters(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    graft.ops.StatsOps.heavyHittersAudit(
      TextOps.exploded(Catalog.load(spark, dir, "documents"))
        .select(col("tok")).as[String])
  }

  /** C4/FineWeb-style filter-rule attrition dashboard: for each cleaning
    * rule, how many documents it removes and how many it ALONE removes
    * (unique attrition — the number you lose by keeping the rule, the
    * number that tells you which rule to tune first). Every ratio
    * threshold is a cross-multiplied integer compare (dr < 8/25 ⇔
    * 25·nd < 8·wc), so there is no float rounding to disagree on.
    * One map pass + a 5-row aggregate — nothing shuffles but the flags. */
  def filterAttrition(spark: SparkSession, dir: String): DataFrame = {
    val wc = size(split(col("text"), " "))
    val nd = size(array_distinct(split(col("text"), " ")))
    val wchars = col("n_chars") - wc + 1 // chars excluding separators
    val flags = docs(spark, dir).select(
      (wc < 20).cast("int").as("f_too_short"),
      (wc > 88).cast("int").as("f_too_long"),
      (wchars * 100 < wc * 417 || wchars * 100 > wc * 485)
        .cast("int").as("f_word_len"),
      (nd * 25 < wc * 8).cast("int").as("f_repetitive"),
      (!col("lang").isin("en", "es")).cast("int").as("f_lang"))
    val rules = Seq("too_short", "too_long", "word_len", "repetitive",
      "lang")
    val nf = rules.map(r => col(s"f_$r")).reduce(_ + _)
    flags.withColumn("nf", nf)
      .select(explode(array(rules.map(r => struct(
        lit(r).as("rule"), col(s"f_$r").as("fail"),
        (col(s"f_$r") === 1 && col("nf") === 1).cast("int").as("uniq")))
        : _*)).as("x"))
      .groupBy(col("x.rule").as("rule"))
      .agg(sum(col("x.fail")).as("n_fail"),
        sum(col("x.uniq")).as("n_unique"))
      .orderBy(col("rule"))
  }

  private val filterAttritionSql =
    """WITH f AS (
      |  SELECT
      |    CASE WHEN len(string_split(text, ' ')) < 20
      |      THEN 1 ELSE 0 END AS f_too_short,
      |    CASE WHEN len(string_split(text, ' ')) > 88
      |      THEN 1 ELSE 0 END AS f_too_long,
      |    CASE WHEN (n_chars - len(string_split(text, ' ')) + 1) * 100
      |        < len(string_split(text, ' ')) * 417
      |      OR (n_chars - len(string_split(text, ' ')) + 1) * 100
      |        > len(string_split(text, ' ')) * 485
      |      THEN 1 ELSE 0 END AS f_word_len,
      |    CASE WHEN len(list_distinct(string_split(text, ' '))) * 25
      |        < len(string_split(text, ' ')) * 8
      |      THEN 1 ELSE 0 END AS f_repetitive,
      |    CASE WHEN lang NOT IN ('en', 'es') THEN 1 ELSE 0 END AS f_lang
      |  FROM documents
      |), n AS (
      |  SELECT f.*, f_too_short + f_too_long + f_word_len + f_repetitive
      |    + f_lang AS nf FROM f
      |)
      |SELECT rule, CAST(SUM(fail) AS BIGINT) AS n_fail,
      |  CAST(SUM(CASE WHEN fail = 1 AND nf = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_unique
      |FROM (
      |  SELECT 'too_short' AS rule, f_too_short AS fail, nf FROM n
      |  UNION ALL SELECT 'too_long', f_too_long, nf FROM n
      |  UNION ALL SELECT 'word_len', f_word_len, nf FROM n
      |  UNION ALL SELECT 'repetitive', f_repetitive, nf FROM n
      |  UNION ALL SELECT 'lang', f_lang, nf FROM n
      |)
      |GROUP BY rule
      |ORDER BY rule""".stripMargin

  /** One-row dataset card — the corpus summary published next to a
    * training set: sizes, language mix, exact-duplicate rate, token
    * volume. Every number is a count or a mirrored IEEE division over
    * counts; the dup rate reuses the sha256 exact-dedup contract (one
    * extra 32-byte-key aggregate). The whole card is two scans of
    * `documents` and aggregates all the way down. */
  def datasetCard(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val wc = size(split(col("text"), " "))
    val base = d.agg(
      count(lit(1)).as("n_docs"),
      countDistinct(col("source")).as("n_sources"),
      countDistinct(col("lang")).as("n_langs"),
      sum(wc.cast("long")).as("total_tokens"),
      sum(when(col("lang") === "en", 1L).otherwise(0L)).as("n_en"))
    val dups = d.groupBy(sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("c"))
      .agg(coalesce(sum(col("c") - 1), lit(0L)).as("n_dup_docs"))
    base.crossJoin(dups).select(
      col("n_docs"), col("n_sources"), col("n_langs"),
      col("total_tokens"),
      (col("total_tokens").cast("double") / col("n_docs").cast("double"))
        .as("avg_tokens"),
      (col("n_en").cast("double") / col("n_docs").cast("double"))
        .as("pct_en"),
      (col("n_dup_docs").cast("double") / col("n_docs").cast("double"))
        .as("dup_rate"))
  }

  private val datasetCardSql =
    """WITH base AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources,
      |    CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |    CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |      AS total_tokens,
      |    CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_en
      |  FROM documents
      |), dups AS (
      |  SELECT CAST(COALESCE(SUM(c - 1), 0) AS BIGINT) AS n_dup_docs
      |  FROM (SELECT COUNT(*) AS c FROM documents GROUP BY sha256(text))
      |)
      |SELECT n_docs, n_sources, n_langs, total_tokens,
      |  CAST(total_tokens AS DOUBLE) / CAST(n_docs AS DOUBLE)
      |    AS avg_tokens,
      |  CAST(n_en AS DOUBLE) / CAST(n_docs AS DOUBLE) AS pct_en,
      |  CAST(n_dup_docs AS DOUBLE) / CAST(n_docs AS DOUBLE) AS dup_rate
      |FROM base, dups""".stripMargin

  /** Snorkel-style weak-supervision label model (majority vote): three
    * deterministic labeling functions each emit +1 / −1 / 0-abstain on
    * "is this a high-quality doc" — length, lexical diversity (as the
    * cross-multiplied integer compares q208 uses), language — and the
    * vote is the sign of the non-abstain sum, with a conflict flag when
    * both polarities fired. The aggregate-free map pass scales to any
    * corpus; downstream, `label` is the training signal and `conflict`
    * the disagreement-audit slice. */
  def labelModel(spark: SparkSession, dir: String): DataFrame = {
    val wc = size(split(col("text"), " "))
    val nd = size(array_distinct(split(col("text"), " ")))
    val lf1 = when(wc >= 40, 1).when(wc < 20, -1).otherwise(0)
    val lf2 = when(nd * 20 >= wc * 9, 1).when(nd * 25 < wc * 8, -1)
      .otherwise(0)
    val lf3 = when(col("lang").isin("en", "es"), 1)
      .when(col("lang") === "zh", -1).otherwise(0)
    docs(spark, dir)
      .select(col("doc_id"), lf1.as("lf_length"), lf2.as("lf_diversity"),
        lf3.as("lf_lang"))
      .withColumn("vote_sum",
        col("lf_length") + col("lf_diversity") + col("lf_lang"))
      .withColumn("label",
        when(col("vote_sum") > 0, 1).when(col("vote_sum") < 0, -1)
          .otherwise(0))
      .withColumn("conflict",
        (greatest(col("lf_length"), col("lf_diversity"), col("lf_lang"))
          === 1 &&
          least(col("lf_length"), col("lf_diversity"), col("lf_lang"))
            === -1).cast("int"))
      .orderBy(col("doc_id"))
  }

  private val labelModelSql =
    """WITH f AS (
      |  SELECT doc_id,
      |    CASE WHEN len(string_split(text, ' ')) >= 40 THEN 1
      |      WHEN len(string_split(text, ' ')) < 20 THEN -1
      |      ELSE 0 END AS lf_length,
      |    CASE WHEN len(list_distinct(string_split(text, ' '))) * 20
      |        >= len(string_split(text, ' ')) * 9 THEN 1
      |      WHEN len(list_distinct(string_split(text, ' '))) * 25
      |        < len(string_split(text, ' ')) * 8 THEN -1
      |      ELSE 0 END AS lf_diversity,
      |    CASE WHEN lang IN ('en', 'es') THEN 1
      |      WHEN lang = 'zh' THEN -1 ELSE 0 END AS lf_lang
      |  FROM documents
      |)
      |SELECT doc_id, lf_length, lf_diversity, lf_lang,
      |  lf_length + lf_diversity + lf_lang AS vote_sum,
      |  CASE WHEN lf_length + lf_diversity + lf_lang > 0 THEN 1
      |    WHEN lf_length + lf_diversity + lf_lang < 0 THEN -1
      |    ELSE 0 END AS label,
      |  CASE WHEN greatest(lf_length, lf_diversity, lf_lang) = 1
      |    AND least(lf_length, lf_diversity, lf_lang) = -1
      |    THEN 1 ELSE 0 END AS conflict
      |FROM f ORDER BY doc_id""".stripMargin

  /** Total-variation drift between the token distributions of two
    * corpus halves (even- vs odd-numbered sources — "yesterday's crawl
    * vs today's"): TV = ½·Σ_tok |p₁ − p₀|, kept EXACT as the integer
    * Σ|c₁·N₀ − c₀·N₁| over 2·N₁·N₀ with one final division — unlike
    * KL/JS there is no log, so the statistic is engine-exact and
    * order-independent. One token explode + one groupBy + a broadcast
    * 1-row totals join; at 100 TB the groupBy is the only shuffle and
    * carries (token, 2 counts). */
  def tvDrift(spark: SparkSession, dir: String): DataFrame = {
    val toks = docs(spark, dir)
      .select((substring(col("source"), 4, 10).cast("long") % 2).as("g"),
        explode(split(col("text"), " ")).as("tok"))
    val per = toks.groupBy(col("tok"))
      .agg(sum(col("g")).as("c1"), sum(lit(1L) - col("g")).as("c0"))
      .localCheckpoint(false) // feeds the totals agg AND the final agg
    val tot = per.agg(sum(col("c1")).as("n1"), sum(col("c0")).as("n0"))
    per.crossJoin(tot)
      .groupBy(col("n1"), col("n0"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(abs(col("c1") * col("n0") - col("c0") * col("n1")))
          .as("tv_num"))
      .select(col("n1"), col("n0"), col("n_tokens"), col("tv_num"),
        (col("tv_num").cast("double") /
          (lit(2.0) * col("n1").cast("double") * col("n0").cast("double")))
          .as("tv_dist"))
  }

  private val tvDriftSql =
    """WITH t AS (
      |  SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS g,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), per AS (
      |  SELECT tok, CAST(SUM(g) AS BIGINT) AS c1,
      |    CAST(SUM(1 - g) AS BIGINT) AS c0
      |  FROM t GROUP BY tok
      |), tot AS (
      |  SELECT CAST(SUM(c1) AS BIGINT) AS n1,
      |    CAST(SUM(c0) AS BIGINT) AS n0
      |  FROM per
      |)
      |SELECT n1, n0, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(abs(c1 * n0 - c0 * n1)) AS BIGINT) AS tv_num,
      |  CAST(SUM(abs(c1 * n0 - c0 * n1)) AS DOUBLE)
      |    / (2.0 * CAST(n1 AS DOUBLE) * CAST(n0 AS DOUBLE)) AS tv_dist
      |FROM per, tot
      |GROUP BY n1, n0""".stripMargin

  /** Top-k vocabulary churn between the two corpus halves (q229's
    * split): overlap@k and Jaccard@k of the top-k token lists for
    * k ∈ {10, 25, 50}. Ranking is the deterministic total order
    * (count DESC, token ASC), so the lists — and the exact integer
    * intersection sizes — are engine-identical; only the two final
    * ratios are doubles. The window ranks only the per-token count
    * table (vocabulary-sized, not corpus-sized); the half-vs-half
    * match on token is an equi-join of two ≤k-row lists. */
  def rankOverlap(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val kMax = 50
    val ranked = docs(spark, dir)
      .select((substring(col("source"), 4, 10).cast("long") % 2).as("g"),
        explode(split(col("text"), " ")).as("tok"))
      .groupBy(col("g"), col("tok")).agg(count(lit(1)).as("cnt"))
      .withColumn("d", row_number().over(
        Window.partitionBy(col("g"))
          .orderBy(col("cnt").desc, col("tok"))).cast("long"))
      .filter(col("d") <= kMax)
      .localCheckpoint(false) // both halves of the tok equi-join
    val joined = ranked.filter(col("g") === 1)
      .select(col("tok"), col("d").as("da"))
      .join(ranked.filter(col("g") === 0)
        .select(col("tok"), col("d").as("db")), "tok")
    joined
      .crossJoin(spark.range(1).select(
        explode(lit(Array(10L, 25L, 50L))).as("k")))
      .groupBy(col("k"))
      .agg(sum(when(col("da") <= col("k") && col("db") <= col("k"), 1L)
        .otherwise(0L)).as("inter"))
      .select(col("k"), col("inter"),
        (col("inter").cast("double") / col("k").cast("double"))
          .as("overlap_at_k"),
        (col("inter").cast("double") /
          (lit(2L) * col("k") - col("inter")).cast("double"))
          .as("jaccard_at_k"))
      .orderBy(col("k"))
  }

  private val rankOverlapSql =
    """WITH t AS (
      |  SELECT CAST(substr(source, 4) AS BIGINT) % 2 AS g,
      |    unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), ranked AS (
      |  SELECT g, tok, CAST(row_number() OVER (PARTITION BY g
      |    ORDER BY COUNT(*) DESC, tok) AS BIGINT) AS d
      |  FROM t GROUP BY g, tok
      |  QUALIFY d <= 50
      |), joined AS (
      |  SELECT a.tok, a.d AS da, b.d AS db
      |  FROM (SELECT tok, d FROM ranked WHERE g = 1) a
      |  JOIN (SELECT tok, d FROM ranked WHERE g = 0) b USING (tok)
      |), ks AS (SELECT unnest([10, 25, 50]) AS k)
      |SELECT CAST(k AS BIGINT) AS k,
      |  CAST(SUM(CASE WHEN da <= k AND db <= k THEN 1 ELSE 0 END)
      |    AS BIGINT) AS inter,
      |  CAST(SUM(CASE WHEN da <= k AND db <= k THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(k AS DOUBLE) AS overlap_at_k,
      |  CAST(SUM(CASE WHEN da <= k AND db <= k THEN 1 ELSE 0 END)
      |    AS DOUBLE)
      |    / CAST(2 * k - SUM(CASE WHEN da <= k AND db <= k THEN 1
      |        ELSE 0 END) AS DOUBLE) AS jaccard_at_k
      |FROM joined, ks
      |GROUP BY k ORDER BY k""".stripMargin

  /** BM25-lite retrieval scoring for the fixed 3-term query
    * {hash, join, vector}: the full BM25 tf-saturation term
    * tf·(k₁+1)/(tf + k₁·(1−b+b·dl/avgdl)) with the RATIONAL idf
    * (N−df+½)/(df+½) instead of its log (the same ln-free idf choice
    * as q98 — log is not correctly rounded across engines, rationals
    * are). Per-term tf comes from one counting pass over the token
    * arrays (no explode shuffle); corpus stats are a broadcast 1-row
    * aggregate; the 3 per-term scores add in fixed order so the total
    * is the identical IEEE double on both engines. TakeOrdered(20). */
  def bm25TopK(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("hash", "join", "vector")
    val perDoc = docs(spark, dir)
      .select(col("doc_id") +: size(split(col("text"), " ")).cast("long")
          .as("dl") +:
        terms.zipWithIndex.map { case (t, i) =>
          size(filter(split(col("text"), " "), x => x === lit(t)))
            .cast("long").as(s"tf$i")
        }: _*)
      .localCheckpoint(false) // corpus stats AND the scored scan
    val stats = perDoc.agg(
      count(lit(1)).as("n"), sum(col("dl")).as("sdl"),
      sum(when(col("tf0") > 0, 1L).otherwise(0L)).as("df0"),
      sum(when(col("tf1") > 0, 1L).otherwise(0L)).as("df1"),
      sum(when(col("tf2") > 0, 1L).otherwise(0L)).as("df2"))
    def score(i: Int) = {
      val tf = col(s"tf$i").cast("double")
      val idf = (col("n").cast("double") - col(s"df$i").cast("double") +
        lit(0.5)) / (col(s"df$i").cast("double") + lit(0.5))
      idf * (tf * lit(2.2)) /
        (tf + lit(1.2) * (lit(0.25) + lit(0.75) *
          (col("dl").cast("double") /
            (col("sdl").cast("double") / col("n").cast("double")))))
    }
    perDoc.crossJoin(stats)
      .filter(col("tf0") + col("tf1") + col("tf2") > 0)
      .select(col("doc_id"), col("tf0"), col("tf1"), col("tf2"),
        (score(0) + score(1) + score(2)).as("bm25"))
      .orderBy(col("bm25").desc, col("doc_id"))
      .limit(20)
  }

  private val bm25TopKSql = {
    def score(i: Int) =
      s"""((CAST(n AS DOUBLE) - CAST(df$i AS DOUBLE) + 0.5)
         |    / (CAST(df$i AS DOUBLE) + 0.5))
         |    * (CAST(tf$i AS DOUBLE) * 2.2)
         |    / (CAST(tf$i AS DOUBLE) + 1.2 * (0.25 + 0.75
         |      * (CAST(dl AS DOUBLE)
         |        / (CAST(sdl AS DOUBLE) / CAST(n AS DOUBLE)))))"""
        .stripMargin
    s"""WITH per AS (
       |  SELECT doc_id,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS dl,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> x = 'hash')) AS BIGINT) AS tf0,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> x = 'join')) AS BIGINT) AS tf1,
       |    CAST(len(list_filter(string_split(text, ' '),
       |      x -> x = 'vector')) AS BIGINT) AS tf2
       |  FROM documents
       |), stats AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(dl) AS BIGINT) AS sdl,
       |    CAST(SUM(CASE WHEN tf0 > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS df0,
       |    CAST(SUM(CASE WHEN tf1 > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS df1,
       |    CAST(SUM(CASE WHEN tf2 > 0 THEN 1 ELSE 0 END) AS BIGINT)
       |      AS df2
       |  FROM per
       |)
       |SELECT doc_id, tf0, tf1, tf2,
       |  ${score(0)}
       |  + ${score(1)}
       |  + ${score(2)} AS bm25
       |FROM per, stats
       |WHERE tf0 + tf1 + tf2 > 0
       |ORDER BY bm25 DESC, doc_id
       |LIMIT 20""".stripMargin
  }

  /** Feature hashing (the hashing trick): tokens bucketed by a 60-bit
    * md5 prefix mod 64 into fixed-width sparse count vectors — the
    * vocabulary-free featurizer whose width is independent of corpus
    * size (no dictionary to build, broadcast, or grow stale at 100 TB).
    * Map-side explode + one (doc, bucket) partial→final aggregate. */
  def featureHash(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "documents")
      .select(col("doc_id"), explode(split(col("text"), " ")).as("tok"))
      .filter(col("tok") =!= "")
      .select(col("doc_id"),
        (conv(substring(md5(col("tok")), 1, 15), 16, 10).cast("long")
          % 64).as("bucket"))
      .groupBy(col("doc_id"), col("bucket"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("doc_id"), col("bucket"))

  /** DuckDB has no hex→int cast: the 60-bit md5 prefix is parsed with
    * the same generated 15-term base-16 strpos polynomial as the q165
    * checksum oracle. */
  private val featureHashSql = {
    val poly = (0 until 15).map { k =>
      val pow = math.pow(16, 14 - k).toLong
      s"(strpos('0123456789abcdef', substring(h, ${k + 1}, 1)) - 1) * $pow"
    }.mkString(" + ")
    s"""WITH toks AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents
       |), f AS (
       |  SELECT doc_id, md5(tok) AS h FROM toks WHERE tok <> ''
       |)
       |SELECT doc_id, ($poly) % 64 AS bucket, COUNT(*) AS cnt
       |FROM f GROUP BY 1, 2 ORDER BY doc_id, bucket""".stripMargin
  }

  // ---- Heaps-law vocabulary growth -------------------------------------

  /** Vocabulary growth curve (Heaps' law audit): distinct-token count
    * after each tenth of the corpus, the curve a tokenizer-budget
    * decision reads off before training. Prefixes are doc_id-VALUE
    * ranges (boundary k = max_id·k/10), not rank ranges, so no global
    * sort exists anywhere: one explode + min(doc_id)-per-token aggregate
    * (the only corpus-sized pass, keyed on token), then a 10-row
    * broadcast range join rolls tokens and docs into their prefix
    * buckets. Exact integers end-to-end. */
  def heapsLaw(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(col("text").isNotNull)
    val firsts = d
      .select(col("doc_id"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(min(col("doc_id")).as("first_doc"))
    val bounds = spark.range(1, 11).toDF("k")
      .crossJoin(broadcast(d.agg(max(col("doc_id")).as("m"))))
      .select(col("k"), expr("m * k div 10").as("bound"))
    val vocab = firsts.join(broadcast(bounds), col("first_doc") <= col("bound"))
      .groupBy(col("k"), col("bound"))
      .agg(count(lit(1)).as("vocab"))
    val nDocs = d.join(broadcast(bounds), col("doc_id") <= col("bound"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_docs"))
    vocab.join(broadcast(nDocs), "k")
      .select(col("k"), col("bound"), col("n_docs"), col("vocab"))
      .orderBy(col("k"))
  }

  private val heapsLawSql =
    """WITH f AS (
      |  SELECT tok, MIN(doc_id) AS first_doc FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents WHERE text IS NOT NULL) s
      |  WHERE tok <> '' GROUP BY 1
      |), m AS (
      |  SELECT MAX(doc_id) AS m FROM documents WHERE text IS NOT NULL
      |), ks AS (
      |  SELECT k, (m * k) // 10 AS bound FROM range(1, 11) t(k), m
      |), v AS (
      |  SELECT k, bound, CAST(COUNT(*) AS BIGINT) AS vocab
      |  FROM f, ks WHERE first_doc <= bound GROUP BY 1, 2
      |), nd AS (
      |  SELECT k, CAST(COUNT(*) AS BIGINT) AS n_docs
      |  FROM documents, ks WHERE text IS NOT NULL AND doc_id <= bound
      |  GROUP BY 1
      |)
      |SELECT v.k, v.bound, nd.n_docs, v.vocab
      |FROM v JOIN nd USING (k) ORDER BY k""".stripMargin

  // ---- n-gram novelty (contamination-style audit) ----------------------

  /** Trigram novelty of the corpus tail: of the distinct 3-grams
    * appearing in the last tenth of the corpus (by doc_id value), what
    * fraction was never seen in the first 90% — the pre-training freshness
    * / memorization-risk audit run before admitting a new crawl slice.
    * One shingle pass (row-local, per-doc distinct), one min/max-per-
    * shingle aggregate keyed on the shingle, a 1-row broadcast boundary,
    * and a global sum — no joins over the corpus. Exact integers plus one
    * mirrored IEEE division. */
  def ngramNovelty(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(col("text").isNotNull)
    val stats = graft.ops.DedupOps.shingles(d, 3)
      .groupBy(col("shingle"))
      .agg(min(col("doc_id")).as("first_doc"), max(col("doc_id")).as("last_doc"))
    val bound = d.agg(expr("max(doc_id) * 9 div 10").as("b"))
    stats.crossJoin(broadcast(bound))
      .agg(
        sum(when(col("last_doc") > col("b"), 1L).otherwise(0L))
          .cast("long").as("tail_trigrams"),
        sum(when(col("first_doc") > col("b"), 1L).otherwise(0L))
          .cast("long").as("novel_trigrams"))
      .select(col("tail_trigrams"), col("novel_trigrams"),
        (col("novel_trigrams").cast("double")
          / col("tail_trigrams").cast("double")).as("novelty_rate"))
  }

  private val ngramNoveltySql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t
      |  FROM documents WHERE text IS NOT NULL
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+2], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3
      |), st AS (
      |  SELECT shingle, MIN(doc_id) AS first_doc, MAX(doc_id) AS last_doc
      |  FROM sh GROUP BY 1
      |), bd AS (
      |  SELECT MAX(doc_id) * 9 // 10 AS b
      |  FROM documents WHERE text IS NOT NULL
      |)
      |SELECT
      |  CAST(SUM(CASE WHEN last_doc > b THEN 1 ELSE 0 END) AS BIGINT)
      |    AS tail_trigrams,
      |  CAST(SUM(CASE WHEN first_doc > b THEN 1 ELSE 0 END) AS BIGINT)
      |    AS novel_trigrams,
      |  CAST(SUM(CASE WHEN first_doc > b THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(CASE WHEN last_doc > b THEN 1 ELSE 0 END) AS DOUBLE)
      |    AS novelty_rate
      |FROM st, bd""".stripMargin

  // ---- cross-source vocabulary overlap ---------------------------------

  /** Pairwise vocabulary Jaccard between document sources — the
    * mixture-design diagnostic that says which crawl sources are
    * near-duplicates of each other at the vocabulary level. One distinct
    * (source, token) reduction, a token-keyed self-join for
    * intersections (pair fan-out bounded by the source count squared,
    * a small constant), broadcast per-source sizes, one IEEE division
    * per pair. */
  def sourceVocabJaccard(spark: SparkSession, dir: String): DataFrame = {
    val st = docs(spark, dir).filter(col("text").isNotNull)
      .select(col("source"), explode(TextOps.tokens(col("text"))).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    val sizes = st.groupBy(col("source")).agg(count(lit(1)).as("nv"))
    st.select(col("source").as("s1"), col("tok"))
      .join(st.select(col("source").as("s2"), col("tok")), "tok")
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2")).agg(count(lit(1)).as("n_inter"))
      .join(broadcast(sizes.select(col("source").as("s1"), col("nv").as("n1"))),
        "s1")
      .join(broadcast(sizes.select(col("source").as("s2"), col("nv").as("n2"))),
        "s2")
      .select(col("s1"), col("s2"), col("n_inter"), col("n1"), col("n2"),
        (col("n_inter").cast("double")
          / (col("n1") + col("n2") - col("n_inter")).cast("double"))
          .as("jaccard"))
      .orderBy(col("s1"), col("s2"))
  }

  private val sourceVocabJaccardSql =
    """WITH st AS (
      |  SELECT DISTINCT source, tok FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents WHERE text IS NOT NULL) s
      |  WHERE tok <> ''
      |), sz AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS nv FROM st GROUP BY 1
      |), it AS (
      |  SELECT a.source AS s1, b.source AS s2,
      |    CAST(COUNT(*) AS BIGINT) AS n_inter
      |  FROM st a JOIN st b ON a.tok = b.tok AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT s1, s2, n_inter, x.nv AS n1, y.nv AS n2,
      |  CAST(n_inter AS DOUBLE) / CAST(x.nv + y.nv - n_inter AS DOUBLE)
      |    AS jaccard
      |FROM it JOIN sz x ON x.source = s1 JOIN sz y ON y.source = s2
      |ORDER BY s1, s2""".stripMargin

  // ---- Pareto vocabulary coverage --------------------------------------

  /** Tokenizer-budget planning: the vocabulary size needed to cover
    * 50/90/99% of all token OCCURRENCES (rank tokens by frequency, find
    * the smallest prefix whose cumulative count crosses each threshold).
    * The corpus-sized work is one (token → count) aggregate; the ranked
    * cumulative window then runs on the VOCAB aggregate — the same
    * model-sized-not-corpus-sized argument as the BPE trainer — with
    * integer threshold arithmetic (cum·100 ≥ total·pct), no floats
    * anywhere. */
  def paretoCoverage(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val counts = TextOps.exploded(docs(spark, dir))
      .filter(col("tok") =!= "")
      .groupBy(col("tok")).agg(count(lit(1)).as("c"))
    val wCum = Window.orderBy(col("c").desc, col("tok"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val ranked = counts
      .withColumn("rank",
        row_number().over(Window.orderBy(col("c").desc, col("tok"))))
      .withColumn("cum", sum(col("c")).over(wCum))
      .crossJoin(broadcast(
        counts.agg(sum(col("c")).cast("long").as("total"))))
    val thresholds = spark.range(0, 3)
      .select(expr("element_at(array(50, 90, 99), cast(id as int) + 1)")
        .as("pct"))
    ranked.join(broadcast(thresholds),
        expr("cum * 100 >= total * pct"))
      .groupBy(col("pct"))
      .agg(min(col("rank")).cast("long").as("vocab_size"),
        max(col("total")).as("total_occurrences"))
      .orderBy(col("pct"))
  }

  private val paretoCoverageSql =
    """WITH t AS (
      |  SELECT unnest(string_split(text, ' ')) AS tok
      |  FROM documents
      |), f AS (
      |  SELECT tok, COUNT(*) AS c FROM t WHERE tok <> '' GROUP BY 1
      |), r AS (
      |  SELECT c, ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS rank,
      |    SUM(c) OVER (ORDER BY c DESC, tok
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      |  FROM f
      |), tot AS (
      |  SELECT CAST(SUM(c) AS BIGINT) AS total FROM f
      |)
      |SELECT pct, CAST(MIN(rank) AS BIGINT) AS vocab_size,
      |  MAX(total) AS total_occurrences
      |FROM r, tot, (VALUES (50), (90), (99)) th(pct)
      |WHERE cum * 100 >= total * pct
      |GROUP BY 1 ORDER BY pct""".stripMargin

  /** Per-source Simpson diversity of the token distribution:
    * 1 − Σc(c−1)/(N(N−1)) — the probability two tokens drawn without
    * replacement differ. The entropy-free diversity index: every term is
    * an exact integer (token counts and one Σc(c−1) sum), so unlike
    * per-term ln entropy it hash-matches across engines; the single
    * division is mirrored IEEE. Corpus pass → vocab-sized count table →
    * per-source 1-row rollup. BIGINT bounds hold to ~3·10⁹ repeats of
    * one token in one source; beyond that the sums move to
    * DECIMAL(38,0) unchanged in shape. */
  def simpsonDiversity(spark: SparkSession, dir: String): DataFrame = {
    val toks = TextOps.exploded(
        Catalog.load(spark, dir, "documents"))
      .join(Catalog.load(spark, dir, "documents")
        .select(col("doc_id"), col("source")), "doc_id")
    toks.groupBy(col("source"), col("tok"))
      .agg(count(lit(1)).as("c"))
      .groupBy(col("source"))
      .agg(sum(col("c")).cast("long").as("n_tokens"),
        count(lit(1)).as("vocab"),
        sum(col("c") * (col("c") - 1)).cast("long").as("ss"))
      .select(col("source"), col("n_tokens"), col("vocab"),
        (lit(1.0) - col("ss").cast("double") /
          (col("n_tokens") * (col("n_tokens") - 1)).cast("double"))
          .as("simpson"))
      .orderBy(col("source"))
  }

  private val simpsonDiversitySql =
    """WITH t AS (
      |  SELECT d.source, unnest(string_split(d.text, ' ')) AS tok
      |  FROM documents d
      |), c AS (
      |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM t GROUP BY 1, 2
      |)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS vocab,
      |  1.0 - CAST(SUM(c * (c - 1)) AS DOUBLE)
      |    / CAST(SUM(c) * (SUM(c) - 1) AS DOUBLE) AS simpson
      |FROM c GROUP BY 1 ORDER BY 1""".stripMargin

  /** Token-class mix per source: how many tokens are numeric, contain a
    * digit, are "long" (≥10 chars), or single-char — the cleaning-signal
    * profile (a source whose tokens are 30% digit-bearing is telemetry,
    * not prose, and gets filtered before LLM training). Pure
    * length/regexp predicates chosen from the RE2∩java.regex-safe
    * subset (same discipline as q99), exact integer counts, one
    * corpus pass. */
  def tokenClasses(spark: SparkSession, dir: String): DataFrame =
    TextOps.exploded(Catalog.load(spark, dir, "documents"))
      .join(Catalog.load(spark, dir, "documents")
        .select(col("doc_id"), col("source")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("tok").rlike("^[0-9]+$"), 1L).otherwise(0L))
          .cast("long").as("n_numeric"),
        sum(when(col("tok").rlike("[0-9]"), 1L).otherwise(0L))
          .cast("long").as("n_has_digit"),
        sum(when(length(col("tok")) >= 10, 1L).otherwise(0L))
          .cast("long").as("n_long"),
        sum(when(length(col("tok")) === 1, 1L).otherwise(0L))
          .cast("long").as("n_single"))
      .orderBy(col("source"))

  private val tokenClassesSql =
    """WITH t AS (
      |  SELECT d.source, unnest(string_split(d.text, ' ')) AS tok
      |  FROM documents d
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_tokens,
      |  CAST(SUM(CASE WHEN regexp_matches(tok, '^[0-9]+$') THEN 1 ELSE 0
      |    END) AS BIGINT) AS n_numeric,
      |  CAST(SUM(CASE WHEN regexp_matches(tok, '[0-9]') THEN 1 ELSE 0
      |    END) AS BIGINT) AS n_has_digit,
      |  CAST(SUM(CASE WHEN length(tok) >= 10 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_long,
      |  CAST(SUM(CASE WHEN length(tok) = 1 THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_single
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- intra-document repetition ratio ---------------------------------

  /** Per-source REPETITION ratio: the share of token trigrams inside a
    * document that are repeats of an earlier trigram in the SAME
    * document — the boilerplate/spam signal (navigation chrome, SEO
    * keyword stuffing, template mail) that per-doc lexical diversity
    * (q50) underweights because repeated PHRASES reuse common tokens.
    * One row-local shingle pass (per-doc distinct trigrams), one
    * doc-keyed count, a source rollup with exact integer totals; the
    * "repetitive doc" flag (per-doc repeated share > 20%) is the exact
    * cross-multiplied integer compare 5·distinct < 4·total — no float
    * threshold. */
  def repetitionRatio(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir).filter(col("text").isNotNull)
    val perDoc = graft.ops.DedupOps.shingles(d, 3)
      .groupBy(col("doc_id")).agg(count(lit(1)).as("dtg"))
    d.select(col("doc_id"), col("source"),
        (size(split(col("text"), " ", -1)) - 2).cast("long").as("ttg"))
      .filter(col("ttg") > 0)
      .join(perDoc, "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(col("ttg")).as("total_trigrams"),
        sum(col("dtg")).as("distinct_trigrams"),
        sum((col("dtg") * 5 < col("ttg") * 4).cast("long"))
          .as("n_repetitive"))
      .select(col("source"), col("n_docs"), col("total_trigrams"),
        col("distinct_trigrams"),
        ((col("total_trigrams") - col("distinct_trigrams")).cast("double")
          / col("total_trigrams").cast("double")).as("rep_ratio"),
        col("n_repetitive"))
      .orderBy(col("source"))
  }

  private val repetitionRatioSql =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t
      |  FROM documents WHERE text IS NOT NULL
      |), base AS (
      |  SELECT doc_id, source, CAST(len(t) - 2 AS BIGINT) AS ttg
      |  FROM toks WHERE len(t) >= 3
      |), sh AS (
      |  SELECT doc_id,
      |    CAST(COUNT(DISTINCT array_to_string(t[i:i+2], ' ')) AS BIGINT)
      |      AS dtg
      |  FROM toks, unnest(range(1, len(t) - 1)) AS u(i) WHERE len(t) >= 3
      |  GROUP BY doc_id
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(ttg) AS BIGINT) AS total_trigrams,
      |  CAST(SUM(dtg) AS BIGINT) AS distinct_trigrams,
      |  CAST(SUM(ttg) - SUM(dtg) AS DOUBLE) / CAST(SUM(ttg) AS DOUBLE)
      |    AS rep_ratio,
      |  CAST(SUM(CASE WHEN dtg * 5 < ttg * 4 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repetitive
      |FROM base JOIN sh USING (doc_id)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- capped water-fill token allocation -------------------------------

  /** Capped WATER-FILL token allocation across sources — the epoch
    * scheduler's question when balancing a training blend: keep the
    * total token budget equal to the corpus size, pull every source
    * toward an equal share, but never repeat a source more than C=3
    * epochs. Sources too small to reach the common water level w are
    * capped at 3× their tokens; the freed budget raises w for the
    * rest. The split point is found declaratively with the house
    * rank-threshold recipe — sort by capped size, one running sum over
    * the |sources|-row frame, the prefix where cap·(k−r) ≤ B−S_r is
    * exactly the capped set — no iteration, no driver loop. w and the
    * per-source repeat factors are exact floored micro-units (q120/q186
    * hand out DOC quotas for a sample; this allocates TOKENS for the
    * epoch plan). */
  def cappedWaterfill(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val a = docs(spark, dir).filter(col("text").isNotNull)
      .groupBy(col("source"))
      .agg(sum(size(split(col("text"), " ", -1)).cast("long")).as("a"))
    val tot = a.agg(count(lit(1)).as("k"), sum(col("a")).as("b"))
    val w = Window.orderBy(col("cap_a"), col("source"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val t = a.withColumn("cap_a", col("a") * 3)
      .crossJoin(broadcast(tot))
      .withColumn("r", row_number().over(
        Window.orderBy(col("cap_a"), col("source"))).cast("long"))
      .withColumn("s_r", sum(col("cap_a")).over(w))
      .withColumn("is_capped",
        col("cap_a") * (col("k") - col("r")) <= col("b") - col("s_r"))
    val lvl = t.agg(max(col("b")).as("b"), max(col("k")).as("k"),
        sum(when(col("is_capped"), col("cap_a")).otherwise(0L)).as("s_p"),
        sum(col("is_capped").cast("long")).as("p"))
      .select(expr(s"CAST((CAST(b - s_p AS $dec) * 1000000) div (k - p) AS BIGINT)")
        .as("w_micro"))
    t.crossJoin(broadcast(lvl))
      .select(col("source"), col("a").as("tokens"),
        col("cap_a").as("cap_tokens"),
        (expr(s"CAST(CAST(cap_a AS $dec) * 1000000 AS $dec)")
          <= col("w_micro")).as("capped"),
        expr(s"""CAST(least(CAST(cap_a AS $dec) * 1000000,
                 CAST(w_micro AS $dec)) AS BIGINT)""").as("alloc_micro"),
        expr(s"""CAST(least(CAST(cap_a AS $dec) * 1000000,
                 CAST(w_micro AS $dec)) div a AS BIGINT)""")
          .as("repeat_micro"))
      .orderBy(col("source"))
  }

  private val cappedWaterfillSql =
    """WITH a AS (
      |  SELECT source, CAST(SUM(len(string_split(text, ' '))) AS BIGINT)
      |      AS a
      |  FROM documents WHERE text IS NOT NULL GROUP BY 1
      |), tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k, CAST(SUM(a) AS BIGINT) AS b
      |  FROM a
      |), t AS (
      |  SELECT source, a, 3 * a AS cap_a, k, b,
      |    CAST(row_number() OVER (ORDER BY 3 * a, source) AS BIGINT) AS r,
      |    CAST(SUM(3 * a) OVER (ORDER BY 3 * a, source
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS s_r
      |  FROM a, tot
      |), lvl AS (
      |  SELECT CAST((CAST(MAX(b) - COALESCE(SUM(CASE
      |      WHEN cap_a * (k - r) <= b - s_r THEN cap_a END), 0) AS HUGEINT)
      |      * 1000000)
      |    // (MAX(k) - COALESCE(SUM(CASE
      |      WHEN cap_a * (k - r) <= b - s_r THEN 1 END), 0)) AS BIGINT)
      |      AS w_micro
      |  FROM t
      |)
      |SELECT source, a AS tokens, cap_a AS cap_tokens,
      |  CAST(cap_a AS HUGEINT) * 1000000 <= w_micro AS capped,
      |  CAST(least(CAST(cap_a AS HUGEINT) * 1000000,
      |    CAST(w_micro AS HUGEINT)) AS BIGINT) AS alloc_micro,
      |  CAST(least(CAST(cap_a AS HUGEINT) * 1000000,
      |    CAST(w_micro AS HUGEINT)) // a AS BIGINT) AS repeat_micro
      |FROM t, lvl
      |ORDER BY source""".stripMargin

  // ---- span-corruption budget plan ---------------------------------------

  /** T5-style SPAN-CORRUPTION budget plan per source: at 15% noise
    * density and mean span 3, each doc contributes
    * n_spans = max(1, round(n/20)) spans, masked = min(n, 3·n_spans)
    * tokens, an encoder input of n − masked + n_spans (each span
    * collapses to one sentinel) and a decoder target of
    * masked + n_spans — the length arithmetic a denoising-pretraining
    * batch planner runs over the corpus BEFORE deciding packing and
    * steps-per-epoch (q108 packs the results; q125 selects under a
    * budget; this prices the objective itself). Pure integer per-doc
    * arithmetic, exact rollup, one mirrored ratio. */
  def spanCorruptionPlan(spark: SparkSession, dir: String): DataFrame = {
    val perDoc = docs(spark, dir).filter(col("text").isNotNull)
      .select(col("source"),
        size(split(col("text"), " ", -1)).cast("long").as("n"))
      .withColumn("n_spans",
        greatest(lit(1L), expr("(n + 10) div 20")))
      .withColumn("masked", least(col("n"), col("n_spans") * 3))
    perDoc.groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("n")).as("total_tokens"),
        sum(col("n_spans")).as("total_spans"),
        sum(col("masked")).as("total_masked"),
        sum(col("n") - col("masked") + col("n_spans"))
          .as("total_input_len"),
        sum(col("masked") + col("n_spans")).as("total_target_len"))
      .withColumn("mask_ratio",
        col("total_masked").cast("double")
          / col("total_tokens").cast("double"))
      .orderBy(col("source"))
  }

  private val spanCorruptionPlanSql =
    """WITH d AS (
      |  SELECT source, CAST(len(string_split(text, ' ')) AS BIGINT) AS n
      |  FROM documents WHERE text IS NOT NULL
      |), p AS (
      |  SELECT source, n, greatest(1, (n + 10) // 20) AS n_spans,
      |    least(n, greatest(1, (n + 10) // 20) * 3) AS masked
      |  FROM d
      |)
      |SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(n) AS BIGINT) AS total_tokens,
      |  CAST(SUM(n_spans) AS BIGINT) AS total_spans,
      |  CAST(SUM(masked) AS BIGINT) AS total_masked,
      |  CAST(SUM(n - masked + n_spans) AS BIGINT) AS total_input_len,
      |  CAST(SUM(masked + n_spans) AS BIGINT) AS total_target_len,
      |  CAST(SUM(masked) AS DOUBLE) / CAST(SUM(n) AS DOUBLE) AS mask_ratio
      |FROM p GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- vocabulary richness estimators ------------------------------------------

  /** VOCABULARY RICHNESS panel per source — the ecology estimators
    * that answer "how much vocabulary does this source have that we
    * have NOT yet seen" (q480's capture–recapture needs a split; these
    * work from one sample's frequency-of-frequencies): Chao1
    * D + f₁²/(2f₂), first-order jackknife D + f₁·(n−1)/n with n = the
    * TOKEN count (the abundance-based sample size — ADVICE r11 caught
    * the first cut dividing by the type count), Good–Turing
    * coverage 1 − f₁/N, and Berger–Parker dominance max(c)/N. All from
    * one (source, token) count reduction — f₁/f₂ are singleton/
    * doubleton type counts — exact integers with one floored micro
    * division per estimator. */
  def vocabRichness(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val tc = docs(spark, dir).filter(col("text").isNotNull)
      .select(col("source"),
        explode(split(col("text"), " ", -1)).as("tok"))
      .filter(col("tok") =!= "")
      .groupBy(col("source"), col("tok")).agg(count(lit(1)).as("c"))
    tc.groupBy(col("source"))
      .agg(count(lit(1)).as("d_types"), sum(col("c")).as("n_tokens"),
        sum((col("c") === 1).cast("long")).as("f1"),
        sum((col("c") === 2).cast("long")).as("f2"),
        max(col("c")).as("max_c"))
      .select(col("source"), col("d_types"), col("n_tokens"), col("f1"),
        col("f2"),
        (col("d_types") * 1000000L
          + expr(s"""CAST(CASE WHEN f2 > 0
                     THEN (CAST(f1 AS $dec) * f1 * 1000000) div (2 * f2)
                     ELSE CAST(f1 AS $dec) * (f1 - 1) * 500000 END
                     AS BIGINT)""")).as("chao1_micro"),
        (col("d_types") * 1000000L
          + expr(s"""CAST((CAST(f1 AS $dec) * (n_tokens - 1) * 1000000)
                     div n_tokens AS BIGINT)""")).as("jackknife1_micro"),
        expr(s"""CAST(1000000 - (CAST(f1 AS $dec) * 1000000) div n_tokens
                 AS BIGINT)""").as("gt_coverage_micro"),
        expr(s"""CAST((CAST(max_c AS $dec) * 1000000) div n_tokens
                 AS BIGINT)""").as("berger_parker_micro"))
      .orderBy(col("source"))
  }

  private val vocabRichnessSql =
    """WITH tc AS (
      |  SELECT source, tok, CAST(COUNT(*) AS BIGINT) AS c FROM (
      |    SELECT source, unnest(string_split(text, ' ')) AS tok
      |    FROM documents WHERE text IS NOT NULL) u
      |  WHERE tok <> ''
      |  GROUP BY 1, 2
      |), m AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS d_types,
      |    CAST(SUM(c) AS BIGINT) AS n_tokens,
      |    CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS f1,
      |    CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS f2,
      |    MAX(c) AS max_c
      |  FROM tc GROUP BY 1
      |)
      |SELECT source, d_types, n_tokens, f1, f2,
      |  d_types * 1000000 + CAST(CASE WHEN f2 > 0
      |    THEN (CAST(f1 AS HUGEINT) * f1 * 1000000) // (2 * f2)
      |    ELSE CAST(f1 AS HUGEINT) * (f1 - 1) * 500000 END AS BIGINT)
      |    AS chao1_micro,
      |  d_types * 1000000 + CAST((CAST(f1 AS HUGEINT) * (n_tokens - 1)
      |    * 1000000) // n_tokens AS BIGINT) AS jackknife1_micro,
      |  CAST(1000000 - (CAST(f1 AS HUGEINT) * 1000000) // n_tokens
      |    AS BIGINT) AS gt_coverage_micro,
      |  CAST((CAST(max_c AS HUGEINT) * 1000000) // n_tokens AS BIGINT)
      |    AS berger_parker_micro
      |FROM m ORDER BY source""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q517_vocab_richness", vocabRichness, Some(vocabRichnessSql),
      "vocabulary richness panel per source: Chao1 + jackknife-1 " +
        "unseen-type estimators, Good-Turing coverage, Berger-Parker " +
        "dominance — all from one frequency-of-frequencies reduction"),
    Q("q490_span_corruption_plan", spanCorruptionPlan,
      Some(spanCorruptionPlanSql),
      "T5 span-corruption budget per source (spans, masked tokens, " +
        "encoder/decoder lengths at 15% density, mean span 3) — the " +
        "denoising-objective pricing pass, exact integers"),
    Q("q476_capped_waterfill", cappedWaterfill, Some(cappedWaterfillSql),
      "capped water-fill token allocation across sources (3-epoch cap, " +
        "exact rank-threshold split, micro-unit level/repeat factors) — " +
        "the epoch plan next to q120/q186's doc quotas"),
    Q("q472_repetition_ratio", repetitionRatio, Some(repetitionRatioSql),
      "SOURCE-level trigram repetition rollup + repetitive-doc census " +
        "(exact 5d<4t integer threshold) — the blend-decision view of " +
        "q97's per-doc Gopher metrics"),
    Q("q302_token_classes", tokenClasses, Some(tokenClassesSql),
      "token-class mix per source (numeric/digit-bearing/long/single) — " +
        "the telemetry-vs-prose cleaning signal, exact counts"),
    Q("q286_simpson_diversity", simpsonDiversity,
      Some(simpsonDiversitySql),
      "per-source Simpson token diversity 1-sum(c(c-1))/(N(N-1)): " +
        "integer-exact, one mirrored division (the entropy-free index)"),
    Q("q272_pareto_coverage", paretoCoverage, Some(paretoCoverageSql),
      "vocab size covering 50/90/99% of token occurrences: corpus-sized " +
        "count aggregate, vocab-sized ranked window, integer thresholds"),
    Q("q264_source_vocab_jaccard", sourceVocabJaccard,
      Some(sourceVocabJaccardSql),
      "pairwise source vocabulary Jaccard: distinct (source,token) " +
        "reduction + token-keyed intersection join, broadcast sizes"),
    Q("q261_ngram_novelty", ngramNovelty, Some(ngramNoveltySql),
      "trigram novelty of the corpus tail vs first 90%: min/max-per-" +
        "shingle aggregate, broadcast boundary, one IEEE division"),
    Q("q258_heaps_law", heapsLaw, Some(heapsLawSql),
      "Heaps-law vocabulary growth over corpus tenths: min-doc-per-token " +
        "aggregate + 10-row broadcast range join, exact integers"),
    Q("q243_feature_hash", featureHash, Some(featureHashSql),
      "hashing-trick featurizer: 60-bit md5 token buckets mod 64, " +
        "vocabulary-free sparse count vectors, map-side explode"),
    Q("q234_bm25_topk", bm25TopK, Some(bm25TopKSql),
      "BM25-lite 3-term retrieval: rational ln-free idf, full tf " +
        "saturation, fixed-order IEEE sum, TakeOrdered(20)"),
    Q("q232_rank_overlap", rankOverlap, Some(rankOverlapSql),
      "top-k vocabulary churn between corpus halves: overlap@k and " +
        "jaccard@k over deterministic (count desc, tok) rankings"),
    Q("q229_tv_drift", tvDrift, Some(tvDriftSql),
      "total-variation token-distribution drift between corpus halves " +
        "from exact integer ECDF-free numerators, one division"),
    Q("q223_label_model", labelModel, Some(labelModelSql),
      "weak-supervision majority-vote label model: 3 deterministic " +
        "labeling functions, sign vote, conflict flag (map-only)"),
    Q("q219_dataset_card", datasetCard, Some(datasetCardSql),
      "one-row corpus dataset card: sizes, language mix, token volume, " +
        "exact-dup rate (aggregates only)"),
    Q("q208_filter_attrition", filterAttrition, Some(filterAttritionSql),
      "per-rule corpus-cleaning attrition (total + unique removals per " +
        "rule, integer-exact ratio thresholds, single map pass)"),
    Q("q171_quality_dup_profile", qualityDupProfile,
      Some(qualityDupProfileSql),
      "quality-decile duplicate-rate profile: exact quality score x " +
        "exact-hash dup flag, deterministic ntile deciles"),
    Q("q167_heavy_hitters", heavyHitters, None,
      "two-pass Misra-Gries heavy hitters: bounded-state candidates + " +
        "exact broadcast recount (no-miss above n/k spec-pinned)"),
    Q("q166_cms_freq", cmsFreq, None,
      "count-min sketch token-frequency audit vs exact top-20 counts " +
        "(mergeable 4x1024 sketch; overestimate + error bound spec-pinned)"),
    Q("q149_inverted_index", invertedIndex, Some(invertedIndexSql),
      "inverted-index posting lists for mid-frequency terms (ordered " +
        "LISTAGG, term-keyed build)"),
    Q("q173_weighted_topk", weightedTopK, Some(weightedTopKSql),
      "fixed-size weighted sample: top-10 per language by exact " +
        "integer-rational priority (draw*10^6 div weight), partial " +
        "window top-k"),
    Q("q150_weighted_sample", weightedSample, Some(weightedSampleSql),
      "weighted Bernoulli sample, P(keep) proportional to n_chars " +
        "(integer hash draw, division-free compare)"),
    Q("q153_kfold", kfold, Some(kfoldSql),
      "deterministic 5-fold CV assignment + fold x lang balance census"),
    Q("q145_compression", compression, None,
      "per-doc deflate compression ratio (codec-specific bytes → " +
        "rows-only; bounds spec-checked)"),
    Q("q143_bm25", bm25, Some(bm25Sql),
      "BM25 top-10 docs per query term (rational ln-free idf, broadcast " +
        "corpus stats)"),
    Q("q125_token_budget", tokenBudget, Some(tokenBudgetSql),
      "per-source greedy token-budget selection (longest-first running " +
        "sum, one window per source key)"),
    Q("q120_mixture", mixture, Some(mixtureSql),
      "largest-remainder training-mix apportionment + deterministic " +
        "hash draw per source"),
    Q("q123_lm_score", lmScore, Some(lmScoreSql),
      "bigram LM-proxy quality: corpus-hit mass and hapax count per doc"),
    Q("q50_token_stats", tokenStats, Some(tokenStatsSql),
      "per-doc token counts / lexical diversity"),
    Q("q51_term_freq", termFreq, Some(termFreqSql),
      "corpus term frequencies top-20"),
    Q("q52_quality_score", quality, Some(qualitySql),
      "document quality scoring from exact counts"),
    Q("q267_lang_confusion", langConfusion, Some(langConfusionSql),
      "language-ID confusion matrix: dataset label vs stopword-heuristic " +
        "prediction, doc-keyed join + one aggregate"),
    Q("q53_lang_id", langId, Some(langIdSql),
      "stopword-profile language identification"),
    Q("q57_map_pack", tfMap, Some(tfMapSql),
      "MapType term-frequency column probed with size/try_element_at"),
    Q("q68_bigram_freq", bigramFreq, Some(bigramFreqSql),
      "corpus bigram frequencies top-20 (n-gram LM data prep)"),
    Q("q97_repetition_stats", repetition, Some(repetitionSql),
      "Gopher-style repetition metrics (top n-gram shares, dup 5-gram fraction)"),
    Q("q98_tfidf_top", tfidf, Some(tfidfSql),
      "top-3 terms per doc by tf-idf (rational idf, rank-identical to ln)"),
    Q("q99_scrub_pii", scrub, Some(scrubSql),
      "PII/URL scrubbing: masked text + per-doc flags (RE2-safe patterns)"),
    Q("q102_collocations", collocations, Some(collocationsSql),
      "top word pairs by lift (rational PMI — rank-identical, ln-free)"),
    Q("q104_rag_chunks", chunks, Some(chunksSql),
      "RAG chunking: overlapping 32-token windows, stride 24, per-doc pass"),
    Q("q108_seq_packing", packed, Some(packedSql),
      "greedy 2048-token sequence packing per language (concat-then-chunk " +
        "bin assignment, exact BIGINT running sum)"),
    Q("q109_stratified_sample", stratified, Some(stratifiedSql),
      "deterministic stratified 20% sample per language " +
        "(multiplicative-hash rank, engine-independent)"),
    Q("q114_length_cut", lengthCut, Some(lengthCutSql),
      "corpus-relative p10-p90 token-length cut per language " +
        "(exact rank-selected bounds)"),
    Q("q199_bpe_encode", bpeEncode, None,
      "BPE tokenize with 10 vocab-trained merges: per-doc word/symbol " +
        "counts from the memoized compiled pass (rows-only, spec-checked)"),
    Q("q191_sample_agg", sampleAgg, Some(sampleAggSql),
      "approximate aggregation from the deterministic 20% stratified " +
        "sample, with exact-vs-estimate error audit columns"),
    Q("q188_bpe_pairs", bpePairs, Some(bpePairsSql),
      "BPE merge-candidate mining: top adjacent char pairs weighted by " +
        "word frequency, over the vocab aggregate (tokenizer training)"),
    Q("q186_temperature_mix", temperatureMix, Some(temperatureMixSql),
      "alpha=0.5 temperature-rebalanced training mix: sqrt-count integer " +
        "weights, largest-remainder quotas, deterministic hash draw"),
    Q("q184_boilerplate", boilerplate, Some(boilerplateSql),
      "cross-document boilerplate removal: 8-token segments repeated in " +
        ">=2 docs stripped, text rebuilt from survivors (hashed-segment df)"),
    Q("q54_fingerprint", fingerprint, None,
      "xxhash64 document fingerprint (rows-only; spec-checked)"),
    Q("q55_winnowed_fingerprints",
      (s, d) => graft.ops.DedupOps.winnowedFingerprints(docs(s, d))
        .orderBy(col("doc_id"), col("fp")), None,
      "winnowed k-gram rolling-hash fingerprints (rows-only; spec-checked)"))
}
