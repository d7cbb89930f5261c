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

  /** Same pair graph through the LOSSLESS prefix filter — shares q61's
    * oracle because the pruning provably drops no qualifying pair. */
  def jaccardPrefix(spark: SparkSession, dir: String): DataFrame =
    DedupOps.jaccardPairsPrefix(docs(spark, dir), n = 5, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  /** Incremental admission: batch = every 5th doc_id, corpus = the rest
    * (proportional at any scale factor). */
  def incremental(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    DedupOps.incrementalDedup(
        d.filter(col("doc_id") % 5 =!= 4), d.filter(col("doc_id") % 5 === 4))
      .orderBy(col("doc_id"))
  }

  private val incrementalSql =
    """WITH corpus AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 5 <> 4
      |), batch AS (
      |  SELECT doc_id, text FROM documents WHERE doc_id % 5 = 4
      |), exact AS (
      |  SELECT b.doc_id FROM batch b JOIN corpus c ON b.text = c.text
      |  UNION
      |  SELECT b.doc_id FROM batch b
      |  JOIN (SELECT text, MIN(doc_id) AS keep FROM batch GROUP BY 1) k
      |    ON b.text = k.text AND b.doc_id <> k.keep
      |), ctoks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM corpus
      |), btoks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM batch
      |), csh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM ctoks, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5
      |), bsh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM btoks, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5
      |), allsh AS (
      |  SELECT doc_id, shingle, 'c' AS side FROM csh
      |  UNION ALL
      |  SELECT doc_id, shingle, 'b' AS side FROM bsh
      |), dfreq AS (
      |  SELECT shingle, COUNT(*) AS c FROM allsh GROUP BY 1
      |), capped AS (
      |  SELECT a.doc_id, a.shingle, a.side FROM allsh a
      |  JOIN dfreq USING (shingle) WHERE c <= 1000
      |), cand AS (
      |  SELECT DISTINCT x.doc_id AS doc_b, y.doc_id AS doc_a
      |  FROM capped x JOIN capped y
      |    ON x.shingle = y.shingle AND x.side = 'b'
      |    AND (y.side = 'c' OR x.doc_id > y.doc_id)
      |), card AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM allsh GROUP BY 1
      |), common AS (
      |  SELECT c.doc_b, c.doc_a, COUNT(*) AS cnt
      |  FROM cand c
      |  JOIN allsh a ON a.doc_id = c.doc_a
      |  JOIN allsh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      |  GROUP BY 1, 2
      |), near AS (
      |  SELECT DISTINCT doc_b AS doc_id FROM common
      |  JOIN card x ON doc_a = x.doc_id
      |  JOIN card y ON doc_b = y.doc_id
      |  WHERE CAST(cnt AS DOUBLE) / (x.n_sh + y.n_sh - cnt) >= 0.5
      |)
      |SELECT b.doc_id,
      |  CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
      |       WHEN n.doc_id IS NOT NULL THEN 'near_dup'
      |       ELSE 'admitted' END AS status
      |FROM batch b
      |LEFT JOIN exact e ON b.doc_id = e.doc_id
      |LEFT JOIN near n ON b.doc_id = n.doc_id
      |ORDER BY b.doc_id""".stripMargin

  // Mirrors the Scala candidate df-cap (DedupOps.DefaultMaxDf=1000) —
  // see the reachCtes comment below.
  private val jaccardSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5
      |), cold AS (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  JOIN cold ON a.shingle = cold.shingle
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
      |JOIN cand USING (doc_a, doc_b)
      |JOIN card x ON doc_a = x.doc_id
      |JOIN card y ON doc_b = y.doc_id
      |WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= 0.5
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Shared oracle fragment: the exact-Jaccard pair graph (q61's CTEs)
    * extended to undirected edges + recursive transitive closure.
    * Mirrors the Scala candidate df-cap (DedupOps.DefaultMaxDf=1000):
    * candidate pairs must share ≥1 shingle with df ≤ 1000 while |∩| is
    * still counted over full sets — inert on the fixtures, faithful if
    * a boilerplate hot key ever appears. */
  // private[queries]: CompositionQueries' funnel/liability oracles embed
  // the same component CTEs (q523/q527 replay the full near-dup chain)
  private[queries] val reachCtes =
    """toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5
      |), cold AS (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  JOIN cold ON a.shingle = cold.shingle
      |), card AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b
      |  FROM common
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN card x ON doc_a = x.doc_id
      |  JOIN card y ON doc_b = y.doc_id
      |  WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= 0.5
      |), edges AS (
      |  SELECT doc_a AS u, doc_b AS v FROM pairs
      |  UNION
      |  SELECT doc_b, doc_a FROM pairs
      |), reach AS (
      |  SELECT u, v FROM edges
      |  UNION
      |  SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
      |)""".stripMargin

  def clusters(spark: SparkSession, dir: String): DataFrame =
    CorpusFrames.clusters(spark, dir)
      .orderBy(col("doc_id"))

  private val clustersSql =
    s"""WITH RECURSIVE $reachCtes
       |SELECT d.doc_id,
       |  CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT) AS cluster_rep
       |FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |GROUP BY d.doc_id
       |ORDER BY d.doc_id""".stripMargin

  /** Split-balance audit: total-variation distance of the LANGUAGE mix
    * between each pair of leakage-safe splits — the post-assignment
    * parity check a training pipeline runs before trusting val/test
    * numbers (cluster-keyed splitting preserves leakage safety but can
    * skew covariates; this measures by how much). Because every
    * language term shares the pair's denominator, TV collapses to ONE
    * exact integer sum over cross-multiplied counts divided once:
    * TV = Σ_l |c_a,l·n_b − c_b,l·n_a| / (2·n_a·n_b) — no per-term
    * float accumulation, one mirrored division per pair. Split
    * assignment is the shared q100 machinery. */
  def splitBalance(spark: SparkSession, dir: String): DataFrame = {
    val withLang = DedupOps.leakageSafeSplits(docs(spark, dir))
      .join(docs(spark, dir).select(col("doc_id"), col("lang")), "doc_id")
    val byLang = withLang.groupBy(col("split"), col("lang"))
      .agg(count(lit(1)).as("c"))
      .localCheckpoint(false) // both sides of the pair join below
    val totals = byLang.groupBy(col("split")).agg(sum(col("c")).as("n"))
    def side(s: String) = byLang.filter(col("split") === s)
      .select(col("lang"), col("c"))
    def tot(s: String, out: String) = totals.filter(col("split") === s)
      .select(col("n").as(out)) // 1-row scalar, broadcast below
    val pairs = Seq(("train", "val"), ("train", "test"), ("val", "test"))
    pairs.map { case (a, b) =>
      side(a).withColumnRenamed("c", "ca")
        .join(side(b).withColumnRenamed("c", "cb"), Seq("lang"),
          "full_outer")
        .crossJoin(broadcast(tot(a, "na")))
        .crossJoin(broadcast(tot(b, "nb")))
        .agg(max(col("na")).as("n_a"), max(col("nb")).as("n_b"),
          sum(abs(coalesce(col("ca"), lit(0L)) * col("nb") -
            coalesce(col("cb"), lit(0L)) * col("na"))).as("num"))
        .select(lit(a).as("split_a"), lit(b).as("split_b"),
          col("n_a"), col("n_b"),
          (col("num").cast("double") / (lit(2.0) * col("n_a") * col("n_b")))
            .as("tv_lang"))
    }.reduce(_ unionByName _)
      .orderBy(col("split_a"), col("split_b"))
  }

  private val splitBalanceSql =
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), assigned AS (
       |  SELECT rep.doc_id,
       |    CASE WHEN cluster_rep % 100 < 80 THEN 'train'
       |         WHEN cluster_rep % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split,
       |    d.lang
       |  FROM rep JOIN documents d ON rep.doc_id = d.doc_id
       |), bl AS (
       |  SELECT split, lang, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM assigned GROUP BY 1, 2
       |), tot AS (
       |  SELECT split, CAST(SUM(c) AS BIGINT) AS n FROM bl GROUP BY 1
       |), sp_pairs(split_a, split_b) AS (
       |  VALUES ('train', 'val'), ('train', 'test'), ('val', 'test')
       |), tv AS (
       |  SELECT p.split_a, p.split_b,
       |    MAX(ta.n) AS n_a, MAX(tb.n) AS n_b,
       |    CAST(SUM(abs(COALESCE(a.c, 0) * tb.n - COALESCE(b.c, 0) * ta.n))
       |      AS BIGINT) AS num
       |  FROM sp_pairs p
       |  JOIN tot ta ON ta.split = p.split_a
       |  JOIN tot tb ON tb.split = p.split_b
       |  JOIN (SELECT DISTINCT lang FROM bl) l ON TRUE
       |  LEFT JOIN bl a ON a.split = p.split_a AND a.lang = l.lang
       |  LEFT JOIN bl b ON b.split = p.split_b AND b.lang = l.lang
       |  GROUP BY 1, 2
       |)
       |SELECT split_a, split_b, n_a, n_b,
       |  CAST(num AS DOUBLE) / (2.0 * n_a * n_b) AS tv_lang
       |FROM tv
       |ORDER BY split_a, split_b""".stripMargin

  /** Near-dup cluster size histogram — the dedup observability view:
    * how many clusters of each size the 0.5-Jaccard graph produces
    * (size 1 = unique docs). Rolls q65's connected components into two
    * map-side-combinable aggregates; the component computation is the
    * only corpus-sized work and is shared machinery. */
  def clusterSizeHist(spark: SparkSession, dir: String): DataFrame =
    CorpusFrames.clusters(spark, dir)
      .groupBy(col("cluster_rep")).agg(count(lit(1)).as("sz"))
      .groupBy(col("sz")).agg(count(lit(1)).as("n_clusters"))
      .orderBy(col("sz"))

  private val clusterSizeHistSql =
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), cs AS (
       |  SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS sz
       |  FROM rep GROUP BY 1
       |)
       |SELECT sz, CAST(COUNT(*) AS BIGINT) AS n_clusters
       |FROM cs GROUP BY 1 ORDER BY sz""".stripMargin

  /** Source purity of near-dup clusters (size ≥ 2): how many dup
    * families live inside ONE source vs span several — the syndication
    * fingerprint at cluster granularity (q366 counts cross-source
    * PAIRS; this counts cross-source FAMILIES, which is what a
    * keep-one-per-cluster dedup actually deletes across). Shares the
    * q65 component machinery; two integer aggregates and one share
    * division on top. */
  def clusterPurity(spark: SparkSession, dir: String): DataFrame = {
    val reps = CorpusFrames.clusters(spark, dir)
    val src = docs(spark, dir).select(col("doc_id"), col("source"))
    val per = reps.join(src, "doc_id")
      .groupBy(col("cluster_rep"))
      .agg(count(lit(1)).as("sz"), countDistinct(col("source")).as("n_sources"))
      .filter(col("sz") >= 2)
    per.agg(count(lit(1)).as("n_clusters"),
        sum(when(col("n_sources") === 1, 1L).otherwise(0L)).as("single_source"),
        sum(when(col("n_sources") > 1, 1L).otherwise(0L)).as("multi_source"))
      .select(col("n_clusters"), col("single_source"), col("multi_source"),
        (col("multi_source").cast("double") / col("n_clusters").cast("double"))
          .as("multi_share"))
  }

  private val clusterPuritySql =
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id, d.source,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id, d.source
       |), per AS (
       |  SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS sz,
       |    CAST(COUNT(DISTINCT source) AS BIGINT) AS n_sources
       |  FROM rep GROUP BY 1
       |  HAVING COUNT(*) >= 2
       |)
       |SELECT CAST(COUNT(*) AS BIGINT) AS n_clusters,
       |  CAST(SUM(CASE WHEN n_sources = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS single_source,
       |  CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS multi_source,
       |  CAST(SUM(CASE WHEN n_sources > 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS multi_share
       |FROM per""".stripMargin

  def corpusClean(spark: SparkSession, dir: String): DataFrame =
    DedupOps.corpusClean(docs(spark, dir), qualityMin = 0.38)
      .orderBy(col("doc_id"))

  private val corpusCleanSql = {
    val stops = graft.ops.TextOps.stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id,
       |    LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), keeper AS (
       |  SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY sha256(text)
       |), tq AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), qc AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    COUNT(*) FILTER (tok IN ($stops)) AS n_stop,
       |    COUNT(DISTINCT tok) AS n_distinct
       |  FROM tq GROUP BY doc_id
       |), qual AS (
       |  SELECT doc_id,
       |    least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
       |      + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |      + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3 AS quality
       |  FROM qc
       |)
       |SELECT d.doc_id, d.lang, qual.quality
       |FROM documents d
       |JOIN qual ON qual.doc_id = d.doc_id
       |JOIN rep ON rep.doc_id = d.doc_id
       |WHERE qual.quality >= 0.38
       |  AND rep.cluster_rep = d.doc_id
       |  AND d.doc_id IN (SELECT keep_id FROM keeper)
       |ORDER BY d.doc_id""".stripMargin
  }

  /** Dedup observability: per-source duplicate rates — the summary a
    * training-data pipeline reports after a dedup pass. One aggregate
    * over content hashes, one rollup; text never shuffles. */
  def dupStats(spark: SparkSession, dir: String): DataFrame =
    docs(spark, dir)
      .groupBy(col("source"), sha2(col("text"), 256).as("h"))
      .agg(count(lit(1)).as("n"))
      .groupBy(col("source"))
      .agg(sum(col("n")).as("n_docs"),
        count(lit(1)).as("n_unique"),
        (sum(col("n")) - count(lit(1))).as("n_dupes"),
        ((sum(col("n")) - count(lit(1))).cast("double") / sum(col("n")))
          .as("dup_rate"))
      .orderBy(col("source"))

  private val dupStatsSql =
    """WITH g AS (
      |  SELECT source, sha256(text) AS h, COUNT(*) AS n
      |  FROM documents GROUP BY 1, 2
      |)
      |SELECT source,
      |  CAST(SUM(n) AS BIGINT) AS n_docs,
      |  COUNT(*) AS n_unique,
      |  CAST(SUM(n) - COUNT(*) AS BIGINT) AS n_dupes,
      |  CAST(CAST(SUM(n) - COUNT(*) AS BIGINT) AS DOUBLE)
      |    / CAST(SUM(n) AS BIGINT) AS dup_rate
      |FROM g GROUP BY source
      |ORDER BY source""".stripMargin

  def splits(spark: SparkSession, dir: String): DataFrame =
    DedupOps.leakageSafeSplits(docs(spark, dir)).orderBy(col("doc_id"))

  private val splitsSql =
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |)
       |SELECT doc_id, cluster_rep,
       |  CASE WHEN cluster_rep % 100 < 80 THEN 'train'
       |       WHEN cluster_rep % 100 < 90 THEN 'val'
       |       ELSE 'test' END AS split
       |FROM rep
       |ORDER BY doc_id""".stripMargin

  /** The composed end-to-end corpus publish ([[graft.pipelines
    * .CorpusPublisher]]): clean (quality + exact keeper + near-dup rep
    * at τ=0.5) → leakage-safe split at the LOOSER τ=0.3 → atomic
    * versioned group publish — surfaced through its per-split budget
    * manifest, read back from the PUBLISHED tables so the oracle checks
    * the entire pipeline including the publish round-trip. */
  def corpusPublish(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus_pub_")
      .toString
    try {
      graft.pipelines.CorpusPublisher.publish(docs(spark, dir), out)
      val manifest = graft.pipelines.Versioned.read(spark, out,
          graft.pipelines.CorpusPublisher.ManifestTable)
        .orderBy(col("split"))
      // the query's result is the (tiny) manifest; materialize it and
      // delete the published family — without this, each bench sweep
      // (3 reps + warmup) leaks whole corpora into /tmp. finally, not
      // success-path-only, so a failed rep can't leak either.
      val rows = manifest.collect().toSeq
      val schema = manifest.schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    } finally graft.pipelines.Fs.deleteRecursive(
      new org.apache.hadoop.fs.Path(out))
  }

  /** The INCREMENTAL admission path measured against the SAME oracle as
    * q441: publish the first 80% of the corpus, admit the remaining 20%
    * through [[graft.pipelines.CorpusPublisher.appendBatch]] (O(batch)
    * staging, stability-safe splits), and return the resulting budget
    * manifest. Because batch admission ≡ full republish on a
    * non-bridging batch (CorpusPublisherSpec), the manifest must equal
    * what one full publish over all documents produces — so DuckDB's
    * full-pipeline corpusPublishSql oracle checks the whole admission
    * path end-to-end, the q13/q10 fused-twin pattern applied to the
    * publishing tier. */
  def corpusAppend(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_corpus_app_")
      .toString
    try {
      val d = docs(spark, dir).localCheckpoint(false) // both stages below
      val n = d.agg(count(lit(1))).collect()(0).getLong(0)
      val cut = n * 4 / 5
      graft.pipelines.CorpusPublisher.publish(
        d.filter(col("doc_id") < cut), out)
      graft.pipelines.CorpusPublisher.appendBatch(
        d.filter(col("doc_id") >= cut), out, batchId = 1L)
      val manifest = graft.pipelines.Versioned.read(spark, out,
          graft.pipelines.CorpusPublisher.ManifestTable)
        .orderBy(col("split"))
      val rows = manifest.collect().toSeq
      val schema = manifest.schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    } finally graft.pipelines.Fs.deleteRecursive(
      new org.apache.hadoop.fs.Path(out))
  }

  /** Both-threshold reach chains share the shingle fragments; only the
    * Jaccard cut in `pairs` differs (0.5 = dedup keep, 0.3 = split
    * scope). Same df-cap mirror as [[reachCtes]]. */
  private def reachChainAt(sfx: String, thr: String) =
    s"""pairs$sfx AS (
       |  SELECT doc_a, doc_b
       |  FROM common
       |  JOIN cand USING (doc_a, doc_b)
       |  JOIN card x ON doc_a = x.doc_id
       |  JOIN card y ON doc_b = y.doc_id
       |  WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= $thr
       |), edges$sfx AS (
       |  SELECT doc_a AS u, doc_b AS v FROM pairs$sfx
       |  UNION
       |  SELECT doc_b, doc_a FROM pairs$sfx
       |), reach$sfx AS (
       |  SELECT u, v FROM edges$sfx
       |  UNION
       |  SELECT r.u, e.v FROM reach$sfx r JOIN edges$sfx e ON r.v = e.u
       |), rep$sfx AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach$sfx r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |)""".stripMargin

  private val corpusPublishSql = {
    val stops = graft.ops.TextOps.stopwords("en").map(s => s"'$s'").mkString(", ")
    s"""WITH RECURSIVE toks AS (
       |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
       |), sh AS (
       |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
       |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
       |  WHERE len(t) >= 5
       |), cold AS (
       |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
       |), cand AS (
       |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  JOIN cold ON a.shingle = cold.shingle
       |), card AS (
       |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
       |), common AS (
       |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
       |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
       |  GROUP BY 1, 2
       |), ${reachChainAt("5", "0.5")}, ${reachChainAt("3", "0.3")},
       |keeper AS (
       |  SELECT MIN(doc_id) AS keep_id FROM documents GROUP BY sha256(text)
       |), tq AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
       |), qc AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    COUNT(*) FILTER (tok IN ($stops)) AS n_stop,
       |    COUNT(DISTINCT tok) AS n_distinct
       |  FROM tq GROUP BY doc_id
       |), qual AS (
       |  SELECT doc_id,
       |    least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
       |      + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |      + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3 AS quality
       |  FROM qc
       |), kept AS (
       |  SELECT d.doc_id, d.text
       |  FROM documents d
       |  JOIN qual ON qual.doc_id = d.doc_id
       |  JOIN rep5 ON rep5.doc_id = d.doc_id
       |  WHERE qual.quality >= 0.38
       |    AND rep5.cluster_rep = d.doc_id
       |    AND d.doc_id IN (SELECT keep_id FROM keeper)
       |), assigned AS (
       |  SELECT k.doc_id, k.text,
       |    CASE WHEN rep3.cluster_rep % 100 < 80 THEN 'train'
       |         WHEN rep3.cluster_rep % 100 < 90 THEN 'val'
       |         ELSE 'test' END AS split
       |  FROM kept k JOIN rep3 ON rep3.doc_id = k.doc_id
       |)
       |SELECT split, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens,
       |  CAST(SUM(length(text)) AS BIGINT) AS n_chars
       |FROM assigned GROUP BY 1 ORDER BY 1""".stripMargin
  }

  def contamination(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    DedupOps.contamination(
        d.filter(col("source") =!= "src0"), d.filter(col("source") === "src0"))
      .orderBy(col("doc_id"), col("eval_id"))
  }

  private val contaminationSql =
    """WITH corpus AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE source <> 'src0'
      |), ev AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |  WHERE source = 'src0'
      |), cs AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM corpus, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5
      |), dfreq AS (
      |  SELECT shingle, COUNT(*) AS c FROM cs GROUP BY 1
      |), rare AS (
      |  SELECT doc_id, shingle FROM cs JOIN dfreq USING (shingle)
      |  WHERE c <= 1000
      |), es AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM ev, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5
      |)
      |SELECT r.doc_id, e.doc_id AS eval_id, COUNT(*) AS n_common
      |FROM rare r JOIN es e USING (shingle)
      |GROUP BY 1, 2
      |HAVING COUNT(*) >= 3
      |ORDER BY r.doc_id, eval_id""".stripMargin

  def minhashLsh(spark: SparkSession, dir: String): DataFrame =
    DedupOps.minhashLshPairs(docs(spark, dir), n = 5, k = 64, r = 4, threshold = 0.5)
      .orderBy(col("doc_a"), col("doc_b"))

  def simhashSigs(spark: SparkSession, dir: String): DataFrame =
    DedupOps.simhash(docs(spark, dir)).orderBy(col("doc_id"))

  /** Cross-source overlap matrix: for every source pair, how many RARE
    * shingles (present in ≤4 sources) they share — the "how much does
    * corpus A duplicate corpus B" dashboard a training-mix owner reads
    * before weighting sources. The rarity cap is also the scale bound:
    * each shingle fans out to ≤ C(4,2) pairs in the self-join, so one
    * boilerplate shingle shared by every source can't go quadratic. */
  def overlapMatrix(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // hashed shingles: every shuffle below carries 8-byte longs, never
    // the shingle strings. Counting shared HASHES can differ from shared
    // strings only on a 64-bit collision among one pair's shared
    // shingles — the same vanishing-probability contract the q101
    // contamination oracle already accepts.
    val ss = DedupOps.hashedShingles(d, 5)
      .join(d.select(col("doc_id"), col("source")), "doc_id")
      .select(col("source"), col("sh_h")).distinct()
      .localCheckpoint(false) // feeds both the df count and the pair join
    val rare = ss.join(
        ss.groupBy(col("sh_h")).agg(count(lit(1)).as("ns"))
          .filter(col("ns") <= 4).select(col("sh_h")), "sh_h")
      .localCheckpoint(false) // both sides of the pair self-join read it
    rare.as("x").join(rare.as("y"),
        col("x.sh_h") === col("y.sh_h") &&
          col("x.source") < col("y.source"))
      .groupBy(col("x.source").as("src_a"), col("y.source").as("src_b"))
      .agg(count(lit(1)).as("shared_shingles"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val overlapMatrixSql =
    """WITH toks AS (
      |  SELECT doc_id, source, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT source, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i) WHERE len(t) >= 5
      |), freq AS (
      |  SELECT shingle, COUNT(*) AS ns FROM sh GROUP BY 1
      |), rare AS (
      |  SELECT s.source, s.shingle FROM sh s
      |  JOIN freq USING (shingle) WHERE ns <= 4
      |)
      |SELECT x.source AS src_a, y.source AS src_b,
      |  CAST(COUNT(*) AS BIGINT) AS shared_shingles
      |FROM rare x JOIN rare y
      |  ON x.shingle = y.shingle AND x.source < y.source
      |GROUP BY 1, 2
      |ORDER BY 1, 2""".stripMargin

  /** Chunk-level dedup (the C4/RefinedWeb line-dedup step lifted to
    * token windows): split every document into non-overlapping 16-token
    * chunks and mark each repeated chunk occurrence, keeping the first
    * by (doc_id, chunk_idx). At corpus scale the partition key would be
    * the chunk HASH (the hashed-shingle recipe); the oracle-checkable
    * form keys the string. */
  def chunkDedup(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ch = graft.ops.TextOps.chunked(docs(spark, dir), size = 16, overlap = 0)
    val w = Window.partitionBy(col("chunk_text"))
      .orderBy(col("doc_id"), col("chunk_idx"))
    ch.withColumn("is_dup", row_number().over(w) > 1)
      .select(col("doc_id"), col("chunk_idx"), col("is_dup"),
        col("n_chunk_tokens"))
      .orderBy(col("doc_id"), col("chunk_idx"))
  }

  private val chunkDedupSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), ch AS (
      |  SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |    array_to_string(t[k * 16 + 1 : least(k * 16 + 16, len(t))], ' ')
      |      AS chunk_text,
      |    CAST(least(k * 16 + 16, len(t)) - k * 16 AS BIGINT)
      |      AS n_chunk_tokens
      |  FROM toks,
      |    unnest(range(0, CAST(ceil(len(t) / 16.0) AS BIGINT))) AS u(k)
      |)
      |SELECT doc_id, chunk_idx,
      |  row_number() OVER (PARTITION BY chunk_text
      |    ORDER BY doc_id, chunk_idx) > 1 AS is_dup,
      |  n_chunk_tokens
      |FROM ch
      |ORDER BY doc_id, chunk_idx""".stripMargin

  /** Containment near-dup pairs: |A∩B| / min(|A|,|B|) ≥ 0.8 — catches
    * quote-expansion and subset documents that symmetric Jaccard misses
    * (a doc fully contained in a 3× larger one has Jaccard ≈ 0.33 but
    * containment 1.0). Same df-capped candidate join and full-set verify
    * as q61. */
  def containmentPairs(spark: SparkSession, dir: String): DataFrame =
    DedupOps.containmentPairs(docs(spark, dir), n = 5, threshold = 0.8)
      .orderBy(col("doc_a"), col("doc_b"))

  private val containmentSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5
      |), cold AS (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  JOIN cold ON a.shingle = cold.shingle
      |), card AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |)
      |SELECT doc_a, doc_b,
      |  CAST(c AS DOUBLE) / least(x.n_sh, y.n_sh) AS containment
      |FROM common
      |JOIN cand USING (doc_a, doc_b)
      |JOIN card x ON doc_a = x.doc_id
      |JOIN card y ON doc_b = y.doc_id
      |WHERE CAST(c AS DOUBLE) / least(x.n_sh, y.n_sh) >= 0.8
      |ORDER BY doc_a, doc_b""".stripMargin

  /** Exact duplicated-substring spans (Lee et al. 2022's exact-substring
    * dedup as a shingle-chain join). */
  def dupSpans(spark: SparkSession, dir: String): DataFrame =
    DedupOps.dupSpans(docs(spark, dir), n = 6, maxDf = 8, minRun = 3)
      .orderBy(col("doc_a"), col("doc_b"), col("a_start"), col("b_start"))

  private val dupSpansSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh0 AS (
      |  SELECT doc_id, CAST(i AS BIGINT) AS pos,
      |    array_to_string(t[i:i+5], ' ') AS s
      |  FROM toks, unnest(range(1, len(t) - 4)) AS u(i) WHERE len(t) >= 6
      |), df AS (
      |  SELECT s FROM sh0 GROUP BY s HAVING COUNT(*) <= 8
      |), sh AS (SELECT sh0.* FROM sh0 JOIN df USING (s)
      |), m AS (
      |  SELECT x.doc_id AS a, y.doc_id AS b, x.pos AS pa, y.pos AS pb
      |  FROM sh x JOIN sh y ON x.s = y.s AND x.doc_id < y.doc_id
      |), isl AS (
      |  SELECT a, b, pa, pb,
      |    pa - row_number() OVER (PARTITION BY a, b, pa - pb
      |      ORDER BY pa) AS g
      |  FROM m
      |)
      |SELECT a AS doc_a, b AS doc_b, MIN(pa) AS a_start,
      |  MIN(pb) AS b_start, CAST(COUNT(*) + 5 AS BIGINT) AS span_tokens
      |FROM isl GROUP BY a, b, pa - pb, g HAVING COUNT(*) >= 3
      |ORDER BY doc_a, doc_b, a_start, b_start""".stripMargin

  /** KMV-sketch Jaccard between per-source token vocabularies
    * ([[graft.ops.StatsOps.kmvJaccard]]) — the sketch twin of q124's
    * exact overlap matrix: raw vocabularies never meet, only k-long
    * signatures do. */
  def kmvVocabJaccard(spark: SparkSession, dir: String): DataFrame = {
    val toks = graft.ops.TextOps.exploded(docs(spark, dir))
      .join(docs(spark, dir).select(col("doc_id"), col("source")), "doc_id")
    graft.ops.StatsOps.kmvJaccard(toks, col("source"), col("tok"), k = 256)
      .orderBy(col("grp_a"), col("grp_b"))
  }

  /** Cross-source near-duplicate flow matrix: the exact 5-gram-Jaccard
    * pair graph (q61's machinery, threshold 0.5) rolled up by the
    * UNDIRECTED source pair of each edge. This is the provenance audit
    * run before mixing crawl snapshots: a heavy off-diagonal cell means
    * two "independent" sources are substantially the same corpus and
    * mixing weights must be corrected. The pair graph is df-capped as
    * in q61, so the rollup adds only a doc→source broadcast join and a
    * ~sources²-cell aggregate; `max` (order-independent) is the one
    * float column. */
  def crossSourceDup(spark: SparkSession, dir: String): DataFrame = {
    val src = docs(spark, dir).select(col("doc_id"), col("source"))
    DedupOps.jaccardPairs(docs(spark, dir), n = 5, threshold = 0.5)
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")),
        "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")),
        "doc_b")
      .select(least(col("sa"), col("sb")).as("src_a"),
        greatest(col("sa"), col("sb")).as("src_b"), col("jaccard"))
      .groupBy(col("src_a"), col("src_b"))
      .agg(count(lit(1)).as("n_pairs"), max(col("jaccard")).as("max_jac"))
      .orderBy(col("src_a"), col("src_b"))
  }

  private val crossSourceDupSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), sh AS (
      |  SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS shingle
      |  FROM toks, unnest(range(1, len(t) - 3)) AS u(i)
      |  WHERE len(t) >= 5
      |), cold AS (
      |  SELECT shingle FROM sh GROUP BY shingle HAVING COUNT(*) <= 1000
      |), cand AS (
      |  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  JOIN cold ON a.shingle = cold.shingle
      |), card AS (
      |  SELECT doc_id, COUNT(*) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, COUNT(*) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b,
      |    CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) AS jaccard
      |  FROM common
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN card x ON doc_a = x.doc_id
      |  JOIN card y ON doc_b = y.doc_id
      |  WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= 0.5
      |)
      |SELECT least(da.source, db.source) AS src_a,
      |  greatest(da.source, db.source) AS src_b,
      |  CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  MAX(jaccard) AS max_jac
      |FROM pairs
      |JOIN documents da ON da.doc_id = pairs.doc_a
      |JOIN documents db ON db.doc_id = pairs.doc_b
      |GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  /** Dedup storage-savings report: per source, how many documents (and
    * how many characters) near-dup dedup would drop — every doc that is
    * NOT its 0.5-Jaccard cluster representative is redundant. The
    * business-facing "what does dedup buy us" number, exact integers on
    * top of q65's shared connected-components machinery; the rollup
    * itself is one doc-keyed join + a sources-sized aggregate. */
  def dedupSavings(spark: SparkSession, dir: String): DataFrame =
    CorpusFrames.clusters(spark, dir)
      .join(docs(spark, dir)
        .select(col("doc_id"), col("source"), col("n_chars")), "doc_id")
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"),
        sum(when(col("cluster_rep") =!= col("doc_id"), 1L).otherwise(0L))
          .cast("long").as("n_redundant"),
        sum(col("n_chars")).cast("long").as("chars_total"),
        sum(when(col("cluster_rep") =!= col("doc_id"), col("n_chars"))
          .otherwise(0L)).cast("long").as("chars_redundant"))
      .orderBy(col("source"))

  private val dedupSavingsSql =
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |)
       |SELECT d.source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |  CAST(SUM(CASE WHEN rep.cluster_rep <> d.doc_id THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_redundant,
       |  CAST(SUM(d.n_chars) AS BIGINT) AS chars_total,
       |  CAST(SUM(CASE WHEN rep.cluster_rep <> d.doc_id THEN d.n_chars
       |    ELSE 0 END) AS BIGINT) AS chars_redundant
       |FROM documents d JOIN rep ON rep.doc_id = d.doc_id
       |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- exact-dup cluster size histogram --------------------------------

  /** NEAR-dup CLUSTER-SIZE histogram: how many exact-Jaccard copy
    * families of each size the corpus carries, and what share of all
    * documents each size class holds — the "is duplication a few huge
    * families or a long tail of pairs" readout that decides whether
    * dedup should target heads or run exhaustively (q65 lists the
    * clusters, q289 prices the savings; this shows the SHAPE). Two
    * aggregates on top of the shared connected-component machinery —
    * cluster-keyed, then size-domain-bounded — exact counts, one
    * mirrored division per row. */
  def dupSizeHistogram(spark: SparkSession, dir: String): DataFrame = {
    val total = docs(spark, dir).agg(count(lit(1)).as("n_docs"))
    CorpusFrames.clusters(spark, dir)
      .groupBy(col("cluster_rep")).agg(count(lit(1)).as("size"))
      .groupBy(col("size")).agg(count(lit(1)).as("n_clusters"))
      .crossJoin(broadcast(total))
      .select(col("size"), col("n_clusters"),
        (col("size") * col("n_clusters")).as("docs_in_class"),
        ((col("size") * col("n_clusters")).cast("double") /
          col("n_docs").cast("double")).as("share_of_corpus"))
      .orderBy(col("size"))
  }

  private val dupSizeHistogramSql =
    s"""WITH RECURSIVE $reachCtes, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), t AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |c AS (
       |  SELECT cluster_rep, CAST(COUNT(*) AS BIGINT) AS size
       |  FROM rep GROUP BY 1
       |), s AS (
       |  SELECT size, CAST(COUNT(*) AS BIGINT) AS n_clusters
       |  FROM c GROUP BY 1
       |)
       |SELECT size, n_clusters, size * n_clusters AS docs_in_class,
       |  CAST(size * n_clusters AS DOUBLE) / CAST(n_docs AS DOUBLE)
       |    AS share_of_corpus
       |FROM s, t
       |ORDER BY size""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q471_dup_size_histogram", dupSizeHistogram,
      Some(dupSizeHistogramSql),
      "near-dup cluster-size histogram with corpus share per size " +
        "class — the head-vs-tail duplication shape over the shared " +
        "connected-component machinery (exact counts)"),
    Q("q289_dedup_savings", dedupSavings, Some(dedupSavingsSql),
      "per-source near-dup storage savings: docs/chars that are not " +
        "their cluster representative (exact integers, shared CC machinery)"),
    Q("q281_cross_source_dup", crossSourceDup, Some(crossSourceDupSql),
      "cross-source near-dup flow matrix: exact-Jaccard pair graph " +
        "rolled up by undirected source pair (corpus provenance audit)"),
    Q("q214_kmv_jaccard", kmvVocabJaccard, None,
      "KMV bottom-k sketch Jaccard between source vocabularies " +
        "(mergeable union sketch; error-bound spec vs exact)"),
    Q("q205_dup_spans", dupSpans, Some(dupSpansSql),
      "exact duplicated-substring spans: df-capped positioned-shingle " +
        "join chained islands-style into maximal cross-doc token spans " +
        "(Lee et al. exact-substring dedup, suffix-array-free)"),
    Q("q137_chunk_dedup", chunkDedup, Some(chunkDedupSql),
      "chunk-level dedup: repeated 16-token windows flagged, first " +
        "occurrence kept"),
    Q("q138_containment", containmentPairs, Some(containmentSql),
      "containment near-dups |A∩B|/min(|A|,|B|) — subset docs Jaccard " +
        "misses"),
    Q("q124_overlap_matrix", overlapMatrix, Some(overlapMatrixSql),
      "cross-source rare-shingle overlap matrix (pair fan-out capped by " +
        "the rarity filter)"),
    Q("q60_exact_dedup", exact, Some(exactSql),
      "exact dedup groups via sha256 hash-groupBy"),
    Q("q61_jaccard_pairs", jaccard, Some(jaccardSql),
      "exact 5-gram Jaccard near-dup pairs via shingle join"),
    Q("q163_jaccard_prefix", jaccardPrefix, Some(jaccardSql),
      "same exact pairs via PPJoin prefix filtering (lossless rarest-" +
        "first candidate pruning, hashed-shingle shuffle)"),
    Q("q62_minhash_lsh", minhashLsh, None,
      "MinHash(64)+LSH(16x4) near-dup pairs, exact-verified (spec-checked)"),
    Q("q63_simhash", simhashSigs, None,
      "64-bit SimHash signatures (spec-checked)"),
    Q("q156_simhash_pairs",
      (s, d) => DedupOps.simhashPairs(docs(s, d))
        .orderBy(col("doc_a"), col("doc_b")),
      None,
      "SimHash near-dup pairs: 4x16-bit sub-band collision + exact " +
        "bit_count hamming verify (spec-checked vs brute force)"),
    Q("q65_dedup_clusters", clusters, Some(clustersSql),
      "connected-component dup clusters via min-label propagation (oracle: recursive CTE)"),
    Q("q395_cluster_purity", clusterPurity, Some(clusterPuritySql),
      "source purity of near-dup clusters: single- vs multi-source dup " +
        "families — syndication at cluster granularity"),
    Q("q266_cluster_size_hist", clusterSizeHist, Some(clusterSizeHistSql),
      "near-dup cluster size histogram (dedup observability; rolls q65's " +
        "components into two combinable aggregates)"),
    Q("q66_corpus_clean", corpusClean, Some(corpusCleanSql),
      "composed pipeline: quality gate + exact keeper + near-dup cluster rep"),
    Q("q441_corpus_publish", corpusPublish, Some(corpusPublishSql),
      "END-TO-END corpus publish: clean (τ=0.5 dedup) → leakage-safe " +
        "split (τ=0.3) → atomic versioned group — manifest read back " +
        "from the PUBLISHED tables, oracle covers the whole pipeline"),
    Q("q457_split_balance", splitBalance, Some(splitBalanceSql),
      "post-split covariate parity: TV distance of the language mix " +
        "between each leakage-safe split pair — one exact " +
        "cross-multiplied integer sum + one mirrored division per pair"),
    Q("q447_corpus_append", corpusAppend, Some(corpusPublishSql),
      "INCREMENTAL corpus admission: publish 80%, appendBatch the rest " +
        "as one O(batch) delta transaction — same oracle as q441, so " +
        "DuckDB certifies batch-admission ≡ full republish end-to-end"),
    Q("q67_dup_stats", dupStats, Some(dupStatsSql),
      "per-source duplicate-rate observability rollup"),
    Q("q100_leakage_safe_split", splits, Some(splitsSql),
      "train/val/test split keyed on near-dup cluster rep (no split leakage)"),
    Q("q127_contamination_bloom",
      (s, d) => {
        val dd = docs(s, d)
        DedupOps.contaminationBloom(
            dd.filter(col("source") =!= "src0"),
            dd.filter(col("source") === "src0"))
          .orderBy(col("doc_id"), col("eval_id"))
      },
      Some(contaminationSql),
      "q101's contamination scan behind a broadcast Bloom prefilter — " +
        "identical result (same oracle), corpus postings never shuffle " +
        "unless they might match"),
    Q("q101_contamination", contamination, Some(contaminationSql),
      "benchmark-contamination scan: rare-shingle overlap vs an eval set"),
    Q("q113_incremental_dedup", incremental, Some(incrementalSql),
      "incremental admission: batch vetted against a clean corpus with " +
        "no corpus×corpus pairing (exact + near tiers)"))
}
