package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.Det._
import graft.ops.{DedupOps, GlobalRank, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-14/15 COMPOSITIONS: each query chains machinery from several
  * already-proven operator families end-to-end — the staged reports a
  * real curation / analytics pipeline runs, not new scalar statistics
  * (the r13 verdict's "breadth continues into compositions" direction).
  * Every entry is class-A oracle-checked: the DuckDB statement replays
  * the WHOLE chain (including the recursive-CTE connected components
  * where near-dup clustering participates), so the driver hash-gates
  * the composition, not just its legs.
  *
  * Scale discipline carried over from the component families:
  * single-explode fused token profiles (two-stage exact aggregation, no
  * Expand), banded df-capped near-dup candidates (never corpus×corpus),
  * GlobalRank range-shuffle ranks instead of single-partition windows
  * on per-document frames, quota algebra only over stratum-sized
  * aggregates, and trailing-window statistics on bounded calendar
  * spines.
  */
object CompositionQueries {

  private def docs(spark: SparkSession, dir: String) =
    Catalog.load(spark, dir, "documents")

  private val Langs = Seq("en", "es", "de", "fr", "zh")
  private def stopsSql(l: String) =
    TextOps.stopwords(l).map(s => s"'$s'").mkString(", ")

  /** Fused per-doc text profile: ONE explode, two-stage EXACT
    * aggregation (per-(doc,tok) counts, then per-doc sums) so token
    * total, distinct count, English stop count and the five language
    * votes all come out of a single shuffle with combinable aggregates
    * — no Expand rewrite (countDistinct mixed with other aggs) and no
    * second corpus scan. The q52 quality score and the q53 stopword
    * argmax are then per-row arithmetic over exact counts, bit-identical
    * on any engine. */
  private def docProfile(d: DataFrame): DataFrame = {
    val tf = TextOps.exploded(d)
      .groupBy(col("doc_id"), col("tok"))
      .agg(count(lit(1)).as("cnt"))
    val votes = Langs.map { l =>
      sum(when(col("tok").isInCollection(TextOps.stopwords(l)), col("cnt"))
        .otherwise(0L)).as(s"c_$l")
    }
    val aggs = Seq(
      count(lit(1)).as("n_distinct"),
      sum(when(col("tok").isInCollection(TextOps.stopwords("en")),
        col("cnt")).otherwise(0L)).as("n_stop")) ++ votes
    val prof = tf.groupBy(col("doc_id"))
      .agg(sum(col("cnt")).as("n_tokens"), aggs: _*)
    val best = Langs.map(l => col(s"c_$l")).reduce((a, b) => greatest(a, b))
    val pred = Langs.foldRight(lit("und"): Column) { (l, rest) =>
      when(col(s"c_$l") === best && best > 0, l).otherwise(rest)
    }
    prof.select(col("doc_id"), col("n_tokens"),
      (least(col("n_tokens").cast("double") / 100, lit(1.0)) * 0.4 +
        (col("n_stop").cast("double") / col("n_tokens")) * 0.3 +
        (col("n_distinct").cast("double") / col("n_tokens")) * 0.3)
        .as("quality"),
      pred.as("pred_lang"))
  }

  // ---- q523: the curation funnel report ------------------------------

  /** End-to-end curation FUNNEL per (lang, source): corpus in →
    * language-confirmed (q53 stopword argmax agrees with the declared
    * label — the gate a multilingual pipeline applies before trusting
    * labels) → quality-passed (q52 score ≥ 0.5) → near-dup-deduplicated
    * (q65's exact 5-gram Jaccard ≥ 0.5 components; the kept doc is each
    * component's min-id member AMONG the quality survivors, so dedup
    * never resurrects a filtered doc), plus the token mass that survives
    * the whole chain. Stage counts are monotone non-increasing by
    * construction — the observability row a training-data pipeline reads
    * before committing a mixture (CompositionSpec pins monotonicity).
    *
    * Cost shape: one explode-aggregate for the profile ([[docProfile]]),
    * the q65 banded candidate join for components (df-capped postings —
    * never corpus×corpus), one doc-keyed join of the two, one window
    * over cluster partitions (component-sized frames), one final
    * combinable rollup on (lang, source). */
  /** The FRESH doc-grain builder — doc_id, lang, source, n_tokens,
    * quality, flags, cluster_rep: one fused profile pass joined to the
    * memoized component assignment. PlanSpec asserts the single-explode
    * / no-Expand shape HERE (the memoized handle below plans as a bare
    * `Scan ExistingRDD`, where a reintroduced second token pass would
    * be invisible). */
  private[graft] def curationDocGrainFresh(spark: SparkSession,
      dir: String): DataFrame = {
    val d = docs(spark, dir)
    val prof = docProfile(d)
    val clusters = CorpusFrames.clusters(spark, dir)
    d.select(col("doc_id"), col("lang"), col("source"))
      .join(prof, Seq("doc_id"), "left_outer")
      .withColumn("lang_ok",
        coalesce(col("pred_lang") === col("lang"), lit(false)))
      .withColumn("q_ok", col("lang_ok") && col("quality") >= 0.5)
      .withColumn("n_tokens", coalesce(col("n_tokens"), lit(0L)))
      .join(clusters, "doc_id")
  }

  /** Session-memoized curation grain — q523 and q529 both consume it,
    * and each was paying the explode-profile pass per run.
    * [[SessionFrames]] localCheckpoints the frame (same staleness
    * contract as [[CorpusFrames.clusters]]; Bench pre-warms it), so
    * consumers must NOT re-checkpoint. */
  private[graft] def curationDocGrain(spark: SparkSession,
      dir: String): DataFrame =
    SessionFrames.cached("curation_grain", dir, spark)(
      curationDocGrainFresh(spark, dir))

  def curationFunnel(spark: SparkSession, dir: String): DataFrame = {
    // per-component survivor rep via groupBy + join-back, NOT a window
    // over cluster_rep: a giant component (boilerplate family) would put
    // its whole membership through one window task's sort, while the
    // aggregate form pre-combines map-side and the join shuffles the
    // same key — identical exchange count, no skew cliff. The doc-grain
    // frame is consumed twice (rep aggregate + join) and by TWO queries
    // (q523, q529) — the session memo's checkpoint covers both, so the
    // explode/profile subtree can never replan per consumer (PlanSpec
    // pins one Generate on the fresh builder).
    val withClu = curationDocGrain(spark, dir)
    val survRep = withClu.filter(col("q_ok"))
      .groupBy(col("cluster_rep"))
      .agg(min(col("doc_id")).as("surv_rep"))
    withClu.join(survRep, Seq("cluster_rep"), "left_outer")
      .withColumn("kept", col("q_ok") && col("doc_id") === col("surv_rep"))
      .groupBy(col("lang"), col("source"))
      .agg(count(lit(1)).as("docs_in"),
        count(when(col("lang_ok"), 1)).as("n_lang_ok"),
        count(when(col("q_ok"), 1)).as("n_quality_ok"),
        count(when(col("kept"), 1)).as("n_kept"),
        sum(when(col("kept"), col("n_tokens")).otherwise(0L))
          .as("tokens_kept"))
      .orderBy(col("lang"), col("source"))
  }

  /** Shared oracle CTE: the fused per-doc profile (token total, quality,
    * predicted language) — the SQL twin of [[docProfile]]. */
  private val profCte = {
    val voteCols = Langs.map(l =>
      s"SUM(CASE WHEN tok IN (${stopsSql(l)}) THEN cnt ELSE 0 END) AS c_$l")
      .mkString(",\n    ")
    val best = s"greatest(${Langs.map(l => s"c_$l").mkString(", ")})"
    val pred = Langs.map(l => s"WHEN c_$l = $best AND $best > 0 THEN '$l'")
      .mkString("CASE ", " ", " ELSE 'und' END")
    s"""tf AS (
       |  SELECT doc_id, tok, COUNT(*) AS cnt
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |        FROM documents)
       |  GROUP BY 1, 2
       |), prof AS (
       |  SELECT doc_id, SUM(cnt) AS n_tokens, COUNT(*) AS n_distinct,
       |    SUM(CASE WHEN tok IN (${stopsSql("en")}) THEN cnt ELSE 0 END)
       |      AS n_stop,
       |    $voteCols
       |  FROM tf GROUP BY 1
       |), scored AS (
       |  SELECT doc_id, n_tokens,
       |    least(CAST(n_tokens AS DOUBLE) / 100, 1.0) * 0.4
       |      + (CAST(n_stop AS DOUBLE) / n_tokens) * 0.3
       |      + (CAST(n_distinct AS DOUBLE) / n_tokens) * 0.3 AS quality,
       |    $pred AS pred_lang
       |  FROM prof
       |)""".stripMargin
  }

  private val curationFunnelSql =
    s"""WITH RECURSIVE ${DedupQueries.reachCtes}, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), $profCte, flags AS (
       |  SELECT d.doc_id, d.lang, d.source,
       |    COALESCE(s.pred_lang = d.lang, FALSE) AS lang_ok,
       |    COALESCE(s.pred_lang = d.lang AND s.quality >= 0.5, FALSE)
       |      AS q_ok,
       |    COALESCE(s.n_tokens, 0) AS n_tokens
       |  FROM documents d LEFT JOIN scored s USING (doc_id)
       |), surv AS (
       |  SELECT f.*,
       |    MIN(CASE WHEN f.q_ok THEN f.doc_id END)
       |      OVER (PARTITION BY r.cluster_rep) AS surv_rep
       |  FROM flags f JOIN rep r USING (doc_id)
       |)
       |SELECT lang, source, CAST(COUNT(*) AS BIGINT) AS docs_in,
       |  CAST(COUNT(*) FILTER (lang_ok) AS BIGINT) AS n_lang_ok,
       |  CAST(COUNT(*) FILTER (q_ok) AS BIGINT) AS n_quality_ok,
       |  CAST(COUNT(*) FILTER (q_ok AND doc_id = surv_rep) AS BIGINT)
       |    AS n_kept,
       |  CAST(COALESCE(SUM(CASE WHEN q_ok AND doc_id = surv_rep
       |    THEN n_tokens ELSE 0 END), 0) AS BIGINT) AS tokens_kept
       |FROM surv
       |GROUP BY 1, 2
       |ORDER BY lang, source""".stripMargin

  // ---- q524: token-budgeted temperature mixture -----------------------

  /** Token budget for the q524 mixture — sized so it BITES at the
    * fixture scale (per-language token mass is 3.5k–12k at sf0.01). */
  private val MixBudgetTokens = 8000L

  /** Token-BUDGETED temperature mixture: q186's α = 0.5 temperature
    * reweighting applied to TOKEN mass (weight = floor(sqrt(lang
    * tokens)·10⁶)), q120's largest-remainder apportionment of a TOKEN
    * budget across languages, then q125's greedy prefix admission
    * INSIDE each language in the deterministic multiplicative-hash
    * order — i.e. the mixture composer a token-metered (not
    * doc-metered) pre-training run actually needs. A language's take
    * stops at the last doc whose cumulative tokens fit its quota, so
    * tokens_taken ≤ quota_tokens always, and a language with less mass
    * than quota contributes everything (deliberately under budget —
    * stealing the shortfall would distort the declared mixture).
    *
    * Scale shape: the quota algebra runs on the |langs|-row aggregate
    * (WindowSweep-allowlisted bounded frame); the per-document
    * rank+prefix-sum is [[GlobalRank.withRunningSum]] over the total
    * order (lang, hash, id) — one range shuffle, no single-partition
    * window and no per-stratum window task that would hold 1/|langs|
    * of a 100 TB corpus — with each language's in-stratum cumsum
    * recovered by subtracting the preceding languages' token mass
    * (broadcast |langs|-row offsets; integer sums reassociate freely
    * so this is bit-identical to the per-language window form). */
  def tokenBudgetedMixture(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    val d = docs(spark, dir).filter(col("lang").isNotNull)
      .select(col("doc_id"), col("lang"),
        size(split(col("text"), " ", -1)).cast("long").as("n_tokens"))
    val perLang = d.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
      .withColumn("w",
        floor(sqrt(col("lang_tokens").cast("double")) * 1e6).cast("long"))
    val all = Window.partitionBy(lit(1))
    val quotas = perLang
      .withColumn("tot", sum(col("w")).over(all))
      .withColumn("base", expr(s"($MixBudgetTokens * w) div tot"))
      .withColumn("rem", expr(s"($MixBudgetTokens * w) % tot"))
      .withColumn("leftover",
        lit(MixBudgetTokens) - sum(col("base")).over(all))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("lang")))
        .cast("long"))
      .withColumn("lang_offset",
        coalesce(sum(col("lang_tokens")).over(
          Window.partitionBy(lit(1)).orderBy(col("lang"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("w"), col("lang_offset"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("quota_tokens"))
    val ranked = GlobalRank.withRunningSum(
      d.withColumn("hkey",
        pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p))),
      Seq(col("lang"), col("hkey"), col("doc_id")),
      col("n_tokens"), "cum_all")
    ranked.join(broadcast(quotas), "lang")
      .withColumn("taken",
        col("cum_all") - col("lang_offset") <= col("quota_tokens"))
      .groupBy(col("lang"))
      .agg(min(col("w")).as("w"),
        min(col("quota_tokens")).as("quota_tokens"),
        count(when(col("taken"), 1)).as("docs_taken"),
        sum(when(col("taken"), col("n_tokens")).otherwise(0L))
          .as("tokens_taken"))
      .orderBy(col("lang"))
  }

  private val tokenBudgetedMixtureSql =
    s"""WITH d AS (
       |  SELECT doc_id, lang,
       |    CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tokens
       |  FROM documents WHERE lang IS NOT NULL
       |), s AS (
       |  SELECT lang, SUM(n_tokens) AS lang_tokens,
       |    CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) * 1e6) AS BIGINT)
       |      AS w
       |  FROM d GROUP BY 1
       |), q1 AS (
       |  SELECT lang, w, SUM(w) OVER () AS tot FROM s
       |), q2 AS (
       |  SELECT lang, w, ($MixBudgetTokens * w) // tot AS base,
       |    ($MixBudgetTokens * w) % tot AS rem
       |  FROM q1
       |), q3 AS (
       |  SELECT lang, w, base,
       |    $MixBudgetTokens - SUM(base) OVER () AS leftover,
       |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
       |  FROM q2
       |), quotas AS (
       |  SELECT lang, w,
       |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
       |      AS quota_tokens
       |  FROM q3
       |), ranked AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY ((((doc_id % 1000000007) + 1000000007) % 1000000007)
       |                * 2654435761) % 1000000007, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_in_lang
       |  FROM d
       |)
       |SELECT q.lang, q.w, q.quota_tokens,
       |  CAST(COUNT(*) FILTER (r.cum_in_lang <= q.quota_tokens) AS BIGINT)
       |    AS docs_taken,
       |  CAST(COALESCE(SUM(r.n_tokens)
       |    FILTER (r.cum_in_lang <= q.quota_tokens), 0) AS BIGINT)
       |    AS tokens_taken
       |FROM ranked r JOIN quotas q USING (lang)
       |GROUP BY q.lang, q.w, q.quota_tokens
       |ORDER BY q.lang""".stripMargin

  // ---- q525: supplier risk scorecard ----------------------------------

  /** Supplier risk SCORECARD: per-supplier exact metrics from one
    * lineitem rollup (decimal-exact net revenue, return-line rate,
    * distinct-part breadth), account balance from the supplier dim,
    * then WITHIN-NATION tercile grading (ntile(3) over fully
    * deterministic orders — rank-based, so no cross-engine variance
    * arithmetic is needed) and a composite risk grade: a point each for
    * bottom-tercile revenue, top-tercile return rate, bottom-tercile
    * account balance. The relational composition twin of the curation
    * funnel: join + combinable rollup + partitioned window + case
    * grading in one report.
    *
    * Scale shape: lineitem collapses to the supplier grain FIRST
    * (partial-agg combinable; the join carries |suppliers| rows, never
    * fact rows), dims broadcast, the grading windows partition by
    * nation over the supplier-grain frame. */
  def supplierRiskScorecard(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val sup = Catalog.load(spark, dir, "supplier")
    val nat = Catalog.load(spark, dir, "nation")
    val m = li.groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
          .as("revenue"),
        count(lit(1)).as("n_lines"),
        count(when(col("l_returnflag") === "R", 1)).as("n_returned"),
        countDistinct(col("l_partkey")).as("n_parts"))
      .withColumn("ret_rate",
        col("n_returned").cast("double") / col("n_lines"))
    val j = sup.join(broadcast(nat),
        sup("s_nationkey") === nat("n_nationkey"))
      .join(m, sup("s_suppkey") === m("l_suppkey"))
    val byNation = Window.partitionBy(col("n_name"))
    val graded = j
      .withColumn("rev_t", ntile(3).over(
        byNation.orderBy(col("revenue"), col("s_suppkey"))))
      .withColumn("ret_t", ntile(3).over(
        byNation.orderBy(col("ret_rate"), col("s_suppkey"))))
      .withColumn("bal_t", ntile(3).over(
        byNation.orderBy(col("s_acctbal"), col("s_suppkey"))))
      .withColumn("risk_points",
        when(col("rev_t") === 1, 1).otherwise(0) +
          when(col("ret_t") === 3, 1).otherwise(0) +
          when(col("bal_t") === 1, 1).otherwise(0))
    graded.select(col("s_suppkey"), col("s_name"),
        col("n_name").as("nation"), col("revenue"), col("ret_rate"),
        col("n_parts"), col("risk_points").cast("int").as("risk_points"),
        when(col("risk_points") === 3, "high")
          .when(col("risk_points") === 2, "elevated")
          .when(col("risk_points") === 1, "watch")
          .otherwise("low").as("grade"))
      .orderBy(col("s_suppkey"))
  }

  private val supplierRiskScorecardSql =
    s"""WITH m AS (
       |  SELECT l_suppkey,
       |    ${sqlSum("l_extendedprice * (1.0 - l_discount)")} AS revenue,
       |    COUNT(*) AS n_lines,
       |    COUNT(*) FILTER (l_returnflag = 'R') AS n_returned,
       |    CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS n_parts
       |  FROM lineitem GROUP BY 1
       |), g AS (
       |  SELECT s.s_suppkey, s.s_name, n.n_name AS nation, m.revenue,
       |    CAST(m.n_returned AS DOUBLE) / m.n_lines AS ret_rate,
       |    m.n_parts,
       |    NTILE(3) OVER (PARTITION BY n.n_name
       |      ORDER BY m.revenue, s.s_suppkey) AS rev_t,
       |    NTILE(3) OVER (PARTITION BY n.n_name
       |      ORDER BY CAST(m.n_returned AS DOUBLE) / m.n_lines,
       |        s.s_suppkey) AS ret_t,
       |    NTILE(3) OVER (PARTITION BY n.n_name
       |      ORDER BY s.s_acctbal, s.s_suppkey) AS bal_t
       |  FROM supplier s
       |  JOIN nation n ON s.s_nationkey = n.n_nationkey
       |  JOIN m ON s.s_suppkey = m.l_suppkey
       |), p AS (
       |  SELECT *,
       |    (CASE WHEN rev_t = 1 THEN 1 ELSE 0 END
       |      + CASE WHEN ret_t = 3 THEN 1 ELSE 0 END
       |      + CASE WHEN bal_t = 1 THEN 1 ELSE 0 END) AS pts
       |  FROM g
       |)
       |SELECT s_suppkey, s_name, nation, revenue, ret_rate, n_parts,
       |  CAST(pts AS INT) AS risk_points,
       |  CASE WHEN pts = 3 THEN 'high' WHEN pts = 2 THEN 'elevated'
       |       WHEN pts = 1 THEN 'watch' ELSE 'low' END AS grade
       |FROM p
       |ORDER BY s_suppkey""".stripMargin

  // ---- q526: robust anomaly drilldown ---------------------------------

  /** Trailing-median anomaly DRILLDOWN over the events value stream:
    * the daily value spine (decimal-exact totals), each day scored
    * against the EXACT median of its trailing 7 full days (the robust
    * detector — a mean/σ window is distorted by the very spikes it
    * hunts; the exact middle order statistic of 7 values involves no
    * float accumulation at all, so it is bit-identical on any engine),
    * then the attribution leg: the top event_type by value share on
    * every scored day. q283 flags days against a GLOBAL mean; this is
    * its composed, windowed, drilled-in sibling — flag AND who did it.
    *
    * Scale shape: both legs collapse events to bounded frames first
    * (day spine; day×type cells) with combinable aggregates; the
    * trailing-median join is spine×7 (a century is < 40k rows), and
    * the top-type rank partitions by day over the |types|-sized
    * per-day frame. */
  def anomalyDrilldown(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    // ONE events pass feeds everything: the (day, type) cells carry the
    // exact decimal partial sums, and the day spine is their rollup —
    // decimal addition is exact and associative, so the rolled-up total
    // is bit-identical to a direct per-day dsum. The cells frame is
    // bounded (days × types) and consumed three ways (spine probe,
    // spine broadcast, top-type leg), so it is checkpointed; without
    // that each consumer would replan its own events scan (and the
    // spine's two join sides use different exchange kinds, so
    // ReusedExchange could never fire).
    val cells = e
      .groupBy(expr("unix_micros(ts) div 86400000000").as("day"),
        col("event_type"))
      .agg(sum(col("value").cast(graft.ops.Det.Dec)).as("tdec"),
        count(lit(1)).as("n"))
      .localCheckpoint(false)
    val daily = cells.groupBy(col("day"))
      .agg(sum(col("tdec")).cast("double").as("total"),
        sum(col("n")).as("n_events"))
    val spine = daily.select(col("day").as("pday"), col("total").as("pt"))
    val med = daily.join(spine,
        col("pday").between(col("day") - 7, col("day") - 1))
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("day")).orderBy(col("pt"), col("pday"))))
      .withColumn("c", count(lit(1)).over(Window.partitionBy(col("day"))))
      .filter(col("c") === 7 && col("rk") === 4)
      .select(col("day"), col("total"), col("n_events"),
        col("pt").as("med7"))
    val byType = cells
      .select(col("day"), col("event_type"),
        col("tdec").cast("double").as("type_total"))
    val top = byType.withColumn("trk", row_number().over(
        Window.partitionBy(col("day"))
          .orderBy(col("type_total").desc, col("event_type"))))
      .filter(col("trk") === 1)
      .select(col("day"), col("event_type").as("top_type"),
        col("type_total"))
    med.join(top, "day")
      .select(col("day"), col("total"), col("n_events"), col("med7"),
        (col("total") / col("med7")).as("vs_med7"),
        (col("total") > col("med7") * 2).as("is_spike"),
        col("top_type"),
        (col("type_total") / col("total")).as("top_share"))
      .orderBy(col("day"))
  }

  private val anomalyDrilldownSql =
    s"""WITH daily AS (
       |  SELECT epoch_ns(ts) // 1000 // 86400000000 AS day,
       |    ${sqlSum("value")} AS total, CAST(COUNT(*) AS BIGINT) AS n_events
       |  FROM events GROUP BY 1
       |), med AS (
       |  SELECT d.day, d.total, d.n_events, x.total AS med7,
       |    row_number() OVER (PARTITION BY d.day
       |      ORDER BY x.total, x.day) AS rk,
       |    COUNT(*) OVER (PARTITION BY d.day) AS c
       |  FROM daily d JOIN daily x ON x.day BETWEEN d.day - 7 AND d.day - 1
       |), byType AS (
       |  SELECT epoch_ns(ts) // 1000 // 86400000000 AS day, event_type,
       |    ${sqlSum("value")} AS type_total
       |  FROM events GROUP BY 1, 2
       |), top AS (
       |  SELECT day, event_type AS top_type, type_total,
       |    row_number() OVER (PARTITION BY day
       |      ORDER BY type_total DESC, event_type) AS trk
       |  FROM byType
       |)
       |SELECT m.day, m.total, m.n_events, m.med7,
       |  m.total / m.med7 AS vs_med7,
       |  m.total > m.med7 * 2 AS is_spike,
       |  t.top_type, t.type_total / m.total AS top_share
       |FROM med m JOIN top t ON m.day = t.day AND t.trk = 1
       |WHERE m.c = 7 AND m.rk = 4
       |ORDER BY m.day""".stripMargin

  // ---- q527: dedup token liability by quality decile -------------------

  /** Near-dedup token LIABILITY profile: how many tokens does near-dup
    * deduplication remove, and from which quality deciles? Composes the
    * q52 quality score, the q65 exact-Jaccard components (kept doc =
    * component min-id rep), and the q135-class exact global decile
    * ([[GlobalRank.withNtile]] — range shuffle, no single-partition
    * window over the per-doc frame), rolled to one row per decile with
    * exact token sums and an integer-exact savings rate in ppm. q171
    * answers "does low quality predict duplication" with a rate; this
    * answers the budgeting question — WHERE the token mass goes when
    * dedup runs — which is what a token-metered training plan needs. */
  def dedupTokenLiability(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    val q = TextOps.qualityScored(d)
      .select(col("doc_id"), col("n_tokens"), col("quality"))
    val clus = CorpusFrames.clusters(spark, dir)
    val j = q.join(clus, "doc_id")
      .withColumn("is_rep", col("doc_id") === col("cluster_rep"))
    GlobalRank.withNtile(j, 10, Seq(col("quality"), col("doc_id")),
        "decile")
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_docs"),
        count(when(col("is_rep"), 1)).as("n_kept"),
        sum(col("n_tokens")).as("tokens_raw"),
        sum(when(col("is_rep"), col("n_tokens")).otherwise(0L))
          .as("tokens_kept"))
      .withColumn("savings_ppm",
        // decimal-widened numerator: a decile dropping > ~9.2e12 tokens
        // (plausible when long docs concentrate in one decile of a
        // 100 TB corpus) would overflow the long multiply — the same
        // x*1e6 idiom GlobalRank.intDiv widens for; IntegralDivide
        // returns LONG either way, so the output type is unchanged
        expr("(CAST(tokens_raw - tokens_kept AS DECIMAL(38,0)) * 1000000)" +
          " div tokens_raw"))
      .orderBy(col("decile"))
  }

  private val dedupTokenLiabilitySql = {
    val stops = stopsSql("en")
    s"""WITH RECURSIVE ${DedupQueries.reachCtes}, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), t AS (
       |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok
       |  FROM documents
       |), q AS (
       |  SELECT doc_id, COUNT(*) AS n_tokens,
       |    least(CAST(COUNT(*) AS DOUBLE) / 100, 1.0) * 0.4
       |      + (CAST(COUNT(*) FILTER (tok IN ($stops)) AS DOUBLE)
       |          / COUNT(*)) * 0.3
       |      + (CAST(COUNT(DISTINCT tok) AS DOUBLE) / COUNT(*)) * 0.3
       |      AS quality
       |  FROM t GROUP BY doc_id
       |), x AS (
       |  SELECT q.doc_id, q.n_tokens,
       |    (q.doc_id = r.cluster_rep) AS is_rep,
       |    CAST(NTILE(10) OVER (ORDER BY q.quality, q.doc_id) AS INT)
       |      AS decile
       |  FROM q JOIN rep r USING (doc_id)
       |), a AS (
       |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(*) FILTER (is_rep) AS BIGINT) AS n_kept,
       |    CAST(SUM(n_tokens) AS BIGINT) AS tokens_raw,
       |    CAST(COALESCE(SUM(n_tokens) FILTER (is_rep), 0) AS BIGINT)
       |      AS tokens_kept
       |  FROM x GROUP BY 1
       |)
       |SELECT decile, n_docs, n_kept, tokens_raw, tokens_kept,
       |  CAST((CAST(tokens_raw - tokens_kept AS HUGEINT) * 1000000)
       |    // tokens_raw AS BIGINT) AS savings_ppm
       |FROM a
       |ORDER BY decile""".stripMargin
  }

  // ---- q528: RAG context assembly under a token budget ----------------

  /** The serving-side RAG composition: chunk the corpus (q104's 32/8
    * sliding chunks) → score every chunk against the fixed 3-term query
    * with BM25 (q143's rational-idf algebra at CHUNK granularity — the
    * per-term scores sum in a FIXED literal order, so the multi-term
    * score involves no engine-ordered float reduction) → assemble the
    * answer context greedily in score order under a token budget
    * (q125's prefix rule; cum_tokens is monotone, so the admitted set
    * is an exact prefix of the ranked candidates). The output is the
    * context MANIFEST a RAG server ships to the generator: rank, chunk
    * coordinates, tokens, score, running total.
    *
    * Scale shape: the chunk frame is one compiled partition-local pass
    * (checkpointed — corpus stats and term counting both consume it);
    * candidates are only chunks containing ≥1 query term (df-bounded,
    * never the whole corpus); corpus stats and document frequencies are
    * 1-row broadcasts; the score-ordered rank + running token sum is
    * ONE [[GlobalRank]] range pass (no single-partition window over the
    * candidate frame). */
  def ragContextPack(spark: SparkSession, dir: String): DataFrame = {
    val terms = Seq("join", "vector", "scan")
    val budget = 256L
    val ch = TextOps.chunked(docs(spark, dir), size = 32, overlap = 8)
      .localCheckpoint(false)
    val corpus = ch.agg(count(lit(1)).as("n_chunks"),
      sum(col("n_chunk_tokens")).as("sum_dl"))
    val tfAggs = terms.map(t =>
      count(when(col("tok") === t, 1)).as(s"tf_$t"))
    val tf = ch.select(col("doc_id"), col("chunk_idx"),
        col("n_chunk_tokens").as("dl"),
        explode(split(col("chunk_text"), " ", -1)).as("tok"))
      .filter(col("tok").isin(terms: _*))
      .groupBy(col("doc_id"), col("chunk_idx"), col("dl"))
      .agg(tfAggs.head, tfAggs.tail: _*)
    val dfAggs = terms.map(t =>
      count(when(col(s"tf_$t") > 0, 1)).as(s"df_$t"))
    val dfreq = tf.agg(dfAggs.head, dfAggs.tail: _*)
    val nC = col("n_chunks").cast("double")
    def termScore(t: String): Column =
      when(col(s"tf_$t") > 0,
        ((nC - col(s"df_$t").cast("double") + lit(0.5)) /
          (col(s"df_$t").cast("double") + lit(0.5))) *
          (col(s"tf_$t").cast("double") * lit(2.2)) /
          (col(s"tf_$t").cast("double") + lit(1.2) *
            (lit(0.25) + lit(0.75) *
              (col("dl").cast("double") /
                (col("sum_dl").cast("double") / nC)))))
        .otherwise(lit(0.0))
    // fixed left-to-right fold over the term list — never an
    // engine-ordered float reduction, and the term set lives in ONE place
    val scored = tf.crossJoin(broadcast(corpus)).crossJoin(broadcast(dfreq))
      .withColumn("score", terms.map(termScore).reduceLeft(_ + _))
      .select(col("doc_id"), col("chunk_idx"), col("dl"), col("score"))
    val ranked = GlobalRank.withRowNumberAndRunningSums(scored,
      Seq(-col("score"), col("doc_id"), col("chunk_idx")), "rank",
      Seq((col("dl"), "cum_tokens")))
    ranked.filter(col("cum_tokens") <= budget)
      .select(col("rank"), col("doc_id"), col("chunk_idx"),
        col("dl").as("n_chunk_tokens"), col("score"), col("cum_tokens"))
      .orderBy(col("rank"))
  }

  private val ragContextPackSql =
    """WITH toks AS (
      |  SELECT doc_id, string_split(text, ' ') AS t FROM documents
      |), ch AS (
      |  SELECT doc_id, CAST(k AS BIGINT) AS chunk_idx,
      |    array_to_string(t[k * 24 + 1 : least(k * 24 + 32, len(t))], ' ')
      |      AS chunk_text,
      |    CAST(least(k * 24 + 32, len(t)) - k * 24 AS BIGINT) AS dl
      |  FROM toks,
      |    unnest(range(0, CAST(ceil(len(t) / 24.0) AS BIGINT))) AS u(k)
      |), corpus AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_chunks,
      |    CAST(SUM(dl) AS BIGINT) AS sum_dl
      |  FROM ch
      |), tf AS (
      |  SELECT doc_id, chunk_idx, dl,
      |    CAST(COUNT(*) FILTER (tok = 'join') AS BIGINT) AS tf_join,
      |    CAST(COUNT(*) FILTER (tok = 'vector') AS BIGINT) AS tf_vector,
      |    CAST(COUNT(*) FILTER (tok = 'scan') AS BIGINT) AS tf_scan
      |  FROM (SELECT doc_id, chunk_idx, dl,
      |          unnest(string_split(chunk_text, ' ')) AS tok
      |        FROM ch)
      |  WHERE tok IN ('join', 'vector', 'scan')
      |  GROUP BY 1, 2, 3
      |), dfreq AS (
      |  SELECT CAST(COUNT(*) FILTER (tf_join > 0) AS BIGINT) AS df_join,
      |    CAST(COUNT(*) FILTER (tf_vector > 0) AS BIGINT) AS df_vector,
      |    CAST(COUNT(*) FILTER (tf_scan > 0) AS BIGINT) AS df_scan
      |  FROM tf
      |), sc AS (
      |  SELECT doc_id, chunk_idx, dl,
      |    (CASE WHEN tf_join > 0 THEN
      |      ((CAST(n_chunks AS DOUBLE) - CAST(df_join AS DOUBLE) + 0.5)
      |        / (CAST(df_join AS DOUBLE) + 0.5))
      |      * (CAST(tf_join AS DOUBLE) * 2.2)
      |      / (CAST(tf_join AS DOUBLE) + 1.2 * (0.25 + 0.75
      |          * (CAST(dl AS DOUBLE)
      |             / (CAST(sum_dl AS DOUBLE) / CAST(n_chunks AS DOUBLE)))))
      |      ELSE 0.0 END
      |    + CASE WHEN tf_vector > 0 THEN
      |      ((CAST(n_chunks AS DOUBLE) - CAST(df_vector AS DOUBLE) + 0.5)
      |        / (CAST(df_vector AS DOUBLE) + 0.5))
      |      * (CAST(tf_vector AS DOUBLE) * 2.2)
      |      / (CAST(tf_vector AS DOUBLE) + 1.2 * (0.25 + 0.75
      |          * (CAST(dl AS DOUBLE)
      |             / (CAST(sum_dl AS DOUBLE) / CAST(n_chunks AS DOUBLE)))))
      |      ELSE 0.0 END
      |    + CASE WHEN tf_scan > 0 THEN
      |      ((CAST(n_chunks AS DOUBLE) - CAST(df_scan AS DOUBLE) + 0.5)
      |        / (CAST(df_scan AS DOUBLE) + 0.5))
      |      * (CAST(tf_scan AS DOUBLE) * 2.2)
      |      / (CAST(tf_scan AS DOUBLE) + 1.2 * (0.25 + 0.75
      |          * (CAST(dl AS DOUBLE)
      |             / (CAST(sum_dl AS DOUBLE) / CAST(n_chunks AS DOUBLE)))))
      |      ELSE 0.0 END) AS score
      |  FROM tf CROSS JOIN corpus CROSS JOIN dfreq
      |), r AS (
      |  SELECT CAST(row_number() OVER (ORDER BY score DESC, doc_id,
      |      chunk_idx) AS BIGINT) AS rank,
      |    doc_id, chunk_idx, dl AS n_chunk_tokens, score,
      |    CAST(SUM(dl) OVER (ORDER BY score DESC, doc_id, chunk_idx
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_tokens
      |  FROM sc
      |)
      |SELECT rank, doc_id, chunk_idx, n_chunk_tokens, score, cum_tokens
      |FROM r WHERE cum_tokens <= 256
      |ORDER BY rank""".stripMargin

  // ---- q529: the training-mixture build manifest -----------------------

  /** q529's token budget — sized to BITE on the funnel SURVIVORS' token
    * mass at the fixture scale (survivor mass is a strict subset of the
    * q524 corpus mass, so this sits below [[MixBudgetTokens]]). */
  private val ManifestBudgetTokens = 6000L

  /** q529's packing bin size (q108 uses 2048 on the raw corpus; the
    * admitted-survivor manifest uses smaller bins so multiple bins per
    * language exist at the fixture scale). */
  private val PackTokens = 512L

  /** q529's survivor gate. The mixture build trusts the DECLARED
    * language label (mixtures are composed per declared language; the
    * funnel REPORT q523 is where the label-confirm rate gets audited —
    * its precision gate keeps 1 doc at fixture scale, which would make
    * the quota and packing algebra downstream vacuous) and takes a
    * quality bar that bites at the fixture's quality median (~0.38):
    * ~40–140 kept docs and 2.6k–9.2k surviving tokens per language, so
    * every stage of the chain does real work. */
  private val ManifestQualityBar = 0.35

  /** END-TO-END training-mixture BUILD — the r14 verdict's suggested
    * composition (a): the curation grain picks the survivors (quality ≥
    * [[ManifestQualityBar]], near-dup component rep among the quality
    * survivors — q523's dedup-never-resurrects rule), q524's
    * temperature-quota algebra apportions [[ManifestBudgetTokens]]
    * across the SURVIVOR languages' token mass, and q108's
    * concat-then-chunk packing lays the admitted docs into fixed
    * [[PackTokens]]-token bins — one doc-grain manifest (lang, doc,
    * tokens, quota, cursor, pack coordinates) a training data loader can
    * stream in order. The key composition fact: greedy in-language
    * admission is a PREFIX of the deterministic (hash, id) order, so
    * within the admitted set the in-language running sum computed over
    * ALL survivors IS the packing cursor — packing costs no second rank
    * pass.
    *
    * Scale shape, inherited from the legs: one explode-aggregate profile
    * pass + banded df-capped dedup candidates (the [[curationDocGrain]]
    * frame, checkpointed — consumed by the rep aggregate, the join-back,
    * the quota aggregate and the rank), quota algebra over the
    * |langs|-row aggregate (WindowSweep-bounded), ONE
    * [[GlobalRank.withRunningSum]] range pass over (lang, hash, id) with
    * in-language cursors recovered by subtracting broadcast per-language
    * offsets — no fact-sized or single-partition window anywhere. */
  def trainingMixtureManifest(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    val grain = curationDocGrain(spark, dir) // session memo, checkpointed
    val ok = col("quality") >= ManifestQualityBar && col("lang").isNotNull
    val survRep = grain.filter(ok)
      .groupBy(col("cluster_rep")).agg(min(col("doc_id")).as("surv_rep"))
    val surv = grain.join(survRep, Seq("cluster_rep"))
      .filter(ok && col("doc_id") === col("surv_rep"))
      .select(col("doc_id"), col("lang"), col("n_tokens"))
    val all = Window.partitionBy(lit(1))
    val quotas = surv.groupBy(col("lang"))
      .agg(sum(col("n_tokens")).as("lang_tokens"))
      .withColumn("w",
        floor(sqrt(col("lang_tokens").cast("double")) * 1e6).cast("long"))
      .withColumn("tot", sum(col("w")).over(all))
      .withColumn("base", expr(s"($ManifestBudgetTokens * w) div tot"))
      .withColumn("rem", expr(s"($ManifestBudgetTokens * w) % tot"))
      .withColumn("leftover",
        lit(ManifestBudgetTokens) - sum(col("base")).over(all))
      .withColumn("rk", row_number().over(
        Window.partitionBy(lit(1)).orderBy(col("rem").desc, col("lang")))
        .cast("long"))
      .withColumn("lang_offset",
        coalesce(sum(col("lang_tokens")).over(
          Window.partitionBy(lit(1)).orderBy(col("lang"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("lang"), col("lang_offset"),
        (col("base") + when(col("rk") <= col("leftover"), 1L)
          .otherwise(0L)).as("quota_tokens"))
    val ranked = GlobalRank.withRunningSum(
      surv.withColumn("hkey",
        pmod(pmod(col("doc_id"), lit(p)) * lit(2654435761L), lit(p))),
      Seq(col("lang"), col("hkey"), col("doc_id")),
      col("n_tokens"), "cum_all")
    ranked.join(broadcast(quotas), "lang")
      .withColumn("cum_in_lang", col("cum_all") - col("lang_offset"))
      .filter(col("cum_in_lang") <= col("quota_tokens"))
      .withColumn("before", col("cum_in_lang") - col("n_tokens"))
      .select(col("lang"), col("doc_id"), col("n_tokens"),
        col("quota_tokens"), col("cum_in_lang"),
        expr(s"before div $PackTokens").as("pack_id"),
        (col("before") % PackTokens).as("pack_offset"))
      .orderBy(col("lang"), col("cum_in_lang"))
  }

  private val trainingMixtureManifestSql =
    s"""WITH RECURSIVE ${DedupQueries.reachCtes}, rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), $profCte, flags AS (
       |  SELECT d.doc_id, d.lang,
       |    COALESCE(s.quality >= $ManifestQualityBar, FALSE)
       |      AND d.lang IS NOT NULL AS m_ok,
       |    COALESCE(s.n_tokens, 0) AS n_tokens
       |  FROM documents d LEFT JOIN scored s USING (doc_id)
       |), surv AS (
       |  SELECT f.*,
       |    MIN(CASE WHEN f.m_ok THEN f.doc_id END)
       |      OVER (PARTITION BY r.cluster_rep) AS surv_rep
       |  FROM flags f JOIN rep r USING (doc_id)
       |), picked AS (
       |  SELECT doc_id, lang, CAST(n_tokens AS BIGINT) AS n_tokens
       |  FROM surv WHERE m_ok AND doc_id = surv_rep
       |), s2 AS (
       |  SELECT lang, SUM(n_tokens) AS lang_tokens,
       |    CAST(floor(sqrt(CAST(SUM(n_tokens) AS DOUBLE)) * 1e6) AS BIGINT)
       |      AS w
       |  FROM picked GROUP BY 1
       |), q1 AS (
       |  SELECT lang, w, SUM(w) OVER () AS tot FROM s2
       |), q2 AS (
       |  SELECT lang, w, ($ManifestBudgetTokens * w) // tot AS base,
       |    ($ManifestBudgetTokens * w) % tot AS rem
       |  FROM q1
       |), q3 AS (
       |  SELECT lang, base,
       |    $ManifestBudgetTokens - SUM(base) OVER () AS leftover,
       |    row_number() OVER (ORDER BY rem DESC, lang) AS rk
       |  FROM q2
       |), quotas AS (
       |  SELECT lang,
       |    CAST(base + CASE WHEN rk <= leftover THEN 1 ELSE 0 END AS BIGINT)
       |      AS quota_tokens
       |  FROM q3
       |), ranked AS (
       |  SELECT doc_id, lang, n_tokens,
       |    CAST(SUM(n_tokens) OVER (PARTITION BY lang
       |      ORDER BY ((((doc_id % 1000000007) + 1000000007) % 1000000007)
       |                * 2654435761) % 1000000007, doc_id
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_in_lang
       |  FROM picked
       |)
       |SELECT r.lang, r.doc_id, r.n_tokens, q.quota_tokens, r.cum_in_lang,
       |  (r.cum_in_lang - r.n_tokens) // $PackTokens AS pack_id,
       |  (r.cum_in_lang - r.n_tokens) % $PackTokens AS pack_offset
       |FROM ranked r JOIN quotas q USING (lang)
       |WHERE r.cum_in_lang <= q.quota_tokens
       |ORDER BY lang, cum_in_lang""".stripMargin

  // ---- q530: index freshness SLO report --------------------------------

  private val FreshK = 5
  private val FreshNQ = 8 // query vectors: vec_id < 8, present in BOTH versions

  /** Index freshness SLO report — the r14 verdict's suggested
    * composition (b): publish two versions of a vector corpus through
    * the REAL [[graft.pipelines.Versioned]] machinery (v0 a
    * deterministic embeddings slice; v1 deletes every 15th non-query id
    * and inserts a disjoint slice), time-travel-read BOTH versions back,
    * and answer the serving question a staleness SLO is written about:
    * if queries are served from the STALE snapshot while the corpus has
    * moved on, how much of the FRESH exact top-k does each query still
    * see? Per query: overlap@k between the two brute-force top-k sets
    * (q70's scaled-integer cosine on each version read),
    * freshness_recall = overlap/k, how many fresh neighbors are NEW
    * docs (unreachable from the stale snapshot at any k), and the
    * version-diff row counts (added/removed via the anti-join diff over
    * the two time-travel reads). The oracle rebuilds both versions as
    * CTEs and replays the whole chain, so the hash certifies
    * publish → time-travel → diff → dual top-k → SLO arithmetic.
    *
    * Scale shape: queries broadcast against each version scan (the
    * [[VectorOps.cosineTopK]] contract — fused codegen similarity,
    * per-partition partial top-k); the id diff is one shuffle on vec_id;
    * the per-query legs join on (query_id, neighbor_id) at k·|queries|
    * rows; the diff counts enter as a 1-row broadcast (the one intended
    * nested-loop, q528's pattern). The published family is temp debris,
    * deleted after materialization. */
  /** Publish the two-version freshness fixture family into `out`
    * (v0 then v1) — factored out so PlanSpec can stage the same family
    * and pin the report frame's plan shape pre-materialization. */
  private[graft] def publishFreshnessFixture(spark: SparkSession,
      dir: String, out: String): Unit = {
    val base = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val v0 = base.filter(col("vec_id") < FreshNQ || col("vec_id") % 3 === 0)
    val v1 = v0.filter(!(col("vec_id") >= FreshNQ &&
        col("vec_id") % 15 === 0))
      .unionByName(base.filter(col("vec_id") >= FreshNQ &&
        col("vec_id") % 3 === 1))
    graft.pipelines.Versioned.publish(v0, out, "corpus")
    graft.pipelines.Versioned.publish(v1, out, "corpus")
  }

  /** The SLO report frame over an already-published family — lazy; the
    * registered query materializes it before deleting the temp family. */
  private[graft] def freshnessFrame(spark: SparkSession,
      out: String): DataFrame = {
    val stale = graft.pipelines.Versioned.read(spark, out, "corpus",
      Some(0L))
    val fresh = graft.pipelines.Versioned.read(spark, out, "corpus",
      Some(1L))
    val stats = stale.select(col("vec_id").as("v0id"))
      .join(fresh.select(col("vec_id").as("v1id")),
        col("v0id") === col("v1id"), "full_outer")
      .agg(count(when(col("v0id").isNull, 1)).as("n_added"),
        count(when(col("v1id").isNull, 1)).as("n_removed"))
    val t0 = graft.ops.VectorOps
      .cosineTopK(stale, col("vec_id") < FreshNQ, FreshK)
      .select(col("query_id"), col("neighbor_id"), lit(1L).as("in_stale"))
    val t1 = graft.ops.VectorOps
      .cosineTopK(fresh, col("vec_id") < FreshNQ, FreshK)
      .select(col("query_id"), col("neighbor_id"))
    t1.join(t0, Seq("query_id", "neighbor_id"), "left_outer")
      .groupBy(col("query_id"))
      .agg(count(col("in_stale")).as("stale_hits"),
        count(when(col("neighbor_id") >= FreshNQ &&
          col("neighbor_id") % 3 === 1, 1)).as("new_doc_hits"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("stale_hits"),
        (col("stale_hits").cast("double") / FreshK)
          .as("freshness_recall"),
        col("new_doc_hits"), col("n_added"), col("n_removed"))
      .orderBy(col("query_id"))
  }

  def indexFreshnessSlo(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_fresh_")
      .toString
    try {
      publishFreshnessFixture(spark, dir, out)
      val d = freshnessFrame(spark, out)
      // HARNESS-ONLY collect: the report must outlive the temp-dir
      // cleanup below, and it is |queries| rows by construction. A
      // production SLO job reading durable versions keeps this lazy.
      val rows = d.collect().toSeq
      val schema = d.schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    } finally {
      // finally, not success-path-only: a failed rep must not leak a
      // published family into /tmp
      graft.pipelines.Fs.deleteRecursive(new org.apache.hadoop.fs.Path(out))
    }
  }

  private val indexFreshnessSloSql = {
    // the per-version scaled-integer top-k legs differ only in the
    // version CTE they scan — generate both from one template (the same
    // arithmetic q70's oracle pins)
    def topk(v: String, tag: String) =
      s"""u$tag AS (
         |  SELECT vec_id,
         |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
         |      AS BIGINT) AS xi,
         |    unnest(range(len(embedding))) AS i
         |  FROM $v
         |), n$tag AS (
         |  SELECT vec_id, SUM(xi * xi) AS n2 FROM u$tag GROUP BY 1
         |), d$tag AS (
         |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
         |    CAST(SUM(q.xi * d.xi) AS BIGINT) AS dot
         |  FROM u$tag q JOIN u$tag d ON q.i = d.i
         |  WHERE q.vec_id < $FreshNQ AND d.vec_id <> q.vec_id
         |  GROUP BY 1, 2
         |), s$tag AS (
         |  SELECT query_id, neighbor_id,
         |    CAST(dot AS DOUBLE) /
         |      (sqrt(CAST(qn.n2 AS DOUBLE)) * sqrt(CAST(dn.n2 AS DOUBLE)))
         |      AS cos_sim
         |  FROM d$tag
         |  JOIN n$tag qn ON query_id = qn.vec_id
         |  JOIN n$tag dn ON neighbor_id = dn.vec_id
         |), t$tag AS (
         |  SELECT query_id, neighbor_id FROM (
         |    SELECT *, row_number() OVER (PARTITION BY query_id
         |      ORDER BY cos_sim DESC, neighbor_id) AS rn
         |    FROM s$tag)
         |  WHERE rn <= $FreshK
         |)""".stripMargin
    s"""WITH base AS (
       |  SELECT vec_id, embedding FROM embeddings
       |), v0 AS (
       |  SELECT * FROM base
       |  WHERE vec_id < $FreshNQ OR vec_id % 3 = 0
       |), v1 AS (
       |  SELECT * FROM v0
       |  WHERE NOT (vec_id >= $FreshNQ AND vec_id % 15 = 0)
       |  UNION ALL
       |  SELECT * FROM base
       |  WHERE vec_id >= $FreshNQ AND vec_id % 3 = 1
       |), ${topk("v0", "0")}, ${topk("v1", "1")}, stats AS (
       |  SELECT
       |    CAST((SELECT COUNT(*) FROM v1
       |          WHERE vec_id NOT IN (SELECT vec_id FROM v0)) AS BIGINT)
       |      AS n_added,
       |    CAST((SELECT COUNT(*) FROM v0
       |          WHERE vec_id NOT IN (SELECT vec_id FROM v1)) AS BIGINT)
       |      AS n_removed
       |), per AS (
       |  SELECT f.query_id,
       |    CAST(COUNT(s.neighbor_id) AS BIGINT) AS stale_hits,
       |    CAST(COUNT(*) FILTER (f.neighbor_id >= $FreshNQ
       |      AND f.neighbor_id % 3 = 1) AS BIGINT) AS new_doc_hits
       |  FROM t1 f LEFT JOIN t0 s USING (query_id, neighbor_id)
       |  GROUP BY 1
       |)
       |SELECT query_id, stale_hits,
       |  CAST(stale_hits AS DOUBLE) / $FreshK AS freshness_recall,
       |  new_doc_hits, n_added, n_removed
       |FROM per CROSS JOIN stats
       |ORDER BY query_id""".stripMargin
  }

  // ---- q531: corpus release gate report --------------------------------

  /** The release gates and their thresholds (ppm of docs unless the
    * name says otherwise). Literal policy constants: a release gate IS
    * a fixed contract, and fixed literals keep the oracle a pure
    * replay. Chosen so the fixture corpus reports an honest MIX — the
    * contamination gate genuinely fails there (the eval slice shares
    * rare shingle runs with two corpus docs), everything else passes —
    * because a gate report whose rows all pass tests nothing. */
  private val GateThresholds: Seq[(String, Long)] = Seq(
    "contamination_docs" -> 0L,
    "exact_dup_ppm" -> 10000L,
    "langid_mismatch_ppm" -> 650000L,
    "near_dup_removed_ppm" -> 100000L,
    "pii_ppm" -> 1000L,
    "undersized_ppm" -> 50000L)

  /** Pre-release GATE report — the go/no-go audit a corpus publisher
    * runs before shipping a version: one row per gate with the measured
    * value (exact integer ppm or count), its threshold, and the pass
    * verdict. Six gates across four proven families: exact-dup mass
    * (q219's card), near-dup removal mass (q65 components), language-ID
    * mismatch and undersized-doc mass (the q52/q53 fused profile), PII
    * incidence (q99's RE2-safe flags), and benchmark contamination
    * against the held-out source (q101's rare-shingle scan — threshold
    * ZERO, the only sound release policy for eval overlap).
    *
    * Scale shape: lang-mismatch, undersized AND near-dup removal come
    * out of the session-memoized curation grain in one combinable
    * aggregate (no re-paid profile explode or component pass); PII +
    * corpus size are one text scan; the exact-dup leg is a two-stage
    * distinct on md5 hashes (map-side combinable, 32-byte hashes
    * shuffle — never text, and never an Expand from mixing
    * countDistinct into the flag aggregate); contamination reuses its
    * df-capped machinery; the four 1-row legs then cross as broadcast
    * nested loops (q528's intended pattern) and stack() fans the single
    * row into the gate grain — no data-sized frame ever crosses a
    * join. */
  def releaseGateReport(spark: SparkSession, dir: String): DataFrame = {
    val d = docs(spark, dir)
    // three gates off the session-memoized curation grain in ONE leg:
    // lang_ok IS the oracle's COALESCE(pred_lang = lang, FALSE), grain
    // n_tokens is already null-coalesced, and cluster_rep rides along —
    // the profile explode and the component pass are never re-paid here
    val grainAgg = curationDocGrain(spark, dir)
      .agg(count(when(not(col("lang_ok")), 1)).as("n_mismatch"),
        count(when(col("n_tokens") < 10, 1)).as("n_undersized"),
        count(when(col("doc_id") =!= col("cluster_rep"), 1))
          .as("n_near_dup"))
    // PII + corpus size: one text scan (text lives only in this leg)
    val pii = col("text").rlike(TextOps.EmailPattern) ||
      col("text").rlike(TextOps.UrlPattern) ||
      col("text").rlike(TextOps.LongNumberPattern)
    val piiAgg = d.agg(count(lit(1)).as("n_docs"),
      count(when(pii, 1)).as("n_pii"))
    val dupAgg = d.groupBy(md5(col("text")).as("h"))
      .agg(count(lit(1)).as("c"))
      .agg((sum(col("c")) - count(lit(1))).as("n_exact_dup"))
    val contamAgg = DedupOps.contamination(
        d.filter(col("source") =!= "src0"),
        d.filter(col("source") === "src0"))
      .agg(countDistinct(col("doc_id")).as("n_contam"))
    val one = piiAgg.crossJoin(broadcast(grainAgg))
      .crossJoin(broadcast(dupAgg)).crossJoin(broadcast(contamAgg))
    val gates = one.selectExpr(
      "stack(6, " +
        "'contamination_docs', n_contam, " +
        "'exact_dup_ppm', (n_exact_dup * 1000000) div nullif(n_docs, 0), " +
        "'langid_mismatch_ppm', (n_mismatch * 1000000) div nullif(n_docs, 0), " +
        "'near_dup_removed_ppm', (n_near_dup * 1000000) div nullif(n_docs, 0), " +
        "'pii_ppm', (n_pii * 1000000) div nullif(n_docs, 0), " +
        "'undersized_ppm', (n_undersized * 1000000) div nullif(n_docs, 0)" +
        ") AS (gate, value)")
    val th = GateThresholds.foldRight(lit(null).cast("long")) {
      case ((g, t), rest) => when(col("gate") === g, lit(t)).otherwise(rest)
    }
    gates.withColumn("threshold", th)
      .withColumn("pass", col("value") <= col("threshold"))
      .orderBy(col("gate"))
  }

  private val releaseGateReportSql = {
    val thRows = GateThresholds.map { case (g, t) => s"('$g', $t)" }
      .mkString(", ")
    s"""WITH RECURSIVE ${DedupQueries.reachCtes}, $profCte, flags AS (
       |  SELECT d.doc_id,
       |    NOT COALESCE(s.pred_lang = d.lang, FALSE) AS mismatch,
       |    COALESCE(s.n_tokens, 0) < 10 AS undersized,
       |    (regexp_matches(d.text,
       |       '[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\\.[a-zA-Z]{2,}')
       |     OR regexp_matches(d.text, 'https?://[^ ]+')
       |     OR regexp_matches(d.text, '[0-9]{9,}')) AS pii
       |  FROM documents d LEFT JOIN scored s USING (doc_id)
       |), base AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
       |    CAST(COUNT(*) FILTER (mismatch) AS BIGINT) AS n_mismatch,
       |    CAST(COUNT(*) FILTER (undersized) AS BIGINT) AS n_undersized,
       |    CAST(COUNT(*) FILTER (pii) AS BIGINT) AS n_pii
       |  FROM flags
       |), dup AS (
       |  SELECT CAST(COUNT(*) - COUNT(DISTINCT md5(text)) AS BIGINT)
       |    AS n_exact_dup
       |  FROM documents
       |), rep AS (
       |  SELECT d.doc_id,
       |    CAST(LEAST(d.doc_id, COALESCE(MIN(r.v), d.doc_id)) AS BIGINT)
       |      AS cluster_rep
       |  FROM documents d LEFT JOIN reach r ON r.u = d.doc_id
       |  GROUP BY d.doc_id
       |), near AS (
       |  SELECT CAST(COUNT(*) FILTER (doc_id <> cluster_rep) AS BIGINT)
       |    AS n_near_dup
       |  FROM rep
       |), corpus AS (
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
       |), hits AS (
       |  SELECT r.doc_id, e.doc_id AS eval_id, COUNT(*) AS n_common
       |  FROM rare r JOIN es e USING (shingle)
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= 3
       |), contam AS (
       |  SELECT CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contam FROM hits
       |), vals AS (
       |  SELECT 'contamination_docs' AS gate, n_contam AS value
       |  FROM contam
       |  UNION ALL
       |  SELECT 'exact_dup_ppm', (n_exact_dup * 1000000) // nullif(n_docs, 0)
       |  FROM dup CROSS JOIN base
       |  UNION ALL
       |  SELECT 'langid_mismatch_ppm', (n_mismatch * 1000000) // nullif(n_docs, 0)
       |  FROM base
       |  UNION ALL
       |  SELECT 'near_dup_removed_ppm', (n_near_dup * 1000000) // nullif(n_docs, 0)
       |  FROM near CROSS JOIN base
       |  UNION ALL
       |  SELECT 'pii_ppm', (n_pii * 1000000) // nullif(n_docs, 0)
       |  FROM base
       |  UNION ALL
       |  SELECT 'undersized_ppm', (n_undersized * 1000000) // nullif(n_docs, 0)
       |  FROM base
       |), th(gate, threshold) AS (VALUES $thRows)
       |SELECT v.gate, CAST(v.value AS BIGINT) AS value,
       |  CAST(t.threshold AS BIGINT) AS threshold,
       |  v.value <= t.threshold AS pass
       |FROM vals v JOIN th t USING (gate)
       |ORDER BY gate""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q523_curation_funnel", curationFunnel, Some(curationFunnelSql),
      "END-TO-END curation funnel per (lang, source): corpus -> langid-" +
        "confirmed -> quality-passed -> near-dup-deduplicated, with " +
        "surviving token mass — q52+q53+q65 chained into one staged " +
        "report, monotone by construction"),
    Q("q524_token_budgeted_mixture", tokenBudgetedMixture,
      Some(tokenBudgetedMixtureSql),
      "token-BUDGETED temperature mixture: sqrt-temperature weights on " +
        "token mass (q186) + largest-remainder token quotas (q120) + " +
        "greedy in-stratum prefix admission (q125) via one GlobalRank " +
        "range shuffle — the composer a token-metered run needs"),
    Q("q525_supplier_risk_scorecard", supplierRiskScorecard,
      Some(supplierRiskScorecardSql),
      "supplier risk scorecard: one lineitem rollup (exact revenue, " +
        "return rate, part breadth) + within-nation tercile grading + " +
        "composite risk grade — join/agg/window/case composed into one " +
        "supplier-grain report"),
    Q("q526_anomaly_drilldown", anomalyDrilldown,
      Some(anomalyDrilldownSql),
      "trailing-7-day exact-median robust anomaly score over the daily " +
        "value spine + top-contributing event_type per day — q283's " +
        "global-mean flag composed into a windowed, attributed report"),
    Q("q527_dedup_token_liability", dedupTokenLiability,
      Some(dedupTokenLiabilitySql),
      "near-dedup token savings by exact quality decile: q52 quality + " +
        "q65 components + GlobalRank deciles -> exact token sums and " +
        "ppm savings per decile — the token-budget liability report"),
    Q("q528_rag_context_pack", ragContextPack, Some(ragContextPackSql),
      "RAG context assembly: q104 chunks -> chunk-level BM25 (q143 " +
        "algebra, fixed-order multi-term sum) -> greedy token-budget " +
        "prefix (q125 rule) via one GlobalRank pass — the context " +
        "manifest a retrieval server ships to the generator"),
    Q("q529_training_mixture_manifest", trainingMixtureManifest,
      Some(trainingMixtureManifestSql),
      "training-mixture BUILD manifest: q523 funnel survivors -> q524 " +
        "temperature token quotas -> q108 bin packing of the admitted " +
        "prefix, one GlobalRank pass (admission prefix IS the packing " +
        "cursor) — the doc-grain manifest a data loader streams"),
    Q("q530_index_freshness_slo", indexFreshnessSlo,
      Some(indexFreshnessSloSql),
      "index freshness SLO: publish 2 corpus versions (real Versioned " +
        "machinery), time-travel both, per-query stale-vs-fresh exact " +
        "top-k overlap + new-doc share + version diff counts — the " +
        "staleness report an index rebuild cadence is tuned against"),
    Q("q531_release_gate_report", releaseGateReport,
      Some(releaseGateReportSql),
      "pre-release go/no-go gate report: exact-dup, near-dup, langid-" +
        "mismatch, undersized, PII and eval-contamination gates (q219/" +
        "q65/q53/q99/q101 legs) as measured-vs-threshold rows with pass " +
        "verdicts — the audit a corpus publisher ships against"))
}
