package graft.queries

import graft.Q
import graft.catalog.Catalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Round-8 widening: applied-statistics and embedding-geometry operators
  * (variance homogeneity, normality, effect size, readability, isotropy,
  * silhouette, clip calibration) plus inventory/ops analytics (ABC
  * classes, drawdown, control bands, stickiness, tax margins).
  *
  * Determinism rules as everywhere else in the repo: integer / decimal
  * exact state end-to-end; where a statistic needs IEEE arithmetic the
  * whole chain is a FIXED, textually-mirrored sequence of correctly-
  * rounded double ops evaluated in one row (never a float sum across
  * rows, whose order Spark does not define).
  */
object ScienceQueries {

  private val dec = "decimal(38,0)"

  private def orderCents: Column =
    expr("CAST(round(o_totalprice * 100) AS BIGINT)")

  // ---- ABC inventory classes -------------------------------------------

  /** ABC revenue classification of the part catalog: class A = parts up
    * to 80% cumulative revenue, B to 95%, C the tail — the inventory-
    * policy partition behind every stocking decision. Class membership
    * by exact integer cross-multiplication (cum·100 ≤ total·80 — no
    * float thresholds); one share division per class row. The global
    * cumulative sum runs on the per-part AGGREGATE (catalog-sized, not
    * fact-sized) via [[graft.ops.GlobalRank.withRunningSum]] — exact
    * integer prefix sums from a range shuffle + broadcast offsets, no
    * single-partition window over the part dimension. */
  def abcClasses(spark: SparkSession, dir: String): DataFrame = {
    val parts = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val total = parts.agg(sum(col("cents")).as("total_cents"))
    graft.ops.GlobalRank.withRunningSum(parts,
        Seq(col("cents").desc, col("pk")), col("cents"), "cum")
      .crossJoin(broadcast(total))
      .withColumn("abc_class",
        when(col("cum") * 100 <= col("total_cents") * 80, "A")
          .when(col("cum") * 100 <= col("total_cents") * 95, "B")
          .otherwise("C"))
      .groupBy(col("abc_class"))
      .agg(count(lit(1)).as("n_parts"), sum(col("cents")).as("class_cents"),
        max(col("total_cents")).as("tc"))
      .select(col("abc_class"), col("n_parts"), col("class_cents"),
        (col("class_cents").cast("double") / col("tc").cast("double"))
          .as("share"))
      .orderBy(col("abc_class"))
  }

  private val abcClassesSql =
    """WITH p AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM p
      |), r AS (
      |  SELECT cents,
      |    CAST(SUM(cents) OVER (ORDER BY cents DESC, pk
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum
      |  FROM p
      |), c AS (
      |  SELECT CASE WHEN cum * 100 <= total_cents * 80 THEN 'A'
      |              WHEN cum * 100 <= total_cents * 95 THEN 'B'
      |              ELSE 'C' END AS abc_class,
      |    cents, total_cents
      |  FROM r, t
      |)
      |SELECT abc_class, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |  CAST(SUM(cents) AS BIGINT) AS class_cents,
      |  CAST(SUM(cents) AS DOUBLE) / CAST(MAX(total_cents) AS DOUBLE) AS share
      |FROM c
      |GROUP BY abc_class
      |ORDER BY abc_class""".stripMargin

  // ---- Brown–Forsythe variance homogeneity ------------------------------

  private val Priorities =
    Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")

  /** Brown–Forsythe (median-based Levene) W for order-value variance
    * homogeneity across the five order priorities — the check every
    * ANOVA/t-test on this segmentation silently assumes. Group medians
    * are exact rank-selected integers (lower median, (n+1) div 2), so
    * the |y−med| deviations are exact BIGINTs; per-group moment sums
    * are exact; W's between/within quotient is ONE fixed five-term
    * chain evaluated in a single row (the five groups are pivoted to
    * columns — never a float sum over rows). */
  def levene(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("pri"), col("o_orderkey"), orderCents.as("y"))
    val wp = Window.partitionBy(col("pri")).orderBy(col("y"), col("o_orderkey"))
    val med = o.withColumn("rn", row_number().over(wp))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("pri"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("pri"), col("y").as("med"))
    val z = o.join(med, "pri")
      .select(col("pri"), abs(col("y") - col("med")).as("z"))
    val g = z.groupBy(col("pri"))
      .agg(count(lit(1)).as("n"), sum(col("z")).as("sz"),
        sum((col("z").cast(dec) * col("z")).cast(dec)).as("szz"))
    // pivot the five fixed groups into one row
    val pivCols = Priorities.zipWithIndex.flatMap { case (p, i) =>
      Seq(sum(when(col("pri") === p, col("n"))).as(s"n$i"),
        sum(when(col("pri") === p, col("sz"))).as(s"sz$i"),
        sum(when(col("pri") === p, col("szz"))).as(s"szz$i"))
    }
    val piv = g.agg(pivCols.head, pivCols.tail: _*)
    def d(c: Column) = c.cast("double")
    val nTot = (0 to 4).map(i => col(s"n$i")).reduce(_ + _)
    val szTot = (0 to 4).map(i => col(s"sz$i")).reduce(_ + _)
    val zbar = d(szTot) / d(nTot)
    val num = (0 to 4).map { i =>
      d(col(s"n$i")) * (d(col(s"sz$i")) / d(col(s"n$i")) - zbar) *
        (d(col(s"sz$i")) / d(col(s"n$i")) - zbar)
    }.reduce(_ + _)
    val den = (0 to 4).map { i =>
      d(col(s"szz$i")) - d(col(s"sz$i")) * d(col(s"sz$i")) / d(col(s"n$i"))
    }.reduce(_ + _)
    piv.select(nTot.as("n"),
      ((d(nTot - 5) / 4.0) * (num / den)).as("w_stat"))
  }

  private val leveneSql = {
    val pris = Priorities
    def cond(i: Int, agg: String) =
      s"SUM(CASE WHEN pri = '${pris(i)}' THEN $agg END)"
    val ns = (0 to 4).map(i => s"${cond(i, "n")} AS n$i").mkString(", ")
    val szs = (0 to 4).map(i => s"${cond(i, "sz")} AS sz$i").mkString(", ")
    val szzs = (0 to 4).map(i => s"${cond(i, "szz")} AS szz$i").mkString(", ")
    val nTot = (0 to 4).map(i => s"n$i").mkString(" + ")
    val szTot = (0 to 4).map(i => s"sz$i").mkString(" + ")
    val zbar = s"(CAST($szTot AS DOUBLE) / CAST($nTot AS DOUBLE))"
    val num = (0 to 4).map { i =>
      s"CAST(n$i AS DOUBLE) * (CAST(sz$i AS DOUBLE) / CAST(n$i AS DOUBLE) - $zbar)" +
        s" * (CAST(sz$i AS DOUBLE) / CAST(n$i AS DOUBLE) - $zbar)"
    }.mkString(" + ")
    // each within-group term parenthesized so the five-term sum associates
    // exactly like the Spark Column reduce: (A0-P0)+(A1-P1)+... — without
    // parens "A0 - P0 + A1 - ..." folds subtractions differently (1-ulp
    // hash mismatch, caught by check.py)
    val den = (0 to 4).map { i =>
      s"(CAST(szz$i AS DOUBLE) - CAST(sz$i AS DOUBLE) * CAST(sz$i AS DOUBLE)" +
        s" / CAST(n$i AS DOUBLE))"
    }.mkString(" + ")
    s"""WITH o AS (
       |  SELECT o_orderpriority AS pri, o_orderkey,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
       |  FROM orders
       |), med AS (
       |  SELECT pri, y AS med FROM (
       |    SELECT pri, y,
       |      row_number() OVER (PARTITION BY pri ORDER BY y, o_orderkey) AS rn,
       |      COUNT(*) OVER (PARTITION BY pri) AS n
       |    FROM o)
       |  WHERE rn = (n + 1) // 2
       |), z AS (
       |  SELECT o.pri, abs(o.y - med.med) AS z
       |  FROM o JOIN med ON o.pri = med.pri
       |), g AS (
       |  SELECT pri, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(z) AS BIGINT) AS sz,
       |    SUM(CAST(z AS HUGEINT) * z) AS szz
       |  FROM z GROUP BY 1
       |), piv AS (
       |  SELECT $ns, $szs, $szzs FROM g
       |)
       |SELECT CAST($nTot AS BIGINT) AS n,
       |  (CAST(($nTot) - 5 AS DOUBLE) / 4.0) * (($num) / ($den)) AS w_stat
       |FROM piv""".stripMargin
  }

  // ---- Cohen's d effect size -------------------------------------------

  /** Cohen's d for order value between the deterministic o_custkey%2
    * split — the effect-size companion to the q180/q323 significance
    * tests (a tiny p-value with d≈0 is noise, not a finding). Exact
    * integer/decimal moments per arm pivoted to one row; means,
    * pooled SD and d are one fixed mirrored chain. */
  def cohensD(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select((col("o_custkey") % 2).as("v"), orderCents.as("y"))
    val g = o.groupBy(col("v"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("ss"))
    val piv = g.agg(
      sum(when(col("v") === 0, col("n"))).as("n0"),
      sum(when(col("v") === 0, col("s"))).as("s0"),
      sum(when(col("v") === 0, col("ss"))).as("ss0"),
      sum(when(col("v") === 1, col("n"))).as("n1"),
      sum(when(col("v") === 1, col("s"))).as("s1"),
      sum(when(col("v") === 1, col("ss"))).as("ss1"))
    def d(c: Column) = c.cast("double")
    def variance(n: String, s: String, ss: String): Column =
      (col(n).cast(dec) * col(ss) - col(s).cast(dec) * col(s)).cast("double") /
        (col(n) * (col(n) - 1)).cast("double")
    val m0 = d(col("s0")) / d(col("n0"))
    val m1 = d(col("s1")) / d(col("n1"))
    val pooled = (d(col("n0") - 1) * variance("n0", "s0", "ss0") +
      d(col("n1") - 1) * variance("n1", "s1", "ss1")) /
      d(col("n0") + col("n1") - 2)
    piv.select(col("n0"), col("n1"), m0.as("mean0"), m1.as("mean1"),
      ((m0 - m1) / sqrt(pooled)).as("cohens_d"))
  }

  private val cohensDSql = {
    def variance(n: String, s: String, ss: String) =
      s"CAST(CAST($n AS HUGEINT) * $ss - CAST($s AS HUGEINT) * $s AS DOUBLE)" +
        s" / CAST($n * ($n - 1) AS DOUBLE)"
    val m0 = "CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
    val m1 = "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    s"""WITH o AS (
       |  SELECT o_custkey % 2 AS v,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
       |  FROM orders
       |), g AS (
       |  SELECT v, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
       |    SUM(CAST(y AS HUGEINT) * y) AS ss
       |  FROM o GROUP BY 1
       |), piv AS (
       |  SELECT
       |    SUM(CASE WHEN v = 0 THEN n END) AS n0,
       |    SUM(CASE WHEN v = 0 THEN s END) AS s0,
       |    SUM(CASE WHEN v = 0 THEN ss END) AS ss0,
       |    SUM(CASE WHEN v = 1 THEN n END) AS n1,
       |    SUM(CASE WHEN v = 1 THEN s END) AS s1,
       |    SUM(CASE WHEN v = 1 THEN ss END) AS ss1
       |  FROM g
       |)
       |SELECT CAST(n0 AS BIGINT) AS n0, CAST(n1 AS BIGINT) AS n1,
       |  $m0 AS mean0, $m1 AS mean1,
       |  (($m0) - ($m1)) / sqrt(
       |    (CAST(n0 - 1 AS DOUBLE) * (${variance("n0", "s0", "ss0")})
       |     + CAST(n1 - 1 AS DOUBLE) * (${variance("n1", "s1", "ss1")}))
       |    / CAST(n0 + n1 - 2 AS DOUBLE)) AS cohens_d
       |FROM piv""".stripMargin
  }

  // ---- Jarque–Bera normality -------------------------------------------

  /** Jarque–Bera normality statistic of order value (whole dollars) per
    * priority segment: JB = n/6·(S² + K²/4) from skewness S and excess
    * kurtosis K. Power sums Σy..Σy⁴ are exact DECIMAL(38,0) (dollar
    * units keep Σy⁴ ≤ ~10³⁰ at any plausible scale); the central-moment
    * chain runs once per segment row, textually mirrored. */
  def jarqueBera(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"),
        expr("CAST(round(o_totalprice) AS BIGINT)").as("y"))
    val g = o.groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("y")).as("s1"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("s2"),
        sum((col("y").cast(dec) * col("y") * col("y")).cast(dec)).as("s3"),
        sum((col("y").cast(dec) * col("y") * col("y") * col("y")).cast(dec))
          .as("s4"))
    def d(c: Column) = c.cast("double")
    val nD = d(col("n"))
    val m = d(col("s1")) / nD
    val q2 = d(col("s2")) / nD
    val q3 = d(col("s3")) / nD
    val q4 = d(col("s4")) / nD
    val m2 = q2 - m * m
    val m3 = q3 - lit(3.0) * m * q2 + lit(2.0) * m * m * m
    val m4 = q4 - lit(4.0) * m * q3 + lit(6.0) * m * m * q2 -
      lit(3.0) * m * m * m * m
    val skew = m3 / (sqrt(m2) * m2)
    val exk = m4 / (m2 * m2) - lit(3.0)
    g.select(col("segment"), col("n"), skew.as("skewness"),
        exk.as("ex_kurtosis"),
        (nD / lit(6.0) * (skew * skew + exk * exk / lit(4.0))).as("jb"))
      .orderBy(col("segment"))
  }

  private val jarqueBeraSql = {
    val m = "(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))"
    val q2 = "(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))"
    val q3 = "(CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))"
    val q4 = "(CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE))"
    val m2 = s"($q2 - $m * $m)"
    val m3 = s"($q3 - 3.0 * $m * $q2 + 2.0 * $m * $m * $m)"
    val m4 = s"($q4 - 4.0 * $m * $q3 + 6.0 * $m * $m * $q2 - 3.0 * $m * $m * $m * $m)"
    val skew = s"($m3 / (sqrt($m2) * $m2))"
    val exk = s"($m4 / ($m2 * $m2) - 3.0)"
    s"""WITH o AS (
       |  SELECT o_orderpriority AS segment,
       |    CAST(round(o_totalprice) AS BIGINT) AS y
       |  FROM orders
       |), g AS (
       |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS s1,
       |    SUM(CAST(y AS HUGEINT) * y) AS s2,
       |    SUM(CAST(y AS HUGEINT) * y * y) AS s3,
       |    SUM(CAST(y AS HUGEINT) * y * y * y) AS s4
       |  FROM o GROUP BY 1
       |)
       |SELECT segment, n, $skew AS skewness, $exk AS ex_kurtosis,
       |  CAST(n AS DOUBLE) / 6.0 * ($skew * $skew + $exk * $exk / 4.0) AS jb
       |FROM g
       |ORDER BY segment""".stripMargin
  }

  // ---- readability (Automated Readability Index) ------------------------

  /** Corpus-level Automated Readability Index per source: ARI =
    * 4.71·(chars/words) + 0.5·(words/sentences) − 21.43 — the
    * transcendental-free readability grade (no syllable model), a
    * standard quality-mix signal for training-data curation. Characters
    * (non-space), words (non-empty tokens), and sentence marks are all
    * exact integer counts; the grade is one mirrored chain per source
    * row. One scan, no shuffle beyond the source rollup. */
  def readability(spark: SparkSession, dir: String): DataFrame = {
    val g = Catalog.load(spark, dir, "documents")
      .select(col("source"),
        expr("CAST(length(replace(text, ' ', '')) AS BIGINT)").as("chars"),
        expr("CAST(size(filter(split(text, ' '), t -> length(t) > 0)) AS BIGINT)")
          .as("words"),
        greatest(lit(1L),
          expr("CAST(length(text) - length(replace(text, '.', '')) AS BIGINT)"))
          .as("sents"))
      .groupBy(col("source"))
      .agg(count(lit(1)).as("n_docs"), sum(col("chars")).as("chars"),
        sum(col("words")).as("words"), sum(col("sents")).as("sentences"))
    def d(c: Column) = c.cast("double")
    g.select(col("source"), col("n_docs"), col("chars"), col("words"),
        col("sentences"),
        (lit(4.71) * (d(col("chars")) / d(col("words"))) +
          lit(0.5) * (d(col("words")) / d(col("sentences"))) - lit(21.43))
          .as("ari"))
      .orderBy(col("source"))
  }

  private val readabilitySql =
    """WITH d AS (
      |  SELECT source,
      |    CAST(length(replace(text, ' ', '')) AS BIGINT) AS chars,
      |    CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
      |      AS BIGINT) AS words,
      |    greatest(CAST(1 AS BIGINT),
      |      CAST(length(text) - length(replace(text, '.', '')) AS BIGINT))
      |      AS sents
      |  FROM documents
      |), g AS (
      |  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |    CAST(SUM(chars) AS BIGINT) AS chars,
      |    CAST(SUM(words) AS BIGINT) AS words,
      |    CAST(SUM(sents) AS BIGINT) AS sentences
      |  FROM d GROUP BY 1
      |)
      |SELECT source, n_docs, chars, words, sentences,
      |  4.71 * (CAST(chars AS DOUBLE) / CAST(words AS DOUBLE))
      |    + 0.5 * (CAST(words AS DOUBLE) / CAST(sentences AS DOUBLE))
      |    - 21.43 AS ari
      |FROM g
      |ORDER BY source""".stripMargin

  // ---- embedding isotropy ----------------------------------------------

  private def scaledArr =
    expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")

  /** Embedding isotropy WITHOUT a pairwise join: the mean pairwise dot
    * product over all n(n−1) ordered pairs equals (‖Σv‖² − Σ‖v‖²)/(n(n−1))
    * — two linear passes (per-dim sums, then one 64-row reduce) replace
    * the O(n²) comparison entirely, so the op costs the same at 100 TB
    * as a mean. Scaled-int exact sums; isotropy = mean cross-pair dot
    * over mean self dot (≈0 for a well-spread space, →1 as vectors
    * collapse onto one direction). */
  def isotropy(spark: SparkSession, dir: String): DataFrame = {
    val emb = Catalog.load(spark, dir, "embeddings")
    val v = emb.select(posexplode(scaledArr).as(Seq("dim", "xi")))
    val perDim = v.groupBy(col("dim"))
      .agg(sum(col("xi")).as("sd"),
        sum((col("xi").cast(dec) * col("xi")).cast(dec)).as("selfd"))
    val agg = perDim.agg(
      sum((col("sd").cast(dec) * col("sd")).cast(dec)).as("s2"),
      sum(col("selfd")).as("selfsum"))
    val n = emb.agg(count(lit(1)).as("n"))
    def d(c: Column) = c.cast("double")
    agg.crossJoin(broadcast(n))
      .select(col("n"),
        ((col("s2") - col("selfsum")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")).as("mean_cross_dot"),
        (d(col("selfsum")) / d(col("n"))).as("mean_self_dot"),
        (((col("s2") - col("selfsum")).cast("double") /
          (col("n") * (col("n") - 1)).cast("double")) /
          (d(col("selfsum")) / d(col("n")))).as("isotropy"))
  }

  private val isotropySql =
    """WITH v AS (
      |  SELECT CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
      |      AS BIGINT) AS xi,
      |    unnest(range(len(embedding))) AS i
      |  FROM embeddings
      |), per_dim AS (
      |  SELECT i, CAST(SUM(xi) AS BIGINT) AS sd,
      |    SUM(CAST(xi AS HUGEINT) * xi) AS selfd
      |  FROM v GROUP BY 1
      |), a AS (
      |  SELECT SUM(CAST(sd AS HUGEINT) * sd) AS s2,
      |    SUM(selfd) AS selfsum
      |  FROM per_dim
      |), nn AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM embeddings
      |)
      |SELECT n,
      |  CAST(s2 - selfsum AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE)
      |    AS mean_cross_dot,
      |  CAST(selfsum AS DOUBLE) / CAST(n AS DOUBLE) AS mean_self_dot,
      |  (CAST(s2 - selfsum AS DOUBLE) / CAST(n * (n - 1) AS DOUBLE))
      |    / (CAST(selfsum AS DOUBLE) / CAST(n AS DOUBLE)) AS isotropy
      |FROM a, nn""".stripMargin

  // ---- centroid silhouette ---------------------------------------------

  /** Median centroid-silhouette per label: s = (b−a)/max(a,b) with a =
    * distance to the own-label centroid and b = the nearest other
    * centroid — the "are these labels geometrically real" score. The
    * centroid never becomes a float: distances are compared as exact
    * integers scaled by n², D(v,l)·n_l² = Σ_d(n_l·x_d − S_ld)², so the
    * only IEEE steps are the final per-row divide/sqrt chain, and the
    * per-label summary is a rank-selected MEDIAN (a float mean across
    * rows would be accumulation-order-dependent). Cost: n·k·dim rows —
    * linear in the corpus, never pairwise. */
  def silhouette(spark: SparkSession, dir: String): DataFrame = {
    val emb = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("label").cast("long").as("label"),
        scaledArr.as("sv"))
    val v = emb.select(col("vec_id"), col("label"),
      posexplode(col("sv")).as(Seq("dim", "xi")))
    val nl = emb.groupBy(col("label")).agg(count(lit(1)).as("cn"))
      .select(col("label").as("clabel"), col("cn"))
    val cent = v.groupBy(col("label").as("clabel"), col("dim"))
      .agg(sum(col("xi")).as("s"))
      .join(nl, "clabel")
    // centroids are k·dim rows — broadcast, or the corpus-sized exploded
    // frame would shuffle onto 64 dim keys (maximal skew at scale)
    val diff = v.join(broadcast(cent), "dim")
      .withColumn("dv", col("cn") * col("xi") - col("s"))
      .groupBy(col("vec_id"), col("label"), col("clabel"), col("cn"))
      .agg(sum((col("dv").cast(dec) * col("dv")).cast(dec)).as("d2"))
      .withColumn("v",
        col("d2").cast("double") / (col("cn") * col("cn")).cast("double"))
    val ab = diff.groupBy(col("vec_id"), col("label"))
      .agg(min(when(col("clabel") === col("label"), col("v"))).as("a2"),
        min(when(col("clabel") =!= col("label"), col("v"))).as("b2"))
      .select(col("vec_id"), col("label"),
        ((sqrt(col("b2")) - sqrt(col("a2"))) /
          greatest(sqrt(col("a2")), sqrt(col("b2")))).as("sil"))
    val wl = Window.partitionBy(col("label")).orderBy(col("sil"), col("vec_id"))
    ab.withColumn("rn", row_number().over(wl))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("label"))))
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("label"), col("n"), col("sil").as("median_silhouette"))
      .orderBy(col("label"))
  }

  private val silhouetteSql =
    """WITH v AS (
      |  SELECT vec_id, CAST(label AS BIGINT) AS label,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
      |      AS BIGINT) AS xi,
      |    unnest(range(len(embedding))) AS i
      |  FROM embeddings
      |), nl AS (
      |  SELECT CAST(label AS BIGINT) AS clabel, CAST(COUNT(*) AS BIGINT) AS cn
      |  FROM embeddings GROUP BY 1
      |), cent AS (
      |  SELECT v.label AS clabel, v.i, CAST(SUM(v.xi) AS BIGINT) AS s, MIN(nl.cn) AS cn
      |  FROM v JOIN nl ON v.label = nl.clabel
      |  GROUP BY 1, 2
      |), dd AS (
      |  SELECT v.vec_id, v.label, c.clabel, MIN(c.cn) AS cn,
      |    SUM(CAST(c.cn * v.xi - c.s AS HUGEINT) * (c.cn * v.xi - c.s)) AS d2
      |  FROM v JOIN cent c ON v.i = c.i
      |  GROUP BY 1, 2, 3
      |), vals AS (
      |  SELECT vec_id, label, clabel,
      |    CAST(d2 AS DOUBLE) / CAST(cn * cn AS DOUBLE) AS v
      |  FROM dd
      |), ab AS (
      |  SELECT vec_id, label,
      |    MIN(CASE WHEN clabel = label THEN v END) AS a2,
      |    MIN(CASE WHEN clabel <> label THEN v END) AS b2
      |  FROM vals GROUP BY 1, 2
      |), s AS (
      |  SELECT vec_id, label,
      |    (sqrt(b2) - sqrt(a2)) / greatest(sqrt(a2), sqrt(b2)) AS sil
      |  FROM ab
      |), r AS (
      |  SELECT label, sil,
      |    row_number() OVER (PARTITION BY label ORDER BY sil, vec_id) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY label) AS BIGINT) AS n
      |  FROM s
      |)
      |SELECT label, n, sil AS median_silhouette
      |FROM r
      |WHERE rn = (n + 1) // 2
      |ORDER BY label""".stripMargin

  // ---- label-centroid cosine matrix ------------------------------------

  /** Pairwise cosine similarity between label centroids — the k×k
    * "which classes the space thinks are alike" matrix (q328's NN
    * confusion from geometry instead of retrieval). Cosine is scale-
    * invariant, so the UN-normalized per-dim label sums serve as exact
    * integer centroids: dot and norms are exact decimals, one mirrored
    * divide/sqrt chain per pair. k²·dim work — independent of corpus
    * size after the one linear sum pass. */
  def labelCentroidSim(spark: SparkSession, dir: String): DataFrame = {
    val v = Catalog.load(spark, dir, "embeddings")
      .select(col("label").cast("long").as("label"),
        posexplode(scaledArr).as(Seq("dim", "xi")))
    val cent = v.groupBy(col("label"), col("dim")).agg(sum(col("xi")).as("s"))
    val a = cent.select(col("label").as("label_a"), col("dim"), col("s").as("sa"))
    val b = cent.select(col("label").as("label_b"), col("dim"), col("s").as("sb"))
    a.join(b, Seq("dim")).filter(col("label_a") < col("label_b"))
      .groupBy(col("label_a"), col("label_b"))
      .agg(sum((col("sa").cast(dec) * col("sb")).cast(dec)).as("dot"),
        sum((col("sa").cast(dec) * col("sa")).cast(dec)).as("na"),
        sum((col("sb").cast(dec) * col("sb")).cast(dec)).as("nb"))
      .select(col("label_a"), col("label_b"),
        (col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos_sim"))
      .orderBy(col("label_a"), col("label_b"))
  }

  private val labelCentroidSimSql =
    """WITH v AS (
      |  SELECT CAST(label AS BIGINT) AS label,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
      |      AS BIGINT) AS xi,
      |    unnest(range(len(embedding))) AS i
      |  FROM embeddings
      |), cent AS (
      |  SELECT label, i, CAST(SUM(xi) AS BIGINT) AS s FROM v GROUP BY 1, 2
      |)
      |SELECT a.label AS label_a, b.label AS label_b,
      |  CAST(SUM(CAST(a.s AS HUGEINT) * b.s) AS DOUBLE) /
      |    (sqrt(CAST(SUM(CAST(a.s AS HUGEINT) * a.s) AS DOUBLE))
      |     * sqrt(CAST(SUM(CAST(b.s AS HUGEINT) * b.s) AS DOUBLE))) AS cos_sim
      |FROM cent a JOIN cent b ON a.i = b.i AND a.label < b.label
      |GROUP BY 1, 2
      |ORDER BY label_a, label_b""".stripMargin

  // ---- per-dimension clip calibration ----------------------------------

  /** Exact p1/p99 clip bounds per embedding dimension (scaled-int units)
    * — the calibration table int8 quantization (q78) clips against;
    * approximate quantiles drift per-run, these are rank-exact and
    * reproducible. Entirely integer: rank selection with the repo's
    * ceil-rank convention, zero float columns. The per-dim sort
    * shuffles on 64 keys; at corpus scale this is the one family where
    * exactness costs a per-dim sort — q93's approx variant is the
    * cheap path when ±ε is acceptable. */
  def dimClip(spark: SparkSession, dir: String): DataFrame = {
    val v = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"), posexplode(scaledArr).as(Seq("dim", "xi")))
    val w = Window.partitionBy(col("dim")).orderBy(col("xi"), col("vec_id"))
    v.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("dim"))))
      .groupBy(col("dim").cast("long").as("dim"))
      .agg(max(col("n")).as("n"),
        min(when(col("rn") === expr("(n * 1 + 99) div 100"), col("xi")))
          .as("p01_scaled"),
        min(when(col("rn") === expr("(n * 99 + 99) div 100"), col("xi")))
          .as("p99_scaled"))
      .orderBy(col("dim"))
  }

  private val dimClipSql =
    """WITH v AS (
      |  SELECT vec_id,
      |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000)
      |      AS BIGINT) AS xi,
      |    unnest(range(len(embedding))) AS i
      |  FROM embeddings
      |), r AS (
      |  SELECT i, xi,
      |    CAST(row_number() OVER (PARTITION BY i ORDER BY xi, vec_id)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY i) AS BIGINT) AS n
      |  FROM v
      |)
      |SELECT CAST(i AS BIGINT) AS dim, CAST(MAX(n) AS BIGINT) AS n,
      |  MIN(CASE WHEN rn = (n * 1 + 99) // 100 THEN xi END) AS p01_scaled,
      |  MIN(CASE WHEN rn = (n * 99 + 99) // 100 THEN xi END) AS p99_scaled
      |FROM r
      |GROUP BY 1
      |ORDER BY dim""".stripMargin

  // ---- revenue drawdown -------------------------------------------------

  /** Maximum drawdown of the daily-revenue series: the largest gap
    * between a day's revenue and the running peak before it — the
    * demand-collapse severity metric. Calendar-bounded prefix-max
    * window, exact cents, first day achieving the max (ties broken on
    * date). */
  def drawdown(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(orderCents).as("cents"))
    val w = Window.orderBy(col("d"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    daily.withColumn("peak", max(col("cents")).over(w))
      .withColumn("dd", col("peak") - col("cents"))
      .orderBy(col("dd").desc, col("d"))
      .limit(1)
      .select(col("d").as("dd_date"), col("cents").as("day_cents"),
        col("peak").as("peak_cents"), col("dd").as("max_drawdown_cents"))
  }

  private val drawdownSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), r AS (
      |  SELECT d, cents,
      |    CAST(MAX(cents) OVER (ORDER BY d
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS peak
      |  FROM daily
      |)
      |SELECT d AS dd_date, cents AS day_cents, peak AS peak_cents,
      |  peak - cents AS max_drawdown_cents
      |FROM r
      |ORDER BY peak - cents DESC, d
      |LIMIT 1""".stripMargin

  // ---- Bollinger control band breaches ----------------------------------

  /** Days whose revenue breaches the trailing-7-day mean ± 2σ control
    * band — the SPC anomaly counter, with the breach test kept ENTIRELY
    * in integers: (y−S/7)² > 4·(7·SS−S²)/49 cross-multiplies to
    * (7y−S)² > 4·(7·SS−S²), so no sqrt/float ever enters the
    * comparison. Trailing window excludes the current day (it is the
    * candidate anomaly); only full 7-day windows count. */
  def bollinger(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(orderCents).as("cents"))
    val w = Window.orderBy(col("d")).rowsBetween(-7, -1)
    val r = daily
      .withColumn("s7", sum(col("cents")).over(w))
      .withColumn("ss7", sum((col("cents").cast(dec) * col("cents")).cast(dec))
        .over(w))
      .withColumn("c7", count(lit(1)).over(w))
      .filter(col("c7") === 7)
      .withColumn("dev", lit(7) * col("cents") - col("s7"))
      .withColumn("lhs", (col("dev").cast(dec) * col("dev")).cast(dec))
      .withColumn("rhs",
        (lit(4).cast(dec) * (lit(7).cast(dec) * col("ss7") -
          (col("s7").cast(dec) * col("s7")).cast(dec))).cast(dec))
    r.agg(count(lit(1)).as("n_windows"),
      sum(when(col("dev") > 0 && col("lhs") > col("rhs"), 1L).otherwise(0L))
        .as("n_breach_hi"),
      sum(when(col("dev") < 0 && col("lhs") > col("rhs"), 1L).otherwise(0L))
        .as("n_breach_lo"))
  }

  private val bollingerSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), r AS (
      |  SELECT d, cents,
      |    SUM(cents) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |      AS s7,
      |    SUM(CAST(cents AS HUGEINT) * cents) OVER (ORDER BY d
      |      ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING) AS ss7,
      |    COUNT(*) OVER (ORDER BY d ROWS BETWEEN 7 PRECEDING AND 1 PRECEDING)
      |      AS c7
      |  FROM daily
      |), f AS (
      |  SELECT 7 * cents - s7 AS dev,
      |    CAST(7 * cents - s7 AS HUGEINT) * (7 * cents - s7) AS lhs,
      |    4 * (7 * ss7 - CAST(s7 AS HUGEINT) * s7) AS rhs
      |  FROM r WHERE c7 = 7
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_windows,
      |  CAST(SUM(CASE WHEN dev > 0 AND lhs > rhs THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_breach_hi,
      |  CAST(SUM(CASE WHEN dev < 0 AND lhs > rhs THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_breach_lo
      |FROM f""".stripMargin

  // ---- monthly stickiness ----------------------------------------------

  /** Monthly stickiness = mean DAU / MAU — the engagement-depth ratio
    * (what share of the monthly audience shows up on an average day).
    * Two count-distinct aggregates; stickiness = Σdau/(days·mau) keeps
    * the mean-DAU division exact-integer until ONE final divide. */
  def stickiness(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.load(spark, dir, "events")
      .select(date_trunc("month", col("ts")).cast("date").as("m"),
        to_date(col("ts")).as("d"), col("user_id"))
    val dau = ev.groupBy(col("m"), col("d"))
      .agg(countDistinct(col("user_id")).as("dau"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("days"), sum(col("dau")).as("sdau"))
    val mau = ev.groupBy(col("m"))
      .agg(countDistinct(col("user_id")).as("mau"))
    dau.join(mau, "m")
      .select(col("m"), col("days"), col("sdau"), col("mau"),
        (col("sdau").cast("double") / (col("days") * col("mau")).cast("double"))
          .as("stickiness"))
      .orderBy(col("m"))
  }

  private val stickinessSql =
    """WITH ev AS (
      |  SELECT CAST(date_trunc('month', ts) AS DATE) AS m,
      |    CAST(ts AS DATE) AS d, user_id
      |  FROM events
      |), dau AS (
      |  SELECT m, CAST(COUNT(*) AS BIGINT) AS days,
      |    CAST(SUM(dau) AS BIGINT) AS sdau
      |  FROM (SELECT m, d, COUNT(DISTINCT user_id) AS dau
      |        FROM ev GROUP BY 1, 2)
      |  GROUP BY m
      |), mau AS (
      |  SELECT m, CAST(COUNT(DISTINCT user_id) AS BIGINT) AS mau
      |  FROM ev GROUP BY 1
      |)
      |SELECT dau.m, days, sdau, mau,
      |  CAST(sdau AS DOUBLE) / CAST(days * mau AS DOUBLE) AS stickiness
      |FROM dau JOIN mau ON dau.m = mau.m
      |ORDER BY dau.m""".stripMargin

  // ---- effective tax margin by supplier nation --------------------------

  /** Effective tax share of net revenue by supplier nation — the fiscal
    * roll-up that exercises the l_tax column end-to-end. Discount and
    * tax rates are exact basis-point integers (round(rate·100)), so net
    * (cent·pct) and tax (cent·pct²) sums are exact decimals; share and
    * gross-dollars each get one mirrored division. Dimension joins
    * broadcast. */
  def taxMargin(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("dbp"),
        expr("CAST(round(l_tax * 100) AS BIGINT)").as("tbp"))
      .withColumn("net", col("cents") * (lit(100) - col("dbp")))
    val sup = Catalog.load(spark, dir, "supplier")
      .select(col("s_suppkey"), col("s_nationkey"))
    val nat = Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    li.join(broadcast(sup), col("l_suppkey") === col("s_suppkey"))
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name").as("nation"))
      .agg(count(lit(1)).as("n_lines"),
        sum(col("net").cast(dec)).as("netp"),
        sum((col("net").cast(dec) * col("tbp")).cast(dec)).as("taxpp"))
      .select(col("nation"), col("n_lines"),
        (col("netp").cast("double") / 10000.0).as("gross_dollars"),
        (col("taxpp").cast("double") / (col("netp").cast("double") * 100.0))
          .as("tax_share"))
      .orderBy(col("nation"))
  }

  private val taxMarginSql =
    """WITH li AS (
      |  SELECT l_suppkey,
      |    CAST(round(l_extendedprice * 100) AS BIGINT)
      |      * (100 - CAST(round(l_discount * 100) AS BIGINT)) AS net,
      |    CAST(round(l_tax * 100) AS BIGINT) AS tbp
      |  FROM lineitem
      |), g AS (
      |  SELECT n_name AS nation, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |    SUM(CAST(net AS HUGEINT)) AS netp,
      |    SUM(CAST(net AS HUGEINT) * tbp) AS taxpp
      |  FROM li
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1
      |)
      |SELECT nation, n_lines,
      |  CAST(netp AS DOUBLE) / 10000.0 AS gross_dollars,
      |  CAST(taxpp AS DOUBLE) / (CAST(netp AS DOUBLE) * 100.0) AS tax_share
      |FROM g
      |ORDER BY nation""".stripMargin

  // ---- Mann–Kendall trend test -----------------------------------------

  /** Shared Spark/DuckDB z text (the q169 wilson pattern: identical
    * literal text = identical correctly-rounded doubles): continuity-
    * corrected Mann–Kendall z from integer S and the tie-corrected
    * variance numerator (var_s = var_num/18). */
  private val mkZExpr =
    "CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)" +
      " / sqrt(CAST(var_num AS DOUBLE) / 18.0)" +
      " WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)" +
      " / sqrt(CAST(var_num AS DOUBLE) / 18.0)" +
      " ELSE 0.0 END"

  /** Mann–Kendall monotone-trend test on daily revenue — the
    * nonparametric "is demand actually drifting" companion to q203's
    * Theil–Sen slope (same robustness, this one gives the significance).
    * S = Σ_{i<j} sign(y_j − y_i) over the CALENDAR-BOUNDED daily
    * aggregate (the pairwise pass is days², independent of fact volume),
    * tie groups corrected exactly; S and the variance numerator are
    * exact integers, z is one shared-text chain. */
  def mannKendall(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(orderCents).as("c"))
      .localCheckpoint(eager = false) // three consumers: pairs×2 + ties
    val a = daily.select(col("d").as("d1"), col("c").as("c1"))
    val b = daily.select(col("d").as("d2"), col("c").as("c2"))
    val s = a.join(b, col("d1") < col("d2"))
      .agg(sum(signum(col("c2") - col("c1")).cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val ties = daily.groupBy(col("c")).agg(count(lit(1)).as("t"))
      .agg(sum(col("t")).as("n"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_corr"))
    s.crossJoin(broadcast(ties))
      .withColumn("var_num",
        col("n") * (col("n") - 1) * (col("n") * 2 + 5) - col("tie_corr"))
      .select(col("n"), col("s_stat"), col("var_num"),
        expr(mkZExpr).as("z"))
  }

  private val mannKendallSql =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS c
       |  FROM orders GROUP BY 1
       |), s AS (
       |  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
       |                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
       |    AS s_stat
       |  FROM daily a JOIN daily b ON a.d < b.d
       |), ties AS (
       |  SELECT CAST(SUM(t) AS BIGINT) AS n,
       |    CAST(SUM(t * (t - 1) * (2 * t + 5)) AS BIGINT) AS tie_corr
       |  FROM (SELECT c, CAST(COUNT(*) AS BIGINT) AS t FROM daily GROUP BY c)
       |), f AS (
       |  SELECT n, s_stat,
       |    n * (n - 1) * (2 * n + 5) - tie_corr AS var_num
       |  FROM s, ties
       |)
       |SELECT n, s_stat, var_num, $mkZExpr AS z
       |FROM f""".stripMargin

  // ---- Wald–Wolfowitz runs test ----------------------------------------

  /** Shared z text for the runs test ([[mkZExpr]] pattern): mixed
    * int/double promotion and left-association are identical in both
    * engines, so identical text = identical doubles. */
  // the leading CAST(n1 AS DOUBLE) is load-bearing: DuckDB parses the
  // bare literal 2.0 as DECIMAL, so "2.0 * n1 * n0 / n" would run in
  // decimal arithmetic there (observed 1e-8 drift vs Spark's double
  // chain); with one DOUBLE operand first, every later op promotes to
  // double identically in both engines
  private val runsZExpr =
    "(CAST(runs AS DOUBLE) - (1.0 + 2.0 * CAST(n1 AS DOUBLE) * n0 / n))" +
      " / sqrt((2.0 * CAST(n1 AS DOUBLE) * n0) * (2.0 * CAST(n1 AS DOUBLE) * n0 - n)" +
      " / (CAST(n AS DOUBLE) * n * (n - 1)))"

  /** Wald–Wolfowitz runs test on daily revenue vs its exact median —
    * "is the above/below-median sequence random, or does demand cluster
    * in regimes". Median by rank selection (lower median, ties to the
    * above side by the mirrored >= convention); runs counted with one
    * lag over the calendar-bounded series; z is one shared-text chain
    * over exact integer counts. */
  def runsTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(orderCents).as("c"))
    val med = daily
      .withColumn("rn", row_number().over(Window.orderBy(col("c"), col("d"))))
      .withColumn("n", count(lit(1)).over())
      .filter(col("rn") === expr("(n + 1) div 2"))
      .select(col("c").as("med"))
    val signs = daily.crossJoin(broadcast(med))
      .select(col("d"), when(col("c") >= col("med"), 1L).otherwise(0L).as("s"))
    val w = Window.orderBy(col("d"))
    signs.withColumn("chg",
        when(lag(col("s"), 1).over(w).isNotNull &&
          col("s") =!= lag(col("s"), 1).over(w), 1L).otherwise(0L))
      .agg(count(lit(1)).as("n"), sum(col("s")).as("n1"),
        (count(lit(1)) - sum(col("s"))).as("n0"),
        (sum(col("chg")) + 1L).as("runs"))
      .select(col("n"), col("n1"), col("n0"), col("runs"),
        expr(runsZExpr).as("z"))
  }

  private val runsTestSql =
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS c
       |  FROM orders GROUP BY 1
       |), med AS (
       |  SELECT c AS med FROM (
       |    SELECT c, row_number() OVER (ORDER BY c, d) AS rn,
       |      COUNT(*) OVER () AS n
       |    FROM daily)
       |  WHERE rn = (n + 1) // 2
       |), signs AS (
       |  SELECT d, CASE WHEN c >= med THEN 1 ELSE 0 END AS s
       |  FROM daily, med
       |), r AS (
       |  SELECT s, CASE WHEN lag(s) OVER (ORDER BY d) IS NOT NULL
       |                  AND s <> lag(s) OVER (ORDER BY d)
       |             THEN 1 ELSE 0 END AS chg
       |  FROM signs
       |), f AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(s) AS BIGINT) AS n1,
       |    CAST(COUNT(*) - SUM(s) AS BIGINT) AS n0,
       |    CAST(SUM(chg) + 1 AS BIGINT) AS runs
       |  FROM r
       |)
       |SELECT n, n1, n0, runs, $runsZExpr AS z
       |FROM f""".stripMargin

  // ---- source character-trigram similarity ------------------------------

  /** Pairwise cosine similarity between per-source character-trigram
    * profiles — q264's vocabulary Jaccard made sub-word (catches
    * same-language/different-tokenization mirrors and near-identical
    * boilerplate styles that word-level overlap misses). One corpus
    * explode into (source, trigram) counts, then a 20×20 profile join on
    * the trigram key; dots/norms exact decimals, one mirrored chain per
    * pair. */
  def sourceTrigramCos(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.load(spark, dir, "documents")
    import docs.sparkSession.implicits._
    // compiled partition-local trigram counting (the transform+substring
    // HOF formulation runs interpreted — the DedupOps.shingles lesson);
    // per-document pre-counts also shrink the shuffle to distinct
    // (source, trigram) rows per doc instead of one row per position
    val tri = docs.select(col("source"), col("text")).as[(String, String)]
      .mapPartitions { it =>
        it.flatMap { case (src, text) =>
          if (text == null || text.length < 3) Iterator.empty
          else {
            val m = new java.util.HashMap[String, Long](text.length * 2)
            var i = 0
            while (i <= text.length - 3) {
              val k = text.substring(i, i + 3)
              m.put(k, m.getOrDefault(k, 0L) + 1L)
              i += 1
            }
            val out = Array.newBuilder[(String, String, Long)]
            m.forEach((k, v) => out += ((src, k, v)))
            out.result().iterator
          }
        }
      }.toDF("source", "tri", "pc")
      .groupBy(col("source"), col("tri"))
      .agg(sum(col("pc")).as("c"))
      .localCheckpoint(eager = false) // norms + both join sides
    val norms = tri.groupBy(col("source"))
      .agg(sum((col("c").cast(dec) * col("c")).cast(dec)).as("n2"))
    val a = tri.select(col("source").as("source_a"), col("tri"), col("c").as("ca"))
    val b = tri.select(col("source").as("source_b"), col("tri"), col("c").as("cb"))
    a.join(b, Seq("tri")).filter(col("source_a") < col("source_b"))
      .groupBy(col("source_a"), col("source_b"))
      .agg(sum((col("ca").cast(dec) * col("cb")).cast(dec)).as("dot"))
      .join(broadcast(norms.select(col("source").as("source_a"), col("n2").as("na"))),
        "source_a")
      .join(broadcast(norms.select(col("source").as("source_b"), col("n2").as("nb"))),
        "source_b")
      .select(col("source_a"), col("source_b"),
        (col("dot").cast("double") /
          (sqrt(col("na").cast("double")) * sqrt(col("nb").cast("double"))))
          .as("cos_sim"))
      .orderBy(col("source_a"), col("source_b"))
  }

  private val sourceTrigramCosSql =
    """WITH tri AS (
      |  SELECT source, substr(text, i, 3) AS tri, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents, unnest(range(1, len(text) - 1)) AS u(i)
      |  WHERE len(text) >= 3
      |  GROUP BY 1, 2
      |), norms AS (
      |  SELECT source, SUM(CAST(c AS HUGEINT) * c) AS n2
      |  FROM tri GROUP BY 1
      |), dots AS (
      |  SELECT a.source AS source_a, b.source AS source_b,
      |    SUM(CAST(a.c AS HUGEINT) * b.c) AS dot
      |  FROM tri a JOIN tri b ON a.tri = b.tri AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT source_a, source_b,
      |  CAST(dot AS DOUBLE) /
      |    (sqrt(CAST(na.n2 AS DOUBLE)) * sqrt(CAST(nb.n2 AS DOUBLE))) AS cos_sim
      |FROM dots
      |JOIN norms na ON source_a = na.source
      |JOIN norms nb ON source_b = nb.source
      |ORDER BY source_a, source_b""".stripMargin

  // ---- return rate by brand with Wilson lower bound ---------------------

  /** q169's wilson pattern: identical formula text on both engines. */
  private val brandWilsonExpr =
    "(p + 3.8416 / (2 * n) - 1.96 * sqrt(p * (1 - p) / n" +
      " + 3.8416 / (4 * n * n))) / (1 + 3.8416 / n)"

  /** Return rate (l_returnflag = 'R') by brand with the Wilson 95% lower
    * bound — the defect-rate leaderboard that doesn't reward small-n
    * brands for luck (raw rate ranks a 2/3 brand above a 400/1000 one;
    * the Wilson bound does not). Integer counts from one broadcast-
    * joined aggregate; p and the bound are the shared-text chain. */
  def returnRate(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_returnflag"))
    val part = Catalog.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("p_brand").as("brand"))
      .agg(count(lit(1)).as("n"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"))
      .withColumn("p", col("n_returned").cast("double") / col("n"))
      .withColumn("wilson_lo", expr(brandWilsonExpr))
      .orderBy(col("brand"))
  }

  private val returnRateSql =
    s"""WITH g AS (
       |  SELECT p_brand AS brand, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
       |      AS BIGINT) AS n_returned
       |  FROM lineitem JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1
       |), r AS (
       |  SELECT brand, n, n_returned,
       |    CAST(n_returned AS DOUBLE) / n AS p
       |  FROM g
       |)
       |SELECT brand, n, n_returned, p, $brandWilsonExpr AS wilson_lo
       |FROM r
       |ORDER BY brand""".stripMargin

  // ---- open-order backlog curve ----------------------------------------

  /** Peak open-order backlog: +1 the day an order is placed, −1 the day
    * its LAST line ships, cumulated over the calendar — the WIP curve
    * ops teams staff against; reported as the top-10 backlog days.
    * Entirely integer; the cumulative window runs on the daily delta
    * aggregate (calendar-bounded). */
  def openOrders(spark: SparkSession, dir: String): DataFrame = {
    val placed = Catalog.load(spark, dir, "orders")
      .select(to_date(col("o_orderdate")).as("d"), lit(1L).as("delta"))
    val shipped = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("d"))
      .select(col("d"), lit(-1L).as("delta"))
    placed.unionAll(shipped)
      .groupBy(col("d")).agg(sum(col("delta")).as("delta"))
      .withColumn("backlog", sum(col("delta")).over(Window.orderBy(col("d"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .orderBy(col("backlog").desc, col("d"))
      .limit(10)
      .select(col("d"), col("backlog"))
  }

  private val openOrdersSql =
    """WITH deltas AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(1 AS BIGINT) AS delta
      |  FROM orders
      |  UNION ALL
      |  SELECT d, CAST(-1 AS BIGINT)
      |  FROM (SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS d
      |        FROM lineitem GROUP BY 1)
      |), daily AS (
      |  SELECT d, CAST(SUM(delta) AS BIGINT) AS delta FROM deltas GROUP BY 1
      |), c AS (
      |  SELECT d, CAST(SUM(delta) OVER (ORDER BY d
      |    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
      |    AS backlog
      |  FROM daily
      |)
      |SELECT d, backlog FROM c
      |ORDER BY backlog DESC, d
      |LIMIT 10""".stripMargin

  // ---- Gini concentration per segment -----------------------------------

  /** Gini coefficient of order value within each priority segment —
    * q174's global Lorenz concentration, segmented (uneven concentration
    * across segments breaks any "treat all priorities alike" capacity
    * model). Rank formula G = (2·Σi·yᵢ − (n+1)·Σy)/(n·Σy) with exact
    * integer rank-weighted sums (invariant under tie permutations), ONE
    * division per segment. */
  def giniSegment(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"), col("o_orderkey"),
        orderCents.as("y"))
    val w = Window.partitionBy(col("segment")).orderBy(col("y"), col("o_orderkey"))
    o.withColumn("i", row_number().over(w).cast("long"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("sy"),
        sum((col("i").cast(dec) * col("y")).cast(dec)).as("siy"))
      .select(col("segment"), col("n"),
        ((lit(2).cast(dec) * col("siy") -
          ((col("n") + 1).cast(dec) * col("sy")).cast(dec)).cast("double") /
          (col("n").cast(dec) * col("sy")).cast("double")).as("gini"))
      .orderBy(col("segment"))
  }

  private val giniSegmentSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS segment, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS y
      |  FROM orders
      |), r AS (
      |  SELECT segment, y,
      |    CAST(row_number() OVER (PARTITION BY segment ORDER BY y, o_orderkey)
      |      AS BIGINT) AS i
      |  FROM o
      |), g AS (
      |  SELECT segment, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(i AS HUGEINT) * y) AS siy
      |  FROM r GROUP BY 1
      |)
      |SELECT segment, n,
      |  CAST(2 * siy - CAST(n + 1 AS HUGEINT) * sy AS DOUBLE)
      |    / CAST(CAST(n AS HUGEINT) * sy AS DOUBLE) AS gini
      |FROM g
      |ORDER BY segment""".stripMargin

  // ---- weekly growth accounting ----------------------------------------

  /** Weekly growth accounting: every active user classified as NEW
    * (first-ever week), RETAINED (also active the prior week) or
    * RESURRECTED (returning after a gap), plus the week's CHURNED count
    * (active prior week, absent now) — the standard DAU/WAU growth
    * decomposition (new − churned = net growth). One distinct
    * (user, week) frame feeds everything; prior-week membership via a
    * self-equi-join on (user, week−7); all integer counts. */
  def growthAccounting(spark: SparkSession, dir: String): DataFrame = {
    val uw = Catalog.load(spark, dir, "events")
      .select(col("user_id"),
        expr("CAST(unix_date(CAST(date_trunc('WEEK', ts) AS DATE)) AS BIGINT)")
          .as("wk"))
      .distinct()
      .localCheckpoint(eager = false) // four consumers below
    val first = uw.groupBy(col("user_id")).agg(min(col("wk")).as("fw"))
    val prev = uw.select(col("user_id"), (col("wk") + 7).as("wk"))
    // classify in one pass: left join against prior-week membership (uw
    // is distinct, so the left join cannot fan out)
    val flags = uw.join(first, "user_id")
      .join(prev.withColumn("had_prev", lit(1L)), Seq("user_id", "wk"), "left")
      .select(col("wk"),
        when(col("fw") === col("wk"), 1L).otherwise(0L).as("is_new"),
        when(col("fw") < col("wk") && col("had_prev").isNotNull, 1L)
          .otherwise(0L).as("is_retained"),
        when(col("fw") < col("wk") && col("had_prev").isNull, 1L)
          .otherwise(0L).as("is_resurrected"))
      .groupBy(col("wk"))
      .agg(sum(col("is_new")).as("new_users"),
        sum(col("is_retained")).as("retained"),
        sum(col("is_resurrected")).as("resurrected"))
    val churned = uw.select(col("user_id"), (col("wk") + 7).as("wk"))
      .join(uw, Seq("user_id", "wk"), "left_anti")
      .groupBy(col("wk")).agg(count(lit(1)).as("churned"))
    flags.join(churned, Seq("wk"), "left")
      .select(col("wk"), col("new_users"), col("retained"), col("resurrected"),
        coalesce(col("churned"), lit(0L)).as("churned"))
      .orderBy(col("wk"))
  }

  private val growthAccountingSql =
    """WITH uw AS (
      |  SELECT DISTINCT user_id,
      |    CAST(date_trunc('week', CAST(ts AS DATE)) - DATE '1970-01-01'
      |      AS BIGINT) AS wk
      |  FROM events
      |), f AS (
      |  SELECT user_id, CAST(MIN(wk) AS BIGINT) AS fw FROM uw GROUP BY 1
      |), flags AS (
      |  SELECT uw.wk,
      |    CAST(SUM(CASE WHEN f.fw = uw.wk THEN 1 ELSE 0 END) AS BIGINT)
      |      AS new_users,
      |    CAST(SUM(CASE WHEN f.fw < uw.wk AND p.user_id IS NOT NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS retained,
      |    CAST(SUM(CASE WHEN f.fw < uw.wk AND p.user_id IS NULL
      |      THEN 1 ELSE 0 END) AS BIGINT) AS resurrected
      |  FROM uw
      |  JOIN f ON uw.user_id = f.user_id
      |  LEFT JOIN uw p ON p.user_id = uw.user_id AND p.wk + 7 = uw.wk
      |  GROUP BY 1
      |), ch AS (
      |  SELECT a.wk + 7 AS wk, CAST(COUNT(*) AS BIGINT) AS churned
      |  FROM uw a
      |  WHERE NOT EXISTS (SELECT 1 FROM uw b
      |                    WHERE b.user_id = a.user_id AND b.wk = a.wk + 7)
      |  GROUP BY 1
      |)
      |SELECT flags.wk, new_users, retained, resurrected,
      |  COALESCE(ch.churned, CAST(0 AS BIGINT)) AS churned
      |FROM flags LEFT JOIN ch ON flags.wk = ch.wk
      |ORDER BY flags.wk""".stripMargin

  // ---- ship-latency percentile bands ------------------------------------

  /** Exact p50/p90/p99 order→ship latency (days) per priority — the SLA
    * banding q278's min/mean/max summary can't support (the tail IS the
    * SLA). Rank selection with the repo's ceil-rank convention; integer
    * day values end-to-end, no floats at all. */
  def latencyPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val lat = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
      .join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority").as("priority"),
            to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("priority"), datediff(col("sd"), col("od")).cast("long")
        .as("days"), col("l_orderkey"))
    val w = Window.partitionBy(col("priority"))
      .orderBy(col("days"), col("l_orderkey"))
    lat.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("priority"))))
      .groupBy(col("priority"))
      .agg(max(col("n")).as("n"),
        min(when(col("rn") === expr("(n * 50 + 99) div 100"), col("days")))
          .as("p50_days"),
        min(when(col("rn") === expr("(n * 90 + 99) div 100"), col("days")))
          .as("p90_days"),
        min(when(col("rn") === expr("(n * 99 + 99) div 100"), col("days")))
          .as("p99_days"))
      .orderBy(col("priority"))
  }

  private val latencyPercentilesSql =
    """WITH lat AS (
      |  SELECT o_orderpriority AS priority,
      |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
      |      AS BIGINT) AS days,
      |    l_orderkey
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), r AS (
      |  SELECT priority, days,
      |    CAST(row_number() OVER (PARTITION BY priority ORDER BY days,
      |      l_orderkey) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY priority) AS BIGINT) AS n
      |  FROM lat
      |)
      |SELECT priority, CAST(MAX(n) AS BIGINT) AS n,
      |  MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN days END) AS p50_days,
      |  MIN(CASE WHEN rn = (n * 90 + 99) // 100 THEN days END) AS p90_days,
      |  MIN(CASE WHEN rn = (n * 99 + 99) // 100 THEN days END) AS p99_days
      |FROM r
      |GROUP BY priority
      |ORDER BY priority""".stripMargin

  // ---- order-priority transition matrix ---------------------------------

  /** Customer order-priority transition matrix: for consecutive orders
    * of the same customer, counts and row-normalized probabilities of
    * moving from priority A to priority B — q117's event-type Markov
    * chain on the purchase ledger (diagonal mass = priority loyalty).
    * One per-customer LEAD window, exact counts, one division per cell
    * against the broadcast row total. */
  def priorityTransitions(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val pairs = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        col("o_orderpriority").as("from_pri"))
      .withColumn("to_pri", lead(col("from_pri"), 1).over(w))
      .filter(col("to_pri").isNotNull)
      .groupBy(col("from_pri"), col("to_pri"))
      .agg(count(lit(1)).as("n"))
    val totals = pairs.groupBy(col("from_pri")).agg(sum(col("n")).as("row_n"))
    pairs.join(broadcast(totals), "from_pri")
      .select(col("from_pri"), col("to_pri"), col("n"),
        (col("n").cast("double") / col("row_n").cast("double")).as("p"))
      .orderBy(col("from_pri"), col("to_pri"))
  }

  private val priorityTransitionsSql =
    """WITH seq AS (
      |  SELECT o_orderpriority AS from_pri,
      |    lead(o_orderpriority) OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS to_pri
      |  FROM orders
      |), pairs AS (
      |  SELECT from_pri, to_pri, CAST(COUNT(*) AS BIGINT) AS n
      |  FROM seq WHERE to_pri IS NOT NULL
      |  GROUP BY 1, 2
      |), totals AS (
      |  SELECT from_pri, CAST(SUM(n) AS BIGINT) AS row_n FROM pairs GROUP BY 1
      |)
      |SELECT p.from_pri, p.to_pri, p.n,
      |  CAST(p.n AS DOUBLE) / CAST(t.row_n AS DOUBLE) AS p
      |FROM pairs p JOIN totals t ON p.from_pri = t.from_pri
      |ORDER BY p.from_pri, p.to_pri""".stripMargin

  // ---- A/B funnel comparison --------------------------------------------

  /** The q111 strict-order view→click→purchase funnel split by the
    * deterministic user_id%2 arms — step counts and per-step conversion
    * side by side, the actual readout an experiment on funnel UX ships.
    * Same single-window sequential-min recipe as q111; two mirrored
    * divisions per arm. */
  def abFunnel(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("view_us",
        min(when(col("event_type") === "view", col("ts_us"))).over(w))
      .withColumn("click_us",
        min(when(col("event_type") === "click" &&
          col("ts_us") >= col("view_us"), col("ts_us"))).over(w))
      .withColumn("purchase_us",
        min(when(col("event_type") === "purchase" &&
          col("ts_us") >= col("click_us"), col("ts_us"))).over(w))
      .filter(col("view_us").isNotNull)
      .groupBy(col("user_id"))
      .agg(min(col("click_us")).as("click_us"),
        min(col("purchase_us")).as("purchase_us"))
      .groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n_viewed"),
        sum(when(col("click_us").isNotNull, 1L).otherwise(0L)).as("n_clicked"),
        sum(when(col("purchase_us").isNotNull, 1L).otherwise(0L))
          .as("n_purchased"))
      .select(col("variant"), col("n_viewed"), col("n_clicked"),
        col("n_purchased"),
        (col("n_clicked").cast("double") / col("n_viewed").cast("double"))
          .as("view_to_click"),
        (col("n_purchased").cast("double") / col("n_clicked").cast("double"))
          .as("click_to_purchase"))
      .orderBy(col("variant"))
  }

  private val abFunnelSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us FROM events
      |), u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN event_type = 'view' THEN ts_us END)
      |      OVER (PARTITION BY user_id) AS view_us,
      |    ts_us, event_type
      |  FROM e
      |), c AS (
      |  SELECT user_id, view_us,
      |    MIN(CASE WHEN event_type = 'click' AND ts_us >= view_us
      |      THEN ts_us END) OVER (PARTITION BY user_id) AS click_us,
      |    ts_us, event_type
      |  FROM u
      |), p AS (
      |  SELECT user_id, view_us, click_us,
      |    MIN(CASE WHEN event_type = 'purchase' AND ts_us >= click_us
      |      THEN ts_us END) OVER (PARTITION BY user_id) AS purchase_us
      |  FROM c
      |), per_user AS (
      |  SELECT user_id, MIN(click_us) AS click_us,
      |    MIN(purchase_us) AS purchase_us
      |  FROM p WHERE view_us IS NOT NULL
      |  GROUP BY 1
      |)
      |SELECT user_id % 2 AS variant,
      |  CAST(COUNT(*) AS BIGINT) AS n_viewed,
      |  CAST(SUM(CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_clicked,
      |  CAST(SUM(CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchased,
      |  CAST(SUM(CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS view_to_click,
      |  CAST(SUM(CASE WHEN purchase_us IS NOT NULL THEN 1 ELSE 0 END)
      |    AS DOUBLE) /
      |    CAST(SUM(CASE WHEN click_us IS NOT NULL THEN 1 ELSE 0 END)
      |      AS DOUBLE) AS click_to_purchase
      |FROM per_user
      |GROUP BY 1
      |ORDER BY variant""".stripMargin

  // ---- account-balance decile boundaries --------------------------------

  /** Exact account-balance decile boundaries per market segment — the
    * credit-banding table (q217's lift analysis consumes deciles; this
    * emits the reproducible boundaries themselves). Balances as exact
    * cents (negatives included), rank-selected upper boundary of each
    * decile, zero float columns. */
  def balanceDeciles(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer")
      .select(col("c_mktsegment").as("segment"), col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("cents"), col("c_custkey"))
    val r = c.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("segment"))))
    val deciles = (1 to 9).map { d =>
      min(when(col("rn") === expr(s"(n * ${d * 10} + 99) div 100"),
        col("cents"))).as(s"d$d")
    }
    r.groupBy(col("segment"))
      .agg(max(col("n")).as("n"), deciles: _*)
      .orderBy(col("segment"))
  }

  private val balanceDecilesSql = {
    val cells = (1 to 9).map { d =>
      s"MIN(CASE WHEN rn = (n * ${d * 10} + 99) // 100 THEN cents END) AS d$d"
    }.mkString(",\n      |  ")
    s"""WITH c AS (
       |  SELECT c_mktsegment AS segment, c_custkey,
       |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents
       |  FROM customer
       |), r AS (
       |  SELECT segment, cents,
       |    CAST(row_number() OVER (PARTITION BY segment ORDER BY cents,
       |      c_custkey) AS BIGINT) AS rn,
       |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
       |  FROM c
       |)
       |SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
       |  $cells
       |FROM r
       |GROUP BY segment
       |ORDER BY segment""".stripMargin
  }

  // ---- weekday seasonality strength -------------------------------------

  /** Share of daily-revenue variance explained by the day-of-week
    * profile (η² of weekday on daily revenue) — the one number that
    * says whether q310's per-dow indices are signal or noise. The seven
    * weekday groups are FIXED, so between/total sums of squares pivot
    * to one row and evaluate as a parenthesized fixed chain over exact
    * integer moments (the levene recipe). */
  def dowStrength(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(orderCents).as("y"))
      .select(expr("CAST(weekday(d) + 1 AS INT)").as("dw"), col("y"))
    val g = daily.groupBy(col("dw"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("ss"))
    val pivCols = (1 to 7).flatMap { i =>
      Seq(sum(when(col("dw") === i, col("n"))).as(s"n$i"),
        sum(when(col("dw") === i, col("s"))).as(s"s$i"))
    } ++ Seq(sum(col("n")).as("nt"), sum(col("s")).as("st"),
      sum(col("ss")).as("sst_raw"))
    val piv = g.agg(pivCols.head, pivCols.tail: _*)
    def d(c: Column) = c.cast("double")
    val ssbTerms = (1 to 7).map { i =>
      d(col(s"s$i")) * d(col(s"s$i")) / d(col(s"n$i"))
    }.reduce(_ + _)
    val gm = d(col("st")) * d(col("st")) / d(col("nt"))
    val ssb = ssbTerms - gm
    val sst = d(col("sst_raw")) - gm
    piv.select(col("nt").as("n_days"), ssb.as("ssb"), sst.as("sst"),
      (ssb / sst).as("eta2_dow"))
  }

  private val dowStrengthSql = {
    val ssbTerms = (1 to 7).map { i =>
      s"(CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE))"
    }.mkString(" + ")
    val gm = "(CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))"
    val ssb = s"($ssbTerms - $gm)"
    val sst = s"(CAST(sst_raw AS DOUBLE) - $gm)"
    val ns = (1 to 7).map(i =>
      s"SUM(CASE WHEN dw = $i THEN n END) AS n$i").mkString(", ")
    val ss = (1 to 7).map(i =>
      s"SUM(CASE WHEN dw = $i THEN s END) AS s$i").mkString(", ")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS y
       |  FROM orders GROUP BY 1
       |), dd AS (
       |  SELECT isodow(d) AS dw, y FROM daily
       |), g AS (
       |  SELECT dw, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
       |    SUM(CAST(y AS HUGEINT) * y) AS ss
       |  FROM dd GROUP BY 1
       |), piv AS (
       |  SELECT $ns, $ss,
       |    CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
       |    SUM(ss) AS sst_raw
       |  FROM g
       |)
       |SELECT nt AS n_days, $ssb AS ssb, $sst AS sst,
       |  $ssb / $sst AS eta2_dow
       |FROM piv""".stripMargin
  }

  // ---- length-curriculum staging ----------------------------------------

  /** Curriculum staging by document length: the corpus split into four
    * rank-exact length quartile stages (short→long, the classic
    * "easy-first" curriculum heuristic) with per-stage doc/token/char
    * budgets — the shard manifest a staged training run consumes. All
    * integer except one mean division per stage. */
  def lengthCurriculum(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "documents")
      .select(col("doc_id"), col("n_chars"),
        expr("CAST(size(filter(split(text, ' '), t -> length(t) > 0)) AS BIGINT)")
          .as("tokens"))
    // corpus-sized rank via GlobalRank (range shuffle, no
    // single-partition window over the doc dimension); n is
    // driver-known from the same pass — the stage formula's integer
    // division is unchanged
    val (r, n) = graft.ops.GlobalRank.withRowNumberAndTotal(
      d, Seq(col("n_chars"), col("doc_id")), "rn")
    r.withColumn("stage", expr(s"1 + ((rn - 1) * 4) div ${n}L"))
      .groupBy(col("stage"))
      .agg(count(lit(1)).as("n_docs"), sum(col("tokens")).as("total_tokens"),
        min(col("n_chars")).as("min_chars"), max(col("n_chars")).as("max_chars"))
      .select(col("stage"), col("n_docs"), col("total_tokens"),
        col("min_chars"), col("max_chars"),
        (col("total_tokens").cast("double") / col("n_docs").cast("double"))
          .as("mean_tokens"))
      .orderBy(col("stage"))
  }

  private val lengthCurriculumSql =
    """WITH d AS (
      |  SELECT doc_id, n_chars,
      |    CAST(len(list_filter(string_split(text, ' '), t -> len(t) > 0))
      |      AS BIGINT) AS tokens
      |  FROM documents
      |), r AS (
      |  SELECT n_chars, tokens,
      |    CAST(row_number() OVER (ORDER BY n_chars, doc_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM d
      |), s AS (
      |  SELECT 1 + ((rn - 1) * 4) // n AS stage, n_chars, tokens FROM r
      |)
      |SELECT CAST(stage AS BIGINT) AS stage, CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(tokens) AS BIGINT) AS total_tokens,
      |  CAST(MIN(n_chars) AS BIGINT) AS min_chars,
      |  CAST(MAX(n_chars) AS BIGINT) AS max_chars,
      |  CAST(SUM(tokens) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS mean_tokens
      |FROM s
      |GROUP BY 1
      |ORDER BY stage""".stripMargin

  // ---- shard balance audit ----------------------------------------------

  /** Token-mass balance across a 64-way deterministic sharding
    * (doc_id % 64) — the pre-flight audit before writing training
    * shards: a skewed shard is a straggler for every epoch that reads
    * it. Integer masses; imbalance = max·shards/total (1.0 = perfectly
    * even). */
  def shardBalance(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "documents")
      .select((col("doc_id") % 64).as("shard"),
        expr("CAST(size(filter(split(text, ' '), t -> length(t) > 0)) AS BIGINT)")
          .as("tokens"))
      .groupBy(col("shard")).agg(sum(col("tokens")).as("mass"))
      .agg(count(lit(1)).as("n_shards"), min(col("mass")).as("min_tokens"),
        max(col("mass")).as("max_tokens"), sum(col("mass")).as("total_tokens"))
      .select(col("n_shards"), col("min_tokens"), col("max_tokens"),
        col("total_tokens"),
        ((col("max_tokens") * col("n_shards")).cast("double") /
          col("total_tokens").cast("double")).as("imbalance"))

  private val shardBalanceSql =
    """WITH m AS (
      |  SELECT doc_id % 64 AS shard,
      |    CAST(SUM(len(list_filter(string_split(text, ' '), t -> len(t) > 0)))
      |      AS BIGINT) AS mass
      |  FROM documents
      |  GROUP BY 1
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_shards,
      |  CAST(MIN(mass) AS BIGINT) AS min_tokens,
      |  CAST(MAX(mass) AS BIGINT) AS max_tokens,
      |  CAST(SUM(mass) AS BIGINT) AS total_tokens,
      |  CAST(MAX(mass) * COUNT(*) AS DOUBLE) / CAST(SUM(mass) AS DOUBLE)
      |    AS imbalance
      |FROM m""".stripMargin

  // ---- monthly brand share shift ----------------------------------------

  /** Top-20 month-over-month brand revenue-share movers — the mix-shift
    * report behind every "why did margin move" question (absolute
    * revenue can grow while share collapses). Shares are one division
    * per (brand, month) against the broadcast month total; the delta
    * subtracts two such shares (fixed mirrored chain); month arithmetic
    * stays integer (year·12+month index). */
  def shareShift(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
          .cast("long").as("midx"))
    val part = Catalog.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand").as("brand"))
    val bm = li.join(o, col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"), col("midx"))
      .agg(sum(col("cents")).as("cents"))
      .localCheckpoint(eager = false) // totals + current + previous
    val totals = bm.groupBy(col("midx")).agg(sum(col("cents")).as("tot"))
    val shares = bm.join(broadcast(totals), "midx")
      .select(col("brand"), col("midx"),
        (col("cents").cast("double") / col("tot").cast("double")).as("share"))
    val prev = shares.select(col("brand"), (col("midx") + 1).as("midx"),
      col("share").as("prev_share"))
    shares.join(prev, Seq("brand", "midx"))
      .select(col("brand"), col("midx"), col("share"), col("prev_share"),
        (col("share") - col("prev_share")).as("delta"))
      .orderBy(abs(col("delta")).desc, col("brand"), col("midx"))
      .limit(20)
  }

  private val shareShiftSql =
    """WITH bm AS (
      |  SELECT p_brand AS brand,
      |    CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT) AS midx,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |  GROUP BY 1, 2
      |), totals AS (
      |  SELECT midx, CAST(SUM(cents) AS BIGINT) AS tot FROM bm GROUP BY 1
      |), shares AS (
      |  SELECT brand, bm.midx,
      |    CAST(cents AS DOUBLE) / CAST(tot AS DOUBLE) AS share
      |  FROM bm JOIN totals ON bm.midx = totals.midx
      |)
      |SELECT a.brand, a.midx, a.share, b.share AS prev_share,
      |  a.share - b.share AS delta
      |FROM shares a
      |JOIN shares b ON a.brand = b.brand AND b.midx + 1 = a.midx
      |ORDER BY abs(a.share - b.share) DESC, a.brand, a.midx
      |LIMIT 20""".stripMargin

  // ---- reorder-interval median ------------------------------------------

  /** Median days between a customer's consecutive orders, per market
    * segment — the replenishment-cycle number behind reorder reminders
    * (q257's event inter-arrival, on the purchase ledger, segmented).
    * One per-customer LEAD window, exact day gaps, rank-selected
    * median per segment — zero float columns. */
  def reorderInterval(spark: SparkSession, dir: String): DataFrame = {
    val cust = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od"), col("o_orderkey"))
    val gaps = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"),
        to_date(col("o_orderdate")).as("od"))
      .withColumn("nd", lead(col("od"), 1).over(w))
      .withColumn("nk", lead(col("o_orderkey"), 1).over(w))
      .filter(col("nd").isNotNull)
      .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .select(col("segment"), datediff(col("nd"), col("od")).cast("long")
        .as("gap_days"), col("o_orderkey"), col("nk"))
    val ws = Window.partitionBy(col("segment"))
      .orderBy(col("gap_days"), col("o_orderkey"), col("nk"))
    gaps.withColumn("rn", row_number().over(ws))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("segment"))))
      .groupBy(col("segment"))
      .agg(max(col("n")).as("n_gaps"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("gap_days")))
          .as("median_gap_days"))
      .orderBy(col("segment"))
  }

  private val reorderIntervalSql =
    """WITH seq AS (
      |  SELECT o_custkey, o_orderkey, CAST(o_orderdate AS DATE) AS od,
      |    lead(CAST(o_orderdate AS DATE)) OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nd,
      |    lead(o_orderkey) OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS nk
      |  FROM orders
      |), gaps AS (
      |  SELECT c_mktsegment AS segment,
      |    CAST(nd - od AS BIGINT) AS gap_days, o_orderkey, nk
      |  FROM seq JOIN customer ON o_custkey = c_custkey
      |  WHERE nd IS NOT NULL
      |), r AS (
      |  SELECT segment, gap_days,
      |    CAST(row_number() OVER (PARTITION BY segment ORDER BY gap_days,
      |      o_orderkey, nk) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
      |  FROM gaps
      |)
      |SELECT segment, CAST(MAX(n) AS BIGINT) AS n_gaps,
      |  MIN(CASE WHEN rn = (n + 1) // 2 THEN gap_days END) AS median_gap_days
      |FROM r
      |GROUP BY segment
      |ORDER BY segment""".stripMargin

  // ---- second-digit Benford profile -------------------------------------

  /** Second-significant-digit distribution of order totals (in cents) —
    * the forensic companion to q160's first-digit test (fabricated
    * values pass first-digit Benford far more often than second-digit).
    * Digit extraction is pure integer/string arithmetic; one share
    * division per digit row. */
  def benford2(spark: SparkSession, dir: String): DataFrame = {
    val d2 = Catalog.load(spark, dir, "orders")
      .select(orderCents.as("c"))
      .filter(col("c") >= 10)
      .select(expr("CAST(substring(CAST(c AS STRING), 2, 1) AS BIGINT)")
        .as("digit"))
    val g = d2.groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = g.agg(sum(col("n")).as("t"))
    g.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("t").cast("double")).as("share"))
      .orderBy(col("digit"))
  }

  private val benford2Sql =
    """WITH d AS (
      |  SELECT CAST(substring(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
      |    AS VARCHAR), 2, 1) AS BIGINT) AS digit
      |  FROM orders
      |  WHERE CAST(round(o_totalprice * 100) AS BIGINT) >= 10
      |), g AS (
      |  SELECT digit, CAST(COUNT(*) AS BIGINT) AS n FROM d GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(n) AS BIGINT) AS t FROM g
      |)
      |SELECT digit, n, CAST(n AS DOUBLE) / CAST(t AS DOUBLE) AS share
      |FROM g, t
      |ORDER BY digit""".stripMargin

  // ---- PageRank convergence curve ---------------------------------------

  /** Per-round L1 movement of the q105 micro-integer PageRank — the
    * convergence diagnostic that says whether 5 rounds was enough (the
    * delta should be collapsing geometrically; a flat curve means the
    * damping/topology needs attention). Every rank is an exact BIGINT
    * micro-unit, so the per-round |Δ| sums are exact integers with one
    * answer on both engines; the oracle unrolls the identical
    * recurrence. */
  def rankConvergence(spark: SparkSession, dir: String): DataFrame = {
    // loop-invariant degree-joined edges + node frame from the shared
    // memoized TradeGraph build (same recurrence frames as q105/q172)
    val ed = graft.queries.TradeGraph.symDeg(spark, dir)
    val nodes = graft.queries.TradeGraph.nodes(spark, dir)
    var pr = nodes.withColumn("r", lit(1000000L))
    val deltas = (1 to 5).map { k =>
      val contrib = ed.join(pr.withColumnRenamed("n", "pn"), col("u") === col("pn"))
        .select(col("v"), expr("r div d").as("x"))
        .groupBy(col("v")).agg(sum(col("x")).as("s"))
      val next = nodes.join(contrib, col("n") === col("v"), "left")
        .select(col("n"), expr("150000L + (85 * coalesce(s, 0L)) div 100").as("r"))
        .localCheckpoint(eager = false)
      val delta = next.join(pr.select(col("n"), col("r").as("rp")), "n")
        .agg(sum(abs(col("r") - col("rp"))).as("l1_delta_micro"),
          sum(when(col("r") =!= col("rp"), 1L).otherwise(0L)).as("n_changed"))
        .select(lit(k.toLong).as("round"), col("l1_delta_micro"), col("n_changed"))
      pr = next
      delta
    }
    deltas.reduce(_ unionAll _).orderBy(col("round"))
  }

  private val rankConvergenceSql = {
    def round(k: Int) =
      s"""pr$k AS (
         |  SELECT n.n,
         |    CAST(150000 AS BIGINT)
         |      + CAST(85 * COALESCE(c.s, 0) AS BIGINT) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.v, SUM(p.r // d.d) AS s
         |    FROM edges e JOIN pr${k - 1} p ON e.u = p.n JOIN deg d ON e.u = d.u
         |    GROUP BY e.v) c ON c.v = n.n
         |)""".stripMargin
    def delta(k: Int) =
      s"""SELECT CAST($k AS BIGINT) AS round,
         |  CAST(SUM(ABS(a.r - b.r)) AS BIGINT) AS l1_delta_micro,
         |  CAST(SUM(CASE WHEN a.r <> b.r THEN 1 ELSE 0 END) AS BIGINT)
         |    AS n_changed
         |FROM pr$k a JOIN pr${k - 1} b ON a.n = b.n""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), edges AS (
       |  SELECT u, v FROM e0 UNION ALL SELECT v, u FROM e0
       |), deg AS (
       |  SELECT u, COUNT(*) AS d FROM edges GROUP BY 1
       |), nodes AS (
       |  SELECT DISTINCT u AS n FROM edges
       |), pr0 AS (
       |  SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), ${(1 to 5).map(round).mkString(", ")}
       |${(1 to 5).map(delta).mkString("\nUNION ALL\n")}
       |ORDER BY round""".stripMargin
  }

  // ---- stalest parts ----------------------------------------------------

  /** Top-20 stalest parts: days since each part's LAST shipment,
    * measured against the corpus max ship date — the dead-stock
    * report. One per-part max aggregate, broadcast global max, exact
    * day integers, TakeOrdered top-20. */
  def staleParts(spark: SparkSession, dir: String): DataFrame = {
    val lastShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(max(to_date(col("l_shipdate"))).as("last_ship"))
    val gmax = lastShip.agg(max(col("last_ship")).as("gmax"))
    lastShip.crossJoin(broadcast(gmax))
      .select(col("pk"), col("last_ship"),
        datediff(col("gmax"), col("last_ship")).cast("long").as("days_stale"))
      .orderBy(col("days_stale").desc, col("pk"))
      .limit(20)
  }

  private val stalePartsSql =
    """WITH ls AS (
      |  SELECT l_partkey AS pk, MAX(CAST(l_shipdate AS DATE)) AS last_ship
      |  FROM lineitem GROUP BY 1
      |), g AS (
      |  SELECT MAX(last_ship) AS gmax FROM ls
      |)
      |SELECT pk, last_ship,
      |  CAST(gmax - last_ship AS BIGINT) AS days_stale
      |FROM ls, g
      |ORDER BY days_stale DESC, pk
      |LIMIT 20""".stripMargin

  // ---- price-deviation histogram ----------------------------------------

  /** Histogram of line-price vs catalog-price deviation: basis points of
    * extendedprice/(quantity·retailprice), floored to 10%-wide buckets
    * — the pricing-integrity audit (bad feeds and fat-finger discounts
    * land in the tails). Entirely integer: the ratio is a BIGINT floor
    * division of exact cent products, never a float. */
  def priceDeviation(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ext"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      .filter(col("qty") > 0)
    val part = Catalog.load(spark, dir, "part")
      .select(col("p_partkey"),
        expr("CAST(round(p_retailprice * 100) AS BIGINT)").as("retail"))
    li.join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .select(expr("(ext * 10000) div (qty * retail)").as("bp"))
      .select((expr("bp div 1000")).as("bucket"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n_lines"))
      .orderBy(col("bucket"))
  }

  private val priceDeviationSql =
    """WITH li AS (
      |  SELECT l_partkey,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ext,
      |    CAST(round(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem
      |  WHERE CAST(round(l_quantity) AS BIGINT) > 0
      |), b AS (
      |  SELECT ((ext * 10000) // (qty * CAST(round(p_retailprice * 100)
      |    AS BIGINT))) // 1000 AS bucket
      |  FROM li JOIN part ON l_partkey = p_partkey
      |)
      |SELECT bucket, CAST(COUNT(*) AS BIGINT) AS n_lines
      |FROM b GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- same-day multi-order audit ---------------------------------------

  /** How often a customer places k orders on ONE calendar day — the
    * double-submit / dedup-at-ingest audit for the order feed. Two
    * stacked integer aggregates, nothing else. */
  def sameDayOrders(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey"), to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("k"))
      .groupBy(col("k")).agg(count(lit(1)).as("n_customer_days"))
      .orderBy(col("k"))

  private val sameDayOrdersSql =
    """WITH cd AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS k
      |  FROM orders GROUP BY 1, 2
      |)
      |SELECT k, CAST(COUNT(*) AS BIGINT) AS n_customer_days
      |FROM cd GROUP BY 1 ORDER BY k""".stripMargin

  // ---- term PMI / lift pairs --------------------------------------------

  /** Df window for the PMI miner: terms need df ≥ 5 (below that, lift
    * is noise) and df ≤ 90% of docs (true boilerplate carries no
    * signal), and docs holding more than 100 participating terms are
    * dropped — all three bounds mirrored in the oracle. Without them
    * the within-doc pair join is quadratic in hot-term count (the dedup
    * df-cap lesson applied to co-occurrence mining). The upper df bound
    * is RELATIVE so it means the same thing at every corpus scale. */
  private val PmiMinDf = 5L
  private val PmiMaxDocTerms = 100L

  /** Top-20 non-adjacent term pairs by co-occurrence lift
    * (n_ab·N/(n_a·n_b), exact micro-units — the PMI ranking without
    * the log, which preserves order) with support ≥ 3 — topic-pair
    * mining beyond q102's adjacent collocations. All counts exact; the
    * lift is a BIGINT floor division. */
  def termPmi(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.load(spark, dir, "documents")
    val nDocs = docs.agg(count(lit(1)).as("n_docs"))
    val dt = docs
      .select(col("doc_id"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .distinct()
    val mid = dt.groupBy(col("term")).agg(count(lit(1)).as("df"))
      .crossJoin(broadcast(nDocs))
      .filter(col("df") >= PmiMinDf && col("df") * 10 <= col("n_docs") * 9)
      .select(col("term"), col("df"))
    val capped = dt.join(mid, "term")
      .withColumn("dt_n", count(lit(1)).over(Window.partitionBy(col("doc_id"))))
      .filter(col("dt_n") <= PmiMaxDocTerms)
      .select(col("doc_id"), col("term"), col("df"))
    val pairs = capped.select(col("doc_id"), col("term").as("a"), col("df").as("dfa"))
      .join(capped.select(col("doc_id"), col("term").as("b"), col("df").as("dfb")),
        "doc_id")
      .filter(col("a") < col("b"))
      .groupBy(col("a"), col("b"))
      .agg(count(lit(1)).as("n_ab"), max(col("dfa")).as("n_a"),
        max(col("dfb")).as("n_b"))
      .filter(col("n_ab") >= 3)
    pairs.crossJoin(broadcast(nDocs))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        expr("(n_ab * n_docs * 1000000) div (n_a * n_b)").as("lift_micro"))
      .orderBy(col("lift_micro").desc, col("a"), col("b"))
      .limit(20)
  }

  private val termPmiSql =
    s"""WITH nd AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents
       |), dt AS (
       |  SELECT DISTINCT doc_id, term
       |  FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS term
       |        FROM documents)
       |  WHERE len(term) > 0
       |), mid AS (
       |  SELECT term, CAST(COUNT(*) AS BIGINT) AS df
       |  FROM dt, nd GROUP BY term, n_docs
       |  HAVING COUNT(*) >= $PmiMinDf AND COUNT(*) * 10 <= n_docs * 9
       |), capped AS (
       |  SELECT doc_id, term, df FROM (
       |    SELECT dt.doc_id, dt.term, mid.df,
       |      COUNT(*) OVER (PARTITION BY dt.doc_id) AS dt_n
       |    FROM dt JOIN mid ON dt.term = mid.term)
       |  WHERE dt_n <= $PmiMaxDocTerms
       |), pairs AS (
       |  SELECT x.term AS a, y.term AS b, CAST(COUNT(*) AS BIGINT) AS n_ab,
       |    CAST(MAX(x.df) AS BIGINT) AS n_a, CAST(MAX(y.df) AS BIGINT) AS n_b
       |  FROM capped x JOIN capped y ON x.doc_id = y.doc_id AND x.term < y.term
       |  GROUP BY 1, 2
       |  HAVING COUNT(*) >= 3
       |)
       |SELECT a, b, n_ab, n_a, n_b,
       |  (n_ab * n_docs * 1000000) // (n_a * n_b) AS lift_micro
       |FROM pairs, nd
       |ORDER BY lift_micro DESC, a, b
       |LIMIT 20""".stripMargin

  // ---- regional revenue index -------------------------------------------

  /** Revenue-vs-customer-base index per region: (region revenue share) /
    * (region customer share), computed as one exact integer
    * cross-multiplication with a single final division — >1 means the
    * region outspends its headcount. Dimension joins broadcast. */
  def regionIndex(spark: SparkSession, dir: String): DataFrame = {
    val nat = Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val reg = Catalog.load(spark, dir, "region")
      .select(col("r_regionkey"), col("r_name"))
    val custRegion = Catalog.load(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(reg), col("n_regionkey") === col("r_regionkey"))
      .select(col("c_custkey"), col("r_name").as("region"))
    val rev = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), orderCents.as("cents"))
      .join(custRegion, col("o_custkey") === col("c_custkey"))
      .groupBy(col("region")).agg(sum(col("cents")).as("cents"))
    val cust = custRegion.groupBy(col("region")).agg(count(lit(1)).as("n_cust"))
    val joined = rev.join(cust, "region").localCheckpoint(eager = false)
    val totals = joined.agg(sum(col("cents")).as("tc"), sum(col("n_cust")).as("tn"))
    joined.crossJoin(broadcast(totals))
      .select(col("region"), col("cents"), col("n_cust"),
        ((col("cents").cast(dec) * col("tn")).cast("double") /
          (col("tc").cast(dec) * col("n_cust")).cast("double")).as("index"))
      .orderBy(col("region"))
  }

  private val regionIndexSql =
    """WITH cr AS (
      |  SELECT c_custkey, r_name AS region
      |  FROM customer
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |), g AS (
      |  SELECT region,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders JOIN cr ON o_custkey = c_custkey
      |  GROUP BY 1
      |), cn AS (
      |  SELECT region, CAST(COUNT(*) AS BIGINT) AS n_cust FROM cr GROUP BY 1
      |), j AS (
      |  SELECT g.region, cents, n_cust FROM g JOIN cn ON g.region = cn.region
      |), t AS (
      |  SELECT CAST(SUM(cents) AS BIGINT) AS tc,
      |    CAST(SUM(n_cust) AS BIGINT) AS tn
      |  FROM j
      |)
      |SELECT region, cents, n_cust,
      |  CAST(CAST(cents AS HUGEINT) * tn AS DOUBLE)
      |    / CAST(CAST(tc AS HUGEINT) * n_cust AS DOUBLE) AS index
      |FROM j, t
      |ORDER BY region""".stripMargin

  // ---- balance vs spend correlation -------------------------------------

  /** Pearson correlation between a customer's account balance and their
    * lifetime order spend — q292's one-scan moment recipe applied
    * across a join (does credit standing predict spend at all).
    * Customers without orders count as zero spend (left join, the
    * honest frame). Exact decimal moments, one mirrored chain. */
  def balanceSpendCorr(spark: SparkSession, dir: String): DataFrame = {
    val spend = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey")).agg(sum(orderCents).as("spend"))
    val c = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("bal"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(col("bal"), coalesce(col("spend"), lit(0L)).as("spend"))
    val m = c.agg(count(lit(1)).as("n"),
      sum(col("bal")).as("sx"), sum(col("spend")).as("sy"),
      sum((col("bal").cast(dec) * col("bal")).cast(dec)).as("sxx"),
      sum((col("spend").cast(dec) * col("spend")).cast(dec)).as("syy"),
      sum((col("bal").cast(dec) * col("spend")).cast(dec)).as("sxy"))
    def d(c2: Column) = c2.cast("double")
    val n = col("n").cast(dec)
    m.select(col("n"),
      ((n * col("sxy") - col("sx").cast(dec) * col("sy")).cast("double") /
        (sqrt((n * col("sxx") - col("sx").cast(dec) * col("sx")).cast("double")) *
          sqrt((n * col("syy") - col("sy").cast(dec) * col("sy")).cast("double"))))
        .as("pearson_r"))
  }

  private val balanceSpendCorrSql =
    """WITH c AS (
      |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
      |    COALESCE(s.spend, CAST(0 AS BIGINT)) AS spend
      |  FROM customer
      |  LEFT JOIN (SELECT o_custkey,
      |               CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
      |                 AS BIGINT) AS spend
      |             FROM orders GROUP BY 1) s ON c_custkey = s.o_custkey
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(bal) AS BIGINT) AS sx, CAST(SUM(spend) AS BIGINT) AS sy,
      |    SUM(CAST(bal AS HUGEINT) * bal) AS sxx,
      |    SUM(CAST(spend AS HUGEINT) * spend) AS syy,
      |    SUM(CAST(bal AS HUGEINT) * spend) AS sxy
      |  FROM c
      |)
      |SELECT n,
      |  CAST(CAST(n AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |    / (sqrt(CAST(CAST(n AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
      |        AS DOUBLE))
      |     * sqrt(CAST(CAST(n AS HUGEINT) * syy - CAST(sy AS HUGEINT) * sy
      |        AS DOUBLE))) AS pearson_r
      |FROM m""".stripMargin

  // ---- single-source supply risk ----------------------------------------

  /** Decile histogram of each part's top-supplier volume share — the
    * single-source-risk profile (decile 9-10 = parts that die with one
    * supplier). Share deciles computed by integer floor division of
    * exact quantity sums; no float column anywhere. */
  def singleSourceRisk(spark: SparkSession, dir: String): DataFrame = {
    val ps = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"), col("l_suppkey"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"))
    ps.groupBy(col("pk"))
      .agg(max(col("q")).as("maxq"), sum(col("q")).as("totq"))
      .select(least(expr("(maxq * 10) div totq"), lit(9L)).as("decile"))
      .groupBy(col("decile")).agg(count(lit(1)).as("n_parts"))
      .orderBy(col("decile"))
  }

  private val singleSourceRiskSql =
    """WITH ps AS (
      |  SELECT l_partkey AS pk, l_suppkey,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2
      |), agg AS (
      |  SELECT pk, CAST(MAX(q) AS BIGINT) AS maxq,
      |    CAST(SUM(q) AS BIGINT) AS totq
      |  FROM ps GROUP BY 1
      |)
      |SELECT least((maxq * 10) // totq, 9) AS decile,
      |  CAST(COUNT(*) AS BIGINT) AS n_parts
      |FROM agg GROUP BY 1 ORDER BY decile""".stripMargin

  // ---- weekend-effect Welch t -------------------------------------------

  /** Welch t statistic for weekend vs weekday DAILY revenue — the
    * day-mix contrast behind staffing and campaign timing (unequal
    * variances assumed, hence Welch not pooled). Two pivoted exact
    * moment sets; the t is one fixed mirrored chain. */
  def weekendWelch(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(orderCents).as("y"))
      .select(when(expr("weekday(d) + 1") >= 6, 1L).otherwise(0L).as("we"),
        col("y"))
    val g = daily.groupBy(col("we"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("ss"))
    val piv = g.agg(
      sum(when(col("we") === 0, col("n"))).as("n0"),
      sum(when(col("we") === 0, col("s"))).as("s0"),
      sum(when(col("we") === 0, col("ss"))).as("ss0"),
      sum(when(col("we") === 1, col("n"))).as("n1"),
      sum(when(col("we") === 1, col("s"))).as("s1"),
      sum(when(col("we") === 1, col("ss"))).as("ss1"))
    def d(c2: Column) = c2.cast("double")
    def variance(n: String, s: String, ss: String): Column =
      (col(n).cast(dec) * col(ss) - col(s).cast(dec) * col(s)).cast("double") /
        (col(n) * (col(n) - 1)).cast("double")
    val m0 = d(col("s0")) / d(col("n0"))
    val m1 = d(col("s1")) / d(col("n1"))
    piv.select(col("n0").as("n_weekday"), col("n1").as("n_weekend"),
      m0.as("mean_weekday_cents"), m1.as("mean_weekend_cents"),
      ((m1 - m0) / sqrt(variance("n1", "s1", "ss1") / d(col("n1")) +
        variance("n0", "s0", "ss0") / d(col("n0")))).as("welch_t"))
  }

  private val weekendWelchSql = {
    def variance(n: String, s: String, ss: String) =
      s"CAST(CAST($n AS HUGEINT) * $ss - CAST($s AS HUGEINT) * $s AS DOUBLE)" +
        s" / CAST($n * ($n - 1) AS DOUBLE)"
    val m0 = "CAST(s0 AS DOUBLE) / CAST(n0 AS DOUBLE)"
    val m1 = "CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS y
       |  FROM orders GROUP BY 1
       |), f AS (
       |  SELECT CASE WHEN isodow(d) >= 6 THEN 1 ELSE 0 END AS we, y
       |  FROM daily
       |), g AS (
       |  SELECT we, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(y) AS BIGINT) AS s,
       |    SUM(CAST(y AS HUGEINT) * y) AS ss
       |  FROM f GROUP BY 1
       |), piv AS (
       |  SELECT
       |    SUM(CASE WHEN we = 0 THEN n END) AS n0,
       |    SUM(CASE WHEN we = 0 THEN s END) AS s0,
       |    SUM(CASE WHEN we = 0 THEN ss END) AS ss0,
       |    SUM(CASE WHEN we = 1 THEN n END) AS n1,
       |    SUM(CASE WHEN we = 1 THEN s END) AS s1,
       |    SUM(CASE WHEN we = 1 THEN ss END) AS ss1
       |  FROM g
       |)
       |SELECT CAST(n0 AS BIGINT) AS n_weekday, CAST(n1 AS BIGINT) AS n_weekend,
       |  $m0 AS mean_weekday_cents, $m1 AS mean_weekend_cents,
       |  (($m1) - ($m0)) / sqrt(${variance("n1", "s1", "ss1")}
       |    / CAST(n1 AS DOUBLE) + ${variance("n0", "s0", "ss0")}
       |    / CAST(n0 AS DOUBLE)) AS welch_t
       |FROM piv""".stripMargin
  }

  // ---- order/line status consistency ------------------------------------

  /** (order status × line status) contingency counts — the referential
    * state-machine audit: an 'F' (finished) order carrying 'O' (open)
    * lines is a pipeline bug upstream. One joined aggregate, integer
    * counts, share against the broadcast total. */
  def statusFlow(spark: SparkSession, dir: String): DataFrame = {
    val g = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderstatus"))
      .join(Catalog.load(spark, dir, "lineitem")
          .select(col("l_orderkey"), col("l_linestatus")),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(col("o_orderstatus"), col("l_linestatus"))
      .agg(count(lit(1)).as("n_lines"))
    val tot = g.agg(sum(col("n_lines")).as("t"))
    g.crossJoin(broadcast(tot))
      .select(col("o_orderstatus"), col("l_linestatus"), col("n_lines"),
        (col("n_lines").cast("double") / col("t").cast("double")).as("share"))
      .orderBy(col("o_orderstatus"), col("l_linestatus"))
  }

  private val statusFlowSql =
    """WITH g AS (
      |  SELECT o_orderstatus, l_linestatus, CAST(COUNT(*) AS BIGINT) AS n_lines
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2
      |), t AS (
      |  SELECT CAST(SUM(n_lines) AS BIGINT) AS t FROM g
      |)
      |SELECT o_orderstatus, l_linestatus, n_lines,
      |  CAST(n_lines AS DOUBLE) / CAST(t AS DOUBLE) AS share
      |FROM g, t
      |ORDER BY o_orderstatus, l_linestatus""".stripMargin

  // ---- quantity-discount interaction ------------------------------------

  /** Mean discount (basis points, exact micro-units) by order quantity —
    * does the discount schedule actually slope with volume. The mean is
    * an INTEGER floor division in micro-units (sum·10⁶ div n), so the
    * whole table is float-free and drift-proof. */
  def qtyDiscount(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .select(expr("CAST(round(l_quantity) AS BIGINT)").as("qty"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("dbp"))
      .groupBy(col("qty"))
      .agg(count(lit(1)).as("n_lines"), sum(col("dbp")).as("sum_dbp"))
      .select(col("qty"), col("n_lines"),
        expr("(sum_dbp * 1000000) div n_lines").as("mean_dbp_micro"))
      .orderBy(col("qty"))

  private val qtyDiscountSql =
    """WITH g AS (
      |  SELECT CAST(round(l_quantity) AS BIGINT) AS qty,
      |    CAST(COUNT(*) AS BIGINT) AS n_lines,
      |    CAST(SUM(CAST(round(l_discount * 100) AS BIGINT)) AS BIGINT)
      |      AS sum_dbp
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT qty, n_lines, (sum_dbp * 1000000) // n_lines AS mean_dbp_micro
      |FROM g
      |ORDER BY qty""".stripMargin

  // ---- nation trade-flow corridors --------------------------------------

  /** Top-20 customer-nation → supplier-nation revenue corridors — the
    * trade-flow matrix behind sourcing strategy (TPC-H Q7's essence as
    * a leaderboard, all nation pairs not two fixed ones). Both
    * dimension paths broadcast; exact cents; TakeOrdered top-20. */
  def tradeMatrix(spark: SparkSession, dir: String): DataFrame = {
    val nat = Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val custNat = Catalog.load(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cust_nation"))
    val suppNat = Catalog.load(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("supp_nation"))
    Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNat), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("cust_nation"), col("supp_nation"))
      .agg(count(lit(1)).as("n_lines"), sum(col("cents")).as("cents"))
      .orderBy(col("cents").desc, col("cust_nation"), col("supp_nation"))
      .limit(20)
  }

  private val tradeMatrixSql =
    """WITH f AS (
      |  SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |)
      |SELECT cust_nation, supp_nation, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(cents) AS BIGINT) AS cents
      |FROM f
      |GROUP BY 1, 2
      |ORDER BY cents DESC, cust_nation, supp_nation
      |LIMIT 20""".stripMargin

  // ---- first-order priority vs repeat -----------------------------------

  /** Repeat-purchase rate cohorted by the customer's FIRST order
    * priority — does the entry order's urgency predict loyalty. First
    * order by (date, key) rank; repeat = ≥2 lifetime orders; integer
    * counts, one rate division. */
  def firstPriorityRepeat(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        col("o_orderpriority"))
      .withColumn("rn", row_number().over(w))
      .withColumn("n_orders", count(lit(1)).over(
        Window.partitionBy(col("o_custkey"))))
      .filter(col("rn") === 1)
      .groupBy(col("o_orderpriority").as("first_priority"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("n_repeat"))
      .select(col("first_priority"), col("n_customers"), col("n_repeat"),
        (col("n_repeat").cast("double") / col("n_customers").cast("double"))
          .as("repeat_rate"))
      .orderBy(col("first_priority"))
  }

  private val firstPriorityRepeatSql =
    """WITH r AS (
      |  SELECT o_custkey, o_orderpriority,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
      |  FROM orders
      |)
      |SELECT o_orderpriority AS first_priority,
      |  CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_repeat,
      |  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS repeat_rate
      |FROM r
      |WHERE rn = 1
      |GROUP BY 1
      |ORDER BY first_priority""".stripMargin

  // ---- acquisition cohort quality ---------------------------------------

  /** Mean FIRST-order value by acquisition month (the month of each
    * customer's first order) — is acquisition quality drifting. The
    * mean is an exact integer micro-cent floor division; first order by
    * (date, key) rank. */
  def cohortQuality(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        orderCents.as("cents"))
      .withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1)
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(count(lit(1)).as("n_customers"), sum(col("cents")).as("sum_cents"))
      .select(col("m"), col("n_customers"),
        expr("(sum_cents * 1000000) div n_customers").as("mean_first_micro"))
      .orderBy(col("m"))
  }

  private val cohortQualitySql =
    """WITH f AS (
      |  SELECT o_custkey, o_orderdate,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS rn
      |  FROM orders
      |), g AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(COUNT(*) AS BIGINT) AS n_customers,
      |    CAST(SUM(cents) AS BIGINT) AS sum_cents
      |  FROM f WHERE rn = 1
      |  GROUP BY 1
      |)
      |SELECT m, n_customers,
      |  (sum_cents * 1000000) // n_customers AS mean_first_micro
      |FROM g
      |ORDER BY m""".stripMargin

  // ---- realized discount rate -------------------------------------------

  /** Monthly realized discount rate: revenue-weighted mean discount in
    * exact micro-units — what the discount schedule actually COSTS each
    * month (a flat schedule with shifting mix still moves this).
    * rate_micro = Σ(ext·dbp)·10⁴ div Σext (dbp = discount basis points),
    * entirely integer. */
  def realizedDiscount(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("ext"),
        expr("CAST(round(l_discount * 100) AS BIGINT)").as("dbp"))
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        date_trunc("month", col("o_orderdate")).cast("date").as("m"))
    li.join(o, col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_lines"), sum(col("ext")).as("ext_cents"),
        sum((col("ext").cast(dec) * col("dbp")).cast(dec)).as("ext_dbp"))
      .select(col("m"), col("n_lines"), col("ext_cents"),
        expr("CAST((ext_dbp * 10000) div ext_cents AS BIGINT)")
          .as("rate_micro"))
      .orderBy(col("m"))
  }

  private val realizedDiscountSql =
    """WITH j AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS ext,
      |    CAST(round(l_discount * 100) AS BIGINT) AS dbp
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), g AS (
      |  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |    CAST(SUM(ext) AS BIGINT) AS ext_cents,
      |    SUM(CAST(ext AS HUGEINT) * dbp) AS ext_dbp
      |  FROM j GROUP BY 1
      |)
      |SELECT m, n_lines, ext_cents,
      |  CAST((ext_dbp * 10000) // ext_cents AS BIGINT) AS rate_micro
      |FROM g
      |ORDER BY m""".stripMargin

  // ---- recency-weighted spend score -------------------------------------

  /** Top-20 customers by hyperbolically recency-weighted spend: each
    * order contributes cents·10⁶/(1+days_ago) — an exact-integer decay
    * score (the usual exp(−λt) needs a transcendental; 1/(1+t) ranks
    * the same way and every term is a BIGINT floor division, so the
    * score is drift-proof). days_ago measured against the corpus max
    * order date (broadcast). */
  def recencyScore(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        orderCents.as("cents"))
    val gmax = o.agg(max(col("od")).as("gmax"))
    o.crossJoin(broadcast(gmax))
      .select(col("o_custkey"),
        expr("(cents * 1000000) div (1 + datediff(gmax, od))").as("term"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("term")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("o_custkey"))
      .limit(20)
  }

  private val recencyScoreSql =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), g AS (
      |  SELECT MAX(od) AS gmax FROM o
      |), t AS (
      |  SELECT o_custkey,
      |    (cents * 1000000) // (1 + CAST(gmax - od AS BIGINT)) AS term
      |  FROM o, g
      |)
      |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(term) AS BIGINT) AS score_micro
      |FROM t
      |GROUP BY 1
      |ORDER BY score_micro DESC, o_custkey
      |LIMIT 20""".stripMargin

  // ---- order value median by basket size --------------------------------

  /** Exact median order value by basket size (line count) — does a
    * bigger basket mean a bigger ticket, in medians (means are whale-
    * distorted exactly where this question matters). Rank-selected
    * integer cents per line-count group. */
  def basketValueMedian(spark: SparkSession, dir: String): DataFrame = {
    val sizes = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey")).agg(count(lit(1)).as("n_lines"))
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), orderCents.as("cents"))
      .join(sizes, col("o_orderkey") === col("l_orderkey"))
    val w = Window.partitionBy(col("n_lines"))
      .orderBy(col("cents"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("n_lines"))))
      .groupBy(col("n_lines"))
      .agg(max(col("n")).as("n_orders"),
        min(when(col("rn") === expr("(n + 1) div 2"), col("cents")))
          .as("median_cents"))
      .orderBy(col("n_lines"))
  }

  private val basketValueMedianSql =
    """WITH s AS (
      |  SELECT l_orderkey, CAST(COUNT(*) AS BIGINT) AS n_lines
      |  FROM lineitem GROUP BY 1
      |), o AS (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    n_lines
      |  FROM orders JOIN s ON o_orderkey = l_orderkey
      |), r AS (
      |  SELECT n_lines, cents,
      |    CAST(row_number() OVER (PARTITION BY n_lines ORDER BY cents,
      |      o_orderkey) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY n_lines) AS BIGINT) AS n
      |  FROM o
      |)
      |SELECT n_lines, CAST(MAX(n) AS BIGINT) AS n_orders,
      |  MIN(CASE WHEN rn = (n + 1) // 2 THEN cents END) AS median_cents
      |FROM r
      |GROUP BY n_lines
      |ORDER BY n_lines""".stripMargin

  // ---- shipment fragmentation -------------------------------------------

  /** Histogram of distinct ship dates per order — shipment
    * fragmentation (each extra date is another delivery cost / partial-
    * shipment email). Two stacked integer aggregates. */
  def shipFragmentation(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(countDistinct(to_date(col("l_shipdate"))).as("ship_dates"))
      .groupBy(col("ship_dates")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("ship_dates"))

  private val shipFragmentationSql =
    """WITH o AS (
      |  SELECT l_orderkey,
      |    CAST(COUNT(DISTINCT CAST(l_shipdate AS DATE)) AS BIGINT)
      |      AS ship_dates
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT ship_dates, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM o GROUP BY 1 ORDER BY ship_dates""".stripMargin

  // ---- discount vs return interaction -----------------------------------

  /** Return rate by discount basis-point bucket — are discounted lines
    * returned more (margin leak × reverse-logistics cost interaction).
    * Integer counts, one rate division per bucket. */
  def discountReturns(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .select(expr("CAST(round(l_discount * 100) AS BIGINT)").as("dbp"),
        col("l_returnflag"))
      .groupBy(col("dbp"))
      .agg(count(lit(1)).as("n_lines"),
        sum(when(col("l_returnflag") === "R", 1L).otherwise(0L))
          .as("n_returned"))
      .select(col("dbp"), col("n_lines"), col("n_returned"),
        (col("n_returned").cast("double") / col("n_lines").cast("double"))
          .as("return_rate"))
      .orderBy(col("dbp"))

  private val discountReturnsSql =
    """SELECT CAST(round(l_discount * 100) AS BIGINT) AS dbp,
      |  CAST(COUNT(*) AS BIGINT) AS n_lines,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_returned,
      |  CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS return_rate
      |FROM lineitem
      |GROUP BY 1
      |ORDER BY dbp""".stripMargin

  // ---- event-value bands by type ----------------------------------------

  /** Exact p50/p90 event value (cents) per event type — the per-type
    * monetization bands (means hide the zero-heavy mixture). Rank
    * selection per type, integer cents, zero float columns. */
  def valueBands(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("event_type"), col("event_id"),
        expr("CAST(round(value * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("cents"), col("event_id"))
    e.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("event_type"))))
      .groupBy(col("event_type"))
      .agg(max(col("n")).as("n"),
        min(when(col("rn") === expr("(n * 50 + 99) div 100"), col("cents")))
          .as("p50_cents"),
        min(when(col("rn") === expr("(n * 90 + 99) div 100"), col("cents")))
          .as("p90_cents"))
      .orderBy(col("event_type"))
  }

  private val valueBandsSql =
    """WITH e AS (
      |  SELECT event_type, event_id,
      |    CAST(round(value * 100) AS BIGINT) AS cents
      |  FROM events
      |), r AS (
      |  SELECT event_type, cents,
      |    CAST(row_number() OVER (PARTITION BY event_type ORDER BY cents,
      |      event_id) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY event_type) AS BIGINT) AS n
      |  FROM e
      |)
      |SELECT event_type, CAST(MAX(n) AS BIGINT) AS n,
      |  MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END) AS p50_cents,
      |  MIN(CASE WHEN rn = (n * 90 + 99) // 100 THEN cents END) AS p90_cents
      |FROM r
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- user-activity concentration --------------------------------------

  /** Gini coefficient of events-per-user — activity concentration (a
    * rising value is the classic bot/power-user skew signal before any
    * per-user rate limit is designed). Same exact integer rank formula
    * as q389, applied to the per-user event counts. */
  def activityGini(spark: SparkSession, dir: String): DataFrame = {
    val perUser = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id")).agg(count(lit(1)).as("y"))
    // exact global rank i via GlobalRank — the user dimension never
    // funnels through a single window task
    graft.ops.GlobalRank.withRowNumber(
        perUser, Seq(col("y"), col("user_id")), "i")
      .agg(count(lit(1)).as("n_users"), sum(col("y")).as("n_events"),
        sum((col("i").cast(dec) * col("y")).cast(dec)).as("siy"))
      .select(col("n_users"), col("n_events"),
        ((lit(2).cast(dec) * col("siy") -
          ((col("n_users") + 1).cast(dec) * col("n_events")).cast(dec))
          .cast("double") /
          (col("n_users").cast(dec) * col("n_events")).cast("double"))
          .as("gini"))
  }

  private val activityGiniSql =
    """WITH pu AS (
      |  SELECT user_id, CAST(COUNT(*) AS BIGINT) AS y
      |  FROM events GROUP BY 1
      |), r AS (
      |  SELECT y,
      |    CAST(row_number() OVER (ORDER BY y, user_id) AS BIGINT) AS i
      |  FROM pu
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(y) AS BIGINT) AS n_events,
      |  CAST(2 * SUM(CAST(i AS HUGEINT) * y)
      |      - CAST(COUNT(*) + 1 AS HUGEINT) * SUM(y) AS DOUBLE)
      |    / CAST(CAST(COUNT(*) AS HUGEINT) * SUM(y) AS DOUBLE) AS gini
      |FROM r""".stripMargin

  // ---- fulfillment-latency trend ----------------------------------------

  /** Is fulfillment degrading: the monthly MEDIAN ship latency plus the
    * exact OLS slope of that median over the month index — a composite
    * of the rank-selection and integer-moment recipes (medians are
    * whale-proof; the slope says whether the drift is real). Slope
    * numerator/denominator are exact integers over the month-sized
    * frame; one final division. */
  def latencyTrend(spark: SparkSession, dir: String): DataFrame = {
    val lat = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        to_date(col("l_shipdate")).as("sd"))
      .join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"),
            (year(col("o_orderdate")) * 12 + month(col("o_orderdate")))
              .cast("long").as("midx"),
            to_date(col("o_orderdate")).as("od")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("midx"), datediff(col("sd"), col("od")).cast("long")
        .as("days"), col("l_orderkey"), col("l_linenumber"))
    val w = Window.partitionBy(col("midx"))
      .orderBy(col("days"), col("l_orderkey"), col("l_linenumber"))
    val monthly = lat.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("midx"))))
      .groupBy(col("midx"))
      .agg(min(when(col("rn") === expr("(n + 1) div 2"), col("days")))
        .as("median_days"))
    val m = monthly.agg(count(lit(1)).as("k"),
      sum(col("midx")).as("sx"), sum(col("median_days")).as("sy"),
      sum((col("midx").cast(dec) * col("midx")).cast(dec)).as("sxx"),
      sum((col("midx").cast(dec) * col("median_days")).cast(dec)).as("sxy"))
    m.select(col("k").as("n_months"),
      ((col("k").cast(dec) * col("sxy") - col("sx").cast(dec) * col("sy"))
        .cast("double") /
        (col("k").cast(dec) * col("sxx") - col("sx").cast(dec) * col("sx"))
          .cast("double")).as("slope_days_per_month"))
  }

  private val latencyTrendSql =
    """WITH lat AS (
      |  SELECT CAST(year(o_orderdate) * 12 + month(o_orderdate) AS BIGINT)
      |      AS midx,
      |    CAST(CAST(l_shipdate AS DATE) - CAST(o_orderdate AS DATE)
      |      AS BIGINT) AS days,
      |    l_orderkey, l_linenumber
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), r AS (
      |  SELECT midx, days,
      |    CAST(row_number() OVER (PARTITION BY midx ORDER BY days,
      |      l_orderkey, l_linenumber) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY midx) AS BIGINT) AS n
      |  FROM lat
      |), monthly AS (
      |  SELECT midx,
      |    MIN(CASE WHEN rn = (n + 1) // 2 THEN days END) AS median_days
      |  FROM r GROUP BY 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |    CAST(SUM(midx) AS BIGINT) AS sx,
      |    CAST(SUM(median_days) AS BIGINT) AS sy,
      |    SUM(CAST(midx AS HUGEINT) * midx) AS sxx,
      |    SUM(CAST(midx AS HUGEINT) * median_days) AS sxy
      |  FROM monthly
      |)
      |SELECT k AS n_months,
      |  CAST(CAST(k AS HUGEINT) * sxy - CAST(sx AS HUGEINT) * sy AS DOUBLE)
      |    / CAST(CAST(k AS HUGEINT) * sxx - CAST(sx AS HUGEINT) * sx
      |        AS DOUBLE) AS slope_days_per_month
      |FROM m""".stripMargin

  // ---- annual peak-week share -------------------------------------------

  /** Per year: the peak revenue week and its share of annual revenue —
    * the capacity-planning peakiness number (a 4% peak week and a 15%
    * one need different warehouses). Weekly integer cents, rank-1
    * window per year, one share division. */
  def peakWeekShare(spark: SparkSession, dir: String): DataFrame = {
    val weekly = Catalog.load(spark, dir, "orders")
      .groupBy(
        expr("CAST(date_trunc('WEEK', o_orderdate) AS DATE)").as("wk_start"))
      .agg(sum(orderCents).as("cents"))
      .withColumn("yr", year(col("wk_start")).cast("long"))
    val w = Window.partitionBy(col("yr"))
      .orderBy(col("cents").desc, col("wk_start"))
    val totals = weekly.groupBy(col("yr"))
      .agg(sum(col("cents")).as("year_cents"), count(lit(1)).as("n_weeks"))
    weekly.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .join(totals, "yr")
      .select(col("yr"), col("n_weeks"), col("wk_start").as("peak_week"),
        col("cents").as("peak_cents"), col("year_cents"),
        (col("cents").cast("double") / col("year_cents").cast("double"))
          .as("peak_share"))
      .orderBy(col("yr"))
  }

  private val peakWeekShareSql =
    """WITH weekly AS (
      |  SELECT CAST(date_trunc('week', o_orderdate) AS DATE) AS wk_start,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), y AS (
      |  SELECT wk_start, cents, CAST(year(wk_start) AS BIGINT) AS yr,
      |    row_number() OVER (PARTITION BY year(wk_start)
      |      ORDER BY cents DESC, wk_start) AS rn
      |  FROM weekly
      |), t AS (
      |  SELECT CAST(year(wk_start) AS BIGINT) AS yr,
      |    CAST(SUM(cents) AS BIGINT) AS year_cents,
      |    CAST(COUNT(*) AS BIGINT) AS n_weeks
      |  FROM weekly GROUP BY 1
      |)
      |SELECT y.yr, t.n_weeks, y.wk_start AS peak_week,
      |  y.cents AS peak_cents, t.year_cents,
      |  CAST(y.cents AS DOUBLE) / CAST(t.year_cents AS DOUBLE) AS peak_share
      |FROM y JOIN t ON y.yr = t.yr
      |WHERE y.rn = 1
      |ORDER BY y.yr""".stripMargin

  // ---- per-brand weekday seasonality ------------------------------------

  /** Top-10 brands by weekday-seasonality strength: q396's η² (variance
    * of daily revenue explained by day-of-week) computed PER BRAND —
    * which product lines actually live on a weekly rhythm. The seven
    * dow groups pivot to columns per brand, so the fixed mirrored chain
    * evaluates row-wise; brands missing any weekday are excluded (no
    * partial chains, mirrored). */
  def brandDowStrength(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_partkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"), to_date(col("o_orderdate")).as("d")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(Catalog.load(spark, dir, "part")
          .select(col("p_partkey"), col("p_brand").as("brand"))),
        col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"), col("d"))
      .agg(sum(col("cents")).as("y"))
      .select(col("brand"), expr("CAST(weekday(d) + 1 AS INT)").as("dw"),
        col("y"))
    val g = daily.groupBy(col("brand"), col("dw"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("ss"))
    val pivCols = (1 to 7).flatMap { i =>
      Seq(sum(when(col("dw") === i, col("n"))).as(s"n$i"),
        sum(when(col("dw") === i, col("s"))).as(s"s$i"))
    } ++ Seq(sum(col("n")).as("nt"), sum(col("s")).as("st"),
      sum(col("ss")).as("sst_raw"))
    val piv = g.groupBy(col("brand")).agg(pivCols.head, pivCols.tail: _*)
      .filter((1 to 7).map(i => col(s"n$i").isNotNull).reduce(_ && _))
    def d(c: Column) = c.cast("double")
    val ssbTerms = (1 to 7).map { i =>
      d(col(s"s$i")) * d(col(s"s$i")) / d(col(s"n$i"))
    }.reduce(_ + _)
    val gm = d(col("st")) * d(col("st")) / d(col("nt"))
    val eta2 = (ssbTerms - gm) / (d(col("sst_raw")) - gm)
    piv.select(col("brand"), col("nt").as("n_days"), eta2.as("eta2_dow"))
      .orderBy(eta2.desc, col("brand"))
      .limit(10)
  }

  private val brandDowStrengthSql = {
    val ssbTerms = (1 to 7).map { i =>
      s"(CAST(s$i AS DOUBLE) * CAST(s$i AS DOUBLE) / CAST(n$i AS DOUBLE))"
    }.mkString(" + ")
    val gm = "(CAST(st AS DOUBLE) * CAST(st AS DOUBLE) / CAST(nt AS DOUBLE))"
    val eta2 = s"(($ssbTerms - $gm) / (CAST(sst_raw AS DOUBLE) - $gm))"
    val ns = (1 to 7).map(i =>
      s"SUM(CASE WHEN dw = $i THEN n END) AS n$i").mkString(", ")
    val ss = (1 to 7).map(i =>
      s"SUM(CASE WHEN dw = $i THEN s END) AS s$i").mkString(", ")
    val notNull = (1 to 7).map(i => s"n$i IS NOT NULL").mkString(" AND ")
    s"""WITH daily AS (
       |  SELECT p_brand AS brand, CAST(o_orderdate AS DATE) AS d,
       |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
       |      AS y
       |  FROM lineitem
       |  JOIN orders ON l_orderkey = o_orderkey
       |  JOIN part ON l_partkey = p_partkey
       |  GROUP BY 1, 2
       |), dd AS (
       |  SELECT brand, isodow(d) AS dw, y FROM daily
       |), g AS (
       |  SELECT brand, dw, CAST(COUNT(*) AS BIGINT) AS n,
       |    CAST(SUM(y) AS BIGINT) AS s, SUM(CAST(y AS HUGEINT) * y) AS ss
       |  FROM dd GROUP BY 1, 2
       |), piv AS (
       |  SELECT brand, $ns, $ss,
       |    CAST(SUM(n) AS BIGINT) AS nt, CAST(SUM(s) AS BIGINT) AS st,
       |    SUM(ss) AS sst_raw
       |  FROM g GROUP BY brand
       |)
       |SELECT brand, nt AS n_days, $eta2 AS eta2_dow
       |FROM piv
       |WHERE $notNull
       |ORDER BY $eta2 DESC, brand
       |LIMIT 10""".stripMargin
  }

  // ---- monthly ARPU -----------------------------------------------------

  /** Monthly ARPU — revenue per distinct ordering customer, in exact
    * integer micro-cents (floor division, no float means) — the unit-
    * economics trendline under the raw revenue curve. */
  def monthlyArpu(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "orders")
      .groupBy(date_trunc("month", col("o_orderdate")).cast("date").as("m"))
      .agg(countDistinct(col("o_custkey")).as("n_customers"),
        sum(orderCents).as("cents"))
      .select(col("m"), col("n_customers"), col("cents"),
        expr("(cents * 1000000) div n_customers").as("arpu_micro"))
      .orderBy(col("m"))

  private val monthlyArpuSql =
    """WITH g AS (
      |  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m,
      |    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS n_customers,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |)
      |SELECT m, n_customers, cents,
      |  (cents * 1000000) // n_customers AS arpu_micro
      |FROM g
      |ORDER BY m""".stripMargin

  // ---- order-value dispersion per segment --------------------------------

  /** Coefficient of variation (sample σ/µ) of order value per priority
    * — the normalized dispersion that makes segments with different
    * scales comparable (raw variance cannot). Exact decimal moments,
    * one mirrored sqrt/divide chain per segment row. */
  def valueCv(spark: SparkSession, dir: String): DataFrame = {
    val g = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"), orderCents.as("y"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"), sum(col("y")).as("s"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("ss"))
    def d(c: Column) = c.cast("double")
    val mean = d(col("s")) / d(col("n"))
    val variance =
      (col("n").cast(dec) * col("ss") - col("s").cast(dec) * col("s"))
        .cast("double") / (col("n") * (col("n") - 1)).cast("double")
    g.select(col("segment"), col("n"), mean.as("mean_cents"),
        (sqrt(variance) / mean).as("cv"))
      .orderBy(col("segment"))
  }

  private val valueCvSql =
    """WITH g AS (
      |  SELECT o_orderpriority AS segment, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS s,
      |    SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS ss
      |  FROM orders GROUP BY 1
      |)
      |SELECT segment, n, CAST(s AS DOUBLE) / CAST(n AS DOUBLE) AS mean_cents,
      |  sqrt(CAST(CAST(n AS HUGEINT) * ss - CAST(s AS HUGEINT) * s AS DOUBLE)
      |      / CAST(n * (n - 1) AS DOUBLE))
      |    / (CAST(s AS DOUBLE) / CAST(n AS DOUBLE)) AS cv
      |FROM g
      |ORDER BY segment""".stripMargin

  // ---- registry ---------------------------------------------------------

  // ---- Haar wavelet pyramid over the daily-revenue series -------------

  /** Three-level un-normalized Haar transform of the daily revenue
    * series: per level k, each bucket of 2ᵏ absolute day indices
    * carries its APPROXIMATION (total cents — the downsampled series)
    * and its DETAIL (first-half total − second-half total — the change
    * signal at that scale). Everything is exact BIGINT sums of cents
    * keyed by integer day-index arithmetic, so the multiresolution
    * decomposition is engine-exact — no float averaging anywhere (the
    * 1/√2 normalization is a display constant, deliberately omitted).
    * This is the series structure behind anomaly localization ("which
    * scale moved?") and progressive dashboard rendering — one daily
    * aggregate + one shuffle per level, each a fraction of the last. */
  def haarPyramid(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(expr("unix_micros(date_trunc('day', o_orderdate))" +
        " div 86400000000").as("day_idx"))
      .agg(sum(round(col("o_totalprice") * 100).cast("long")).as("rev_c"))
      .localCheckpoint(false) // three level rollups below
    val levels = (1 to 3).map { k =>
      val w = 1L << k
      val half = 1L << (k - 1)
      daily
        .groupBy(expr(s"day_idx div $w").as("bucket"))
        .agg(sum(col("rev_c")).as("approx_c"),
          sum(when(expr(s"(day_idx div $half) % 2") === 0, col("rev_c"))
            .otherwise(-col("rev_c"))).as("detail_c"))
        .select(lit(k.toLong).as("level"), col("bucket"),
          col("approx_c"), col("detail_c"))
    }
    levels.reduce(_ unionByName _)
      .orderBy(col("level"), col("bucket"))
  }

  private val haarPyramidSql = {
    def level(k: Int) = {
      val w = 1L << k
      val half = 1L << (k - 1)
      s"""SELECT CAST($k AS BIGINT) AS level, day_idx // $w AS bucket,
         |  CAST(SUM(rev_c) AS BIGINT) AS approx_c,
         |  CAST(SUM(CASE WHEN (day_idx // $half) % 2 = 0
         |                THEN rev_c ELSE -rev_c END) AS BIGINT) AS detail_c
         |FROM daily GROUP BY 2""".stripMargin
    }
    s"""WITH daily AS (
       |  SELECT epoch_ns(date_trunc('day', o_orderdate)) // 1000
       |      // 86400000000 AS day_idx,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS rev_c
       |  FROM orders WHERE o_orderdate IS NOT NULL
       |  GROUP BY 1
       |)
       |${level(1)}
       |UNION ALL
       |${level(2)}
       |UNION ALL
       |${level(3)}
       |ORDER BY level, bucket""".stripMargin
  }

  // ---- Benjamini–Hochberg multiple-testing correction ------------------

  /** Critical |z| values for the BH step-up at α=0.10 over m=25 tests:
    * zcrit(k) = Φ⁻¹(1 − (k·α/m)/2). Literals (not a runtime Φ⁻¹ — the
    * normal quantile function is not portably computable), parsed from
    * IDENTICAL decimal strings on both engines, so the comparisons are
    * engine-exact. Sorting p-values ascending is sorting |z| descending
    * (p is monotone in |z|), which is what lets BH run entirely in
    * z-space without ever materializing a p-value. */
  private val bhCritZ = Seq(
    2.878162, 2.65207, 2.512144, 2.408916, 2.326348, 2.257129, 2.197286,
    2.144411, 2.096927, 2.053749, 2.014091, 1.977368, 1.943134, 1.911036,
    1.880794, 1.85218, 1.825007, 1.799118, 1.774382, 1.750686, 1.727934,
    1.706043, 1.684941, 1.664563, 1.644854)

  /** Which nations' urgent-order rates deviate from the global rate,
    * with the FALSE-DISCOVERY control a 25-way scan needs: per-nation
    * one-sample proportion z against the pooled rate (the q323/q434
    * mirrored-IEEE chain from exact integer counts), then
    * Benjamini–Hochberg at α=0.10 — rank the tests by |z| (≡ by
    * p-value), compare each to its literal critical value, and flag
    * every rank up to the LAST hit (the step-up). m is structurally 25
    * (the nation dim), so the critical table always lines up; a nation
    * with no orders contributes z=0 and ranks last. The multiple-
    * testing correction is what separates "25 dashboards, 2 false
    * alarms expected" from a defensible anomaly list. */
  def bhCorrection(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val byNation = Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
      .join(Catalog.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("n_nationkey") === col("c_nationkey"), "left")
      .join(Catalog.load(spark, dir, "orders")
        .select(col("o_custkey"), col("o_orderpriority")),
        col("c_custkey") === col("o_custkey"), "left")
      .groupBy(col("n_name"))
      .agg(count(col("o_custkey")).as("n"),
        count(when(col("o_orderpriority") === "1-URGENT", 1)).as("x"))
    val pool = byNation.agg(sum(col("x")).as("sx"), sum(col("n")).as("sn"))
    val z = byNation.crossJoin(broadcast(pool))
      .selectExpr("n_name", "n", "x",
        "CAST(sx AS DOUBLE) / sn AS p_pool",
        """CASE WHEN n = 0 THEN 0.0 ELSE
          |  (CAST(x AS DOUBLE) / n - CAST(sx AS DOUBLE) / sn)
          |    / sqrt(CAST(sx AS DOUBLE) / sn * (1.0 - CAST(sx AS DOUBLE) / sn) / n)
          |END AS z""".stripMargin)
    val ranked = z.withColumn("rnk",
      row_number().over(Window.orderBy(abs(col("z")).desc, col("n_name")))
        .cast("long"))
    val crit = bhCritZ.zipWithIndex
      .map { case (c, i) => (i + 1L, c) }.toDF("rnk", "crit_z")
    val hit = ranked.join(broadcast(crit), "rnk")
      .withColumn("kmax",
        max(when(abs(col("z")) >= col("crit_z"), col("rnk"))
          .otherwise(lit(0L)))
          .over(Window.rowsBetween(Window.unboundedPreceding,
            Window.unboundedFollowing)))
    hit.select(col("n_name"), col("n"), col("x"), col("z"), col("rnk"),
        col("crit_z"), (col("rnk") <= col("kmax")).as("significant"))
      .orderBy(col("rnk"))
  }

  private val bhCorrectionSql = {
    // CAST each literal: a bare decimal literal in DuckDB VALUES types
    // as DECIMAL, which would flip the column dtype and the comparison
    // semantics vs Spark's double
    val critRows = bhCritZ.zipWithIndex
      .map { case (c, i) => s"(${i + 1}, CAST($c AS DOUBLE))" }
      .mkString(", ")
    s"""WITH bn AS (
       |  SELECT n.n_name,
       |    CAST(COUNT(o.o_custkey) AS BIGINT) AS n,
       |    CAST(COUNT(*) FILTER (o.o_orderpriority = '1-URGENT') AS BIGINT)
       |      AS x
       |  FROM nation n
       |  LEFT JOIN customer c ON n.n_nationkey = c.c_nationkey
       |  LEFT JOIN orders o ON c.c_custkey = o.o_custkey
       |  GROUP BY 1
       |), pool AS (
       |  SELECT CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(n) AS BIGINT) AS sn
       |  FROM bn
       |), z AS (
       |  SELECT n_name, n, x,
       |    CASE WHEN n = 0 THEN 0.0 ELSE
       |      (CAST(x AS DOUBLE) / n - CAST(sx AS DOUBLE) / sn)
       |        / sqrt(CAST(sx AS DOUBLE) / sn * (1.0 - CAST(sx AS DOUBLE) / sn) / n)
       |    END AS z
       |  FROM bn CROSS JOIN pool
       |), ranked AS (
       |  SELECT *, CAST(ROW_NUMBER() OVER (ORDER BY abs(z) DESC, n_name)
       |    AS BIGINT) AS rnk
       |  FROM z
       |), crit(rnk, crit_z) AS (VALUES $critRows
       |), hit AS (
       |  SELECT r.*, c.crit_z,
       |    MAX(CASE WHEN abs(r.z) >= c.crit_z THEN r.rnk ELSE 0 END)
       |      OVER () AS kmax
       |  FROM ranked r JOIN crit c ON r.rnk = c.rnk
       |)
       |SELECT n_name, n, x, z, rnk, crit_z, rnk <= kmax AS significant
       |FROM hit
       |ORDER BY rnk""".stripMargin
  }

  // ---- trade-network reciprocity ----------------------------------------

  /** RECIPROCITY of the nation→nation trade network — the world-trade-web
    * statistic (Garlaschelli–Loffredo): of the directed flow edges
    * (customer-nation i buys from supplier-nation j, i≠j), what share
    * has a reverse edge, and what share of flow VALUE is matched by
    * reverse flow (Σ min(w_ij, w_ji) / Σ w_ij)? Plus the ρ coefficient
    * (r − ā)/(1 − ā) that corrects for density, computed as one
    * cross-multiplied integer ratio. The flow matrix is the q413
    * aggregate without the top-20 cut — |nations|² ≤ 625 cells at any
    * data scale — so the reverse-edge self-join is broadcast-trivial;
    * the only fact-sized work is the one groupBy that collapses
    * lineitem into it. */
  def tradeReciprocity(spark: SparkSession, dir: String): DataFrame = {
    val nat = Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_name"))
    val custNat = Catalog.load(spark, dir, "customer")
      .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name").as("cn"))
    val suppNat = Catalog.load(spark, dir, "supplier")
      .join(broadcast(nat), col("s_nationkey") === col("n_nationkey"))
      .select(col("s_suppkey"), col("n_name").as("sn"))
    val flow = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cents"))
      .join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey")),
        col("l_orderkey") === col("o_orderkey"))
      .join(broadcast(custNat), col("o_custkey") === col("c_custkey"))
      .join(broadcast(suppNat), col("l_suppkey") === col("s_suppkey"))
      .groupBy(col("cn"), col("sn"))
      .agg(sum(col("cents")).as("w"))
      .filter(col("cn") =!= col("sn"))
    val rev = flow.select(col("sn").as("rc"), col("cn").as("rs"),
      col("w").as("rw"))
    val nn = flow.select(col("cn").as("x"))
      .union(flow.select(col("sn").as("x"))).distinct()
      .agg(count(lit(1)).as("n_nations"))
    flow.join(broadcast(rev),
        col("cn") === col("rc") && col("sn") === col("rs"), "left")
      .agg(count(lit(1)).as("n_edges"),
        sum(col("rw").isNotNull.cast("long")).as("n_recip"),
        sum(col("w")).as("w_total"),
        sum(when(col("rw").isNotNull, least(col("w"), col("rw")))
          .otherwise(lit(0L))).as("w_recip"))
      .crossJoin(broadcast(nn))
      .select(col("n_nations"), col("n_edges"), col("n_recip"),
        (col("n_recip").cast("double") / col("n_edges").cast("double"))
          .as("recip_rate"),
        col("w_total"), col("w_recip"),
        (col("w_recip").cast("double") / col("w_total").cast("double"))
          .as("w_recip_rate"),
        // a COMPLETE flow network (every pair trades, the TPC-H case at
        // sf>=0.01) has density 1, where rho = (r-1)/(1-1) is undefined
        when(col("n_edges") === col("n_nations") * (col("n_nations") - 1),
          lit(null).cast("double"))
          .otherwise(
            (col("n_recip") * col("n_nations") * (col("n_nations") - 1)
              - col("n_edges") * col("n_edges")).cast("double")
              / (col("n_edges") * (col("n_nations") * (col("n_nations") - 1)
                - col("n_edges"))).cast("double")).as("rho_gl"))
  }

  private val tradeReciprocitySql =
    """WITH flow AS (
      |  SELECT cn.n_name AS c, sn.n_name AS s,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS w
      |  FROM lineitem
      |  JOIN orders ON l_orderkey = o_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation cn ON c_nationkey = cn.n_nationkey
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation sn ON s_nationkey = sn.n_nationkey
      |  GROUP BY 1, 2
      |  HAVING cn.n_name <> sn.n_name
      |), nn AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_nations FROM (
      |    SELECT c AS x FROM flow UNION SELECT s FROM flow) u
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_edges,
      |    CAST(SUM(CASE WHEN r.w IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_recip,
      |    CAST(SUM(f.w) AS BIGINT) AS w_total,
      |    CAST(SUM(CASE WHEN r.w IS NOT NULL
      |      THEN least(f.w, r.w) ELSE 0 END) AS BIGINT) AS w_recip
      |  FROM flow f LEFT JOIN flow r ON f.c = r.s AND f.s = r.c
      |)
      |SELECT n_nations, n_edges, n_recip,
      |  CAST(n_recip AS DOUBLE) / CAST(n_edges AS DOUBLE) AS recip_rate,
      |  w_total, w_recip,
      |  CAST(w_recip AS DOUBLE) / CAST(w_total AS DOUBLE) AS w_recip_rate,
      |  CASE WHEN n_edges = n_nations * (n_nations - 1) THEN NULL
      |    ELSE CAST(n_recip * n_nations * (n_nations - 1) - n_edges * n_edges
      |        AS DOUBLE)
      |      / CAST(n_edges * (n_nations * (n_nations - 1) - n_edges)
      |        AS DOUBLE)
      |  END AS rho_gl
      |FROM m, nn""".stripMargin

  // ---- matched-basket price indices ---------------------------------------

  /** LASPEYRES / PAASCHE / FISHER price indices per 1996 month against
    * the 1995 base year, over the matched part basket — the standard
    * "are prices actually rising, holding the basket fixed" econ
    * aggregates (q404 tracks single-part deviations; an index needs
    * basket weighting). Unit prices are exact rationals rev/qty; each
    * index term is one per-part floored micro-division (house
    * fixed-point), summed as decimals; Fisher is the geometric mean
    * √(L·P) of two deterministic doubles. Fact work is two
    * (part, period) collapses and one part-keyed join of the two
    * period tables. */
  def priceIndex(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    // ONE fact scan: collapse to (part, month) cells for both periods,
    // pin, then split — base re-aggregates the 1995 months
    val cells = Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("pk"), to_date(col("l_shipdate")).as("d"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("rev"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("qty"))
      .filter(year(col("d")).isin(1995, 1996))
      .groupBy(col("pk"), year(col("d")).as("y"),
        date_trunc("month", col("d")).cast("date").as("m"))
      .agg(sum(col("rev")).as("rev"), sum(col("qty")).as("qty"))
      .localCheckpoint(false)
    val base = cells.filter(col("y") === 1995)
      .groupBy(col("pk"))
      .agg(sum(col("rev")).as("rev0"), sum(col("qty")).as("qty0"))
    val cur = cells.filter(col("y") === 1996)
      .select(col("pk"), col("m"), col("rev").as("revt"),
        col("qty").as("qtyt"))
    cur.join(base, "pk")
      .select(col("m"), col("rev0"), col("revt"),
        // p_t·q_0 and p_0·q_t in exact floored micro-cents
        expr(s"CAST((CAST(revt AS $dec) * qty0 * 1000000) div qtyt AS $dec)")
          .as("ptq0"),
        expr(s"CAST((CAST(rev0 AS $dec) * qtyt * 1000000) div qty0 AS $dec)")
          .as("p0qt"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_parts"),
        sum(col("ptq0")).as("num_l"), sum(col("rev0")).as("den_l"),
        sum(col("revt")).as("num_p"), sum(col("p0qt")).as("den_p"))
      .select(col("m").as("month"), col("n_parts"),
        (col("num_l").cast("double")
          / expr(s"CAST(CAST(den_l AS $dec) * 1000000 AS $dec)")
            .cast("double")).as("laspeyres"),
        (expr(s"CAST(CAST(num_p AS $dec) * 1000000 AS $dec)").cast("double")
          / col("den_p").cast("double")).as("paasche"))
      .withColumn("fisher", sqrt(col("laspeyres") * col("paasche")))
      .orderBy(col("month"))
  }

  private val priceIndexSql =
    """WITH li AS (
      |  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS d,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS rev,
      |    CAST(round(l_quantity) AS BIGINT) AS qty
      |  FROM lineitem
      |), base AS (
      |  SELECT pk, CAST(SUM(rev) AS BIGINT) AS rev0,
      |    CAST(SUM(qty) AS BIGINT) AS qty0
      |  FROM li WHERE year(d) = 1995 GROUP BY 1
      |), cur AS (
      |  SELECT pk, CAST(date_trunc('month', d) AS DATE) AS m,
      |    CAST(SUM(rev) AS BIGINT) AS revt, CAST(SUM(qty) AS BIGINT) AS qtyt
      |  FROM li WHERE year(d) = 1996 GROUP BY 1, 2
      |), t AS (
      |  SELECT m, rev0, revt,
      |    (CAST(revt AS HUGEINT) * qty0 * 1000000) // qtyt AS ptq0,
      |    (CAST(rev0 AS HUGEINT) * qtyt * 1000000) // qty0 AS p0qt
      |  FROM cur JOIN base USING (pk)
      |), g AS (
      |  SELECT m, CAST(COUNT(*) AS BIGINT) AS n_parts,
      |    SUM(ptq0) AS num_l, CAST(SUM(rev0) AS BIGINT) AS den_l,
      |    CAST(SUM(revt) AS BIGINT) AS num_p, SUM(p0qt) AS den_p
      |  FROM t GROUP BY 1
      |), o AS (
      |  SELECT m AS month, n_parts,
      |    CAST(CAST(num_l AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(CAST(den_l AS HUGEINT) * 1000000 AS VARCHAR)
      |        AS DOUBLE) AS laspeyres,
      |    CAST(CAST(CAST(num_p AS HUGEINT) * 1000000 AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(den_p AS VARCHAR) AS DOUBLE) AS paasche
      |  FROM g
      |)
      |SELECT month, n_parts, laspeyres, paasche,
      |  sqrt(laspeyres * paasche) AS fisher
      |FROM o
      |ORDER BY month""".stripMargin

  // ---- Croston intermittent-demand forecast --------------------------------

  /** CROSTON point forecast for INTERMITTENT part demand — the
    * forecasting family's gap: Holt/EWMA/seasonal-naive (q245/q147/
    * q270) average zeros into the level and systematically lowball
    * sparse SKUs; Croston smooths the nonzero demand SIZES and the
    * INTER-DEMAND intervals separately and forecasts size/interval per
    * day. Same truncated 8/4/2/1 smoothing memory as q147's EWMA
    * (4 sizes, 4 intervals), evaluated at each part's latest demand
    * event; the rate is one exact cross-multiplied floored
    * micro-division of integer weighted sums — no float state. Both
    * windows are partitioned by part. */
  def croston(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("pk")).orderBy(col("d"))
    val lagged = Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey").as("pk"), to_date(col("l_shipdate")).as("d"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q0"))
      .groupBy(col("pk"), col("d")).agg(sum(col("q0")).as("q"))
      .withColumn("q1", lag(col("q"), 1).over(w))
      .withColumn("q2", lag(col("q"), 2).over(w))
      .withColumn("q3", lag(col("q"), 3).over(w))
      .withColumn("d1", lag(col("d"), 1).over(w))
      .withColumn("d2", lag(col("d"), 2).over(w))
      .withColumn("d3", lag(col("d"), 3).over(w))
      .withColumn("d4", lag(col("d"), 4).over(w))
    lagged
      .withColumn("rnd", row_number().over(
        Window.partitionBy(col("pk")).orderBy(col("d").desc)))
      .filter(col("rnd") === 1 && col("d1").isNotNull)
      .select(col("pk"), col("d").as("last_demand"),
        (col("q") * 8 + coalesce(col("q1"), lit(0L)) * 4
          + coalesce(col("q2"), lit(0L)) * 2
          + coalesce(col("q3"), lit(0L))).as("zn"),
        (lit(8L) + when(col("q1").isNotNull, 4L).otherwise(0L)
          + when(col("q2").isNotNull, 2L).otherwise(0L)
          + when(col("q3").isNotNull, 1L).otherwise(0L)).as("zw"),
        (datediff(col("d"), col("d1")).cast("long") * 8
          + coalesce(datediff(col("d1"), col("d2")).cast("long"), lit(0L)) * 4
          + coalesce(datediff(col("d2"), col("d3")).cast("long"), lit(0L)) * 2
          + coalesce(datediff(col("d3"), col("d4")).cast("long"), lit(0L)))
          .as("pn"),
        (lit(8L) + when(col("d2").isNotNull, 4L).otherwise(0L)
          + when(col("d3").isNotNull, 2L).otherwise(0L)
          + when(col("d4").isNotNull, 1L).otherwise(0L)).as("pw"))
      .select(col("pk"), col("last_demand"), col("zn"), col("zw"),
        col("pn"), col("pw"),
        expr(s"CAST((CAST(zn AS $dec) * pw * 1000000) div (CAST(zw AS $dec) * pn) AS BIGINT)")
          .as("croston_micro"))
      .orderBy(col("croston_micro").desc, col("pk"))
      .limit(50)
  }

  private val crostonSql =
    """WITH dem AS (
      |  SELECT l_partkey AS pk, CAST(l_shipdate AS DATE) AS d,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1, 2
      |), lagged AS (
      |  SELECT pk, d, q,
      |    lag(q, 1) OVER w AS q1, lag(q, 2) OVER w AS q2,
      |    lag(q, 3) OVER w AS q3,
      |    lag(d, 1) OVER w AS d1, lag(d, 2) OVER w AS d2,
      |    lag(d, 3) OVER w AS d3, lag(d, 4) OVER w AS d4,
      |    row_number() OVER (PARTITION BY pk ORDER BY d DESC) AS rnd
      |  FROM dem
      |  WINDOW w AS (PARTITION BY pk ORDER BY d)
      |), latest AS (
      |  SELECT pk, d AS last_demand,
      |    q * 8 + COALESCE(q1, 0) * 4 + COALESCE(q2, 0) * 2
      |      + COALESCE(q3, 0) AS zn,
      |    8 + CASE WHEN q1 IS NOT NULL THEN 4 ELSE 0 END
      |      + CASE WHEN q2 IS NOT NULL THEN 2 ELSE 0 END
      |      + CASE WHEN q3 IS NOT NULL THEN 1 ELSE 0 END AS zw,
      |    date_diff('day', d1, d) * 8
      |      + COALESCE(date_diff('day', d2, d1), 0) * 4
      |      + COALESCE(date_diff('day', d3, d2), 0) * 2
      |      + COALESCE(date_diff('day', d4, d3), 0) AS pn,
      |    8 + CASE WHEN d2 IS NOT NULL THEN 4 ELSE 0 END
      |      + CASE WHEN d3 IS NOT NULL THEN 2 ELSE 0 END
      |      + CASE WHEN d4 IS NOT NULL THEN 1 ELSE 0 END AS pw
      |  FROM lagged WHERE rnd = 1 AND d1 IS NOT NULL
      |)
      |SELECT pk, last_demand, CAST(zn AS BIGINT) AS zn,
      |  CAST(zw AS BIGINT) AS zw, CAST(pn AS BIGINT) AS pn,
      |  CAST(pw AS BIGINT) AS pw,
      |  CAST((CAST(zn AS HUGEINT) * pw * 1000000)
      |    // (CAST(zw AS HUGEINT) * pn) AS BIGINT) AS croston_micro
      |FROM latest
      |ORDER BY croston_micro DESC, pk
      |LIMIT 50""".stripMargin

  // ---- trade-graph evolution ------------------------------------------------

  /** Monthly EVOLUTION of the customer–supplier trade graph: active
    * nodes on each side, distinct trading edges, bipartite density,
    * and the share of edges that are NEW (first month that pair ever
    * traded) — the graph-growth audit behind "is the network
    * densifying or just churning" (the static family q105/q321/q225
    * sees one snapshot; this is the time axis). One fact collapse to
    * distinct (month, cust, supp), a min-month per pair for first-seen
    * (both edge-list-sized), exact counts, two mirrored divisions per
    * month. */
  def graphEvolution(spark: SparkSession, dir: String): DataFrame = {
    val pm = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
      .join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_custkey"),
            date_trunc("month", to_date(col("o_orderdate"))).cast("date")
              .as("m")),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("m"), col("o_custkey").as("c"), col("l_suppkey").as("s"))
      .distinct()
      .localCheckpoint(false)
    val first = pm.groupBy(col("c"), col("s")).agg(min(col("m")).as("fm"))
    pm.join(first, Seq("c", "s"))
      .groupBy(col("m"))
      .agg(count(lit(1)).as("n_edges"),
        sum((col("fm") === col("m")).cast("long")).as("n_new"),
        countDistinct(col("c")).as("n_cust"),
        countDistinct(col("s")).as("n_supp"))
      .select(col("m").as("month"), col("n_edges"), col("n_new"),
        col("n_cust"), col("n_supp"),
        (col("n_new").cast("double") / col("n_edges").cast("double"))
          .as("pct_new"),
        (col("n_edges").cast("double")
          / (col("n_cust") * col("n_supp")).cast("double")).as("density"))
      .orderBy(col("month"))
  }

  private val graphEvolutionSql =
    """WITH pm AS (
      |  SELECT DISTINCT CAST(date_trunc('month', CAST(o_orderdate AS DATE))
      |      AS DATE) AS m,
      |    o_custkey AS c, l_suppkey AS s
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |), f AS (
      |  SELECT c, s, MIN(m) AS fm FROM pm GROUP BY 1, 2
      |)
      |SELECT m AS month, CAST(COUNT(*) AS BIGINT) AS n_edges,
      |  CAST(SUM(CASE WHEN fm = m THEN 1 ELSE 0 END) AS BIGINT) AS n_new,
      |  CAST(COUNT(DISTINCT c) AS BIGINT) AS n_cust,
      |  CAST(COUNT(DISTINCT s) AS BIGINT) AS n_supp,
      |  CAST(SUM(CASE WHEN fm = m THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS pct_new,
      |  CAST(COUNT(*) AS DOUBLE)
      |    / CAST(COUNT(DISTINCT c) * COUNT(DISTINCT s) AS DOUBLE)
      |    AS density
      |FROM pm JOIN f USING (c, s)
      |GROUP BY 1
      |ORDER BY month""".stripMargin

  // ---- arc price elasticity ---------------------------------------------------

  /** ARC ELASTICITY of demand between ADJACENT discount levels — the
    * midpoint-formula answer to "how much extra quantity does one more
    * point of discount buy", level by level (q433 fits one global
    * slope; pricing wants the local curve). Effective price at
    * discount d% is (100−d); for each adjacent pair the arc elasticity
    * ((q₂−q₁)/(q₂+q₁)) / ((p₂−p₁)/(p₂+p₁)) is one sign-split floored
    * micro-division of exact integer quantities — the discount domain
    * is 11 values, so everything after the one fact collapse is a
    * literal-bounded self-join, no window at all. */
  def arcElasticity(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val lv = Catalog.load(spark, dir, "lineitem")
      .groupBy(expr("CAST(round(l_discount * 100) AS BIGINT)").as("d"))
      .agg(sum(expr("CAST(round(l_quantity) AS BIGINT)")).as("q"))
    lv.select(col("d").as("d_lo"), col("q").as("q_lo"))
      .join(lv.select(col("d").as("d_hi"), col("q").as("q_hi")),
        col("d_hi") === col("d_lo") + 1)
      .select(col("d_lo"), col("d_hi"), col("q_lo"), col("q_hi"),
        // p_lo = 100 - d_lo, p_hi = 100 - d_hi; p_hi - p_lo = -1
        expr(s"""CAST(CASE WHEN q_hi >= q_lo
                 THEN -(((CAST(q_hi AS $dec) - q_lo) * (200 - d_lo - d_hi)
                        * 1000000)
                        div (CAST(q_hi + q_lo AS $dec)))
                 ELSE (((CAST(q_lo AS $dec) - q_hi) * (200 - d_lo - d_hi)
                        * 1000000)
                        div (CAST(q_hi + q_lo AS $dec)))
                 END AS BIGINT)""").as("elasticity_micro"))
      .orderBy(col("d_lo"))
  }

  private val arcElasticitySql =
    """WITH lv AS (
      |  SELECT CAST(round(l_discount * 100) AS BIGINT) AS d,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS q
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT a.d AS d_lo, b.d AS d_hi, a.q AS q_lo, b.q AS q_hi,
      |  CAST(CASE WHEN b.q >= a.q
      |    THEN -(((CAST(b.q AS HUGEINT) - a.q) * (200 - a.d - b.d)
      |           * 1000000) // (CAST(b.q + a.q AS HUGEINT)))
      |    ELSE (((CAST(a.q AS HUGEINT) - b.q) * (200 - a.d - b.d)
      |           * 1000000) // (CAST(b.q + a.q AS HUGEINT)))
      |  END AS BIGINT) AS elasticity_micro
      |FROM lv a JOIN lv b ON b.d = a.d + 1
      |ORDER BY d_lo""".stripMargin

  // ---- Deming regression ---------------------------------------------------

  /** DEMING regression between two MEASUREMENTS of the same daily
    * quantity — order-header revenue vs summed line extended price per
    * day (they differ by discount/tax treatment and rounding): OLS
    * (q228) assumes x is error-free and biases the slope toward zero
    * when both sides are noisy; Deming (λ=1) treats the errors
    * symmetrically, slope = (S_yy − S_xx + √((S_xx−S_yy)² + 4S_xy²)) /
    * (2S_xy). All three centered moments are exact decimals scaled by
    * the same n², so the slope is a deterministic double chain over
    * exact operands; the OLS slope sits next to it so the attenuation
    * gap is visible. */
  def demingRegression(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val ox = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("x"))
    val ly = Catalog.load(spark, dir, "lineitem")
      .groupBy(expr("unix_micros(l_shipdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .as("y"))
    ox.join(ly, "day")
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"),
        sum(expr(s"CAST(CAST(x AS $dec) * y AS $dec)")).as("sxy"),
        sum(expr(s"CAST(CAST(x AS $dec) * x AS $dec)")).as("sxx"),
        sum(expr(s"CAST(CAST(y AS $dec) * y AS $dec)")).as("syy"))
      .select(col("n"),
        expr(s"CAST(n * sxx - CAST(sx AS $dec) * sx AS $dec)")
          .cast("double").as("dxx"),
        expr(s"CAST(n * syy - CAST(sy AS $dec) * sy AS $dec)")
          .cast("double").as("dyy"),
        expr(s"CAST(n * sxy - CAST(sx AS $dec) * sy AS $dec)")
          .cast("double").as("dxy"),
        col("sx"), col("sy"))
      .select(col("n"),
        ((col("dyy") - col("dxx")
          + sqrt((col("dxx") - col("dyy")) * (col("dxx") - col("dyy"))
            + lit(4.0) * col("dxy") * col("dxy")))
          / (lit(2.0) * col("dxy"))).as("deming_slope"),
        (col("dxy") / col("dxx")).as("ols_slope"),
        col("sx"), col("sy"))
      .withColumn("deming_intercept_cents",
        (col("sy").cast("double") - col("deming_slope")
          * col("sx").cast("double")) / col("n").cast("double"))
      .drop("sx", "sy")
  }

  private val demingRegressionSql =
    """WITH ox AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS x
      |  FROM orders GROUP BY 1
      |), ly AS (
      |  SELECT epoch_ns(l_shipdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS y
      |  FROM lineitem GROUP BY 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy
      |  FROM ox JOIN ly USING (day)
      |), d AS (
      |  SELECT n, sx, sy,
      |    CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR)
      |      AS DOUBLE) AS dxx,
      |    CAST(CAST(n * syy - CAST(sy AS HUGEINT) * sy AS VARCHAR)
      |      AS DOUBLE) AS dyy,
      |    CAST(CAST(n * sxy - CAST(sx AS HUGEINT) * sy AS VARCHAR)
      |      AS DOUBLE) AS dxy
      |  FROM m
      |)
      |SELECT n,
      |  (dyy - dxx + sqrt((dxx - dyy) * (dxx - dyy) + 4.0 * dxy * dxy))
      |    / (2.0 * dxy) AS deming_slope,
      |  dxy / dxx AS ols_slope,
      |  (CAST(sy AS DOUBLE)
      |    - ((dyy - dxx + sqrt((dxx - dyy) * (dxx - dyy)
      |        + 4.0 * dxy * dxy)) / (2.0 * dxy)) * CAST(sx AS DOUBLE))
      |    / CAST(n AS DOUBLE) AS deming_intercept_cents
      |FROM d""".stripMargin

  // ---- indirect standardization (SMR) -----------------------------------------

  /** INDIRECTLY STANDARDIZED urgency ratio per nation — the
    * epidemiology adjustment (SMR = observed/expected) that answers
    * "is this nation really more urgent-heavy, or does it just order
    * in urgent-heavy YEARS?": expected counts apply each year's GLOBAL
    * urgent rate to the nation's own year mix (q451 tests raw rates;
    * this removes the calendar confounder first, the indirect twin of
    * q482's stratified OR). Per-(nation, year) cells → exact floored
    * micro expectations → one mirrored ratio per nation. */
  def smrUrgency(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        year(to_date(col("o_orderdate"))).as("y"))
      .agg(count(lit(1)).as("n_ny"),
        sum(col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"))
          .as("u_ny"))
      .localCheckpoint(false)
    val yearRates = cells.groupBy(col("y"))
      .agg(sum(col("n_ny")).as("n_y"), sum(col("u_ny")).as("u_y"))
    cells.join(broadcast(yearRates), "y")
      .groupBy(col("c_nationkey"))
      .agg(sum(col("u_ny")).as("observed"),
        sum(expr(s"CAST((CAST(n_ny AS $dec) * u_y * 1000000) div n_y AS BIGINT)"))
          .as("expected_micro"))
      .select(col("c_nationkey"), col("observed"), col("expected_micro"),
        expr(s"""CAST((CAST(observed AS $dec) * 1000000000000)
                 div expected_micro AS BIGINT)""").as("smr_micro"))
      .orderBy(col("c_nationkey"))
  }

  private val smrUrgencySql =
    """WITH cells AS (
      |  SELECT c_nationkey, year(CAST(o_orderdate AS DATE)) AS y,
      |    CAST(COUNT(*) AS BIGINT) AS n_ny,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS u_ny
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), yr AS (
      |  SELECT y, CAST(SUM(n_ny) AS BIGINT) AS n_y,
      |    CAST(SUM(u_ny) AS BIGINT) AS u_y
      |  FROM cells GROUP BY 1
      |), e AS (
      |  SELECT c_nationkey, CAST(SUM(u_ny) AS BIGINT) AS observed,
      |    CAST(SUM((CAST(n_ny AS HUGEINT) * u_y * 1000000) // n_y)
      |      AS BIGINT) AS expected_micro
      |  FROM cells JOIN yr USING (y)
      |  GROUP BY 1
      |)
      |SELECT c_nationkey, observed, expected_micro,
      |  CAST((CAST(observed AS HUGEINT) * 1000000000000)
      |    // expected_micro AS BIGINT) AS smr_micro
      |FROM e
      |ORDER BY c_nationkey""".stripMargin

  // ---- seasonal Mann–Kendall --------------------------------------------------

  /** SEASONAL Mann–Kendall: q384's monotone-trend S computed WITHIN
    * each month-of-year over the (year, monthly revenue) series, then
    * summed — the hydrology-standard variant that a strong seasonal
    * cycle cannot fool (plain MK reads the seasonal up-ramps as trend;
    * here January is only ever compared with other Januaries).
    * Season-local pairs join on the month key (≤ 12·C(years,2) pairs at
    * any data scale), tie-corrected variance numerators sum across
    * seasons, and the continuity-corrected z reuses the exact q384
    * convention. */
  def seasonalMannKendall(spark: SparkSession, dir: String): DataFrame = {
    val monthly = Catalog.load(spark, dir, "orders")
      .groupBy(year(to_date(col("o_orderdate"))).as("yr"),
        month(to_date(col("o_orderdate"))).as("mo"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("c"))
      .localCheckpoint(false)
    val a = monthly.select(col("mo"), col("yr").as("y1"), col("c").as("c1"))
    val b = monthly.select(col("mo").as("mo2"), col("yr").as("y2"),
      col("c").as("c2"))
    val s = a.join(b, col("mo") === col("mo2") && col("y1") < col("y2"))
      .agg(sum(signum(col("c2") - col("c1")).cast("long")).as("s_stat"),
        count(lit(1)).as("n_pairs"))
    val vars = monthly.groupBy(col("mo"), col("c"))
      .agg(count(lit(1)).as("t"))
      .groupBy(col("mo"))
      .agg(sum(col("t")).as("n_m"),
        sum(col("t") * (col("t") - 1) * (col("t") * 2 + 5)).as("tie_m"))
      .agg(sum(col("n_m")).as("n"),
        sum(col("n_m") * (col("n_m") - 1) * (col("n_m") * 2 + 5)
          - col("tie_m")).as("var_num"))
    s.crossJoin(broadcast(vars))
      .select(col("n"), col("n_pairs"), col("s_stat"), col("var_num"),
        expr(mkZExpr).as("z"))
  }

  private val seasonalMannKendallSql =
    s"""WITH monthly AS (
       |  SELECT year(CAST(o_orderdate AS DATE)) AS yr,
       |    month(CAST(o_orderdate AS DATE)) AS mo,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
       |      AS c
       |  FROM orders GROUP BY 1, 2
       |), s AS (
       |  SELECT CAST(SUM(CASE WHEN b.c > a.c THEN 1
       |                       WHEN b.c < a.c THEN -1 ELSE 0 END) AS BIGINT)
       |      AS s_stat,
       |    CAST(COUNT(*) AS BIGINT) AS n_pairs
       |  FROM monthly a JOIN monthly b
       |    ON a.mo = b.mo AND a.yr < b.yr
       |), vm AS (
       |  SELECT mo, CAST(SUM(t) AS BIGINT) AS n_m,
       |    CAST(SUM(t * (t - 1) * (t * 2 + 5)) AS BIGINT) AS tie_m
       |  FROM (SELECT mo, c, CAST(COUNT(*) AS BIGINT) AS t
       |        FROM monthly GROUP BY 1, 2) x
       |  GROUP BY 1
       |), v AS (
       |  SELECT CAST(SUM(n_m) AS BIGINT) AS n,
       |    CAST(SUM(n_m * (n_m - 1) * (n_m * 2 + 5) - tie_m) AS BIGINT)
       |      AS var_num
       |  FROM vm
       |)
       |SELECT n, n_pairs, s_stat, var_num,
       |  CASE WHEN s_stat > 0 THEN (CAST(s_stat AS DOUBLE) - 1.0)
       |    / sqrt(CAST(var_num AS DOUBLE) / 18.0)
       |  WHEN s_stat < 0 THEN (CAST(s_stat AS DOUBLE) + 1.0)
       |    / sqrt(CAST(var_num AS DOUBLE) / 18.0)
       |  ELSE 0.0 END AS z
       |FROM s, v""".stripMargin

  /** DIRECTLY standardized urgency rates per nation — the other
    * classical adjustment, completing q507's indirect SMR: apply each
    * nation's OWN year-specific rates to the GLOBAL year mix, so every
    * nation is scored on the same standard calendar. Direct
    * standardization is what you publish when nations are big enough
    * to have stable stratum rates; indirect (q507) when they are not —
    * shipping both is the textbook pairing. Exact floored micro rate
    * per (nation, year), global-weight blend, one mirrored ratio. */
  def directStandardization(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cells = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"),
        year(to_date(col("o_orderdate"))).as("y"))
      .agg(count(lit(1)).as("n_ny"),
        sum(col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long"))
          .as("u_ny"))
      .localCheckpoint(false)
    val weights = cells.groupBy(col("y")).agg(sum(col("n_ny")).as("w_y"))
    val tot = weights.agg(sum(col("w_y")).as("w"))
    cells.join(broadcast(weights), "y")
      .crossJoin(broadcast(tot))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("u_ny")).as("observed"), sum(col("n_ny")).as("n_orders"),
        // Σ_y w_y·(u_ny/n_ny) in floored micro, then / Σw — the
        // standardized rate on the global calendar mix
        sum(expr(s"CAST((CAST(u_ny AS $dec) * w_y * 1000000) div n_ny AS BIGINT)"))
          .as("num_micro"),
        max(col("w")).as("w"))
      .select(col("c_nationkey"), col("observed"), col("n_orders"),
        expr("CAST(num_micro div w AS BIGINT)").as("adj_rate_micro"),
        expr(s"""CAST((CAST(observed AS $dec) * 1000000) div n_orders
                 AS BIGINT)""").as("crude_rate_micro"))
      .orderBy(col("c_nationkey"))
  }

  private val directStandardizationSql =
    """WITH cells AS (
      |  SELECT c_nationkey, year(CAST(o_orderdate AS DATE)) AS y,
      |    CAST(COUNT(*) AS BIGINT) AS n_ny,
      |    CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END) AS BIGINT) AS u_ny
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), wt AS (
      |  SELECT y, CAST(SUM(n_ny) AS BIGINT) AS w_y FROM cells GROUP BY 1
      |), tw AS (
      |  SELECT CAST(SUM(w_y) AS BIGINT) AS w FROM wt
      |), e AS (
      |  SELECT c_nationkey, CAST(SUM(u_ny) AS BIGINT) AS observed,
      |    CAST(SUM(n_ny) AS BIGINT) AS n_orders,
      |    CAST(SUM((CAST(u_ny AS HUGEINT) * w_y * 1000000) // n_ny)
      |      AS BIGINT) AS num_micro,
      |    MAX(w) AS w
      |  FROM cells JOIN wt USING (y), tw
      |  GROUP BY 1
      |)
      |SELECT c_nationkey, observed, n_orders,
      |  CAST(num_micro // w AS BIGINT) AS adj_rate_micro,
      |  CAST((CAST(observed AS HUGEINT) * 1000000) // n_orders AS BIGINT)
      |    AS crude_rate_micro
      |FROM e
      |ORDER BY c_nationkey""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q514_direct_standardization", directStandardization,
      Some(directStandardizationSql),
      "directly standardized urgency rates per nation (own year rates " +
        "on the global calendar mix, floored micro) next to the crude " +
        "rate — the textbook pair to q507's indirect SMR"),
    Q("q507_smr_urgency", smrUrgency, Some(smrUrgencySql),
      "indirectly standardized urgency ratio per nation (year-rate " +
        "expectations in floored micro-units) — the SMR adjustment " +
        "that removes the calendar confounder before comparing"),
    Q("q508_seasonal_mann_kendall", seasonalMannKendall,
      Some(seasonalMannKendallSql),
      "seasonal Mann-Kendall: within-month-of-year trend S summed " +
        "across seasons with tie-corrected variance — the cycle-proof " +
        "variant of q384"),
    Q("q498_deming", demingRegression, Some(demingRegressionSql),
      "Deming errors-in-both regression of line-sum vs header daily " +
        "revenue (two measurements of one quantity) next to the " +
        "attenuated OLS slope — exact decimal moments, one sqrt chain"),
    Q("q495_arc_elasticity", arcElasticity, Some(arcElasticitySql),
      "arc price elasticity of demand between adjacent discount levels " +
        "(midpoint formula, sign-split exact micro-units) — the local " +
        "pricing curve next to q433's global slope"),
    Q("q491_graph_evolution", graphEvolution, Some(graphEvolutionSql),
      "monthly trade-graph evolution: active nodes, edges, bipartite " +
        "density, share of first-seen edges — the growth-vs-churn time " +
        "axis the static graph family lacks"),
    Q("q489_croston", croston, Some(crostonSql),
      "Croston intermittent-demand forecast per part (separate 8/4/2/1 " +
        "smoothing of nonzero sizes and inter-demand intervals, exact " +
        "micro rate at the latest event) — the sparse-SKU gap in the " +
        "forecasting family"),
    Q("q486_price_index", priceIndex, Some(priceIndexSql),
      "Laspeyres/Paasche/Fisher price indices per 1996 month vs the " +
        "1995 base over the matched part basket — exact rational unit " +
        "prices in floored micro-cents"),
    Q("q475_trade_reciprocity", tradeReciprocity,
      Some(tradeReciprocitySql),
      "nation-network reciprocity: edge/value share matched by reverse " +
        "flow + density-corrected Garlaschelli-Loffredo rho — exact " +
        "integers, three mirrored divisions"),
    Q("q455_haar_pyramid", haarPyramid, Some(haarPyramidSql),
      "3-level un-normalized Haar pyramid of daily revenue: exact " +
        "BIGINT approximation + detail per dyadic bucket — " +
        "multiresolution change localization, no float averaging"),
    Q("q451_bh_correction", bhCorrection, Some(bhCorrectionSql),
      "Benjamini-Hochberg FDR control over 25 per-nation urgent-rate " +
        "z-tests: BH runs in z-space against a literal critical-value " +
        "table (no runtime normal quantile), step-up flags every rank " +
        "up to the last hit"),
    Q("q371_abc_classes", abcClasses, Some(abcClassesSql),
      "ABC revenue classes (80/95% cuts by exact integer cross-multiply) " +
        "— inventory-policy partition of the part catalog"),
    Q("q372_levene", levene, Some(leveneSql),
      "Brown-Forsythe variance-homogeneity W across order priorities, " +
        "exact group medians + pivoted fixed-chain quotient"),
    Q("q373_cohens_d", cohensD, Some(cohensDSql),
      "Cohen's d effect size for order value between custkey%2 arms — " +
        "exact moments, one mirrored pooled-SD chain"),
    Q("q374_jarque_bera", jarqueBera, Some(jarqueBeraSql),
      "Jarque-Bera normality per priority from exact dollar power sums " +
        "(skewness + excess kurtosis chain)"),
    Q("q375_readability", readability, Some(readabilitySql),
      "Automated Readability Index per source from exact char/word/" +
        "sentence counts — syllable-free quality grade"),
    Q("q376_isotropy", isotropy, Some(isotropySql),
      "embedding isotropy via (norm-of-sum minus sum-of-norms) identity " +
        "— mean pairwise dot with NO pairwise join"),
    Q("q377_silhouette", silhouette, Some(silhouetteSql),
      "median centroid-silhouette per label, integer n-scaled distances, " +
        "rank-selected median — label-geometry health"),
    Q("q378_label_centroid_sim", labelCentroidSim, Some(labelCentroidSimSql),
      "label-centroid cosine matrix from unnormalized integer sum " +
        "vectors — k x k class-confusability geometry"),
    Q("q379_dim_clip", dimClip, Some(dimClipSql),
      "exact p1/p99 scaled-int clip bounds per embedding dimension — " +
        "int8 quantization calibration table"),
    Q("q380_drawdown", drawdown, Some(drawdownSql),
      "max drawdown of daily revenue vs running peak, exact cents, " +
        "first-day tie-break"),
    Q("q381_bollinger", bollinger, Some(bollingerSql),
      "trailing-7-day mean+-2sigma breach counts with the variance test " +
        "cross-multiplied to pure integers"),
    Q("q382_stickiness", stickiness, Some(stickinessSql),
      "monthly mean-DAU/MAU stickiness ratio, integer state, one final " +
        "division"),
    Q("q383_tax_margin", taxMargin, Some(taxMarginSql),
      "effective tax share of net revenue by supplier nation in exact " +
        "cent-basis-point units"),
    Q("q384_mann_kendall", mannKendall, Some(mannKendallSql),
      "Mann-Kendall trend test on daily revenue: exact integer S + tie-" +
        "corrected variance, shared-text continuity-corrected z"),
    Q("q385_runs_test", runsTest, Some(runsTestSql),
      "Wald-Wolfowitz runs test vs the exact daily-revenue median — " +
        "regime-clustering detector, integer counts, shared-text z"),
    Q("q386_source_trigram_cos", sourceTrigramCos, Some(sourceTrigramCosSql),
      "pairwise char-trigram cosine between source profiles — sub-word " +
        "style/mirror similarity matrix"),
    Q("q387_return_rate", returnRate, Some(returnRateSql),
      "return rate by brand with Wilson 95% lower bound — small-n-honest " +
        "defect leaderboard"),
    Q("q388_open_orders", openOrders, Some(openOrdersSql),
      "top-10 open-order backlog days from a +1/-1 place/last-ship delta " +
        "cumulation — WIP curve peaks"),
    Q("q389_gini_segment", giniSegment, Some(giniSegmentSql),
      "Gini concentration of order value per priority segment via the " +
        "exact integer rank formula"),
    Q("q390_growth_accounting", growthAccounting, Some(growthAccountingSql),
      "weekly new/retained/resurrected/churned user decomposition from " +
        "one distinct (user, week) frame"),
    Q("q391_latency_percentiles", latencyPercentiles, Some(latencyPercentilesSql),
      "exact p50/p90/p99 order-to-ship latency days per priority — SLA " +
        "tail bands, zero float columns"),
    Q("q392_priority_transitions", priorityTransitions, Some(priorityTransitionsSql),
      "customer order-priority transition matrix (counts + row-normalized " +
        "probabilities) via one LEAD window"),
    Q("q393_ab_funnel", abFunnel, Some(abFunnelSql),
      "strict-order view>click>purchase funnel split by user%2 arms with " +
        "per-step conversion — the experiment readout"),
    Q("q394_balance_deciles", balanceDeciles, Some(balanceDecilesSql),
      "exact account-balance decile boundaries per market segment, rank-" +
        "selected integer cents"),
    Q("q396_dow_strength", dowStrength, Some(dowStrengthSql),
      "variance of daily revenue explained by weekday (eta-squared) from " +
        "pivoted exact moments — seasonality strength"),
    Q("q397_length_curriculum", lengthCurriculum, Some(lengthCurriculumSql),
      "rank-exact length-quartile curriculum stages with per-stage doc/" +
        "token/char budgets — staged-training manifest"),
    Q("q398_shard_balance", shardBalance, Some(shardBalanceSql),
      "token-mass balance across a 64-way deterministic sharding with " +
        "max/avg imbalance ratio — straggler pre-flight"),
    Q("q399_share_shift", shareShift, Some(shareShiftSql),
      "top-20 month-over-month brand revenue-share movers — the mix-" +
        "shift report, integer month index"),
    Q("q400_reorder_interval", reorderInterval, Some(reorderIntervalSql),
      "median days between consecutive orders per market segment — " +
        "replenishment cycle, rank-exact, zero floats"),
    Q("q401_benford2", benford2, Some(benford2Sql),
      "second-significant-digit distribution of order cents — the " +
        "forensic companion to the first-digit test"),
    Q("q402_rank_convergence", rankConvergence, Some(rankConvergenceSql),
      "per-round L1 movement of the micro-integer PageRank — exact " +
        "convergence curve, oracle unrolls the same recurrence"),
    Q("q403_stale_parts", staleParts, Some(stalePartsSql),
      "top-20 stalest parts by days since last shipment — dead-stock " +
        "report, exact day integers"),
    Q("q404_price_deviation", priceDeviation, Some(priceDeviationSql),
      "10%-bucket histogram of line price vs catalog price basis points " +
        "— pricing-integrity audit, integer floor division"),
    Q("q405_same_day_orders", sameDayOrders, Some(sameDayOrdersSql),
      "customers placing k orders on one day — double-submit audit " +
        "histogram"),
    Q("q406_term_pmi", termPmi, Some(termPmiSql),
      "top-20 co-occurring term pairs by exact micro-unit lift, df in " +
        "[5, 90% of docs] + 100-term doc cap mirrored in the oracle"),
    Q("q407_region_index", regionIndex, Some(regionIndexSql),
      "revenue-share over customer-share index per region via one exact " +
        "cross-multiplication"),
    Q("q408_balance_spend_corr", balanceSpendCorr, Some(balanceSpendCorrSql),
      "Pearson r between account balance and lifetime spend (zero-spend " +
        "customers included) — exact decimal moments"),
    Q("q409_single_source_risk", singleSourceRisk, Some(singleSourceRiskSql),
      "decile histogram of each part's top-supplier volume share — " +
        "single-source risk, integer-only"),
    Q("q410_weekend_welch", weekendWelch, Some(weekendWelchSql),
      "Welch t for weekend vs weekday daily revenue from pivoted exact " +
        "moments — day-mix contrast"),
    Q("q411_status_flow", statusFlow, Some(statusFlowSql),
      "order-status x line-status contingency with shares — state-machine " +
        "integrity audit"),
    Q("q412_qty_discount", qtyDiscount, Some(qtyDiscountSql),
      "mean discount basis points by quantity in exact integer micro-" +
        "units — float-free discount schedule"),
    Q("q413_trade_matrix", tradeMatrix, Some(tradeMatrixSql),
      "top-20 customer-nation to supplier-nation revenue corridors — " +
        "all-pairs trade-flow leaderboard"),
    Q("q414_first_priority_repeat", firstPriorityRepeat,
      Some(firstPriorityRepeatSql),
      "repeat-purchase rate cohorted by first-order priority — entry-" +
        "order loyalty signal"),
    Q("q415_cohort_quality", cohortQuality, Some(cohortQualitySql),
      "mean first-order value by acquisition month in exact integer " +
        "micro-cents — acquisition-quality drift"),
    Q("q416_realized_discount", realizedDiscount, Some(realizedDiscountSql),
      "monthly revenue-weighted realized discount rate, exact micro-" +
        "units — what the schedule costs"),
    Q("q417_recency_score", recencyScore, Some(recencyScoreSql),
      "top-20 customers by hyperbolic recency-weighted spend — exact-" +
        "integer decay, no transcendentals"),
    Q("q418_basket_value_median", basketValueMedian, Some(basketValueMedianSql),
      "exact median order value by basket line count — whale-proof " +
        "ticket-size curve"),
    Q("q419_ship_fragmentation", shipFragmentation, Some(shipFragmentationSql),
      "distinct ship dates per order histogram — shipment fragmentation " +
        "cost profile"),
    Q("q420_discount_returns", discountReturns, Some(discountReturnsSql),
      "return rate by discount basis-point bucket — margin x reverse-" +
        "logistics interaction"),
    Q("q421_value_bands", valueBands, Some(valueBandsSql),
      "exact p50/p90 event value cents per event type — per-type " +
        "monetization bands"),
    Q("q422_activity_gini", activityGini, Some(activityGiniSql),
      "Gini of events-per-user via the exact integer rank formula — " +
        "bot/power-user concentration signal"),
    Q("q423_latency_trend", latencyTrend, Some(latencyTrendSql),
      "OLS slope of the monthly MEDIAN ship latency — whale-proof " +
        "fulfillment-drift detector, exact integer moments"),
    Q("q424_peak_week_share", peakWeekShare, Some(peakWeekShareSql),
      "peak revenue week and its share of annual revenue per year — " +
        "capacity-planning peakiness"),
    Q("q425_brand_dow_strength", brandDowStrength, Some(brandDowStrengthSql),
      "top-10 brands by weekday-seasonality eta-squared — per-brand " +
        "pivoted fixed-chain variance decomposition"),
    Q("q426_monthly_arpu", monthlyArpu, Some(monthlyArpuSql),
      "monthly revenue per distinct ordering customer in exact integer " +
        "micro-cents — unit-economics trendline"),
    Q("q427_value_cv", valueCv, Some(valueCvSql),
      "coefficient of variation of order value per priority — normalized " +
        "dispersion from exact moments"))
}
