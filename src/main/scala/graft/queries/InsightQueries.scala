package graft.queries

import graft.Q
import graft.catalog.Catalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Round-9 applied-diagnostics pack (q430–q436): contingency testing,
  * demand regularity, supply concentration, discount response, returns
  * comparison, classical seasonality, and acquisition-quality cohorts —
  * every query exact-integer (micro-unit fixed point, `div`/`//`
  * mirrored, sign-split where a quotient can be negative) or
  * exact-operand IEEE with identical expression text, so each is
  * DuckDB-oracle-checked bit for bit.
  *
  * Scale shapes: every aggregate is a map-side-combinable hash agg on a
  * fact scan; windows run either per-key (lag over customer orders) or
  * over dimension/aggregate-sized frames (24-cell contingency, ~80-month
  * series, per-customer firsts); the one dimension join broadcasts part.
  */
object InsightQueries {

  private val dec = "decimal(38,0)"

  // ---- priority × status chi-square contingency -------------------------

  /** Pearson chi-square independence cells for order-priority × order-
    * status: does priority actually move fulfillment state? Observed
    * counts are exact BIGINTs; expected counts and per-cell chi²
    * contributions are exact micro-units through one cross-
    * multiplication — (O·T − R·C)² / (R·C·T) never materializes a float
    * (decimal(38) here, HUGEINT in the oracle). The marginals come from
    * windows over the 15-cell aggregate, not a rescan; no join at all.
    * Bound: safe while T² ≤ 10³² — beyond that (counts past ~10¹⁶ rows)
    * drop the micro-unit scale; a chi² on counts that size is decided
    * anyway. */
  def contingencyChi2(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_orderpriority"), col("o_orderstatus"))
      .agg(count(lit(1)).as("o"))
    o.withColumn("r",
        sum(col("o")).over(Window.partitionBy(col("o_orderpriority"))))
      .withColumn("c",
        sum(col("o")).over(Window.partitionBy(col("o_orderstatus"))))
      .withColumn("t", sum(col("o")).over(Window.partitionBy()))
      .select(col("o_orderpriority"), col("o_orderstatus"), col("o"),
        expr(s"CAST((CAST(r AS $dec) * c * 1000000) div t AS BIGINT)")
          .as("e_micro"),
        expr(s"""CAST(((CAST(o AS $dec) * t - CAST(r AS $dec) * c)
                 * (CAST(o AS $dec) * t - CAST(r AS $dec) * c) * 1000000)
                 div (CAST(r AS $dec) * c * t) AS BIGINT)""")
          .as("chi2_micro"))
      .orderBy(col("o_orderpriority"), col("o_orderstatus"))
  }

  private val contingencyChi2Sql =
    """WITH o AS (
      |  SELECT o_orderpriority, o_orderstatus, CAST(COUNT(*) AS BIGINT) AS o
      |  FROM orders GROUP BY 1, 2
      |), x AS (
      |  SELECT o_orderpriority, o_orderstatus, o,
      |    CAST(SUM(o) OVER (PARTITION BY o_orderpriority) AS HUGEINT) AS r,
      |    CAST(SUM(o) OVER (PARTITION BY o_orderstatus) AS HUGEINT) AS c,
      |    CAST(SUM(o) OVER () AS HUGEINT) AS t
      |  FROM o
      |)
      |SELECT o_orderpriority, o_orderstatus, o,
      |  CAST((r * c * 1000000) // t AS BIGINT) AS e_micro,
      |  CAST(((CAST(o AS HUGEINT) * t - r * c)
      |    * (CAST(o AS HUGEINT) * t - r * c) * 1000000)
      |    // (r * c * t) AS BIGINT) AS chi2_micro
      |FROM x ORDER BY o_orderpriority, o_orderstatus""".stripMargin

  // ---- order-gap regularity (coefficient of variation) ------------------

  /** The 20 most REGULAR customers: lowest squared coefficient of
    * variation of days between consecutive distinct order dates (≥5
    * dates). CV² = var/mean² collapses to the pure-integer identity
    * (n·Σg² − (Σg)²) / (Σg)² — no float ever; same-day repeat orders are
    * deduplicated first so a zero gap can't fake regularity. One
    * per-customer lag window + one grouped pass; top-20 is a
    * TakeOrderedAndProject, not a global sort. */
  def orderGapRegularity(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"))
    Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      .distinct()
      .withColumn("nd", lead(col("od"), 1).over(w))
      .filter(col("nd").isNotNull)
      .select(col("o_custkey"),
        datediff(col("nd"), col("od")).cast("long").as("g"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_gaps"), sum(col("g")).as("sg"),
        sum(col("g") * col("g")).as("sgg"))
      .filter(col("n_gaps") >= 4 && col("sg") > 0)
      .select(col("o_custkey"), col("n_gaps"),
        expr("CAST((sg * 1000000) div n_gaps AS BIGINT)").as("mean_gap_micro"),
        expr("CAST(((n_gaps * sgg - sg * sg) * 1000000) div (sg * sg) AS BIGINT)")
          .as("cv2_micro"))
      .orderBy(col("cv2_micro"), col("o_custkey"))
      .limit(20)
  }

  private val orderGapRegularitySql =
    """WITH seq AS (
      |  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS od
      |  FROM orders
      |), gaps AS (
      |  SELECT o_custkey,
      |    CAST(lead(od) OVER (PARTITION BY o_custkey ORDER BY od) - od
      |      AS BIGINT) AS g
      |  FROM seq
      |), s AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_gaps,
      |    CAST(SUM(g) AS BIGINT) AS sg, CAST(SUM(g * g) AS BIGINT) AS sgg
      |  FROM gaps WHERE g IS NOT NULL GROUP BY 1
      |)
      |SELECT o_custkey, n_gaps,
      |  CAST((sg * 1000000) // n_gaps AS BIGINT) AS mean_gap_micro,
      |  CAST(((n_gaps * sgg - sg * sg) * 1000000) // (sg * sg) AS BIGINT)
      |    AS cv2_micro
      |FROM s
      |WHERE n_gaps >= 4 AND sg > 0
      |ORDER BY cv2_micro, o_custkey
      |LIMIT 20""".stripMargin

  // ---- supplier concentration (Herfindahl) per part ---------------------

  /** The 20 most supplier-concentrated parts among those with ≥2
    * suppliers: Herfindahl–Hirschman index of supplier quantity shares,
    * exact micro-units via HHI = Σq_s²/T² — a SINGLE integer division,
    * never per-share rounding. The supply-chain-risk ranking: a part at
    * 10⁶ micro-units rides on one supplier. Two map-side-combinable
    * aggregates; no join at all. */
  def supplierHhi(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey"), col("l_suppkey"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("q"))
      .groupBy(col("l_partkey"), col("l_suppkey"))
      .agg(sum(col("q")).as("qs"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_suppliers"), sum(col("qs")).as("total_qty"),
        sum(col("qs") * col("qs")).as("sq2"))
      .filter(col("n_suppliers") >= 2 && col("total_qty") > 0)
      .select(col("l_partkey"), col("n_suppliers"), col("total_qty"),
        expr("CAST((sq2 * 1000000) div (total_qty * total_qty) AS BIGINT)")
          .as("hhi_micro"))
      .orderBy(col("hhi_micro").desc, col("l_partkey"))
      .limit(20)

  private val supplierHhiSql =
    """WITH per AS (
      |  SELECT l_partkey, l_suppkey,
      |    CAST(SUM(CAST(round(l_quantity) AS BIGINT)) AS BIGINT) AS qs
      |  FROM lineitem GROUP BY 1, 2
      |), s AS (
      |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_suppliers,
      |    CAST(SUM(qs) AS BIGINT) AS total_qty,
      |    CAST(SUM(qs * qs) AS BIGINT) AS sq2
      |  FROM per GROUP BY 1
      |)
      |SELECT l_partkey, n_suppliers, total_qty,
      |  CAST((sq2 * 1000000) // (total_qty * total_qty) AS BIGINT) AS hhi_micro
      |FROM s
      |WHERE n_suppliers >= 2 AND total_qty > 0
      |ORDER BY hhi_micro DESC, l_partkey
      |LIMIT 20""".stripMargin

  // ---- discount response slope per brand --------------------------------

  /** Per-brand OLS slope of quantity on discount (basis points) — the
    * demand-response proxy: does discounting this brand move volume?
    * Slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) in exact micro-units; the
    * numerator can be negative, so the quotient is sign-split onto
    * non-negative operands (floor-vs-truncate division differs between
    * engines for negatives — the q105/PCA rule). x is exact (discounts
    * are 0.00–0.10 in cents), y exact; moments come from ONE grouped
    * pass over the broadcast-part join. */
  def discountResponse(spark: SparkSession, dir: String): DataFrame = {
    val part = Catalog.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand").as("brand"))
    Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("x"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("y"))
      .join(broadcast(part), col("l_partkey") === col("p_partkey"))
      .groupBy(col("brand"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("y")).as("sy"), sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .withColumn("num", col("n") * col("sxy") - col("sx") * col("sy"))
      .withColumn("den", col("n") * col("sxx") - col("sx") * col("sx"))
      .filter(col("den") > 0)
      .select(col("brand"), col("n"),
        expr(s"""CAST(CASE WHEN num < 0
                 THEN -((CAST(-num AS $dec) * 1000000) div den)
                 ELSE (CAST(num AS $dec) * 1000000) div den
                 END AS BIGINT)""").as("slope_micro"))
      .orderBy(col("brand"))
  }

  private val discountResponseSql =
    """WITH d AS (
      |  SELECT p_brand AS brand,
      |    CAST(round(l_discount * 10000) AS BIGINT) AS x,
      |    CAST(round(l_quantity) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), s AS (
      |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM d GROUP BY 1
      |), m AS (
      |  SELECT brand, n, n * sxy - sx * sy AS num,
      |    n * sxx - sx * sx AS den
      |  FROM s
      |)
      |SELECT brand, n,
      |  CAST(CASE WHEN num < 0
      |    THEN -((CAST(-num AS HUGEINT) * 1000000) // den)
      |    ELSE (CAST(num AS HUGEINT) * 1000000) // den
      |  END AS BIGINT) AS slope_micro
      |FROM m
      |WHERE den > 0
      |ORDER BY brand""".stripMargin

  // ---- returns-rate two-proportion z per order priority -----------------

  /** Two-proportion z-test of each order priority's line-return rate
    * against all other priorities pooled — "do urgent orders really come
    * back more?" with a real test statistic, not an eyeballed rate.
    * Counts are exact; every float op is a single correctly-rounded IEEE
    * operation on exact operands with IDENTICAL parenthesized expression
    * text on both engines (and a leading CAST AS DOUBLE so DuckDB can't
    * slip into decimal arithmetic). One fact-fact join on the 8-byte
    * orderkey, one grouped pass, a broadcast 1-row total. */
  def returnsZtest(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"),
        when(col("l_returnflag") === "R", 1L).otherwise(0L).as("ret"))
    val per = li.join(Catalog.load(spark, dir, "orders")
          .select(col("o_orderkey"), col("o_orderpriority")),
        col("l_orderkey") === col("o_orderkey"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n1"), sum(col("ret")).as("r1"))
    val tot = per.agg(sum(col("n1")).as("nt"), sum(col("r1")).as("rt"))
    per.crossJoin(broadcast(tot))
      .select(col("o_orderpriority"), col("n1"), col("r1"),
        (col("nt") - col("n1")).as("n2"), (col("rt") - col("r1")).as("r2"),
        col("nt"), col("rt"))
      .filter(col("n1") > 0 && col("n2") > 0)
      .selectExpr("o_orderpriority", "n1", "r1",
        "CAST(r1 AS DOUBLE) / n1 AS p1",
        "CAST(r2 AS DOUBLE) / n2 AS p2",
        """((CAST(r1 AS DOUBLE) / n1) - (CAST(r2 AS DOUBLE) / n2))
           / nullif(sqrt(((CAST(rt AS DOUBLE) / nt)
             * (CAST(1 AS DOUBLE) - (CAST(rt AS DOUBLE) / nt)))
             * ((CAST(1 AS DOUBLE) / n1) + (CAST(1 AS DOUBLE) / n2))),
             CAST(0 AS DOUBLE)) AS z""")
      .orderBy(col("o_orderpriority"))
  }

  private val returnsZtestSql =
    """WITH per AS (
      |  SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN l_returnflag = 'R' THEN 1 ELSE 0 END)
      |      AS BIGINT) AS r1
      |  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
      |  GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(n1) AS BIGINT) AS nt, CAST(SUM(r1) AS BIGINT) AS rt
      |  FROM per
      |), m AS (
      |  SELECT o_orderpriority, n1, r1, nt - n1 AS n2, rt - r1 AS r2, nt, rt
      |  FROM per, tot
      |)
      |SELECT o_orderpriority, n1, r1,
      |  CAST(r1 AS DOUBLE) / n1 AS p1,
      |  CAST(r2 AS DOUBLE) / n2 AS p2,
      |  ((CAST(r1 AS DOUBLE) / n1) - (CAST(r2 AS DOUBLE) / n2))
      |    / nullif(sqrt(((CAST(rt AS DOUBLE) / nt)
      |      * (CAST(1 AS DOUBLE) - (CAST(rt AS DOUBLE) / nt)))
      |      * ((CAST(1 AS DOUBLE) / n1) + (CAST(1 AS DOUBLE) / n2))),
      |      CAST(0 AS DOUBLE)) AS z
      |FROM m
      |WHERE n1 > 0 AND n2 > 0
      |ORDER BY o_orderpriority""".stripMargin

  // ---- classical monthly seasonal indices -------------------------------

  /** Ratio-to-centered-moving-average seasonal indices by calendar
    * month: each month's revenue over its 12-month centered MA
    * (half-weighted endpoints, the classical decomposition), averaged
    * per month-of-year — which months structurally over/under-index.
    * Entirely integer: ratio = 24·rev·10⁶ / (m₋₆ + 2·Σ₋₅..₊₅ + m₊₆),
    * index = Σratio div n. The windows run over the ~80-row MONTHLY
    * aggregate (single-reducer on aggregate-sized data — the accepted
    * shape); the fact scan is one map-side-combinable rollup. Bound:
    * 24·10⁶·monthly-cents must fit BIGINT — fine to ~380 B$/month. */
  def seasonalIndex(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.orderBy(col("mo"))
    val m = Catalog.load(spark, dir, "orders")
      .select(
        expr("CAST(date_trunc('MONTH', CAST(o_orderdate AS DATE)) AS DATE)")
          .as("mo"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .groupBy(col("mo")).agg(sum(col("cents")).as("rev"))
    m.withColumn("mlo", lag(col("rev"), 6).over(w))
      .withColumn("mhi", lead(col("rev"), 6).over(w))
      .withColumn("mid", sum(col("rev")).over(w.rowsBetween(-5, 5)))
      .withColumn("cnt", count(lit(1)).over(w.rowsBetween(-5, 5)))
      .filter(col("mlo").isNotNull && col("mhi").isNotNull && col("cnt") === 11)
      .select(month(col("mo")).cast("long").as("month"),
        expr("CAST((rev * 24000000) div (mlo + 2 * mid + mhi) AS BIGINT)")
          .as("ratio_micro"))
      .groupBy(col("month"))
      .agg(count(lit(1)).as("n_windows"), sum(col("ratio_micro")).as("s"))
      .select(col("month"), col("n_windows"),
        expr("CAST(s div n_windows AS BIGINT)").as("seasonal_index_micro"))
      .orderBy(col("month"))
  }

  private val seasonalIndexSql =
    """WITH m AS (
      |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
      |      AS mo,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1
      |), wnd AS (
      |  SELECT mo, rev,
      |    lag(rev, 6) OVER (ORDER BY mo) AS mlo,
      |    lead(rev, 6) OVER (ORDER BY mo) AS mhi,
      |    SUM(rev) OVER (ORDER BY mo
      |      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS mid,
      |    COUNT(*) OVER (ORDER BY mo
      |      ROWS BETWEEN 5 PRECEDING AND 5 FOLLOWING) AS cnt
      |  FROM m
      |), ratios AS (
      |  SELECT CAST(month(mo) AS BIGINT) AS month,
      |    CAST((rev * 24000000) // (mlo + 2 * mid + mhi) AS BIGINT)
      |      AS ratio_micro
      |  FROM wnd
      |  WHERE mlo IS NOT NULL AND mhi IS NOT NULL AND cnt = 11
      |)
      |SELECT month, CAST(COUNT(*) AS BIGINT) AS n_windows,
      |  CAST(SUM(ratio_micro) // COUNT(*) AS BIGINT)
      |    AS seasonal_index_micro
      |FROM ratios GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- first-order-value decile vs repeat rate --------------------------

  /** Acquisition quality: customers bucketed into deciles of their FIRST
    * order's value (cents; deterministic first = earliest date, then
    * lowest orderkey), with each decile's repeat rate (≥2 lifetime
    * orders) in exact micro-units — does a big first basket predict a
    * second one? The decile cut ranks the CUSTOMER dimension (first
    * orders only), not the fact table, via
    * [[graft.ops.GlobalRank.withNtile]] — exact ntile semantics with no
    * single-partition window over the customer frame; the order counts
    * ride along from the same grouped pass. */
  def firstValueRepeat(spark: SparkSession, dir: String): DataFrame = {
    val wf = Window.partitionBy(col("o_custkey"))
      .orderBy(col("od"), col("o_orderkey"))
    val first = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("rn", row_number().over(wf))
      .withColumn("n_orders", count(lit(1)).over(
        Window.partitionBy(col("o_custkey"))))
      .filter(col("rn") === 1)
    graft.ops.GlobalRank.withNtile(first, 10,
        Seq(col("cents"), col("o_custkey")), "decile")
      .withColumn("decile", col("decile").cast("long"))
      .groupBy(col("decile"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("n_orders") >= 2, 1L).otherwise(0L)).as("repeaters"))
      .select(col("decile"), col("n_customers"), col("repeaters"),
        expr("CAST((repeaters * 1000000) div n_customers AS BIGINT)")
          .as("repeat_rate_micro"))
      .orderBy(col("decile"))
  }

  private val firstValueRepeatSql =
    """WITH o AS (
      |  SELECT o_custkey, CAST(o_orderdate AS DATE) AS od, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY CAST(o_orderdate AS DATE), o_orderkey) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n_orders
      |  FROM orders
      |), first AS (
      |  SELECT o_custkey, cents, n_orders FROM o WHERE rn = 1
      |), d AS (
      |  SELECT CAST(ntile(10) OVER (ORDER BY cents, o_custkey) AS BIGINT)
      |      AS decile,
      |    n_orders
      |  FROM first
      |)
      |SELECT decile, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS repeaters,
      |  CAST((SUM(CASE WHEN n_orders >= 2 THEN 1 ELSE 0 END) * 1000000)
      |    // COUNT(*) AS BIGINT) AS repeat_rate_micro
      |FROM d GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- Kruskal–Wallis across order priorities ---------------------------

  /** Kruskal–Wallis rank test of order value across ALL FIVE priorities —
    * the k-group extension of q193's Mann–Whitney, exact end to end:
    * average tie ranks in DOUBLED integer units (2·rank_min + ties − 1),
    * per-group rank sums as BIGINTs, H and its tie-corrected form in
    * micro-units through decimal(38)/HUGEINT cross-multiplication (the
    * per-group Rj²/nj terms are floored integer divisions, mirrored —
    * the house "defined statistic" convention). Ranks come from the
    * DISTINCT-VALUE frame — min rank per value = cumulative count −
    * ties + 1 with the cumulative count an exact
    * [[graft.ops.GlobalRank.withRunningSum]] (no fact-sized
    * single-partition window) — and the per-group rank sums collapse
    * to Σ countᵍ(x)·r2(x) over distinct values; everything after runs
    * on the 5-row group aggregate. */
  def kruskalWallis(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
    val byGX = o.groupBy(col("g"), col("x")).agg(count(lit(1)).as("cnt"))
    val byX = byGX.groupBy(col("x")).agg(sum(col("cnt")).as("t"))
    val rankedX = graft.ops.GlobalRank.withRunningSum(
        byX, Seq(col("x")), col("t"), "cumn")
      .withColumn("r2",
        lit(2L) * (col("cumn") - col("t") + 1) + col("t") - 1L)
      .select(col("x").as("xk"), col("r2"))
    val grp = byGX.join(rankedX, col("x") === col("xk"))
      .groupBy(col("g"))
      .agg(sum(col("cnt")).as("nj"), sum(col("cnt") * col("r2")).as("rj2"))
      .select(expr(s"CAST((CAST(rj2 AS $dec) * rj2) div (4 * nj) AS BIGINT)")
        .as("term"), col("nj"))
    val tiesAgg = byX
      .agg(sum(col("t") * col("t") * col("t") - col("t")).as("tt"))
    grp.agg(sum(col("term")).as("sterm"), sum(col("nj")).as("n"))
      .crossJoin(broadcast(tiesAgg.select(col("tt"))))
      .select(col("n"),
        expr(s"""CAST((CAST(sterm AS $dec) * 12000000) div (n * (n + 1))
                 - 3 * (n + 1) * 1000000 AS BIGINT)""").as("h_micro"),
        expr(s"CAST(1000000 - (CAST(tt AS $dec) * 1000000) div (n * n * n - n) AS BIGINT)")
          .as("c_micro"))
      .select(col("n"), col("h_micro"), col("c_micro"),
        expr(s"""CAST(CASE WHEN h_micro < 0
                 THEN -((CAST(-h_micro AS $dec) * 1000000) div c_micro)
                 ELSE (CAST(h_micro AS $dec) * 1000000) div c_micro
                 END AS BIGINT)""").as("h_corrected_micro"))
  }

  private val kruskalWallisSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
      |  FROM orders
      |), r AS (
      |  SELECT g, x,
      |    CAST(rank() OVER (ORDER BY x) AS BIGINT) AS rmin,
      |    COUNT(*) OVER (PARTITION BY x) AS ties
      |  FROM o
      |), r2 AS (SELECT g, 2 * rmin + ties - 1 AS r2 FROM r
      |), grp AS (
      |  SELECT CAST((CAST(SUM(r2) AS HUGEINT) * SUM(r2))
      |      // (4 * COUNT(*)) AS BIGINT) AS term,
      |    CAST(COUNT(*) AS BIGINT) AS nj
      |  FROM r2 GROUP BY g
      |), t AS (
      |  SELECT CAST(SUM(t * t * t - t) AS BIGINT) AS tt FROM (
      |    SELECT CAST(COUNT(*) AS BIGINT) AS t FROM o GROUP BY x)
      |), s AS (
      |  SELECT CAST(SUM(term) AS BIGINT) AS sterm,
      |    CAST(SUM(nj) AS BIGINT) AS n
      |  FROM grp
      |), h AS (
      |  SELECT n,
      |    CAST((CAST(sterm AS HUGEINT) * 12000000) // (n * (n + 1))
      |      - 3 * (n + 1) * 1000000 AS BIGINT) AS h_micro,
      |    CAST(1000000 - (CAST(tt AS HUGEINT) * 1000000)
      |      // (n * n * n - n) AS BIGINT) AS c_micro
      |  FROM s, t
      |)
      |SELECT n, h_micro, c_micro,
      |  CAST(CASE WHEN h_micro < 0
      |    THEN -((CAST(-h_micro AS HUGEINT) * 1000000) // c_micro)
      |    ELSE (CAST(h_micro AS HUGEINT) * 1000000) // c_micro
      |  END AS BIGINT) AS h_corrected_micro
      |FROM h""".stripMargin

  // ---- per-part unit-price dispersion across lines ----------------------

  /** The 20 parts with the widest unit-price spread: per-line unit price
    * in exact micro-cents (cents·10⁶ div quantity — floored integer
    * division, mirrored), then max/min per part and their ratio in
    * micro-units — the procurement-arbitrage audit ("we paid 3× for the
    * same part"). One scan, one combinable aggregate, one top-k. */
  def priceDispersion(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .select(col("l_partkey"),
        expr("""CAST((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000)
                div CAST(round(l_quantity) AS BIGINT) AS BIGINT)""")
          .as("up"))
      .groupBy(col("l_partkey"))
      .agg(count(lit(1)).as("n_lines"), min(col("up")).as("min_up"),
        max(col("up")).as("max_up"))
      .filter(col("n_lines") >= 2 && col("min_up") > 0)
      .select(col("l_partkey"), col("n_lines"), col("min_up"), col("max_up"),
        expr(s"CAST((CAST(max_up AS $dec) * 1000000) div min_up AS BIGINT)")
          .as("spread_micro"))
      .orderBy(col("spread_micro").desc, col("l_partkey"))
      .limit(20)

  private val priceDispersionSql =
    """WITH up AS (
      |  SELECT l_partkey,
      |    CAST((CAST(round(l_extendedprice * 100) AS BIGINT) * 1000000)
      |      // CAST(round(l_quantity) AS BIGINT) AS BIGINT) AS up
      |  FROM lineitem
      |), s AS (
      |  SELECT l_partkey, CAST(COUNT(*) AS BIGINT) AS n_lines,
      |    MIN(up) AS min_up, MAX(up) AS max_up
      |  FROM up GROUP BY 1
      |)
      |SELECT l_partkey, n_lines, min_up, max_up,
      |  CAST((CAST(max_up AS HUGEINT) * 1000000) // min_up AS BIGINT)
      |    AS spread_micro
      |FROM s
      |WHERE n_lines >= 2 AND min_up > 0
      |ORDER BY spread_micro DESC, l_partkey
      |LIMIT 20""".stripMargin

  // ---- exact-integer 3σ outlier counts ----------------------------------

  /** Order-value outliers per priority WITHOUT ever computing a float
    * mean or stddev: |x − μ| > 3σ is equivalent to the pure-integer
    * comparison (n·x − S)² > 9·(n·Sxx − S²) — cross-multiplied through
    * so the census is exact on any engine (decimal(38)/HUGEINT for the
    * squares). Group moments come from one combinable aggregate,
    * broadcast back over the scan as a 5-row join; zero windows on the
    * fact. */
  def outlierCensus(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
    val m = o.groupBy(col("g"))
      .agg(count(lit(1)).as("n"), sum(col("x")).as("s"),
        sum((col("x").cast(dec) * col("x")).cast(dec)).as("sxx"))
    o.join(broadcast(m), "g")
      .select(col("g"), col("n"),
        expr(s"""CASE WHEN (CAST(n AS $dec) * x - s) * (CAST(n AS $dec) * x - s)
                 > 9 * (CAST(n AS $dec) * sxx - CAST(s AS $dec) * s)
                 THEN 1 ELSE 0 END""").as("is_out"))
      .groupBy(col("g"))
      .agg(max(col("n")).as("n_orders"),
        sum(col("is_out")).cast("long").as("n_outliers"))
      .select(col("g").as("o_orderpriority"), col("n_orders"),
        col("n_outliers"),
        expr("CAST((n_outliers * 1000000) div n_orders AS BIGINT)")
          .as("outlier_rate_micro"))
      .orderBy(col("o_orderpriority"))
  }

  private val outlierCensusSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS x
      |  FROM orders
      |), m AS (
      |  SELECT g, CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s,
      |    CAST(SUM(CAST(x AS HUGEINT) * x) AS HUGEINT) AS sxx
      |  FROM o GROUP BY 1
      |), f AS (
      |  SELECT o.g, m.n,
      |    CASE WHEN (CAST(m.n AS HUGEINT) * o.x - m.s)
      |        * (CAST(m.n AS HUGEINT) * o.x - m.s)
      |      > 9 * (CAST(m.n AS HUGEINT) * m.sxx - CAST(m.s AS HUGEINT) * m.s)
      |      THEN 1 ELSE 0 END AS is_out
      |  FROM o JOIN m ON o.g = m.g
      |)
      |SELECT g AS o_orderpriority, CAST(MAX(n) AS BIGINT) AS n_orders,
      |  CAST(SUM(is_out) AS BIGINT) AS n_outliers,
      |  CAST((SUM(is_out) * 1000000) // MAX(n) AS BIGINT)
      |    AS outlier_rate_micro
      |FROM f GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- purchase-acceleration share per segment --------------------------

  /** Is each customer ordering faster or slower over time? Per customer
    * with ≥3 inter-order gaps, the OLS slope SIGN of gap length against
    * gap index is a pure-integer quantity (n·Σig − Σi·Σg — no division
    * needed for a sign); the segment rollup reports what share of its
    * customers are accelerating (negative slope: gaps shrinking). One
    * per-customer window pass, one broadcast customer-dimension join,
    * exact micro-unit shares. */
  def accelerationShare(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey")).orderBy(col("od"))
    val gaps = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), to_date(col("o_orderdate")).as("od"))
      .distinct()
      .withColumn("nd", lead(col("od"), 1).over(w))
      .filter(col("nd").isNotNull)
      .select(col("o_custkey"),
        (row_number().over(w)).cast("long").as("i"),
        datediff(col("nd"), col("od")).cast("long").as("g"))
    val slopes = gaps.groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n"), sum(col("i")).as("si"),
        sum(col("g")).as("sg"), sum(col("i") * col("g")).as("sig"))
      .filter(col("n") >= 3)
      .select(col("o_custkey"),
        (col("n") * col("sig") - col("si") * col("sg")).as("num"))
    val cust = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_mktsegment").as("segment"))
    slopes.join(broadcast(cust), col("o_custkey") === col("c_custkey"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_customers"),
        sum(when(col("num") < 0, 1L).otherwise(0L)).as("n_accelerating"),
        sum(when(col("num") > 0, 1L).otherwise(0L)).as("n_decelerating"))
      .select(col("segment"), col("n_customers"), col("n_accelerating"),
        col("n_decelerating"),
        expr("CAST((n_accelerating * 1000000) div n_customers AS BIGINT)")
          .as("accel_share_micro"))
      .orderBy(col("segment"))
  }

  private val accelerationShareSql =
    """WITH seq AS (
      |  SELECT DISTINCT o_custkey, CAST(o_orderdate AS DATE) AS od
      |  FROM orders
      |), gaps AS (
      |  SELECT o_custkey,
      |    CAST(row_number() OVER (PARTITION BY o_custkey ORDER BY od)
      |      AS BIGINT) AS i,
      |    CAST(lead(od) OVER (PARTITION BY o_custkey ORDER BY od) - od
      |      AS BIGINT) AS g
      |  FROM seq
      |), s AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(i) AS BIGINT) AS si, CAST(SUM(g) AS BIGINT) AS sg,
      |    CAST(SUM(i * g) AS BIGINT) AS sig
      |  FROM gaps WHERE g IS NOT NULL GROUP BY 1
      |), sl AS (
      |  SELECT o_custkey, n * sig - si * sg AS num
      |  FROM s WHERE n >= 3
      |)
      |SELECT c_mktsegment AS segment, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(CASE WHEN num < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_accelerating,
      |  CAST(SUM(CASE WHEN num > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |    AS n_decelerating,
      |  CAST((SUM(CASE WHEN num < 0 THEN 1 ELSE 0 END) * 1000000)
      |    // COUNT(*) AS BIGINT) AS accel_share_micro
      |FROM sl JOIN customer ON o_custkey = c_custkey
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- Pettitt changepoint on daily order volume ------------------------

  /** Pettitt's rank-based changepoint test on the daily order-count
    * series: the day t maximizing |U_t|, U_t = Σ_{i≤t}R2_i − t(N+1)
    * with R2 the DOUBLED average tie ranks (so every U_t is an exact
    * BIGINT — Pettitt reduces to cumulative rank sums, no pair join).
    * Answers "when did volume regime-shift?" non-parametrically. The
    * ranks and cumulative windows run over the DAILY aggregate
    * (thousands of rows at any corpus scale); ties break to the
    * earliest day. */
  def pettittChangepoint(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("x"))
    val ranked = daily
      .withColumn("rmin", rank().over(Window.orderBy(col("x"))).cast("long"))
      .withColumn("ties", count(lit(1)).over(Window.partitionBy(col("x"))))
      .withColumn("r2", lit(2L) * col("rmin") + col("ties") - 1L)
    val wd = Window.orderBy(col("d"))
    ranked
      .withColumn("t", row_number().over(wd).cast("long"))
      .withColumn("cum_r2", sum(col("r2")).over(wd))
      .withColumn("n", count(lit(1)).over(Window.partitionBy()))
      .withColumn("u", col("cum_r2") - col("t") * (col("n") + 1L))
      .filter(col("t") < col("n")) // U_N ≡ 0, not a candidate
      .select(col("d").as("change_day"), col("n").as("n_days"),
        col("u").as("u_stat"), abs(col("u")).as("k_abs"))
      .orderBy(col("k_abs").desc, col("change_day"))
      .limit(1)
  }

  private val pettittChangepointSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM orders GROUP BY 1
      |), r AS (
      |  SELECT d, x,
      |    CAST(rank() OVER (ORDER BY x) AS BIGINT) AS rmin,
      |    COUNT(*) OVER (PARTITION BY x) AS ties
      |  FROM daily
      |), c AS (
      |  SELECT d, 2 * rmin + ties - 1 AS r2,
      |    CAST(row_number() OVER (ORDER BY d) AS BIGINT) AS t,
      |    CAST(SUM(2 * rmin + ties - 1) OVER (ORDER BY d) AS BIGINT)
      |      AS cum_r2,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM r
      |)
      |SELECT d AS change_day, n AS n_days,
      |  CAST(cum_r2 - t * (n + 1) AS BIGINT) AS u_stat,
      |  CAST(ABS(cum_r2 - t * (n + 1)) AS BIGINT) AS k_abs
      |FROM c
      |WHERE t < n
      |ORDER BY k_abs DESC, change_day
      |LIMIT 1""".stripMargin

  // ---- longest weekly revenue growth streaks ----------------------------

  /** The five longest runs of consecutive week-over-week revenue growth
    * — gaps-and-islands on the WEEKLY cents aggregate: flag = this week
    * beat last week (exact BIGINT comparison), island id = cumulative
    * count of non-growth weeks, streak = contiguous flagged block. The
    * momentum telemetry a "best quarter ever" claim gets checked
    * against. Windows run over ~hundreds of weekly rows at any scale. */
  def growthStreaks(spark: SparkSession, dir: String): DataFrame = {
    val wd = Window.orderBy(col("wk"))
    val weekly = Catalog.load(spark, dir, "orders")
      .groupBy(expr(
        "CAST(date_trunc('WEEK', CAST(o_orderdate AS DATE)) AS DATE)")
        .as("wk"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("rev"))
    weekly
      .withColumn("prev", lag(col("rev"), 1).over(wd))
      .filter(col("prev").isNotNull)
      .withColumn("up", when(col("rev") > col("prev"), 1L).otherwise(0L))
      .withColumn("blk", sum(lit(1L) - col("up")).over(wd))
      .filter(col("up") === 1L)
      .groupBy(col("blk"))
      .agg(count(lit(1)).as("streak_weeks"), min(col("wk")).as("start_week"),
        max(col("wk")).as("end_week"))
      .select(col("streak_weeks"), col("start_week"), col("end_week"))
      .orderBy(col("streak_weeks").desc, col("start_week"))
      .limit(5)
  }

  private val growthStreaksSql =
    """WITH weekly AS (
      |  SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE)) AS DATE)
      |      AS wk,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev
      |  FROM orders GROUP BY 1
      |), f AS (
      |  SELECT wk, rev, lag(rev) OVER (ORDER BY wk) AS prev
      |  FROM weekly
      |), g AS (
      |  SELECT wk,
      |    CASE WHEN rev > prev THEN 1 ELSE 0 END AS up,
      |    CAST(SUM(CASE WHEN rev > prev THEN 0 ELSE 1 END)
      |      OVER (ORDER BY wk) AS BIGINT) AS blk
      |  FROM f WHERE prev IS NOT NULL
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS streak_weeks,
      |  MIN(wk) AS start_week, MAX(wk) AS end_week
      |FROM g WHERE up = 1
      |GROUP BY blk
      |ORDER BY streak_weeks DESC, start_week
      |LIMIT 5""".stripMargin

  // ---- yearly priority-mix drift (total variation) ----------------------

  /** Total-variation distance between each order-year's priority mix and
    * the all-time mix — "is the business actually changing shape?" in
    * one number per year. TV = Σ|n_py·n − n_p·n_y| / (2·n_y·n) stays
    * pure integer until a single micro-unit division (the chi² cross-
    * multiplication trick applied to distribution distance — a metric
    * the KS/chi² family here didn't yet cover). Marginals via windows
    * over the ~35-row (year × priority) aggregate. */
  def priorityMixDrift(spark: SparkSession, dir: String): DataFrame = {
    val cell = Catalog.load(spark, dir, "orders")
      .groupBy(expr("CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT)")
        .as("yr"), col("o_orderpriority").as("p"))
      .agg(count(lit(1)).as("npy"))
    cell
      .withColumn("ny", sum(col("npy")).over(Window.partitionBy(col("yr"))))
      .withColumn("np", sum(col("npy")).over(Window.partitionBy(col("p"))))
      .withColumn("n", sum(col("npy")).over(Window.partitionBy()))
      .groupBy(col("yr"))
      .agg(max(col("ny")).as("n_orders"),
        sum(abs(col("npy") * col("n") - col("np") * col("ny"))).as("sad"),
        max(col("n")).as("n"))
      .select(col("yr"), col("n_orders"),
        expr(s"CAST((CAST(sad AS $dec) * 1000000) div (2 * n_orders * n) AS BIGINT)")
          .as("tv_micro"))
      .orderBy(col("yr"))
  }

  private val priorityMixDriftSql =
    """WITH cell AS (
      |  SELECT CAST(year(CAST(o_orderdate AS DATE)) AS BIGINT) AS yr,
      |    o_orderpriority AS p, CAST(COUNT(*) AS BIGINT) AS npy
      |  FROM orders GROUP BY 1, 2
      |), m AS (
      |  SELECT yr, p, npy,
      |    CAST(SUM(npy) OVER (PARTITION BY yr) AS BIGINT) AS ny,
      |    CAST(SUM(npy) OVER (PARTITION BY p) AS BIGINT) AS np,
      |    CAST(SUM(npy) OVER () AS BIGINT) AS n
      |  FROM cell
      |)
      |SELECT yr, CAST(MAX(ny) AS BIGINT) AS n_orders,
      |  CAST((CAST(SUM(ABS(npy * n - np * ny)) AS HUGEINT) * 1000000)
      |    // (2 * MAX(ny) * MAX(n)) AS BIGINT) AS tv_micro
      |FROM m GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- peak open-order concurrency (sweep line) -------------------------

  /** Peak number of simultaneously-open orders per year (open = from
    * order date through its last line's ship date) and the earliest day
    * the peak was hit — the classic sweep line: +1/−1 boundary deltas
    * netted per DAY, one cumulative window over the ~daily aggregate,
    * never an interval self-join (the naive overlap join is quadratic
    * in concurrency; the sweep is linear and aggregate-sized). Exact
    * integers end to end; capacity planning's favorite number. */
  def peakConcurrency(spark: SparkSession, dir: String): DataFrame = {
    val ends = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(max(to_date(col("l_shipdate"))).as("e"))
    val span = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("s"))
      .join(ends, col("o_orderkey") === col("l_orderkey"))
    val deltas = span.select(col("s").as("d"), lit(1L).as("dl"))
      .unionAll(span.select(date_add(col("e"), 1).as("d"), lit(-1L).as("dl")))
      .groupBy(col("d")).agg(sum(col("dl")).as("net"))
    val wd = Window.orderBy(col("d"))
    deltas
      .withColumn("open", sum(col("net")).over(wd))
      .withColumn("yr", year(col("d")).cast("long"))
      .withColumn("peak", max(col("open")).over(Window.partitionBy(col("yr"))))
      .filter(col("open") === col("peak"))
      .groupBy(col("yr"))
      .agg(max(col("peak")).as("peak_open"), min(col("d")).as("peak_day"))
      .orderBy(col("yr"))
  }

  private val peakConcurrencySql =
    """WITH ends AS (
      |  SELECT l_orderkey, MAX(CAST(l_shipdate AS DATE)) AS e
      |  FROM lineitem GROUP BY 1
      |), span AS (
      |  SELECT CAST(o_orderdate AS DATE) AS s, e
      |  FROM orders JOIN ends ON o_orderkey = l_orderkey
      |), deltas AS (
      |  SELECT d, CAST(SUM(dl) AS BIGINT) AS net FROM (
      |    SELECT s AS d, 1 AS dl FROM span
      |    UNION ALL
      |    SELECT e + 1 AS d, -1 AS dl FROM span
      |  ) GROUP BY 1
      |), sweep AS (
      |  SELECT d, CAST(SUM(net) OVER (ORDER BY d) AS BIGINT) AS open,
      |    CAST(year(d) AS BIGINT) AS yr
      |  FROM deltas
      |), peaks AS (
      |  SELECT yr, d, open,
      |    MAX(open) OVER (PARTITION BY yr) AS peak
      |  FROM sweep
      |)
      |SELECT yr, CAST(MAX(peak) AS BIGINT) AS peak_open,
      |  MIN(d) AS peak_day
      |FROM peaks WHERE open = peak
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- within-nation spend deciles --------------------------------------

  /** Top-decile revenue concentration WITHIN each nation: customers
    * deciled by spend INSIDE their nation (market-relative whales — a
    * global cut like q436's would put every customer from a rich nation
    * in the top buckets), then each nation's top-decile spend share.
    * The grouped decile is [[graft.ops.GlobalRank]]'s per-key form
    * (nation has 25 values — a PARTITION BY window would funnel 1/25 of
    * the customer dimension per task): one range shuffle on
    * (nation, spend, custkey), 25-row bases broadcast, buckets by the
    * exact ntile formula. Exact BIGINT cents; one mirrored division
    * per nation. */
  def nationDecileShare(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    val spend = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val cust = Catalog.load(spark, dir, "customer")
      .join(broadcast(Catalog.load(spark, dir, "nation")),
        col("c_nationkey") === col("n_nationkey"))
      .select(col("c_custkey"), col("n_name"))
    val base = spend.join(cust, col("o_custkey") === col("c_custkey"))
      .select(col("n_name"), col("cents"), col("o_custkey"))
    val r = GlobalRank.withRowNumber(base,
      Seq(col("n_name"), col("cents"), col("o_custkey")), "grn")
    val bounds = r.groupBy(col("n_name"))
      .agg(min(col("grn")).as("g0"), count(lit(1)).as("gn"))
      .withColumnRenamed("n_name", "bn")
    r.join(broadcast(bounds), col("n_name") <=> col("bn"))
      .withColumn("decile", GlobalRank.ntileFromRowNumber(
        col("grn") - col("g0") + 1, col("gn"), 10).cast("long"))
      .groupBy(col("n_name"))
      .agg(count(lit(1)).as("n_customers"),
        sum(col("cents")).as("nation_cents"),
        sum(when(col("decile") === 10, col("cents")).otherwise(0L))
          .as("top_decile_cents"))
      .select(col("n_name"), col("n_customers"), col("nation_cents"),
        col("top_decile_cents"),
        (col("top_decile_cents").cast("double") /
          col("nation_cents").cast("double")).as("top_decile_share"))
      .orderBy(col("n_name"))
  }

  private val nationDecileShareSql =
    """WITH spend AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), base AS (
      |  SELECT n_name, cents, o_custkey
      |  FROM spend
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |), d AS (
      |  SELECT n_name, cents,
      |    CAST(ntile(10) OVER (PARTITION BY n_name
      |      ORDER BY cents, o_custkey) AS BIGINT) AS decile
      |  FROM base
      |)
      |SELECT n_name, CAST(COUNT(*) AS BIGINT) AS n_customers,
      |  CAST(SUM(cents) AS BIGINT) AS nation_cents,
      |  CAST(SUM(CASE WHEN decile = 10 THEN cents ELSE 0 END) AS BIGINT)
      |    AS top_decile_cents,
      |  CAST(SUM(CASE WHEN decile = 10 THEN cents ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(cents) AS DOUBLE) AS top_decile_share
      |FROM d GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q469_nation_decile_share", nationDecileShare,
      Some(nationDecileShareSql),
      "within-nation spend deciles (GlobalRank grouped exact ntile) and " +
        "each nation's top-decile revenue share — market-relative whale " +
        "concentration, exact cents"),
    Q("q430_contingency_chi2", contingencyChi2, Some(contingencyChi2Sql),
      "priority × status chi-square cells: exact micro-unit expected " +
        "counts and contributions via one integer cross-multiplication " +
        "(decimal(38)/HUGEINT), marginals from windows over the 15-cell " +
        "aggregate"),
    Q("q431_order_gap_regularity", orderGapRegularity, Some(orderGapRegularitySql),
      "20 most regular customers by CV² of inter-order-date gaps — " +
        "pure-integer (nΣg²−(Σg)²)/(Σg)², ≥5 distinct dates, " +
        "TakeOrderedAndProject top-k"),
    Q("q432_supplier_hhi", supplierHhi, Some(supplierHhiSql),
      "top-20 supplier-concentrated parts: exact micro-unit Herfindahl " +
        "Σq²/T² in a single integer division, two combinable aggregates, " +
        "no join"),
    Q("q433_discount_response", discountResponse, Some(discountResponseSql),
      "per-brand OLS slope of quantity on discount basis points — exact " +
        "micro-units, sign-split integer quotient, one grouped pass over " +
        "the broadcast-part join"),
    Q("q434_returns_ztest", returnsZtest, Some(returnsZtestSql),
      "two-proportion z of each order priority's return rate vs the " +
        "pooled rest — exact counts, identical parenthesized IEEE " +
        "chain, leading DOUBLE cast per the decimal-literal rule"),
    Q("q435_seasonal_index", seasonalIndex, Some(seasonalIndexSql),
      "classical ratio-to-centered-MA monthly seasonal indices in pure " +
        "integers — 12-month half-weighted CMA over the ~80-row monthly " +
        "aggregate, per-month integer mean"),
    Q("q436_first_value_repeat", firstValueRepeat, Some(firstValueRepeatSql),
      "first-order-value deciles vs repeat rate: deterministic " +
        "first-order selection, customer-dimension ntile, exact " +
        "micro-unit rates"),
    Q("q437_kruskal_wallis", kruskalWallis, Some(kruskalWallisSql),
      "Kruskal-Wallis H across all five priorities: doubled-integer tie " +
        "ranks, BIGINT rank sums, micro-unit H + tie-corrected H via " +
        "decimal(38)/HUGEINT — the k-group Mann-Whitney"),
    Q("q438_price_dispersion", priceDispersion, Some(priceDispersionSql),
      "top-20 parts by unit-price spread: exact micro-cent unit prices " +
        "(floored division, mirrored), max/min ratio per part, one scan " +
        "+ one combinable aggregate"),
    Q("q439_outlier_census", outlierCensus, Some(outlierCensusSql),
      "3-sigma order-value outlier counts per priority without a float " +
        "mean/stddev: (n·x−S)² > 9(n·Sxx−S²) cross-multiplied exact, " +
        "5-row moments broadcast over the scan"),
    Q("q440_acceleration_share", accelerationShare, Some(accelerationShareSql),
      "share of customers per segment whose inter-order gaps are " +
        "shrinking — integer OLS slope SIGN (no division), one " +
        "per-customer window + broadcast segment join"),
    Q("q442_pettitt_changepoint", pettittChangepoint, Some(pettittChangepointSql),
      "Pettitt rank changepoint of daily order volume: exact BIGINT U_t " +
        "from doubled tie ranks + cumulative sums over the daily " +
        "aggregate — no pair join"),
    Q("q443_growth_streaks", growthStreaks, Some(growthStreaksSql),
      "five longest week-over-week revenue growth runs — " +
        "gaps-and-islands on the weekly cents aggregate, exact BIGINT " +
        "comparisons"),
    Q("q444_priority_mix_drift", priorityMixDrift, Some(priorityMixDriftSql),
      "yearly total-variation distance of the priority mix vs all-time " +
        "— pure-integer cross-multiplication until one micro-unit " +
        "division, marginals from windows over the 35-row aggregate"),
    Q("q445_peak_concurrency", peakConcurrency, Some(peakConcurrencySql),
      "peak simultaneously-open orders per year + earliest peak day — " +
        "sweep line over daily +1/−1 boundary deltas, no interval " +
        "self-join, exact integers"))
}
