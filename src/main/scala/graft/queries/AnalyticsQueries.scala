package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.Det._
import graft.ops.{StatsOps, TextOps}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Round-2 analytics surface: deterministic second-moment statistics,
  * exact rank-based percentiles, array scalar pack, unpivot/melt, regex
  * scalar pack. All oracle-checked (SURVEY §2.7 extensions).
  */
object AnalyticsQueries {

  // ---- moment statistics (var/stddev/covar/corr) -----------------------

  /** Grouped variance/stddev/covariance/correlation of (quantity, price)
    * from exact decimal moment sums — see StatsOps for why the builtins
    * (Welford, merge-order-dependent) can't be hash-compared. */
  def statsPack(spark: SparkSession, dir: String): DataFrame =
    StatsOps.momentStats(
        Catalog.load(spark, dir, "lineitem"),
        col("l_returnflag"), col("l_quantity"), col("l_extendedprice"))
      .orderBy(col("l_returnflag"))

  private val statsPackSql =
    s"""WITH m AS (
       |  SELECT l_returnflag, COUNT(*) AS n,
       |    ${sqlSum("l_quantity")} AS sx,
       |    ${sqlSum("l_extendedprice")} AS sy,
       |    ${sqlSum("l_quantity * l_quantity")} AS sxx,
       |    ${sqlSum("l_extendedprice * l_extendedprice")} AS syy,
       |    ${sqlSum("l_quantity * l_extendedprice")} AS sxy
       |  FROM lineitem GROUP BY 1
       |)
       |, v AS (
       |  SELECT l_returnflag, n,
       |    sx / n AS mean_x,
       |    (sxx - sx*sx/n) / (n - 1) AS var_x,
       |    (syy - sy*sy/n) / (n - 1) AS var_y,
       |    (sxy - sx*sy/n) / (n - 1) AS covar_xy
       |  FROM m
       |)
       |SELECT l_returnflag, n, mean_x, var_x,
       |  sqrt(var_x) AS stddev_x,
       |  covar_xy,
       |  covar_xy / (sqrt(var_x) * sqrt(var_y)) AS corr_xy
       |FROM v
       |ORDER BY l_returnflag""".stripMargin

  // ---- exact percentiles by rank selection -----------------------------

  /** Median + p90 of order totals per priority via explicit rank picks
    * (window rank + one aggregate — engine quantile builtins interpolate
    * in engine-specific op order and can't be hash-compared). */
  def percentilePack(spark: SparkSession, dir: String): DataFrame =
    StatsOps.rankPercentiles(
        Catalog.load(spark, dir, "orders"),
        col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .withColumnRenamed("k", "o_orderpriority")
      .orderBy(col("o_orderpriority"))

  private val percentilePackSql =
    """WITH r AS (
      |  SELECT o_orderpriority, o_totalprice,
      |    ROW_NUMBER() OVER (PARTITION BY o_orderpriority
      |                       ORDER BY o_totalprice, o_orderkey) AS rn,
      |    COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      |  FROM orders
      |)
      |SELECT o_orderpriority, MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN o_totalprice END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN o_totalprice END)) / 2 AS median,
      |  MAX(CASE WHEN rn = CAST(ceil(n * 0.9) AS BIGINT) THEN o_totalprice END) AS p90
      |FROM r
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  // ---- array scalar pack ------------------------------------------------

  /** Array functions over tokenized documents: slice/join/contains/
    * distinct/sort/element_at — the ArrayType scalar surface. */
  def arrayPack(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "documents")
    val toks = split(col("text"), " ")
    d.select(
        col("doc_id"),
        array_join(slice(toks, 1, 3), "_").as("first3"),
        array_contains(toks, "the").as("has_the"),
        size(array_distinct(toks)).cast("long").as("n_distinct"),
        array_join(slice(sort_array(array_distinct(toks)), 1, 5), "_").as("low5_sorted"),
        element_at(toks, -1).as("last_tok"))
      .orderBy(col("doc_id"))
  }

  private val arrayPackSql =
    """SELECT doc_id,
      |  array_to_string(string_split(text, ' ')[1:3], '_') AS first3,
      |  list_contains(string_split(text, ' '), 'the') AS has_the,
      |  CAST(len(list_distinct(string_split(text, ' '))) AS BIGINT) AS n_distinct,
      |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:5], '_') AS low5_sorted,
      |  string_split(text, ' ')[-1] AS last_tok
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- unpivot / melt ---------------------------------------------------

  /** Wide per-flag aggregates melted to (flag, metric, value) rows via the
    * Dataset unpivot API (the inverse of q48's pivot). */
  def unpivotMetrics(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val wide = li.groupBy(col("l_returnflag")).agg(
      dsum(col("l_quantity")).as("sum_qty"),
      dsum(col("l_extendedprice")).as("sum_price"),
      count(lit(1)).cast("double").as("n_rows"))
    wide.unpivot(
        Array(col("l_returnflag")),
        Array(col("sum_qty"), col("sum_price"), col("n_rows")),
        "metric", "value")
      .orderBy(col("l_returnflag"), col("metric"))
  }

  private val unpivotMetricsSql =
    s"""WITH w AS (
       |  SELECT l_returnflag,
       |    ${sqlSum("l_quantity")} AS sum_qty,
       |    ${sqlSum("l_extendedprice")} AS sum_price,
       |    CAST(COUNT(*) AS DOUBLE) AS n_rows
       |  FROM lineitem GROUP BY 1
       |)
       |SELECT l_returnflag, metric, value FROM (
       |  SELECT l_returnflag, 'sum_qty' AS metric, sum_qty AS value FROM w
       |  UNION ALL SELECT l_returnflag, 'sum_price', sum_price FROM w
       |  UNION ALL SELECT l_returnflag, 'n_rows', n_rows FROM w
       |)
       |ORDER BY l_returnflag, metric""".stripMargin

  // ---- deterministic sampling -------------------------------------------

  /** Systematic 10% sample by key residue, then aggregate — the
    * reproducible sampling surface. `sample()` / TABLESAMPLE is
    * partition-layout-dependent and can't be cross-checked; keyed residue
    * sampling is stable under any layout (at scale you'd residue a
    * uniform key hash — same plan, engine-specific hash, so the
    * cross-engine-checkable form uses the key itself). */
  def systematicSample(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    o.filter(col("o_orderkey") % 10 === 3)
      .groupBy(col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("volume"))
      .orderBy(col("o_orderstatus"))
  }

  private val systematicSampleSql =
    s"""SELECT o_orderstatus, COUNT(*) AS n, ${sqlSum("o_totalprice")} AS volume
       |FROM orders
       |WHERE o_orderkey % 10 = 3
       |GROUP BY o_orderstatus
       |ORDER BY o_orderstatus""".stripMargin

  // ---- RANGE window frame -------------------------------------------------

  /** Value-range window frame (vs q37-39's ROWS frames): per user, the
    * count and exact sum of their events in the trailing 10 event-time
    * minutes. Peers with equal ts fall in the same frame on both engines
    * (RANGE semantics); the sum is decimal-accumulated so the frame's
    * combine order can't flap the hash. */
  def rangeFrame(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val e = Catalog.load(spark, dir, "events")
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("ts_us"), col("value"))
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-600000000L, 0L)
    e.select(col("event_id"), col("user_id"), col("ts_us"),
        count(lit(1)).over(w).as("n_10m"),
        sum(col("value").cast(graft.ops.Det.Dec)).over(w).cast("double").as("sum_10m"))
      .orderBy(col("event_id"))
  }

  private val rangeFrameSql =
    """SELECT event_id, user_id, epoch_ns(ts) // 1000 AS ts_us,
      |  COUNT(*) OVER w AS n_10m,
      |  CAST(CAST(SUM(CAST(value AS DECIMAL(38,6))) OVER w AS VARCHAR) AS DOUBLE) AS sum_10m
      |FROM events
      |WINDOW w AS (PARTITION BY user_id ORDER BY epoch_ns(ts) // 1000
      |             RANGE BETWEEN 600000000 PRECEDING AND CURRENT ROW)
      |ORDER BY event_id""".stripMargin

  // ---- regex scalar pack --------------------------------------------------

  /** regexp extract / extract_all / replace / match over documents.
    * Patterns kept in the Java∩RE2 common subset (character classes,
    * quantifiers) so both engines' regex libraries agree. */
  def regexPack(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "documents")
    d.select(
        col("doc_id"),
        coalesce(nullif(regexp_extract(col("text"), "[0-9]+", 0), lit(""))
          .cast("long"), lit(-1L)).as("first_num"),
        size(expr("regexp_extract_all(text, '[0-9]+', 0)")).cast("long").as("n_nums"),
        length(regexp_replace(col("text"), "[a-z]+", "w")).cast("long").as("len_wmask"),
        col("text").rlike("data").as("mentions_data"))
      .orderBy(col("doc_id"))
  }

  private val regexPackSql =
    """SELECT doc_id,
      |  COALESCE(CAST(nullif(regexp_extract(text, '[0-9]+'), '') AS BIGINT), -1) AS first_num,
      |  CAST(len(regexp_extract_all(text, '[0-9]+')) AS BIGINT) AS n_nums,
      |  CAST(length(regexp_replace(text, '[a-z]+', 'w', 'g')) AS BIGINT) AS len_wmask,
      |  regexp_matches(text, 'data') AS mentions_data
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  // ---- skew-salted join ---------------------------------------------------

  /** Salted join surfaced as a query: lineitem (probe, potentially hot
    * suppkeys) joins supplier through SkewOps.saltedJoin (deterministic
    * salt, build side replicated ×8), then aggregates. The oracle is the
    * PLAIN join — salting must be invisible in the result. */
  def saltedJoinAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val s = Catalog.load(spark, dir, "supplier")
      .select(col("s_suppkey").as("l_suppkey"), col("s_name"))
    graft.ops.SkewOps.saltedJoin(li, s, "l_suppkey", 8,
        saltFrom = Seq("l_orderkey", "l_linenumber"))
      .groupBy(col("s_name"))
      .agg(count(lit(1)).as("n_lines"), dsum(col("l_quantity")).as("sum_qty"))
      .orderBy(col("s_name"))
  }

  private val saltedJoinAggSql =
    s"""SELECT s_name, COUNT(*) AS n_lines, ${sqlSum("l_quantity")} AS sum_qty
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_name
       |ORDER BY s_name""".stripMargin

  // ---- Scala UDF surface --------------------------------------------------

  /** The `udf()` tier, pinned by an oracle: a closure UDF is opaque to
    * Catalyst (no pushdown through it, no codegen — PLANS shows the
    * BatchEvalUDF break), so the engine reserves it for logic that
    * genuinely can't be a Column expression; this query exists to pin
    * the surface's semantics against the equivalent SQL. */
  def udfScalar(spark: SparkSession, dir: String): DataFrame = {
    val band = udf((b: Double) =>
      if (b < 0) "neg" else if (b < 5000) "low" else "high")
    val balK = udf((b: Double) => math.floor(math.abs(b) / 1000).toLong)
    val c = Catalog.load(spark, dir, "customer")
    c.select(col("c_custkey"),
        band(col("c_acctbal")).as("bal_band"),
        balK(col("c_acctbal")).as("bal_k"))
      .orderBy(col("c_custkey"))
  }

  private val udfScalarSql =
    """SELECT c_custkey,
      |  CASE WHEN c_acctbal < 0 THEN 'neg'
      |       WHEN c_acctbal < 5000 THEN 'low'
      |       ELSE 'high' END AS bal_band,
      |  CAST(floor(abs(c_acctbal) / 1000) AS BIGINT) AS bal_k
      |FROM customer
      |ORDER BY c_custkey""".stripMargin

  // ---- GROUP BY ALL (verbatim SQL) -----------------------------------

  /** GROUP BY ALL through the SQL entry point — the statement runs
    * verbatim on both engines (like q31/q32): every non-aggregate select
    * item becomes a grouping key. */
  def groupByAll(spark: SparkSession, dir: String): DataFrame = {
    Catalog.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(groupByAllSql)
  }

  private val groupByAllSql =
    """SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n,
      |  CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS STRING) AS DOUBLE) AS volume
      |FROM orders
      |GROUP BY ALL
      |ORDER BY o_orderstatus, o_orderpriority""".stripMargin

  // ---- try_* error-safe scalars ----------------------------------------

  /** ANSI-safe scalar surface: under Spark 4's default ANSI mode,
    * division by zero and bad casts THROW; `try_divide`/`try_cast` return
    * NULL instead — the semantics the oracle side expresses with
    * nullif/TRY_CAST. Pins the engine's error-safe forms cross-engine. */
  def tryPack(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        expr("try_divide(l_extendedprice, l_linenumber - 1)").as("per_prev_line"),
        // decimal stays in-plan; the OUTPUT is double (decimal output
        // columns sort as strings on one side of the compare harness)
        expr("cast(try_cast(concat('', l_quantity) AS decimal(4,1)) as double)")
          .as("qty_d"),
        expr("try_add(l_orderkey, 1)").as("next_key"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val tryPackSql =
    """SELECT l_orderkey, l_linenumber,
      |  l_extendedprice / nullif(l_linenumber - 1, 0) AS per_prev_line,
      |  CAST(TRY_CAST(CAST(l_quantity AS VARCHAR) AS DECIMAL(4,1)) AS DOUBLE) AS qty_d,
      |  l_orderkey + 1 AS next_key
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  // ---- histogram / bucketing ---------------------------------------------

  /** Fixed-width histogram via width_bucket — the OLAP binning primitive
    * (identical bucket arithmetic on both engines; under/overflow rows
    * land in buckets 0 and n+1). */
  def histogram(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    o.groupBy(width_bucket(col("o_totalprice"), lit(0.0), lit(600000.0), lit(12))
        .as("bucket"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("volume"))
      .orderBy(col("bucket"))
  }

  // DuckDB has no width_bucket; the oracle spells out the same bucket
  // arithmetic (Spark computes width = (hi-lo)/n then floor((x-lo)/width)+1,
  // clamping underflow to 0 and overflow to n+1)
  private val histogramSql =
    s"""SELECT CASE WHEN o_totalprice < 0.0 THEN 0
       |            WHEN o_totalprice >= 600000.0 THEN 13
       |            ELSE CAST(floor((o_totalprice - 0.0) / (600000.0 / 12)) AS BIGINT) + 1
       |       END AS bucket,
       |  COUNT(*) AS n, ${sqlSum("o_totalprice")} AS volume
       |FROM orders
       |GROUP BY 1
       |ORDER BY bucket""".stripMargin

  // ---- calendar spine (gap filling) ----------------------------------------

  /** Calendar-spine join: a generated month spine left-joins monthly
    * order volumes so empty months surface as zero rows — the gap-filling
    * pattern every reporting pipeline needs (a plain GROUP BY silently
    * drops months with no data). sequence()+explode is the generator
    * surface; the spine is tiny and broadcasts. */
  def dateSpine(spark: SparkSession, dir: String): DataFrame = {
    val spine = spark.range(1)
      .select(explode(expr(
        "sequence(to_timestamp('1995-01-01'), to_timestamp('2001-08-01'), interval 1 month)"))
        .as("month_start"))
      .select(year(col("month_start")).cast("long").as("yr"),
        month(col("month_start")).cast("long").as("mo"))
    val o = Catalog.load(spark, dir, "orders")
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("volume"))
    spine.join(o, Seq("yr", "mo"), "left_outer")
      .select(col("yr"), col("mo"),
        coalesce(col("n_orders"), lit(0L)).as("n_orders"),
        coalesce(col("volume"), lit(0.0)).as("volume"))
      .orderBy(col("yr"), col("mo"))
  }

  private val dateSpineSql =
    s"""WITH spine AS (
       |  SELECT CAST(year(m) AS BIGINT) AS yr, CAST(month(m) AS BIGINT) AS mo
       |  FROM generate_series(TIMESTAMP '1995-01-01', TIMESTAMP '2001-08-01',
       |                       INTERVAL 1 MONTH) AS t(m)
       |), agg AS (
       |  SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       |         CAST(month(o_orderdate) AS BIGINT) AS mo,
       |    COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS volume
       |  FROM orders GROUP BY 1, 2
       |)
       |SELECT s.yr, s.mo,
       |  COALESCE(a.n_orders, 0) AS n_orders,
       |  COALESCE(a.volume, 0.0) AS volume
       |FROM spine s LEFT JOIN agg a ON s.yr = a.yr AND s.mo = a.mo
       |ORDER BY s.yr, s.mo""".stripMargin

  /** Approximate percentile sketch (GK summaries) — the quantile member
    * of the sketch family next to HLL (q06). Engine-specific merge, so
    * rows-only for the driver; PropertySpec bounds it against the exact
    * rank percentiles. */
  def approxQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(expr("approx_percentile(o_totalprice, array(0.5, 0.9), 10000)")
        .as("apx"))
      .select(col("o_orderpriority"),
        element_at(col("apx"), 1).as("p50_apx"),
        element_at(col("apx"), 2).as("p90_apx"))
      .orderBy(col("o_orderpriority"))
  }

  // ---- fuzzy entity matching (blocked edit distance) -----------------------

  /** Fuzzy entity resolution: a synthetically-corrupted name column (6th
    * character dropped) is matched back to the clean table — equi-join on
    * a blocking key derived from each side's own string, then exact
    * levenshtein verification. The all-pairs comparison never happens;
    * candidates come only from block collisions, which is the shape
    * entity dedup runs at corpus scale. */
  def fuzzyMatch(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer").select(col("c_custkey"), col("c_name"))
    val dirty = c.select(col("c_custkey").as("dirty_key"),
      expr("concat(substr(c_name, 1, 5), substr(c_name, 7))").as("dname"))
    val cand = dirty
      .withColumn("blk", expr("substr(dname, 9, 10)"))
      .join(c.withColumn("blk", expr("substr(c_name, 10, 10)")), "blk")
      .filter(expr("levenshtein(dname, c_name) <= 1"))
    cand.select(col("dirty_key"), col("c_custkey").as("matched_key"),
        expr("cast(levenshtein(dname, c_name) as bigint)").as("dist"))
      .orderBy(col("dirty_key"), col("matched_key"))
  }

  private val fuzzyMatchSql =
    """WITH dirty AS (
      |  SELECT c_custkey AS dirty_key,
      |    substr(c_name, 1, 5) || substr(c_name, 7) AS dname
      |  FROM customer
      |)
      |SELECT d.dirty_key, c.c_custkey AS matched_key,
      |  CAST(levenshtein(d.dname, c.c_name) AS BIGINT) AS dist
      |FROM dirty d
      |JOIN customer c ON substr(d.dname, 9, 10) = substr(c.c_name, 10, 10)
      |WHERE levenshtein(d.dname, c.c_name) <= 1
      |ORDER BY dirty_key, matched_key""".stripMargin

  /** Entity resolution with the native [[graft.functions.JaroWinkler]]
    * scorer: names are dirtied by an adjacent-digit TRANSPOSITION (the
    * classic data-entry error Levenshtein counts as distance 2 and q94's
    * edit-distance matcher is blind to at threshold 1), blocked on the
    * stable name tail, and every blocked pair is scored by the compiled
    * jaro_winkler kernel fused into the join stage. Sketch-free exact
    * scoring inside each block — the block key is what keeps the pair
    * count linear at scale (q163's prefix filter is the set-similarity
    * analog). Scores are deterministic doubles from one kernel (no SQL
    * oracle — engines disagree on JW's boost-threshold variant; the
    * canonical test vectors + 100% self-recall are spec-pinned). */
  def jwEr(spark: SparkSession, dir: String): DataFrame = {
    import graft.functions.JaroWinkler.jaroWinkler
    val c = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_name"))
    val dirty = c.select(col("c_custkey").as("dirty_key"),
      expr("concat(substr(c_name, 1, 11), substr(c_name, 13, 1), " +
        "substr(c_name, 12, 1), substr(c_name, 14))").as("dname"))
    dirty.withColumn("blk", expr("substr(dname, 15, 4)"))
      .join(c.withColumn("blk", expr("substr(c_name, 15, 4)")), "blk")
      .withColumn("jw", jaroWinkler(col("dname"), col("c_name")))
      .filter(col("jw") >= 0.95)
      .select(col("dirty_key"), col("c_custkey").as("matched_key"), col("jw"))
      .orderBy(col("dirty_key"), col("matched_key"))
  }

  /** q170's oracle: DuckDB ships `jaro_winkler_similarity`, and on this
    * ASCII name data its doubles bit-match the native kernel (verified
    * pairwise over every blocked pair at sf0.01 — both engines compute
    * the same (m/|a|+m/|b|+(m-t)/m)/3 + prefix-boost double expression),
    * so the score column hash-compares exactly rather than spec-only. */
  private val jwErSql =
    """WITH c AS (SELECT c_custkey, c_name FROM customer),
      |dirty AS (
      |  SELECT c_custkey AS dirty_key,
      |    concat(substr(c_name, 1, 11), substr(c_name, 13, 1),
      |           substr(c_name, 12, 1), substr(c_name, 14)) AS dname
      |  FROM c)
      |SELECT dirty_key, c.c_custkey AS matched_key,
      |  jaro_winkler_similarity(dname, c_name) AS jw
      |FROM dirty JOIN c ON substr(dname, 15, 4) = substr(c_name, 15, 4)
      |WHERE jaro_winkler_similarity(dname, c_name) >= 0.95
      |ORDER BY dirty_key, matched_key""".stripMargin

  // ---- recursive CTE (verbatim SQL) ---------------------------------------

  /** WITH RECURSIVE through the SQL entry point (Spark 4 gained recursive
    * CTEs): the recursion generates a 1..12 month spine that left-joins
    * per-calendar-month order counts — recursion-as-generator plus the
    * gap-fill join, one statement, VERBATIM on both engines. */
  def recursiveCte(spark: SparkSession, dir: String): DataFrame = {
    Catalog.load(spark, dir, "orders").createOrReplaceTempView("orders")
    spark.sql(recursiveCteSql)
  }

  private val recursiveCteSql =
    """WITH RECURSIVE seq(n) AS (
      |  SELECT 1 UNION ALL SELECT n + 1 FROM seq WHERE n < 12
      |)
      |SELECT s.n AS mo, COUNT(o_orderkey) AS n_orders
      |FROM seq s LEFT JOIN orders ON month(o_orderdate) = s.n
      |GROUP BY s.n
      |ORDER BY mo""".stripMargin

  // ---- iterative graph analytics: PageRank ----------------------------

  /** PageRank over the (symmetrized) customer–supplier trade graph:
    * edge cᵢ ↔ sⱼ for every order line customer i bought from supplier j.
    * Five power-iteration rounds in fixed-point micro-rank integers (see
    * GraphOps.pageRank), so the final doubles hash-match DuckDB's
    * unrolled-CTE evaluation of the identical recurrence bit-for-bit. */
  def pagerank(spark: SparkSession, dir: String): DataFrame = {
    // numeric node ids (customer → 2k, supplier → 2k+1) keep every
    // iteration shuffle on 8-byte keys; the rank values are identical to
    // a labeled-graph run (same groups, order-independent decimal sums),
    // so labels are formatted only on the final 1-row-per-node output.
    // The loop-invariant edge/degree/node frames come from the shared
    // memoized TradeGraph build (one orders⋈lineitem projection per
    // session+dataset, reused by the whole q105/q172/q290/q311/q321/q402
    // family instead of six independent rebuilds).
    graft.ops.GraphOps.pageRankOn(TradeGraph.symDeg(spark, dir),
        TradeGraph.nodes(spark, dir), iters = 5)
      .select(
        when(col("n") % 2 === 0, concat(lit("c"), (col("n") / 2).cast("long")))
          .otherwise(concat(lit("s"), (col("n") / 2).cast("long"))).as("node"),
        col("r").as("rank"))
      .orderBy(col("node"))
  }

  private val pagerankSql = {
    // fixed-point micro-rank recurrence, mirrored exactly: BIGINT floor
    // division and integer sums have one answer on every engine
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
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS u,
       |    's' || CAST(l_suppkey AS VARCHAR) AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), edges AS (
       |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
       |), nodes AS (
       |  SELECT DISTINCT u AS n FROM edges
       |), deg AS (
       |  SELECT u, COUNT(*) AS d FROM edges GROUP BY 1
       |), pr0 AS (
       |  SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), ${(1 to 5).map(round).mkString(", ")}
       |SELECT n AS node, CAST(r AS DOUBLE) / CAST(1000000 AS DOUBLE) AS rank
       |FROM pr5
       |ORDER BY node""".stripMargin
  }

  /** Personalized PageRank from customers c1-c3 over the same trade
    * graph as q105 — rank = proximity to those seed customers (the
    * "similar suppliers / co-shoppers" recommendation primitive).
    * Identical fixed-point micro-unit machinery; the restart mass
    * returns only to the seeds, initialized at the restart vector.
    * Seeds missing from a small graph simply contribute nothing (CASE
    * mirrors the Spark-side isin flag). */
  def ppr(spark: SparkSession, dir: String): DataFrame = {
    // custkeys 1..3 under the numeric (customer → 2k) node scheme;
    // loop-invariant frames shared via the memoized TradeGraph build
    graft.ops.GraphOps.personalizedPageRankOn(TradeGraph.symDeg(spark, dir),
      TradeGraph.nodes(spark, dir), Seq(2L, 4L, 6L), iters = 5)
      .select(
        when(col("n") % 2 === 0, concat(lit("c"), (col("n") / 2).cast("long")))
          .otherwise(concat(lit("s"), (col("n") / 2).cast("long"))).as("node"),
        col("r").as("rank"))
      .filter(col("rank") > 0.0) // untouched nodes carry no information
      .orderBy(col("node"))
  }

  private val pprSql = {
    def round(k: Int) =
      s"""pr$k AS (
         |  SELECT n.n,
         |    CASE WHEN n.n IN ('c1', 'c2', 'c3')
         |      THEN CAST(150000 AS BIGINT) ELSE CAST(0 AS BIGINT) END
         |      + CAST(85 * COALESCE(c.s, 0) AS BIGINT) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.v, SUM(p.r // d.d) AS s
         |    FROM edges e JOIN pr${k - 1} p ON e.u = p.n JOIN deg d ON e.u = d.u
         |    GROUP BY e.v) c ON c.v = n.n
         |)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS u,
       |    's' || CAST(l_suppkey AS VARCHAR) AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), edges AS (
       |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
       |), nodes AS (
       |  SELECT DISTINCT u AS n FROM edges
       |), deg AS (
       |  SELECT u, COUNT(*) AS d FROM edges GROUP BY 1
       |), pr0 AS (
       |  SELECT n, CASE WHEN n IN ('c1', 'c2', 'c3')
       |    THEN CAST(150000 AS BIGINT) ELSE CAST(0 AS BIGINT) END AS r
       |  FROM nodes
       |), ${(1 to 5).map(round).mkString(", ")}
       |SELECT n AS node, CAST(r AS DOUBLE) / CAST(1000000 AS DOUBLE) AS rank
       |FROM pr5
       |WHERE r > 0
       |ORDER BY node""".stripMargin
  }

  // ---- mergeable distinct-count sketches ------------------------------

  /** Mergeable HLL sketches (DataSketches surface): per-day user
    * sketches unioned into a per-event-type distinct estimate — the
    * pre-aggregation pattern that makes distinct counting cheap at
    * 100 TB: each day/partition keeps a kilobyte sketch, and any rollup
    * (week, month, all-time) is a sketch union instead of a re-scan.
    * Engine-specific binary → rows-only driver check; AnalyticsSpec
    * bounds the estimate against exact and asserts union-of-parts ==
    * whole-stream sketch. */
  def hllRollup(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("event_type"), to_date(col("ts")).as("day"), col("user_id"))
    e.groupBy(col("event_type"), col("day"))
      .agg(hll_sketch_agg(col("user_id")).as("sk"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_days"),
        hll_sketch_estimate(hll_union_agg(col("sk"))).as("approx_users"))
      .orderBy(col("event_type"))
  }

  /** KMV distinct users per event type ([[graft.ops.StatsOps.KmvAgg]])
    * — the sketch-family member whose state is relationally auditable:
    * unlike HLL's opaque registers, the k-min hash set is provably
    * `slice(sort_array(collect_set(hash)), 1, k)` under any partitioning
    * (SketchSpec asserts bit-equality and bounds the estimate against
    * exact). Bounded 2 KiB state per group vs collect_set's
    * cardinality-proportional growth. Engine-specific hash → rows-only
    * driver check. */
  def kmvDistinct(spark: SparkSession, dir: String): DataFrame =
    graft.ops.StatsOps.kmvDistinct(
        Catalog.load(spark, dir, "events"), col("event_type"),
        col("user_id"), k = 256)
      .withColumnRenamed("grp", "event_type")
      .orderBy(col("event_type"))

  /** Spatial radius self-join on the grid ([[graft.ops.GeoOps]]):
    * customers get deterministic planar positions (multiplicative-hash
    * coordinates — the fixtures ship no geo columns), and the engine
    * finds all pairs within 500 units by bucketing into 500-sized cells
    * and equi-joining the 3×3 neighborhood — candidates are
    * density-bounded per cell, never the O(n²) cross product the naive
    * oracle form spells out. Integer cells and squared distances end to
    * end: no trig, no floats, bit-equal on any engine. */
  def gridJoin(spark: SparkSession, dir: String): DataFrame = {
    val pts = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey").as("id"),
        graft.ops.GeoOps.hashCoord(col("c_custkey"), 2654435761L, 100000L)
          .as("x"),
        graft.ops.GeoOps.hashCoordSq(col("c_custkey"), 1099087573L, 100000L)
          .as("y"))
    graft.ops.GeoOps.gridRadiusJoin(pts, 500L)
      .orderBy(col("a"), col("b"))
  }

  private val gridJoinSql =
    """WITH p AS (
      |  SELECT c_custkey AS id,
      |    ((((c_custkey % 1000000007) + 1000000007) % 1000000007)
      |      * 2654435761) % 1000000007 % 100000 AS x,
      |    ((((c_custkey % 1000000007) * (c_custkey % 1000000007))
      |      % 1000000007) * 1099087573) % 1000000007 % 100000 AS y
      |  FROM customer
      |)
      |SELECT a.id AS a, b.id AS b,
      |  CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |    AS BIGINT) AS dist2
      |FROM p a JOIN p b ON a.id < b.id
      |WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y)
      |  <= 250000
      |ORDER BY a, b""".stripMargin

  /** CDC apply ([[graft.pipelines.Incremental.applyCdc]]) driven by a
    * deterministic synthetic change log over `orders`: deletes
    * (key%7=0), updates (key%7=1, price×2), update-then-delete chains
    * (key%14=2: U at seq 1, D at seq 2 — exercises per-key sequence
    * collapse), and fresh inserts (key%7=3 shifted into new key space).
    * The oracle replays the identical log in SQL, so the merged table
    * hash-matches row for row. */
  def cdcApply(spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
        col("o_totalprice"),
        expr("unix_micros(o_orderdate) div 86400000000").as("order_d"))
    def entry(f: Column, price: Column, key: Column, op: String,
        seq: Int): DataFrame =
      base.filter(f).select(key.as("o_orderkey"), col("o_custkey"),
        col("o_orderstatus"), price.as("o_totalprice"), col("order_d"),
        lit(op).as("op"), lit(seq).as("seq"))
    val k = col("o_orderkey")
    val p = col("o_totalprice")
    val log = entry(k % 7 === 1, p * 2, k, "U", 1)
      .unionByName(entry(k % 7 === 0, p, k, "D", 1))
      .unionByName(entry(k % 14 === 2, p * 3, k, "U", 1))
      .unionByName(entry(k % 14 === 2, p, k, "D", 2))
      .unionByName(entry(k % 7 === 3, p, k + 100000000L, "I", 1))
    graft.pipelines.Incremental.applyCdc(base, log, Seq("o_orderkey"))
      .orderBy(col("o_orderkey"))
  }

  private val cdcApplySql =
    """WITH base AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    epoch_ns(o_orderdate) // 1000 // 86400000000 AS order_d
      |  FROM orders
      |), log AS (
      |  SELECT o_orderkey, o_custkey, o_orderstatus,
      |    o_totalprice * 2 AS o_totalprice, order_d, 'U' AS op, 1 AS seq
      |  FROM base WHERE o_orderkey % 7 = 1
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    order_d, 'D', 1 FROM base WHERE o_orderkey % 7 = 0
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice * 3,
      |    order_d, 'U', 1 FROM base WHERE o_orderkey % 14 = 2
      |  UNION ALL
      |  SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice,
      |    order_d, 'D', 2 FROM base WHERE o_orderkey % 14 = 2
      |  UNION ALL
      |  SELECT o_orderkey + 100000000, o_custkey, o_orderstatus,
      |    o_totalprice, order_d, 'I', 1 FROM base WHERE o_orderkey % 7 = 3
      |), latest AS (
      |  SELECT *, row_number() OVER (PARTITION BY o_orderkey
      |    ORDER BY seq DESC, op DESC) AS rn
      |  FROM log
      |)
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, order_d
      |FROM base WHERE o_orderkey NOT IN (SELECT o_orderkey FROM log)
      |UNION ALL
      |SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, order_d
      |FROM latest WHERE rn = 1 AND op <> 'D'
      |ORDER BY o_orderkey""".stripMargin

  /** Bottom-k-by-hash sample quantiles next to exact
    * ([[graft.ops.StatsOps.BottomKAgg]]) — the distribution member of
    * the sketch family: a deterministic uniform row sample whose
    * membership is a pure function of the data, so unlike
    * TABLESAMPLE/rand() the same sample materializes on any engine and
    * any partitioning. Engine-specific hash → rows-only; SketchSpec
    * pins layout independence, the relational-twin bit-equality, and
    * the rank-error bound vs exact. */
  def sampleQuantiles(spark: SparkSession, dir: String): DataFrame =
    graft.ops.StatsOps.bottomKQuantiles(
        Catalog.load(spark, dir, "events"), col("event_type"),
        col("event_id"), col("value"), k = 256)
      .withColumnRenamed("grp", "event_type")
      .orderBy(col("event_type"))

  // ---- multi-dimensional clustering key -------------------------------

  /** Z-order keys for (l_partkey, l_suppkey): the write-side clustering
    * trick — sort files by this key and parquet min/max stats can skip
    * on EITHER column. The codegen expression interleaves bits with
    * shift-mask dilation; the oracle spells the same interleave out as
    * 64 SQL bit terms, so the keys hash-match bit-for-bit. */
  def zorderKeys(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"),
        graft.functions.ZOrderKey.zorderKey(
          col("l_partkey"), col("l_suppkey")).as("zkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  private val zorderSql = {
    val terms = (0 until 32).flatMap(i => Seq(
      s"(((l_partkey >> $i) & 1) << ${2 * i})",
      s"(((l_suppkey >> $i) & 1) << ${2 * i + 1})"))
    s"""SELECT l_orderkey, l_linenumber,
       |  CAST(${terms.mkString(" | ")} AS BIGINT) AS zkey
       |FROM lineitem
       |ORDER BY l_orderkey, l_linenumber""".stripMargin
  }

  /** ANALYZE-style numeric profile of lineitem (one aggregate pass). */
  def profile(spark: SparkSession, dir: String): DataFrame =
    graft.pipelines.Guard.profile(
        Catalog.load(spark, dir, "lineitem"),
        Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
          "l_quantity", "l_extendedprice", "l_discount", "l_tax"))
      .orderBy(col("col_name"))

  private val profileSql = {
    def one(c: String) =
      s"""SELECT '$c' AS col_name, CAST(MIN($c) AS DOUBLE) AS min_v,
         |  CAST(MAX($c) AS DOUBLE) AS max_v,
         |  COUNT(*) FILTER ($c IS NULL) AS n_nulls,
         |  COUNT(DISTINCT $c) AS ndv
         |FROM lineitem""".stripMargin
    Seq("l_orderkey", "l_partkey", "l_suppkey", "l_linenumber",
      "l_quantity", "l_extendedprice", "l_discount", "l_tax")
      .map(one).mkString("", "\nUNION ALL\n", "\nORDER BY col_name")
  }

  /** dbt-style integrity suite: every check is one aggregate returning a
    * violation count; 0 everywhere = referentially sound star schema. */
  def integrity(spark: SparkSession, dir: String): DataFrame = {
    import graft.pipelines.Guard
    val li = Catalog.load(spark, dir, "lineitem")
    val o = Catalog.load(spark, dir, "orders")
    val c = Catalog.load(spark, dir, "customer")
    val s = Catalog.load(spark, dir, "supplier")
    Seq(
      "orders_pk_unique" -> Guard.uniqueViolations(o, Seq("o_orderkey")),
      "lineitem_fk_orders" ->
        Guard.refIntegrityViolations(li, "l_orderkey", o, "o_orderkey"),
      "orders_fk_customer" ->
        Guard.refIntegrityViolations(o, "o_custkey", c, "c_custkey"),
      "lineitem_fk_supplier" ->
        Guard.refIntegrityViolations(li, "l_suppkey", s, "s_suppkey"),
      "orders_priority_domain" ->
        Guard.acceptedValuesViolations(o, "o_orderpriority",
          Seq("1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW")))
      .map { case (n, df) => df.select(lit(n).as("chk"), col("violations")) }
      .reduce(_.unionByName(_))
      .orderBy(col("chk"))
  }

  private val integritySql =
    """SELECT 'orders_pk_unique' AS chk,
      |  CAST((SELECT COALESCE(SUM(n - 1), 0) FROM (
      |     SELECT COUNT(*) AS n FROM orders GROUP BY o_orderkey
      |     HAVING COUNT(*) > 1)) AS BIGINT) AS violations
      |UNION ALL
      |SELECT 'lineitem_fk_orders',
      |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_orderkey IS NOT NULL
      |   AND l_orderkey NOT IN (SELECT o_orderkey FROM orders)) AS BIGINT)
      |UNION ALL
      |SELECT 'orders_fk_customer',
      |  CAST((SELECT COUNT(*) FROM orders WHERE o_custkey IS NOT NULL
      |   AND o_custkey NOT IN (SELECT c_custkey FROM customer)) AS BIGINT)
      |UNION ALL
      |SELECT 'lineitem_fk_supplier',
      |  CAST((SELECT COUNT(*) FROM lineitem WHERE l_suppkey IS NOT NULL
      |   AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier)) AS BIGINT)
      |UNION ALL
      |SELECT 'orders_priority_domain',
      |  CAST((SELECT COUNT(*) FROM orders WHERE o_orderpriority IS NULL
      |   OR o_orderpriority NOT IN
      |   ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')) AS BIGINT)
      |ORDER BY chk""".stripMargin

  /** Per-supplier triangle counts on the co-supply graph (suppliers
    * sharing an order): degree-oriented wedge enumeration
    * ([[graft.ops.GraphOps.trianglesPerNode]]) vs the oracle's naive
    * a<b<c three-way self-join — same triangles, scale-safe fan-out. */
  def triangles(spark: SparkSession, dir: String): DataFrame = {
    // HIGH-VOLUME co-supply only (quantity ≥ 45, the top ~12% of lines):
    // the unfiltered pair graph saturates C(|suppliers|, 2) once orders
    // outnumber supplier pairs and every triangle algorithm goes dense.
    // Thresholding keeps edge count ∝ orders while pair capacity grows
    // ∝ suppliers², so node degree stays ~constant as sf scales — the
    // graph stays in the regime the operator is built for.
    // pairs per order are bounded by the suppliers-per-order cardinality
    // (≤ order line count), so the self-join fans out O(k²) per order;
    // the frame itself is the shared memoized co-supply build
    val edges = coSupplyEdges(spark, dir)
    graft.ops.GraphOps.trianglesPerNode(edges)
      .select(col("n").as("supp"), col("triangles"))
      .orderBy(col("supp"))
  }

  private val trianglesSql =
    """WITH pe AS (
      |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
      |  WHERE l_quantity >= 45
      |), e AS (
      |  SELECT DISTINCT x.s AS a, y.s AS b
      |  FROM pe x JOIN pe y ON x.o = y.o AND x.s < y.s
      |), t AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.b
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      |)
      |SELECT supp, CAST(COUNT(*) AS BIGINT) AS triangles
      |FROM (SELECT x AS supp FROM t
      |      UNION ALL SELECT y FROM t
      |      UNION ALL SELECT z FROM t)
      |GROUP BY supp
      |ORDER BY supp""".stripMargin

  /** Multi-source BFS hop distance on the symmetrized customer–supplier
    * trade graph (same graph as q105): minimum hops from the seed set
    * {c1, c2, c3} bounded at 3. Frontier-style expansion
    * ([[graft.ops.GraphOps.bfsHops]]) — per-round work ∝ frontier, not
    * visited set — vs the oracle's recursive-CTE enumeration with
    * MIN(dist). Integer hops: nothing to drift cross-engine. */
  def bfsHops(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_suppkey"))
    // numeric ids (customer → 2k, supplier → 2k+1): every round's
    // shuffle stays on 8-byte keys; labels formatted on final output
    val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"),
        (col("l_suppkey") * 2 + 1).as("v"))
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val seeds = edges.filter(col("u").isin(2L, 4L, 6L))
      .select(col("u").as("n"))
    graft.ops.GraphOps.bfsHops(edges, seeds, maxHops = 3)
      .select(
        when(col("n") % 2 === 0, concat(lit("c"), (col("n") / 2).cast("long")))
          .otherwise(concat(lit("s"), (col("n") / 2).cast("long"))).as("node"),
        col("dist"))
      .orderBy(col("node"))
  }

  private val bfsHopsSql =
    """WITH RECURSIVE e0 AS (
      |  SELECT DISTINCT 'c' || CAST(o_custkey AS VARCHAR) AS u,
      |    's' || CAST(l_suppkey AS VARCHAR) AS v
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |), edges AS (
      |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
      |), r(n, d) AS (
      |  SELECT DISTINCT u, 0 FROM edges WHERE u IN ('c1', 'c2', 'c3')
      |  UNION
      |  SELECT e.v, r.d + 1 FROM r JOIN edges e ON e.u = r.n WHERE r.d < 3
      |)
      |SELECT n AS node, CAST(MIN(d) AS BIGINT) AS dist
      |FROM r GROUP BY n
      |ORDER BY node""".stripMargin

  /** Pareto skyline over part (maximize size, minimize retail price):
    * aggregate-then-broadcast ([[StatsOps.skyline2d]]) vs the oracle's
    * O(n²) NOT EXISTS dominance scan. */
  def skyline(spark: SparkSession, dir: String): DataFrame =
    StatsOps.skyline2d(Catalog.load(spark, dir, "part"),
        col("p_partkey"), col("p_size"), col("p_retailprice"))
      .select(col("id").as("p_partkey"), col("size").as("p_size"),
        col("cost").as("p_retailprice"))
      .orderBy(col("p_partkey"))

  private val skylineSql =
    """SELECT p_partkey, p_size, p_retailprice
      |FROM part p
      |WHERE NOT EXISTS (
      |  SELECT 1 FROM part q
      |  WHERE q.p_size >= p.p_size AND q.p_retailprice <= p.p_retailprice
      |    AND (q.p_size > p.p_size OR q.p_retailprice < p.p_retailprice))
      |ORDER BY p_partkey""".stripMargin

  /** Winsorized aggregates: exact rank-selected p05/p95 price bounds per
    * return flag (no interpolation — engine-exact, q40's recipe), every
    * value clipped into [lo, hi], then an order-independent decimal sum.
    * The outlier-robust rollup a feature pipeline runs instead of
    * dropping rows. One window + one broadcast-joined aggregate. */
  def winsorize(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        col("l_extendedprice").as("x"),
        col("l_orderkey"), col("l_linenumber"))
    val ranked = li
      .withColumn("rn", row_number().over(Window.partitionBy(col("flag"))
        .orderBy(col("x"), col("l_orderkey"), col("l_linenumber"))))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("flag"))))
    val bounds = ranked.groupBy(col("flag")).agg(
      max(when(expr("rn = cast(ceil(n * 0.05) as bigint)"), col("x"))).as("lo"),
      max(when(expr("rn = cast(ceil(n * 0.95) as bigint)"), col("x"))).as("hi"))
    li.join(broadcast(bounds), "flag")
      .groupBy(col("flag"))
      .agg(max(col("lo")).as("lo"), max(col("hi")).as("hi"),
        sum(when(col("x") < col("lo"), 1L).otherwise(0L)).as("n_low"),
        sum(when(col("x") > col("hi"), 1L).otherwise(0L)).as("n_high"),
        dsum(least(greatest(col("x"), col("lo")), col("hi")))
          .as("sum_winsorized"))
      .orderBy(col("flag"))
  }

  private val winsorizeSql =
    s"""WITH r AS (
       |  SELECT l_returnflag AS flag, l_extendedprice AS x,
       |    row_number() OVER (PARTITION BY l_returnflag
       |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS rn,
       |    COUNT(*) OVER (PARTITION BY l_returnflag) AS n
       |  FROM lineitem
       |), b AS (
       |  SELECT flag,
       |    MAX(CASE WHEN rn = CAST(ceil(n * 0.05) AS BIGINT) THEN x END) AS lo,
       |    MAX(CASE WHEN rn = CAST(ceil(n * 0.95) AS BIGINT) THEN x END) AS hi
       |  FROM r GROUP BY 1
       |)
       |SELECT flag, MAX(lo) AS lo, MAX(hi) AS hi,
       |  CAST(SUM(CASE WHEN x < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       |  CAST(SUM(CASE WHEN x > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       |  ${sqlSum("least(greatest(x, lo), hi)")} AS sum_winsorized
       |FROM (SELECT l_returnflag AS flag, l_extendedprice AS x FROM lineitem) v
       |JOIN b USING (flag)
       |GROUP BY flag
       |ORDER BY flag""".stripMargin

  /** Per-document lexical concentration as GINI IMPURITY
    * `1 − Σ (c_t/n)²` — the ln-free cousin of token entropy (same
    * ordering for quality filtering, but exact-count arithmetic: one
    * integer Σc², one division — bit-identical on any engine, where
    * entropy's per-term ln drifts). */
  def giniLexical(spark: SparkSession, dir: String): DataFrame = {
    val t = TextOps.exploded(
      Catalog.load(spark, dir, "documents"))
    t.groupBy(col("doc_id"), col("tok")).agg(count(lit(1)).as("c"))
      .groupBy(col("doc_id"))
      .agg(sum(col("c")).as("n"), sum(col("c") * col("c")).as("ss"))
      .select(col("doc_id"), col("n"),
        (lit(1.0) - col("ss").cast("double") /
          (col("n") * col("n")).cast("double")).as("gini"))
      .orderBy(col("doc_id"))
  }

  private val giniSql =
    """WITH t AS (
      |  SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
      |), c AS (
      |  SELECT doc_id, tok, COUNT(*) AS c FROM t GROUP BY 1, 2
      |)
      |SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
      |  1.0 - CAST(SUM(c * c) AS DOUBLE) / (CAST(SUM(c) AS BIGINT) * CAST(SUM(c) AS BIGINT)) AS gini
      |FROM c GROUP BY doc_id
      |ORDER BY doc_id""".stripMargin

  /** Equi-depth histogram via exact ntile: 10 buckets of equal row count
    * per flag, each reporting its exact value range and population — the
    * complement of q91's fixed-width histogram (stats collectors keep
    * both). Ordering inside the ntile is made total with a unique
    * tiebreak, so bucket assignment is deterministic on any engine. The
    * flag dimension has 3 values, so a `PARTITION BY flag` window would
    * still put ~⅓ of the fact table through one task; instead this is
    * [[graft.ops.GlobalRank]]'s grouped form — ONE range shuffle on
    * (flag, x, tiebreak), per-flag bases from a broadcast-sized
    * aggregate, buckets assigned arithmetically. */
  def equidepthHistogram(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    val base = Catalog.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"), col("l_extendedprice").as("x"),
        col("l_orderkey"), col("l_linenumber"))
    val r = GlobalRank.withRowNumber(base,
      Seq(col("flag"), col("x"), col("l_orderkey"), col("l_linenumber")),
      "grn")
    val bounds = r.groupBy(col("flag"))
      .agg(min(col("grn")).as("g0"), count(lit(1)).as("gn"))
    r.join(broadcast(bounds), "flag")
      .withColumn("bucket", GlobalRank.ntileFromRowNumber(
        col("grn") - col("g0") + 1, col("gn"), 10).cast("long"))
      .groupBy(col("flag"), col("bucket"))
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"),
        count(lit(1)).as("n"))
      .orderBy(col("flag"), col("bucket"))
  }

  private val equidepthSql =
    """WITH r AS (
      |  SELECT l_returnflag AS flag, l_extendedprice AS x,
      |    CAST(ntile(10) OVER (PARTITION BY l_returnflag
      |      ORDER BY l_extendedprice, l_orderkey, l_linenumber) AS BIGINT)
      |      AS bucket
      |  FROM lineitem
      |)
      |SELECT flag, bucket, MIN(x) AS lo, MAX(x) AS hi,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM r GROUP BY 1, 2
      |ORDER BY flag, bucket""".stripMargin

  /** Deterministic z-score outlier flags: per-brand price mean/stddev
    * from the exact decimal moment sums ([[StatsOps]] recipe — the same
    * IEEE expression text on both engines), flagging rows beyond 1.5σ (the fixture prices are near-uniform, where |z| never exceeds √3 — a 3σ cut is the right production default but would prove nothing here).
    * The outlier scan every feature store runs; broadcast of the tiny
    * per-brand stats frame, one pass over the fact table. */
  def zscoreOutliers(spark: SparkSession, dir: String): DataFrame = {
    val p = Catalog.load(spark, dir, "part")
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"))
    val stats = p.groupBy(col("p_brand")).agg(
      count(lit(1)).as("n"), dsum(col("p_retailprice")).as("sx"),
      dsum(col("p_retailprice") * col("p_retailprice")).as("sxx"))
    // identical expression TEXT on both engines (momentStats recipe)
    val armed = stats.selectExpr("p_brand", "n",
      "sx / n AS mean",
      "sqrt((sxx - sx * sx / n) / (n - 1)) AS sd")
    p.join(broadcast(armed), "p_brand")
      .filter(col("n") > 1 && col("sd") > 0 &&
        abs(col("p_retailprice") - col("mean")) > lit(1.5) * col("sd"))
      .select(col("p_partkey"), col("p_brand"), col("p_retailprice"),
        col("mean"), col("sd"))
      .orderBy(col("p_partkey"))
  }

  private val zscoreSql =
    s"""WITH s AS (
       |  SELECT p_brand, COUNT(*) AS n,
       |    ${sqlSum("p_retailprice")} AS sx,
       |    ${sqlSum("p_retailprice * p_retailprice")} AS sxx
       |  FROM part GROUP BY 1
       |), a AS (
       |  SELECT p_brand, n, sx / n AS mean,
       |    sqrt((sxx - sx * sx / n) / (n - 1)) AS sd
       |  FROM s
       |)
       |SELECT p_partkey, p.p_brand, p_retailprice, mean, sd
       |FROM part p JOIN a ON p.p_brand = a.p_brand
       |WHERE n > 1 AND sd > 0 AND abs(p_retailprice - mean) > 1.5 * sd
       |ORDER BY p_partkey""".stripMargin

  // ---- content checksums ------------------------------------------------

  /** Order-independent per-month content checksum of the orders table —
    * the primitive behind cross-engine migration audits and
    * cross-version drift detection (pair with Versioned time travel to
    * answer "did this partition's CONTENT change?" without reading both
    * sides row-by-row). Each row is canonicalized engine-neutrally
    * (integers and BIGINT cents only — doubles never render to text),
    * md5-hashed, and the first 60 bits are folded two ways: an XOR (no
    * overflow, any row count) and a mod-p sum (catches the even-count
    * duplicate flips XOR misses). Both folds are commutative, so a
    * 1000-executor partial aggregate needs no ordering guarantee — this
    * is a map-side-combinable single-exchange aggregate at any scale. */
  def tableChecksum(spark: SparkSession, dir: String): DataFrame = {
    val canon = concat_ws("|",
      col("o_orderkey"), col("o_custkey"), col("o_orderstatus"),
      round(col("o_totalprice") * 100).cast("long"),
      unix_micros(date_trunc("day", col("o_orderdate"))),
      col("o_orderpriority"))
    val h = conv(substring(md5(canon), 1, 15), 16, 10).cast("long")
    Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .withColumn("h", h)
      .groupBy(unix_micros(date_trunc("month", col("o_orderdate")))
        .as("month_us"))
      .agg(count(lit(1)).as("n_rows"),
        expr("bit_xor(h)").as("xor_c"),
        sum(col("h") % lit(checksumP)).as("sum_c"))
      .orderBy(col("month_us"))
  }

  private val checksumP = 1000000007L

  private lazy val tableChecksumSql = {
    // DuckDB has no hex→int cast, so the 60-bit parse is spelled as a
    // 15-term base-16 polynomial — same generated-literal trick as the
    // q107 z-order interleave.
    val poly = (0 until 15).map { k =>
      val pow = math.pow(16, 14 - k).toLong
      s"(strpos('0123456789abcdef', substring(h, ${k + 1}, 1)) - 1) * $pow"
    }.mkString(" + ")
    s"""WITH rows_ AS (
       |  SELECT epoch_ns(date_trunc('month', o_orderdate)) // 1000
       |      AS month_us,
       |    md5(concat_ws('|', o_orderkey, o_custkey, o_orderstatus,
       |      CAST(round(o_totalprice * 100) AS BIGINT),
       |      epoch_ns(date_trunc('day', o_orderdate)) // 1000,
       |      o_orderpriority)) AS h
       |  FROM orders WHERE o_orderdate IS NOT NULL
       |), hashed AS (
       |  SELECT month_us, CAST($poly AS BIGINT) AS hv FROM rows_
       |)
       |SELECT month_us, COUNT(*) AS n_rows,
       |  bit_xor(hv) AS xor_c,
       |  CAST(SUM(hv % $checksumP) AS BIGINT) AS sum_c
       |FROM hashed
       |GROUP BY month_us
       |ORDER BY month_us""".stripMargin
  }

  /** Quantile normalization of order prices across priority classes
    * ([[StatsOps.quantileNormalize]]): after it, every priority class
    * shares one price distribution — the feature-prep step that stops a
    * model from learning "URGENT orders are cheap" when that's a
    * collection artifact, and the microarray-normalization standard. */
  def quantileNorm(spark: SparkSession, dir: String): DataFrame =
    StatsOps.quantileNormalize(
        Catalog.load(spark, dir, "orders"),
        col("o_orderpriority"), col("o_totalprice"), col("o_orderkey"))
      .select(col("o_orderkey"), col("o_orderpriority"), col("bucket"),
        col("norm_value"))
      .orderBy(col("o_orderkey"))

  private val quantileNormSql =
    s"""WITH b AS (
       |  SELECT o_orderkey, o_orderpriority, o_totalprice,
       |    ntile(100) OVER (PARTITION BY o_orderpriority
       |      ORDER BY o_totalprice, o_orderkey) AS bucket
       |  FROM orders
       |), ref AS (
       |  SELECT bucket, ${sqlAvg("o_totalprice")} AS norm_value
       |  FROM b GROUP BY bucket
       |)
       |SELECT o_orderkey, o_orderpriority, bucket, norm_value
       |FROM b JOIN ref USING (bucket)
       |ORDER BY o_orderkey""".stripMargin

  /** Local clustering coefficient per node on q119's co-supply graph:
    * lcc = 2·triangles / (deg·(deg−1)) — the "how clique-ish is this
    * node's neighborhood" signal on top of the triangle counts. Degrees
    * come from one aggregate over the oriented edge list; the ≤|V|-row
    * triangle table joins back on node id. Integer inputs + one IEEE
    * division keep the double bit-identical cross-engine. */
  def clusteringCoeff(spark: SparkSession, dir: String): DataFrame = {
    // shared memoized co-supply frame feeds degrees + the wedge join
    val edges = coSupplyEdges(spark, dir)
    val deg = edges.select(col("a").as("n"))
      .union(edges.select(col("b").as("n")))
      .groupBy(col("n")).agg(count(lit(1)).as("degree"))
    deg.filter(col("degree") >= 2)
      .join(graft.ops.GraphOps.trianglesPerNode(edges), Seq("n"), "left")
      .select(col("n").as("supp"), col("degree"),
        coalesce(col("triangles"), lit(0L)).as("triangles"),
        (coalesce(col("triangles"), lit(0L)).cast("double") * 2 /
          (col("degree") * (col("degree") - 1)).cast("double"))
          .as("lcc"))
      .orderBy(col("supp"))
  }

  private val clusteringCoeffSql =
    """WITH pe AS (
      |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
      |  WHERE l_quantity >= 45
      |), e AS (
      |  SELECT DISTINCT x.s AS a, y.s AS b
      |  FROM pe x JOIN pe y ON x.o = y.o AND x.s < y.s
      |), deg AS (
      |  SELECT n, CAST(COUNT(*) AS BIGINT) AS degree
      |  FROM (SELECT a AS n FROM e UNION ALL SELECT b FROM e)
      |  GROUP BY n
      |), t AS (
      |  SELECT e1.a AS x, e1.b AS y, e2.b AS z
      |  FROM e e1
      |  JOIN e e2 ON e2.a = e1.b
      |  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
      |), tri AS (
      |  SELECT supp, CAST(COUNT(*) AS BIGINT) AS triangles
      |  FROM (SELECT x AS supp FROM t
      |        UNION ALL SELECT y FROM t
      |        UNION ALL SELECT z FROM t)
      |  GROUP BY supp
      |)
      |SELECT n AS supp, degree,
      |  COALESCE(triangles, 0) AS triangles,
      |  CAST(COALESCE(triangles, 0) AS DOUBLE) * 2
      |    / CAST(degree * (degree - 1) AS DOUBLE) AS lcc
      |FROM deg LEFT JOIN tri ON n = supp
      |WHERE degree >= 2
      |ORDER BY supp""".stripMargin

  /** Fellegi–Sunter probabilistic record linkage over nation-blocked
    * customer pairs: three field comparisons (market segment, account-
    * balance bucket, last cent digit) each contribute a fixed
    * milli-log₂-odds weight — agree w = ⌊1000·log₂(m/u)⌋, disagree
    * w = ⌊1000·log₂((1−m)/(1−u))⌋ for declared (m, u) of (0.9, 0.2),
    * (0.85, 0.09), (0.8, 0.1) — so the match score is an exact integer
    * sum. Blocking bounds the pair fan-out (at corpus scale the block
    * key becomes a sorted-neighborhood / LSH key, same join shape). */
  def fsLinkage(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"),
        floor(expr("cast(cast(round(c_acctbal * 100) as bigint) as double)")
          / 100000).as("bal"),
        expr("cast(round(c_acctbal * 100) as bigint) % 10").as("cd"))
      .localCheckpoint(false) // both sides of the blocked self-join
    c.as("a").join(c.as("b"),
        col("a.nk") === col("b.nk") && col("a.k") < col("b.k"))
      .select(col("a.k").as("cust_a"), col("b.k").as("cust_b"),
        col("a.nk").as("nation"),
        (col("a.seg") === col("b.seg")).cast("int").as("agree_seg"),
        (col("a.bal") === col("b.bal")).cast("int").as("agree_bal"),
        (col("a.cd") === col("b.cd")).cast("int").as("agree_cd"))
      .withColumn("score_milli",
        when(col("agree_seg") === 1, 2170).otherwise(-3000) +
          when(col("agree_bal") === 1, 3240).otherwise(-2601) +
          when(col("agree_cd") === 1, 3000).otherwise(-2170))
      .filter(col("score_milli") >= 5000)
      .orderBy(col("cust_a"), col("cust_b"))
  }

  private val fsLinkageSql =
    """WITH c AS (
      |  SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
      |    floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
      |      / 100000) AS bal,
      |    CAST(round(c_acctbal * 100) AS BIGINT) % 10 AS cd
      |  FROM customer
      |), p AS (
      |  SELECT a.k AS cust_a, b.k AS cust_b, a.nk AS nation,
      |    CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS agree_seg,
      |    CASE WHEN a.bal = b.bal THEN 1 ELSE 0 END AS agree_bal,
      |    CASE WHEN a.cd = b.cd THEN 1 ELSE 0 END AS agree_cd
      |  FROM c a JOIN c b ON a.nk = b.nk AND a.k < b.k
      |)
      |SELECT *,
      |  (CASE WHEN agree_seg = 1 THEN 2170 ELSE -3000 END
      |   + CASE WHEN agree_bal = 1 THEN 3240 ELSE -2601 END
      |   + CASE WHEN agree_cd = 1 THEN 3000 ELSE -2170 END) AS score_milli
      |FROM p
      |WHERE (CASE WHEN agree_seg = 1 THEN 2170 ELSE -3000 END
      |   + CASE WHEN agree_bal = 1 THEN 3240 ELSE -2601 END
      |   + CASE WHEN agree_cd = 1 THEN 3000 ELSE -2170 END) >= 5000
      |ORDER BY cust_a, cust_b""".stripMargin

  /** One-way ANOVA F over order prices by priority class, from exact
    * sufficient statistics: per-group (n, Σcents, Σcents²) — the square
    * sums ride DECIMAL(38,0) so a 100 TB fact table can't overflow them —
    * then SSB/SSW/F as mirrored IEEE expressions over those exact
    * integers. Two hash aggregates (group, then the k-row rollup);
    * nothing else moves. */
  def anovaF(spark: SparkSession, dir: String): DataFrame = {
    val per = Catalog.load(spark, dir, "orders")
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("c"),
        col("o_orderpriority").as("g"))
      .groupBy(col("g"))
      .agg(count(lit(1)).as("ng"), sum(col("c")).as("sg"),
        sum((col("c") * col("c")).cast("decimal(38,0)")).as("qg"))
    per.agg(count(lit(1)).as("k"), sum(col("ng")).as("n"),
        sum(col("sg")).as("s"), sum(col("qg")).as("q_dec"),
        dsum(col("sg").cast("double") * col("sg").cast("double")
          / col("ng").cast("double")).as("t"))
      .select(col("k"), col("n"),
        (col("t") - col("s").cast("double") * col("s").cast("double")
          / col("n").cast("double")).as("ss_between"),
        (col("q_dec").cast("double") - col("t")).as("ss_within"))
      .withColumn("f_stat",
        (col("ss_between") / (col("k") - 1)) /
          (col("ss_within") / (col("n") - col("k"))))
      .select(col("k"), col("n"), col("ss_between"), col("ss_within"),
        col("f_stat"))
  }

  private val anovaFSql = {
    val t = sqlSum("CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) " +
      "/ CAST(ng AS DOUBLE)")
    s"""WITH per AS (
       |  SELECT o_orderpriority AS g, CAST(COUNT(*) AS BIGINT) AS ng,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS BIGINT) AS sg,
       |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)
       |      * CAST(round(o_totalprice * 100) AS BIGINT))
       |      AS DECIMAL(38,0)) AS qg
       |  FROM orders GROUP BY 1
       |), agg AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS k,
       |    CAST(SUM(ng) AS BIGINT) AS n, CAST(SUM(sg) AS BIGINT) AS s,
       |    CAST(CAST(SUM(qg) AS DECIMAL(38,0)) AS VARCHAR) AS q_str,
       |    $t AS t
       |  FROM per
       |), d AS (
       |  SELECT k, n,
       |    t - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / CAST(n AS DOUBLE)
       |      AS ss_between,
       |    CAST(q_str AS DOUBLE) - t AS ss_within
       |  FROM agg
       |)
       |SELECT k, n, ss_between, ss_within,
       |  (ss_between / (k - 1)) / (ss_within / (n - k)) AS f_stat
       |FROM d""".stripMargin
  }

  /** Herfindahl–Hirschman concentration of customer revenue per nation:
    * HHI = Σᵢ shareᵢ² computed as Σsᵢ² / S² over exact integer cents —
    * the antitrust-style "is this market one whale or many minnows"
    * number, and for a corpus the "is this source dominated by one
    * crawler" audit. Two aggregates; the squares stay inside BIGINT
    * because per-entity sums are ≤9 digits of cents. */
  def hhi(spark: SparkSession, dir: String): DataFrame = {
    val per = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"), col("c_custkey"))
      .agg(sum(expr("cast(round(o_totalprice * 100) as bigint)")).as("s"))
    per.groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_custs"), sum(col("s")).as("total_cents"),
        sum(col("s") * col("s")).as("sq"))
      .select(col("c_nationkey"), col("n_custs"), col("total_cents"),
        (col("sq").cast("double") /
          (col("total_cents").cast("double") *
            col("total_cents").cast("double"))).as("hhi"))
      .orderBy(col("c_nationkey"))
  }

  private val hhiSql =
    """WITH per AS (
      |  SELECT c_nationkey, c_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT))
      |      AS BIGINT) AS s
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1, 2
      |), agg AS (
      |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_custs,
      |    CAST(SUM(s) AS BIGINT) AS total_cents,
      |    CAST(SUM(s * s) AS BIGINT) AS sq
      |  FROM per GROUP BY 1
      |)
      |SELECT c_nationkey, n_custs, total_cents,
      |  CAST(sq AS DOUBLE)
      |    / (CAST(total_cents AS DOUBLE) * CAST(total_cents AS DOUBLE))
      |    AS hhi
      |FROM agg ORDER BY c_nationkey""".stripMargin

  /** Decile lift table for the value→purchase ranker q210 scores as one
    * number: deciles by descending score (deterministic ntile on
    * (cents, event_id)), per decile the positive count, rate, cumulative
    * capture of all positives, and lift vs base rate — the table a
    * targeting team reads before paying for the model. Integer counts +
    * mirrored IEEE divisions only. */
  def decileLift(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    // the decile cut ranks the EVENTS fact table — GlobalRank's exact
    // distributed ntile, never a single-partition window; the cumulative
    // windows below run on the collapsed 10-row decile spine
    val e = graft.ops.GlobalRank.withNtile(
      Catalog.load(spark, dir, "events")
        .filter(col("value").isNotNull && col("event_type").isNotNull)
        .select(expr("cast(round(value * 100) as bigint)").as("cents"),
          col("event_id"),
          (col("event_type") === "purchase").cast("int").as("pos")),
      10, Seq(col("cents").desc, col("event_id")), "decile")
    val d = e.groupBy(col("decile"))
      .agg(count(lit(1)).as("n"), sum(col("pos")).as("n_pos"))
    d.withColumn("cum_pos",
        sum(col("n_pos")).over(Window.orderBy(col("decile"))))
      .withColumn("tot_pos", sum(col("n_pos")).over(Window.partitionBy()))
      .withColumn("tot_n", sum(col("n")).over(Window.partitionBy()))
      .select(col("decile"), col("n"), col("n_pos"),
        (col("n_pos").cast("double") / col("n").cast("double")).as("rate"),
        (col("cum_pos").cast("double") / col("tot_pos").cast("double"))
          .as("cum_capture"),
        ((col("n_pos").cast("double") / col("n").cast("double"))
          / (col("tot_pos").cast("double") / col("tot_n").cast("double")))
          .as("lift"))
      .orderBy(col("decile"))
  }

  private val decileLiftSql =
    """WITH e AS (
      |  SELECT CAST(round(value * 100) AS BIGINT) AS cents, event_id,
      |    CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS pos
      |  FROM events WHERE value IS NOT NULL AND event_type IS NOT NULL
      |), t AS (
      |  SELECT pos, ntile(10) OVER (ORDER BY cents DESC, event_id)
      |    AS decile FROM e
      |), d AS (
      |  SELECT decile, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(pos) AS BIGINT) AS n_pos
      |  FROM t GROUP BY 1
      |), c AS (
      |  SELECT decile, n, n_pos,
      |    CAST(SUM(n_pos) OVER (ORDER BY decile) AS BIGINT) AS cum_pos,
      |    CAST(SUM(n_pos) OVER () AS BIGINT) AS tot_pos,
      |    CAST(SUM(n) OVER () AS BIGINT) AS tot_n
      |  FROM d
      |)
      |SELECT decile, n, n_pos,
      |  CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE) AS rate,
      |  CAST(cum_pos AS DOUBLE) / CAST(tot_pos AS DOUBLE) AS cum_capture,
      |  (CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))
      |    / (CAST(tot_pos AS DOUBLE) / CAST(tot_n AS DOUBLE)) AS lift
      |FROM c ORDER BY decile""".stripMargin

  /** k-anonymity audit over the quasi-identifier (nation, market
    * segment, balance-thousands bucket): every equivalence class with
    * fewer than k=5 members is a re-identification risk — the privacy
    * gate a training-data release runs before shipping user-derived
    * rows. One hash aggregate on the quasi-identifier; the l-diversity
    * column (distinct last-cent digits as a stand-in sensitive value)
    * rides the same aggregate for free. */
  def kAnonymity(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "customer")
      .groupBy(col("c_nationkey"), col("c_mktsegment"),
        floor(expr("cast(cast(round(c_acctbal * 100) as bigint) as double)")
          / 100000).cast("long").as("bal_bucket"))
      .agg(count(lit(1)).as("class_size"),
        countDistinct(expr("cast(round(c_acctbal * 100) as bigint) % 10"))
          .as("l_diversity"))
      .filter(col("class_size") < 5)
      .orderBy(col("c_nationkey"), col("c_mktsegment"), col("bal_bucket"))

  private val kAnonymitySql =
    """SELECT c_nationkey, c_mktsegment,
      |  CAST(floor(CAST(CAST(round(c_acctbal * 100) AS BIGINT) AS DOUBLE)
      |    / 100000) AS BIGINT) AS bal_bucket,
      |  CAST(COUNT(*) AS BIGINT) AS class_size,
      |  CAST(COUNT(DISTINCT CAST(round(c_acctbal * 100) AS BIGINT) % 10)
      |    AS BIGINT) AS l_diversity
      |FROM customer
      |GROUP BY 1, 2, 3
      |HAVING COUNT(*) < 5
      |ORDER BY 1, 2, 3""".stripMargin

  /** Sorted-neighborhood entity resolution — q211's Fellegi–Sunter
    * scoring under the OTHER classic blocking scheme: sort once on a
    * cheap key (balance cents), slide a window of 4, and score only
    * window pairs — O(n·w) candidates instead of per-block quadratic.
    * The window join is an exact equi-join on exploded neighbor ranks.
    * At 100 TB the global row_number becomes a range-partitioned sort
    * with boundary overlap; the candidate shape is unchanged. */
  def sortedNeighborhood(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val c = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"), col("c_nationkey").as("nk"),
        col("c_mktsegment").as("seg"),
        expr("cast(round(c_acctbal * 100) as bigint)").as("cents"),
        expr("cast(round(c_acctbal * 100) as bigint) % 10").as("cd"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("cents"), col("k"))).cast("long"))
      .localCheckpoint(false) // both sides of the neighbor-rank join
    val probes = c.select(col("k"), col("nk"), col("seg"), col("cd"),
      explode(sequence(col("rn") + 1, col("rn") + 4)).as("rn2"))
    probes.as("a").join(c.as("b"), col("a.rn2") === col("b.rn"))
      .select(col("a.k").as("cust_a"), col("b.k").as("cust_b"),
        (when(col("a.nk") === col("b.nk"), 3170).otherwise(-2737) +
          when(col("a.seg") === col("b.seg"), 2170).otherwise(-3000) +
          when(col("a.cd") === col("b.cd"), 3000).otherwise(-2170))
          .as("score_milli"))
      .filter(col("score_milli") >= 3000)
      .orderBy(col("cust_a"), col("cust_b"))
  }

  private val sortedNeighborhoodSql =
    """WITH c AS (
      |  SELECT c_custkey AS k, c_nationkey AS nk, c_mktsegment AS seg,
      |    CAST(round(c_acctbal * 100) AS BIGINT) AS cents,
      |    CAST(round(c_acctbal * 100) AS BIGINT) % 10 AS cd
      |  FROM customer
      |), r AS (
      |  SELECT *, CAST(row_number() OVER (ORDER BY cents, k) AS BIGINT)
      |    AS rn FROM c
      |), p AS (
      |  SELECT a.k AS cust_a, b.k AS cust_b,
      |    (CASE WHEN a.nk = b.nk THEN 3170 ELSE -2737 END
      |     + CASE WHEN a.seg = b.seg THEN 2170 ELSE -3000 END
      |     + CASE WHEN a.cd = b.cd THEN 3000 ELSE -2170 END)
      |      AS score_milli
      |  FROM r a, unnest(range(1, 5)) AS u(d)
      |  JOIN r b ON b.rn = a.rn + d
      |)
      |SELECT * FROM p WHERE score_milli >= 3000
      |ORDER BY cust_a, cust_b""".stripMargin

  /** The shared memoized co-supply graph ([[TradeGraph.coSupply]]):
    * built and checkpointed once per (minQty, dataset) for the whole
    * q119/q162/q207/q224/q225/q235/q248 family. */
  private def coSupplyEdges(spark: SparkSession, dir: String,
      minQty: Int = 45): DataFrame =
    TradeGraph.coSupply(spark, dir, minQty)

  private def coSupplyEdgesSqlAt(minQty: Int) =
    s"""e0 AS (
       |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s FROM lineitem
       |  WHERE l_quantity >= $minQty
       |), e AS (
       |  SELECT DISTINCT x.s AS a, y.s AS b
       |  FROM e0 x JOIN e0 y ON x.o = y.o AND x.s < y.s
       |)""".stripMargin

  private val coSupplyEdgesSql = coSupplyEdgesSqlAt(45)

  /** 3-core of the co-supply graph ([[graft.ops.GraphOps.kCore]], 6
    * peeling rounds) — the dense trading core after iteratively
    * shedding peripheral suppliers. */
  def kCore3(spark: SparkSession, dir: String): DataFrame =
    graft.ops.GraphOps.kCore(coSupplyEdges(spark, dir), k = 3, rounds = 6)
      .select(col("n").as("supp"), col("degree"))
      .orderBy(col("supp"))

  private val kCore3Sql = {
    // MATERIALIZED: each round is referenced twice (both semi-join
    // sides); inlined CTEs would re-evaluate the whole prefix 2^rounds
    // times and exhaust file handles on the base scan
    def round(i: Int) =
      s"""keep$i AS MATERIALIZED (
         |  SELECT n FROM (
         |    SELECT n, COUNT(*) AS d FROM (
         |      SELECT a AS n FROM e$i UNION ALL SELECT b FROM e$i)
         |    GROUP BY n) WHERE d >= 3
         |), e${i + 1} AS MATERIALIZED (
         |  SELECT e.a, e.b FROM e$i e
         |  JOIN keep$i ka ON e.a = ka.n
         |  JOIN keep$i kb ON e.b = kb.n
         |)""".stripMargin
    s"""WITH $coSupplyEdgesSql, e1 AS MATERIALIZED (SELECT a, b FROM e),
       |${(1 to 6).map(round).mkString(", ")}
       |SELECT n AS supp, CAST(COUNT(*) AS BIGINT) AS degree
       |FROM (SELECT a AS n FROM e7 UNION ALL SELECT b FROM e7)
       |GROUP BY n ORDER BY supp""".stripMargin
  }

  /** Degree assortativity of the co-supply graph
    * ([[graft.ops.GraphOps.assortativity]]). */
  def assortativityQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.GraphOps.assortativity(coSupplyEdges(spark, dir))

  private val assortativitySql =
    s"""WITH $coSupplyEdgesSql, both_ AS (
       |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
       |), deg AS (
       |  SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM both_ GROUP BY u
       |), xy AS (
       |  SELECT dx.d AS x, dy.d AS y
       |  FROM both_ b JOIN deg dx ON b.u = dx.u JOIN deg dy ON b.v = dy.u
       |), s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS m,
       |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
       |    CAST(SUM(x * x) AS BIGINT) AS sxx,
       |    CAST(SUM(y * y) AS BIGINT) AS syy,
       |    CAST(SUM(x * y) AS BIGINT) AS sxy
       |  FROM xy
       |)
       |SELECT m,
       |  CAST(m * sxy - sx * sy AS DOUBLE)
       |    / (sqrt(CAST(m * sxx - sx * sx AS DOUBLE))
       |       * sqrt(CAST(m * syy - sy * sy AS DOUBLE))) AS assortativity
       |FROM s""".stripMargin

  /** Spearman rank correlation of (quantity, extended-price cents) with
    * full tie handling: each value's AVERAGE rank, doubled to stay
    * integral (2·rank + |ties| − 1), then Pearson over the doubled
    * ranks from exact DECIMAL(38,0) moment sums and one mirrored IEEE
    * closed form (÷, sqrt, × are correctly rounded — engine-exact).
    * Each doubled rank lives on its DISTINCT-VALUE frame (min rank =
    * cumulative count − ties + 1, cumulative counts via
    * [[graft.ops.GlobalRank.withRunningSum]] — no fact-sized
    * single-partition window) and joins back to the fact rows by
    * value, so the (x2, y2) pairs feeding the moments are unchanged.
    * BIGINT would overflow at m·Σxy ≈ 4n³ — the decimal moments hold
    * to n ≈ 10⁹ rows per corpus. */
  def spearman(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    val dec = "decimal(38,0)"
    val b = Catalog.load(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
    def doubledRanks(v: String) = GlobalRank.withRunningSum(
        b.groupBy(col(v)).agg(count(lit(1)).as("t")),
        Seq(col(v)), col("t"), "cumn")
      .select(col(v).as(v + "k"),
        (lit(2L) * (col("cumn") - col("t") + 1) + col("t") - 1)
          .as(v + "2"))
    val r = b
      .join(doubledRanks("x"), col("x") === col("xk"))
      .join(doubledRanks("y"), col("y") === col("yk"))
    val s = r.agg(count(lit(1)).as("m"),
      sum(col("x2").cast(dec)).as("sx"), sum(col("y2").cast(dec)).as("sy"),
      sum((col("x2").cast(dec) * col("x2")).cast(dec)).as("sxx"),
      sum((col("y2").cast(dec) * col("y2")).cast(dec)).as("syy"),
      sum((col("x2").cast(dec) * col("y2")).cast(dec)).as("sxy"))
    val m = col("m").cast(dec)
    s.select(col("m"),
      ((m * col("sxy") - col("sx") * col("sy")).cast("double") /
        (sqrt((m * col("sxx") - col("sx") * col("sx")).cast("double")) *
          sqrt((m * col("syy") - col("sy") * col("sy")).cast("double"))))
        .as("spearman_rho"))
  }

  // HUGEINT mirrors the Spark decimal(38,0) moments exactly; the final
  // hop to DOUBLE goes through VARCHAR because DuckDB's direct
  // HUGEINT→DOUBLE cast is not correctly rounded past 2^53 while
  // strtod is (see Det.sqlSum)
  private def hugeDbl(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"

  private val spearmanSql =
    s"""WITH b AS (
       |  SELECT CAST(l_quantity AS BIGINT) AS x,
       |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y
       |  FROM lineitem
       |), r AS (
       |  SELECT
       |    CAST(rank() OVER (ORDER BY x) AS BIGINT) * 2
       |      + COUNT(*) OVER (PARTITION BY x) - 1 AS x2,
       |    CAST(rank() OVER (ORDER BY y) AS BIGINT) * 2
       |      + COUNT(*) OVER (PARTITION BY y) - 1 AS y2
       |  FROM b
       |), s AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
       |    SUM(CAST(x2 AS HUGEINT)) AS sx, SUM(CAST(y2 AS HUGEINT)) AS sy,
       |    SUM(CAST(x2 AS HUGEINT) * x2) AS sxx,
       |    SUM(CAST(y2 AS HUGEINT) * y2) AS syy,
       |    SUM(CAST(x2 AS HUGEINT) * y2) AS sxy
       |  FROM r
       |)
       |SELECT CAST(m AS BIGINT) AS m,
       |  ${hugeDbl("m * sxy - sx * sy")}
       |    / (sqrt(${hugeDbl("m * sxx - sx * sx")})
       |       * sqrt(${hugeDbl("m * syy - sy * sy")})) AS spearman_rho
       |FROM s""".stripMargin

  /** Two-sample Kolmogorov–Smirnov statistic comparing the order-value
    * distribution of URGENT vs LOW priority orders — the classic
    * "did this slice drift" test for pipeline snapshots. The ECDF gap
    * is kept as the EXACT integer |c1·n2 − c2·n1| (max over distinct
    * values), divided once at the end — no per-point doubles to
    * accumulate. One aggregate per distinct value + one cumulative
    * window + one max; the cumulative sort range-partitions at scale. */
  def ksTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val b = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("g"))
    val per = b.groupBy(col("v"))
      .agg(sum(col("g")).as("d1"), sum(lit(1L) - col("g")).as("d2"))
    // both ECDF prefixes via GlobalRank's exact distributed running sum
    // (the distinct-value frame is score-range-sized, but unbounded in
    // principle — no single-partition window); fused: one range shuffle
    // for both prefixes instead of two identical ones
    val cum = graft.ops.GlobalRank.withRunningSums(per, Seq(col("v")),
      Seq((col("d1"), "c1"), (col("d2"), "c2")))
    val tot = b.agg(sum(col("g")).as("n1"),
      sum(lit(1L) - col("g")).as("n2"))
    cum.crossJoin(tot)
      .groupBy(col("n1"), col("n2"))
      .agg(max(abs(col("c1") * col("n2") - col("c2") * col("n1")))
        .as("ks_num"))
      .select(col("n1"), col("n2"), col("ks_num"),
        (col("ks_num").cast("double") /
          (col("n1") * col("n2")).cast("double")).as("ks_stat"))
  }

  private val ksTestSql =
    """WITH b AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
      |  FROM orders
      |  WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
      |), per AS (
      |  SELECT v, CAST(SUM(g) AS BIGINT) AS d1,
      |    CAST(SUM(1 - g) AS BIGINT) AS d2
      |  FROM b GROUP BY v
      |), cum AS (
      |  SELECT CAST(SUM(d1) OVER (ORDER BY v) AS BIGINT) AS c1,
      |    CAST(SUM(d2) OVER (ORDER BY v) AS BIGINT) AS c2
      |  FROM per
      |), tot AS (
      |  SELECT CAST(SUM(g) AS BIGINT) AS n1,
      |    CAST(SUM(1 - g) AS BIGINT) AS n2
      |  FROM b
      |)
      |SELECT n1, n2, MAX(abs(c1 * n2 - c2 * n1)) AS ks_num,
      |  CAST(MAX(abs(c1 * n2 - c2 * n1)) AS DOUBLE)
      |    / (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE)) AS ks_stat
      |FROM cum, tot
      |GROUP BY n1, n2""".stripMargin

  /** Per-group OLS fit (slope, intercept, r²) of extended-price cents
    * on quantity by return flag — closed-form normal equations over
    * exact integer/decimal moment sums, so both engines land on the
    * identical doubles (every post-moment op is a correctly-rounded
    * IEEE ÷, √, ×). The Σy² moment needs DECIMAL(38,0) (cents² sums
    * pass 2⁶³ even at sf0.1); products of moments go through
    * decimal/HUGEINT. One partial-aggregated groupBy — no second pass,
    * no windows — so the fit costs a single shuffle of 6 numbers per
    * group at any scale. */
  def olsFit(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val s = Catalog.load(spark, dir, "lineitem")
      .select(col("l_returnflag"), col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"))
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("m"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
    val m = col("m").cast(dec)
    val num = (m * col("sxy").cast(dec) -
      col("sx").cast(dec) * col("sy").cast(dec)).cast("double")
    val dx = (m * col("sxx").cast(dec) -
      col("sx").cast(dec) * col("sx").cast(dec)).cast("double")
    val dy = (m * col("syy") -
      col("sy").cast(dec) * col("sy").cast(dec)).cast("double")
    val slope = num / dx
    val rho = num / (sqrt(dx) * sqrt(dy))
    s.select(col("l_returnflag"), col("m"), slope.as("slope"),
        ((col("sy").cast("double") - slope * col("sx").cast("double")) /
          col("m").cast("double")).as("intercept"),
        (rho * rho).as("r2"))
      .orderBy(col("l_returnflag"))
  }

  private val olsFitSql = {
    val num = hugeDbl("m * sxy - sx * sy")
    val dx = hugeDbl("m * sxx - sx * sx")
    val dy = hugeDbl("m * syy - sy * sy")
    s"""WITH s AS (
       |  SELECT l_returnflag, CAST(COUNT(*) AS HUGEINT) AS m,
       |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(y AS HUGEINT) * y) AS syy,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM (
       |    SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS x,
       |      CAST(round(l_extendedprice * 100) AS BIGINT) AS y
       |    FROM lineitem) GROUP BY 1
       |)
       |SELECT l_returnflag, CAST(m AS BIGINT) AS m,
       |  $num / $dx AS slope,
       |  (${hugeDbl("sy")} - ($num / $dx) * ${hugeDbl("sx")})
       |    / ${hugeDbl("m")} AS intercept,
       |  ($num / (sqrt($dx) * sqrt($dy)))
       |    * ($num / (sqrt($dx) * sqrt($dy))) AS r2
       |FROM s ORDER BY l_returnflag""".stripMargin
  }

  /** CUPED variance-reduced A/B readout (Deng et al. 2013, the
    * industry-standard experiment adjustment): per-customer pre-period
    * spend is the covariate x, post-period spend the outcome y,
    * θ = cov(x,y)/var(x) pooled, and each arm's adjusted mean is
    * ȳ_g − θ·(x̄_g − x̄). Everything is derived from exact integer-cent
    * moment sums (DECIMAL(38,0) for the squares), so both engines
    * evaluate the identical correctly-rounded IEEE DAG — no per-row
    * doubles. One groupBy(customer) + one groupBy(arm) + a broadcast
    * 1-row pooled join: two shuffles of tiny aggregates at any scale. */
  def cuped(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val split = 883612800000000L // 1998-01-01 UTC, epoch micros
    val per = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("c"),
        (unix_micros(col("o_orderdate")) < split).as("pre"))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("pre"), col("c")).otherwise(0L)).as("x"),
        sum(when(!col("pre"), col("c")).otherwise(0L)).as("y"))
      .withColumn("arm", (col("o_custkey") % 2).as("arm"))
      .localCheckpoint(false) // feeds pooled moments AND per-arm sums
    val pooled = per.agg(count(lit(1)).as("m"),
      sum(col("x")).as("sx"), sum(col("y")).as("sy"),
      sum((col("x").cast(dec) * col("x")).cast(dec)).as("sxx"),
      sum((col("x").cast(dec) * col("y")).cast(dec)).as("sxy"))
    val m = col("m").cast(dec)
    val theta = ((m * col("sxy") - col("sx").cast(dec) * col("sy").cast(dec))
      .cast("double") /
      (m * col("sxx") - col("sx").cast(dec) * col("sx").cast(dec))
        .cast("double"))
    val arms = per.groupBy(col("arm"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("sx_g"),
        sum(col("y")).as("sy_g"))
    arms.crossJoin(pooled)
      .select(col("arm"), col("n_g"), theta.as("theta"),
        (col("sy_g").cast("double") / col("n_g").cast("double"))
          .as("mean_y"),
        (col("sy_g").cast("double") / col("n_g").cast("double") -
          theta * (col("sx_g").cast("double") / col("n_g").cast("double") -
            col("sx").cast("double") / col("m").cast("double")))
          .as("mean_adj"))
      .orderBy(col("arm"))
  }

  private val cupedSql = {
    val theta = s"(${hugeDbl("m * sxy - sx * sy")} " +
      s"/ ${hugeDbl("m * sxx - sx * sx")})"
    s"""WITH per AS (
       |  SELECT o_custkey,
       |    CAST(SUM(CASE WHEN epoch_ns(o_orderdate) // 1000
       |        < 883612800000000 THEN
       |      CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS x,
       |    CAST(SUM(CASE WHEN epoch_ns(o_orderdate) // 1000
       |        >= 883612800000000 THEN
       |      CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
       |      AS BIGINT) AS y,
       |    o_custkey % 2 AS arm
       |  FROM orders GROUP BY o_custkey
       |), pooled AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS m,
       |    SUM(CAST(x AS HUGEINT)) AS sx, SUM(CAST(y AS HUGEINT)) AS sy,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(x AS HUGEINT) * y) AS sxy
       |  FROM per
       |), arms AS (
       |  SELECT arm, CAST(COUNT(*) AS BIGINT) AS n_g,
       |    CAST(SUM(x) AS BIGINT) AS sx_g, CAST(SUM(y) AS BIGINT) AS sy_g
       |  FROM per GROUP BY arm
       |)
       |SELECT arm, n_g, $theta AS theta,
       |  CAST(sy_g AS DOUBLE) / CAST(n_g AS DOUBLE) AS mean_y,
       |  CAST(sy_g AS DOUBLE) / CAST(n_g AS DOUBLE)
       |    - $theta * (CAST(sx_g AS DOUBLE) / CAST(n_g AS DOUBLE)
       |      - ${hugeDbl("sx")} / ${hugeDbl("m")}) AS mean_adj
       |FROM arms, pooled
       |ORDER BY arm""".stripMargin
  }

  /** Cramér's V association between customer nation and market segment
    * — the normalized-χ² "are these two categoricals independent"
    * audit (for a corpus: source × language balance). Each cell's χ²
    * term keeps the EXACT BIGINT deviation d = o·n − rt·ct and divides
    * once (d²/(n·rt·ct), all inputs < 2⁵³ so the doubles are exact);
    * the 125-cell sum goes through the decimal-cast order-independent
    * sum ([[graft.ops.Det]]). Three aggregates over counts. */
  def cramersV(spark: SparkSession, dir: String): DataFrame = {
    val cust = Catalog.load(spark, dir, "customer")
      .select(col("c_nationkey").cast("long").as("nk"),
        col("c_mktsegment").as("seg"))
    val cells = cust.groupBy(col("nk"), col("seg"))
      .agg(count(lit(1)).as("o"))
      .localCheckpoint(false) // feeds row/col totals and the cell sum
    val rows = cells.groupBy(col("nk")).agg(sum(col("o")).as("rt"))
    val cols = cells.groupBy(col("seg")).agg(sum(col("o")).as("ct"))
    val tot = cells.agg(sum(col("o")).as("n"),
      countDistinct(col("nk")).as("r"), countDistinct(col("seg")).as("c"))
    val d = (col("o") * col("n") - col("rt") * col("ct")).cast("double")
    val chi = cells.join(rows, "nk").join(cols, "seg").crossJoin(tot)
      .groupBy(col("n"), col("r"), col("c"))
      .agg(dsum(d * d /
        (col("n") * col("rt") * col("ct")).cast("double")).as("chi2"))
    chi.select(col("n"), col("r"), col("c"), col("chi2"),
      sqrt(col("chi2") / (col("n") * (least(col("r"), col("c")) - 1))
        .cast("double")).as("cramers_v"))
  }

  private val cramersVSql = {
    val term = "CAST(o * n - rt * ct AS DOUBLE) " +
      "* CAST(o * n - rt * ct AS DOUBLE) / CAST(n * rt * ct AS DOUBLE)"
    s"""WITH cells AS (
       |  SELECT CAST(c_nationkey AS BIGINT) AS nk, c_mktsegment AS seg,
       |    CAST(COUNT(*) AS BIGINT) AS o
       |  FROM customer GROUP BY 1, 2
       |), rws AS (
       |  SELECT nk, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY nk
       |), cls AS (
       |  SELECT seg, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY seg
       |), tot AS (
       |  SELECT CAST(SUM(o) AS BIGINT) AS n,
       |    CAST(COUNT(DISTINCT nk) AS BIGINT) AS r,
       |    CAST(COUNT(DISTINCT seg) AS BIGINT) AS c
       |  FROM cells
       |), chi AS (
       |  SELECT n, r, c, ${sqlSum(term)} AS chi2
       |  FROM cells JOIN rws USING (nk) JOIN cls USING (seg), tot
       |  GROUP BY n, r, c
       |)
       |SELECT n, r, c, chi2,
       |  sqrt(chi2 / CAST(n * (least(r, c) - 1) AS DOUBLE)) AS cramers_v
       |FROM chi""".stripMargin
  }

  /** Exponential-decay recency spend score per customer — the classic
    * recency-weighted engagement feature (and the decayed-count shape
    * behind streaming heavy-hitter decay). Weight halves every 30-day
    * bucket; the score stays an EXACT integer because each bucket's
    * cents·10⁶ is shifted right by the bucket index (floor division by
    * 2^k, arithmetic shift in both engines) before the sum — no
    * floating decay factor, no order sensitivity. Buckets cap at 20
    * (weight < 10⁻⁶ ≈ 0). One groupBy + TakeOrdered(100). */
  def decayScore(spark: SparkSession, dir: String): DataFrame = {
    val asofUs = 996710400000000L // 2001-08-02 UTC, epoch micros
    Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("cast(round(o_totalprice * 100) as bigint) * 1000000")
          .as("micro"),
        expr(s"least(($asofUs - unix_micros(o_orderdate)) " +
          "div 2592000000000, 20)").as("k"))
      .select(col("o_custkey"),
        expr("shiftright(micro, cast(k as int))").as("w"))
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_orders"), sum(col("w")).as("score_micro"))
      .orderBy(col("score_micro").desc, col("o_custkey"))
      .limit(100)
  }

  private val decayScoreSql =
    """WITH b AS (
      |  SELECT o_custkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) * 1000000 AS micro,
      |    least((996710400000000 - epoch_ns(o_orderdate) // 1000)
      |      // 2592000000000, 20) AS k
      |  FROM orders
      |)
      |SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(micro >> k) AS BIGINT) AS score_micro
      |FROM b GROUP BY o_custkey
      |ORDER BY score_micro DESC, o_custkey
      |LIMIT 100""".stripMargin

  /** Two-hop reach per node of the (sharper, qty ≥ 48) co-supply graph
    * — the friend-of-friend feature behind graph-based negative
    * sampling and influence scoring. 1-hop ∪ 2-hop distinct targets
    * per source; the 2-hop expansion is the one equi-join whose output
    * is Σ deg², which the tighter quantity filter bounds (the same
    * df-cap discipline the dedup joins use). */
  def twoHopReach(spark: SparkSession, dir: String): DataFrame = {
    val e0 = coSupplyEdges(spark, dir, 48)
    val both = e0.select(col("a").as("u"), col("b").as("v"))
      .union(e0.select(col("b").as("u"), col("a").as("v")))
      .localCheckpoint(false) // degree agg + both sides of the hop join
    val hop2 = both.as("x").join(both.as("y"),
        col("x.v") === col("y.u") && col("y.v") =!= col("x.u"))
      .select(col("x.u").as("u"), col("y.v").as("w"))
    val reach = both.select(col("u"), col("v").as("w")).union(hop2)
      .distinct().groupBy(col("u")).agg(count(lit(1)).as("reach2"))
    both.groupBy(col("u")).agg(count(lit(1)).as("deg"))
      .join(reach, "u")
      .select(col("u").as("supp"), col("deg"), col("reach2"))
      .orderBy(col("supp"))
  }

  private val twoHopReachSql =
    s"""WITH ${coSupplyEdgesSqlAt(48)}, both_ AS (
       |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
       |), h2 AS (
       |  SELECT x.u, y.v AS w
       |  FROM both_ x JOIN both_ y ON x.v = y.u AND y.v <> x.u
       |), r AS (
       |  SELECT u, CAST(COUNT(*) AS BIGINT) AS reach2 FROM (
       |    SELECT DISTINCT u, w FROM (
       |      SELECT u, v AS w FROM both_ UNION ALL SELECT u, w FROM h2))
       |  GROUP BY u
       |), d AS (
       |  SELECT u, CAST(COUNT(*) AS BIGINT) AS deg FROM both_ GROUP BY u
       |)
       |SELECT d.u AS supp, deg, reach2
       |FROM d JOIN r ON d.u = r.u
       |ORDER BY supp""".stripMargin

  /** Leave-one-out target encoding of customer nation by order spend —
    * the standard high-cardinality categorical feature that avoids
    * self-leakage: each row's encode is (Σ_group − own) / (n−1), so no
    * row sees its own target. Scale shape: per-group (sum, count) is a
    * tiny partial→final aggregate BROADCAST back onto the fact table —
    * map-only encode, no window sort over skewed groups. Exact integer
    * cents; the single final division is exact-rounded IEEE. */
  def targetEncode(spark: SparkSession, dir: String): DataFrame = {
    val j = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(Catalog.load(spark, dir, "customer")
        .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
    val grp = j.groupBy(col("c_nationkey"))
      .agg(sum(col("cents")).as("s"), count(lit(1)).as("n"))
    j.join(broadcast(grp), Seq("c_nationkey"))
      .select(col("o_orderkey"),
        col("c_nationkey").cast("long").as("nation"),
        when(col("n") > 1,
          (col("s") - col("cents")).cast("double") / (col("n") - 1))
          .as("loo_cents"))
      .orderBy(col("o_orderkey"))
  }

  private val targetEncodeSql =
    """WITH j AS (
      |  SELECT o_orderkey, c_nationkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |), g AS (
      |  SELECT c_nationkey, CAST(SUM(cents) AS BIGINT) AS s,
      |    COUNT(*) AS n
      |  FROM j GROUP BY 1
      |)
      |SELECT j.o_orderkey, CAST(j.c_nationkey AS BIGINT) AS nation,
      |  CASE WHEN g.n > 1
      |    THEN CAST(g.s - j.cents AS DOUBLE) / (g.n - 1) END AS loo_cents
      |FROM j JOIN g ON j.c_nationkey = g.c_nationkey
      |ORDER BY j.o_orderkey""".stripMargin

  /** Daily revenue in exact cents with a 1-based day ordinal — the
    * collapsed model-sized series the sequential-model queries
    * (q245 Holt, q247 conformal) consume driver-side. */
  private def dailyCents(spark: SparkSession, dir: String): Seq[Long] =
    Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(col("o_orderdate"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
      .orderBy(col("o_orderdate"))
      .select(col("cents")).collect().toSeq.map(_.getLong(0))

  private val dailyCentsSql =
    """SELECT CAST(row_number() OVER (ORDER BY o_orderdate) AS BIGINT) AS t,
      |    cents FROM (
      |  SELECT o_orderdate,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1)""".stripMargin

  /** Holt double exponential smoothing of daily revenue
    * ([[StatsOps.holtSmooth]], α=β=0.3 in micro-units). */
  def holt(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    StatsOps.holtSmooth(dailyCents(spark, dir))
      .toDF("t", "level_cents", "trend_cents")
      .orderBy(col("t"))
  }

  /** Recursive-CTE oracle: the same fixed-point recurrence, one row per
    * step; the sign-CASE division mirrors [[StatsOps.idiv]]. */
  private val holtSql =
    s"""WITH RECURSIVE daily AS (
       |  $dailyCentsSql
       |), hw(t, l, tr) AS (
       |  SELECT t, cents, CAST(0 AS BIGINT) FROM daily WHERE t = 1
       |  UNION ALL
       |  SELECT t, lnew,
       |    CAST(CASE WHEN tb < 0 THEN -((-tb) // 1000000)
       |      ELSE tb // 1000000 END AS BIGINT)
       |  FROM (
       |    SELECT t, lnew, 300000 * (lnew - lprev) + 700000 * trprev AS tb
       |    FROM (
       |      SELECT d.t AS t, hw.l AS lprev, hw.tr AS trprev,
       |        CAST(CASE WHEN (300000 * d.cents + 700000 * (hw.l + hw.tr)) < 0
       |          THEN -((-(300000 * d.cents + 700000 * (hw.l + hw.tr))) // 1000000)
       |          ELSE (300000 * d.cents + 700000 * (hw.l + hw.tr)) // 1000000
       |          END AS BIGINT) AS lnew
       |      FROM hw JOIN daily d ON d.t = hw.t + 1
       |    )
       |  )
       |)
       |SELECT t, l AS level_cents, tr AS trend_cents FROM hw
       |ORDER BY t""".stripMargin

  /** Right-to-be-forgotten cascade audit: a deletion-request key set
    * (synthetic: every 97th customer / user) propagated through the
    * foreign-key graph, reporting per-table purge counts BEFORE any
    * destructive write. Scale shape: the request set broadcasts; each
    * fact table answers with one left-join aggregate (no row ever
    * moves); lineitem cascades through the purged-order keys. */
  def deletePropagation(spark: SparkSession, dir: String): DataFrame = {
    val cust = Catalog.load(spark, dir, "customer")
    val orders = Catalog.load(spark, dir, "orders")
    val li = Catalog.load(spark, dir, "lineitem")
    val ev = Catalog.load(spark, dir, "events")
    val delC = cust.filter(col("c_custkey") % 97 === 0)
      .select(col("c_custkey").as("k"))
    val delO = orders.join(broadcast(delC), col("o_custkey") === col("k"))
      .select(col("o_orderkey").as("ok"))
    def report(name: String, total: Column, purged: Column,
        from: DataFrame): DataFrame =
      from.agg(total.as("total_rows"), purged.as("purged"))
        .select(lit(name).as("tbl"), col("total_rows"), col("purged"),
          (col("total_rows") - col("purged")).as("surviving"))
    Seq(
      report("customer", count(lit(1)),
        count(when(col("c_custkey") % 97 === 0, 1)), cust),
      report("orders", count(lit(1)), count(col("k")),
        orders.join(broadcast(delC), col("o_custkey") === col("k"), "left")),
      report("lineitem", count(lit(1)), count(col("ok")),
        li.join(delO, col("l_orderkey") === col("ok"), "left")),
      report("events", count(lit(1)),
        count(when(col("user_id") % 97 === 0, 1)), ev))
      .reduce(_.unionByName(_))
      .orderBy(col("tbl"))
  }

  private val deletePropagationSql =
    """WITH delc AS (
      |  SELECT c_custkey AS k FROM customer WHERE c_custkey % 97 = 0
      |), delo AS (
      |  SELECT o_orderkey AS ok FROM orders
      |  JOIN delc ON o_custkey = k
      |)
      |SELECT * FROM (
      |  SELECT 'customer' AS tbl, COUNT(*) AS total_rows,
      |    COUNT(CASE WHEN c_custkey % 97 = 0 THEN 1 END) AS purged,
      |    COUNT(*) - COUNT(CASE WHEN c_custkey % 97 = 0 THEN 1 END)
      |      AS surviving
      |  FROM customer
      |  UNION ALL
      |  SELECT 'orders', COUNT(*), COUNT(k), COUNT(*) - COUNT(k)
      |  FROM orders LEFT JOIN delc ON o_custkey = k
      |  UNION ALL
      |  SELECT 'lineitem', COUNT(*), COUNT(ok), COUNT(*) - COUNT(ok)
      |  FROM lineitem LEFT JOIN delo ON l_orderkey = ok
      |  UNION ALL
      |  SELECT 'events', COUNT(*),
      |    COUNT(CASE WHEN user_id % 97 = 0 THEN 1 END),
      |    COUNT(*) - COUNT(CASE WHEN user_id % 97 = 0 THEN 1 END)
      |  FROM events
      |) ORDER BY tbl""".stripMargin

  /** Split-conformal prediction-interval calibration on daily revenue:
    * fit a linear trend (exact integer closed form, BigInt — the same
    * rational OLS as q228 but with no floating point anywhere), take
    * the 90% quantile of absolute calibration residuals (odd days) as
    * the interval half-width, and report empirical coverage on the
    * held-out even days. Distributed work is ONLY the daily collapse;
    * the model math runs on the bounded per-day series. */
  def conformalBand(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val xs = dailyCents(spark, dir)
    // degenerate series: no residual variance is defined (d = 0 below);
    // the oracle's q CTE is likewise empty, so 0 rows is the parity answer
    if (xs.length < 2)
      return Seq.empty[(Long, Long, Long, Long, Double)]
        .toDF("n_calib", "n_test", "q_mic", "covered", "coverage")
    val n = BigInt(xs.length)
    val ts = (1 to xs.length).map(BigInt(_))
    val xb = xs.map(BigInt(_))
    val tSum = ts.sum; val xSum = xb.sum
    val stx = ts.zip(xb).map { case (a, b) => a * b }.sum
    val stt = ts.map(t => t * t).sum
    val snum = n * stx - tSum * xSum
    val d = n * stt - tSum * tSum
    val nd = n * d
    def rMic(t: BigInt, x: BigInt): BigInt =
      ((x * nd - xSum * d - snum * (n * t - tSum)).abs * 1000000) / nd
    val resid = ts.zip(xb).map { case (t, x) => (t, rMic(t, x)) }
    val calib = resid.collect { case (t, r) if t % 2 == 1 => r }.sorted
    val test = resid.collect { case (t, r) if t % 2 == 0 => r }
    val k = ((9 * (calib.length + 1) + 9) / 10).min(calib.length)
    val qMic = calib(k - 1)
    val covered = test.count(_ <= qMic)
    Seq((calib.length.toLong, test.length.toLong, qMic.toLong,
      covered.toLong, covered.toDouble / test.length))
      .toDF("n_calib", "n_test", "q_mic", "covered", "coverage")
  }

  private val conformalBandSql =
    s"""WITH daily AS (
       |  $dailyCentsSql
       |), s AS (
       |  SELECT COUNT(*) AS n, CAST(SUM(t) AS HUGEINT) AS tt,
       |    CAST(SUM(cents) AS HUGEINT) AS x,
       |    CAST(SUM(t * cents) AS HUGEINT) AS stx,
       |    CAST(SUM(t * t) AS HUGEINT) AS stt
       |  FROM daily
       |), m AS (
       |  SELECT n, tt, x, n * stx - tt * x AS snum,
       |    n * stt - tt * tt AS d
       |  FROM s
       |), r AS (
       |  SELECT t,
       |    ABS(CAST(cents AS HUGEINT) * n * d - x * d
       |      - snum * (n * t - tt)) * 1000000 // (CAST(n AS HUGEINT) * d)
       |      AS r_mic
       |  FROM daily, m
       |), calib AS (
       |  SELECT r_mic, row_number() OVER (ORDER BY r_mic) AS rn
       |  FROM r WHERE t % 2 = 1
       |), kk AS (
       |  SELECT LEAST((9 * (COUNT(*) + 1) + 9) // 10, COUNT(*)) AS k,
       |    COUNT(*) AS n_calib
       |  FROM calib
       |), q AS (
       |  SELECT CAST(c.r_mic AS BIGINT) AS q_mic, kk.n_calib
       |  FROM calib c, kk WHERE c.rn = kk.k
       |)
       |SELECT q.n_calib,
       |  (SELECT COUNT(*) FROM r WHERE t % 2 = 0) AS n_test,
       |  q.q_mic,
       |  (SELECT COUNT(*) FROM r WHERE t % 2 = 0 AND r_mic <= q.q_mic)
       |    AS covered,
       |  CAST((SELECT COUNT(*) FROM r WHERE t % 2 = 0 AND r_mic <= q.q_mic)
       |    AS DOUBLE) /
       |    (SELECT COUNT(*) FROM r WHERE t % 2 = 0) AS coverage
       |FROM q""".stripMargin

  /** Resource-allocation link prediction on the co-supply graph
    * ([[graft.ops.GraphOps.linkPredict]]): which supplier pairs that
    * never co-supplied are most likely to — scored by shared-neighbor
    * inverse degree in exact micro-units. */
  def linkPredictQ(spark: SparkSession, dir: String): DataFrame =
    graft.ops.GraphOps.linkPredict(coSupplyEdges(spark, dir), topK = 50)
      .select(col("x").as("supp_a"), col("y").as("supp_b"),
        col("common_n"), col("score_micro"))

  private val linkPredictSql =
    s"""WITH $coSupplyEdgesSql, both_ AS (
       |  SELECT a AS u, b AS v FROM e UNION ALL SELECT b, a FROM e
       |), deg AS (
       |  SELECT u, CAST(COUNT(*) AS BIGINT) AS d FROM both_ GROUP BY u
       |), wedge AS (
       |  SELECT l.u AS x, r.v AS y, l.v AS z
       |  FROM both_ l JOIN both_ r ON l.v = r.u AND l.u < r.v
       |  WHERE NOT EXISTS (SELECT 1 FROM both_ b
       |                    WHERE b.u = l.u AND b.v = r.v)
       |)
       |SELECT w.x AS supp_a, w.y AS supp_b,
       |  CAST(COUNT(*) AS BIGINT) AS common_n,
       |  CAST(SUM(1000000 // dg.d) AS BIGINT) AS score_micro
       |FROM wedge w JOIN deg dg ON w.z = dg.u
       |GROUP BY 1, 2
       |ORDER BY score_micro DESC, supp_a, supp_b LIMIT 50""".stripMargin

  /** Rendezvous (highest-random-weight) shard-assignment audit over the
    * document corpus: each doc goes to the shard with the max keyed
    * hash; growing the ring 8 → 9 shards must move ONLY the docs whose
    * new shard wins — ~1/9 of the corpus, the whole point of HRW over
    * mod-N (which reshuffles ~8/9). The hash is squared after the
    * multiplicative mix so per-doc shard scores are not an arithmetic
    * progression (a linear mix's argmax is lattice-biased); max packs
    * (h·16 + shard) into one BIGINT so the argmax is ONE integer max —
    * no window, no sort, one aggregate over a 9× explode. */
  def rendezvousShard(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    val perDoc = Catalog.load(spark, dir, "documents")
      .select(col("doc_id"), explode(sequence(lit(0), lit(8))).as("s"))
      .withColumn("h1",
        pmod((pmod(col("doc_id"), lit(p)) + col("s") * lit(1000003L))
          * lit(2654435761L), lit(p)))
      .withColumn("packed", pmod(col("h1") * col("h1"), lit(p)) * 16
        + col("s"))
      .groupBy(col("doc_id"))
      .agg(pmod(max(when(col("s") < 8, col("packed"))), lit(16L))
          .as("shard8"),
        pmod(max(col("packed")), lit(16L)).as("shard9"))
    val c8 = perDoc.groupBy(col("shard8").as("shard"))
      .agg(count(lit(1)).as("cnt8"))
    val c9 = perDoc.groupBy(col("shard9").as("shard"))
      .agg(count(lit(1)).as("cnt9"),
        sum(when(col("shard8") =!= col("shard9"), 1L).otherwise(0L))
          .as("moved_in"))
    c8.join(c9, Seq("shard"), "full_outer")
      .select(col("shard"), coalesce(col("cnt8"), lit(0L)).as("cnt8"),
        coalesce(col("cnt9"), lit(0L)).as("cnt9"),
        coalesce(col("moved_in"), lit(0L)).as("moved_in"))
      .orderBy(col("shard"))
  }

  private val rendezvousShardSql =
    """WITH h AS (
      |  SELECT doc_id, s,
      |    (((doc_id % 1000000007) + s * 1000003) * 2654435761)
      |      % 1000000007 AS h1
      |  FROM read_parquet_documents, unnest(range(0, 9)) AS u(s)
      |), pk AS (
      |  SELECT doc_id, s, ((h1 * h1) % 1000000007) * 16 + s AS packed
      |  FROM h
      |), a AS (
      |  SELECT doc_id,
      |    MAX(CASE WHEN s < 8 THEN packed END) % 16 AS shard8,
      |    MAX(packed) % 16 AS shard9
      |  FROM pk GROUP BY doc_id
      |), c8 AS (
      |  SELECT shard8 AS shard, CAST(COUNT(*) AS BIGINT) AS cnt8
      |  FROM a GROUP BY 1
      |), c9 AS (
      |  SELECT shard9 AS shard, CAST(COUNT(*) AS BIGINT) AS cnt9,
      |    CAST(SUM(CASE WHEN shard8 <> shard9 THEN 1 ELSE 0 END)
      |      AS BIGINT) AS moved_in
      |  FROM a GROUP BY 1
      |)
      |SELECT COALESCE(c8.shard, c9.shard) AS shard,
      |  COALESCE(cnt8, 0) AS cnt8, COALESCE(cnt9, 0) AS cnt9,
      |  COALESCE(moved_in, 0) AS moved_in
      |FROM c8 FULL OUTER JOIN c9 ON c8.shard = c9.shard
      |ORDER BY shard""".stripMargin
      .replace("read_parquet_documents", "documents")

  /** Kendall τ-b between quantity and price over a DETERMINISTIC
    * 2000-row hash-ranked sample of lineitem. Concordant / discordant /
    * tie counts are exact integers from the rn<rn2 pair join (bounded
    * 2M pairs regardless of corpus size — the sample IS the scale
    * contract; the exact all-pairs form is O(n²) and has no
    * distributed merge-sort shape worth the complexity). τ-b itself is
    * one mirrored IEEE closed form over the integer counts. */
  def kendallTau(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val p = 1000000007L
    val r = Catalog.load(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("x"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("y"),
        pmod(pmod(col("l_orderkey"), lit(p)) * lit(2654435761L)
          + col("l_linenumber"), lit(p)).as("hk"),
        col("l_orderkey"), col("l_linenumber"))
      .withColumn("rn", row_number().over(
        Window.orderBy(col("hk"), col("l_orderkey"), col("l_linenumber")))
        .cast("long"))
      .filter(col("rn") <= 2000)
      .select(col("rn"), col("x"), col("y"))
      .localCheckpoint(false) // both sides of the 2M-row pair join
    val pairs = r.as("a").join(r.as("b"), col("a.rn") < col("b.rn"))
      .select((col("a.x") - col("b.x")).as("dx"),
        (col("a.y") - col("b.y")).as("dy"))
    pairs.agg(
        sum(when(col("dx") * col("dy") > 0, 1L).otherwise(0L))
          .as("concordant"),
        sum(when(col("dx") * col("dy") < 0, 1L).otherwise(0L))
          .as("discordant"),
        sum(when(col("dx") === 0, 1L).otherwise(0L)).as("ties_x"),
        sum(when(col("dy") === 0, 1L).otherwise(0L)).as("ties_y"),
        count(lit(1)).as("n0"))
      .select(col("n0"), col("concordant"), col("discordant"),
        col("ties_x"), col("ties_y"),
        ((col("concordant") - col("discordant")).cast("double") /
          (sqrt((col("n0") - col("ties_x")).cast("double")) *
            sqrt((col("n0") - col("ties_y")).cast("double"))))
          .as("tau_b"))
  }

  private val kendallTauSql =
    """WITH r0 AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS x,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS y,
      |    ((l_orderkey % 1000000007) * 2654435761 + l_linenumber)
      |      % 1000000007 AS hk,
      |    l_orderkey, l_linenumber
      |  FROM lineitem
      |), r AS (
      |  SELECT CAST(row_number()
      |      OVER (ORDER BY hk, l_orderkey, l_linenumber) AS BIGINT)
      |      AS rn, x, y
      |  FROM r0 QUALIFY rn <= 2000
      |), pr AS (
      |  SELECT a.x - b.x AS dx, a.y - b.y AS dy
      |  FROM r a JOIN r b ON a.rn < b.rn
      |), s AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN dx * dy > 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS concordant,
      |    CAST(SUM(CASE WHEN dx * dy < 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS discordant,
      |    CAST(SUM(CASE WHEN dx = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ties_x,
      |    CAST(SUM(CASE WHEN dy = 0 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS ties_y,
      |    CAST(COUNT(*) AS BIGINT) AS n0
      |  FROM pr
      |)
      |SELECT n0, concordant, discordant, ties_x, ties_y,
      |  CAST(concordant - discordant AS DOUBLE)
      |    / (sqrt(CAST(n0 - ties_x AS DOUBLE))
      |       * sqrt(CAST(n0 - ties_y AS DOUBLE))) AS tau_b
      |FROM s""".stripMargin

  /** Seeded permutation test for the URGENT-vs-rest mean order value
    * gap: 200 deterministic hash permutations of the group labels; the
    * p-value counts permuted |mean diff| ≥ observed via the EXACT
    * cross-multiplied rational comparison |s1·n0 − s0·n1| in
    * DECIMAL(38,0) — no per-rep float means, so every engine counts
    * the same reps. One 200× label explode + one aggregate per rep;
    * the explode is map-side and the rollup shuffles 200 rows. */
  def permutationTest(spark: SparkSession, dir: String): DataFrame = {
    val p = 1000000007L
    val dec = "decimal(38,0)"
    val b = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey").as("k"),
        expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("g"))
      .localCheckpoint(false) // observed stat + 200-rep explode
    val obs = b.agg(
      sum(when(col("g") === 1, col("v")).otherwise(0L)).as("s1"),
      sum(col("g")).as("n1"),
      sum(when(col("g") === 0, col("v")).otherwise(0L)).as("s0"),
      sum(lit(1L) - col("g")).as("n0"))
    val perm = b
      .select(col("k"), col("v"), explode(sequence(lit(1), lit(200)))
        .as("r"))
      .withColumn("h1",
        pmod((pmod(col("k"), lit(p)) + col("r") * lit(1000003L))
          * lit(2654435761L), lit(p)))
      .withColumn("gp", pmod(col("h1") * col("h1"), lit(p)) % 2)
      .groupBy(col("r"))
      .agg(sum(when(col("gp") === 1, col("v")).otherwise(0L)).as("s1p"),
        sum(col("gp")).as("n1p"),
        sum(when(col("gp") === 0, col("v")).otherwise(0L)).as("s0p"),
        sum(lit(1L) - col("gp")).as("n0p"))
    perm.crossJoin(obs)
      .select(col("r"), col("s1"), col("n1"), col("s0"), col("n0"),
        when(
          abs(col("s1p").cast(dec) * col("n0p") -
            col("s0p").cast(dec) * col("n1p")) *
            (col("n1").cast(dec) * col("n0")) >=
            abs(col("s1").cast(dec) * col("n0") -
              col("s0").cast(dec) * col("n1")) *
              (col("n1p").cast(dec) * col("n0p")), 1L).otherwise(0L)
          .as("ge"))
      .groupBy(col("s1"), col("n1"), col("s0"), col("n0"))
      .agg(sum(col("ge")).as("n_ge"), count(lit(1)).as("reps"))
      .select(col("n1"), col("n0"), col("s1"), col("s0"), col("reps"),
        col("n_ge"),
        ((col("n_ge") + 1).cast("double") /
          (col("reps") + 1).cast("double")).as("p_value"))
  }

  private val permutationTestSql =
    """WITH b AS (
      |  SELECT o_orderkey AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
      |  FROM orders
      |), obs AS (
      |  SELECT CAST(SUM(CASE WHEN g = 1 THEN v ELSE 0 END) AS BIGINT)
      |      AS s1,
      |    CAST(SUM(g) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN g = 0 THEN v ELSE 0 END) AS BIGINT) AS s0,
      |    CAST(SUM(1 - g) AS BIGINT) AS n0
      |  FROM b
      |), h AS (
      |  SELECT r, v,
      |    ((((k % 1000000007) + r * 1000003) * 2654435761)
      |      % 1000000007) AS h1
      |  FROM b, unnest(range(1, 201)) AS u(r)
      |), perm AS (
      |  SELECT r,
      |    CAST(SUM(CASE WHEN (h1 * h1) % 1000000007 % 2 = 1
      |      THEN v ELSE 0 END) AS BIGINT) AS s1p,
      |    CAST(SUM((h1 * h1) % 1000000007 % 2) AS BIGINT) AS n1p,
      |    CAST(SUM(CASE WHEN (h1 * h1) % 1000000007 % 2 = 0
      |      THEN v ELSE 0 END) AS BIGINT) AS s0p,
      |    CAST(SUM(1 - (h1 * h1) % 1000000007 % 2) AS BIGINT) AS n0p
      |  FROM h GROUP BY r
      |)
      |SELECT n1, n0, s1, s0,
      |  CAST(COUNT(*) AS BIGINT) AS reps,
      |  CAST(SUM(CASE WHEN
      |    ABS(CAST(s1p AS HUGEINT) * n0p - CAST(s0p AS HUGEINT) * n1p)
      |      * (CAST(n1 AS HUGEINT) * n0) >=
      |    ABS(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
      |      * (CAST(n1p AS HUGEINT) * n0p)
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_ge,
      |  CAST(CAST(SUM(CASE WHEN
      |    ABS(CAST(s1p AS HUGEINT) * n0p - CAST(s0p AS HUGEINT) * n1p)
      |      * (CAST(n1 AS HUGEINT) * n0) >=
      |    ABS(CAST(s1 AS HUGEINT) * n0 - CAST(s0 AS HUGEINT) * n1)
      |      * (CAST(n1p AS HUGEINT) * n0p)
      |    THEN 1 ELSE 0 END) + 1 AS BIGINT) AS DOUBLE)
      |    / CAST(CAST(COUNT(*) + 1 AS BIGINT) AS DOUBLE) AS p_value
      |FROM perm, obs
      |GROUP BY n1, n0, s1, s0""".stripMargin

  /** Holt–Winters triple smoothing of daily revenue
    * ([[StatsOps.holtWinters]], period 7, α=.3 β=.1 γ=.2 in
    * micro-units) — the seasonal extension of q245. */
  def holtWintersQ(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    StatsOps.holtWinters(dailyCents(spark, dir))
      .toDF("t", "level_cents", "trend_cents", "seasonal_cents")
      .orderBy(col("t"))
  }

  /** The sign-CASE integer division mirroring [[StatsOps.idiv]]. */
  private def sqlIdiv(e: String): String =
    s"CAST(CASE WHEN ($e) < 0 THEN -((-($e)) // 1000000) " +
      s"ELSE ($e) // 1000000 END AS BIGINT)"

  /** Recursive-CTE oracle with the 7-slot seasonal state carried as
    * seven rotating columns; every step is the same idiv fixed-point
    * arithmetic as the Scala recurrence. */
  private val holtWintersSql = {
    val sCols = (0 until 7).map(i => s"s$i").mkString(", ")
    val zeros = (0 until 7).map(_ => "CAST(0 AS BIGINT)").mkString(", ")
    val sOldCase = (0 until 7)
      .map(i => s"WHEN hw.t % 7 = $i THEN hw.s$i")
      .mkString("CASE ", " ", " END")
    val passS = (0 until 7).map(i => s"hw.s$i AS s$i").mkString(", ")
    val rot = (0 until 7)
      .map(i => s"CASE WHEN p = $i THEN snew ELSE s$i END")
      .mkString(", ")
    val lnew = sqlIdiv("300000 * (x - sold) + 700000 * (lprev + trprev)")
    val trnew = sqlIdiv("100000 * (lnew - lprev) + 900000 * trprev")
    val snew = sqlIdiv("200000 * (x - lnew) + 800000 * sold")
    val seasOut = (0 until 7)
      .map(i => s"WHEN (t - 1) % 7 = $i THEN s$i")
      .mkString("CASE ", " ", " END")
    s"""WITH RECURSIVE daily AS (
       |  $dailyCentsSql
       |), hw(t, l, tr, $sCols) AS (
       |  SELECT t, cents, CAST(0 AS BIGINT), $zeros
       |  FROM daily WHERE t = 1
       |  UNION ALL
       |  SELECT t, lnew, $trnew, $rot
       |  FROM (
       |    SELECT *, $snew AS snew FROM (
       |      SELECT *, $lnew AS lnew FROM (
       |        SELECT d.t AS t, hw.t % 7 AS p, d.cents AS x,
       |          hw.l AS lprev, hw.tr AS trprev, $sOldCase AS sold,
       |          $passS
       |        FROM hw JOIN daily d ON d.t = hw.t + 1
       |      )
       |    )
       |  )
       |)
       |SELECT t, l AS level_cents, tr AS trend_cents,
       |  $seasOut AS seasonal_cents
       |FROM hw ORDER BY t""".stripMargin
  }

  /** Two-sample Cramér–von Mises criterion (URGENT vs LOW order
    * values) — q227's KS sibling that integrates the SQUARED ECDF gap
    * instead of taking its max, so it sees distributional differences
    * a single extreme point hides. The sum Σ (d1+d2)·(c1·n2 − c2·n1)²
    * is exact DECIMAL(38,0) (the gap alone can reach n1·n2 ≈ 5·10⁹ at
    * sf0.1 — squared it overflows BIGINT, hence decimal); the statistic
    * divides once at the end through the Det.scala exact-decimal→double
    * recipe. Same scale shape as KS: one aggregate per distinct value,
    * one cumulative window, one rollup. */
  def cvmTest(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    val b = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderpriority").isin("1-URGENT", "5-LOW"))
      .select(expr("cast(round(o_totalprice * 100) as bigint)").as("v"),
        when(col("o_orderpriority") === "1-URGENT", 1L).otherwise(0L)
          .as("g"))
    val per = b.groupBy(col("v"))
      .agg(sum(col("g")).as("d1"), sum(lit(1L) - col("g")).as("d2"))
    // ECDF prefixes via GlobalRank's exact distributed running sum —
    // same fused one-shuffle shape as q227's KS rewrite
    val cum = graft.ops.GlobalRank.withRunningSums(per, Seq(col("v")),
      Seq((col("d1"), "c1"), (col("d2"), "c2")))
    val tot = b.agg(sum(col("g")).as("n1"),
      sum(lit(1L) - col("g")).as("n2"))
    cum.crossJoin(tot)
      .groupBy(col("n1"), col("n2"))
      .agg(sum(((col("d1") + col("d2")).cast(dec) *
        (col("c1") * col("n2") - col("c2") * col("n1")).cast(dec) *
        (col("c1") * col("n2") - col("c2") * col("n1")).cast(dec)))
        .as("s"))
      .select(col("n1"), col("n2"),
        (col("s").cast("double") /
          ((col("n1") + col("n2")).cast(dec) *
            (col("n1").cast(dec) * col("n2")) *
            (col("n1").cast(dec) * col("n2"))).cast("double"))
          .as("cvm_stat"))
  }

  private val cvmTestSql =
    s"""WITH b AS (
       |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
       |    CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END AS g
       |  FROM orders WHERE o_orderpriority IN ('1-URGENT', '5-LOW')
       |), per AS (
       |  SELECT v, CAST(SUM(g) AS BIGINT) AS d1,
       |    CAST(SUM(1 - g) AS BIGINT) AS d2
       |  FROM b GROUP BY v
       |), cum AS (
       |  SELECT d1, d2,
       |    CAST(SUM(d1) OVER (ORDER BY v) AS BIGINT) AS c1,
       |    CAST(SUM(d2) OVER (ORDER BY v) AS BIGINT) AS c2
       |  FROM per
       |), tot AS (
       |  SELECT CAST(SUM(g) AS BIGINT) AS n1,
       |    CAST(SUM(1 - g) AS BIGINT) AS n2
       |  FROM b
       |), s AS (
       |  SELECT n1, n2,
       |    SUM(CAST(d1 + d2 AS HUGEINT)
       |      * (c1 * CAST(n2 AS HUGEINT) - c2 * CAST(n1 AS HUGEINT))
       |      * (c1 * CAST(n2 AS HUGEINT) - c2 * CAST(n1 AS HUGEINT)))
       |      AS s
       |  FROM cum, tot GROUP BY n1, n2
       |)
       |SELECT n1, n2,
       |  ${hugeDbl("s")} /
       |    ${hugeDbl("CAST(n1 + n2 AS HUGEINT) * (CAST(n1 AS HUGEINT) * n2) * (CAST(n1 AS HUGEINT) * n2)")}
       |    AS cvm_stat
       |FROM s""".stripMargin

  /** Quantity-weighted median order price per return flag: the
    * smallest value whose cumulative weight reaches half the total —
    * exact integers end to end (2·cumw ≥ totw avoids any division).
    * One aggregate per (flag, value), one cumulative window per flag,
    * one min rollup; the per-flag window range-partitions at scale. */
  def weightedMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val per = Catalog.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("flag"),
        expr("cast(round(l_extendedprice * 100) as bigint)").as("v"),
        col("l_quantity").cast("long").as("w"))
      .groupBy(col("flag"), col("v")).agg(sum(col("w")).as("dw"))
    val cum = per
      .withColumn("cw", sum(col("dw")).over(
        Window.partitionBy(col("flag")).orderBy(col("v"))))
      .withColumn("tw", sum(col("dw")).over(Window.partitionBy(col("flag"))))
    cum.filter(col("cw") * 2 >= col("tw"))
      .groupBy(col("flag"))
      .agg(min(col("v")).as("wmedian_cents"), max(col("tw")).as("total_w"))
      .orderBy(col("flag"))
  }

  private val weightedMedianSql =
    """WITH per AS (
      |  SELECT l_returnflag AS flag,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS v,
      |    CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS dw
      |  FROM lineitem GROUP BY 1, 2
      |), cum AS (
      |  SELECT flag, v,
      |    CAST(SUM(dw) OVER (PARTITION BY flag ORDER BY v) AS BIGINT)
      |      AS cw,
      |    CAST(SUM(dw) OVER (PARTITION BY flag) AS BIGINT) AS tw
      |  FROM per
      |)
      |SELECT flag, CAST(MIN(v) AS BIGINT) AS wmedian_cents,
      |  CAST(MAX(tw) AS BIGINT) AS total_w
      |FROM cum WHERE cw * 2 >= tw
      |GROUP BY flag ORDER BY flag""".stripMargin

  // ---- table profiling (data-quality audit) ----------------------------

  /** One-pass column profile of `orders` — the schema-drift / data-
    * quality audit an ingest runs before publishing: per column, the
    * null count and exact distinct count, plus the table row count. ALL
    * statistics come from a single aggregate over one scan (Spark plans
    * the multi-distinct via expand, still one pass over the parquet);
    * the unpivot to one-row-per-column happens on the 1-row aggregate.
    * Exact integers only — no value rendering, so no cross-engine
    * formatting hazards. */
  def columnProfile(spark: SparkSession, dir: String): DataFrame = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = count(lit(1)).as("n_rows") +: cols.flatMap(c => Seq(
      sum(when(col(c).isNull, 1L).otherwise(0L)).cast("long").as(s"nn_$c"),
      countDistinct(col(c)).as(s"nd_$c")))
    val one = Catalog.load(spark, dir, "orders")
      .agg(aggs.head, aggs.tail: _*)
    val stack = cols.map(c => s"'$c', nn_$c, nd_$c").mkString(", ")
    one.selectExpr("n_rows",
        s"stack(${cols.length}, $stack) as (col_name, n_nulls, n_distinct)")
      .select(col("col_name"), col("n_rows"), col("n_nulls"),
        col("n_distinct"))
      .orderBy(col("col_name"))
  }

  private val columnProfileSql = {
    val cols = Seq("o_orderkey", "o_custkey", "o_orderstatus",
      "o_totalprice", "o_orderdate", "o_orderpriority")
    val aggs = cols.map(c =>
      s"CAST(SUM(CASE WHEN $c IS NULL THEN 1 ELSE 0 END) AS BIGINT) " +
        s"AS nn_$c, CAST(COUNT(DISTINCT $c) AS BIGINT) AS nd_$c")
      .mkString(",\n    ")
    val arms = cols.map(c =>
      s"SELECT '$c' AS col_name, n_rows, nn_$c AS n_nulls, nd_$c AS n_distinct FROM a")
      .mkString("\n  UNION ALL ")
    s"""WITH a AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
       |    $aggs
       |  FROM orders
       |)
       |SELECT col_name, n_rows, n_nulls, n_distinct FROM (
       |  $arms
       |) u ORDER BY col_name""".stripMargin
  }

  // ---- bloom-prefiltered semi join -------------------------------------

  /** Semi join with a broadcast Bloom prefilter on the probe side — the
    * shape that keeps a 100 TB probe⋉dim join cheap: the build side's
    * keys are folded into a ~1 MB Bloom sketch (distributed aggregate,
    * driver holds only the sketch), broadcast, and applied BEFORE the
    * exchange, so only rows that might match are ever shuffled. The
    * exact semi join afterwards removes the Bloom's false positives, so
    * the result is bit-identical to a plain semi join (the oracle) —
    * the Bloom changes the data volume, never the answer. Catalyst's
    * runtime bloom filter does this automatically under AQE for some
    * plans; this operator is the explicit, always-on version. */
  def bloomSemiJoin(spark: SparkSession, dir: String): DataFrame = {
    val rich = Catalog.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000.0)
      .select(col("o_orderkey"))
    val nKeys = rich.count()
    val li = Catalog.load(spark, dir, "lineitem")
    // zero build keys ⇒ empty semi join; stat.bloomFilter over zero rows
    // yields a bit-array-less sketch that can't be probed, so short-circuit
    val prefiltered =
      if (nKeys == 0L) li.filter(lit(false))
      else {
        val bloom = rich.stat.bloomFilter("o_orderkey", nKeys, 0.01)
        val bc = spark.sparkContext.broadcast(bloom)
        val mightContain = udf((k: Long) => bc.value.mightContainLong(k))
        li.filter(mightContain(col("l_orderkey"))) // pre-shuffle prune
      }
    prefiltered
      .join(rich, col("l_orderkey") === col("o_orderkey"), "left_semi")
      .groupBy(col("l_returnflag"))
      .agg(count(lit(1)).as("n"),
        sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
          .cast("long").as("rev_c"))
      .orderBy(col("l_returnflag"))
  }

  private val bloomSemiJoinSql =
    """SELECT l_returnflag, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_c
      |FROM lineitem
      |WHERE l_orderkey IN
      |  (SELECT o_orderkey FROM orders WHERE o_totalprice > 300000)
      |GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- order-to-ship latency profile -----------------------------------

  /** Fulfilment latency (order date → line ship date) per order
    * priority: exact integer day arithmetic on DATE-truncated
    * timestamps (both engines subtract calendar dates, so no
    * day-boundary ambiguity), BIGINT sums, one mirrored division for
    * the mean. One shuffle on the join key, one small rollup. */
  def shipLatency(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderpriority"),
        to_date(col("o_orderdate")).as("od"))
    val l = Catalog.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), to_date(col("l_shipdate")).as("sd"))
    l.join(o, col("l_orderkey") === col("o_orderkey"))
      .select(col("o_orderpriority"),
        datediff(col("sd"), col("od")).cast("long").as("days"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        min(col("days")).as("min_days"), max(col("days")).as("max_days"),
        sum(col("days")).cast("long").as("sum_days"))
      .select(col("o_orderpriority"), col("n"), col("min_days"),
        col("max_days"), col("sum_days"),
        (col("sum_days").cast("double") / col("n").cast("double"))
          .as("avg_days"))
      .orderBy(col("o_orderpriority"))
  }

  private val shipLatencySql =
    """WITH t AS (
      |  SELECT o.o_orderpriority,
      |    CAST(CAST(l.l_shipdate AS DATE) - CAST(o.o_orderdate AS DATE)
      |      AS BIGINT) AS days
      |  FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
      |)
      |SELECT o_orderpriority, CAST(COUNT(*) AS BIGINT) AS n,
      |  CAST(MIN(days) AS BIGINT) AS min_days,
      |  CAST(MAX(days) AS BIGINT) AS max_days,
      |  CAST(SUM(days) AS BIGINT) AS sum_days,
      |  CAST(SUM(days) AS DOUBLE) / COUNT(*) AS avg_days
      |FROM t GROUP BY 1 ORDER BY 1""".stripMargin

  // ---- shuffle-partition skew audit ------------------------------------

  /** Hash-partition skew audit: rows and distinct orders per modulo-32
    * bucket of the join key, with each bucket's load factor vs the even
    * split (skew = n·32/total, one mirrored division). This is the
    * profile a planner consults before choosing salting/AQE skew-join
    * for a key — at 100 TB a 5× hot bucket is the difference between a
    * straggler-free shuffle and one executor running for hours. Exact
    * integer bucketing (`% 32`), engine-independent. */
  def skewAudit(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .select((col("l_orderkey") % 32).as("bucket"), col("l_orderkey"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n"),
        countDistinct(col("l_orderkey")).as("nd_orders"))
      .select(col("bucket"), col("n"), col("nd_orders"),
        (col("n").cast("double") * 32.0 /
          sum(col("n")).over(org.apache.spark.sql.expressions.Window
            .partitionBy()).cast("double")).as("skew"))
      .orderBy(col("bucket"))

  private val skewAuditSql =
    """WITH b AS (
      |  SELECT l_orderkey % 32 AS bucket, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(COUNT(DISTINCT l_orderkey) AS BIGINT) AS nd_orders
      |  FROM lineitem GROUP BY 1
      |)
      |SELECT bucket, n, nd_orders,
      |  CAST(n AS DOUBLE) * 32 / SUM(n) OVER () AS skew
      |FROM b ORDER BY bucket""".stripMargin

  // ---- weighted single-source shortest path ----------------------------

  /** Weighted SSSP on the customer–supplier trade graph (edge weight =
    * co-order count), three Bellman–Ford rounds from customer c1 —
    * min-cost over all ≤3-edge walks, exactly what the oracle's bounded
    * recursive enumeration takes MIN over. Each round is one
    * frontier⨝edges relax + a min-merge groupBy on 8-byte keys (per-round
    * work ∝ reachable set, never walk enumeration — the oracle's triple
    * fan-out would melt at scale, the relaxation doesn't). Integer
    * weights/distances: nothing drifts cross-engine. */
  def ssspSeed(spark: SparkSession, dir: String): DataFrame = {
    // count-weighted symmetric edges from the shared memoized TradeGraph
    // build (already checkpointed there — no per-query rebuild)
    val edges = TradeGraph.countWeighted(spark, dir)
    var dist = edges.filter(col("u") === 2L) // c1
      .select(col("u").as("n")).distinct()
      .withColumn("d", lit(0L)).localCheckpoint(false)
    for (_ <- 1 to 3) {
      val relaxed = dist.join(edges, dist("n") === edges("u"))
        .select(col("v").as("n"), (col("d") + col("w")).as("d"))
      dist = dist.union(relaxed)
        .groupBy(col("n")).agg(min(col("d")).as("d"))
        .localCheckpoint(true)
    }
    dist.select(
        when(col("n") % 2 === 0,
          concat(lit("c"), (col("n") / 2).cast("long")))
          .otherwise(concat(lit("s"), (col("n") / 2).cast("long")))
          .as("node"),
        col("d").as("dist"))
      .orderBy(col("node"))
  }

  private val ssspSeedSql =
    """WITH RECURSIVE e0 AS (
      |  SELECT 'c' || CAST(o_custkey AS VARCHAR) AS u,
      |    's' || CAST(l_suppkey AS VARCHAR) AS v,
      |    CAST(COUNT(*) AS BIGINT) AS w
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2
      |), edges AS (
      |  SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0
      |), r(n, h, cd) AS (
      |  SELECT DISTINCT u, 0, CAST(0 AS BIGINT) FROM edges WHERE u = 'c1'
      |  UNION
      |  SELECT e.v, r.h + 1, r.cd + e.w
      |  FROM r JOIN edges e ON e.u = r.n WHERE r.h < 3
      |)
      |SELECT n AS node, CAST(MIN(cd) AS BIGINT) AS dist
      |FROM r GROUP BY n ORDER BY node""".stripMargin

  // ---- hierarchical revenue shares -------------------------------------

  /** Percent-of-parent rollup: nation revenue as a share of its region
    * and of the world — the drill-down tree every revenue dashboard
    * renders. Exact cents at the (region, nation) leaf, parent totals
    * via two window sums over the ~25-row aggregate (NOT over raw
    * orders), mirrored IEEE divisions. */
  def shareOfParent(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Catalog.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Catalog.load(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long").as("rev_c"))
    rev.select(col("r_name"), col("n_name"), col("rev_c"),
        (col("rev_c").cast("double") /
          sum(col("rev_c")).over(Window.partitionBy(col("r_name")))
            .cast("double")).as("pct_of_region"),
        (col("rev_c").cast("double") /
          sum(col("rev_c")).over(Window.partitionBy()).cast("double"))
          .as("pct_of_total"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val shareOfParentSql =
    """WITH rev AS (
      |  SELECT r_name, n_name,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders
      |  JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2
      |)
      |SELECT r_name, n_name, rev_c,
      |  CAST(rev_c AS DOUBLE)
      |    / CAST(SUM(rev_c) OVER (PARTITION BY r_name) AS DOUBLE)
      |    AS pct_of_region,
      |  CAST(rev_c AS DOUBLE) / CAST(SUM(rev_c) OVER () AS DOUBLE)
      |    AS pct_of_total
      |FROM rev ORDER BY r_name, n_name""".stripMargin

  // ---- pairwise correlation matrix -------------------------------------

  /** Pairwise Pearson correlations among quantity / price / discount in
    * ONE scan: nine decimal-exact moment sums in a single 1-row
    * aggregate, unpivoted into three (pair, n, corr) rows with the same
    * division-guarded formula text as q34 (bare n·sxy−sx·sy shapes FMA-
    * fuse on some engines; (sxy − sx·sy/n) pieces don't). The m×m
    * correlation matrix at 100 TB is exactly this: one combinable pass,
    * m² driver-sized finish. */
  def corrMatrix(spark: SparkSession, dir: String): DataFrame = {
    val m = Catalog.load(spark, dir, "lineitem").agg(
      count(lit(1)).as("n"),
      dsum(col("l_quantity")).as("sx"),
      dsum(col("l_extendedprice")).as("sy"),
      dsum(col("l_discount")).as("sz"),
      dsum(col("l_quantity") * col("l_quantity")).as("sxx"),
      dsum(col("l_extendedprice") * col("l_extendedprice")).as("syy"),
      dsum(col("l_discount") * col("l_discount")).as("szz"),
      dsum(col("l_quantity") * col("l_extendedprice")).as("sxy"),
      dsum(col("l_quantity") * col("l_discount")).as("sxz"),
      dsum(col("l_extendedprice") * col("l_discount")).as("syz"))
    def corr(a: String, b: String, sab: String, saa: String, sbb: String,
        sa: String, sb: String) =
      m.selectExpr(s"'${a}_$b' AS pair", "n",
        s"(($sab - $sa*$sb/n) / (n - 1)) / " +
          s"(sqrt(($saa - $sa*$sa/n) / (n - 1)) * " +
          s"sqrt(($sbb - $sb*$sb/n) / (n - 1))) AS corr")
    corr("qty", "price", "sxy", "sxx", "syy", "sx", "sy")
      .union(corr("qty", "disc", "sxz", "sxx", "szz", "sx", "sz"))
      .union(corr("price", "disc", "syz", "syy", "szz", "sy", "sz"))
      .orderBy(col("pair"))
  }

  private val corrMatrixSql = {
    def c(pair: String, sab: String, saa: String, sbb: String,
        sa: String, sb: String) =
      s"""SELECT '$pair' AS pair, n,
         |  (($sab - $sa*$sb/n) / (n - 1)) /
         |    (sqrt(($saa - $sa*$sa/n) / (n - 1)) *
         |     sqrt(($sbb - $sb*$sb/n) / (n - 1))) AS corr FROM m""".stripMargin
    s"""WITH m AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    ${sqlSum("l_quantity")} AS sx,
       |    ${sqlSum("l_extendedprice")} AS sy,
       |    ${sqlSum("l_discount")} AS sz,
       |    ${sqlSum("l_quantity * l_quantity")} AS sxx,
       |    ${sqlSum("l_extendedprice * l_extendedprice")} AS syy,
       |    ${sqlSum("l_discount * l_discount")} AS szz,
       |    ${sqlSum("l_quantity * l_extendedprice")} AS sxy,
       |    ${sqlSum("l_quantity * l_discount")} AS sxz,
       |    ${sqlSum("l_extendedprice * l_discount")} AS syz
       |  FROM lineitem
       |)
       |${c("qty_price", "sxy", "sxx", "syy", "sx", "sy")}
       |UNION ALL ${c("qty_disc", "sxz", "sxx", "szz", "sx", "sz")}
       |UNION ALL ${c("price_disc", "syz", "syy", "szz", "sy", "sz")}
       |ORDER BY pair""".stripMargin
  }

  // ---- join cardinality audit (no join executed) -----------------------

  /** Exact join-size audit WITHOUT running the join: |A⋈B| =
    * Σ_k cnt_A(k)·cnt_B(k) over the two per-key count aggregates, plus
    * the hottest key's contribution share — the planner probe run
    * before a 100 TB join to decide broadcast/salt/skew handling. The
    * count tables are the only shuffles; the join that would produce
    * those rows never materializes. Exact BIGINTs, one mirrored
    * division for the share. */
  def joinSizeAudit(spark: SparkSession, dir: String): DataFrame = {
    val a = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey").as("k")).agg(count(lit(1)).as("ca"))
    val b = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_orderkey").as("k")).agg(count(lit(1)).as("cb"))
    a.join(b, "k")
      .agg(count(lit(1)).as("n_keys"),
        sum(col("ca") * col("cb")).cast("long").as("join_rows"),
        max(col("ca") * col("cb")).as("max_key_rows"))
      .select(col("n_keys"), col("join_rows"), col("max_key_rows"),
        (col("max_key_rows").cast("double") /
          col("join_rows").cast("double")).as("max_key_share"))
  }

  private val joinSizeAuditSql =
    """WITH a AS (
      |  SELECT l_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS ca
      |  FROM lineitem GROUP BY 1
      |), b AS (
      |  SELECT o_orderkey AS k, CAST(COUNT(*) AS BIGINT) AS cb
      |  FROM orders GROUP BY 1
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_keys,
      |  CAST(SUM(ca * cb) AS BIGINT) AS join_rows,
      |  CAST(MAX(ca * cb) AS BIGINT) AS max_key_rows,
      |  CAST(MAX(ca * cb) AS DOUBLE) / CAST(SUM(ca * cb) AS DOUBLE)
      |    AS max_key_share
      |FROM a JOIN b USING (k)""".stripMargin

  // ---- linear interpolation over series gaps ---------------------------

  /** Time-series imputation: daily revenue per supplier nation on the
    * full calendar spine, gaps LINEARLY interpolated between the
    * nearest known days — v_p + (v_n − v_p)·(d − d_p)/(d_n − d_p) — the
    * step up from forward-fill (q146) every metrics store offers.
    * Known values are exact cents; the interpolation is one mirrored
    * IEEE expression over exact integer gaps. Edge gaps (no prev/next)
    * take the one known neighbor. The spine is days×nations
    * (calendar-bounded), built by exploding a sequence against the
    * broadcast nation dim — never a shuffle-side cartesian. */
  def linearInterp(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val rev = Catalog.load(spark, dir, "lineitem")
      .join(Catalog.load(spark, dir, "supplier"),
        col("l_suppkey") === col("s_suppkey"))
      .join(Catalog.load(spark, dir, "nation"),
        col("s_nationkey") === col("n_nationkey"))
      .groupBy(col("n_name"),
        expr("unix_micros(l_shipdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
        .cast("long").as("rev_c"))
      .localCheckpoint(false)
    val bounds = rev.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    val spine = bounds
      .select(explode(expr("sequence(lo, hi)")).as("day"))
      .crossJoin(broadcast(
        Catalog.load(spark, dir, "nation").select(col("n_name"))))
    val w = Window.partitionBy(col("n_name")).orderBy(col("day"))
    spine.join(rev, Seq("n_name", "day"), "left")
      .withColumn("dp", last(when(col("rev_c").isNotNull, col("day")),
        ignoreNulls = true).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("vp", last(col("rev_c"), ignoreNulls = true).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("dn", first(when(col("rev_c").isNotNull, col("day")),
        ignoreNulls = true).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .withColumn("vn", first(col("rev_c"), ignoreNulls = true).over(
        w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      .select(col("n_name"), col("day"),
        when(col("rev_c").isNotNull, lit(1L)).otherwise(0L).as("known"),
        when(col("rev_c").isNotNull, col("rev_c").cast("double"))
          .when(col("vp").isNull, col("vn").cast("double"))
          .when(col("vn").isNull, col("vp").cast("double"))
          .otherwise(col("vp").cast("double") +
            (col("vn") - col("vp")).cast("double") *
              (col("day") - col("dp")).cast("double") /
              (col("dn") - col("dp")).cast("double"))
          .as("rev_filled"))
      .orderBy(col("n_name"), col("day"))
  }

  private val linearInterpSql =
    """WITH rev AS (
      |  SELECT n_name,
      |    epoch_ns(l_shipdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM lineitem
      |  JOIN supplier ON l_suppkey = s_suppkey
      |  JOIN nation ON s_nationkey = n_nationkey
      |  GROUP BY 1, 2
      |), b AS (
      |  SELECT MIN(day) AS lo, MAX(day) AS hi FROM rev
      |), spine AS (
      |  SELECT n.n_name, CAST(u.day AS BIGINT) AS day
      |  FROM b, nation n, unnest(range(b.lo, b.hi + 1)) AS u(day)
      |), j AS (
      |  SELECT s.n_name, s.day, r.rev_c,
      |    last_value(CASE WHEN r.rev_c IS NOT NULL THEN s.day END
      |      IGNORE NULLS) OVER (PARTITION BY s.n_name ORDER BY s.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS dp,
      |    last_value(r.rev_c IGNORE NULLS) OVER (PARTITION BY s.n_name
      |      ORDER BY s.day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS vp,
      |    first_value(CASE WHEN r.rev_c IS NOT NULL THEN s.day END
      |      IGNORE NULLS) OVER (PARTITION BY s.n_name ORDER BY s.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS dn,
      |    first_value(r.rev_c IGNORE NULLS) OVER (PARTITION BY s.n_name
      |      ORDER BY s.day
      |      ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS vn
      |  FROM spine s LEFT JOIN rev r
      |    ON r.n_name = s.n_name AND r.day = s.day
      |)
      |SELECT n_name, day,
      |  CAST(CASE WHEN rev_c IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)
      |    AS known,
      |  CASE WHEN rev_c IS NOT NULL THEN CAST(rev_c AS DOUBLE)
      |       WHEN vp IS NULL THEN CAST(vn AS DOUBLE)
      |       WHEN vn IS NULL THEN CAST(vp AS DOUBLE)
      |       ELSE CAST(vp AS DOUBLE) + CAST(vn - vp AS DOUBLE)
      |         * CAST(day - dp AS DOUBLE) / CAST(dn - dp AS DOUBLE)
      |  END AS rev_filled
      |FROM j ORDER BY n_name, day""".stripMargin

  // ---- M4 series downsampling ------------------------------------------

  /** M4 downsampling: the daily revenue series reduced to 20 buckets,
    * each keeping min/max/first/last — the lossless-for-rendering
    * reduction (Jugel et al., M4) that lets a dashboard draw a
    * billion-point series from 4·buckets values without visual error.
    * Bucket id by integer arithmetic over the day span; first/last by
    * exact rank selection inside the bucket. One aggregate over the
    * daily series (itself one aggregate over the table). */
  def m4Downsample(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long").as("rev_c"))
      .localCheckpoint(false)
    val b = daily.agg(min(col("day")).as("lo"), max(col("day")).as("hi"))
    daily.crossJoin(broadcast(b))
      .select(col("day"), col("rev_c"),
        least(expr("(day - lo) * 20 div (hi - lo + 1)"), lit(19L))
          .as("bucket"))
      .groupBy(col("bucket"))
      .agg(count(lit(1)).as("n_days"),
        min(col("rev_c")).as("min_c"), max(col("rev_c")).as("max_c"),
        min_by(col("rev_c"), col("day")).as("first_c"),
        max_by(col("rev_c"), col("day")).as("last_c"))
      .orderBy(col("bucket"))
  }

  private val m4DownsampleSql =
    """WITH daily AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1
      |), b AS (
      |  SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily
      |)
      |SELECT least((day - lo) * 20 // (hi - lo + 1), 19) AS bucket,
      |  CAST(COUNT(*) AS BIGINT) AS n_days,
      |  MIN(rev_c) AS min_c, MAX(rev_c) AS max_c,
      |  arg_min(rev_c, day) AS first_c, arg_max(rev_c, day) AS last_c
      |FROM daily, b GROUP BY 1 ORDER BY bucket""".stripMargin

  // ---- 2-D histogram ---------------------------------------------------

  /** Two-dimensional 10×10 histogram of (quantity, price) — the joint-
    * distribution heatmap behind correlation numbers (q292 says HOW
    * related; this shows WHERE the mass sits). Bucket edges from the
    * 1-row min/max aggregate broadcast back; bucket ids by pure integer
    * arithmetic on exact units/cents, so every cell count is engine-
    * exact. One scan + one 100-cell aggregate. */
  def histogram2d(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_quantity").cast("long").as("qx"),
        expr("CAST(round(l_extendedprice * 100) AS BIGINT)").as("cy"))
      .localCheckpoint(false)
    val b = li.agg(min(col("qx")).as("qlo"), max(col("qx")).as("qhi"),
      min(col("cy")).as("clo"), max(col("cy")).as("chi"))
    li.crossJoin(broadcast(b))
      .select(
        least(expr("(qx - qlo) * 10 div (qhi - qlo + 1)"), lit(9L))
          .as("bx"),
        least(expr("(cy - clo) * 10 div (chi - clo + 1)"), lit(9L))
          .as("by"))
      .groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("bx"), col("by"))
  }

  private val histogram2dSql =
    """WITH li AS (
      |  SELECT CAST(l_quantity AS BIGINT) AS qx,
      |    CAST(round(l_extendedprice * 100) AS BIGINT) AS cy
      |  FROM lineitem
      |), b AS (
      |  SELECT MIN(qx) AS qlo, MAX(qx) AS qhi,
      |    MIN(cy) AS clo, MAX(cy) AS chi
      |  FROM li
      |)
      |SELECT least((qx - qlo) * 10 // (qhi - qlo + 1), 9) AS bx,
      |  least((cy - clo) * 10 // (chi - clo + 1), 9) AS by,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM li, b GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- bit-packed activity bitmap --------------------------------------

  /** User-activity bitmaps: each user's active days packed into ONE
    * BIGINT (bit i = active on day min_day+i — the fixture span fits 62
    * bits), then profiled with pure bit arithmetic: popcount for active
    * days and the classic contiguity test — shift out trailing zeros
    * (x / (x & −x), an exact power-of-two division), then a run is
    * contiguous iff y & (y+1) = 0. The bit-packed representation is the
    * retention-engineering primitive: 8 bytes per user per ~2 months
    * instead of a row per (user, day), and every downstream question is
    * register arithmetic. Output: users per (active_days, contiguous). */
  def activityBitmap(spark: SparkSession, dir: String): DataFrame = {
    val ev = Catalog.load(spark, dir, "events")
      .select(col("user_id"),
        expr("unix_micros(ts) div 86400000000").as("day"))
    val lo = ev.agg(min(col("day")).as("d0"))
    ev.crossJoin(broadcast(lo))
      .filter(col("day") - col("d0") < 62)
      .select(col("user_id"), (col("day") - col("d0")).as("off"))
      .groupBy(col("user_id"))
      .agg(sum_distinct(expr("shiftleft(CAST(1 AS BIGINT), CAST(off AS INT))"))
        .cast("long").as("bits"))
      .select(col("user_id"),
        expr("bit_count(bits)").cast("long").as("active_days"),
        expr("""CASE WHEN
            ((bits div (bits & -bits)) & ((bits div (bits & -bits)) + 1))
              = 0 THEN 1 ELSE 0 END""").cast("long").as("contiguous"))
      .groupBy(col("active_days"), col("contiguous"))
      .agg(count(lit(1)).as("n_users"))
      .orderBy(col("active_days"), col("contiguous"))
  }

  private val activityBitmapSql =
    """WITH ev AS (
      |  SELECT user_id,
      |    epoch_ns(ts) // 1000 // 86400000000 AS day
      |  FROM events
      |), lo AS (SELECT MIN(day) AS d0 FROM ev
      |), bm AS (
      |  SELECT user_id,
      |    CAST(SUM(DISTINCT (CAST(1 AS BIGINT) << CAST(day - d0 AS INT)))
      |      AS BIGINT) AS bits
      |  FROM ev, lo WHERE day - d0 < 62 GROUP BY 1
      |), f AS (
      |  SELECT user_id, CAST(bit_count(bits) AS BIGINT) AS active_days,
      |    CAST(CASE WHEN
      |      ((bits // (bits & -bits)) & ((bits // (bits & -bits)) + 1)) = 0
      |      THEN 1 ELSE 0 END AS BIGINT) AS contiguous
      |  FROM bm
      |)
      |SELECT active_days, contiguous, CAST(COUNT(*) AS BIGINT) AS n_users
      |FROM f GROUP BY 1, 2 ORDER BY 1, 2""".stripMargin

  // ---- centered rolling median -----------------------------------------

  /** 7-day centered rolling median of daily revenue — the robust
    * smoother (spikes don't drag it the way a moving average drags).
    * No engine has an exact median window function, so the frame is
    * materialized: the daily aggregate self-joined within ±3 days (a
    * calendar-bounded ≤7× expansion of the DAILY table, not the raw
    * data), then the shared lower/upper-rank median selection per
    * center day. Exact cents; deterministic tiebreak on day. */
  def rollingMedian(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .cast("long").as("rev_c"))
      .localCheckpoint(false)
    val win = daily.select(col("day").as("center"))
      .join(daily, col("day").between(col("center") - 3, col("center") + 3))
    val w = Window.partitionBy(col("center"))
    win
      .withColumn("rn", row_number().over(
        w.orderBy(col("rev_c"), col("day"))))
      .withColumn("n", count(lit(1)).over(w))
      .groupBy(col("center"))
      .agg(max(col("n")).as("n_window"),
        max(when(expr("rn = (n + 1) div 2"), col("rev_c"))).as("med_lo"),
        max(when(expr("rn = (n + 2) div 2"), col("rev_c"))).as("med_hi"))
      .select(col("center").as("day"), col("n_window"),
        ((col("med_lo") + col("med_hi")) / 2).as("med"))
      .orderBy(col("day"))
  }

  private val rollingMedianSql =
    """WITH daily AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM orders GROUP BY 1
      |), win AS (
      |  SELECT c.day AS center, d.day, d.rev_c
      |  FROM daily c JOIN daily d
      |    ON d.day BETWEEN c.day - 3 AND c.day + 3
      |), r AS (
      |  SELECT center, rev_c,
      |    ROW_NUMBER() OVER (PARTITION BY center ORDER BY rev_c, day)
      |      AS rn,
      |    COUNT(*) OVER (PARTITION BY center) AS n
      |  FROM win
      |)
      |SELECT center AS day, CAST(MAX(n) AS BIGINT) AS n_window,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN rev_c END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN rev_c END)) / 2 AS med
      |FROM r GROUP BY center ORDER BY day""".stripMargin

  // ---- deterministic negative sampling ---------------------------------

  /** Implicit-feedback negative sampling: for each of the first 50
    * customers, draw candidate parts by a DETERMINISTIC multiplicative
    * hash (replayable on any engine — rand() streams are engine-
    * private), drop candidates the customer actually bought (anti-join
    * on the interaction set), keep the first 3 survivors by draw order.
    * The recsys training-negatives primitive with the scale-correct
    * shape: k·candidates rows per user (never user×item), interaction
    * anti-join on the composite key. Everything integer-exact. */
  def negativeSample(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val nParts = Catalog.load(spark, dir, "part")
      .agg(max(col("p_partkey")).as("np"))
    val users = Catalog.load(spark, dir, "customer")
      .filter(col("c_custkey") <= 50).select(col("c_custkey"))
    val cands = users.crossJoin(broadcast(nParts))
      .select(col("c_custkey"), col("np"),
        explode(expr("sequence(1, 10)")).as("j"))
      .select(col("c_custkey"), col("j"),
        expr("""1 + ((c_custkey % 1000000007) * 2654435761 + j * 1000003)
                % 1000000007 % np""").as("cand_part"))
    val interactions = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .select(col("o_custkey").as("c_custkey"),
        col("l_partkey").as("cand_part"))
      .distinct()
    cands.join(interactions, Seq("c_custkey", "cand_part"), "left_anti")
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("c_custkey")).orderBy(col("j"))))
      .filter(col("rn") <= 3)
      .select(col("c_custkey"), col("cand_part"),
        col("j").cast("long").as("j"), col("rn"))
      .orderBy(col("c_custkey"), col("rn"))
  }

  private val negativeSampleSql =
    """WITH np AS (
      |  SELECT MAX(p_partkey) AS np FROM part
      |), cands AS (
      |  SELECT c.c_custkey, u.j,
      |    1 + ((c.c_custkey % 1000000007) * 2654435761 + u.j * 1000003)
      |      % 1000000007 % np.np AS cand_part
      |  FROM customer c, np, unnest(range(1, 11)) AS u(j)
      |  WHERE c.c_custkey <= 50
      |), inter AS (
      |  SELECT DISTINCT o_custkey AS c_custkey, l_partkey AS cand_part
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |), surv AS (
      |  SELECT cd.c_custkey, cd.cand_part, cd.j,
      |    CAST(ROW_NUMBER() OVER (PARTITION BY cd.c_custkey ORDER BY cd.j)
      |      AS BIGINT) AS rn
      |  FROM cands cd LEFT JOIN inter i
      |    ON i.c_custkey = cd.c_custkey AND i.cand_part = cd.cand_part
      |  WHERE i.c_custkey IS NULL
      |)
      |SELECT c_custkey, cand_part, CAST(j AS BIGINT) AS j, rn
      |FROM surv WHERE rn <= 3
      |ORDER BY c_custkey, rn""".stripMargin

  // ---- Tukey fences ----------------------------------------------------

  /** Tukey-fence outlier audit per order priority: exact rank-selected
    * Q1/Q3 (the `ceil(frac·n)` order-statistic picks, same convention
    * as rankPercentiles' p90 — interpolating quantile builtins can't be
    * hash-compared), 1.5·IQR fences as mirrored IEEE doubles, and the
    * count of rows outside each fence from one join-back pass — the
    * box-plot-with-outliers numbers every data-quality dashboard draws.
    * Per-key ranks via the GlobalRank grouped form (priority has 5
    * values — a PARTITION BY window would funnel ~1/5 of the fact table
    * per task). */
  def tukeyFences(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    val base = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("k"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
        col("o_orderkey").as("tb"))
    val r = GlobalRank.withRowNumber(base,
      Seq(col("k"), col("v"), col("tb")), "grn")
    val bounds = r.groupBy(col("k"))
      .agg(min(col("grn")).as("g0"), count(lit(1)).as("n"))
      .withColumnRenamed("k", "bk")
    val quartiles = r.join(bounds, col("k") <=> col("bk"))
      .withColumn("rn", col("grn") - col("g0") + 1)
      .groupBy(col("k")).agg(
        max(col("n")).as("n"),
        max(when(expr("rn = cast(ceil(n * 0.25) as bigint)"), col("v")))
          .as("q1"),
        max(when(expr("rn = cast(ceil(n * 0.75) as bigint)"), col("v")))
          .as("q3"))
      .withColumn("lo_fence",
        col("q1").cast("double") - lit(1.5) *
          (col("q3") - col("q1")).cast("double"))
      .withColumn("hi_fence",
        col("q3").cast("double") + lit(1.5) *
          (col("q3") - col("q1")).cast("double"))
    base.join(broadcast(quartiles), "k")
      .groupBy(col("k"))
      .agg(max(col("n")).as("n"), max(col("q1")).as("q1_cents"),
        max(col("q3")).as("q3_cents"),
        sum(when(col("v").cast("double") < col("lo_fence"), 1L)
          .otherwise(0L)).as("n_low"),
        sum(when(col("v").cast("double") > col("hi_fence"), 1L)
          .otherwise(0L)).as("n_high"))
      .withColumnRenamed("k", "o_orderpriority")
      .orderBy(col("o_orderpriority"))
  }

  private val tukeyFencesSql =
    """WITH base AS (
      |  SELECT o_orderpriority AS k,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v, o_orderkey AS tb
      |  FROM orders
      |), r AS (
      |  SELECT k, v,
      |    CAST(row_number() OVER (PARTITION BY k ORDER BY v, tb)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY k) AS BIGINT) AS n
      |  FROM base
      |), q AS (
      |  SELECT k, MAX(n) AS n,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.25) AS BIGINT) THEN v END)
      |      AS q1,
      |    MAX(CASE WHEN rn = CAST(ceil(n * 0.75) AS BIGINT) THEN v END)
      |      AS q3
      |  FROM r GROUP BY k
      |), f AS (
      |  SELECT k, n, q1, q3,
      |    CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE) AS lo_fence,
      |    CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE) AS hi_fence
      |  FROM q
      |)
      |SELECT k AS o_orderpriority, MAX(f.n) AS n,
      |  MAX(q1) AS q1_cents, MAX(q3) AS q3_cents,
      |  CAST(SUM(CASE WHEN CAST(v AS DOUBLE) < lo_fence THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_low,
      |  CAST(SUM(CASE WHEN CAST(v AS DOUBLE) > hi_fence THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_high
      |FROM base JOIN f USING (k)
      |GROUP BY k
      |ORDER BY o_orderpriority""".stripMargin

  // ---- median absolute deviation ---------------------------------------

  /** MAD (median absolute deviation) per priority — the robust scale
    * estimate a z-score can't give when whales stretch the stddev: two
    * exact rank-median passes (value median, then median of |v − med|)
    * through the shared scale-safe percentile machinery. Deviations are
    * exact half-cent-grained doubles (cents minus an integer-or-.5
    * median), so their ordering and the second rank pick are
    * engine-identical. */
  def madPerGroup(spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
        col("o_orderkey"))
    val med = StatsOps.rankPercentiles(base, col("g"), col("cents"),
        col("o_orderkey"))
      .select(col("k").as("mk"), col("median").as("med"))
    val dev = base.join(broadcast(med), col("g") <=> col("mk"))
      .select(col("g"), abs(col("cents").cast("double") - col("med"))
        .as("dev"), col("o_orderkey"))
    StatsOps.rankPercentiles(dev, col("g"), col("dev"), col("o_orderkey"))
      .select(col("k").as("o_orderpriority"), col("n"),
        col("median").as("mad"))
      .orderBy(col("o_orderpriority"))
  }

  private val madPerGroupSql =
    """WITH base AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents, o_orderkey
      |  FROM orders
      |), r AS (
      |  SELECT g, cents,
      |    CAST(row_number() OVER (PARTITION BY g ORDER BY cents, o_orderkey)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
      |  FROM base
      |), med AS (
      |  SELECT g,
      |    (MAX(CASE WHEN rn = (n + 1) // 2 THEN cents END)
      |     + MAX(CASE WHEN rn = (n + 2) // 2 THEN cents END)) / 2.0 AS med
      |  FROM r GROUP BY g
      |), dev AS (
      |  SELECT base.g, abs(CAST(cents AS DOUBLE) - med) AS dev, o_orderkey
      |  FROM base JOIN med ON base.g = med.g
      |), rd AS (
      |  SELECT g, dev,
      |    CAST(row_number() OVER (PARTITION BY g ORDER BY dev, o_orderkey)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY g) AS BIGINT) AS n
      |  FROM dev
      |)
      |SELECT g AS o_orderpriority, MAX(n) AS n,
      |  (MAX(CASE WHEN rn = (n + 1) // 2 THEN dev END)
      |   + MAX(CASE WHEN rn = (n + 2) // 2 THEN dev END)) / 2 AS mad
      |FROM rd GROUP BY g
      |ORDER BY o_orderpriority""".stripMargin

  // ---- Poisson dispersion test -----------------------------------------

  /** Index-of-dispersion (variance-to-mean) test on daily order counts —
    * "is demand Poisson or bursty": s²/x̄ ≈ 1 under Poisson, and the
    * χ² form (n−1)·s²/x̄ feeds the standard test. Daily counts collapse
    * the fact table to a calendar frame; both statistics come from
    * exact integer moments (n, Σc, Σc²) with mirrored IEEE divisions —
    * no per-row doubles anywhere. */
  def dispersionTest(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(count(lit(1)).as("c"))
    daily.agg(count(lit(1)).as("n_days"), sum(col("c")).as("s"),
        sum(col("c") * col("c")).as("ss"))
      .select(col("n_days"), col("s").as("n_orders"),
        ((col("n_days") * col("ss") - col("s") * col("s")).cast("double")
          / (col("n_days") * (col("n_days") - 1)).cast("double")
          / (col("s").cast("double") / col("n_days").cast("double")))
          .as("dispersion_index"),
        ((col("n_days") * col("ss") - col("s") * col("s")).cast("double")
          / col("n_days").cast("double")
          / (col("s").cast("double") / col("n_days").cast("double")))
          .as("chi2"))
  }

  private val dispersionTestSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders WHERE o_orderdate IS NOT NULL GROUP BY 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |    CAST(SUM(c) AS BIGINT) AS s, CAST(SUM(c * c) AS BIGINT) AS ss
      |  FROM daily
      |)
      |SELECT n_days, s AS n_orders,
      |  CAST(n_days * ss - s * s AS DOUBLE)
      |    / CAST(n_days * (n_days - 1) AS DOUBLE)
      |    / (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE))
      |    AS dispersion_index,
      |  CAST(n_days * ss - s * s AS DOUBLE) / CAST(n_days AS DOUBLE)
      |    / (CAST(s AS DOUBLE) / CAST(n_days AS DOUBLE)) AS chi2
      |FROM m""".stripMargin

  // ---- record-breaking days vs the iid expectation ---------------------------

  /** RECORD-day census of daily revenue against records theory: for an
    * exchangeable series the expected number of running-maximum
    * records in n days is the harmonic number H_n, independent of the
    * distribution — so actual/expected ≫ 1 is distribution-free
    * evidence of growth (trend tests q384/q144 estimate a slope; this
    * needs no model at all). Records come from one running max over
    * the collapsed daily spine; H_n is mirrored exactly as the
    * floored-micro harmonic sum Σ⌊10⁶/k⌋ over the same spine's row
    * numbers — no float series, no special function. */
  def recordDays(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val d = Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("day"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val w = Window.orderBy(col("day"))
    d.withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("prev_max",
        max(col("cents")).over(w.rowsBetween(Window.unboundedPreceding, -1)))
      .agg(count(lit(1)).as("n_days"),
        sum((col("prev_max").isNull || col("cents") > col("prev_max"))
          .cast("long")).as("n_records"),
        sum(expr("1000000 div rn")).as("expected_micro"),
        max(when(col("prev_max").isNull || col("cents") > col("prev_max"),
          col("day"))).as("last_record_day"))
      .select(col("n_days"), col("n_records"), col("expected_micro"),
        col("last_record_day"),
        (col("n_records").cast("double") * lit(1e6)
          / col("expected_micro").cast("double")).as("records_ratio"))
  }

  private val recordDaysSql =
    """WITH d AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS day,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), r AS (
      |  SELECT day, cents,
      |    CAST(row_number() OVER (ORDER BY day) AS BIGINT) AS rn,
      |    max(cents) OVER (ORDER BY day
      |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev_max
      |  FROM d
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
      |  CAST(SUM(CASE WHEN prev_max IS NULL OR cents > prev_max
      |    THEN 1 ELSE 0 END) AS BIGINT) AS n_records,
      |  CAST(SUM(1000000 // rn) AS BIGINT) AS expected_micro,
      |  MAX(CASE WHEN prev_max IS NULL OR cents > prev_max
      |    THEN day END) AS last_record_day,
      |  CAST(SUM(CASE WHEN prev_max IS NULL OR cents > prev_max
      |    THEN 1 ELSE 0 END) AS DOUBLE) * 1e6
      |    / CAST(SUM(1000000 // rn) AS DOUBLE) AS records_ratio
      |FROM r""".stripMargin

  // ---- regression diagnostics pack (daily revenue time trend) ---------------
  //
  // Shared frame: y = daily revenue in whole DOLLARS (cents would push
  // the n·Dx·y·10⁶ scaled residuals past decimal(38) at large SF), x =
  // epoch day. The OLS residual e_i is carried as the EXACT integer
  // E_i = n·Dx·y_i − Dx·Sy + Num·Sx − n·Num·x_i (= n·Dx·e_i), floored
  // into micro-dollars — so Durbin–Watson, Breusch–Pagan and Cook's
  // distances are deterministic integer/decimal chains with one final
  // double each, never a float residual recurrence.

  private def dailyDollars(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "orders")
      .groupBy(expr("unix_micros(o_orderdate) div 86400000000").as("x"))
      .agg(sum(expr("CAST(round(o_totalprice) AS BIGINT)")).as("y"))

  /** Moments + per-row exact micro-dollar residuals of the daily trend. */
  private def dailyResiduals(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val d = dailyDollars(spark, dir)
    val m = d.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
      sum(col("y")).as("sy"),
      sum(expr(s"CAST(CAST(x AS $dec) * x AS $dec)")).as("sxx"),
      sum(expr(s"CAST(CAST(x AS $dec) * y AS $dec)")).as("sxy"))
    d.crossJoin(broadcast(m))
      .withColumn("dxm", expr(s"CAST(n * sxx - CAST(sx AS $dec) * sx AS $dec)"))
      .withColumn("num", expr(s"CAST(n * sxy - CAST(sx AS $dec) * sy AS $dec)"))
      .withColumn("e_raw",
        expr(s"""CAST(n * dxm * y - dxm * sy + num * sx - n * num * x
                 AS $dec)"""))
      .withColumn("e_mu", expr(
        s"""CAST(CASE WHEN e_raw >= 0
           THEN (e_raw * 1000000) div (n * dxm)
           ELSE -((-e_raw * 1000000) div (n * dxm)) END AS BIGINT)"""))
  }

  /** The oracle twin of [[dailyResiduals]], as reusable CTE text. */
  private val dailyResidualsCtes =
    """d AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS x,
      |    CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
      |    CAST(SUM(y) AS BIGINT) AS sy,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy
      |  FROM d
      |), r AS (
      |  SELECT x, y, n,
      |    n * sxx - CAST(sx AS HUGEINT) * sx AS dxm,
      |    n * sxy - CAST(sx AS HUGEINT) * sy AS num,
      |    CAST(CASE WHEN n * (n * sxx - CAST(sx AS HUGEINT) * sx) * y
      |        - (n * sxx - CAST(sx AS HUGEINT) * sx) * sy
      |        + (n * sxy - CAST(sx AS HUGEINT) * sy) * sx
      |        - n * (n * sxy - CAST(sx AS HUGEINT) * sy) * x >= 0
      |      THEN ((n * (n * sxx - CAST(sx AS HUGEINT) * sx) * y
      |        - (n * sxx - CAST(sx AS HUGEINT) * sx) * sy
      |        + (n * sxy - CAST(sx AS HUGEINT) * sy) * sx
      |        - n * (n * sxy - CAST(sx AS HUGEINT) * sy) * x) * 1000000)
      |        // (n * (n * sxx - CAST(sx AS HUGEINT) * sx))
      |      ELSE -((-(n * (n * sxx - CAST(sx AS HUGEINT) * sx) * y
      |        - (n * sxx - CAST(sx AS HUGEINT) * sx) * sy
      |        + (n * sxy - CAST(sx AS HUGEINT) * sy) * sx
      |        - n * (n * sxy - CAST(sx AS HUGEINT) * sy) * x) * 1000000)
      |        // (n * (n * sxx - CAST(sx AS HUGEINT) * sx)))
      |    END AS BIGINT) AS e_mu
      |  FROM d, m
      |)""".stripMargin

  /** DURBIN–WATSON test on the daily-trend residuals: DW =
    * Σ(eₜ−eₜ₋₁)²/Σeₜ² detects the serial correlation an OLS slope's
    * stated precision silently assumes away (q144's trend, q315's
    * rolling fits report slopes; none of them check their own error
    * independence). Residuals are exact floored micro-dollars, the lag
    * runs over the collapsed daily spine, both sums are exact decimal
    * squares, DW and the implied ρ₁ ≈ 1 − DW/2 are two final mirrored
    * doubles. */
  def durbinWatson(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val dec = "decimal(38,0)"
    dailyResiduals(spark, dir)
      .withColumn("e_prev",
        lag(col("e_mu"), 1).over(Window.orderBy(col("x"))))
      .agg(count(lit(1)).as("n"),
        sum(expr(s"CAST(CAST(e_mu AS $dec) * e_mu AS $dec)")).as("see"),
        sum(expr(s"""CAST(CAST(e_mu - e_prev AS $dec) * (e_mu - e_prev)
                     AS $dec)""")).as("sdd"))
      .select(col("n"),
        (col("sdd").cast("double") / col("see").cast("double")).as("dw"))
      .withColumn("rho1_implied", lit(1.0) - col("dw") / lit(2.0))
  }

  private val durbinWatsonSql =
    s"""WITH $dailyResidualsCtes, l AS (
       |  SELECT e_mu, lag(e_mu, 1) OVER (ORDER BY x) AS e_prev FROM r
       |), s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
       |    SUM(CAST(e_mu AS HUGEINT) * e_mu) AS see,
       |    SUM(CAST(e_mu - e_prev AS HUGEINT) * (e_mu - e_prev)) AS sdd
       |  FROM l
       |)
       |SELECT n,
       |  CAST(CAST(sdd AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(see AS VARCHAR) AS DOUBLE) AS dw,
       |  1.0 - (CAST(CAST(sdd AS VARCHAR) AS DOUBLE)
       |    / CAST(CAST(see AS VARCHAR) AS DOUBLE)) / 2.0 AS rho1_implied
       |FROM s""".stripMargin

  /** BREUSCH–PAGAN heteroskedasticity test: regress the STANDARDIZED
    * squared residuals uᵢ = eᵢ²/σ̂² (exact floored micro-units of an
    * exact integer ratio) back on x; LM = n·R²_aux. A fanning-out
    * error band inflates every CI the trend family reports — this is
    * the check that says whether the band is even constant. Three
    * aggregates, no window, one final double. */
  def breuschPagan(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val r = dailyResiduals(spark, dir)
      .select(col("x"), col("e_mu")).localCheckpoint(false)
    val msq = r.agg(count(lit(1)).as("n2"),
      sum(expr(s"CAST(CAST(e_mu AS $dec) * e_mu AS $dec)")).as("se2"))
      .select(col("n2"),
        expr(s"CAST((se2 - se2 % n2) / n2 AS $dec)").as("msq"))
    val u = r.crossJoin(broadcast(msq))
      .select(col("x"),
        expr(s"""CAST((CAST(e_mu AS $dec) * e_mu * 1000000
                 - (CAST(e_mu AS $dec) * e_mu * 1000000) % msq)
                 / msq AS BIGINT)""").as("u"))
    u.agg(count(lit(1)).as("n"), sum(col("x")).as("sx"),
        sum(col("u")).as("su"),
        sum(expr(s"CAST(CAST(x AS $dec) * x AS $dec)")).as("sxx"),
        sum(expr(s"CAST(CAST(x AS $dec) * u AS $dec)")).as("sxu"),
        sum(expr(s"CAST(CAST(u AS $dec) * u AS $dec)")).as("suu"))
      .select(col("n"),
        (expr(s"""CAST((n * sxu - CAST(sx AS $dec) * su)
                  * (n * sxu - CAST(sx AS $dec) * su) AS $dec)""")
          .cast("double")
          / (expr(s"CAST(n * sxx - CAST(sx AS $dec) * sx AS $dec)")
              .cast("double")
            * expr(s"CAST(n * suu - CAST(su AS $dec) * su AS $dec)")
              .cast("double"))).as("r2_aux"))
      .withColumn("bp_lm", col("n").cast("double") * col("r2_aux"))
  }

  private val breuschPaganSql =
    s"""WITH $dailyResidualsCtes, ms AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n2,
       |    SUM(CAST(e_mu AS HUGEINT) * e_mu)
       |      // CAST(COUNT(*) AS BIGINT) AS msq
       |  FROM r
       |), u AS (
       |  SELECT x, CAST((CAST(e_mu AS HUGEINT) * e_mu * 1000000) // msq
       |    AS BIGINT) AS u
       |  FROM r, ms
       |), s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS sx,
       |    CAST(SUM(u) AS BIGINT) AS su,
       |    SUM(CAST(x AS HUGEINT) * x) AS sxx,
       |    SUM(CAST(x AS HUGEINT) * u) AS sxu,
       |    SUM(CAST(u AS HUGEINT) * u) AS suu
       |  FROM u
       |)
       |SELECT n,
       |  CAST(CAST((n * sxu - CAST(sx AS HUGEINT) * su)
       |      * (n * sxu - CAST(sx AS HUGEINT) * su) AS VARCHAR) AS DOUBLE)
       |  / (CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR)
       |      AS DOUBLE)
       |    * CAST(CAST(n * suu - CAST(su AS HUGEINT) * su AS VARCHAR)
       |      AS DOUBLE)) AS r2_aux,
       |  CAST(n AS DOUBLE)
       |    * (CAST(CAST((n * sxu - CAST(sx AS HUGEINT) * su)
       |        * (n * sxu - CAST(sx AS HUGEINT) * su) AS VARCHAR)
       |        AS DOUBLE)
       |      / (CAST(CAST(n * sxx - CAST(sx AS HUGEINT) * sx AS VARCHAR)
       |          AS DOUBLE)
       |        * CAST(CAST(n * suu - CAST(su AS HUGEINT) * su AS VARCHAR)
       |          AS DOUBLE))) AS bp_lm
       |FROM s""".stripMargin

  /** CHOW structural-break test at 1996-01-01: did the daily-revenue
    * trend CHANGE regime — the regression-based complement to q442's
    * nonparametric Pettitt mean-shift (a slope can break with no mean
    * shift at the cut). All three RSS terms come from the moment
    * identity RSS = (Dx·Dy − Num²)/(n·Dx) over one conditional
    * aggregate — no residual materialization at all — and F is a
    * final double chain over exact decimal operands. */
  def chowTest(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val cut = 9496L // epoch day of 1996-01-01
    val seg = dailyDollars(spark, dir)
      .withColumn("g", (col("x") < cut).cast("long"))
    def moments(pred: Column, tag: String) = Seq(
      sum(when(pred, 1L).otherwise(0L)).as(s"n_$tag"),
      sum(when(pred, col("x")).otherwise(0L)).as(s"sx_$tag"),
      sum(when(pred, col("y")).otherwise(0L)).as(s"sy_$tag"),
      sum(when(pred, expr(s"CAST(CAST(x AS $dec) * x AS $dec)"))
        .otherwise(expr(s"CAST(0 AS $dec)"))).as(s"sxx_$tag"),
      sum(when(pred, expr(s"CAST(CAST(x AS $dec) * y AS $dec)"))
        .otherwise(expr(s"CAST(0 AS $dec)"))).as(s"sxy_$tag"),
      sum(when(pred, expr(s"CAST(CAST(y AS $dec) * y AS $dec)"))
        .otherwise(expr(s"CAST(0 AS $dec)"))).as(s"syy_$tag"))
    val aggs = moments(lit(true), "f") ++ moments(col("g") === 1, "a") ++
      moments(col("g") === 0, "b")
    def rss(tag: String): Column = {
      val dx = expr(s"CAST(n_$tag * sxx_$tag - CAST(sx_$tag AS $dec) * sx_$tag AS $dec)")
      val dy = expr(s"CAST(n_$tag * syy_$tag - CAST(sy_$tag AS $dec) * sy_$tag AS $dec)")
      val nu = expr(s"CAST(n_$tag * sxy_$tag - CAST(sx_$tag AS $dec) * sy_$tag AS $dec)")
      (expr(s"""CAST((CAST(n_$tag * sxx_$tag - CAST(sx_$tag AS $dec) * sx_$tag AS $dec))
               * (CAST(n_$tag * syy_$tag - CAST(sy_$tag AS $dec) * sy_$tag AS $dec))
               - (CAST(n_$tag * sxy_$tag - CAST(sx_$tag AS $dec) * sy_$tag AS $dec))
               * (CAST(n_$tag * sxy_$tag - CAST(sx_$tag AS $dec) * sy_$tag AS $dec))
               AS $dec)""").cast("double")
        / (dx * expr(s"CAST(n_$tag AS $dec)")).cast("double"))
    }
    seg.agg(aggs.head, aggs.tail: _*)
      .select(col("n_a").as("n_pre"), col("n_b").as("n_post"),
        rss("f").as("rss_full"), rss("a").as("rss_pre"),
        rss("b").as("rss_post"))
      .withColumn("chow_f",
        ((col("rss_full") - col("rss_pre") - col("rss_post")) / lit(2.0))
          / ((col("rss_pre") + col("rss_post"))
            / (col("n_pre") + col("n_post") - lit(4L)).cast("double")))
  }

  private val chowTestSql =
    """WITH d AS (
      |  SELECT epoch_ns(o_orderdate) // 1000 // 86400000000 AS x,
      |    CAST(SUM(CAST(round(o_totalprice) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1
      |), seg AS (
      |  SELECT x, y, CASE WHEN x < 9496 THEN 1 ELSE 0 END AS g FROM d
      |), mo AS (
      |  SELECT
      |    CAST(COUNT(*) AS BIGINT) AS n_f,
      |    CAST(SUM(x) AS BIGINT) AS sx_f, CAST(SUM(y) AS BIGINT) AS sy_f,
      |    SUM(CAST(x AS HUGEINT) * x) AS sxx_f,
      |    SUM(CAST(x AS HUGEINT) * y) AS sxy_f,
      |    SUM(CAST(y AS HUGEINT) * y) AS syy_f,
      |    CAST(SUM(g) AS BIGINT) AS n_a,
      |    CAST(SUM(g * x) AS BIGINT) AS sx_a,
      |    CAST(SUM(g * y) AS BIGINT) AS sy_a,
      |    SUM(g * CAST(x AS HUGEINT) * x) AS sxx_a,
      |    SUM(g * CAST(x AS HUGEINT) * y) AS sxy_a,
      |    SUM(g * CAST(y AS HUGEINT) * y) AS syy_a,
      |    CAST(SUM(1 - g) AS BIGINT) AS n_b,
      |    CAST(SUM((1 - g) * x) AS BIGINT) AS sx_b,
      |    CAST(SUM((1 - g) * y) AS BIGINT) AS sy_b,
      |    SUM((1 - g) * CAST(x AS HUGEINT) * x) AS sxx_b,
      |    SUM((1 - g) * CAST(x AS HUGEINT) * y) AS sxy_b,
      |    SUM((1 - g) * CAST(y AS HUGEINT) * y) AS syy_b
      |  FROM seg
      |), o AS (
      |  SELECT n_a AS n_pre, n_b AS n_post,
      |    CAST(CAST((n_f * sxx_f - CAST(sx_f AS HUGEINT) * sx_f)
      |        * (n_f * syy_f - CAST(sy_f AS HUGEINT) * sy_f)
      |        - (n_f * sxy_f - CAST(sx_f AS HUGEINT) * sy_f)
      |        * (n_f * sxy_f - CAST(sx_f AS HUGEINT) * sy_f) AS VARCHAR)
      |      AS DOUBLE)
      |      / CAST(CAST((n_f * sxx_f - CAST(sx_f AS HUGEINT) * sx_f) * n_f
      |        AS VARCHAR) AS DOUBLE) AS rss_full,
      |    CAST(CAST((n_a * sxx_a - CAST(sx_a AS HUGEINT) * sx_a)
      |        * (n_a * syy_a - CAST(sy_a AS HUGEINT) * sy_a)
      |        - (n_a * sxy_a - CAST(sx_a AS HUGEINT) * sy_a)
      |        * (n_a * sxy_a - CAST(sx_a AS HUGEINT) * sy_a) AS VARCHAR)
      |      AS DOUBLE)
      |      / CAST(CAST((n_a * sxx_a - CAST(sx_a AS HUGEINT) * sx_a) * n_a
      |        AS VARCHAR) AS DOUBLE) AS rss_pre,
      |    CAST(CAST((n_b * sxx_b - CAST(sx_b AS HUGEINT) * sx_b)
      |        * (n_b * syy_b - CAST(sy_b AS HUGEINT) * sy_b)
      |        - (n_b * sxy_b - CAST(sx_b AS HUGEINT) * sy_b)
      |        * (n_b * sxy_b - CAST(sx_b AS HUGEINT) * sy_b) AS VARCHAR)
      |      AS DOUBLE)
      |      / CAST(CAST((n_b * sxx_b - CAST(sx_b AS HUGEINT) * sx_b) * n_b
      |        AS VARCHAR) AS DOUBLE) AS rss_post
      |  FROM mo
      |)
      |SELECT n_pre, n_post, rss_full, rss_pre, rss_post,
      |  ((rss_full - rss_pre - rss_post) / 2.0)
      |    / ((rss_pre + rss_post)
      |      / CAST(n_pre + n_post - 4 AS DOUBLE)) AS chow_f
      |FROM o""".stripMargin

  /** COOK'S DISTANCE top-10: which single days, removed, would move
    * the fitted trend the most — the influence audit that separates
    * "one crazy day drives the slope" from a real signal (q136/q467
    * flag outliers in y alone; influence weighs them by LEVERAGE too).
    * Leverage is the exact integer ratio (Dx + (n·x−Sx)²)/(n·Dx);
    * e²/s² is a ratio of exact micro-residual squares; D assembles
    * them in one deterministic double chain. TakeOrdered(10), no
    * window. */
  def cooksDistance(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val r = dailyResiduals(spark, dir).localCheckpoint(false)
    val s2 = r.agg(count(lit(1)).as("nn"),
      sum(expr(s"CAST(CAST(e_mu AS $dec) * e_mu AS $dec)")).as("se2"))
      .select(col("nn"),
        expr(s"CAST((se2 - se2 % (nn - 2)) / (nn - 2) AS $dec)").as("s2"))
    r.crossJoin(broadcast(s2))
      .withColumn("h_num",
        expr(s"""CAST(dxm + (CAST(n AS $dec) * x - sx)
                 * (CAST(n AS $dec) * x - sx) AS $dec)"""))
      .withColumn("leverage",
        col("h_num").cast("double")
          / expr(s"CAST(CAST(n AS $dec) * dxm AS $dec)").cast("double"))
      .withColumn("cooks_d",
        (expr(s"CAST(CAST(e_mu AS $dec) * e_mu AS $dec)").cast("double")
          / col("s2").cast("double"))
          * (col("h_num").cast("double")
            * expr(s"CAST(CAST(n AS $dec) * dxm AS $dec)").cast("double"))
          / (lit(2.0)
            * expr(s"CAST(CAST(n AS $dec) * dxm - h_num AS $dec)")
              .cast("double")
            * expr(s"CAST(CAST(n AS $dec) * dxm - h_num AS $dec)")
              .cast("double")))
      .select(col("x").as("day"), col("y").as("revenue_dollars"),
        col("e_mu"), col("leverage"), col("cooks_d"))
      .orderBy(col("cooks_d").desc, col("day"))
      .limit(10)
  }

  private val cooksDistanceSql =
    s"""WITH $dailyResidualsCtes, s2t AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS nn,
       |    SUM(CAST(e_mu AS HUGEINT) * e_mu)
       |      // (CAST(COUNT(*) AS BIGINT) - 2) AS s2
       |  FROM r
       |), t AS (
       |  SELECT x AS day, y AS revenue_dollars, e_mu,
       |    CAST(CAST(dxm + (CAST(r.n AS HUGEINT) * x - m.sx)
       |        * (CAST(r.n AS HUGEINT) * x - m.sx) AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(CAST(r.n AS HUGEINT) * dxm AS VARCHAR) AS DOUBLE)
       |      AS leverage,
       |    (CAST(CAST(CAST(e_mu AS HUGEINT) * e_mu AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(s2 AS VARCHAR) AS DOUBLE))
       |    * (CAST(CAST(dxm + (CAST(r.n AS HUGEINT) * x - m.sx)
       |        * (CAST(r.n AS HUGEINT) * x - m.sx) AS VARCHAR) AS DOUBLE)
       |      * CAST(CAST(CAST(r.n AS HUGEINT) * dxm AS VARCHAR) AS DOUBLE))
       |    / (2.0
       |      * CAST(CAST(CAST(r.n AS HUGEINT) * dxm
       |        - (dxm + (CAST(r.n AS HUGEINT) * x - m.sx)
       |          * (CAST(r.n AS HUGEINT) * x - m.sx)) AS VARCHAR) AS DOUBLE)
       |      * CAST(CAST(CAST(r.n AS HUGEINT) * dxm
       |        - (dxm + (CAST(r.n AS HUGEINT) * x - m.sx)
       |          * (CAST(r.n AS HUGEINT) * x - m.sx)) AS VARCHAR) AS DOUBLE))
       |      AS cooks_d
       |  FROM r, m, s2t
       |)
       |SELECT day, revenue_dollars, e_mu, leverage, cooks_d
       |FROM t
       |ORDER BY cooks_d DESC, day
       |LIMIT 10""".stripMargin

  /** VARIANCE INFLATION FACTORS for the three standard customer
    * covariates (account balance, order count, lifetime spend) — the
    * multicollinearity gate run BEFORE fitting any model on them:
    * q292's correlation matrix shows pairwise r, but VIF measures what
    * matters for coefficients — how well each covariate is predicted
    * by the OTHER TWO jointly (closed form for k=3 from the pairwise
    * r's). Order count and spend are near-duplicates by construction;
    * VIF says exactly how redundant. One moment aggregate, exact
    * decimal d_ij numerators, a fixed-order double chain both engines
    * share. */
  /** The shared (r12, r13, r23) pairwise-correlation frame for
    * q506/q512 — one exact decimal moment aggregate over the customer
    * covariates. */
  private def vifCorrFrame(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val sp = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(count(lit(1)).as("n_ord"),
        sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("spend"))
    val base = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("x1"))
      .join(sp, col("c_custkey") === col("o_custkey"), "left")
      .select(col("x1"), coalesce(col("n_ord"), lit(0L)).as("x2"),
        coalesce(col("spend"), lit(0L)).as("x3"))
    val r = base.agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x3")).as("s3"),
        sum(expr(s"CAST(CAST(x1 AS $dec) * x1 AS $dec)")).as("s11"),
        sum(expr(s"CAST(CAST(x2 AS $dec) * x2 AS $dec)")).as("s22"),
        sum(expr(s"CAST(CAST(x3 AS $dec) * x3 AS $dec)")).as("s33"),
        sum(expr(s"CAST(CAST(x1 AS $dec) * x2 AS $dec)")).as("s12"),
        sum(expr(s"CAST(CAST(x1 AS $dec) * x3 AS $dec)")).as("s13"),
        sum(expr(s"CAST(CAST(x2 AS $dec) * x3 AS $dec)")).as("s23"))
      .select(
        (expr(s"CAST(n * s12 - CAST(s1 AS $dec) * s2 AS $dec)").cast("double")
          / (sqrt(expr(s"CAST(n * s11 - CAST(s1 AS $dec) * s1 AS $dec)")
              .cast("double"))
            * sqrt(expr(s"CAST(n * s22 - CAST(s2 AS $dec) * s2 AS $dec)")
              .cast("double")))).as("r12"),
        (expr(s"CAST(n * s13 - CAST(s1 AS $dec) * s3 AS $dec)").cast("double")
          / (sqrt(expr(s"CAST(n * s11 - CAST(s1 AS $dec) * s1 AS $dec)")
              .cast("double"))
            * sqrt(expr(s"CAST(n * s33 - CAST(s3 AS $dec) * s3 AS $dec)")
              .cast("double")))).as("r13"),
        (expr(s"CAST(n * s23 - CAST(s2 AS $dec) * s3 AS $dec)").cast("double")
          / (sqrt(expr(s"CAST(n * s22 - CAST(s2 AS $dec) * s2 AS $dec)")
              .cast("double"))
            * sqrt(expr(s"CAST(n * s33 - CAST(s3 AS $dec) * s3 AS $dec)")
              .cast("double")))).as("r23"))
    r
  }

  def vif3(spark: SparkSession, dir: String): DataFrame =
    vifCorrFrame(spark, dir)
      .select(col("r12"), col("r13"), col("r23"),
        ((col("r12") * col("r12") + col("r13") * col("r13")
          - lit(2.0) * col("r12") * col("r13") * col("r23"))
          / (lit(1.0) - col("r23") * col("r23"))).as("rsq1"),
        ((col("r12") * col("r12") + col("r23") * col("r23")
          - lit(2.0) * col("r12") * col("r23") * col("r13"))
          / (lit(1.0) - col("r13") * col("r13"))).as("rsq2"),
        ((col("r13") * col("r13") + col("r23") * col("r23")
          - lit(2.0) * col("r13") * col("r23") * col("r12"))
          / (lit(1.0) - col("r12") * col("r12"))).as("rsq3"))
      .select(col("r12"), col("r13"), col("r23"),
        (lit(1.0) / (lit(1.0) - col("rsq1"))).as("vif_balance"),
        (lit(1.0) / (lit(1.0) - col("rsq2"))).as("vif_orders"),
        (lit(1.0) / (lit(1.0) - col("rsq3"))).as("vif_spend"))

  private val vif3Sql =
    """WITH sp AS (
      |  SELECT o_custkey, CAST(COUNT(*) AS BIGINT) AS n_ord,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS spend
      |  FROM orders GROUP BY 1
      |), base AS (
      |  SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS x1,
      |    COALESCE(n_ord, 0) AS x2, COALESCE(spend, 0) AS x3
      |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
      |    CAST(SUM(x3) AS BIGINT) AS s3,
      |    SUM(CAST(x1 AS HUGEINT) * x1) AS s11,
      |    SUM(CAST(x2 AS HUGEINT) * x2) AS s22,
      |    SUM(CAST(x3 AS HUGEINT) * x3) AS s33,
      |    SUM(CAST(x1 AS HUGEINT) * x2) AS s12,
      |    SUM(CAST(x1 AS HUGEINT) * x3) AS s13,
      |    SUM(CAST(x2 AS HUGEINT) * x3) AS s23
      |  FROM base
      |), r AS (
      |  SELECT
      |    CAST(CAST(n * s12 - CAST(s1 AS HUGEINT) * s2 AS VARCHAR)
      |        AS DOUBLE)
      |      / (sqrt(CAST(CAST(n * s11 - CAST(s1 AS HUGEINT) * s1
      |          AS VARCHAR) AS DOUBLE))
      |        * sqrt(CAST(CAST(n * s22 - CAST(s2 AS HUGEINT) * s2
      |          AS VARCHAR) AS DOUBLE))) AS r12,
      |    CAST(CAST(n * s13 - CAST(s1 AS HUGEINT) * s3 AS VARCHAR)
      |        AS DOUBLE)
      |      / (sqrt(CAST(CAST(n * s11 - CAST(s1 AS HUGEINT) * s1
      |          AS VARCHAR) AS DOUBLE))
      |        * sqrt(CAST(CAST(n * s33 - CAST(s3 AS HUGEINT) * s3
      |          AS VARCHAR) AS DOUBLE))) AS r13,
      |    CAST(CAST(n * s23 - CAST(s2 AS HUGEINT) * s3 AS VARCHAR)
      |        AS DOUBLE)
      |      / (sqrt(CAST(CAST(n * s22 - CAST(s2 AS HUGEINT) * s2
      |          AS VARCHAR) AS DOUBLE))
      |        * sqrt(CAST(CAST(n * s33 - CAST(s3 AS HUGEINT) * s3
      |          AS VARCHAR) AS DOUBLE))) AS r23
      |  FROM m
      |), q AS (
      |  SELECT r12, r13, r23,
      |    (r12 * r12 + r13 * r13 - 2.0 * r12 * r13 * r23)
      |      / (1.0 - r23 * r23) AS rsq1,
      |    (r12 * r12 + r23 * r23 - 2.0 * r12 * r23 * r13)
      |      / (1.0 - r13 * r13) AS rsq2,
      |    (r13 * r13 + r23 * r23 - 2.0 * r13 * r23 * r12)
      |      / (1.0 - r12 * r12) AS rsq3
      |  FROM r
      |)
      |SELECT r12, r13, r23,
      |  1.0 / (1.0 - rsq1) AS vif_balance,
      |  1.0 / (1.0 - rsq2) AS vif_orders,
      |  1.0 / (1.0 - rsq3) AS vif_spend
      |FROM q""".stripMargin

  /** JONCKHEERE–TERPSTRA ordered-alternative test: does order value
    * rise MONOTONICALLY down the 1-URGENT…5-LOW priority ladder —
    * the test with actual power against the ordering q437's
    * Kruskal–Wallis ignores (KW burns power on arbitrary permutations;
    * the priorities are ordinal by construction, q470's trend logic
    * for a continuous response). J = Σ_{g<h} #(x_g < x_h), doubled to
    * keep half-ties integral: the value-domain histogram is pivoted to
    * per-group counts, ONE fused GlobalRank pass gives all five
    * groups' strictly-below prefixes (no single-partition and no
    * 5-partition window, one range shuffle), and J₂ accumulates
    * exactly; z uses the closed-form null moments. */
  def jonckheere(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val hist = Catalog.load(spark, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .groupBy(col("v"))
      .agg(sum((col("g") === 1).cast("long")).as("c1"),
        (2 to 5).map(i =>
          sum((col("g") === i).cast("long")).as(s"c$i")): _*)
    val cum = graft.ops.GlobalRank.withRunningSums(hist, Seq(col("v")),
      (1 to 5).map(i => (col(s"c$i"), s"cum$i")))
    val row = cum.select((Seq(col("v")) ++
      (1 to 5).map(i => col(s"c$i")) ++
      (1 to 5).map(i => (col(s"cum$i") - col(s"c$i")).as(s"lt$i"))): _*)
    val j = row.select(
      ((2 to 5).map { h =>
        val lts = (1 until h).map(g => col(s"lt$g")).reduce(_ + _)
        val cs = (1 until h).map(g => col(s"c$g")).reduce(_ + _)
        col(s"c$h") * (lts * 2 + cs)
      }.reduce(_ + _)).as("j2_part"))
      .agg(sum(expr(s"CAST(j2_part AS $dec)")).as("j2"))
    val tot = hist.agg(sum(col("c1")).as("n1"),
      (2 to 5).map(i => sum(col(s"c$i")).as(s"n$i")): _*)
    j.crossJoin(broadcast(tot))
      .withColumn("n",
        (1 to 5).map(i => col(s"n$i")).reduce(_ + _))
      .withColumn("sumsq", expr(s"""CAST(${(1 to 5)
        .map(i => s"CAST(n$i AS $dec) * n$i").mkString(" + ")} AS $dec)"""))
      .withColumn("e2",
        expr(s"CAST((CAST(n AS $dec) * n - sumsq) / 2 AS $dec)"))
      .withColumn("var72", expr(s"""CAST(CAST(n AS $dec) * n * (2 * n + 3)
        - (${(1 to 5).map(i => s"CAST(n$i AS $dec) * n$i * (2 * n$i + 3)")
          .mkString(" + ")}) AS $dec)"""))
      .select(col("n"), col("j2").cast("long").as("j2"),
        col("e2").cast("long").as("e2"),
        ((col("j2") - col("e2")).cast("double")
          / (lit(2.0) * sqrt(col("var72").cast("double") / lit(72.0))))
          .as("z"))
  }

  private val jonckheereSql = {
    val cSums = (1 to 5).map(i =>
      s"""CAST(SUM(CASE WHEN g = $i THEN 1 ELSE 0 END) AS BIGINT)
         AS c$i""").mkString(",\n      |    ")
    s"""WITH o AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders
       |), hist AS (
       |  SELECT v,
       |    $cSums
       |  FROM o GROUP BY 1
       |), cum AS (
       |  SELECT v, ${(1 to 5).map(i => s"c$i").mkString(", ")},
       |    ${(1 to 5).map(i =>
      s"CAST(SUM(c$i) OVER w - c$i AS BIGINT) AS lt$i")
        .mkString(",\n       |    ")}
       |  FROM hist
       |  WINDOW w AS (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |), jp AS (
       |  SELECT ${(2 to 5).map { h =>
      val lts = (1 until h).map(g => s"lt$g").mkString(" + ")
      val cs = (1 until h).map(g => s"c$g").mkString(" + ")
      s"c$h * (($lts) * 2 + ($cs))"
    }.mkString(" + ")} AS j2_part
       |  FROM cum
       |), j AS (
       |  SELECT CAST(SUM(CAST(j2_part AS HUGEINT)) AS BIGINT) AS j2 FROM jp
       |), tot AS (
       |  SELECT ${(1 to 5).map(i =>
      s"CAST(SUM(c$i) AS BIGINT) AS n$i").mkString(", ")}
       |  FROM hist
       |), m AS (
       |  SELECT j2, ${(1 to 5).map(i => s"n$i").mkString(" + ")} AS n,
       |    ${(1 to 5).map(i => s"CAST(n$i AS HUGEINT) * n$i")
      .mkString(" + ")} AS sumsq,
       |    ${(1 to 5).map(i =>
      s"CAST(n$i AS HUGEINT) * n$i * (2 * n$i + 3)").mkString(" + ")}
       |      AS varg
       |  FROM j, tot
       |)
       |SELECT n, j2,
       |  CAST((CAST(n AS HUGEINT) * n - sumsq) // 2 AS BIGINT) AS e2,
       |  CAST(CAST(j2 - (CAST(n AS HUGEINT) * n - sumsq) // 2 AS VARCHAR)
       |      AS DOUBLE)
       |    / (2.0 * sqrt(CAST(CAST(CAST(n AS HUGEINT) * n * (2 * n + 3)
       |        - varg AS VARCHAR) AS DOUBLE) / 72.0)) AS z
       |FROM m""".stripMargin
  }

  /** PARTIAL correlations among balance / order count / spend — each
    * pairwise r with the THIRD variable held fixed:
    * r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)). q408 reports
    * the raw balance↔spend r; the partial says how much survives once
    * order count is controlled — the difference IS the mediation
    * readout. Same exact decimal moment aggregate as q506, a
    * fixed-order double chain both engines share. */
  def partialCorr(spark: SparkSession, dir: String): DataFrame =
    vifCorrFrame(spark, dir)
      .select(col("r12"), col("r13"), col("r23"),
        ((col("r12") - col("r13") * col("r23"))
          / sqrt((lit(1.0) - col("r13") * col("r13"))
            * (lit(1.0) - col("r23") * col("r23"))))
          .as("partial_bal_ord_given_spend"),
        ((col("r13") - col("r12") * col("r23"))
          / sqrt((lit(1.0) - col("r12") * col("r12"))
            * (lit(1.0) - col("r23") * col("r23"))))
          .as("partial_bal_spend_given_ord"),
        ((col("r23") - col("r12") * col("r13"))
          / sqrt((lit(1.0) - col("r12") * col("r12"))
            * (lit(1.0) - col("r13") * col("r13"))))
          .as("partial_ord_spend_given_bal"))

  private val partialCorrSql =
    vif3Sql.replace(
      """|)
        |SELECT r12, r13, r23,
        |  1.0 / (1.0 - rsq1) AS vif_balance,
        |  1.0 / (1.0 - rsq2) AS vif_orders,
        |  1.0 / (1.0 - rsq3) AS vif_spend
        |FROM q""".stripMargin,
      """|)
        |SELECT r12, r13, r23,
        |  (r12 - r13 * r23)
        |    / sqrt((1.0 - r13 * r13) * (1.0 - r23 * r23))
        |    AS partial_bal_ord_given_spend,
        |  (r13 - r12 * r23)
        |    / sqrt((1.0 - r12 * r12) * (1.0 - r23 * r23))
        |    AS partial_bal_spend_given_ord,
        |  (r23 - r12 * r13)
        |    / sqrt((1.0 - r12 * r12) * (1.0 - r13 * r13))
        |    AS partial_ord_spend_given_bal
        |FROM q""".stripMargin)

  /** DUNN'S POST-HOC test — the pairwise follow-up q437's omnibus
    * Kruskal–Wallis demands: WHICH of the ten priority pairs actually
    * differ, on the pooled midranks with the tie-corrected variance,
    * flagged at the Bonferroni 0.05/10 critical z (2.807034). Doubled
    * midranks 2·#below + ties + 1 stay integral; per-group rank sums
    * come from ONE GlobalRank prefix pass over the value-domain
    * histogram; the ten z's assemble on a 5-row frame. */
  def dunnPosthoc(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val hist = Catalog.load(spark, dir, "orders")
      .select(substring(col("o_orderpriority"), 1, 1).cast("int").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"))
      .groupBy(col("v"))
      .agg(sum((col("g") === 1).cast("long")).as("c1"),
        (2 to 5).map(i =>
          sum((col("g") === i).cast("long")).as(s"c$i")): _*)
      .withColumn("t", (1 to 5).map(i => col(s"c$i")).reduce(_ + _))
    val cum = graft.ops.GlobalRank.withRunningSum(
      hist, Seq(col("v")), col("t"), "cum_t")
      .withColumn("mr2", (col("cum_t") - col("t")) * 2 + col("t") + 1)
    val aggs = Seq(sum(col("t")).as("n"),
      sum(expr(s"CAST(CAST(t AS $dec) * t * t - t AS $dec)")).as("tie")) ++
      (1 to 5).flatMap(i => Seq(sum(col(s"c$i")).as(s"n$i"),
        sum(expr(s"CAST(CAST(c$i AS $dec) * mr2 AS $dec)")).as(s"r2_$i")))
    val one = cum.agg(aggs.head, aggs.tail: _*)
    val groups = one.select(col("n"), col("tie"),
        explode(array((1 to 5).map(i => struct(lit(i).as("g"),
          col(s"n$i").as("ng"), col(s"r2_$i").as("r2"))): _*)).as("s"))
      .select(col("n"), col("tie"), col("s.g").as("g"),
        col("s.ng").as("ng"), col("s.r2").as("r2"))
      .localCheckpoint(false)
    val a = groups.select(col("n"), col("tie"), col("g").as("ga"),
      col("ng").as("na"), col("r2").as("ra"))
    val b = groups.select(col("g").as("gb"), col("ng").as("nb"),
      col("r2").as("rb"))
    a.join(b, col("ga") < col("gb"))
      .withColumn("mdiff",
        expr(s"CAST(ra * nb - rb * na AS $dec)").cast("double")
          / expr(s"CAST(2 * CAST(na AS $dec) * nb AS $dec)").cast("double"))
      .withColumn("var_all",
        expr(s"CAST(CAST(n AS $dec) * (n + 1) AS $dec)").cast("double")
          / lit(12.0)
          - col("tie").cast("double")
          / (lit(12.0) * (col("n") - 1).cast("double")))
      .withColumn("sigma",
        sqrt(col("var_all") * (lit(1.0) / col("na").cast("double")
          + lit(1.0) / col("nb").cast("double"))))
      .select(col("ga").as("g_lo"), col("gb").as("g_hi"),
        col("na").as("n_lo"), col("nb").as("n_hi"),
        (col("mdiff") / col("sigma")).as("z"))
      .withColumn("significant", abs(col("z")) > lit(2.807034))
      .orderBy(col("g_lo"), col("g_hi"))
  }

  private val dunnPosthocSql = {
    val cSums = (1 to 5).map(i =>
      s"CAST(SUM(CASE WHEN g = $i THEN 1 ELSE 0 END) AS BIGINT) AS c$i")
      .mkString(",\n       |    ")
    s"""WITH o AS (
       |  SELECT CAST(substring(o_orderpriority, 1, 1) AS INT) AS g,
       |    CAST(round(o_totalprice * 100) AS BIGINT) AS v
       |  FROM orders
       |), hist AS (
       |  SELECT v,
       |    $cSums,
       |    CAST(COUNT(*) AS BIGINT) AS t
       |  FROM o GROUP BY 1
       |), cum AS (
       |  SELECT *, (CAST(SUM(t) OVER (ORDER BY v ROWS UNBOUNDED PRECEDING)
       |    AS BIGINT) - t) * 2 + t + 1 AS mr2
       |  FROM hist
       |), one AS (
       |  SELECT CAST(SUM(t) AS BIGINT) AS n,
       |    SUM(CAST(t AS HUGEINT) * t * t - t) AS tie,
       |    ${(1 to 5).map(i =>
      s"""CAST(SUM(c$i) AS BIGINT) AS n$i,
         |    SUM(CAST(c$i AS HUGEINT) * mr2) AS r2_$i""".stripMargin)
      .mkString(",\n       |    ")}
       |  FROM cum
       |), groups AS (
       |  ${(1 to 5).map(i =>
      s"SELECT n, tie, $i AS g, n$i AS ng, r2_$i AS r2 FROM one")
      .mkString("\n       |  UNION ALL\n       |  ")}
       |), p AS (
       |  SELECT a.n, a.tie, a.g AS g_lo, b.g AS g_hi,
       |    a.ng AS n_lo, b.ng AS n_hi,
       |    CAST(CAST(a.r2 * b.ng - b.r2 * a.ng AS VARCHAR) AS DOUBLE)
       |      / CAST(CAST(2 * CAST(a.ng AS HUGEINT) * b.ng AS VARCHAR)
       |        AS DOUBLE) AS mdiff,
       |    CAST(CAST(CAST(a.n AS HUGEINT) * (a.n + 1) AS VARCHAR)
       |      AS DOUBLE) / 12.0
       |      - CAST(CAST(a.tie AS VARCHAR) AS DOUBLE)
       |        / (12.0 * CAST(a.n - 1 AS DOUBLE)) AS var_all
       |  FROM groups a JOIN groups b ON a.g < b.g
       |)
       |SELECT g_lo, g_hi, n_lo, n_hi,
       |  mdiff / sqrt(var_all
       |    * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE)))
       |    AS z,
       |  abs(mdiff / sqrt(var_all
       |    * (1.0 / CAST(n_lo AS DOUBLE) + 1.0 / CAST(n_hi AS DOUBLE))))
       |    > 2.807034 AS significant
       |FROM p
       |ORDER BY g_lo, g_hi""".stripMargin
  }

  val all: Seq[Q] = Seq(
    Q("q516_dunn_posthoc", dunnPosthoc, Some(dunnPosthocSql),
      "Dunn's post-hoc pairwise z over the ten priority pairs " +
        "(pooled doubled midranks from one GlobalRank pass, tie-" +
        "corrected variance, Bonferroni flags) — the follow-up q437's " +
        "omnibus demands"),
    Q("q512_partial_corr", partialCorr, Some(partialCorrSql),
      "partial correlations among balance/order-count/spend with the " +
        "third variable controlled — the mediation readout next to " +
        "q408's raw r, same exact moment machinery as q506"),
    Q("q511_jonckheere", jonckheere, Some(jonckheereSql),
      "Jonckheere-Terpstra ordered-alternative test down the priority " +
        "ladder (doubled half-tie J from five GlobalRank prefix sums " +
        "over the value-domain histogram) — the ordinal power " +
        "Kruskal-Wallis throws away"),
    Q("q506_vif", vif3, Some(vif3Sql),
      "variance inflation factors for balance/order-count/spend from " +
        "the closed 3-variable form — the multicollinearity gate " +
        "before any model uses them together"),
    Q("q502_durbin_watson", durbinWatson, Some(durbinWatsonSql),
      "Durbin-Watson serial-correlation test on the daily-trend OLS " +
        "residuals — exact micro-dollar residuals, decimal square " +
        "sums, two mirrored doubles"),
    Q("q503_breusch_pagan", breuschPagan, Some(breuschPaganSql),
      "Breusch-Pagan heteroskedasticity LM: standardized squared " +
        "residuals (exact floored micro-units) regressed back on the " +
        "day — is the trend's error band even constant"),
    Q("q504_chow_test", chowTest, Some(chowTestSql),
      "Chow structural-break F at 1996-01-01 from the moment identity " +
        "RSS = (Dx*Dy - Num^2)/(n*Dx) — no residual materialization, " +
        "the regression complement to Pettitt"),
    Q("q505_cooks_distance", cooksDistance, Some(cooksDistanceSql),
      "top-10 influential days by Cook's distance (exact integer " +
        "leverage ratio x exact micro residual ratio) — the influence " +
        "audit outlier flags alone miss"),
    Q("q496_record_days", recordDays, Some(recordDaysSql),
      "record-breaking revenue days vs the distribution-free harmonic " +
        "expectation H_n (floored-micro harmonic sum) — model-free " +
        "growth evidence from one daily running max"),
    Q("q466_tukey_fences", tukeyFences, Some(tukeyFencesSql),
      "Tukey 1.5*IQR outlier fences per priority: exact rank-selected " +
        "Q1/Q3, mirrored-double fences, join-back outlier counts"),
    Q("q467_mad", madPerGroup, Some(madPerGroupSql),
      "median absolute deviation per priority — two exact rank-median " +
        "passes through the scale-safe percentile machinery"),
    Q("q468_dispersion_test", dispersionTest, Some(dispersionTestSql),
      "Poisson index-of-dispersion test on daily order counts (exact " +
        "integer moments, mirrored divisions)"),
    Q("q305_negative_sample", negativeSample, Some(negativeSampleSql),
      "deterministic-hash negative sampling with interaction anti-join " +
        "— replayable recsys training negatives, k rows per user"),
    Q("q298_histogram2d", histogram2d, Some(histogram2dSql),
      "10x10 joint histogram of (quantity, price): integer bucket ids " +
        "from broadcast min/max edges, one 100-cell aggregate"),
    Q("q299_activity_bitmap", activityBitmap, Some(activityBitmapSql),
      "bit-packed per-user activity bitmaps: popcount active days + " +
        "bit-trick contiguity test, 8 bytes of state per user"),
    Q("q300_rolling_median", rollingMedian, Some(rollingMedianSql),
      "7-day centered rolling median of daily revenue: calendar-bounded " +
        "frame materialization + exact rank-selected median"),
    Q("q294_join_size_audit", joinSizeAudit, Some(joinSizeAuditSql),
      "exact join cardinality + hottest-key share from per-key counts " +
        "only — the pre-join planner probe, no join executed"),
    Q("q295_linear_interp", linearInterp, Some(linearInterpSql),
      "calendar-spine gap imputation by linear interpolation between " +
        "nearest known days — exact cents, one mirrored expression"),
    Q("q297_m4_downsample", m4Downsample, Some(m4DownsampleSql),
      "M4 min/max/first/last bucket downsampling of the daily revenue " +
        "series — the lossless-for-rendering reduction"),
    Q("q290_sssp_seed", ssspSeed, Some(ssspSeedSql),
      "weighted single-source shortest path (3 Bellman-Ford rounds) on " +
        "the trade graph — frontier relaxation vs walk enumeration"),
    Q("q291_share_of_parent", shareOfParent, Some(shareOfParentSql),
      "nation revenue share of region and world: exact cents leaf, " +
        "window totals over the aggregate, mirrored divisions"),
    Q("q292_corr_matrix", corrMatrix, Some(corrMatrixSql),
      "pairwise correlation matrix in one scan: nine decimal moment " +
        "sums, division-guarded shared formula per pair"),
    Q("q277_bloom_semi_join", bloomSemiJoin, Some(bloomSemiJoinSql),
      "broadcast-Bloom prefiltered semi join == plain semi join " +
        "(pre-shuffle probe pruning; FPs removed by the exact join)"),
    Q("q278_ship_latency", shipLatency, Some(shipLatencySql),
      "order-to-ship latency per priority: exact calendar-day integers, " +
        "BIGINT sums, one mirrored division for the mean"),
    Q("q279_skew_audit", skewAudit, Some(skewAuditSql),
      "join-key hash-bucket skew audit: per-bucket load factor vs even " +
        "split, the pre-salting planner profile"),
    Q("q269_column_profile", columnProfile, Some(columnProfileSql),
      "one-pass table profile: per-column null + exact distinct counts " +
        "from a single scan, unpivoted on the 1-row aggregate"),
    Q("q252_holt_winters", holtWintersQ, Some(holtWintersSql),
      "Holt-Winters triple smoothing (period 7) in fixed-point " +
        "micro-units, bit-exact vs a 7-slot rotating recursive CTE"),
    Q("q254_cvm_test", cvmTest, Some(cvmTestSql),
      "two-sample Cramer-von Mises criterion: exact DECIMAL(38,0) " +
        "squared-ECDF-gap sum, one double division at the end"),
    Q("q255_weighted_median", weightedMedian, Some(weightedMedianSql),
      "quantity-weighted median price per return flag: exact " +
        "cumulative-weight threshold, no division"),
    Q("q248_link_predict", linkPredictQ, Some(linkPredictSql),
      "resource-allocation link prediction on the co-supply graph: " +
        "wedge join + anti-join, exact micro-unit 1/deg scores"),
    Q("q249_rendezvous_shard", rendezvousShard, Some(rendezvousShardSql),
      "rendezvous-hash shard audit: HRW argmax as one packed integer " +
        "max; 8->9 shard growth moves ~1/9 of docs"),
    Q("q250_kendall_tau", kendallTau, Some(kendallTauSql),
      "Kendall tau-b on a deterministic 2000-row hash sample: exact " +
        "integer concordant/discordant/tie counts"),
    Q("q251_permutation_test", permutationTest, Some(permutationTestSql),
      "seeded 200-rep permutation test, exact DECIMAL(38,0) " +
        "cross-multiplied mean-gap comparison"),
    Q("q245_holt", holt, Some(holtSql),
      "Holt double exponential smoothing of daily revenue in fixed-point " +
        "micro-units, bit-exact vs a recursive-CTE oracle"),
    Q("q246_delete_propagation", deletePropagation, Some(deletePropagationSql),
      "right-to-be-forgotten cascade audit: broadcast request keys, one " +
        "left-join aggregate per table, FK-cascaded purge counts"),
    Q("q247_conformal_band", conformalBand, Some(conformalBandSql),
      "split-conformal interval calibration: exact-integer trend fit, " +
        "90% calibration quantile, held-out coverage"),
    Q("q242_target_encode", targetEncode, Some(targetEncodeSql),
      "leave-one-out target encoding: per-group (sum,count) broadcast " +
        "back, map-only (sum-own)/(n-1) in exact cents"),
    Q("q233_decay_score", decayScore, Some(decayScoreSql),
      "exponential-decay recency spend: integer micro-unit halving per " +
        "30-day bucket via arithmetic shift, exact at any order"),
    Q("q235_two_hop_reach", twoHopReach, Some(twoHopReachSql),
      "two-hop reach per supplier on the sharp co-supply graph: " +
        "1+2-hop distinct targets, degree-bounded equi-join"),
    Q("q230_cuped", cuped, Some(cupedSql),
      "CUPED variance-reduced A/B means from exact integer-cent " +
        "moments: theta = cov/var pooled, per-arm adjusted means"),
    Q("q231_cramers_v", cramersV, Some(cramersVSql),
      "Cramer's V nation x segment association: exact BIGINT cell " +
        "deviations, decimal-cast order-independent chi2 sum"),
    Q("q226_spearman", spearman, Some(spearmanSql),
      "Spearman rank correlation with average-rank ties (doubled " +
        "integral ranks), exact decimal moments, IEEE closed form"),
    Q("q227_ks_test", ksTest, Some(ksTestSql),
      "two-sample Kolmogorov-Smirnov drift test from exact integer " +
        "ECDF gap numerators, one final division"),
    Q("q228_ols", olsFit, Some(olsFitSql),
      "per-group OLS slope/intercept/r2 via closed-form normal " +
        "equations over exact decimal moments, one shuffle"),
    Q("q222_sorted_neighborhood", sortedNeighborhood,
      Some(sortedNeighborhoodSql),
      "sorted-neighborhood ER: one cheap-key sort, sliding window-4 " +
        "equi-join candidates, integer Fellegi-Sunter scores"),
    Q("q224_kcore", kCore3, Some(kCore3Sql),
      "3-core decomposition by 6-round peeling (degree aggregate + " +
        "semi-joins per round) vs unrolled-CTE oracle"),
    Q("q225_assortativity", assortativityQ, Some(assortativitySql),
      "degree assortativity r from exact BIGINT moment sums, one " +
        "mirrored IEEE closed form"),
    Q("q220_k_anonymity", kAnonymity, Some(kAnonymitySql),
      "k-anonymity risk audit: quasi-identifier classes below k=5 with " +
        "an l-diversity column, one aggregate"),
    Q("q216_hhi", hhi, Some(hhiSql),
      "Herfindahl revenue-concentration index per nation from exact " +
        "integer cent shares"),
    Q("q217_decile_lift", decileLift, Some(decileLiftSql),
      "ranker decile lift table: deterministic score deciles, positive " +
        "rate, cumulative capture, lift vs base"),
    Q("q211_fs_linkage", fsLinkage, Some(fsLinkageSql),
      "Fellegi-Sunter record linkage: nation-blocked pairs, integer " +
        "milli-log-odds field weights, exact match scores"),
    Q("q212_anova_f", anovaF, Some(anovaFSql),
      "one-way ANOVA F from exact per-group sufficient statistics " +
        "(decimal square sums, mirrored IEEE F)"),
    Q("q206_quantile_norm", quantileNorm, Some(quantileNormSql),
      "quantile normalization across priority classes: deterministic " +
        "ntile ranks, decimal-exact cross-group bucket means, broadcast " +
        "reference join"),
    Q("q207_clustering_coeff", clusteringCoeff, Some(clusteringCoeffSql),
      "local clustering coefficient on the co-supply graph (degree " +
        "aggregate + wedge-join triangles, one exact IEEE division)"),
    Q("q170_jw_er", jwEr, Some(jwErSql),
      "entity resolution on transposition-dirtied names via the native " +
        "jaro_winkler codegen kernel, tail-blocked pairs — hash-checked " +
        "against DuckDB's jaro_winkler_similarity (bit-identical doubles)"),
    Q("q165_table_checksum", tableChecksum, Some(tableChecksumSql),
      "order-independent per-month content checksum (md5-60bit XOR + " +
        "mod-p sum folds; map-side-combinable at any scale)"),
    Q("q135_equidepth_hist", equidepthHistogram, Some(equidepthSql),
      "equi-depth 10-bucket histogram per flag (deterministic ntile)"),
    Q("q136_zscore_outliers", zscoreOutliers, Some(zscoreSql),
      "z-score outlier scan from exact decimal moments, broadcast stats"),
    Q("q131_winsorize", winsorize, Some(winsorizeSql),
      "winsorized per-flag price rollup: exact rank-selected p05/p95 " +
        "bounds, clipped decimal sum"),
    Q("q132_gini_lexical", giniLexical, Some(giniSql),
      "per-doc lexical concentration via Gini impurity (ln-free, " +
        "exact-count arithmetic)"),
    Q("q119_triangles", triangles, Some(trianglesSql),
      "per-supplier triangle counts, degree-oriented wedge join vs naive " +
        "3-way self-join oracle"),
    Q("q139_bfs_hops", bfsHops, Some(bfsHopsSql),
      "multi-source BFS hop distance (frontier expansion) vs " +
        "recursive-CTE MIN(dist) oracle"),
    Q("q122_skyline", skyline, Some(skylineSql),
      "2-D Pareto skyline via per-size aggregate + broadcast threshold " +
        "(no self-join)"),
    Q("q115_profile", profile, Some(profileSql),
      "ANALYZE-style numeric column profile (min/max/nulls/exact ndv, " +
        "one aggregate pass)"),
    Q("q116_integrity", integrity, Some(integritySql),
      "dbt-style integrity suite: pk uniqueness, FK containment, " +
        "accepted-values domain"),
    Q("q107_zorder_keys", zorderKeys, Some(zorderSql),
      "codegen Morton/z-order clustering key vs 64-term SQL bit interleave"),
    Q("q197_sample_quantiles", sampleQuantiles, None,
      "bottom-k-by-hash deterministic sample quantiles with exact audit " +
        "(bounded mergeable state; rows-only, spec-checked)"),
    Q("q195_grid_join", gridJoin, Some(gridJoinSql),
      "spatial radius self-join via 3x3 grid-cell equi-join (integer " +
        "cells + squared distances; oracle is the naive cross form)"),
    Q("q190_cdc_apply", cdcApply, Some(cdcApplySql),
      "CDC apply: ordered I/U/D change log collapsed per key (window " +
        "over the log only) then one anti-join+union merge into orders"),
    Q("q187_kmv_distinct", kmvDistinct, None,
      "KMV distinct-user sketch per event type (bounded k-min-hash " +
        "state, relationally auditable; rows-only, spec-checked)"),
    Q("q106_hll_rollup", hllRollup, None,
      "per-day HLL sketches unioned to distinct-user estimates (spec-bounded)"),
    Q("q172_personalized_pagerank", ppr, Some(pprSql),
      "personalized PageRank from seed customers c1-c3 (restart mass " +
        "to seeds only; exact fixed-point micro-units)"),
    Q("q105_pagerank", pagerank, Some(pagerankSql),
      "5-round PageRank on the customer-supplier graph (fixed-point rounds)"),
    Q("q95_recursive_cte", recursiveCte, Some(recursiveCteSql),
      "WITH RECURSIVE month generator + gap-fill join, verbatim on both engines"),
    Q("q94_fuzzy_match", fuzzyMatch, Some(fuzzyMatchSql),
      "blocked levenshtein entity matching (no all-pairs stage)"),
    Q("q91_histogram", histogram, Some(histogramSql),
      "fixed-width width_bucket histogram"),
    Q("q92_date_spine", dateSpine, Some(dateSpineSql),
      "generated calendar spine + zero-filled monthly rollup"),
    Q("q93_approx_quantile", approxQuantiles, None,
      "approx_percentile sketch (rows-only; spec-bounded vs exact)"),
    Q("q86_group_by_all", groupByAll, Some(groupByAllSql),
      "GROUP BY ALL, verbatim statement on both engines"),
    Q("q87_try_pack", tryPack, Some(tryPackSql),
      "error-safe try_divide/try_cast/try_add under ANSI mode"),
    Q("q34_stats_pack", statsPack, Some(statsPackSql),
      "deterministic var/stddev/covar/corr from decimal moment sums"),
    Q("q40_percentile_pack", percentilePack, Some(percentilePackSql),
      "exact median/p90 via rank selection (window + aggregate)"),
    Q("q41_array_pack", arrayPack, Some(arrayPackSql),
      "array scalar functions over tokenized text"),
    Q("q42_unpivot", unpivotMetrics, Some(unpivotMetricsSql),
      "unpivot/melt of wide aggregates (inverse of pivot)"),
    Q("q43_systematic_sample", systematicSample, Some(systematicSampleSql),
      "deterministic keyed-residue sampling + aggregate"),
    Q("q44_range_frame", rangeFrame, Some(rangeFrameSql),
      "RANGE window frame (trailing 10 event-time minutes per user)"),
    Q("q56_regex_pack", regexPack, Some(regexPackSql),
      "regexp extract/extract_all/replace/match scalar pack"),
    Q("q58_udf_scalar", udfScalar, Some(udfScalarSql),
      "Scala closure UDFs pinned against the equivalent SQL"),
    Q("q59_salted_join", saltedJoinAgg, Some(saltedJoinAggSql),
      "skew-salted join (deterministic salt, x8 replication) == plain join"),
    Q("q157_acf", acf, Some(acfSql),
      "autocorrelation of the daily-revenue series at lags 1-7 " +
        "(decimal-exact centered products, tiny post-aggregate window)"),
    Q("q160_benford", benford, Some(benfordSql),
      "Benford first-digit audit of prices (integer-cents digit " +
        "extraction, literal log10 expectations)"),
    Q("q162_degree_hist", degreeHist, Some(degreeHistSql),
      "power-of-two degree histogram of the co-supply graph " +
        "(bit-length buckets, no floating log2)"))

  // ---- time-series diagnostics ----------------------------------------

  /** Lag-1..7 autocorrelation of the daily revenue series. The series is
    * the OUTPUT of a distributed aggregate (one row per calendar day —
    * bounded by the calendar, not by sf), so the ordered lag window runs
    * on an aggregate-sized frame; the scan/aggregate below it is the
    * only data-sized work. Centered products go through the
    * [[graft.ops.Det]] decimal recipe so the sums hash-match DuckDB
    * regardless of partition order; the final acf is one double
    * division of two order-independent sums. */
  def acf(spark: SparkSession, dir: String): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(dsum(col("o_totalprice")).as("rev"))
    val stats = daily.agg(davg(col("rev")).as("m"))
    // scale to millions BEFORE the centered products: at daily-revenue
    // magnitude (1e6+) a product's double ulp exceeds the decimal(38,6)
    // step, and the two engines' double→decimal casts (shortest-string
    // vs exact-binary) round the sub-ulp digits differently. O(1)-sized
    // products keep the 6th decimal well inside double precision; the
    // acf ratio is invariant to the (exact, power-of-ten) scaling.
    val centered = daily.crossJoin(broadcast(stats))
      .withColumn("c", (col("rev") - col("m")) / lit(1e6))
    val den = centered.agg(dsum(col("c") * col("c")).as("den"))
    val w = Window.orderBy(col("d"))
    val legs = (1 to 7).map { k =>
      centered
        .withColumn("cl", lag(col("c"), k).over(w))
        .agg(lit(k).as("lag"), count(col("cl")).as("n_pairs"),
          dsum(col("c") * col("cl")).as("num"))
    }
    legs.reduce(_.unionByName(_))
      .crossJoin(broadcast(den))
      .select(col("lag"), col("n_pairs"), (col("num") / col("den")).as("acf"))
      .orderBy(col("lag"))
  }

  private lazy val acfSql = {
    val legs = (1 to 7).map { k =>
      s"""SELECT $k AS lag, COUNT(cl$k) AS n_pairs,
         |  ${sqlSum(s"c * cl$k")} AS num
         |FROM l""".stripMargin
    }.mkString("", "\nUNION ALL\n", "")
    s"""WITH daily AS (
       |  SELECT CAST(o_orderdate AS DATE) AS d,
       |    ${sqlSum("o_totalprice")} AS rev
       |  FROM orders GROUP BY 1
       |), s AS (
       |  SELECT ${sqlAvg("rev")} AS m FROM daily
       |), cent AS (
       |  SELECT d, (rev - m) / 1e6 AS c FROM daily, s
       |), den AS (
       |  SELECT ${sqlSum("c * c")} AS den FROM cent
       |), l AS (
       |  SELECT c,
       |    ${(1 to 7).map(k => s"lag(c, $k) OVER (ORDER BY d) AS cl$k")
                 .mkString(",\n    ")}
       |  FROM cent
       |), legs AS (
       |$legs
       |)
       |SELECT lag, n_pairs, num / (SELECT den FROM den) AS acf
       |FROM legs ORDER BY lag""".stripMargin
  }

  // ---- data-quality audits ---------------------------------------------

  /** Benford's-law first-digit audit of line-item prices. The first
    * digit is extracted through exact integer cents (round(p*100) →
    * BIGINT → leading character): doubles never render to strings, so
    * both engines see the identical digit. Expected shares are literal
    * log10(1+1/d) constants — the same 17-digit literals in both the
    * Spark plan and the oracle, so no engine evaluates a log. */
  def benford(spark: SparkSession, dir: String): DataFrame = {
    val counts = Catalog.load(spark, dir, "lineitem")
      .filter(col("l_extendedprice") > 0)
      .select(substring(round(col("l_extendedprice") * 100)
        .cast("long").cast("string"), 1, 1).as("digit"))
      .groupBy(col("digit")).agg(count(lit(1)).as("n"))
    val tot = counts.agg(sum(col("n")).as("total"))
    val expect = BenfordP.foldLeft(lit(null).cast("double")) {
      case (acc, (d, p)) => when(col("digit") === d, lit(p)).otherwise(acc)
    }
    counts.crossJoin(broadcast(tot))
      .select(col("digit"), col("n"),
        (col("n").cast("double") / col("total")).as("share"),
        expect.as("benford_p"))
      .withColumn("delta", col("share") - col("benford_p"))
      .orderBy(col("digit"))
  }

  /** log10(1 + 1/d), d = 1..9 — shortest-roundtrip literals shared with
    * the oracle text so both engines parse the identical double. */
  private lazy val BenfordP = Seq(
    "1" -> "0.3010299956639812", "2" -> "0.17609125905568124",
    "3" -> "0.12493873660829992", "4" -> "0.09691001300805642",
    "5" -> "0.07918124604762482", "6" -> "0.06694678963061322",
    "7" -> "0.05799194697768673", "8" -> "0.05115252244738129",
    "9" -> "0.04575749056067514").map { case (d, p) => (d, p.toDouble) }

  private lazy val benfordSql = {
    val cases = BenfordP.map { case (d, p) => s"WHEN '$d' THEN $p" }
      .mkString(" ")
    s"""WITH digits AS (
       |  SELECT substring(CAST(CAST(round(l_extendedprice * 100) AS BIGINT)
       |    AS VARCHAR), 1, 1) AS digit
       |  FROM lineitem WHERE l_extendedprice > 0
       |), counts AS (
       |  SELECT digit, COUNT(*) AS n FROM digits GROUP BY 1
       |)
       |SELECT digit, n,
       |  CAST(n AS DOUBLE) / (SELECT SUM(n) FROM counts) AS share,
       |  CASE digit $cases END AS benford_p,
       |  CAST(n AS DOUBLE) / (SELECT SUM(n) FROM counts)
       |    - CASE digit $cases END AS delta
       |FROM counts ORDER BY digit""".stripMargin
  }

  // ---- graph diagnostics -----------------------------------------------

  /** Power-of-two degree histogram of the high-volume co-supply graph
    * (same edge construction as q119's triangles). Buckets come from the
    * INTEGER bit length of the degree (`conv(_, 10, 2)` string length —
    * no floating log2, whose 1-ulp error at exact powers of two would
    * flip a bucket), so [1], [2-3], [4-7], ... Degree counting unions
    * both endpoint columns — one shuffle on the node id. */
  def degreeHist(spark: SparkSession, dir: String): DataFrame = {
    val edges = coSupplyEdges(spark, dir)
    val deg = edges.select(col("a").as("node"))
      .unionAll(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("degree"))
    deg
      .withColumn("bits", length(conv(col("degree"), 10, 2)))
      .withColumn("bucket_lo",
        expr("CAST(shiftleft(CAST(1 AS BIGINT), bits - 1) AS BIGINT)"))
      .groupBy(col("bucket_lo"))
      .agg(count(lit(1)).as("n_nodes"), min(col("degree")).as("min_deg"),
        max(col("degree")).as("max_deg"))
      .orderBy(col("bucket_lo"))
  }

  private lazy val degreeHistSql =
    """WITH pe AS (
      |  SELECT DISTINCT l_orderkey AS o, l_suppkey AS s
      |  FROM lineitem WHERE l_quantity >= 45
      |), edges AS (
      |  SELECT DISTINCT x.s AS a, y.s AS b
      |  FROM pe x JOIN pe y ON x.o = y.o AND x.s < y.s
      |), deg AS (
      |  SELECT node, COUNT(*) AS degree FROM (
      |    SELECT a AS node FROM edges
      |    UNION ALL
      |    SELECT b AS node FROM edges
      |  ) GROUP BY 1
      |)
      |SELECT CAST(1 AS BIGINT) << (length(ltrim(bin(CAST(degree AS BIGINT)), '0')) - 1)
      |    AS bucket_lo,
      |  COUNT(*) AS n_nodes, MIN(degree) AS min_deg, MAX(degree) AS max_deg
      |FROM deg GROUP BY 1 ORDER BY bucket_lo""".stripMargin
}
