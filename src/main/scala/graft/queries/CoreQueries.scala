package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Core relational surface: scans (S1/S2 analogs), projections/filters
  * (P1-P4), multi-way inner equi-joins (J1-J3 analogs), hash aggregation
  * (A1), derived-metric expressions (§2.6 analogs), sort/limit.
  *
  * Scale notes: every query here is a declarative plan — filters and
  * column selection reach the parquet scan (PushedFilters/ReadSchema),
  * dimension joins broadcast (region/nation/customer are tiny vs lineitem),
  * aggregates run partial→final with map-side combine. Nothing collects to
  * the driver.
  */
object CoreQueries {

  /** TPC-H Q1-shaped pricing summary: filter → groupBy → 6 aggregates.
    * Reference analog: the A1 groupBy+sum (dag-transform.py:166-169) plus
    * the §2.6 expr arithmetic, on the fixture star schema. */
  def pricingSummary(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.filter(col("l_shipdate") < lit("2000-06-01").cast("timestamp"))
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        dsum(col("l_quantity")).as("sum_qty"),
        dsum(col("l_extendedprice")).as("sum_base_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("sum_disc_price"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount")) * (lit(1) + col("l_tax"))).as("sum_charge"),
        davg(col("l_quantity")).as("avg_qty"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val pricingSummarySql =
    s"""SELECT l_returnflag, l_linestatus,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  ${sqlSum("l_extendedprice")} AS sum_base_price,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS sum_disc_price,
       |  ${sqlSum("l_extendedprice * (1 - l_discount) * (1 + l_tax)")} AS sum_charge,
       |  ${sqlAvg("l_quantity")} AS avg_qty,
       |  COUNT(*) AS count_order
       |FROM lineitem
       |WHERE l_shipdate < TIMESTAMP '2000-06-01'
       |GROUP BY l_returnflag, l_linestatus
       |ORDER BY l_returnflag, l_linestatus""".stripMargin

  /** Flagship mart: 5-way inner equi-join chain (J1 analog: left-deep on
    * keys) → region/nation rollup → derived metrics (§2.6 analog).
    * Dimensions (region, nation, customer, orders-side keys) broadcast;
    * only the lineitem-side aggregation shuffles. */
  def regionNationMart(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val o = Catalog.load(spark, dir, "orders")
    val c = Catalog.load(spark, dir, "customer")
    val n = Catalog.load(spark, dir, "nation")
    val r = Catalog.load(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(col("r_name"), col("n_name"))
      .agg(
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        countDistinct(col("o_orderkey")).as("n_orders"),
        dsum(col("l_quantity")).as("sum_qty"),
        count(lit(1)).as("n_lines"))
      // §2.6-style derived metrics, computed from the deterministic sums
      .withColumn("revenue_per_order", col("revenue") / col("n_orders"))
      .withColumn("qty_per_line", col("sum_qty") / col("n_lines"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val regionNationMartSql =
    s"""SELECT r_name, n_name,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  COUNT(DISTINCT o_orderkey) AS n_orders,
       |  ${sqlSum("l_quantity")} AS sum_qty,
       |  COUNT(*) AS n_lines,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} / COUNT(DISTINCT o_orderkey) AS revenue_per_order,
       |  ${sqlSum("l_quantity")} / COUNT(*) AS qty_per_line
       |FROM lineitem
       |JOIN orders   ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation   ON c_nationkey = n_nationkey
       |JOIN region   ON n_regionkey = r_regionkey
       |GROUP BY r_name, n_name
       |ORDER BY r_name, n_name""".stripMargin

  /** Top-k: revenue per supplier, ordered, limit 10 → Catalyst plans
    * TakeOrderedAndProject (no global sort materialization). */
  def topSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val s = Catalog.load(spark, dir, "supplier")
    // Aggregate BELOW the join: the rollup collapses the fact table to
    // one row per supplier before any join work, so the join touches
    // |suppliers| rows instead of |lineitem| — Catalyst doesn't push
    // aggregates through joins itself, so this is written in the shape
    // a 100 TB plan needs. Inner join keeps the original semantics
    // (suppliers with no lineitem rows don't appear).
    val perSupp = li.groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("supp_revenue"))
    perSupp.join(broadcast(s), perSupp("l_suppkey") === s("s_suppkey"))
      .select(col("s_suppkey"), col("s_name"), col("supp_revenue"))
      .orderBy(col("supp_revenue").desc, col("s_suppkey"))
      .limit(10)
  }

  private val topSuppliersSql =
    s"""SELECT s_suppkey, s_name,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS supp_revenue
       |FROM lineitem JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY s_suppkey, s_name
       |ORDER BY supp_revenue DESC, s_suppkey
       |LIMIT 10""".stripMargin

  /** Pure filter + projection: predicate and column pruning must reach the
    * parquet scan (PushedFilters / 4-column ReadSchema). */
  def filterProject(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.filter(
        col("l_shipdate") >= lit("1998-01-01").cast("timestamp") &&
        col("l_shipdate") < lit("1998-07-01").cast("timestamp") &&
        col("l_discount") >= lit(0.05) && col("l_quantity") < lit(25))
      .select(
        col("l_orderkey"), col("l_linenumber"),
        col("l_extendedprice"), col("l_discount"),
        col("l_shipdate").cast("date").as("ship_date"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val filterProjectSql =
    """SELECT l_orderkey, l_linenumber, l_extendedprice, l_discount,
      |  CAST(l_shipdate AS DATE) AS ship_date
      |FROM lineitem
      |WHERE l_shipdate >= TIMESTAMP '1998-01-01'
      |  AND l_shipdate < TIMESTAMP '1998-07-01'
      |  AND l_discount >= 0.05 AND l_quantity < 25
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Full RelationalGroupedDataset surface: min/max/exact avg/count
    * (SURVEY §2.5 — the oracle harness exercises what the reference
    * never used). */
  def aggPack(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    o.groupBy(col("o_orderpriority"))
      .agg(
        count(lit(1)).as("n"),
        min(col("o_totalprice")).as("min_price"),
        max(col("o_totalprice")).as("max_price"),
        davg(col("o_totalprice")).as("avg_price"),
        min(col("o_orderdate")).cast("date").as("first_date"),
        max(col("o_orderdate")).cast("date").as("last_date"))
      .orderBy(col("o_orderpriority"))
  }

  private val aggPackSql =
    s"""SELECT o_orderpriority, COUNT(*) AS n,
       |  MIN(o_totalprice) AS min_price, MAX(o_totalprice) AS max_price,
       |  ${sqlAvg("o_totalprice")} AS avg_price,
       |  CAST(MIN(o_orderdate) AS DATE) AS first_date,
       |  CAST(MAX(o_orderdate) AS DATE) AS last_date
       |FROM orders
       |GROUP BY o_orderpriority
       |ORDER BY o_orderpriority""".stripMargin

  /** HLL++ approximate distinct next to the exact count (approx side is
    * engine-specific → rows-only driver check; accuracy spec-checked). */
  def approxDistinct(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.groupBy(col("l_returnflag"))
      .agg(
        countDistinct(col("l_orderkey")).as("exact_orders"),
        approx_count_distinct(col("l_orderkey")).as("approx_orders"))
      .orderBy(col("l_returnflag"))
  }

  /** TPC-H Q4-shaped priority check: date-windowed orders that have at
    * least one late-shipped line — a semi join whose condition mixes the
    * equi key with a non-equi predicate (l_shipdate > o_orderdate). */
  def priorityCheck(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate") >= lit("1997-07-01").cast("timestamp") &&
        col("o_orderdate") < lit("1997-10-01").cast("timestamp"))
    val li = Catalog.load(spark, dir, "lineitem")
    o.join(li,
        o("o_orderkey") === li("l_orderkey") && li("l_shipdate") > o("o_orderdate"),
        "left_semi")
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n_orders"))
      .orderBy(col("o_orderpriority"))
  }

  private val priorityCheckSql =
    """SELECT o_orderpriority, COUNT(*) AS n_orders
      |FROM orders
      |WHERE o_orderdate >= TIMESTAMP '1997-07-01'
      |  AND o_orderdate < TIMESTAMP '1997-10-01'
      |  AND EXISTS (SELECT 1 FROM lineitem
      |              WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate)
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** TPC-H Q8-shaped market share: per year, ASIA's fraction of global
    * revenue — conditional aggregation over a two-fact join, with the
    * share ratio computed from two deterministic decimal sums. */
  def marketShare(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val o = Catalog.load(spark, dir, "orders")
    val c = Catalog.load(spark, dir, "customer")
    val n = Catalog.load(spark, dir, "nation")
    val r = Catalog.load(spark, dir, "region")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(c), o("o_custkey") === c("c_custkey"))
      .join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .groupBy(year(col("o_orderdate")).cast("long").as("yr"))
      .agg(
        dsum(when(col("r_name") === "ASIA",
          col("l_extendedprice") * (lit(1) - col("l_discount"))).otherwise(0.0))
          .as("asia_revenue"),
        dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("total_revenue"))
      .withColumn("asia_share",
        col("asia_revenue") / nullif(col("total_revenue"), lit(0.0)))
      .orderBy(col("yr"))
  }

  private val marketShareSql =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr,
       |  ${sqlSum("CASE WHEN r_name = 'ASIA' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")} AS asia_revenue,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS total_revenue,
       |  ${sqlSum("CASE WHEN r_name = 'ASIA' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END")}
       |    / nullif(${sqlSum("l_extendedprice * (1 - l_discount)")}, 0.0) AS asia_share
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN customer ON o_custkey = c_custkey
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY 1
       |ORDER BY yr""".stripMargin

  /** TPC-H Q9-shaped brand/year revenue: part + supplier joins into the
    * fact table, grouped by brand and order year. */
  def brandYearRevenue(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    val o = Catalog.load(spark, dir, "orders")
    val p = Catalog.load(spark, dir, "part")
    val s = Catalog.load(spark, dir, "supplier")
    li.join(o, li("l_orderkey") === o("o_orderkey"))
      .join(broadcast(p), li("l_partkey") === p("p_partkey"))
      .join(broadcast(s), li("l_suppkey") === s("s_suppkey"))
      .groupBy(col("p_brand"), year(col("o_orderdate")).cast("long").as("yr"))
      .agg(dsum(col("l_extendedprice") * (lit(1) - col("l_discount"))).as("revenue"),
        countDistinct(col("s_suppkey")).as("n_suppliers"))
      .orderBy(col("p_brand"), col("yr"))
  }

  private val brandYearRevenueSql =
    s"""SELECT p_brand, CAST(year(o_orderdate) AS BIGINT) AS yr,
       |  ${sqlSum("l_extendedprice * (1 - l_discount)")} AS revenue,
       |  COUNT(DISTINCT s_suppkey) AS n_suppliers
       |FROM lineitem
       |JOIN orders ON l_orderkey = o_orderkey
       |JOIN part ON l_partkey = p_partkey
       |JOIN supplier ON l_suppkey = s_suppkey
       |GROUP BY p_brand, 2
       |ORDER BY p_brand, yr""".stripMargin

  /** Correlated LATERAL subquery through the SQL entry point: per nation,
    * its top-2 customers by balance. The statement runs VERBATIM on both
    * engines (Catalyst plans the lateral as a rewritten join, DuckDB as a
    * dependent join). */
  def lateralTopCustomers(spark: SparkSession, dir: String): DataFrame = {
    Catalog.load(spark, dir, "nation").createOrReplaceTempView("nation")
    Catalog.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(lateralTopCustomersSql)
  }

  private val lateralTopCustomersSql =
    """SELECT n_name, c_name, c_acctbal
      |FROM nation, LATERAL (
      |  SELECT c_name, c_acctbal FROM customer
      |  WHERE c_nationkey = n_nationkey
      |  ORDER BY c_acctbal DESC, c_custkey
      |  LIMIT 2)
      |ORDER BY n_name, c_acctbal DESC, c_name""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q07_priority_check", priorityCheck, Some(priorityCheckSql),
      "date-windowed semi join with non-equi condition (TPC-H Q4 shape)"),
    Q("q08_market_share", marketShare, Some(marketShareSql),
      "conditional-aggregation market share per year (TPC-H Q8 shape)"),
    Q("q09_brand_year_revenue", brandYearRevenue, Some(brandYearRevenueSql),
      "brand x year revenue over part/supplier joins (TPC-H Q9 shape)"),
    Q("q49_lateral_topk", lateralTopCustomers, Some(lateralTopCustomersSql),
      "correlated LATERAL subquery, verbatim statement on both engines"),
    Q("q05_agg_pack", aggPack, Some(aggPackSql),
      "min/max/avg/count aggregate surface"),
    Q("q06_approx_distinct", approxDistinct, None,
      "approx_count_distinct (HLL++) next to exact (spec-checked accuracy)"),
    Q("q01_pricing_summary", pricingSummary, Some(pricingSummarySql),
      "filter → hash-agg (partial/final) with deterministic decimal sums"),
    Q("q02_region_nation_mart", regionNationMart, Some(regionNationMartSql),
      "5-way broadcast join chain → rollup → derived metrics (flagship)"),
    Q("q03_top_suppliers", topSuppliers, Some(topSuppliersSql),
      "join → agg → TakeOrderedAndProject top-k"),
    Q("q04_filter_project", filterProject, Some(filterProjectSql),
      "pushdown filter + pruned projection"))
}
