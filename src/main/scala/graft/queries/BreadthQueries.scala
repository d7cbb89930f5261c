package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.ops.Det._
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Breadth operators beyond the reference surface (SURVEY §2.7 table):
  * semi/anti/outer joins, set operations, distinct, cube/rollup, case/when,
  * string/date/JSON scalar packs, having. Each oracle-checked.
  */
object BreadthQueries {

  // ---- semi / anti / outer joins --------------------------------------

  /** left-semi = EXISTS: customers having at least one big order.
    * Plans as a broadcast/shuffled semi join — no row duplication. */
  def semiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer")
    val o = Catalog.load(spark, dir, "orders")
      .filter(col("o_totalprice") > 300000)
    c.join(o, c("c_custkey") === o("o_custkey"), "left_semi")
      .select(col("c_custkey"), col("c_name"), col("c_mktsegment"))
      .orderBy(col("c_custkey"))
  }

  private val semiJoinSql =
    """SELECT c_custkey, c_name, c_mktsegment
      |FROM customer
      |WHERE EXISTS (SELECT 1 FROM orders
      |              WHERE o_custkey = c_custkey AND o_totalprice > 300000)
      |ORDER BY c_custkey""".stripMargin

  /** left-anti = NOT EXISTS: customers with no urgent order. */
  def antiJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer")
    val o = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_anti")
      .select(col("c_custkey"), col("c_acctbal"))
      .orderBy(col("c_custkey"))
  }

  private val antiJoinSql =
    """SELECT c_custkey, c_acctbal
      |FROM customer
      |WHERE NOT EXISTS (SELECT 1 FROM orders
      |                  WHERE o_custkey = c_custkey
      |                    AND o_orderpriority = '1-URGENT')
      |ORDER BY c_custkey""".stripMargin

  /** left outer join preserving customers with zero orders (count 0,
    * not dropped — the opposite of the marts' inner-join semantics). */
  def outerJoin(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer")
    val o = Catalog.load(spark, dir, "orders")
    c.join(o, c("c_custkey") === o("o_custkey"), "left_outer")
      .groupBy(col("c_custkey"))
      .agg(
        count(col("o_orderkey")).as("n_orders"), // counts non-null only
        dsum(coalesce(col("o_totalprice"), lit(0.0))).as("total_spend"))
      .orderBy(col("c_custkey"))
  }

  private val outerJoinSql =
    s"""SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       |  ${sqlSum("COALESCE(o_totalprice, 0.0)")} AS total_spend
       |FROM customer LEFT JOIN orders ON c_custkey = o_custkey
       |GROUP BY c_custkey
       |ORDER BY c_custkey""".stripMargin

  /** FULL OUTER join: two disjoint-key aggregates stitched so unmatched
    * sides survive from BOTH inputs (vs q22's left-outer). */
  def fullOuterJoin(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val big = o.filter(col("o_totalprice") > 400000)
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_big"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT")
      .groupBy(col("o_custkey").as("k")).agg(count(lit(1)).as("n_urgent"))
    big.join(urgent, Seq("k"), "full_outer")
      .select(col("k").as("o_custkey"),
        coalesce(col("n_big"), lit(0L)).as("n_big"),
        coalesce(col("n_urgent"), lit(0L)).as("n_urgent"))
      .orderBy(col("o_custkey"))
  }

  private val fullOuterJoinSql =
    """WITH big AS (
      |  SELECT o_custkey AS k, COUNT(*) AS n_big
      |  FROM orders WHERE o_totalprice > 400000 GROUP BY 1
      |), urgent AS (
      |  SELECT o_custkey AS k, COUNT(*) AS n_urgent
      |  FROM orders WHERE o_orderpriority = '1-URGENT' GROUP BY 1
      |)
      |SELECT COALESCE(big.k, urgent.k) AS o_custkey,
      |  COALESCE(n_big, 0) AS n_big,
      |  COALESCE(n_urgent, 0) AS n_urgent
      |FROM big FULL OUTER JOIN urgent ON big.k = urgent.k
      |ORDER BY o_custkey""".stripMargin

  /** Explicit CROSS join of the two smallest dims (the deliberate
    * cartesian surface — everything else in the engine joins on keys). */
  def crossJoinDims(spark: SparkSession, dir: String): DataFrame = {
    val r = Catalog.load(spark, dir, "region").select(col("r_name"))
    val n = Catalog.load(spark, dir, "nation").select(col("n_name"))
    r.crossJoin(n)
      .select(col("r_name"), col("n_name"))
      .orderBy(col("r_name"), col("n_name"))
  }

  private val crossJoinDimsSql =
    """SELECT r_name, n_name
      |FROM region CROSS JOIN nation
      |ORDER BY r_name, n_name""".stripMargin

  /** unionByName with allowMissingColumns: two differently-shaped
    * projections merge by NAME (missing columns null-filled) — schema
    * evolution's everyday operation; positional union would silently
    * misalign. */
  def unionByNameQ(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val a = o.filter(col("o_totalprice") > 450000)
      .select(col("o_orderkey"), col("o_totalprice"), col("o_orderstatus"))
    val b = o.filter(col("o_orderpriority") === "1-URGENT" && col("o_totalprice") > 350000)
      .select(col("o_orderkey"), col("o_orderpriority"), col("o_totalprice"))
    a.unionByName(b, allowMissingColumns = true)
      .select(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
      .orderBy(col("o_orderkey"), col("o_totalprice"),
        col("o_orderstatus"), col("o_orderpriority"))
  }

  private val unionByNameSql =
    """SELECT o_orderkey, o_totalprice, o_orderstatus, o_orderpriority FROM (
      |  SELECT o_orderkey, o_totalprice, o_orderstatus, NULL AS o_orderpriority
      |  FROM orders WHERE o_totalprice > 450000
      |  UNION ALL BY NAME
      |  SELECT o_orderkey, o_orderpriority, o_totalprice, NULL AS o_orderstatus
      |  FROM orders WHERE o_orderpriority = '1-URGENT' AND o_totalprice > 350000
      |)
      |ORDER BY o_orderkey, o_totalprice, o_orderstatus, o_orderpriority""".stripMargin

  /** Null-safe equality (`<=>` / IS NOT DISTINCT FROM): NULL keys match
    * each other instead of vanishing — the semantics dedup pipelines need
    * when the join key itself may be absent. */
  def nullSafeEq(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "documents")
      .select(col("doc_id"),
        when(col("lang") === "und", lit(null)).otherwise(col("lang")).as("lg"))
    val counts = d.groupBy(col("lg").as("lg2")).agg(count(lit(1)).as("n_lang"))
    d.join(counts, col("lg") <=> col("lg2"))
      .select(col("doc_id"), coalesce(col("lg"), lit("?")).as("lang_or_q"), col("n_lang"))
      .orderBy(col("doc_id"))
  }

  private val nullSafeEqSql =
    """WITH d AS (
      |  SELECT doc_id, CASE WHEN lang = 'und' THEN NULL ELSE lang END AS lg
      |  FROM documents
      |), c AS (
      |  SELECT lg, COUNT(*) AS n_lang FROM d GROUP BY lg
      |)
      |SELECT d.doc_id, COALESCE(d.lg, '?') AS lang_or_q, c.n_lang
      |FROM d JOIN c ON d.lg IS NOT DISTINCT FROM c.lg
      |ORDER BY d.doc_id""".stripMargin

  // ---- set operations -------------------------------------------------

  /** UNION (distinct) ∪ INTERSECT ∪ EXCEPT in one result: tags each
    * custkey with its set membership across two predicates. */
  def setOps(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val big = o.filter(col("o_totalprice") > 250000).select(col("o_custkey"))
    val urgent = o.filter(col("o_orderpriority") === "1-URGENT").select(col("o_custkey"))
    val union = big.union(urgent).distinct().withColumn("set_op", lit("union"))
    val inter = big.intersect(urgent).withColumn("set_op", lit("intersect"))
    val exc = big.except(urgent).withColumn("set_op", lit("except"))
    union.union(inter).union(exc)
      .orderBy(col("set_op"), col("o_custkey"))
  }

  private val setOpsSql =
    """WITH big AS (SELECT o_custkey FROM orders WHERE o_totalprice > 250000),
      |     urgent AS (SELECT o_custkey FROM orders WHERE o_orderpriority = '1-URGENT')
      |SELECT o_custkey, set_op FROM (
      |  SELECT o_custkey, 'union' AS set_op FROM (SELECT o_custkey FROM big UNION SELECT o_custkey FROM urgent)
      |  UNION ALL
      |  SELECT o_custkey, 'intersect' FROM (SELECT o_custkey FROM big INTERSECT SELECT o_custkey FROM urgent)
      |  UNION ALL
      |  SELECT o_custkey, 'except' FROM (SELECT o_custkey FROM big EXCEPT SELECT o_custkey FROM urgent)
      |)
      |ORDER BY set_op, o_custkey""".stripMargin

  // ---- distinct / dropDuplicates --------------------------------------

  /** dropDuplicates on a projection + exact distinct count per group. */
  def distinctOps(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.select(col("l_returnflag"), col("l_linestatus"), col("l_suppkey"))
      .dropDuplicates()
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(countDistinct(col("l_suppkey")).as("n_supp"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))
  }

  private val distinctOpsSql =
    """SELECT l_returnflag, l_linestatus, COUNT(DISTINCT l_suppkey) AS n_supp
      |FROM (SELECT DISTINCT l_returnflag, l_linestatus, l_suppkey FROM lineitem)
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---- cube / rollup --------------------------------------------------

  /** CUBE over (returnflag, linestatus): all 2^2 grouping sets; NULL group
    * labels coalesced to 'ALL' so both engines sort identically. */
  def cubeAgg(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.cube(col("l_returnflag"), col("l_linestatus"))
      .agg(dsum(col("l_quantity")).as("sum_qty"), count(lit(1)).as("n"))
      .select(
        coalesce(col("l_returnflag"), lit("ALL")).as("rf"),
        coalesce(col("l_linestatus"), lit("ALL")).as("ls"),
        col("sum_qty"), col("n"))
      .orderBy(col("rf"), col("ls"))
  }

  private val cubeAggSql =
    s"""SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       |       COALESCE(l_linestatus, 'ALL') AS ls,
       |  ${sqlSum("l_quantity")} AS sum_qty, COUNT(*) AS n
       |FROM lineitem
       |GROUP BY CUBE (l_returnflag, l_linestatus)
       |ORDER BY rf, ls""".stripMargin

  /** ROLLUP over (r_name, n_name) through the dimension join. */
  def rollupAgg(spark: SparkSession, dir: String): DataFrame = {
    val c = Catalog.load(spark, dir, "customer")
    val n = Catalog.load(spark, dir, "nation")
    val r = Catalog.load(spark, dir, "region")
    c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
      .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
      .rollup(col("r_name"), col("n_name"))
      .agg(dsum(col("c_acctbal")).as("sum_bal"), count(lit(1)).as("n_cust"))
      .select(
        coalesce(col("r_name"), lit("ALL")).as("region"),
        coalesce(col("n_name"), lit("ALL")).as("nation"),
        col("sum_bal"), col("n_cust"))
      .orderBy(col("region"), col("nation"))
  }

  private val rollupAggSql =
    s"""SELECT COALESCE(r_name, 'ALL') AS region,
       |       COALESCE(n_name, 'ALL') AS nation,
       |  ${sqlSum("c_acctbal")} AS sum_bal, COUNT(*) AS n_cust
       |FROM customer
       |JOIN nation ON c_nationkey = n_nationkey
       |JOIN region ON n_regionkey = r_regionkey
       |GROUP BY ROLLUP (r_name, n_name)
       |ORDER BY region, nation""".stripMargin

  // ---- case/when + having ---------------------------------------------

  /** CASE WHEN banding + HAVING-style post-aggregation filter. */
  def caseHaving(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    o.withColumn("band",
        when(col("o_totalprice") < 100000, "small")
          .when(col("o_totalprice") < 300000, "medium")
          .otherwise("large"))
      .groupBy(col("band"), col("o_orderstatus"))
      .agg(count(lit(1)).as("n"), dsum(col("o_totalprice")).as("volume"))
      .filter(col("n") > 10) // HAVING
      .orderBy(col("band"), col("o_orderstatus"))
  }

  private val caseHavingSql =
    s"""SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
       |            WHEN o_totalprice < 300000 THEN 'medium'
       |            ELSE 'large' END AS band,
       |       o_orderstatus, COUNT(*) AS n,
       |  ${sqlSum("o_totalprice")} AS volume
       |FROM orders
       |GROUP BY 1, 2
       |HAVING COUNT(*) > 10
       |ORDER BY band, o_orderstatus""".stripMargin

  // ---- scalar packs ---------------------------------------------------

  /** String functions over documents: upper/substr/length/concat/instr. */
  def stringPack(spark: SparkSession, dir: String): DataFrame = {
    val d = Catalog.load(spark, dir, "documents")
    d.select(
        col("doc_id"),
        upper(substring(col("text"), 1, 10)).as("prefix_u"),
        length(col("text")).cast("long").as("text_len"),
        concat(col("lang"), lit(":"), col("source")).as("lang_source"),
        instr(col("text"), "spark").cast("long").as("spark_pos"),
        (col("n_chars") === length(col("text"))).as("len_consistent"))
      .orderBy(col("doc_id"))
  }

  private val stringPackSql =
    """SELECT doc_id,
      |  upper(substr(text, 1, 10)) AS prefix_u,
      |  length(text) AS text_len,
      |  lang || ':' || source AS lang_source,
      |  CAST(strpos(text, 'spark') AS BIGINT) AS spark_pos,
      |  n_chars = length(text) AS len_consistent
      |FROM documents
      |ORDER BY doc_id""".stripMargin

  /** Date functions over orders: extract year/month, month bucket. */
  def datePack(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    o.groupBy(
        year(col("o_orderdate")).cast("long").as("yr"),
        month(col("o_orderdate")).cast("long").as("mo"))
      .agg(count(lit(1)).as("n_orders"), dsum(col("o_totalprice")).as("volume"))
      .orderBy(col("yr"), col("mo"))
  }

  private val datePackSql =
    s"""SELECT CAST(year(o_orderdate) AS BIGINT) AS yr, CAST(month(o_orderdate) AS BIGINT) AS mo,
       |  COUNT(*) AS n_orders, ${sqlSum("o_totalprice")} AS volume
       |FROM orders
       |GROUP BY 1, 2
       |ORDER BY yr, mo""".stripMargin

  /** JSON extraction from the events.props string column. */
  def jsonPack(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    e.withColumn("k", get_json_object(col("props"), "$.k").cast("long"))
      .groupBy(col("event_type"))
      .agg(
        sum(col("k")).as("sum_k"),
        count(when(col("k") >= 50, lit(1))).as("n_high"))
      .orderBy(col("event_type"))
  }

  private val jsonPackSql =
    """SELECT event_type,
      |  CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
      |  COUNT(*) FILTER (CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50) AS n_high
      |FROM events
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  /** Explicit GROUPING SETS through the engine's SQL entry point
    * (spark.sql over a registered view) — the DataFrame API covers cube/
    * rollup (q25/q26); arbitrary sets need SQL. The statement is written
    * in the common SQL dialect and runs VERBATIM on both engines. */
  def groupingSets(spark: SparkSession, dir: String): DataFrame = {
    Catalog.load(spark, dir, "lineitem").createOrReplaceTempView("lineitem")
    spark.sql(groupingSetsSql)
  }

  private val groupingSetsSql =
    """SELECT COALESCE(l_returnflag, 'ALL') AS rf,
      |       COALESCE(l_linestatus, 'ALL') AS ls,
      |  CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS sum_qty,
      |  COUNT(*) AS n
      |FROM lineitem
      |GROUP BY GROUPING SETS ((l_returnflag), (l_returnflag, l_linestatus), ())
      |ORDER BY rf, ls""".stripMargin

  /** Scalar + correlated scalar subqueries through the SQL entry point:
    * customers above the global average balance, with their distance from
    * their nation's average (Catalyst decorrelates the inner query into a
    * join — no per-row execution). Deterministic decimal-avg on both
    * engines; the statement runs verbatim on both. */
  def subqueries(spark: SparkSession, dir: String): DataFrame = {
    Catalog.load(spark, dir, "customer").createOrReplaceTempView("customer")
    spark.sql(subqueriesSql)
  }

  private val subqueriesSql =
    """SELECT c_custkey, c_acctbal,
      |  c_acctbal - (SELECT CAST(SUM(CAST(c2.c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
      |                      / COUNT(*)
      |               FROM customer c2
      |               WHERE c2.c_nationkey = c.c_nationkey) AS above_nation_avg
      |FROM customer c
      |WHERE c_acctbal > (SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(38,6))) AS DOUBLE)
      |                          / COUNT(*) FROM customer)
      |ORDER BY c_custkey""".stripMargin

  /** Math scalar pack over IEEE-exact operations only (abs/ceil/floor/
    * sqrt/round/%): exp/ln are deliberately absent — libm transcendentals
    * are not correctly-rounded and differ across engines, so they cannot
    * be hash-compared (they'd need a tolerance oracle). */
  def mathPack(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
    li.select(
        col("l_orderkey"), col("l_linenumber"),
        abs(col("l_extendedprice") - 50000).as("abs_dev"),
        ceil(col("l_quantity") / 7).cast("long").as("qty_ceil7"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k"),
        sqrt(col("l_extendedprice")).as("price_sqrt"),
        round(col("l_extendedprice"), 1).as("price_r1"),
        (col("l_orderkey") % 97).as("key_mod"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))
  }

  private val mathPackSql =
    """SELECT l_orderkey, l_linenumber,
      |  abs(l_extendedprice - 50000) AS abs_dev,
      |  CAST(ceil(l_quantity / 7) AS BIGINT) AS qty_ceil7,
      |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k,
      |  sqrt(l_extendedprice) AS price_sqrt,
      |  round(l_extendedprice, 1) AS price_r1,
      |  l_orderkey % 97 AS key_mod
      |FROM lineitem
      |ORDER BY l_orderkey, l_linenumber""".stripMargin

  /** Ordered string aggregation (LISTAGG, new in Spark 4): per-nation
    * CSV of its suppliers — WITHIN GROUP (ORDER BY) makes the
    * concatenation deterministic (an unordered listagg is
    * partition-order-dependent and can never hash-match). */
  def listaggSuppliers(spark: SparkSession, dir: String): DataFrame = {
    val s = Catalog.load(spark, dir, "supplier")
    val n = Catalog.load(spark, dir, "nation")
    s.join(n, s("s_nationkey") === n("n_nationkey"))
      .groupBy(col("n_name"))
      .agg(
        expr("listagg(s_name, ',') WITHIN GROUP (ORDER BY s_name)")
          .as("suppliers_csv"),
        count(lit(1)).as("n_suppliers"))
      .orderBy(col("n_name"))
  }

  private val listaggSql =
    """SELECT n_name,
      |  string_agg(s_name, ',' ORDER BY s_name) AS suppliers_csv,
      |  CAST(COUNT(*) AS BIGINT) AS n_suppliers
      |FROM supplier JOIN nation ON s_nationkey = n_nationkey
      |GROUP BY n_name
      |ORDER BY n_name""".stripMargin

  /** Multiset set operations — EXCEPT ALL / INTERSECT ALL keep
    * duplicates by occurrence count (bag semantics), unlike the q23-q26
    * set forms: the dedup-aware diff/overlap between two ingest batches. */
  /** Row-level change set between two PUBLISHED versions of a table,
    * through the real time-travel machinery ([[graft.pipelines
    * .Versioned.diff]] — multiset EXCEPT ALL both ways over the
    * committed version directories): v0 is a deterministic orders
    * slice, v1 drops some rows, updates others (an update shows up as
    * its add+remove pair under the key), and adds a disjoint slice.
    * The oracle rebuilds both versions as CTEs and diffs them with the
    * same EXCEPT ALL algebra, so the hash compare certifies the entire
    * publish → time-travel → diff round-trip, not just the set
    * algebra. Values stay exact integer cents. The published family is
    * temp debris and is deleted after the diff is materialized. */
  def versionDiff(spark: SparkSession, dir: String): DataFrame = {
    val out = java.nio.file.Files.createTempDirectory("graft_vdiff_")
      .toString
    try {
      val o = Catalog.load(spark, dir, "orders")
        .select(col("o_orderkey").as("k"), col("o_custkey").as("c"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"),
          col("o_orderpriority").as("prio"))
      val v0 = o.filter(col("k") % 3 === 0)
      val v1 = v0.filter(col("k") % 21 =!= 0) // deletes
        .withColumn("cents",
          when(col("k") % 15 === 0, col("cents") * 2) // updates
            .otherwise(col("cents")))
        .unionByName(o.filter(col("k") % 3 === 1)) // inserts
      graft.pipelines.Versioned.publish(v0, out, "orders_slice")
      graft.pipelines.Versioned.publish(v1, out, "orders_slice")
      val d = graft.pipelines.Versioned.diff(spark, out, "orders_slice", 0L, 1L)
        .orderBy(col("change"), col("k"))
      // HARNESS-ONLY collect: the diff must outlive the temp-dir cleanup
      // below, and this fixture diff is a bounded orders slice. A
      // pipeline diffing real versions must keep the DataFrame lazy and
      // write it out — never collect a table-sized change set.
      val rows = d.collect().toSeq
      val schema = d.schema
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](
          scala.jdk.CollectionConverters.SeqHasAsJava(rows).asJava), schema)
    } finally {
      // finally, not success-path-only: a failed bench rep must not
      // leak a published family into /tmp
      graft.pipelines.Fs.deleteRecursive(new org.apache.hadoop.fs.Path(out))
    }
  }

  private val versionDiffSql =
    """WITH o AS (
      |  SELECT o_orderkey AS k, o_custkey AS c,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    o_orderpriority AS prio
      |  FROM orders
      |), v0 AS (
      |  SELECT * FROM o WHERE k % 3 = 0
      |), v1 AS (
      |  SELECT k, c,
      |    CASE WHEN k % 15 = 0 THEN cents * 2 ELSE cents END AS cents,
      |    prio
      |  FROM v0 WHERE k % 21 <> 0
      |  UNION ALL
      |  SELECT * FROM o WHERE k % 3 = 1
      |)
      |SELECT k, c, cents, prio, change FROM (
      |  SELECT *, 'added' AS change FROM (SELECT * FROM v1 EXCEPT ALL SELECT * FROM v0)
      |  UNION ALL
      |  SELECT *, 'removed' AS change FROM (SELECT * FROM v0 EXCEPT ALL SELECT * FROM v1)
      |)
      |ORDER BY change, k""".stripMargin

  /** CUBE with GROUPING metadata: revenue over (region, nation) at all
    * four aggregation levels, where each row carries its grouping-id
    * bitmask (grouping(region)·2 + grouping(nation)) — the metadata
    * column that lets a consumer tell a REAL null group from a
    * subtotal row, which `coalesce`-label hacks cannot (q25's cube
    * shows the values; this shows the machine-readable level). Exact
    * integer cents; the bitmask is the same closed-form on both
    * engines. */
  def cubeGroupingId(spark: SparkSession, dir: String): DataFrame = {
    val j = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "customer"),
        col("o_custkey") === col("c_custkey"))
      .join(Catalog.load(spark, dir, "nation"),
        col("c_nationkey") === col("n_nationkey"))
      .join(Catalog.load(spark, dir, "region"),
        col("n_regionkey") === col("r_regionkey"))
      .select(col("r_name"), col("n_name"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    j.cube(col("r_name"), col("n_name"))
      // grouping() is only resolvable INSIDE the cube's aggregate list
      .agg((grouping(col("r_name")) * 2 + grouping(col("n_name")))
          .cast("long").as("gid"),
        sum(col("cents")).as("rev_c"), count(lit(1)).as("n_orders"))
      .select(col("r_name"), col("n_name"), col("gid"), col("rev_c"),
        col("n_orders"))
      .orderBy(col("gid"), col("r_name"), col("n_name"))
  }

  private val cubeGroupingIdSql =
    """SELECT r_name, n_name,
      |  CAST(GROUPING(r_name) * 2 + GROUPING(n_name) AS BIGINT) AS gid,
      |  CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |    AS rev_c,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |JOIN customer ON o_custkey = c_custkey
      |JOIN nation ON c_nationkey = n_nationkey
      |JOIN region ON n_regionkey = r_regionkey
      |GROUP BY CUBE (r_name, n_name)
      |ORDER BY gid, r_name, n_name""".stripMargin

  def setOpsAll(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_suppkey"), col("l_linenumber"))
    val a = li.filter(col("l_linenumber") <= 4)
    val b = li.filter(col("l_linenumber") >= 3)
    a.exceptAll(b).groupBy(col("l_suppkey"))
      .agg(count(lit(1)).as("n_except"))
      .join(
        a.intersectAll(b).groupBy(col("l_suppkey"))
          .agg(count(lit(1)).as("n_intersect")),
        Seq("l_suppkey"), "full_outer")
      .select(col("l_suppkey"),
        coalesce(col("n_except"), lit(0L)).as("n_except"),
        coalesce(col("n_intersect"), lit(0L)).as("n_intersect"))
      .orderBy(col("l_suppkey"))
  }

  private val setOpsAllSql =
    """WITH a AS (
      |  SELECT l_suppkey, l_linenumber FROM lineitem WHERE l_linenumber <= 4
      |), b AS (
      |  SELECT l_suppkey, l_linenumber FROM lineitem WHERE l_linenumber >= 3
      |), ex AS (
      |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_except
      |  FROM (SELECT * FROM a EXCEPT ALL SELECT * FROM b) GROUP BY 1
      |), ix AS (
      |  SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_intersect
      |  FROM (SELECT * FROM a INTERSECT ALL SELECT * FROM b) GROUP BY 1
      |)
      |SELECT COALESCE(ex.l_suppkey, ix.l_suppkey) AS l_suppkey,
      |  COALESCE(n_except, 0) AS n_except,
      |  COALESCE(n_intersect, 0) AS n_intersect
      |FROM ex FULL OUTER JOIN ix ON ex.l_suppkey = ix.l_suppkey
      |ORDER BY l_suppkey""".stripMargin

  /** Exact MEDIAN per group (Spark 4 `median` == percentile_cont 0.5;
    * the midpoint average of two doubles is the same IEEE operation on
    * both engines). */
  def medianQuantity(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_returnflag"))
      .agg(median(col("l_quantity")).as("med_qty"),
        count(lit(1)).as("n"))
      .orderBy(col("l_returnflag"))

  private val medianSql =
    """SELECT l_returnflag, median(l_quantity) AS med_qty,
      |  CAST(COUNT(*) AS BIGINT) AS n
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Two-phase salted aggregation (q59's twin for groupBy): result is
    * identical to the plain aggregate — the oracle IS the plain GROUP BY.
    * sum(l_quantity) stays exact because the values are integral doubles
    * far below 2^53 (order-independent). */
  def saltedAgg(spark: SparkSession, dir: String): DataFrame =
    graft.ops.SkewOps.saltedAgg(
        Catalog.load(spark, dir, "lineitem"), "l_suppkey", factor = 8,
        saltFrom = Seq("l_orderkey", "l_linenumber"),
        aggs = Seq(
          "n_rows" -> (count(lit(1)), (c: org.apache.spark.sql.Column) => sum(c)),
          "sum_qty" -> (sum(col("l_quantity")),
            (c: org.apache.spark.sql.Column) => sum(c)),
          "max_price" -> (max(col("l_extendedprice")),
            (c: org.apache.spark.sql.Column) => max(c))))
      .orderBy(col("l_suppkey"))

  private val saltedAggSql =
    """SELECT l_suppkey, CAST(COUNT(*) AS BIGINT) AS n_rows,
      |  SUM(l_quantity) AS sum_qty, MAX(l_extendedprice) AS max_price
      |FROM lineitem GROUP BY 1 ORDER BY 1""".stripMargin

  /** Relational division ("FOR ALL"): customers whose orders span EVERY
    * priority class. The distinct-count == domain-count formulation is
    * the scale form — one aggregate, no nested NOT EXISTS double
    * negation, no join against the domain table. */
  def relationalDivision(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val nPrio = o.select(col("o_orderpriority")).distinct().count()
    o.groupBy(col("o_custkey"))
      .agg(countDistinct(col("o_orderpriority")).as("n_prio"),
        count(lit(1)).as("n_orders"))
      .filter(col("n_prio") === nPrio)
      .orderBy(col("o_custkey"))
  }

  private val relationalDivisionSql =
    """SELECT o_custkey,
      |  CAST(COUNT(DISTINCT o_orderpriority) AS BIGINT) AS n_prio,
      |  CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM orders
      |GROUP BY 1
      |HAVING COUNT(DISTINCT o_orderpriority) =
      |  (SELECT COUNT(DISTINCT o_orderpriority) FROM orders)
      |ORDER BY o_custkey""".stripMargin

  /** Reciprocal-rank fusion of two supplier rankings — by exact-decimal
    * revenue and by distinct orders served (the multi-signal ranking
    * merge behind hybrid search, here over relational signals so the
    * whole thing is oracle-checkable). Ranks are deterministic
    * row_numbers with key tie-breaks; the RRF score 1∕(60+r₁) + 1∕(60+r₂)
    * is two mirrored IEEE divisions, exact on both engines. Each ranking
    * is one aggregate + one window; the fusion joins on the key. */
  def rankFusion(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    // BOTH ranking signals come out of ONE lineitem scan + one supplier
    // aggregate; the two global ranks then order only the
    // |suppliers|-sized frame (a join of two separately-built rankings
    // would scan and shuffle the fact table twice), each via
    // GlobalRank's range shuffle — no single-partition window over the
    // supplier dimension
    val bySupp = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(dsum(col("l_extendedprice") * (lit(1.0) - col("l_discount")))
        .as("revenue"),
        countDistinct(col("l_orderkey")).as("n_orders"))
    val r1 = GlobalRank.withRowNumber(bySupp,
      Seq(col("revenue").desc, col("l_suppkey")), "r_rev")
    GlobalRank.withRowNumber(r1,
        Seq(col("n_orders").desc, col("l_suppkey")), "r_cnt")
      .select(col("l_suppkey"),
        col("r_rev").cast("int").as("r_rev"),
        col("r_cnt").cast("int").as("r_cnt"),
        (lit(1.0) / (lit(60.0) + col("r_rev"))
          + lit(1.0) / (lit(60.0) + col("r_cnt"))).as("rrf"))
      .orderBy(col("rrf").desc, col("l_suppkey"))
      .limit(20)
  }

  private val rankFusionSql = {
    val rev = sqlSum("l_extendedprice * (1.0 - l_discount)")
    s"""WITH a AS (
       |  SELECT l_suppkey, $rev AS revenue
       |  FROM lineitem GROUP BY 1
       |), ra AS (
       |  SELECT l_suppkey,
       |    CAST(ROW_NUMBER() OVER (ORDER BY revenue DESC, l_suppkey) AS INT) AS r_rev
       |  FROM a
       |), b AS (
       |  SELECT l_suppkey, COUNT(DISTINCT l_orderkey) AS n_orders
       |  FROM lineitem GROUP BY 1
       |), rb AS (
       |  SELECT l_suppkey,
       |    CAST(ROW_NUMBER() OVER (ORDER BY n_orders DESC, l_suppkey) AS INT) AS r_cnt
       |  FROM b
       |)
       |SELECT l_suppkey, r_rev, r_cnt,
       |  1.0 / (60.0 + r_rev) + 1.0 / (60.0 + r_cnt) AS rrf
       |FROM ra JOIN rb USING (l_suppkey)
       |ORDER BY rrf DESC, l_suppkey
       |LIMIT 20""".stripMargin
  }

  /** Lorenz curve of supplier revenue concentration — the curve under
    * q132's Gini number: suppliers ranked ascending by exact BIGINT-cent
    * revenue, cumulative share at each rank. Everything is one
    * lineitem aggregate; the ranking windows order only the
    * supplier-sized frame, and the single mirrored division per row
    * happens after all arithmetic is exact (integer cents, BIGINT
    * cumulative sums). The "top 1% of suppliers carry X% of revenue"
    * readout drops straight out of the tail rows. */
  def lorenz(spark: SparkSession, dir: String): DataFrame = {
    import graft.ops.GlobalRank
    val s = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey"))
      .agg(sum(round(col("l_extendedprice") * 100).cast("long")).as("rev_c"))
    val tot = s.agg(sum(col("rev_c")).as("total_c"))
    // rank + exact-integer cumulative sum both via GlobalRank (range
    // shuffle + broadcast offsets) — the supplier dimension never
    // funnels through a single window task; FUSED: one range shuffle
    // and one stats collect for both outputs (bit-identical to the
    // chained form, GlobalRankSpec-pinned)
    val ord = Seq(col("rev_c"), col("l_suppkey"))
    val ranked = GlobalRank.withRowNumberAndRunningSums(s, ord, "rk",
      Seq((col("rev_c"), "cum_c")))
    ranked.crossJoin(broadcast(tot))
      .select(col("rk").cast("int").as("rk"), col("l_suppkey"),
        col("rev_c"), col("cum_c"),
        (col("cum_c").cast("double") / col("total_c")).as("cum_share"))
      .orderBy(col("rk"))
  }

  private val lorenzSql =
    """WITH s AS (
      |  SELECT l_suppkey,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS rev_c
      |  FROM lineitem GROUP BY 1
      |), t AS (
      |  SELECT CAST(SUM(rev_c) AS BIGINT) AS total_c FROM s
      |)
      |SELECT
      |  CAST(ROW_NUMBER() OVER (ORDER BY rev_c, l_suppkey) AS INT) AS rk,
      |  l_suppkey, rev_c,
      |  CAST(SUM(rev_c) OVER (ORDER BY rev_c, l_suppkey
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_c,
      |  CAST(CAST(SUM(rev_c) OVER (ORDER BY rev_c, l_suppkey
      |    ROWS UNBOUNDED PRECEDING) AS BIGINT) AS DOUBLE) / total_c
      |    AS cum_share
      |FROM s, t
      |ORDER BY rk""".stripMargin

  /** Spark 4 VARIANT round-trip: order fields → JSON text → `parse_json`
    * → typed `variant_get` extraction → aggregate. Variant is Spark 4's
    * answer to schemaless columns (binary-encoded semi-structured values
    * with typed path access — the modern form of the reference's
    * inferSchema-everywhere posture, but per-value instead of per-file).
    * Only TYPED extracts leave the query, so engine JSON rendering
    * differences never reach the output: doubles survive the text
    * round-trip exactly (shortest-roundtrip print, correctly-rounded
    * parse, on both engines), then flow into the usual integer-cents
    * aggregate. */
  def variantJson(spark: SparkSession, dir: String): DataFrame = {
    Catalog.load(spark, dir, "orders")
      .withColumn("v", expr(
        "parse_json(to_json(struct(o_totalprice AS p, o_orderkey AS k)))"))
      .select(col("o_orderpriority"),
        expr("variant_get(v, '$.k', 'bigint')").as("k"),
        expr("variant_get(v, '$.p', 'double')").as("p"))
      .groupBy(col("o_orderpriority"))
      .agg(count(lit(1)).as("n"),
        sum(col("k")).as("key_sum"),
        sum(round(col("p") * 100).cast("long")).as("cents_sum"))
      .orderBy(col("o_orderpriority"))
  }

  private val variantJsonSql =
    """WITH j AS (
      |  SELECT o_orderpriority,
      |    to_json(struct_pack(p := o_totalprice, k := o_orderkey)) AS v
      |  FROM orders
      |), t AS (
      |  SELECT o_orderpriority,
      |    CAST(v ->> '$.k' AS BIGINT) AS k,
      |    CAST(v ->> '$.p' AS DOUBLE) AS p
      |  FROM j
      |)
      |SELECT o_orderpriority, COUNT(*) AS n,
      |  CAST(SUM(k) AS BIGINT) AS key_sum,
      |  CAST(SUM(CAST(round(p * 100) AS BIGINT)) AS BIGINT) AS cents_sum
      |FROM t
      |GROUP BY o_orderpriority
      |ORDER BY o_orderpriority""".stripMargin

  /** Market-basket co-purchase analysis: top part pairs by order
    * co-occurrence, with lift against independence. The pair join is
    * per-basket bounded — self-join on l_orderkey where baskets hold a
    * handful of distinct parts, so candidates are O(Σ kᵢ²) with small
    * kᵢ, never all-parts × all-parts (q102's collocations are the text
    * twin of this shape). Counts stay exact integers; lift is ONE
    * mirrored double expression over them. */
  def basketPairs(spark: SparkSession, dir: String): DataFrame = {
    // shared memoized basket frames: one lineitem distinct + one basket
    // self-join per session+dataset for the whole q179/q236/q318/q334
    // family (bit-identical exact counts)
    val items = BasketFrames.items(spark, dir)
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val perPart = items.groupBy(col("pk")).agg(count(lit(1)).as("n_part"))
    val pairs = BasketFrames.pairCounts(spark, dir)
    pairs
      .join(perPart.select(col("pk").as("a"), col("n_part").as("n_a")), "a")
      .join(perPart.select(col("pk").as("b"), col("n_part").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"), col("n_b"),
        (col("n_ab").cast("double") * col("n_orders")
          / (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("n_ab").desc, col("a"), col("b"))
      .limit(20)
  }

  private val basketPairsSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), n AS (
      |  SELECT COUNT(DISTINCT ok) AS n_orders FROM items
      |), pp AS (
      |  SELECT pk, COUNT(*) AS n_part FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT x.pk AS a, y.pk AS b, COUNT(*) AS n_ab
      |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2
      |)
      |SELECT p.a, p.b, p.n_ab, pa.n_part AS n_a, pb.n_part AS n_b,
      |  CAST(p.n_ab AS DOUBLE) * n.n_orders / (pa.n_part * pb.n_part)
      |    AS lift
      |FROM pairs p
      |JOIN pp pa ON pa.pk = p.a
      |JOIN pp pb ON pb.pk = p.b
      |CROSS JOIN n
      |ORDER BY p.n_ab DESC, p.a, p.b
      |LIMIT 20""".stripMargin

  /** Item-item collaborative-filtering neighbors: cosine similarity over
    * order co-occurrence (n_ab / √n_a·√n_b), top-3 most-similar items
    * per item — the classic item2item recommendation table. Scale shape:
    * the pair join is bounded per basket (TPC-H baskets ≤ 7 items), the
    * count aggregation shuffles once on (a, b), and the per-item top-k
    * is a WindowGroupLimit-prunable window. All counts exact; the
    * cosine is two exact-rounded sqrts and one division — deterministic
    * cross-engine. */
  def itemSimilar(spark: SparkSession, dir: String): DataFrame = {
    val items = BasketFrames.items(spark, dir)
    val perPart = items.groupBy(col("pk")).agg(count(lit(1)).as("n_part"))
    // ordered (a ≠ b) view of the shared pair aggregate: an unordered
    // pair counts the same both ways, so union-of-swap == the a ≠ b
    // groupBy, bit for bit
    val pairs = BasketFrames
      .symmetrized(BasketFrames.pairCounts(spark, dir))
      .filter(col("n_ab") >= 2)
    val w = Window.partitionBy(col("a"))
      .orderBy(col("cos_sim").desc, col("b"))
    pairs
      .join(perPart.select(col("pk").as("a"), col("n_part").as("n_a")), "a")
      .join(perPart.select(col("pk").as("b"), col("n_part").as("n_b")), "b")
      .select(col("a"), col("b"), col("n_ab"),
        (col("n_ab").cast("double") /
          (sqrt(col("n_a").cast("double")) * sqrt(col("n_b").cast("double"))))
          .as("cos_sim"))
      .withColumn("rn", row_number().over(w).cast("long"))
      .filter(col("rn") <= 3)
      .orderBy(col("a"), col("rn"))
  }

  private val itemSimilarSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), pp AS (
      |  SELECT pk, COUNT(*) AS n_part FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT x.pk AS a, y.pk AS b, COUNT(*) AS n_ab
      |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk <> y.pk
      |  GROUP BY 1, 2 HAVING COUNT(*) >= 2
      |), sims AS (
      |  SELECT p.a, p.b, p.n_ab,
      |    CAST(p.n_ab AS DOUBLE) /
      |      (sqrt(CAST(pa.n_part AS DOUBLE)) * sqrt(CAST(pb.n_part AS DOUBLE)))
      |      AS cos_sim
      |  FROM pairs p
      |  JOIN pp pa ON pa.pk = p.a
      |  JOIN pp pb ON pb.pk = p.b
      |)
      |SELECT a, b, n_ab, cos_sim, rn FROM (
      |  SELECT *, CAST(row_number() OVER (PARTITION BY a
      |    ORDER BY cos_sim DESC, b) AS BIGINT) AS rn
      |  FROM sims)
      |WHERE rn <= 3 ORDER BY a, rn""".stripMargin

  // ---- Cohen's kappa ---------------------------------------------------

  /** Inter-rater agreement, exactly: Cohen's κ between "the buyer said
    * it was urgent" (order priority ∈ {1-URGENT, 2-HIGH}) and "the
    * warehouse shipped it fast" (first lineitem shipped within 30 days
    * of the order date) — the process-consistency audit behind every
    * SLA dashboard. Both raters collapse to one bit per ORDER (the
    * lineitem side via a min-latency aggregate — one fact-table pass,
    * no row explosion), the 2×2 cell counts are exact BIGINTs, and
    * κ = (n·(a+d) − Σ rᵢcᵢ) / (n² − Σ rᵢcᵢ) is the cross-multiplied
    * closed form: all integers until ONE final division, so both
    * engines land on the identical double. */
  def cohensKappa(spark: SparkSession, dir: String): DataFrame = {
    val firstShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val rated = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
          .as("urgent"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("fast",
        (datediff(col("first_ship"), col("od")) <= 30).cast("int"))
    rated.agg(
        count(lit(1)).as("n"),
        sum(col("urgent") * col("fast")).as("a"),
        sum(col("urgent") * (lit(1) - col("fast"))).as("b"),
        sum((lit(1) - col("urgent")) * col("fast")).as("c"),
        sum((lit(1) - col("urgent")) * (lit(1) - col("fast"))).as("d"))
      .select(col("n"), col("a"), col("b"), col("c"), col("d"),
        ((col("n") * (col("a") + col("d"))
          - ((col("a") + col("b")) * (col("a") + col("c"))
            + (col("c") + col("d")) * (col("b") + col("d"))))
          .cast("double") /
          (col("n") * col("n")
            - ((col("a") + col("b")) * (col("a") + col("c"))
              + (col("c") + col("d")) * (col("b") + col("d"))))
            .cast("double")).as("kappa"))
  }

  private val cohensKappaSql =
    """WITH f AS (
      |  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1
      |), r AS (
      |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END AS urgent,
      |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), first_ship)
      |           <= 30 THEN 1 ELSE 0 END AS fast
      |  FROM orders JOIN f ON o_orderkey = l_orderkey
      |), cells AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(urgent * fast) AS BIGINT) AS a,
      |    CAST(SUM(urgent * (1 - fast)) AS BIGINT) AS b,
      |    CAST(SUM((1 - urgent) * fast) AS BIGINT) AS c,
      |    CAST(SUM((1 - urgent) * (1 - fast)) AS BIGINT) AS d
      |  FROM r
      |)
      |SELECT n, a, b, c, d,
      |  CAST(n * (a + d) - ((a + b) * (a + c) + (c + d) * (b + d))
      |    AS DOUBLE)
      |  / CAST(n * n - ((a + b) * (a + c) + (c + d) * (b + d))
      |    AS DOUBLE) AS kappa
      |FROM cells""".stripMargin

  // ---- McNemar's test --------------------------------------------------

  /** McNemar's marginal-homogeneity test on the SAME paired bits as
    * q461's κ (urgent-said vs fast-shipped per order): does the process
    * break promises asymmetrically? Only the discordant cells matter —
    * b = urgent-but-slow, c = fast-but-not-urgent — and
    * χ² = (b−c)²/(b+c) (plus the continuity-corrected (|b−c|−1)²/(b+c))
    * is exact integers until one mirrored division each. κ says "how
    * much agreement"; McNemar says "which direction the disagreement
    * leans" — together they are the full 2×2 process audit. */
  def mcnemar(spark: SparkSession, dir: String): DataFrame = {
    val firstShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
          .as("urgent"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("fast",
        (datediff(col("first_ship"), col("od")) <= 30).cast("int"))
      .agg(
        sum(col("urgent") * (lit(1) - col("fast"))).as("b"),
        sum((lit(1) - col("urgent")) * col("fast")).as("c"))
      .select(col("b"), col("c"),
        (((col("b") - col("c")) * (col("b") - col("c"))).cast("double") /
          (col("b") + col("c")).cast("double")).as("chi2"),
        (((abs(col("b") - col("c")) - 1) * (abs(col("b") - col("c")) - 1))
          .cast("double") /
          (col("b") + col("c")).cast("double")).as("chi2_cc"))
  }

  private val mcnemarSql =
    """WITH f AS (
      |  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1
      |), r AS (
      |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END AS urgent,
      |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), first_ship)
      |           <= 30 THEN 1 ELSE 0 END AS fast
      |  FROM orders JOIN f ON o_orderkey = l_orderkey
      |), cells AS (
      |  SELECT CAST(SUM(urgent * (1 - fast)) AS BIGINT) AS b,
      |    CAST(SUM((1 - urgent) * fast) AS BIGINT) AS c
      |  FROM r
      |)
      |SELECT b, c,
      |  CAST((b - c) * (b - c) AS DOUBLE) / CAST(b + c AS DOUBLE) AS chi2,
      |  CAST((abs(b - c) - 1) * (abs(b - c) - 1) AS DOUBLE)
      |    / CAST(b + c AS DOUBLE) AS chi2_cc
      |FROM cells""".stripMargin

  // ---- Hoover (Robin Hood) index --------------------------------------

  /** Hoover index of customer-spend inequality — the share of total
    * revenue that would have to move to equalize every customer, the
    * third member of the house inequality family (q132/q422 Gini give
    * the area view, q174 the curve): H = Σ|xᵢ − μ| / (2·Σxᵢ), computed
    * in the cross-multiplied ALL-INTEGER form Σ|n·xᵢ − S| / (2·n·S) —
    * decimal(38,0) keeps n·xᵢ exact at any corpus size, and the single
    * final division goes decimal→double (correctly rounded on the
    * Spark side; the oracle mirrors through VARCHAR per the Det.scala
    * recipe). The audit column `abs_dev` is ALSO emitted as the
    * correctly-rounded double, not the raw decimal(38,0): DuckDB's
    * pandas bridge renders wide decimals as float64 while parquet
    * decimals arrive as object(Decimal), so a raw decimal output column
    * hash-diverges at the driver even when the values are identical
    * (the r11 q462/q470 lesson). */
  def hooverIndex(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val per = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)"))
        .as("cents"))
    val tot = per.agg(count(lit(1)).as("n"), sum(col("cents")).as("s"))
    per.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n_customers"), max(col("s")).as("total_cents"),
        sum(abs(col("n").cast(dec) * col("cents") - col("s")))
          .as("abs_dev"))
      .select(col("n_customers"), col("total_cents"),
        col("abs_dev").cast("decimal(38,0)").cast("double").as("abs_dev"),
        (col("abs_dev").cast("double") /
          (lit(2).cast(dec) * col("n_customers") * col("total_cents"))
            .cast("double")).as("hoover"))
  }

  private val hooverIndexSql =
    """WITH per AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders GROUP BY 1
      |), t AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(cents) AS BIGINT) AS s
      |  FROM per
      |), agg AS (
      |  SELECT MAX(n) AS n_customers, MAX(s) AS total_cents,
      |    SUM(abs(CAST(n AS HUGEINT) * cents - s)) AS abs_dev
      |  FROM per, t
      |)
      |SELECT n_customers, total_cents,
      |  CAST(CAST(abs_dev AS VARCHAR) AS DOUBLE) AS abs_dev,
      |  CAST(CAST(abs_dev AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(CAST(2 AS HUGEINT) * n_customers * total_cents
      |        AS VARCHAR) AS DOUBLE) AS hoover
      |FROM agg""".stripMargin

  // ---- 2x2 effect sizes ------------------------------------------------

  /** Effect sizes for the urgent×fast 2×2 (the numbers an A/B or
    * epidemiology readout reports NEXT TO the tests: q430-family chi²
    * says "is it real", κ/McNemar say "do the raters agree", these say
    * "how big is it"): odds ratio a·d/(b·c) and relative risk
    * a(c+d)/(c(a+b)) as cross-multiplied decimal→double single
    * divisions, risk difference in exact micro-units via mirrored
    * floored integer division (the house fixed-point convention for
    * possibly-negative quotients: sign-split). */
  def effectSizes2x2(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val firstShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("int")
          .as("urgent"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("fast",
        (datediff(col("first_ship"), col("od")) <= 30).cast("int"))
      .agg(
        sum(col("urgent") * col("fast")).as("a"),
        sum(col("urgent") * (lit(1) - col("fast"))).as("b"),
        sum((lit(1) - col("urgent")) * col("fast")).as("c"),
        sum((lit(1) - col("urgent")) * (lit(1) - col("fast"))).as("d"))
      .select(col("a"), col("b"), col("c"), col("d"),
        (expr(s"CAST(CAST(a AS $dec) * d AS $dec)").cast("double") /
          expr(s"CAST(CAST(b AS $dec) * c AS $dec)").cast("double"))
          .as("odds_ratio"),
        (expr(s"CAST(CAST(a AS $dec) * (c + d) AS $dec)").cast("double") /
          expr(s"CAST(CAST(c AS $dec) * (a + b) AS $dec)").cast("double"))
          .as("relative_risk"),
        expr("""CAST((a * 1000000) div (a + b)
                - (c * 1000000) div (c + d) AS BIGINT)""")
          .as("risk_diff_micro"))
  }

  private val effectSizes2x2Sql =
    """WITH f AS (
      |  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1
      |), r AS (
      |  SELECT CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |           THEN 1 ELSE 0 END AS urgent,
      |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), first_ship)
      |           <= 30 THEN 1 ELSE 0 END AS fast
      |  FROM orders JOIN f ON o_orderkey = l_orderkey
      |), cells AS (
      |  SELECT CAST(SUM(urgent * fast) AS BIGINT) AS a,
      |    CAST(SUM(urgent * (1 - fast)) AS BIGINT) AS b,
      |    CAST(SUM((1 - urgent) * fast) AS BIGINT) AS c,
      |    CAST(SUM((1 - urgent) * (1 - fast)) AS BIGINT) AS d
      |  FROM r
      |)
      |SELECT a, b, c, d,
      |  CAST(CAST(CAST(a AS HUGEINT) * d AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(CAST(b AS HUGEINT) * c AS VARCHAR) AS DOUBLE)
      |    AS odds_ratio,
      |  CAST(CAST(CAST(a AS HUGEINT) * (c + d) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(CAST(c AS HUGEINT) * (a + b) AS VARCHAR) AS DOUBLE)
      |    AS relative_risk,
      |  CAST((a * 1000000) // (a + b) - (c * 1000000) // (c + d)
      |    AS BIGINT) AS risk_diff_micro
      |FROM cells""".stripMargin

  // ---- Cochran–Armitage trend test ------------------------------------

  /** Cochran–Armitage TREND test: does fast shipping decline
    * monotonically across the ORDERED priority ladder (scores 1..5)?
    * The 2×k completion of the process-audit family — q430's chi²
    * ignores the ordering, κ/McNemar see only a collapsed 2×2; trend is
    * the question an SLA owner actually asks. Fully exact: per-priority
    * (nᵢ, fastᵢ) counts, T = N·Σsᵢaᵢ − A·Σsᵢnᵢ, and
    * z² = T²·N / (A·(N−A)·(N·Σnᵢsᵢ² − (Σnᵢsᵢ)²)) — numerator and
    * denominator cross-multiplied decimal(38,0) integers, ONE final
    * division through the correctly-rounded decimal→double cast (the
    * oracle mirrors via VARCHAR per the Det recipe). `t_num` (which can
    * be negative — a declining trend) is emitted as the
    * correctly-rounded double, not raw decimal(38,0), for the same
    * driver-rendering reason documented at [[hooverIndex]]. */
  def cochranArmitage(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val firstShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val grp = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), to_date(col("o_orderdate")).as("od"),
        substring(col("o_orderpriority"), 1, 1).cast("long").as("s"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .withColumn("fast",
        (datediff(col("first_ship"), col("od")) <= 30).cast("long"))
      .groupBy(col("s"))
      .agg(count(lit(1)).as("ni"), sum(col("fast")).as("ai"))
    grp.agg(sum(col("ni")).as("nn"), sum(col("ai")).as("aa"),
        sum(col("s") * col("ai")).as("sa"),
        sum(col("s") * col("ni")).as("sn"),
        sum(col("s") * col("s") * col("ni")).as("ssn"))
      .withColumn("t_num",
        expr(s"CAST(CAST(nn AS $dec) * sa - CAST(aa AS $dec) * sn AS $dec)"))
      .select(col("nn").as("n"), col("aa").as("n_fast"),
        col("t_num").cast("double").as("t_num"),
        (expr(s"CAST(t_num * t_num AS $dec)").cast("double")
          * col("nn").cast("double") /
          expr(s"CAST(CAST(aa AS $dec) * (nn - aa) * (CAST(nn AS $dec) * ssn - CAST(sn AS $dec) * sn) AS $dec)")
            .cast("double")).as("z2"))
  }

  private val cochranArmitageSql =
    """WITH f AS (
      |  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1
      |), r AS (
      |  SELECT CAST(substring(o_orderpriority, 1, 1) AS BIGINT) AS s,
      |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), first_ship)
      |           <= 30 THEN 1 ELSE 0 END AS fast
      |  FROM orders JOIN f ON o_orderkey = l_orderkey
      |), g AS (
      |  SELECT s, CAST(COUNT(*) AS BIGINT) AS ni,
      |    CAST(SUM(fast) AS BIGINT) AS ai
      |  FROM r GROUP BY 1
      |), m AS (
      |  SELECT CAST(SUM(ni) AS BIGINT) AS nn, CAST(SUM(ai) AS BIGINT) AS aa,
      |    CAST(SUM(s * ai) AS BIGINT) AS sa,
      |    CAST(SUM(s * ni) AS BIGINT) AS sn,
      |    CAST(SUM(s * s * ni) AS BIGINT) AS ssn
      |  FROM g
      |)
      |SELECT nn AS n, aa AS n_fast,
      |  CAST(CAST(CAST(nn AS HUGEINT) * sa - CAST(aa AS HUGEINT) * sn
      |    AS VARCHAR) AS DOUBLE) AS t_num,
      |  CAST(CAST((CAST(nn AS HUGEINT) * sa - CAST(aa AS HUGEINT) * sn)
      |      * (CAST(nn AS HUGEINT) * sa - CAST(aa AS HUGEINT) * sn)
      |      AS VARCHAR) AS DOUBLE)
      |    * CAST(nn AS DOUBLE)
      |    / CAST(CAST(CAST(aa AS HUGEINT) * (nn - aa)
      |        * (CAST(nn AS HUGEINT) * ssn - CAST(sn AS HUGEINT) * sn)
      |        AS VARCHAR) AS DOUBLE) AS z2
      |FROM m""".stripMargin

  // ---- weighted quantiles via distributed running sum ------------------

  /** Quantity-WEIGHTED price quartiles over lineitem — "the price a
    * median unit ships at", which whale orders can't dominate the way
    * they dominate the row-median (q129): type-1 weighted quantile,
    * x(q) = min price whose cumulative quantity reaches q·W. The
    * cumulative weight is [[graft.ops.GlobalRank.withRunningSum]] over
    * the (price, key) total order — exact BIGINT prefix sums, no
    * single-partition window — and each quartile is one conditional-min
    * aggregate over the crossing condition 100·cumw ≥ q·W (all-integer,
    * tie-order-proof: every row of a tied price carries the same
    * price). */
  def weightedQuantiles(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")
          .as("cents"),
        col("l_quantity").cast("long").as("w"),
        col("l_orderkey"), col("l_linenumber"))
    val tot = li.agg(sum(col("w")).as("wtot"))
    val cum = graft.ops.GlobalRank.withRunningSum(li,
      Seq(col("cents"), col("l_orderkey"), col("l_linenumber")),
      col("w"), "cw")
    cum.crossJoin(broadcast(tot))
      .agg(max(col("wtot")).as("total_weight"),
        min(when(col("cw") * 100 >= col("wtot") * 25, col("cents")))
          .as("wp25_cents"),
        min(when(col("cw") * 100 >= col("wtot") * 50, col("cents")))
          .as("wp50_cents"),
        min(when(col("cw") * 100 >= col("wtot") * 75, col("cents")))
          .as("wp75_cents"))
  }

  private val weightedQuantilesSql =
    """WITH li AS (
      |  SELECT CAST(round(l_extendedprice * 100) AS BIGINT) AS cents,
      |    CAST(l_quantity AS BIGINT) AS w, l_orderkey, l_linenumber
      |  FROM lineitem
      |), t AS (SELECT CAST(SUM(w) AS BIGINT) AS wtot FROM li),
      |cum AS (
      |  SELECT cents,
      |    CAST(SUM(w) OVER (ORDER BY cents, l_orderkey, l_linenumber
      |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cw
      |  FROM li
      |)
      |SELECT MAX(wtot) AS total_weight,
      |  MIN(CASE WHEN cw * 100 >= wtot * 25 THEN cents END) AS wp25_cents,
      |  MIN(CASE WHEN cw * 100 >= wtot * 50 THEN cents END) AS wp50_cents,
      |  MIN(CASE WHEN cw * 100 >= wtot * 75 THEN cents END) AS wp75_cents
      |FROM cum, t""".stripMargin

  // ---- Friedman blocked rank test ---------------------------------------

  /** Friedman test — the BLOCKED completion of the k-sample family:
    * q437's Kruskal–Wallis pools all rows, this ranks the k=5 regions
    * WITHIN each calendar month (block) and asks whether any region is
    * consistently ahead once month-to-month level shifts are removed.
    * The monthly (month, region) revenue cells are a collapsed calendar
    * spine (≤ 12·years·5 rows at any data scale), so the per-month
    * rank window is bounded by construction; ranks are strict
    * row_numbers over (exact decimal revenue, region name) — both
    * engines see identical decimals, so identical ranks. Incomplete
    * blocks (a month missing a region) are dropped, as the test
    * requires. χ²_F = 12·ΣR_j²/(n·k·(k+1)) − 3·n·(k+1), exact in
    * micro-units via one floored integer division. */
  def friedman(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"),
        date_trunc("month", to_date(col("o_orderdate"))).cast("date").as("m"),
        col("o_totalprice"))
    val c = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey"), col("c_nationkey"))
    val n = Catalog.load(spark, dir, "nation")
      .select(col("n_nationkey"), col("n_regionkey"))
    val r = Catalog.load(spark, dir, "region")
      .select(col("r_regionkey"), col("r_name"))
    val cell = o.join(c, col("o_custkey") === col("c_custkey"))
      .join(broadcast(n), col("c_nationkey") === col("n_nationkey"))
      .join(broadcast(r), col("n_regionkey") === col("r_regionkey"))
      .groupBy(col("m"), col("r_name"))
      .agg(sum(col("o_totalprice")).as("rev"))
    val full = cell
      .withColumn("kc", count(lit(1)).over(Window.partitionBy(col("m"))))
      .filter(col("kc") === 5)
    val rj = full
      .withColumn("rk", row_number().over(
        Window.partitionBy(col("m")).orderBy(col("rev"), col("r_name")))
        .cast("long"))
      .groupBy(col("r_name")).agg(sum(col("rk")).as("rjs"))
    val nb = full.select(col("m")).distinct()
      .agg(count(lit(1)).as("n_blocks"))
    rj.agg(sum(col("rjs") * col("rjs")).as("sum_rj2"))
      .crossJoin(broadcast(nb))
      .select(col("n_blocks"), lit(5L).as("k"), col("sum_rj2"),
        expr("""CAST((sum_rj2 * 12000000) div (n_blocks * 30)
                - 18000000 * n_blocks AS BIGINT)""").as("chi2_f_micro"))
  }

  private val friedmanSql =
    """WITH cell AS (
      |  SELECT CAST(date_trunc('month', CAST(o_orderdate AS DATE)) AS DATE)
      |      AS m, r_name, SUM(o_totalprice) AS rev
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  JOIN nation ON c_nationkey = n_nationkey
      |  JOIN region ON n_regionkey = r_regionkey
      |  GROUP BY 1, 2
      |), fullb AS (
      |  SELECT m, r_name, rev FROM (
      |    SELECT m, r_name, rev, COUNT(*) OVER (PARTITION BY m) AS kc
      |    FROM cell) c
      |  WHERE kc = 5
      |), rj AS (
      |  SELECT r_name, CAST(SUM(rk) AS BIGINT) AS rjs FROM (
      |    SELECT r_name, CAST(row_number() OVER (
      |      PARTITION BY m ORDER BY rev, r_name) AS BIGINT) AS rk
      |    FROM fullb) x
      |  GROUP BY 1
      |), nb AS (
      |  SELECT CAST(COUNT(DISTINCT m) AS BIGINT) AS n_blocks FROM fullb
      |)
      |SELECT n_blocks, CAST(5 AS BIGINT) AS k,
      |  CAST(SUM(rjs * rjs) AS BIGINT) AS sum_rj2,
      |  CAST((CAST(SUM(rjs * rjs) AS BIGINT) * 12000000) // (n_blocks * 30)
      |    - 18000000 * n_blocks AS BIGINT) AS chi2_f_micro
      |FROM rj, nb
      |GROUP BY n_blocks""".stripMargin

  // ---- Cochran's Q test --------------------------------------------------

  /** Cochran's Q — the k-condition generalization of q465's McNemar:
    * did the SAME subjects (customers) succeed at different rates
    * across k=3 matched binary conditions (ordered in 1995 / 1996 /
    * 1997)? Q = (k−1)·(k·ΣC_j² − N²) / (k·N − ΣR_i²), every term an
    * exact integer from two aggregates (per-customer year flags →
    * column totals + row-total squares), one floored division into
    * micro-units. All customers are subjects; all-zero and all-one
    * rows are retained (they cancel in the denominator exactly). */
  def cochransQ(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val flags = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("y"))
      .filter(col("y").isin(1995, 1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(max((col("y") === 1995).cast("long")).as("f1"),
        max((col("y") === 1996).cast("long")).as("f2"),
        max((col("y") === 1997).cast("long")).as("f3"))
    Catalog.load(spark, dir, "customer").select(col("c_custkey"))
      .join(flags, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("f1"), lit(0L)).as("f1"),
        coalesce(col("f2"), lit(0L)).as("f2"),
        coalesce(col("f3"), lit(0L)).as("f3"))
      .agg(count(lit(1)).as("n_subjects"),
        sum(col("f1")).as("c1"), sum(col("f2")).as("c2"),
        sum(col("f3")).as("c3"),
        sum((col("f1") + col("f2") + col("f3"))
          * (col("f1") + col("f2") + col("f3"))).as("sum_ri2"))
      .select(col("n_subjects"), col("c1"), col("c2"), col("c3"),
        (col("c1") + col("c2") + col("c3")).as("n_success"), col("sum_ri2"))
      .select(col("n_subjects"), col("c1"), col("c2"), col("c3"),
        col("n_success"), col("sum_ri2"),
        expr(s"""CAST((2 * (3 * (CAST(c1 AS $dec) * c1
                 + CAST(c2 AS $dec) * c2 + CAST(c3 AS $dec) * c3)
                 - CAST(n_success AS $dec) * n_success) * 1000000)
                 div (3 * n_success - sum_ri2) AS BIGINT)""").as("q_micro"))
  }

  private val cochransQSql =
    """WITH f AS (
      |  SELECT o_custkey,
      |    MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
      |      THEN 1 ELSE 0 END) AS f1,
      |    MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
      |      THEN 1 ELSE 0 END) AS f2,
      |    MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
      |      THEN 1 ELSE 0 END) AS f3
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
      |  GROUP BY 1
      |), a AS (
      |  SELECT COALESCE(f1, 0) AS f1, COALESCE(f2, 0) AS f2,
      |    COALESCE(f3, 0) AS f3
      |  FROM customer LEFT JOIN f ON c_custkey = o_custkey
      |), s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_subjects,
      |    CAST(SUM(f1) AS BIGINT) AS c1, CAST(SUM(f2) AS BIGINT) AS c2,
      |    CAST(SUM(f3) AS BIGINT) AS c3,
      |    CAST(SUM((f1 + f2 + f3) * (f1 + f2 + f3)) AS BIGINT) AS sum_ri2
      |  FROM a
      |)
      |SELECT n_subjects, c1, c2, c3, c1 + c2 + c3 AS n_success, sum_ri2,
      |  CAST((2 * (3 * (CAST(c1 AS HUGEINT) * c1 + CAST(c2 AS HUGEINT) * c2
      |    + CAST(c3 AS HUGEINT) * c3)
      |    - CAST(c1 + c2 + c3 AS HUGEINT) * (c1 + c2 + c3)) * 1000000)
      |    // (3 * (c1 + c2 + c3) - sum_ri2) AS BIGINT) AS q_micro
      |FROM s""".stripMargin

  // ---- rich-club coefficient ---------------------------------------------

  /** RICH-CLUB coefficient φ(k) of the part co-purchase graph: do
    * high-degree parts co-occur with EACH OTHER more densely than the
    * graph average — the hub-interconnection readout (next to q225's
    * assortativity, which is the correlation view of the same
    * question). Both inputs collapse to DOMAIN-sized histograms before
    * the threshold sweep: nodes per degree value and edges per
    * min-endpoint-degree value, each joined against a 7-value literal
    * threshold grid — the fact-scale work is the one shared basket
    * self-join every pair miner reuses. Exact integer counts; φ is one
    * guarded mirrored division per threshold. */
  def richClub(spark: SparkSession, dir: String): DataFrame = {
    val edges = BasketFrames.pairCounts(spark, dir).select(col("a"), col("b"))
    val deg = edges.select(col("a").as("node"))
      .union(edges.select(col("b").as("node")))
      .groupBy(col("node")).agg(count(lit(1)).as("deg"))
    val degHist = deg.groupBy(col("deg")).agg(count(lit(1)).as("n_nodes"))
    val eHist = edges
      .join(deg.select(col("node").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("node").as("b"), col("deg").as("db")), "b")
      .select(least(col("da"), col("db")).as("dmin"))
      .groupBy(col("dmin")).agg(count(lit(1)).as("n_edges"))
    val ks = spark.range(1).select(explode(array(
      Seq(1L, 2L, 4L, 8L, 16L, 32L, 64L).map(lit(_)): _*)).as("k"))
    val nk = degHist.crossJoin(broadcast(ks)).groupBy(col("k"))
      .agg(sum(when(col("deg") > col("k"), col("n_nodes")).otherwise(0L))
        .as("n_k"))
    val ek = eHist.crossJoin(broadcast(ks)).groupBy(col("k"))
      .agg(sum(when(col("dmin") > col("k"), col("n_edges")).otherwise(0L))
        .as("e_k"))
    nk.join(ek, Seq("k"), "left")
      .select(col("k"), col("n_k"),
        coalesce(col("e_k"), lit(0L)).as("e_k"))
      .withColumn("phi",
        when(col("n_k") >= 2,
          (col("e_k") * 2).cast("double")
            / (col("n_k") * (col("n_k") - 1)).cast("double"))
          .otherwise(lit(null).cast("double")))
      .orderBy(col("k"))
  }

  private val richClubSql =
    """WITH items AS (
      |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
      |), edges AS (
      |  SELECT x.pk AS a, y.pk AS b
      |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk < y.pk
      |  GROUP BY 1, 2
      |), deg AS (
      |  SELECT node, CAST(COUNT(*) AS BIGINT) AS deg FROM (
      |    SELECT a AS node FROM edges UNION ALL SELECT b FROM edges) u
      |  GROUP BY 1
      |), dh AS (
      |  SELECT deg, CAST(COUNT(*) AS BIGINT) AS n_nodes FROM deg GROUP BY 1
      |), em AS (
      |  SELECT least(da.deg, db.deg) AS dmin FROM edges
      |  JOIN deg da ON da.node = a JOIN deg db ON db.node = b
      |), eh AS (
      |  SELECT dmin, CAST(COUNT(*) AS BIGINT) AS n_edges FROM em GROUP BY 1
      |), ks AS (
      |  SELECT CAST(unnest([1, 2, 4, 8, 16, 32, 64]) AS BIGINT) AS k
      |), nk AS (
      |  SELECT k, CAST(COALESCE(SUM(CASE WHEN deg > k THEN n_nodes END), 0)
      |    AS BIGINT) AS n_k
      |  FROM ks, dh GROUP BY 1
      |), ek AS (
      |  SELECT k, CAST(COALESCE(SUM(CASE WHEN dmin > k THEN n_edges END), 0)
      |    AS BIGINT) AS e_k
      |  FROM ks, eh GROUP BY 1
      |)
      |SELECT nk.k, n_k, e_k,
      |  CASE WHEN n_k >= 2 THEN CAST(e_k * 2 AS DOUBLE)
      |    / CAST(n_k * (n_k - 1) AS DOUBLE) END AS phi
      |FROM nk JOIN ek ON nk.k = ek.k
      |ORDER BY nk.k""".stripMargin

  // ---- jackknife ratio estimate -------------------------------------------

  /** Leave-one-NATION-out JACKKNIFE of the mean order value θ = S/C —
    * the resampling answer to "how sensitive is this corpus-level ratio
    * to any single stratum, and is the plug-in estimate biased". The
    * n=25 replicates are ALGEBRAIC — θ₍ᵢ₎ = (S−sᵢ)/(C−cᵢ) from the
    * per-nation totals, never a second scan — so the whole estimator is
    * two aggregates regardless of data scale. Replicates live in exact
    * floored micro-units (the house fixed-point convention); bias and
    * SE are final one-shot double expressions over exact decimal
    * moments. */
  def jackknifeRatio(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .join(Catalog.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("cents")).as("s_i"), count(lit(1)).as("c_i"))
    val tot = g.agg(sum(col("s_i")).as("s"), sum(col("c_i")).as("c"))
    g.crossJoin(broadcast(tot))
      .select(col("s"), col("c"),
        expr(s"CAST((CAST(s - s_i AS $dec) * 1000000) div (c - c_i) AS BIGINT)")
          .as("th_i"))
      .agg(count(lit(1)).as("n"), max(col("s")).as("s"),
        max(col("c")).as("c"), sum(col("th_i")).as("st"),
        sum(expr(s"CAST(CAST(th_i AS $dec) * th_i AS $dec)")).as("st2"))
      .select(col("n").as("n_nations"), col("s").as("total_cents"),
        col("c").as("n_orders"),
        expr(s"CAST((CAST(s AS $dec) * 1000000) div c AS BIGINT)")
          .as("theta_micro"),
        expr("CAST(st div n AS BIGINT)").as("jk_mean_micro"),
        (expr(s"CAST((n - 1) * (CAST(st AS $dec) - n * ((CAST(s AS $dec) * 1000000) div c)) AS $dec)")
          .cast("double") / col("n").cast("double")).as("jk_bias_micro"),
        sqrt(expr(s"CAST((n - 1) * (n * st2 - CAST(st AS $dec) * st) AS $dec)")
          .cast("double") / (col("n") * col("n")).cast("double"))
          .as("jk_se_micro"))
  }

  private val jackknifeRatioSql =
    """WITH g AS (
      |  SELECT c_nationkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS s_i,
      |    CAST(COUNT(*) AS BIGINT) AS c_i
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1
      |), tot AS (
      |  SELECT CAST(SUM(s_i) AS BIGINT) AS s, CAST(SUM(c_i) AS BIGINT) AS c
      |  FROM g
      |), th AS (
      |  SELECT s, c,
      |    CAST((CAST(s - s_i AS HUGEINT) * 1000000) // (c - c_i) AS BIGINT)
      |      AS th_i
      |  FROM g, tot
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(s) AS s, MAX(c) AS c,
      |    CAST(SUM(th_i) AS BIGINT) AS st,
      |    CAST(CAST(SUM(CAST(th_i AS HUGEINT) * th_i) AS VARCHAR)
      |      AS DECIMAL(38,0)) AS st2
      |  FROM th
      |)
      |SELECT n AS n_nations, s AS total_cents, c AS n_orders,
      |  CAST((CAST(s AS HUGEINT) * 1000000) // c AS BIGINT) AS theta_micro,
      |  CAST(st // n AS BIGINT) AS jk_mean_micro,
      |  CAST(CAST((n - 1) * (CAST(st AS HUGEINT)
      |      - n * ((CAST(s AS HUGEINT) * 1000000) // c)) AS VARCHAR)
      |    AS DOUBLE) / CAST(n AS DOUBLE) AS jk_bias_micro,
      |  sqrt(CAST(CAST((n - 1) * (n * CAST(st2 AS HUGEINT)
      |      - CAST(st AS HUGEINT) * st) AS VARCHAR) AS DOUBLE)
      |    / CAST(n * n AS DOUBLE)) AS jk_se_micro
      |FROM m""".stripMargin

  // ---- capture–recapture vocabulary estimate ------------------------------

  /** CAPTURE–RECAPTURE (Chapman) estimate of the corpus vocabulary:
    * treat the even-doc_id half as the capture sample and the odd half
    * as the recapture, estimate total distinct tokens from the overlap
    * — N̂ = (n₁+1)(n₂+1)/(m+1) − 1 — and audit it against the exact
    * truth the same scan already knows. The two-sample trick estimates
    * "how much vocabulary exists that NEITHER half saw", which is what
    * a crawl-coverage planner wants before fetching more data. One
    * distinct (parity, token) reduction, one token-keyed min/max
    * aggregate, exact integers, one floored micro-division + one error
    * ratio. */
  def captureRecapture(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val t = Catalog.load(spark, dir, "documents")
      .filter(col("text").isNotNull)
      .select((col("doc_id") % 2).as("par"),
        explode(split(col("text"), " ", -1)).as("tok"))
      .filter(col("tok") =!= "")
      .distinct()
    t.groupBy(col("tok"))
      .agg(min(col("par")).as("p0"), max(col("par")).as("p1"))
      .agg(count(lit(1)).as("vocab_true"),
        sum((col("p0") === 0).cast("long")).as("n_even"),
        sum((col("p1") === 1).cast("long")).as("n_odd"),
        sum((col("p0") === 0 && col("p1") === 1).cast("long")).as("n_both"))
      .select(col("n_even"), col("n_odd"), col("n_both"), col("vocab_true"),
        expr(s"""CAST((CAST(n_even + 1 AS $dec) * (n_odd + 1) * 1000000)
                 div (n_both + 1) - 1000000 AS BIGINT)""")
          .as("chapman_micro"))
      .withColumn("err_pct",
        (col("chapman_micro").cast("double") / lit(1e4)
          / col("vocab_true").cast("double")) - lit(100.0))
  }

  private val captureRecaptureSql =
    """WITH t AS (
      |  SELECT DISTINCT doc_id % 2 AS par, tok FROM (
      |    SELECT doc_id, unnest(string_split(text, ' ')) AS tok
      |    FROM documents WHERE text IS NOT NULL) u
      |  WHERE tok <> ''
      |), bt AS (
      |  SELECT tok, MIN(par) AS p0, MAX(par) AS p1 FROM t GROUP BY 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS vocab_true,
      |    CAST(SUM(CASE WHEN p0 = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_even,
      |    CAST(SUM(CASE WHEN p1 = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_odd,
      |    CAST(SUM(CASE WHEN p0 = 0 AND p1 = 1 THEN 1 ELSE 0 END) AS BIGINT)
      |      AS n_both
      |  FROM bt
      |)
      |SELECT n_even, n_odd, n_both, vocab_true,
      |  CAST((CAST(n_even + 1 AS HUGEINT) * (n_odd + 1) * 1000000)
      |    // (n_both + 1) - 1000000 AS BIGINT) AS chapman_micro,
      |  CAST(CAST((CAST(n_even + 1 AS HUGEINT) * (n_odd + 1) * 1000000)
      |    // (n_both + 1) - 1000000 AS BIGINT) AS DOUBLE) / 1e4
      |    / CAST(vocab_true AS DOUBLE) - 100.0 AS err_pct
      |FROM m""".stripMargin

  // ---- quantile shape indices (Bowley / Moors) -----------------------------

  /** Moment-free SHAPE indices per order priority: Bowley quantile
    * skewness (Q₁+Q₃−2·median)/(Q₃−Q₁) and Moors octile kurtosis
    * ((E₇−E₅)+(E₃−E₁))/(E₆−E₂) — the outlier-immune companions to
    * q34's moment-based variance/skew machinery (one 9-figure order
    * corrupts a moment; it moves an octile by one rank). Octiles are
    * exact type-1 order statistics picked by GlobalRank row_number
    * (rank ⌈j·n/8⌉, deterministic (value, key) tie-break — the
    * scale-safe distributed-rank recipe, never a single-partition
    * window); the indices are mirrored double divisions of exact
    * cents. */
  def quantileShape(spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("g"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
        col("o_orderkey").as("tb"))
    val r = graft.ops.GlobalRank.withRowNumber(base,
      Seq(col("g"), col("v"), col("tb")), "grn")
    val bounds = r.groupBy(col("g"))
      .agg(min(col("grn")).as("g0"), count(lit(1)).as("n"))
      .withColumnRenamed("g", "bg")
    val ranked = r.join(broadcast(bounds), col("g") <=> col("bg"))
      .withColumn("rn", col("grn") - col("g0") + 1)
    val oct = ranked.groupBy(col("g")).agg(
      max(col("n")).as("n"),
      max(when(expr("rn = (1 * n + 7) div 8"), col("v"))).as("e1"),
      max(when(expr("rn = (2 * n + 7) div 8"), col("v"))).as("e2"),
      max(when(expr("rn = (3 * n + 7) div 8"), col("v"))).as("e3"),
      max(when(expr("rn = (4 * n + 7) div 8"), col("v"))).as("e4"),
      max(when(expr("rn = (5 * n + 7) div 8"), col("v"))).as("e5"),
      max(when(expr("rn = (6 * n + 7) div 8"), col("v"))).as("e6"),
      max(when(expr("rn = (7 * n + 7) div 8"), col("v"))).as("e7"))
    oct.select(col("g").as("priority"), col("n"),
        col("e2").as("q1_cents"), col("e4").as("median_cents"),
        col("e6").as("q3_cents"),
        ((col("e2") + col("e6") - lit(2L) * col("e4")).cast("double")
          / nullif((col("e6") - col("e2")).cast("double"), lit(0.0)))
          .as("bowley_skew"),
        (((col("e7") - col("e5")) + (col("e3") - col("e1"))).cast("double")
          / nullif((col("e6") - col("e2")).cast("double"), lit(0.0)))
          .as("moors_kurt"))
      .orderBy(col("priority"))
  }

  private val quantileShapeSql =
    """WITH r AS (
      |  SELECT o_orderpriority AS g,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |    CAST(row_number() OVER (PARTITION BY o_orderpriority
      |      ORDER BY CAST(round(o_totalprice * 100) AS BIGINT), o_orderkey)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n
      |  FROM orders
      |), oct AS (
      |  SELECT g, MAX(n) AS n,
      |    MAX(CASE WHEN rn = (1 * n + 7) // 8 THEN v END) AS e1,
      |    MAX(CASE WHEN rn = (2 * n + 7) // 8 THEN v END) AS e2,
      |    MAX(CASE WHEN rn = (3 * n + 7) // 8 THEN v END) AS e3,
      |    MAX(CASE WHEN rn = (4 * n + 7) // 8 THEN v END) AS e4,
      |    MAX(CASE WHEN rn = (5 * n + 7) // 8 THEN v END) AS e5,
      |    MAX(CASE WHEN rn = (6 * n + 7) // 8 THEN v END) AS e6,
      |    MAX(CASE WHEN rn = (7 * n + 7) // 8 THEN v END) AS e7
      |  FROM r GROUP BY 1
      |)
      |SELECT g AS priority, n, e2 AS q1_cents, e4 AS median_cents,
      |  e6 AS q3_cents,
      |  CAST(e2 + e6 - 2 * e4 AS DOUBLE)
      |    / nullif(CAST(e6 - e2 AS DOUBLE), 0.0) AS bowley_skew,
      |  CAST((e7 - e5) + (e3 - e1) AS DOUBLE)
      |    / nullif(CAST(e6 - e2 AS DOUBLE), 0.0) AS moors_kurt
      |FROM oct
      |ORDER BY priority""".stripMargin

  // ---- Mantel–Haenszel stratified odds ratio ------------------------------

  /** MANTEL–HAENSZEL pooled odds ratio for urgent×fast-shipped,
    * STRATIFIED by customer nation — the confounding-adjusted
    * completion of q464's crude 2×2 effect sizes (q332 demonstrates
    * Simpson's paradox; MH is the estimator that defuses it):
    * OR_MH = Σᵢ(aᵢdᵢ/nᵢ) / Σᵢ(bᵢcᵢ/nᵢ), each stratum term an exact
    * floored micro-unit (the house fixed-point convention), reported
    * next to the crude pooled OR so the confounding gap is visible.
    * One fact aggregate to nation-level cells, then arithmetic over a
    * 25-row frame. */
  def mantelHaenszel(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val firstShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val cells = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
          .as("urgent"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .join(Catalog.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("fast",
        (datediff(col("first_ship"), col("od")) <= 30).cast("long"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("urgent") * col("fast")).as("a"),
        sum(col("urgent") * (lit(1L) - col("fast"))).as("b"),
        sum((lit(1L) - col("urgent")) * col("fast")).as("c"),
        sum((lit(1L) - col("urgent")) * (lit(1L) - col("fast"))).as("d"))
    cells
      .select(col("a"), col("b"), col("c"), col("d"),
        (col("a") + col("b") + col("c") + col("d")).as("nn"))
      .select(col("a"), col("b"), col("c"), col("d"),
        expr(s"CAST((CAST(a AS $dec) * d * 1000000) div nn AS BIGINT)")
          .as("r_i"),
        expr(s"CAST((CAST(b AS $dec) * c * 1000000) div nn AS BIGINT)")
          .as("s_i"))
      .agg(count(lit(1)).as("n_strata"),
        sum(col("a")).as("sa"), sum(col("b")).as("sb"),
        sum(col("c")).as("sc"), sum(col("d")).as("sd"),
        sum(col("r_i")).as("r_micro"), sum(col("s_i")).as("s_micro"))
      .select(col("n_strata"), col("r_micro"), col("s_micro"),
        (col("r_micro").cast("double") / col("s_micro").cast("double"))
          .as("or_mh"),
        (expr(s"CAST(CAST(sa AS $dec) * sd AS $dec)").cast("double")
          / expr(s"CAST(CAST(sb AS $dec) * sc AS $dec)").cast("double"))
          .as("or_crude"))
  }

  private val mantelHaenszelSql =
    """WITH f AS (
      |  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1
      |), r AS (
      |  SELECT c_nationkey,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS urgent,
      |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), first_ship)
      |      <= 30 THEN 1 ELSE 0 END AS fast
      |  FROM orders JOIN f ON o_orderkey = l_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |), cells AS (
      |  SELECT c_nationkey,
      |    CAST(SUM(urgent * fast) AS BIGINT) AS a,
      |    CAST(SUM(urgent * (1 - fast)) AS BIGINT) AS b,
      |    CAST(SUM((1 - urgent) * fast) AS BIGINT) AS c,
      |    CAST(SUM((1 - urgent) * (1 - fast)) AS BIGINT) AS d
      |  FROM r GROUP BY 1
      |), t AS (
      |  SELECT a, b, c, d, a + b + c + d AS nn FROM cells
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
      |    CAST(SUM(a) AS BIGINT) AS sa, CAST(SUM(b) AS BIGINT) AS sb,
      |    CAST(SUM(c) AS BIGINT) AS sc, CAST(SUM(d) AS BIGINT) AS sd,
      |    CAST(SUM(CAST((CAST(a AS HUGEINT) * d * 1000000) // nn AS BIGINT))
      |      AS BIGINT) AS r_micro,
      |    CAST(SUM(CAST((CAST(b AS HUGEINT) * c * 1000000) // nn AS BIGINT))
      |      AS BIGINT) AS s_micro
      |  FROM t
      |)
      |SELECT n_strata, r_micro, s_micro,
      |  CAST(r_micro AS DOUBLE) / CAST(s_micro AS DOUBLE) AS or_mh,
      |  CAST(CAST(CAST(sa AS HUGEINT) * sd AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(CAST(sb AS HUGEINT) * sc AS VARCHAR) AS DOUBLE)
      |    AS or_crude
      |FROM m""".stripMargin

  // ---- GE(2) inequality decomposition -------------------------------------

  /** Generalized-entropy GE(2) inequality of order values, DECOMPOSED
    * within/between nations — the question q174/q422's Gini cannot
    * answer (Gini does not decompose additively): is order-value
    * inequality a cross-country story or an everywhere story?
    * GE(2) = (n·Σx² − S²)/(2S²) needs no logarithm — exact decimal
    * moments, one mirrored division; the between term replaces Σx²
    * with Σ⌊s_g²/n_g⌋ (exact decimal floor via modulo subtraction —
    * Spark's `div` returns BIGINT and would overflow on the 10²⁴
    * squares), and within = total − between holds by the GE(2)
    * additive identity up to the sub-unit floor slack. */
  def ge2Decomposition(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val g = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
      .join(Catalog.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .groupBy(col("c_nationkey"))
      .agg(count(lit(1)).as("n_g"), sum(col("x")).as("s_g"),
        sum(expr(s"CAST(CAST(x AS $dec) * x AS $dec)")).as("q_g"))
    g.select(col("n_g"), col("s_g"), col("q_g"),
        expr(s"""CAST((CAST(s_g AS $dec) * s_g
                 - (CAST(s_g AS $dec) * s_g) % n_g) / n_g AS $dec)""")
          .as("t_g"))
      .agg(sum(col("n_g")).as("n"), sum(col("s_g")).as("s"),
        sum(col("q_g")).as("q"), sum(col("t_g")).as("t"))
      .select(
        (expr(s"CAST(n * q - CAST(s AS $dec) * s AS $dec)").cast("double")
          / expr(s"CAST(2 * CAST(s AS $dec) * s AS $dec)").cast("double"))
          .as("ge2_total"),
        (expr(s"CAST(n * t - CAST(s AS $dec) * s AS $dec)").cast("double")
          / expr(s"CAST(2 * CAST(s AS $dec) * s AS $dec)").cast("double"))
          .as("ge2_between"))
      .withColumn("ge2_within", col("ge2_total") - col("ge2_between"))
      .withColumn("between_share", col("ge2_between") / col("ge2_total"))
  }

  private val ge2DecompositionSql =
    """WITH g AS (
      |  SELECT c_nationkey, CAST(COUNT(*) AS BIGINT) AS n_g,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS s_g,
      |    SUM(CAST(round(o_totalprice * 100) AS HUGEINT)
      |      * CAST(round(o_totalprice * 100) AS BIGINT)) AS q_g
      |  FROM orders JOIN customer ON o_custkey = c_custkey
      |  GROUP BY 1
      |), m AS (
      |  SELECT CAST(SUM(n_g) AS BIGINT) AS n, CAST(SUM(s_g) AS BIGINT) AS s,
      |    SUM(q_g) AS q,
      |    SUM((CAST(s_g AS HUGEINT) * s_g) // n_g) AS t
      |  FROM g
      |), o AS (
      |  SELECT
      |    CAST(CAST(n * q - CAST(s AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(2 * CAST(s AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
      |      AS ge2_total,
      |    CAST(CAST(n * t - CAST(s AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
      |      / CAST(CAST(2 * CAST(s AS HUGEINT) * s AS VARCHAR) AS DOUBLE)
      |      AS ge2_between
      |  FROM m
      |)
      |SELECT ge2_total, ge2_between,
      |  ge2_total - ge2_between AS ge2_within,
      |  ge2_between / ge2_total AS between_share
      |FROM o""".stripMargin

  // ---- Lorenz asymmetry coefficient ---------------------------------------

  /** LORENZ ASYMMETRY coefficient S = F(μ) + L(μ) of order values —
    * the companion q174's Lorenz curve and q422's Gini leave out: the
    * SAME Gini can come from many-small-units inequality (S < 1) or
    * few-huge-units inequality (S > 1), and the remediation differs.
    * F(μ) = share of orders strictly below the mean (exact
    * cross-multiplied compare x·n < S — the mean is never
    * materialized as a float), L(μ) = their value share. One
    * aggregate for totals, one conditional re-aggregate, two mirrored
    * divisions. */
  def lorenzAsymmetry(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val x = Catalog.load(spark, dir, "orders")
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("x"))
    val tot = x.agg(count(lit(1)).as("n"), sum(col("x")).as("s"))
    x.crossJoin(broadcast(tot))
      .agg(max(col("n")).as("n"), max(col("s")).as("s"),
        sum(expr(s"CAST(CASE WHEN CAST(x AS $dec) * n < s THEN 1 ELSE 0 END AS BIGINT)"))
          .as("n_below"),
        sum(expr(s"CASE WHEN CAST(x AS $dec) * n < s THEN x ELSE 0 END"))
          .as("mass_below"))
      .select(col("n"), col("s"), col("n_below"), col("mass_below"),
        (col("n_below").cast("double") / col("n").cast("double"))
          .as("f_mu"),
        (col("mass_below").cast("double") / col("s").cast("double"))
          .as("l_mu"))
      .withColumn("lorenz_asym", col("f_mu") + col("l_mu"))
  }

  private val lorenzAsymmetrySql =
    """WITH x AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS x FROM orders
      |), tot AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(x) AS BIGINT) AS s
      |  FROM x
      |), m AS (
      |  SELECT MAX(n) AS n, MAX(s) AS s,
      |    CAST(SUM(CASE WHEN CAST(x AS HUGEINT) * n < s THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_below,
      |    CAST(SUM(CASE WHEN CAST(x AS HUGEINT) * n < s THEN x ELSE 0 END)
      |      AS BIGINT) AS mass_below
      |  FROM x, tot
      |)
      |SELECT n, s, n_below, mass_below,
      |  CAST(n_below AS DOUBLE) / CAST(n AS DOUBLE) AS f_mu,
      |  CAST(mass_below AS DOUBLE) / CAST(s AS DOUBLE) AS l_mu,
      |  CAST(n_below AS DOUBLE) / CAST(n AS DOUBLE)
      |    + CAST(mass_below AS DOUBLE) / CAST(s AS DOUBLE) AS lorenz_asym
      |FROM m""".stripMargin

  // ---- Cronbach's alpha -----------------------------------------------------

  /** CRONBACH'S ALPHA over the k=3 matched yearly spend "items"
    * (1995/96/97 order cents per customer, 0 when inactive) — the
    * internal-consistency readout for q474's panel: do the three
    * yearly measurements track ONE underlying customer trait?
    * α = k/(k−1)·(1 − Σvar(itemᵢ)/var(Σitems)); every variance
    * numerator n·Σx² − (Σx)² shares the same n² denominator, so α is
    * ONE exact decimal ratio — no per-variance float, no logarithm. */
  def cronbachAlpha(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val spend = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("y"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .filter(col("y").isin(1995, 1996, 1997))
      .groupBy(col("o_custkey"))
      .agg(sum(when(col("y") === 1995, col("cents")).otherwise(0L)).as("x1"),
        sum(when(col("y") === 1996, col("cents")).otherwise(0L)).as("x2"),
        sum(when(col("y") === 1997, col("cents")).otherwise(0L)).as("x3"))
    Catalog.load(spark, dir, "customer").select(col("c_custkey"))
      .join(spend, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("x1"), lit(0L)).as("x1"),
        coalesce(col("x2"), lit(0L)).as("x2"),
        coalesce(col("x3"), lit(0L)).as("x3"))
      .withColumn("t", col("x1") + col("x2") + col("x3"))
      .agg(count(lit(1)).as("n"),
        sum(col("x1")).as("s1"), sum(col("x2")).as("s2"),
        sum(col("x3")).as("s3"), sum(col("t")).as("st"),
        sum(expr(s"CAST(CAST(x1 AS $dec) * x1 AS $dec)")).as("q1"),
        sum(expr(s"CAST(CAST(x2 AS $dec) * x2 AS $dec)")).as("q2"),
        sum(expr(s"CAST(CAST(x3 AS $dec) * x3 AS $dec)")).as("q3"),
        sum(expr(s"CAST(CAST(t AS $dec) * t AS $dec)")).as("qt"))
      .select(col("n").as("n_subjects"),
        (lit(1.5) * (lit(1.0)
          - expr(s"""CAST(n * (q1 + q2 + q3)
                     - (CAST(s1 AS $dec) * s1 + CAST(s2 AS $dec) * s2
                        + CAST(s3 AS $dec) * s3) AS $dec)""").cast("double")
            / expr(s"CAST(n * qt - CAST(st AS $dec) * st AS $dec)")
              .cast("double"))).as("alpha"))
  }

  private val cronbachAlphaSql =
    """WITH sp AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS x1,
      |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS x2,
      |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS x3
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
      |  GROUP BY 1
      |), a AS (
      |  SELECT COALESCE(x1, 0) AS x1, COALESCE(x2, 0) AS x2,
      |    COALESCE(x3, 0) AS x3,
      |    COALESCE(x1, 0) + COALESCE(x2, 0) + COALESCE(x3, 0) AS t
      |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x1) AS BIGINT) AS s1, CAST(SUM(x2) AS BIGINT) AS s2,
      |    CAST(SUM(x3) AS BIGINT) AS s3, CAST(SUM(t) AS BIGINT) AS st,
      |    SUM(CAST(x1 AS HUGEINT) * x1) AS q1,
      |    SUM(CAST(x2 AS HUGEINT) * x2) AS q2,
      |    SUM(CAST(x3 AS HUGEINT) * x3) AS q3,
      |    SUM(CAST(t AS HUGEINT) * t) AS qt
      |  FROM a
      |)
      |SELECT n AS n_subjects,
      |  1.5 * (1.0 - CAST(CAST(n * (q1 + q2 + q3)
      |      - (CAST(s1 AS HUGEINT) * s1 + CAST(s2 AS HUGEINT) * s2
      |         + CAST(s3 AS HUGEINT) * s3) AS VARCHAR) AS DOUBLE)
      |    / CAST(CAST(n * qt - CAST(st AS HUGEINT) * st AS VARCHAR)
      |      AS DOUBLE)) AS alpha
      |FROM m""".stripMargin

  // ---- upper-tail dependence ------------------------------------------------

  /** UPPER-TAIL dependence between customer balance and lifetime spend:
    * given a customer is in the top decile on balance, how likely are
    * they ALSO top-decile on spend — λ_U = P(s > t_s | b > t_b), with
    * the independence lift n_both·n/(n_b·n_s). Correlation (q408)
    * summarizes the middle of the joint distribution; risk and VIP
    * planning care about the corner, and a Gaussian-looking r can
    * carry zero tail dependence. Both thresholds are exact rank-
    * selected order statistics at the integer rank (9n+9) div 10
    * (GlobalRank, no single-partition window, no float percentile);
    * the corner census is one conditional aggregate. */
  def tailDependence(spark: SparkSession, dir: String): DataFrame = {
    val sp = Catalog.load(spark, dir, "orders")
      .groupBy(col("o_custkey"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("s"))
    val j = Catalog.load(spark, dir, "customer")
      .select(col("c_custkey").as("k"),
        expr("CAST(round(c_acctbal * 100) AS BIGINT)").as("b"))
      .join(sp, col("k") === col("o_custkey"), "left")
      .select(col("k"), col("b"), coalesce(col("s"), lit(0L)).as("s"))
    def p90(v: String, out: String): DataFrame = {
      val (ranked, n) = graft.ops.GlobalRank.withRowNumberAndTotal(
        j.select(col(v).as("v"), col("k").as("tb")),
        Seq(col("v"), col("tb")), "rn")
      ranked.filter(col("rn") === (9 * n + 9) / 10)
        .select(col("v").as(out))
    }
    j.crossJoin(broadcast(p90("b", "t_b")))
      .crossJoin(broadcast(p90("s", "t_s")))
      .agg(count(lit(1)).as("n"), max(col("t_b")).as("t_b"),
        max(col("t_s")).as("t_s"),
        sum((col("b") > col("t_b")).cast("long")).as("n_b"),
        sum((col("s") > col("t_s")).cast("long")).as("n_s"),
        sum((col("b") > col("t_b") && col("s") > col("t_s")).cast("long"))
          .as("n_both"))
      .select(col("n"), col("t_b"), col("t_s"), col("n_b"), col("n_s"),
        col("n_both"),
        (col("n_both").cast("double") / col("n_b").cast("double"))
          .as("lambda_u"),
        ((col("n_both") * col("n")).cast("double")
          / (col("n_b") * col("n_s")).cast("double")).as("lift"))
  }

  private val tailDependenceSql =
    """WITH sp AS (
      |  SELECT o_custkey,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
      |      AS s
      |  FROM orders GROUP BY 1
      |), j AS (
      |  SELECT c_custkey AS k, CAST(round(c_acctbal * 100) AS BIGINT) AS b,
      |    COALESCE(s, 0) AS s
      |  FROM customer LEFT JOIN sp ON c_custkey = o_custkey
      |), nn AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM j
      |), tb AS (
      |  SELECT v AS t_b FROM (
      |    SELECT b AS v, row_number() OVER (ORDER BY b, k) AS rn FROM j) x,
      |    nn WHERE rn = (9 * n + 9) // 10
      |), ts AS (
      |  SELECT v AS t_s FROM (
      |    SELECT s AS v, row_number() OVER (ORDER BY s, k) AS rn FROM j) y,
      |    nn WHERE rn = (9 * n + 9) // 10
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, MAX(t_b) AS t_b,
      |    MAX(t_s) AS t_s,
      |    CAST(SUM(CASE WHEN b > t_b THEN 1 ELSE 0 END) AS BIGINT) AS n_b,
      |    CAST(SUM(CASE WHEN s > t_s THEN 1 ELSE 0 END) AS BIGINT) AS n_s,
      |    CAST(SUM(CASE WHEN b > t_b AND s > t_s THEN 1 ELSE 0 END)
      |      AS BIGINT) AS n_both
      |  FROM j, tb, ts
      |)
      |SELECT n, t_b, t_s, n_b, n_s, n_both,
      |  CAST(n_both AS DOUBLE) / CAST(n_b AS DOUBLE) AS lambda_u,
      |  CAST(n_both * n AS DOUBLE) / CAST(n_b * n_s AS DOUBLE) AS lift
      |FROM m""".stripMargin

  // ---- Wilcoxon signed-rank test ---------------------------------------------

  /** WILCOXON SIGNED-RANK test on the 12 matched month-of-year revenue
    * pairs, 1996 vs 1995 — the nonparametric PAIRED test the family
    * lacks (q192 Welch and q193 Mann–Whitney compare independent
    * samples; pairing by calendar month removes the seasonal
    * variance). |d| ranks are strict row_numbers over the 12-row
    * collapsed calendar frame (exact decimal cents differences never
    * tie across engines); W⁺, the exact mean n(n+1)/4 (reported ×4 to
    * stay integral) and the normal z-score are one integer pass plus
    * one final sqrt. */
  def wilcoxonSignedRank(spark: SparkSession, dir: String): DataFrame = {
    val m = Catalog.load(spark, dir, "orders")
      .select(year(to_date(col("o_orderdate"))).as("y"),
        month(to_date(col("o_orderdate"))).as("mo"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .filter(col("y").isin(1995, 1996))
      .groupBy(col("mo"))
      .agg(sum(when(col("y") === 1996, col("cents")).otherwise(0L))
          .as("c96"),
        sum(when(col("y") === 1995, col("cents")).otherwise(0L)).as("c95"))
      .select(col("mo"), (col("c96") - col("c95")).as("d"))
      .filter(col("d") =!= 0)
    val ranked = m
      .withColumn("rk", row_number().over(
        Window.orderBy(abs(col("d")), col("mo"))).cast("long"))
    ranked.agg(count(lit(1)).as("n"),
        sum(when(col("d") > 0, col("rk")).otherwise(0L)).as("w_plus"))
      .select(col("n"), col("w_plus"),
        (col("n") * (col("n") + 1)).as("w_mean_x4"),
        ((col("w_plus") * 4 - col("n") * (col("n") + 1)).cast("double")
          / (lit(4.0) * sqrt((col("n") * (col("n") + 1)
            * (lit(2L) * col("n") + 1)).cast("double") / lit(24.0))))
          .as("z"))
  }

  private val wilcoxonSignedRankSql =
    """WITH g AS (
      |  SELECT month(CAST(o_orderdate AS DATE)) AS mo,
      |    CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT)
      |    - CAST(SUM(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
      |      THEN CAST(round(o_totalprice * 100) AS BIGINT) ELSE 0 END)
      |      AS BIGINT) AS d
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996)
      |  GROUP BY 1
      |), r AS (
      |  SELECT d, CAST(row_number() OVER (ORDER BY abs(d), mo) AS BIGINT)
      |    AS rk
      |  FROM g WHERE d <> 0
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN d > 0 THEN rk ELSE 0 END) AS BIGINT) AS w_plus
      |  FROM r
      |)
      |SELECT n, w_plus, n * (n + 1) AS w_mean_x4,
      |  CAST(w_plus * 4 - n * (n + 1) AS DOUBLE)
      |    / (4.0 * sqrt(CAST(n * (n + 1) * (2 * n + 1) AS DOUBLE) / 24.0))
      |    AS z
      |FROM m""".stripMargin

  // ---- distribution-free median confidence interval ---------------------------

  /** DISTRIBUTION-FREE 95% confidence interval for the median order
    * value — the order-statistic CI (binomial ranks
    * l = ⌊(n − 1.96√n)/2⌋, u = n − l + 1) that needs no normality, no
    * bootstrap resamples (q221 bootstraps a MEAN with B replicate
    * scans; the median CI is just two more rank picks from the same
    * pass that yields the median). All three order statistics come
    * from one GlobalRank row-number pass — the rank arithmetic runs on
    * the driver against the exact total count, the same IEEE √n both
    * engines compute. */
  def medianCi(spark: SparkSession, dir: String): DataFrame = {
    val base = Catalog.load(spark, dir, "orders")
      .select(expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("v"),
        col("o_orderkey").as("tb"))
    val (ranked, n) = graft.ops.GlobalRank.withRowNumberAndTotal(
      base, Seq(col("v"), col("tb")), "rn")
    val l = math.floor((n - 1.96 * math.sqrt(n.toDouble)) / 2).toLong
    val u = n - l + 1
    val medLo = (n + 1) / 2
    val medHi = (n + 2) / 2
    ranked.filter(col("rn").isin(l, u, medLo, medHi))
      .agg(
        max(when(col("rn") === medLo, col("v"))).as("med_lo"),
        max(when(col("rn") === medHi, col("v"))).as("med_hi"),
        max(when(col("rn") === l, col("v"))).as("ci_lo_cents"),
        max(when(col("rn") === u, col("v"))).as("ci_hi_cents"))
      .select(lit(n).as("n"), lit(l).as("rank_lo"), lit(u).as("rank_hi"),
        ((col("med_lo") + col("med_hi")).cast("double") / lit(2.0))
          .as("median_cents"),
        col("ci_lo_cents"), col("ci_hi_cents"))
  }

  private val medianCiSql =
    """WITH base AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
      |    o_orderkey AS tb
      |  FROM orders
      |), nn AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n FROM base
      |), ranks AS (
      |  SELECT n,
      |    CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2) AS BIGINT)
      |      AS l,
      |    n - CAST(floor((n - 1.96 * sqrt(CAST(n AS DOUBLE))) / 2)
      |      AS BIGINT) + 1 AS u,
      |    (n + 1) // 2 AS med_lo_rank, (n + 2) // 2 AS med_hi_rank
      |  FROM nn
      |), r AS (
      |  SELECT v, CAST(row_number() OVER (ORDER BY v, tb) AS BIGINT) AS rn
      |  FROM base
      |)
      |SELECT n, l AS rank_lo, u AS rank_hi,
      |  CAST(MAX(CASE WHEN rn = med_lo_rank THEN v END)
      |     + MAX(CASE WHEN rn = med_hi_rank THEN v END) AS DOUBLE) / 2.0
      |    AS median_cents,
      |  MAX(CASE WHEN rn = l THEN v END) AS ci_lo_cents,
      |  MAX(CASE WHEN rn = u THEN v END) AS ci_hi_cents
      |FROM r, ranks
      |GROUP BY n, l, u""".stripMargin

  // ---- Fleiss' kappa -------------------------------------------------------------

  /** FLEISS' KAPPA over the three matched yearly "raters" (did the
    * customer order in 1995/1996/1997) — the m-rater completion of the
    * agreement family: q461's Cohen κ handles exactly two raters,
    * Fleiss asks whether ALL THREE years agree on who is active beyond
    * the base-rate chance. With m=3 binary raters the whole statistic
    * reduces to two integer sums (Σrᵢ and Σ(rᵢ²+(3−rᵢ)²)):
    * κ = (9n²·A − 6n·E)/(6n·(9n² − E)) with A = Σ(rᵢ²+(3−rᵢ)²) − 3n
    * and E = S² + (3n−S)² — exact cross-multiplied integers, one
    * sign-split floored micro division. */
  def fleissKappa(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val flags = Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), year(to_date(col("o_orderdate"))).as("y"))
      .filter(col("y").isin(1995, 1996, 1997))
      .groupBy(col("o_custkey"))
      .agg((max((col("y") === 1995).cast("long"))
        + max((col("y") === 1996).cast("long"))
        + max((col("y") === 1997).cast("long"))).as("r"))
    Catalog.load(spark, dir, "customer").select(col("c_custkey"))
      .join(flags, col("c_custkey") === col("o_custkey"), "left")
      .select(coalesce(col("r"), lit(0L)).as("r"))
      .agg(count(lit(1)).as("n"), sum(col("r")).as("s"),
        sum(col("r") * col("r") + (lit(3L) - col("r"))
          * (lit(3L) - col("r"))).as("sq"))
      .select(col("n"), col("s"),
        expr(s"CAST(sq - 3 * n AS BIGINT)").as("a"),
        expr(s"""CAST(CAST(s AS $dec) * s
                 + (3 * CAST(n AS $dec) - s) * (3 * CAST(n AS $dec) - s)
                 AS $dec)""").as("e"))
      .select(col("n"), col("s").as("s_yes"),
        expr(s"""CAST(CASE
                 WHEN 9 * CAST(n AS $dec) * n * a - 6 * CAST(n AS $dec) * e >= 0
                 THEN ((9 * CAST(n AS $dec) * n * a
                        - 6 * CAST(n AS $dec) * e) * 1000000)
                      div (6 * CAST(n AS $dec) * (9 * CAST(n AS $dec) * n - e))
                 ELSE -(((6 * CAST(n AS $dec) * e
                          - 9 * CAST(n AS $dec) * n * a) * 1000000)
                      div (6 * CAST(n AS $dec) * (9 * CAST(n AS $dec) * n - e)))
                 END AS BIGINT)""").as("kappa_micro"))
  }

  private val fleissKappaSql =
    """WITH f AS (
      |  SELECT o_custkey,
      |    MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1995
      |      THEN 1 ELSE 0 END)
      |    + MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1996
      |      THEN 1 ELSE 0 END)
      |    + MAX(CASE WHEN year(CAST(o_orderdate AS DATE)) = 1997
      |      THEN 1 ELSE 0 END) AS r
      |  FROM orders
      |  WHERE year(CAST(o_orderdate AS DATE)) IN (1995, 1996, 1997)
      |  GROUP BY 1
      |), a AS (
      |  SELECT COALESCE(r, 0) AS r
      |  FROM customer LEFT JOIN f ON c_custkey = o_custkey
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n, CAST(SUM(r) AS BIGINT) AS s,
      |    CAST(SUM(r * r + (3 - r) * (3 - r)) AS BIGINT) AS sq
      |  FROM a
      |), t AS (
      |  SELECT n, s, sq - 3 * n AS a,
      |    CAST(s AS HUGEINT) * s
      |      + (3 * CAST(n AS HUGEINT) - s) * (3 * CAST(n AS HUGEINT) - s)
      |      AS e
      |  FROM m
      |)
      |SELECT n, s AS s_yes,
      |  CAST(CASE
      |    WHEN 9 * CAST(n AS HUGEINT) * n * a - 6 * CAST(n AS HUGEINT) * e
      |      >= 0
      |    THEN ((9 * CAST(n AS HUGEINT) * n * a - 6 * CAST(n AS HUGEINT) * e)
      |          * 1000000)
      |         // (6 * CAST(n AS HUGEINT) * (9 * CAST(n AS HUGEINT) * n - e))
      |    ELSE -(((6 * CAST(n AS HUGEINT) * e
      |             - 9 * CAST(n AS HUGEINT) * n * a) * 1000000)
      |         // (6 * CAST(n AS HUGEINT) * (9 * CAST(n AS HUGEINT) * n - e)))
      |  END AS BIGINT) AS kappa_micro
      |FROM t""".stripMargin

  // ---- Cochran–Mantel–Haenszel test ---------------------------------------------

  /** COCHRAN–MANTEL–HAENSZEL χ² for urgent×fast across the 25 nation
    * strata — the TEST that belongs to q482's MH odds-ratio ESTIMATE:
    * is there ANY common association once nation is controlled?
    * Per-stratum E_i = r₁c₁/n and hypergeometric V_i =
    * r₁r₂c₁c₂/(n²(n−1)) in exact floored micro-units (the logrank
    * recipe on a different panel), χ² = (ΣO−ΣE)²/ΣV one final
    * mirrored double. Same single fact collapse as q482. */
  def cmhTest(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val firstShip = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_orderkey"))
      .agg(min(to_date(col("l_shipdate"))).as("first_ship"))
    val cells = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"),
        to_date(col("o_orderdate")).as("od"),
        col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
          .as("urgent"))
      .join(firstShip, col("o_orderkey") === col("l_orderkey"))
      .join(Catalog.load(spark, dir, "customer")
          .select(col("c_custkey"), col("c_nationkey")),
        col("o_custkey") === col("c_custkey"))
      .withColumn("fast",
        (datediff(col("first_ship"), col("od")) <= 30).cast("long"))
      .groupBy(col("c_nationkey"))
      .agg(sum(col("urgent") * col("fast")).as("a"),
        sum(col("urgent")).as("r1"), sum(col("fast")).as("c1"),
        count(lit(1)).as("nn"))
    cells
      .filter(col("nn") > 1)
      .select(col("a"),
        expr(s"CAST((CAST(r1 AS $dec) * c1 * 1000000) div nn AS BIGINT)")
          .as("e_mu"),
        expr(s"""CAST((CAST(r1 AS $dec) * (nn - r1) * c1 * (nn - c1)
                 * 1000000)
                 div (CAST(nn AS $dec) * nn * (nn - 1)) AS BIGINT)""")
          .as("v_mu"))
      .agg(count(lit(1)).as("n_strata"), sum(col("a")).as("o_sum"),
        sum(col("e_mu")).as("e_micro"), sum(col("v_mu")).as("v_micro"))
      .select(col("n_strata"), col("o_sum"), col("e_micro"),
        col("v_micro"),
        when(col("v_micro") > 0,
          expr(s"""CAST((CAST(o_sum AS $dec) * 1000000 - e_micro)
                   * (CAST(o_sum AS $dec) * 1000000 - e_micro) AS $dec)""")
            .cast("double")
            / expr(s"CAST(CAST(v_micro AS $dec) * 1000000 AS $dec)")
              .cast("double"))
          .otherwise(lit(null).cast("double")).as("cmh_chi2"))
  }

  private val cmhTestSql =
    """WITH f AS (
      |  SELECT l_orderkey, MIN(CAST(l_shipdate AS DATE)) AS first_ship
      |  FROM lineitem GROUP BY 1
      |), r AS (
      |  SELECT c_nationkey,
      |    CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
      |      THEN 1 ELSE 0 END AS urgent,
      |    CASE WHEN date_diff('day', CAST(o_orderdate AS DATE), first_ship)
      |      <= 30 THEN 1 ELSE 0 END AS fast
      |  FROM orders JOIN f ON o_orderkey = l_orderkey
      |  JOIN customer ON o_custkey = c_custkey
      |), cells AS (
      |  SELECT c_nationkey, CAST(SUM(urgent * fast) AS BIGINT) AS a,
      |    CAST(SUM(urgent) AS BIGINT) AS r1,
      |    CAST(SUM(fast) AS BIGINT) AS c1,
      |    CAST(COUNT(*) AS BIGINT) AS nn
      |  FROM r GROUP BY 1
      |), t AS (
      |  SELECT a,
      |    (CAST(r1 AS HUGEINT) * c1 * 1000000) // nn AS e_mu,
      |    (CAST(r1 AS HUGEINT) * (nn - r1) * c1 * (nn - c1) * 1000000)
      |      // (CAST(nn AS HUGEINT) * nn * (nn - 1)) AS v_mu
      |  FROM cells WHERE nn > 1
      |), m AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_strata,
      |    CAST(SUM(a) AS BIGINT) AS o_sum,
      |    CAST(SUM(e_mu) AS BIGINT) AS e_micro,
      |    CAST(SUM(v_mu) AS BIGINT) AS v_micro
      |  FROM t
      |)
      |SELECT n_strata, o_sum, e_micro, v_micro,
      |  CASE WHEN v_micro > 0 THEN
      |    CAST(CAST((CAST(o_sum AS HUGEINT) * 1000000 - e_micro)
      |      * (CAST(o_sum AS HUGEINT) * 1000000 - e_micro) AS VARCHAR)
      |      AS DOUBLE)
      |    / CAST(CAST(CAST(v_micro AS HUGEINT) * 1000000 AS VARCHAR)
      |      AS DOUBLE)
      |  END AS cmh_chi2
      |FROM m""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q513_cmh_test", cmhTest, Some(cmhTestSql),
      "Cochran-Mantel-Haenszel chi2 for urgent x fast across nation " +
        "strata — the significance test behind q482's pooled OR, exact " +
        "micro O/E/V per stratum"),
    Q("q509_fleiss_kappa", fleissKappa, Some(fleissKappaSql),
      "Fleiss' kappa across the three matched yearly activity raters " +
        "per customer — the m-rater completion of q461's Cohen kappa, " +
        "exact cross-multiplied integers, sign-split micro division"),
    Q("q500_median_ci", medianCi, Some(medianCiSql),
      "distribution-free 95% CI for the median order value from " +
        "binomial order-statistic ranks — two extra rank picks from " +
        "the same GlobalRank pass that yields the median"),
    Q("q493_wilcoxon_signed", wilcoxonSignedRank,
      Some(wilcoxonSignedRankSql),
      "Wilcoxon signed-rank on the 12 matched month-of-year revenue " +
        "pairs 1996 vs 1995 — the paired nonparametric test next to " +
        "Mann-Whitney, exact integer W+ and x4 mean"),
    Q("q487_tail_dependence", tailDependence, Some(tailDependenceSql),
      "upper-tail dependence lambda_U between balance and spend top " +
        "deciles + independence lift — the joint-corner risk readout " +
        "correlation misses, exact integer-rank thresholds"),
    Q("q482_mantel_haenszel", mantelHaenszel, Some(mantelHaenszelSql),
      "Mantel-Haenszel nation-stratified odds ratio for urgent x fast " +
        "next to the crude pooled OR — the confounding-adjusted " +
        "completion of q464, exact micro-unit stratum terms"),
    Q("q483_ge2_decomposition", ge2Decomposition,
      Some(ge2DecompositionSql),
      "GE(2) inequality of order values decomposed within/between " +
        "nations from exact decimal moments — the additive split Gini " +
        "cannot give, logarithm-free"),
    Q("q484_lorenz_asymmetry", lorenzAsymmetry, Some(lorenzAsymmetrySql),
      "Lorenz asymmetry coefficient F(mu)+L(mu) with the mean applied " +
        "as an exact cross-multiplied compare — distinguishes small-" +
        "unit from large-unit inequality at equal Gini"),
    Q("q485_cronbach_alpha", cronbachAlpha, Some(cronbachAlphaSql),
      "Cronbach's alpha over the 1995/96/97 yearly spend items per " +
        "customer — internal consistency as one exact decimal ratio"),
    Q("q478_rich_club", richClub, Some(richClubSql),
      "rich-club coefficient sweep over the part co-purchase graph " +
        "(degree-domain histograms x 7-threshold grid, exact counts) — " +
        "hub interconnection next to q225 assortativity"),
    Q("q479_jackknife_ratio", jackknifeRatio, Some(jackknifeRatioSql),
      "leave-one-nation-out jackknife of mean order value: algebraic " +
        "replicates in exact micro-units, bias + SE from decimal moments"),
    Q("q480_capture_recapture", captureRecapture,
      Some(captureRecaptureSql),
      "Chapman capture-recapture vocabulary estimate from the even/odd " +
        "doc split, audited against the exact truth — crawl-coverage " +
        "planning, exact integers"),
    Q("q481_quantile_shape", quantileShape, Some(quantileShapeSql),
      "Bowley quantile skewness + Moors octile kurtosis per priority " +
        "from exact rank-selected octiles (GlobalRank, no single-" +
        "partition window) — outlier-immune shape indices"),
    Q("q473_friedman", friedman, Some(friedmanSql),
      "Friedman blocked rank test: regions ranked within each calendar " +
        "month — the within-block completion of q437's pooled " +
        "Kruskal-Wallis, exact micro-unit chi2_F"),
    Q("q474_cochrans_q", cochransQ, Some(cochransQSql),
      "Cochran's Q over k=3 matched binary conditions per customer " +
        "(ordered in 1995/96/97) — the k-way McNemar, exact integers, " +
        "one floored division"),
    Q("q470_cochran_armitage", cochranArmitage, Some(cochranArmitageSql),
      "Cochran-Armitage trend test: does fast shipping decline " +
        "monotonically across the ordered priority ladder — exact " +
        "cross-multiplied z^2, one division"),
    Q("q464_effect_sizes_2x2", effectSizes2x2, Some(effectSizes2x2Sql),
      "2x2 effect sizes (odds ratio, relative risk, micro-unit risk " +
        "difference) for urgent x fast-shipped — the how-big companion " +
        "to the chi2/kappa/McNemar tests"),
    Q("q465_mcnemar", mcnemar, Some(mcnemarSql),
      "McNemar's test on the q461 paired bits — discordant-cell chi2 " +
        "plus continuity-corrected form, exact integers, one division " +
        "each"),
    Q("q461_cohens_kappa", cohensKappa, Some(cohensKappaSql),
      "Cohen's kappa between buyer urgency and fast shipping per order " +
        "(exact 2x2 cells, cross-multiplied closed form, one division)"),
    Q("q462_hoover_index", hooverIndex, Some(hooverIndexSql),
      "Hoover/Robin-Hood inequality index of customer spend — " +
        "all-integer cross-multiplied |n*x - S| sum, one division"),
    Q("q463_weighted_quantiles", weightedQuantiles,
      Some(weightedQuantilesSql),
      "quantity-weighted price quartiles via the distributed exact " +
        "running sum (type-1 weighted quantile, all-integer crossings)"),
    Q("q453_cube_grouping_id", cubeGroupingId, Some(cubeGroupingIdSql),
      "CUBE over (region, nation) revenue with the GROUPING bitmask — " +
        "machine-readable aggregation level per row (subtotal vs real " +
        "null group), exact integer cents"),
    Q("q450_version_diff", versionDiff, Some(versionDiffSql),
      "row-level change set between two PUBLISHED table versions via " +
        "the time-travel diff (multiset EXCEPT ALL both ways) — oracle " +
        "certifies the publish -> time-travel -> diff round-trip"),
    Q("q236_item_similar", itemSimilar, Some(itemSimilarSql),
      "item2item collaborative filtering: co-occurrence cosine top-3 " +
        "neighbors per item (basket-bounded pair join, exact counts)"),
    Q("q179_basket_pairs", basketPairs, Some(basketPairsSql),
      "market-basket co-purchase pairs with lift (per-basket bounded " +
        "self-join, exact counts, one mirrored division)"),
    Q("q176_variant_json", variantJson, Some(variantJsonSql),
      "Spark 4 VARIANT round-trip: parse_json + typed variant_get " +
        "extraction feeding an exact-cents aggregate"),
    Q("q174_lorenz", lorenz, Some(lorenzSql),
      "Lorenz curve of supplier revenue concentration (exact cents, " +
        "BIGINT cumulative sums, one mirrored division per row)"),
    Q("q154_rank_fusion", rankFusion, Some(rankFusionSql),
      "reciprocal-rank fusion of revenue and order-count supplier " +
        "rankings (mirrored IEEE 1/(60+r) terms)"),
    Q("q133_relational_division", relationalDivision,
      Some(relationalDivisionSql),
      "FOR-ALL division: customers covering every priority class, " +
        "one aggregate (no double NOT EXISTS)"),
    Q("q130_salted_agg", saltedAgg, Some(saltedAggSql),
      "two-phase salted aggregation for hot group keys == plain GROUP BY"),
    Q("q128_set_ops_all", setOpsAll, Some(setOpsAllSql),
      "EXCEPT ALL / INTERSECT ALL multiset semantics per key"),
    Q("q129_median", medianQuantity, Some(medianSql),
      "exact per-group median (midpoint-interpolated, IEEE-identical)"),
    Q("q126_listagg", listaggSuppliers, Some(listaggSql),
      "deterministic LISTAGG WITHIN GROUP — per-nation supplier CSV"),
    Q("q33_math_pack", mathPack, Some(mathPackSql),
      "IEEE-exact math scalars (abs/ceil/floor/sqrt/round/mod)"),
    Q("q32_subqueries", subqueries, Some(subqueriesSql),
      "scalar + correlated scalar subqueries (decorrelated by Catalyst)"),
    Q("q31_grouping_sets", groupingSets, Some(groupingSetsSql),
      "explicit GROUPING SETS via spark.sql — same statement runs on both engines"),
    Q("q20_semi_join", semiJoin, Some(semiJoinSql), "left-semi join (EXISTS)"),
    Q("q21_anti_join", antiJoin, Some(antiJoinSql), "left-anti join (NOT EXISTS)"),
    Q("q22_outer_join_agg", outerJoin, Some(outerJoinSql), "left-outer join preserving empty groups"),
    Q("q69_full_outer", fullOuterJoin, Some(fullOuterJoinSql),
      "full-outer join preserving unmatched rows from BOTH sides"),
    Q("q79_cross_join", crossJoinDims, Some(crossJoinDimsSql),
      "explicit cartesian product of the two smallest dims"),
    Q("q83_union_by_name", unionByNameQ, Some(unionByNameSql),
      "unionByName with missing-column null-fill (schema evolution)"),
    Q("q84_null_safe_eq", nullSafeEq, Some(nullSafeEqSql),
      "null-safe equality join (<=> / IS NOT DISTINCT FROM)"),
    Q("q23_set_ops", setOps, Some(setOpsSql), "union-distinct / intersect / except"),
    Q("q24_distinct", distinctOps, Some(distinctOpsSql), "dropDuplicates + countDistinct"),
    Q("q25_cube", cubeAgg, Some(cubeAggSql), "CUBE grouping sets"),
    Q("q26_rollup", rollupAgg, Some(rollupAggSql), "ROLLUP through dimension joins"),
    Q("q27_case_having", caseHaving, Some(caseHavingSql), "CASE WHEN banding + HAVING"),
    Q("q28_string_pack", stringPack, Some(stringPackSql), "string scalar functions"),
    Q("q29_date_pack", datePack, Some(datePackSql), "date extraction + monthly agg"),
    Q("q30_json_pack", jsonPack, Some(jsonPackSql), "JSON field extraction from props"))
}
