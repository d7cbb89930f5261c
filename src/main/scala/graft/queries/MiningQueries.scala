package graft.queries

import graft.Q
import graft.catalog.Catalog
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Pattern-mining / evaluation operators (round 7 widening): retrieval
  * recall@k, community label propagation, sequential pattern counts,
  * behavioural diversity, seasonal indices. Determinism rules as
  * elsewhere: integer / decimal exact state everywhere, at most one
  * final mirrored IEEE division per output column.
  */
object MiningQueries {

  // ---- retrieval eval: recall@k of a prefix-dim retriever -------------

  private val NQ = 20
  private val K = 10
  private val PrefixDims = 8

  /** Embeddings with the q70 scaled-integer view: xi = floor(x·10⁶) per
    * dimension, so every dot product is an exact BIGINT on any engine. */
  private def scaledEmb(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"),
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))")
          .as("sv"))

  private def dotCol(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0L), (acc, x) => acc + x)

  /** Recall@10 of a cheap 8-prefix-dimension dot-product retriever
    * against the exact full-dimension dot-product top-10, per query —
    * the standard "is my ANN shortcut good enough" eval. Both rankings
    * are integer-exact (scaled-int dots, ties broken on neighbor id);
    * recall is the only division. Scale shape: the NQ query vectors are
    * a broadcast nested-loop against the corpus (k·N dot products, no
    * shuffle of the corpus), each side's top-k via one per-query window
    * — never a corpus×corpus join. */
  def recallAtK(spark: SparkSession, dir: String): DataFrame = {
    val emb = scaledEmb(spark, dir)
    val queries = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("sv").as("qv"))
    val pairs = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        dotCol(col("qv"), col("sv")).as("full_dot"),
        dotCol(slice(col("qv"), 1, PrefixDims),
          slice(col("sv"), 1, PrefixDims)).as("pre_dot"))
    val wFull = Window.partitionBy(col("query_id"))
      .orderBy(col("full_dot").desc, col("neighbor_id"))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(col("pre_dot").desc, col("neighbor_id"))
    val ranked = pairs
      .withColumn("rf", row_number().over(wFull))
      .withColumn("rp", row_number().over(wPre))
    val gt = ranked.filter(col("rf") <= K)
      .select(col("query_id"), col("neighbor_id"))
    val cand = ranked.filter(col("rp") <= K)
      .select(col("query_id"), col("neighbor_id"))
    gt.join(cand, Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy(col("query_id"))
      .agg(count(lit(1)).as("hits"))
      .select(col("query_id"), col("hits"),
        (col("hits").cast("double") / K).as("recall"))
      .orderBy(col("query_id"))
  }

  private val recallAtKSql =
    s"""WITH v AS (
       |  SELECT vec_id,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi,
       |    unnest(range(len(embedding))) AS i
       |  FROM embeddings
       |), dots AS (
       |  SELECT q.vec_id AS query_id, d.vec_id AS neighbor_id,
       |    CAST(SUM(q.xi * d.xi) AS BIGINT) AS full_dot,
       |    CAST(SUM(CASE WHEN q.i < $PrefixDims THEN q.xi * d.xi ELSE 0 END)
       |      AS BIGINT) AS pre_dot
       |  FROM v q JOIN v d ON q.i = d.i
       |  WHERE q.vec_id < $NQ AND d.vec_id <> q.vec_id
       |  GROUP BY 1, 2
       |), ranked AS (
       |  SELECT query_id, neighbor_id,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY full_dot DESC, neighbor_id) AS rf,
       |    row_number() OVER (PARTITION BY query_id
       |      ORDER BY pre_dot DESC, neighbor_id) AS rp
       |  FROM dots
       |)
       |SELECT g.query_id, CAST(COUNT(*) AS BIGINT) AS hits,
       |  CAST(COUNT(*) AS DOUBLE) / $K AS recall
       |FROM (SELECT query_id, neighbor_id FROM ranked WHERE rf <= $K) g
       |JOIN (SELECT query_id, neighbor_id FROM ranked WHERE rp <= $K) c
       |  ON g.query_id = c.query_id AND g.neighbor_id = c.neighbor_id
       |GROUP BY g.query_id
       |ORDER BY g.query_id""".stripMargin

  // ---- community detection: synchronous min-label propagation ---------

  private val LpRounds = 5

  /** Label propagation communities on the max-quantity slice of the
    * customer↔supplier purchase graph (l_quantity ≥ 50 keeps the graph
    * sparse enough to have real community structure — the full graph is
    * one connected blob): every node starts with its
    * own integer id as label, and each synchronous round takes the MIN
    * over its own and its neighbors' labels. After 5 rounds the label is
    * the community id; output is community sizes. Deterministic by
    * construction (min is order-free) — no float state at all. Scale
    * shape: each round is one join+min-aggregate on 8-byte keys, the
    * same shuffle pattern as PageRank; rounds are a fixed unrolled
    * sequence, not a driver-side convergence loop. */
  def labelProp(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Catalog.load(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 50)
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
    val nodes = edges.select(col("u").as("n")).distinct()
    var lab = nodes.select(col("n"), col("n").as("lab"))
    for (_ <- 1 to LpRounds) {
      val nbrMin = edges.join(lab, edges("u") === lab("n"))
        .groupBy(col("v")).agg(min(col("lab")).as("nl"))
      lab = lab.join(nbrMin, lab("n") === nbrMin("v"), "left")
        .select(col("n"), least(col("lab"), coalesce(col("nl"), col("lab"))).as("lab"))
        .localCheckpoint(eager = false)
    }
    lab.groupBy(col("lab").as("community"))
      .agg(count(lit(1)).as("size"))
      .orderBy(col("size").desc, col("community"))
  }

  private val labelPropSql = {
    def round(k: Int) =
      s"""l$k AS (
         |  SELECT l.n,
         |    LEAST(l.lab, COALESCE(m.nl, l.lab)) AS lab
         |  FROM l${k - 1} l LEFT JOIN (
         |    SELECT e.v, MIN(p.lab) AS nl
         |    FROM edges e JOIN l${k - 1} p ON e.u = p.n
         |    GROUP BY e.v) m ON m.v = l.n
         |)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT DISTINCT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  WHERE l_quantity >= 50
       |), edges AS (
       |  SELECT u, v FROM e0 UNION SELECT v, u FROM e0
       |), nodes AS (
       |  SELECT DISTINCT u AS n FROM edges
       |), l0 AS (
       |  SELECT n, n AS lab FROM nodes
       |), ${(1 to LpRounds).map(round).mkString(", ")}
       |SELECT lab AS community, CAST(COUNT(*) AS BIGINT) AS size
       |FROM l$LpRounds
       |GROUP BY 1
       |ORDER BY size DESC, community""".stripMargin
  }

  // ---- sequential pattern mining: consecutive event trigrams ----------

  /** Top-20 consecutive event-type trigrams across user timelines, with
    * occurrence and distinct-user support counts — the PrefixSpan-lite
    * "what do users do in sequence" mining primitive. Per-user total
    * order on (ts, event_id); the trigram is two LEADs inside the user
    * partition (one shuffle on user_id), then a count aggregate. All
    * integer. */
  def seqTrigrams(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("t2", lead(col("event_type"), 1).over(w))
      .withColumn("t3", lead(col("event_type"), 2).over(w))
      .filter(col("t2").isNotNull && col("t3").isNotNull)
      .groupBy(col("event_type").as("t1"), col("t2"), col("t3"))
      .agg(count(lit(1)).as("occurrences"),
        countDistinct(col("user_id")).as("users"))
      .orderBy(col("occurrences").desc, col("t1"), col("t2"), col("t3"))
      .limit(20)
  }

  private val seqTrigramsSql =
    """WITH seq AS (
      |  SELECT event_type AS t1,
      |    lead(event_type, 1) OVER w AS t2,
      |    lead(event_type, 2) OVER w AS t3,
      |    user_id
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
      |)
      |SELECT t1, t2, t3, CAST(COUNT(*) AS BIGINT) AS occurrences,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS users
      |FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
      |GROUP BY 1, 2, 3
      |ORDER BY occurrences DESC, t1, t2, t3
      |LIMIT 20""".stripMargin

  // ---- behavioural diversity: effective number of event types ---------

  /** Per-user behavioural diversity as the EFFECTIVE number of event
    * types 1/Σpᵢ² = n²/Σcᵢ² (inverse Simpson) — entropy's rational
    * cousin, chosen because it needs no transcendental (ln is not
    * correctly rounded and differs across libm builds; ÷ is exact).
    * n and Σc² stay BIGINT; the single division is the output. One
    * two-level aggregate, shuffles on (user, type) then user. */
  def effectiveTypes(spark: SparkSession, dir: String): DataFrame = {
    val perType = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    perType.groupBy(col("user_id"))
      .agg(sum(col("c")).as("n"),
        count(lit(1)).as("types"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("user_id"), col("n"), col("types"),
        ((col("n") * col("n")).cast("double") / col("sum_c2").cast("double"))
          .as("effective_types"))
      .orderBy(col("user_id"))
  }

  private val effectiveTypesSql =
    """WITH per_type AS (
      |  SELECT user_id, event_type, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT user_id, CAST(SUM(c) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS BIGINT) AS types,
      |  CAST(SUM(c) * SUM(c) AS DOUBLE) / CAST(SUM(c * c) AS DOUBLE)
      |    AS effective_types
      |FROM per_type
      |GROUP BY user_id
      |ORDER BY user_id""".stripMargin

  // ---- seasonal index: day-of-week revenue multipliers ----------------

  /** ISO-day-of-week seasonal indices over order revenue: index(d) =
    * (cents_d · total_days) / (days_d · total_cents), i.e. the ratio of
    * that weekday's average daily revenue to the overall average —
    * the multiplicative-decomposition seasonal factor. Numerator and
    * denominator are exact BIGINT products; ONE division per row.
    * DOW convention: Spark weekday()+1 == DuckDB isodow() (Mon=1). */
  def dowSeasonal(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val byDow = daily
      .groupBy(expr("CAST(weekday(d) + 1 AS BIGINT)").as("isodow"))
      .agg(count(lit(1)).as("days"), sum(col("cents")).as("cents"))
    val tot = byDow.agg(sum(col("days")).as("tdays"), sum(col("cents")).as("tcents"))
    byDow.crossJoin(broadcast(tot))
      .select(col("isodow"), col("days"), col("cents"),
        ((col("cents") * col("tdays")).cast("double") /
          (col("days") * col("tcents")).cast("double")).as("seasonal_index"))
      .orderBy(col("isodow"))
  }

  private val dowSeasonalSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |), by_dow AS (
      |  SELECT CAST(isodow(d) AS BIGINT) AS isodow,
      |    CAST(COUNT(*) AS BIGINT) AS days,
      |    CAST(SUM(cents) AS BIGINT) AS cents
      |  FROM daily GROUP BY 1
      |), tot AS (
      |  SELECT SUM(days) AS tdays, SUM(cents) AS tcents FROM by_dow
      |)
      |SELECT isodow, days, cents,
      |  CAST(cents * tdays AS DOUBLE) / CAST(days * tcents AS DOUBLE)
      |    AS seasonal_index
      |FROM by_dow, tot
      |ORDER BY isodow""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q306_recall_at_k", recallAtK, Some(recallAtKSql),
      "recall@10 of an 8-dim prefix retriever vs exact full-dim top-10 " +
        "— integer-exact rankings, broadcast query fan-out"),
    Q("q307_label_prop", labelProp, Some(labelPropSql),
      "min-label propagation communities on the purchase graph, 5 sync " +
        "rounds, integer labels — community size table"),
    Q("q308_seq_trigrams", seqTrigrams, Some(seqTrigramsSql),
      "top-20 consecutive event-type trigrams with occurrence + user " +
        "support — sequential pattern mining via double LEAD"),
    Q("q309_effective_types", effectiveTypes, Some(effectiveTypesSql),
      "per-user inverse-Simpson effective event-type count n^2/sum(c^2) " +
        "— transcendental-free behavioural diversity"),
    Q("q310_dow_seasonal", dowSeasonal, Some(dowSeasonalSql),
      "ISO-dow revenue seasonal indices from exact integer cent/day " +
        "products, one division per row"))
}
