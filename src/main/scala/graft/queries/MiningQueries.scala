package graft.queries

import graft.Q
import graft.catalog.Catalog
import graft.functions.ScaledIntDot
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

  // All retrieval-eval dot products run through the fused codegen kernel
  // graft.functions.ScaledIntDot (xi = floor(x·10⁶) exact-BIGINT dots, the
  // q70 recipe) — an interpreted aggregate(zip_with(...)) computes the same
  // value but is never codegen'd by Spark, which made q327 alone 25.8 s at
  // sf0.1 in round 7. Bit-identical results, ~order-of-magnitude faster.

  /** Recall@10 of a cheap 8-prefix-dimension dot-product retriever
    * against the exact full-dimension dot-product top-10, per query —
    * the standard "is my ANN shortcut good enough" eval. Both rankings
    * are integer-exact (scaled-int dots, ties broken on neighbor id);
    * recall is the only division. Scale shape: the NQ query vectors are
    * a broadcast nested-loop against the corpus (k·N dot products, no
    * shuffle of the corpus), each side's top-k via one per-query window
    * — never a corpus×corpus join. */
  def recallAtK(spark: SparkSession, dir: String): DataFrame = {
    val emb = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val queries = emb.filter(col("vec_id") < NQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"))
    val pairs = emb.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("vec_id").as("neighbor_id"),
        ScaledIntDot.scaledDot(col("qe"), col("embedding")).as("full_dot"),
        ScaledIntDot.scaledDot(col("qe"), col("embedding"), PrefixDims)
          .as("pre_dot"))
    val wFull = Window.partitionBy(col("query_id"))
      .orderBy(col("full_dot").desc, col("neighbor_id"))
    val wPre = Window.partitionBy(col("query_id"))
      .orderBy(col("pre_dot").desc, col("neighbor_id"))
    // both rankings live on the SAME pair rows, so the gt∩cand
    // intersection is just rf<=K AND rp<=K per row — no self-join, one
    // corpus pass, both windows share one query_id exchange
    pairs
      .withColumn("rf", row_number().over(wFull))
      .withColumn("rp", row_number().over(wPre))
      .filter(col("rf") <= K && col("rp") <= K)
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
       |SELECT query_id, CAST(COUNT(*) AS BIGINT) AS hits,
       |  CAST(COUNT(*) AS DOUBLE) / $K AS recall
       |FROM ranked WHERE rf <= $K AND rp <= $K
       |GROUP BY query_id
       |ORDER BY query_id""".stripMargin

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
    // loop-invariant edge list: checkpoint once, not once per round
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
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

  // ---- HITS hubs & authorities on the bipartite purchase graph --------

  private val HitsRounds = 2

  /** HITS authority scores for suppliers on the customer→supplier
    * purchase graph (customers are hubs, suppliers authorities — the
    * natural bipartite reading). Normalization each half-round is a
    * fixed-point rescale to max=10⁶ by BIGINT floor division (L2 norms
    * would drag a sqrt into the iteration; max-rescale is the standard
    * integer-stable alternative and order-free). Two full rounds
    * unrolled; per half-round one join+sum aggregate on 8-byte keys +
    * one broadcast scalar max — the PageRank shuffle shape. */
  def hitsAuthority(spark: SparkSession, dir: String): DataFrame = {
    // loop-invariant distinct (customer, supplier) edges, projected off
    // the shared memoized TradeGraph base (u = 2c even, v = 2s+1 odd —
    // the floor divisions recover the raw keys exactly); the base is
    // already checkpointed, so the 4 half-rounds reuse its blocks
    val edges = graft.queries.TradeGraph.base(spark, dir)
      .select(expr("u div 2").as("c"), expr("v div 2").as("s"))
    var hub = edges.select(col("c")).distinct()
      .select(col("c"), lit(1000000L).as("h"))
    var auth: DataFrame = null
    for (_ <- 1 to HitsRounds) {
      val a0 = edges.join(hub, "c").groupBy(col("s")).agg(sum(col("h")).as("a"))
      val amax = a0.agg(max(col("a")).as("am"))
      auth = a0.crossJoin(broadcast(amax))
        .select(col("s"), expr("a * 1000000L div am").as("a"))
        .localCheckpoint(eager = false)
      val h0 = edges.join(auth, "s").groupBy(col("c")).agg(sum(col("a")).as("h"))
      val hmax = h0.agg(max(col("h")).as("hm"))
      hub = h0.crossJoin(broadcast(hmax))
        .select(col("c"), expr("h * 1000000L div hm").as("h"))
        .localCheckpoint(eager = false)
    }
    auth.select(col("s").as("s_suppkey"), col("a").as("authority_micro"),
        (col("a").cast("double") / 1000000L).as("authority"))
      .orderBy(col("authority_micro").desc, col("s_suppkey"))
      .limit(20)
  }

  private val hitsAuthoritySql = {
    def round(k: Int) =
      s"""a$k AS (
         |  SELECT e.s, CAST(SUM(h.h) AS BIGINT) AS a
         |  FROM edges e JOIN h${k - 1} h ON e.c = h.c GROUP BY e.s
         |), an$k AS (
         |  SELECT s, a * 1000000 // (SELECT MAX(a) FROM a$k) AS a FROM a$k
         |), hh$k AS (
         |  SELECT e.c, CAST(SUM(a.a) AS BIGINT) AS h
         |  FROM edges e JOIN an$k a ON e.s = a.s GROUP BY e.c
         |), h$k AS (
         |  SELECT c, h * 1000000 // (SELECT MAX(h) FROM hh$k) AS h FROM hh$k
         |)""".stripMargin
    s"""WITH edges AS (
       |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |), h0 AS (
       |  SELECT DISTINCT c, CAST(1000000 AS BIGINT) AS h FROM edges
       |), ${(1 to HitsRounds).map(round).mkString(", ")}
       |SELECT s AS s_suppkey, CAST(a AS BIGINT) AS authority_micro,
       |  CAST(a AS DOUBLE) / 1000000 AS authority
       |FROM an$HitsRounds
       |ORDER BY authority_micro DESC, s_suppkey
       |LIMIT 20""".stripMargin
  }

  // ---- distinctive keywords per source: per-term chi-square -----------

  /** Top-5 distinctive terms per document source by the 2×2 chi-square
    * statistic (term-in-source vs term-elsewhere) — the "what makes this
    * corpus slice different" profiling op used to audit training-data
    * mixes. χ² = n(ad−bc)²/((a+b)(c+d)(a+c)(b+d)) with every product in
    * DECIMAL(38,0) (n·(ad−bc)² overflows int64 at corpus scale), ONE
    * final division. Shuffles: tokenize→(term,source) count, then a
    * broadcast of per-source totals; per-source top-5 is a
    * WindowGroupLimit-prunable window. */
  def keywordChi2(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val toks = Catalog.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
    val ts = toks.groupBy(col("term"), col("source")).agg(count(lit(1)).as("a0"))
    val termTot = toks.groupBy(col("term")).agg(count(lit(1)).as("t_tot"))
    val srcTot = toks.groupBy(col("source")).agg(count(lit(1)).as("s_tot"))
    val nTot = toks.agg(count(lit(1)).as("n"))
    val cells = ts
      .join(termTot, "term")
      .join(broadcast(srcTot), "source")
      .crossJoin(broadcast(nTot))
      .select(col("source"), col("term"),
        col("a0").cast(dec).as("a"),
        (col("s_tot") - col("a0")).cast(dec).as("b"),
        (col("t_tot") - col("a0")).cast(dec).as("c"),
        (col("n") - col("s_tot") - col("t_tot") + col("a0")).cast(dec).as("d"),
        col("n").cast(dec).as("n"))
    val chi = cells.select(col("source"), col("term"), col("a").cast("long").as("in_source"),
      ((col("n") * (col("a") * col("d") - col("b") * col("c"))
        * (col("a") * col("d") - col("b") * col("c"))).cast("double") /
        ((col("a") + col("b")) * (col("c") + col("d"))
          * (col("a") + col("c")) * (col("b") + col("d"))).cast("double"))
        .as("chi2"))
      .filter(col("chi2").isNotNull)
    val w = Window.partitionBy(col("source"))
      .orderBy(col("chi2").desc, col("term"))
    chi.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 5)
      .select(col("source"), col("rn"), col("term"), col("in_source"), col("chi2"))
      .orderBy(col("source"), col("rn"))
  }

  private def hugeDbl(e: String) = s"CAST(CAST($e AS VARCHAR) AS DOUBLE)"

  private val keywordChi2Sql =
    s"""WITH toks AS (
       |  SELECT source, unnest(string_split(text, ' ')) AS term FROM documents
       |), toks2 AS (
       |  SELECT source, term FROM toks WHERE len(term) > 0
       |), ts AS (
       |  SELECT term, source, CAST(COUNT(*) AS HUGEINT) AS a FROM toks2 GROUP BY 1, 2
       |), tt AS (
       |  SELECT term, CAST(COUNT(*) AS HUGEINT) AS t_tot FROM toks2 GROUP BY 1
       |), st AS (
       |  SELECT source, CAST(COUNT(*) AS HUGEINT) AS s_tot FROM toks2 GROUP BY 1
       |), n AS (
       |  SELECT CAST(COUNT(*) AS HUGEINT) AS n FROM toks2
       |), cells AS (
       |  SELECT ts.source, ts.term, ts.a, st.s_tot - ts.a AS b,
       |    tt.t_tot - ts.a AS c, n.n - st.s_tot - tt.t_tot + ts.a AS d, n.n
       |  FROM ts JOIN tt USING (term) JOIN st USING (source) CROSS JOIN n
       |), chi AS (
       |  SELECT source, term, CAST(a AS BIGINT) AS in_source,
       |    ${hugeDbl("n * (a * d - b * c) * (a * d - b * c)")} /
       |      ${hugeDbl("(a + b) * (c + d) * (a + c) * (b + d)")} AS chi2
       |  FROM cells
       |), ranked AS (
       |  SELECT source, term, in_source, chi2,
       |    CAST(row_number() OVER (PARTITION BY source
       |      ORDER BY chi2 DESC, term) AS INT) AS rn
       |  FROM chi WHERE chi2 IS NOT NULL
       |)
       |SELECT source, rn, term, in_source, chi2
       |FROM ranked WHERE rn <= 5
       |ORDER BY source, rn""".stripMargin

  // ---- per-dimension embedding statistics ------------------------------

  /** Per-dimension mean/variance audit over the embedding corpus — the
    * "is a dimension dead or exploding" check before similarity serving.
    * Scaled-int per-dim values (xi = floor(x·10⁶)); moment sums in
    * DECIMAL(38,0) (n·Σx² overflows int64 at corpus scale); mean and
    * population variance each get ONE final double division. One
    * posexplode + one aggregate keyed by the 64 dims — the tiny-key
    * aggregate is map-side combinable, so the shuffle carries 64 rows
    * per partition regardless of corpus size. */
  def dimStats(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val v = Catalog.load(spark, dir, "embeddings")
      .select(posexplode(
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
        .as(Seq("dim", "xi")))
    v.groupBy(col("dim").cast("long").as("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast(dec)).as("sx"),
        sum((col("xi").cast(dec) * col("xi")).cast(dec)).as("sxx"))
      .select(col("dim"), col("n"),
        (col("sx").cast("double") / (col("n").cast(dec) * 1000000L).cast("double"))
          .as("mean"),
        (((col("n").cast(dec) * col("sxx") - col("sx") * col("sx"))).cast("double") /
          ((col("n").cast(dec) * col("n")).cast(dec) * lit(1000000000000L).cast(dec))
            .cast("double")).as("variance"))
      .orderBy(col("dim"))
  }

  private val dimStatsSql =
    s"""WITH v AS (
       |  SELECT CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS HUGEINT) AS xi
       |  FROM embeddings
       |), m AS (
       |  SELECT dim, CAST(COUNT(*) AS HUGEINT) AS n,
       |    SUM(xi) AS sx, SUM(xi * xi) AS sxx
       |  FROM v GROUP BY dim
       |)
       |SELECT dim, CAST(n AS BIGINT) AS n,
       |  ${hugeDbl("sx")} / ${hugeDbl("n * 1000000")} AS mean,
       |  ${hugeDbl("n * sxx - sx * sx")}
       |    / ${hugeDbl("n * n * CAST(1000000000000 AS HUGEINT)")} AS variance
       |FROM m
       |ORDER BY dim""".stripMargin

  // ---- functional-dependency validation (data profiling) --------------

  /** Candidate functional-dependency check across the star schema — the
    * Metanome-style profiling primitive: A→B holds iff
    * |distinct A| = |distinct (A,B)|. Each candidate is two exact
    * distinct-counts (map-side partial-aggregatable); candidates union
    * into one report. At 100 TB each check is one shuffle on the LHS
    * key — no pairwise row comparison ever happens. */
  def fdCheck(spark: SparkSession, dir: String): DataFrame = {
    def check(table: String, lhs: String, rhs: String): DataFrame =
      Catalog.load(spark, dir, table).agg(
        countDistinct(col(lhs)).as("n_lhs"),
        countDistinct(col(lhs), col(rhs)).as("n_pairs"))
        .select(lit(s"$table.$lhs->$rhs").as("fd"), col("n_lhs"), col("n_pairs"),
          (col("n_lhs") === col("n_pairs")).as("holds"))
    Seq(
      check("nation", "n_nationkey", "n_regionkey"),
      check("customer", "c_nationkey", "c_mktsegment"),
      check("orders", "o_custkey", "o_orderpriority"),
      check("part", "p_brand", "p_type"),
      check("lineitem", "l_partkey", "l_suppkey"),
      check("events", "user_id", "event_type"),
      check("documents", "source", "lang"))
      .reduce(_.unionAll(_))
      .orderBy(col("fd"))
  }

  private val fdCheckSql = {
    def check(table: String, lhs: String, rhs: String) =
      s"""SELECT '$table.$lhs->$rhs' AS fd,
         |  CAST(COUNT(DISTINCT $lhs) AS BIGINT) AS n_lhs,
         |  CAST((SELECT COUNT(*) FROM (SELECT DISTINCT $lhs, $rhs FROM $table))
         |    AS BIGINT) AS n_pairs,
         |  COUNT(DISTINCT $lhs)
         |    = (SELECT COUNT(*) FROM (SELECT DISTINCT $lhs, $rhs FROM $table))
         |    AS holds
         |FROM $table""".stripMargin
    Seq(
      check("nation", "n_nationkey", "n_regionkey"),
      check("customer", "c_nationkey", "c_mktsegment"),
      check("orders", "o_custkey", "o_orderpriority"),
      check("part", "p_brand", "p_type"),
      check("lineitem", "l_partkey", "l_suppkey"),
      check("events", "user_id", "event_type"),
      check("documents", "source", "lang"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY fd")
  }

  // ---- rolling OLS trend: 14-day windowed regression slope ------------

  /** Per-day 14-day trailing OLS slope of daily revenue (cents/day) —
    * rolling trend detection for monitoring. x = epoch-day, y = exact
    * daily cents; the four windowed moment sums are BIGINT (windowed
    * integer sums are order-free), the slope is the textbook closed form
    * with ONE double division. Only full 14-row windows are emitted.
    * Scale: one date aggregate then a single-partition window over the
    * calendar-sized daily series (thousands of rows at any corpus
    * scale — the series, not the raw data, is windowed). */
  def rollingOls(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("y"))
      .select(col("d"), expr("CAST(unix_date(d) AS BIGINT)").as("x"), col("y"))
    val w = Window.orderBy(col("d")).rowsBetween(-13, 0)
    daily
      .withColumn("n", count(lit(1)).over(w))
      .withColumn("sx", sum(col("x")).over(w))
      .withColumn("sy", sum(col("y")).over(w))
      .withColumn("sxy", sum(col("x") * col("y")).over(w))
      .withColumn("sxx", sum(col("x") * col("x")).over(w))
      .filter(col("n") === 14)
      .select(col("d"), col("y"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope_cents_per_day"))
      .orderBy(col("d"))
  }

  private val rollingOlsSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(CAST(o_orderdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS x,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM orders GROUP BY 1, 2
      |), roll AS (
      |  SELECT d, y,
      |    CAST(COUNT(*) OVER w AS BIGINT) AS n,
      |    CAST(SUM(x) OVER w AS BIGINT) AS sx,
      |    CAST(SUM(y) OVER w AS BIGINT) AS sy,
      |    CAST(SUM(x * y) OVER w AS BIGINT) AS sxy,
      |    CAST(SUM(x * x) OVER w AS BIGINT) AS sxx
      |  FROM daily
      |  WINDOW w AS (ORDER BY d ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
      |)
      |SELECT d, y,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_cents_per_day
      |FROM roll WHERE n = 14
      |ORDER BY d""".stripMargin

  // ---- revenue concentration: top-k order share -----------------------

  /** Share of total revenue held by the top-10/100/1000 orders — the
    * whale-concentration report. One global row_number caps at 1000 via
    * WindowGroupLimit (each map task keeps its local top-1000 before the
    * single merge — never a full global sort of the fact table), then
    * three conditional sums against the broadcast exact total. Cents
    * BIGINT end-to-end; one division per k. */
  def topShare(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val total = o.agg(sum(col("cents")).as("total_cents"))
    val w = Window.orderBy(col("cents").desc, col("o_orderkey"))
    // ONE ranked pass (WindowGroupLimit caps each task at 1000 rows
    // before the merge), three conditional sums, stacked to rows —
    // not three scans
    val ks = o.withColumn("rn", row_number().over(w))
      .filter(col("rn") <= 1000)
      .agg(sum(when(col("rn") <= 10, col("cents"))).as("c10"),
        sum(when(col("rn") <= 100, col("cents"))).as("c100"),
        sum(col("cents")).as("c1000"))
      .selectExpr("stack(3, 10L, c10, 100L, c100, 1000L, c1000) AS (k, k_cents)")
    ks.crossJoin(broadcast(total))
      .select(col("k"), col("k_cents"), col("total_cents"),
        (col("k_cents").cast("double") / col("total_cents").cast("double"))
          .as("share"))
      .orderBy(col("k"))
  }

  private val topShareSql =
    """WITH o AS (
      |  SELECT o_orderkey, CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), t AS (
      |  SELECT CAST(SUM(cents) AS BIGINT) AS total_cents FROM o
      |), top AS (
      |  SELECT cents, row_number() OVER (ORDER BY cents DESC, o_orderkey) AS rn
      |  FROM o
      |), ks AS (
      |  SELECT CAST(k AS BIGINT) AS k,
      |    (SELECT CAST(SUM(cents) AS BIGINT) FROM top WHERE rn <= k) AS k_cents
      |  FROM (VALUES (10), (100), (1000)) AS v(k)
      |)
      |SELECT k, k_cents, total_cents,
      |  CAST(k_cents AS DOUBLE) / CAST(total_cents AS DOUBLE) AS share
      |FROM ks, t
      |ORDER BY k""".stripMargin

  // ---- community quality: exact Newman modularity ---------------------

  /** Newman modularity of the q307 label-propagation partition on the
    * sparse purchase graph — the "are these communities real" score.
    * With directed-doubled edges: Q = (2m·ΣLᵢ − ΣDᵢ²)/(2m)², where Lᵢ
    * counts intra-community doubled edges and Dᵢ sums community degrees
    * — EVERY term an exact integer sum (the usual per-community double
    * accumulation would be order-dependent), ONE final division. Adds
    * one edge-endpoint label join + two tiny aggregates on top of the
    * label-prop rounds. */
  def modularity(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_custkey"))
    val li = Catalog.load(spark, dir, "lineitem")
      .filter(col("l_quantity") >= 50)
      .select(col("l_orderkey"), col("l_suppkey"))
    val e0 = o.join(li, col("o_orderkey") === col("l_orderkey"))
      .select((col("o_custkey") * 2).as("u"), (col("l_suppkey") * 2 + 1).as("v"))
      .distinct()
    // loop-invariant + reused by the modularity terms: checkpoint once
    val edges = e0.union(e0.select(col("v").as("u"), col("u").as("v")))
      .localCheckpoint(eager = false)
    val nodes = edges.select(col("u").as("n")).distinct()
    var lab = nodes.select(col("n"), col("n").as("lab"))
    for (_ <- 1 to LpRounds) {
      val nbrMin = edges.join(lab, edges("u") === lab("n"))
        .groupBy(col("v")).agg(min(col("lab")).as("nl"))
      lab = lab.join(nbrMin, lab("n") === nbrMin("v"), "left")
        .select(col("n"), least(col("lab"), coalesce(col("nl"), col("lab"))).as("lab"))
        .localCheckpoint(eager = false)
    }
    val lu = lab.select(col("n").as("u"), col("lab").as("lu"))
    val lv = lab.select(col("n").as("v"), col("lab").as("lv"))
    // three consumers (m2 / intra / degSq) — checkpoint or the label
    // join re-executes per consumer
    val labeled = edges.join(lu, "u").join(lv, "v")
      .localCheckpoint(eager = false)
    val m2 = labeled.agg(count(lit(1)).as("m2"))
    val intra = labeled.filter(col("lu") === col("lv"))
      .groupBy(col("lu")).agg(count(lit(1)).as("li"))
      .agg(sum(col("li")).as("sum_l"), count(lit(1)).as("n_comm"))
    val degSq = labeled.groupBy(col("u"), col("lu"))
      .agg(count(lit(1)).as("d"))
      .groupBy(col("lu")).agg(sum(col("d")).as("di"))
      .agg(sum(col("di") * col("di")).as("sum_d2"))
    intra.crossJoin(broadcast(m2)).crossJoin(broadcast(degSq))
      .select(col("n_comm"), expr("m2 div 2").as("m"),
        ((col("m2") * col("sum_l") - col("sum_d2")).cast("double") /
          (col("m2") * col("m2")).cast("double")).as("modularity"))
  }

  private val modularitySql = {
    def round(k: Int) =
      s"""l$k AS (
         |  SELECT l.n, LEAST(l.lab, COALESCE(m.nl, l.lab)) AS lab
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
       |), ${(1 to LpRounds).map(round).mkString(", ")}, labeled AS (
       |  SELECT e.u, e.v, lu.lab AS lu, lv.lab AS lv
       |  FROM edges e JOIN l$LpRounds lu ON e.u = lu.n
       |  JOIN l$LpRounds lv ON e.v = lv.n
       |), m2 AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM labeled
       |), intra AS (
       |  SELECT CAST(SUM(li) AS BIGINT) AS sum_l,
       |    CAST(COUNT(*) AS BIGINT) AS n_comm
       |  FROM (SELECT lu, COUNT(*) AS li FROM labeled WHERE lu = lv GROUP BY lu)
       |), d2 AS (
       |  SELECT CAST(SUM(di * di) AS BIGINT) AS sum_d2
       |  FROM (SELECT lu, CAST(SUM(d) AS BIGINT) AS di
       |        FROM (SELECT u, lu, COUNT(*) AS d FROM labeled GROUP BY u, lu)
       |        GROUP BY lu)
       |)
       |SELECT n_comm, m2 // 2 AS m,
       |  CAST(m2 * sum_l - sum_d2 AS DOUBLE)
       |    / CAST(m2 * m2 AS DOUBLE) AS modularity
       |FROM intra, m2, d2""".stripMargin
  }

  // ---- frequent 3-itemsets (Apriori step) ------------------------------

  /** Mega-basket ceiling (see [[BasketFrames.MaxBasketSize]]) — kept as
    * the oracle-SQL interpolation point. */
  private val MaxBasketSize = BasketFrames.MaxBasketSize

  /** Distinct (order, part) basket items with [[MaxBasketSize]] applied —
    * the shared memoized [[BasketFrames.cappedItems]] frame (built and
    * checkpointed once per session+dataset for q318/q334). */
  private def cappedBaskets(spark: SparkSession, dir: String): DataFrame =
    BasketFrames.cappedItems(spark, dir)

  /** Oracle mirror of [[cappedBaskets]]: CTE fragment defining `items`. */
  private val cappedBasketsSql =
    s"""items0 AS (
       |  SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk FROM lineitem
       |), items AS (
       |  SELECT ok, pk FROM (
       |    SELECT ok, pk, COUNT(*) OVER (PARTITION BY ok) AS bsz FROM items0)
       |  WHERE bsz <= $MaxBasketSize
       |)""".stripMargin

  /** Top-20 frequent part triples across order baskets — the Apriori
    * 3-itemset step after q179's pairs. Two self-equi-joins on the
    * basket key with a<b<c canonicalization; baskets above
    * [[MaxBasketSize]] are dropped first (mirrored in the oracle), so
    * the intra-basket fan-out is C(cap,3) at worst — C(7,3) on TPC-H
    * shapes. Integer support counts; top-20 via TakeOrdered. */
  def itemsets3(spark: SparkSession, dir: String): DataFrame = {
    val items = cappedBaskets(spark, dir)
    items.select(col("ok"), col("pk").as("a"))
      .join(items.select(col("ok"), col("pk").as("b")), "ok")
      .filter(col("a") < col("b"))
      .join(items.select(col("ok"), col("pk").as("c")), "ok")
      .filter(col("b") < col("c"))
      .groupBy(col("a"), col("b"), col("c"))
      .agg(count(lit(1)).as("support"))
      .filter(col("support") >= 2)
      .orderBy(col("support").desc, col("a"), col("b"), col("c"))
      .limit(20)
  }

  private val itemsets3Sql =
    s"""WITH $cappedBasketsSql
      |SELECT x.pk AS a, y.pk AS b, z.pk AS c,
      |  CAST(COUNT(*) AS BIGINT) AS support
      |FROM items x
      |JOIN items y ON x.ok = y.ok AND x.pk < y.pk
      |JOIN items z ON y.ok = z.ok AND y.pk < z.pk
      |GROUP BY 1, 2, 3
      |HAVING COUNT(*) >= 2
      |ORDER BY support DESC, a, b, c
      |LIMIT 20""".stripMargin

  // ---- spend-quintile migration matrix --------------------------------

  /** Customer spend-quintile MIGRATION between the first and second
    * half of the order history — the segment-flow view behind every
    * CRM "who is upgrading/churning" dashboard (q159 gives the
    * point-in-time RFM cut; this gives the transition dynamics).
    * The half boundary is the midpoint of the observed date range
    * (broadcast 1-row), spend is exact cents per (customer, half), and
    * quintiles use a fully deterministic NTILE (ordered by spend then
    * customer id — no tie ambiguity for the oracle to disagree on),
    * computed by [[graft.ops.GlobalRank.withNtile]] so the 1e9-customer
    * frame never funnels through a single-partition window.
    * Output: the 5×5 matrix over customers active in BOTH halves plus
    * each cell's share of its origin quintile (one mirrored division). */
  def quintileMigration(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .filter(col("o_orderdate").isNotNull)
      .select(col("o_custkey").as("c"),
        expr("unix_micros(date_trunc('day', o_orderdate)) div 86400000000")
          .as("d"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .localCheckpoint(false) // bounds aggregate + both half rollups
    val mid = o.agg(expr("(min(d) + max(d)) div 2").as("mid"))
    val spend = o.crossJoin(broadcast(mid))
      .groupBy(col("c"), (col("d") <= col("mid")).as("early"))
      .agg(sum(col("cents")).as("spend_c"))
    def quintiles(early: Boolean, out: String) =
      graft.ops.GlobalRank.withNtile(spend.filter(col("early") === early),
          5, Seq(col("spend_c"), col("c")), out)
        .select(col("c"), col(out).cast("long").as(out))
    quintiles(early = true, "q_from")
      .join(quintiles(early = false, "q_to"), "c")
      .groupBy(col("q_from"), col("q_to"))
      .agg(count(lit(1)).as("n_customers"))
      .withColumn("from_total",
        sum(col("n_customers")).over(Window.partitionBy(col("q_from"))))
      .select(col("q_from"), col("q_to"), col("n_customers"),
        (col("n_customers").cast("double") / col("from_total"))
          .as("share_of_origin"))
      .orderBy(col("q_from"), col("q_to"))
  }

  private val quintileMigrationSql =
    """WITH o AS (
      |  SELECT o_custkey AS c,
      |    epoch_ns(date_trunc('day', o_orderdate)) // 1000
      |      // 86400000000 AS d,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders WHERE o_orderdate IS NOT NULL
      |), mid AS (
      |  SELECT (MIN(d) + MAX(d)) // 2 AS mid FROM o
      |), spend AS (
      |  SELECT c, d <= mid AS early,
      |    CAST(SUM(cents) AS BIGINT) AS spend_c
      |  FROM o CROSS JOIN mid GROUP BY 1, 2
      |), qf AS (
      |  SELECT c, CAST(NTILE(5) OVER (ORDER BY spend_c, c) AS BIGINT)
      |    AS q_from
      |  FROM spend WHERE early
      |), qt AS (
      |  SELECT c, CAST(NTILE(5) OVER (ORDER BY spend_c, c) AS BIGINT)
      |    AS q_to
      |  FROM spend WHERE NOT early
      |), m AS (
      |  SELECT q_from, q_to, CAST(COUNT(*) AS BIGINT) AS n_customers
      |  FROM qf JOIN qt USING (c)
      |  GROUP BY 1, 2
      |)
      |SELECT q_from, q_to, n_customers,
      |  CAST(n_customers AS DOUBLE)
      |    / SUM(n_customers) OVER (PARTITION BY q_from) AS share_of_origin
      |FROM m
      |ORDER BY q_from, q_to""".stripMargin

  // ---- grid-density core cells (DBSCAN's density step, relationally) --

  /** The density-estimation core of grid-DBSCAN over the (quantity,
    * price) plane: bucket every lineitem into a 2-D grid cell, then
    * compute each cell's 3×3-NEIGHBORHOOD mass as a relational
    * convolution — the cell table joined to a 9-row literal offset
    * table, re-joined to itself on the shifted key, one aggregate. A
    * cell is CORE when its neighborhood holds ≥ 2× the uniform share
    * (mass·n_cells ≥ 18·total — exact integer cross-multiplication, no
    * division). This is how density clustering survives 100 TB: the
    * O(n²) ε-neighborhood graph collapses to one grid aggregate +
    * one 9-way cell-level join, both aggregate-sized. */
  def gridDensityCores(spark: SparkSession, dir: String): DataFrame = {
    import spark.implicits._
    val cells = Catalog.load(spark, dir, "lineitem")
      .groupBy(expr("CAST(floor(l_quantity) AS INT) div 5").as("qb"),
        expr("CAST(floor(l_extendedprice) AS INT) div 10000").as("pb"))
      .agg(count(lit(1)).as("cnt"))
      .localCheckpoint(false) // convolution self-join + totals below
    val offsets = (for { dq <- -1 to 1; dp <- -1 to 1 } yield (dq, dp))
      .toDF("dq", "dp")
    val total = cells.agg(sum(col("cnt")).as("total"),
      count(lit(1)).as("n_cells"))
    val mass = cells.crossJoin(broadcast(offsets))
      .select((col("qb") + col("dq")).as("nqb"),
        (col("pb") + col("dp")).as("npb"), col("qb"), col("pb"))
      .join(cells.select(col("qb").as("nqb"), col("pb").as("npb"),
        col("cnt").as("ncnt")), Seq("nqb", "npb"))
      .groupBy(col("qb"), col("pb"))
      .agg(sum(col("ncnt")).as("mass"))
    cells.join(mass, Seq("qb", "pb"))
      .crossJoin(broadcast(total))
      .select(col("qb"), col("pb"), col("cnt"), col("mass"),
        (col("mass") * col("n_cells") >= col("total") * 18).as("is_core"))
      .orderBy(col("qb"), col("pb"))
  }

  private val gridDensityCoresSql =
    """WITH cells AS (
      |  SELECT CAST(floor(l_quantity) AS INT) // 5 AS qb,
      |    CAST(floor(l_extendedprice) AS INT) // 10000 AS pb,
      |    CAST(COUNT(*) AS BIGINT) AS cnt
      |  FROM lineitem GROUP BY 1, 2
      |), offsets(dq, dp) AS (
      |  VALUES (-1,-1),(-1,0),(-1,1),(0,-1),(0,0),(0,1),(1,-1),(1,0),(1,1)
      |), total AS (
      |  SELECT CAST(SUM(cnt) AS BIGINT) AS total,
      |    CAST(COUNT(*) AS BIGINT) AS n_cells
      |  FROM cells
      |), mass AS (
      |  SELECT c.qb, c.pb, CAST(SUM(n.cnt) AS BIGINT) AS mass
      |  FROM cells c
      |  CROSS JOIN offsets o
      |  JOIN cells n ON n.qb = c.qb + o.dq AND n.pb = c.pb + o.dp
      |  GROUP BY 1, 2
      |)
      |SELECT c.qb, c.pb, c.cnt, m.mass,
      |  m.mass * t.n_cells >= t.total * 18 AS is_core
      |FROM cells c JOIN mass m ON c.qb = m.qb AND c.pb = m.pb
      |CROSS JOIN total t
      |ORDER BY c.qb, c.pb""".stripMargin

  // ---- Gini-gain attribute ranking (decision-tree split selection) ----

  /** Which lineitem attribute best predicts the return flag — the
    * CART/C4.5 split-selection step (and the label-model feature audit
    * before training a quality classifier), ranked by GINI GAIN:
    * parent impurity 1 − Σ(C/n)² minus the attribute-weighted child
    * impurity Σ_g (n_g/n)·(1 − Σ(c/n_g)²). The entire chain stays in
    * exact integers until one mirrored division per output: impurities
    * are computed as (n² − Σc²)·10⁶ div n micro-units (64-bit floor
    * division — n² ≤ 3.6·10¹¹ and the ×10⁶ product ≤ 3.6·10¹⁷ both fit
    * BIGINT exactly), child terms SUM as exact BIGINTs (no
    * combine-order float hazard), and the ln-free formulation sidesteps
    * the entropy/log portability trap entirely. One (attr, label)
    * aggregate per candidate, each aggregate-sized. */
  def giniGain(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .select(col("l_returnflag").as("y"),
        col("l_linestatus").as("a_linestatus"),
        month(col("l_shipdate")).cast("string").as("a_shipmonth"),
        expr("CAST(CAST(l_quantity AS INT) div 10 AS STRING)")
          .as("a_qtyband"),
        expr("CAST(CAST(round(l_discount * 100) AS INT) AS STRING)")
          .as("a_discpct"))
      .localCheckpoint(false) // one scan feeds all four candidates
    def forAttr(attr: String): DataFrame = {
      val cell = li.groupBy(col(attr).as("g"), col("y"))
        .agg(count(lit(1)).as("c"))
      val byG = cell.groupBy(col("g"))
        .agg(sum(col("c")).as("ng"), sum(col("c") * col("c")).as("sc2"))
      byG.agg(
          sum(col("ng")).as("n"),
          sum(expr("(ng * ng - sc2) * 1000000L div ng")).as("child_micro"))
        .crossJoin(broadcast(
          cell.groupBy(col("y")).agg(sum(col("c")).as("cy"))
            .agg(sum(col("cy") * col("cy")).as("sy2"))))
        .selectExpr(s"'$attr' AS attribute",
          "CAST((n * n - sy2) * 1000000L div n AS DOUBLE) / 1000000.0 / n" +
            " AS parent_gini",
          "CAST(child_micro AS DOUBLE) / 1000000.0 / n AS weighted_gini")
        .selectExpr("attribute", "parent_gini", "weighted_gini",
          "parent_gini - weighted_gini AS gini_gain")
    }
    Seq("a_linestatus", "a_shipmonth", "a_qtyband", "a_discpct")
      .map(forAttr)
      .reduce(_ unionByName _)
      .orderBy(col("gini_gain").desc, col("attribute"))
  }

  private val giniGainSql = {
    def one(attr: String, expr: String) =
      s"""SELECT '$attr' AS attribute, parent_gini, weighted_gini,
         |  parent_gini - weighted_gini AS gini_gain
         |FROM (
         |  SELECT
         |    CAST((t.n * t.n - p.sy2) * 1000000 // t.n AS DOUBLE)
         |      / 1000000.0 / t.n AS parent_gini,
         |    CAST(t.child_micro AS DOUBLE) / 1000000.0 / t.n
         |      AS weighted_gini
         |  FROM (
         |    SELECT CAST(SUM(ng) AS BIGINT) AS n,
         |      CAST(SUM((ng * ng - sc2) * 1000000 // ng) AS BIGINT)
         |        AS child_micro
         |    FROM (
         |      SELECT g, CAST(SUM(c) AS BIGINT) AS ng,
         |        CAST(SUM(c * c) AS BIGINT) AS sc2
         |      FROM (
         |        SELECT $expr AS g, l_returnflag AS y,
         |          CAST(COUNT(*) AS BIGINT) AS c
         |        FROM lineitem GROUP BY 1, 2)
         |      GROUP BY g)) t
         |  CROSS JOIN (
         |    SELECT CAST(SUM(cy * cy) AS BIGINT) AS sy2 FROM (
         |      SELECT CAST(COUNT(*) AS BIGINT) AS cy
         |      FROM lineitem GROUP BY l_returnflag)) p
         |)""".stripMargin
    s"""${one("a_linestatus", "l_linestatus")}
       |UNION ALL
       |${one("a_shipmonth", "CAST(month(l_shipdate) AS VARCHAR)")}
       |UNION ALL
       |${one("a_qtyband", "CAST(CAST(l_quantity AS INT) // 10 AS VARCHAR)")}
       |UNION ALL
       |${one("a_discpct",
             "CAST(CAST(round(l_discount * 100) AS INT) AS VARCHAR)")}
       |ORDER BY gini_gain DESC, attribute""".stripMargin
  }

  // ---- A/B experiment sizing: required sample per segment -------------

  /** Per-priority-segment sample size needed to detect a 2% lift in
    * order value at ~80% power / 5% α (the 16·σ²/δ² rule of thumb) —
    * the experiment-planning op run before any A/B test. Moments are
    * exact DECIMAL(38,0); mean, variance, and n = ⌈16σ²/(0.02µ)²⌉ are
    * a FIXED chain of correctly-rounded IEEE ops mirrored on both
    * engines. One partial->final aggregate per segment. */
  def powerAnalysis(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("y"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n"),
        sum(col("y").cast(dec)).as("sy"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("syy"))
      .select(col("segment"), col("n"),
        (col("sy").cast("double") / col("n").cast("double") / 100.0).as("mean"),
        ((col("n").cast(dec) * col("syy") - col("sy") * col("sy")).cast("double") /
          (col("n").cast(dec) * col("n")).cast("double") / 10000.0).as("variance"))
      .withColumn("n_required",
        ceil(lit(16.0) * col("variance") /
          ((col("mean") * 0.02) * (col("mean") * 0.02))).cast("long"))
      .orderBy(col("segment"))
  }

  private val powerAnalysisSql =
    s"""WITH m AS (
       |  SELECT o_orderpriority AS segment, CAST(COUNT(*) AS HUGEINT) AS n,
       |    SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)) AS sy,
       |    SUM(CAST(CAST(round(o_totalprice * 100) AS BIGINT) AS HUGEINT)
       |        * CAST(round(o_totalprice * 100) AS BIGINT)) AS syy
       |  FROM orders GROUP BY 1
       |), s AS (
       |  SELECT segment, CAST(n AS BIGINT) AS n,
       |    ${hugeDbl("sy")} / ${hugeDbl("n")} / 100.0 AS mean,
       |    ${hugeDbl("n * syy - sy * sy")} / ${hugeDbl("n * n")} / 10000.0
       |      AS variance
       |  FROM m
       |)
       |SELECT segment, n, mean, variance,
       |  CAST(ceil(16.0 * variance / ((mean * 0.02) * (mean * 0.02)))
       |    AS BIGINT) AS n_required
       |FROM s
       |ORDER BY segment""".stripMargin

  // ---- cross-language duplicate audit ---------------------------------

  /** Documents sharing an identical 10-token opening — the shared
    * boilerplate-header detector (common crawl headers, license
    * preambles), cross-checked against language tags: a prefix group
    * spanning ≥2 langs is either boilerplate or a labeling bug. Groups
    * on the short prefix string (tiny group key, map-side combinable);
    * language list is a sorted set for a deterministic column. */
  def prefixDup(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "documents")
      .groupBy(array_join(slice(split(col("text"), " "), 1, 10), " ").as("prefix"))
      .agg(count(lit(1)).as("n_docs"),
        countDistinct(col("lang")).as("n_langs"),
        array_join(sort_array(collect_set(col("lang"))), ",").as("langs"),
        min(col("doc_id")).as("first_doc"))
      .filter(col("n_docs") >= 2)
      .select(col("first_doc"), col("prefix"), col("n_docs"),
        col("n_langs"), col("langs"))
      .orderBy(col("first_doc"))

  private val prefixDupSql =
    """SELECT MIN(doc_id) AS first_doc,
      |  array_to_string(string_split(text, ' ')[1:10], ' ') AS prefix,
      |  CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs,
      |  string_agg(DISTINCT lang, ',' ORDER BY lang) AS langs
      |FROM documents
      |GROUP BY 2
      |HAVING COUNT(*) >= 2
      |ORDER BY first_doc""".stripMargin

  // ---- revenue-weighted PageRank --------------------------------------

  /** PageRank over the purchase graph with REVENUE-weighted transitions:
    * each node splits its rank across neighbors proportionally to the
    * exact cents traded on the edge (q105's uniform split is the
    * unweighted special case). Fixed-point micro-rank integers: each
    * contribution is rank·w_edge // W_out (both BIGINT — products stay
    * under 2⁶³ because rank ≤ ~10⁶ micro-units and edge cents < 10¹²),
    * so the recurrence has exactly one answer on any engine. Same
    * join+aggregate-per-round shuffle shape as q105. */
  def weightedPagerank(spark: SparkSession, dir: String): DataFrame = {
    // loop-invariant cents-weighted edge list (out-weight pre-joined) and
    // node frame from the shared memoized TradeGraph build — checkpointed
    // once per session+dataset and reused across the whole graph family
    val edges = graft.queries.TradeGraph.centsWeighted(spark, dir)
    val nodes = graft.queries.TradeGraph.nodes(spark, dir)
    var pr = nodes.select(col("n"), lit(1000000L).as("r"))
    for (_ <- 1 to 5) {
      val contrib = edges.join(pr, edges("u") === pr("n"))
        .select(col("v"), expr("r * w div wu").as("c"))
        .groupBy(col("v")).agg(sum(col("c")).as("s"))
      pr = nodes.join(contrib, nodes("n") === contrib("v"), "left")
        .select(col("n"),
          (lit(150000L) + expr("85 * coalesce(s, 0L) div 100")).as("r"))
        .localCheckpoint(eager = false)
    }
    pr.select(
        when(col("n") % 2 === 0, concat(lit("c"), (col("n") / 2).cast("long")))
          .otherwise(concat(lit("s"), (col("n") / 2).cast("long"))).as("node"),
        (col("r").cast("double") / 1000000L).as("rank"))
      .orderBy(col("node"))
  }

  private val weightedPagerankSql = {
    def round(k: Int) =
      s"""pr$k AS (
         |  SELECT n.n,
         |    CAST(150000 AS BIGINT) + CAST(85 * COALESCE(c.s, 0) AS BIGINT) // 100 AS r
         |  FROM nodes n LEFT JOIN (
         |    SELECT e.v, SUM(p.r * e.w // o.wu) AS s
         |    FROM edges e JOIN pr${k - 1} p ON e.u = p.n JOIN outw o ON e.u = o.u
         |    GROUP BY e.v) c ON c.v = n.n
         |)""".stripMargin
    s"""WITH e0 AS (
       |  SELECT o_custkey * 2 AS u, l_suppkey * 2 + 1 AS v,
       |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS w
       |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
       |  GROUP BY 1, 2
       |), edges AS (
       |  SELECT u, v, w FROM e0 UNION ALL SELECT v, u, w FROM e0
       |), outw AS (
       |  SELECT u, CAST(SUM(w) AS BIGINT) AS wu FROM edges GROUP BY 1
       |), nodes AS (
       |  SELECT DISTINCT u AS n FROM edges
       |), pr0 AS (
       |  SELECT n, CAST(1000000 AS BIGINT) AS r FROM nodes
       |), ${(1 to 5).map(round).mkString(", ")}
       |SELECT CASE WHEN n % 2 = 0 THEN 'c' || CAST(n // 2 AS VARCHAR)
       |            ELSE 's' || CAST(n // 2 AS VARCHAR) END AS node,
       |  CAST(r AS DOUBLE) / 1000000 AS rank
       |FROM pr5
       |ORDER BY node""".stripMargin
  }

  // ---- one-mode bipartite projection ----------------------------------

  /** Hub ceiling for the one-mode projection: a customer buying from
    * more than this many suppliers contributes O(deg²) pairs — the same
    * quadratic blow-up the dedup candidate joins cap with a shingle
    * df-cap (`DedupOps.capHotKeys`). Mirrored in the oracle, so the
    * bound is part of the operator's contract, not a silent prune. */
  private val BipartiteMaxDeg = 128

  /** Supplier↔supplier co-purchase projection: top-20 supplier pairs by
    * the number of DISTINCT customers buying from both — collapsing the
    * bipartite purchase graph to its one-mode shadow, the standard move
    * before any supplier-similarity analysis. Self-equi-join on the
    * customer key of the distinct (cust, supp) edge list; hub customers
    * above [[BipartiteMaxDeg]] suppliers are dropped BEFORE the
    * self-join (df-cap, mirrored in the oracle) so the per-key fan-out
    * is bounded by C(cap,2) at any corpus scale. Top-20 via
    * TakeOrdered, counts exact. */
  def bipartiteProjection(spark: SparkSession, dir: String): DataFrame = {
    // distinct (customer, supplier) pairs off the shared memoized
    // TradeGraph base (u = 2c even, v = 2s+1 odd — floor divisions
    // recover the raw keys exactly), as in q311
    val cs0 = graft.queries.TradeGraph.base(spark, dir)
      .select(expr("u div 2").as("c"), expr("v div 2").as("s"))
    val cs = cs0
      .withColumn("deg", count(lit(1)).over(Window.partitionBy(col("c"))))
      .filter(col("deg") <= BipartiteMaxDeg)
      .select(col("c"), col("s"))
    cs.select(col("c"), col("s").as("s1"))
      .join(cs.select(col("c"), col("s").as("s2")), "c")
      .filter(col("s1") < col("s2"))
      .groupBy(col("s1"), col("s2"))
      .agg(count(lit(1)).as("shared_customers"))
      .orderBy(col("shared_customers").desc, col("s1"), col("s2"))
      .limit(20)
  }

  private val bipartiteProjectionSql =
    s"""WITH cs0 AS (
      |  SELECT DISTINCT o_custkey AS c, l_suppkey AS s
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |), cs AS (
      |  SELECT c, s FROM (
      |    SELECT c, s, COUNT(*) OVER (PARTITION BY c) AS deg FROM cs0)
      |  WHERE deg <= $BipartiteMaxDeg
      |)
      |SELECT a.s AS s1, b.s AS s2, CAST(COUNT(*) AS BIGINT) AS shared_customers
      |FROM cs a JOIN cs b ON a.c = b.c AND a.s < b.s
      |GROUP BY 1, 2
      |ORDER BY shared_customers DESC, s1, s2
      |LIMIT 20""".stripMargin

  // ---- two-proportion z-test (conversion A/B) --------------------------

  /** Two-proportion z-test on ACTIVATION (first purchase within 24 h of
    * the user's first event) between the deterministic user_id%2 split —
    * the textbook A/B significance check on a non-degenerate funnel
    * metric (lifetime "ever purchased" saturates to 1.0 on any long
    * window). Per-user min-ts vs min-purchase-ts come from ONE
    * aggregate (no join); p̂₁, p̂₂, pooled p̂ and z are a FIXED chain of
    * correctly-rounded IEEE ops mirrored on both engines. */
  def twoPropZ(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val byVariant = Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"),
        col("event_type"))
      .groupBy(col("user_id"))
      .agg(min(col("ts_us")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tp"))
      .select((col("user_id") % 2).as("variant"),
        when(col("tp").isNotNull && col("tp") <= col("t0") + DayUs, 1L)
          .otherwise(0L).as("converted"))
      .groupBy(col("variant"))
      .agg(count(lit(1)).as("n"), sum(col("converted")).as("conv"))
    val a = byVariant.filter(col("variant") === 0)
      .select(col("n").as("n1"), col("conv").as("c1"))
    val b = byVariant.filter(col("variant") === 1)
      .select(col("n").as("n2"), col("conv").as("c2"))
    a.crossJoin(b)
      .select(col("n1"), col("c1"), col("n2"), col("c2"),
        (col("c1").cast("double") / col("n1").cast("double")).as("p1"),
        (col("c2").cast("double") / col("n2").cast("double")).as("p2"))
      .withColumn("p_pool",
        (col("c1") + col("c2")).cast("double") / (col("n1") + col("n2")).cast("double"))
      .withColumn("z",
        (col("p1") - col("p2")) /
          sqrt(col("p_pool") * (lit(1.0) - col("p_pool")) *
            (lit(1.0) / col("n1").cast("double") + lit(1.0) / col("n2").cast("double"))))
      .select(col("n1"), col("c1"), col("p1"), col("n2"), col("c2"),
        col("p2"), col("z"))
  }

  private val twoPropZSql =
    """WITH u AS (
      |  SELECT user_id, MIN(epoch_us(ts)) AS t0,
      |    MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END) AS tp
      |  FROM events GROUP BY 1
      |), v AS (
      |  SELECT user_id % 2 AS variant, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(CASE WHEN tp IS NOT NULL AND tp <= t0 + 86400000000
      |      THEN 1 ELSE 0 END) AS BIGINT) AS conv
      |  FROM u GROUP BY 1
      |), a AS (SELECT n AS n1, conv AS c1 FROM v WHERE variant = 0),
      |b AS (SELECT n AS n2, conv AS c2 FROM v WHERE variant = 1),
      |j AS (
      |  SELECT n1, c1, n2, c2,
      |    CAST(c1 AS DOUBLE) / CAST(n1 AS DOUBLE) AS p1,
      |    CAST(c2 AS DOUBLE) / CAST(n2 AS DOUBLE) AS p2,
      |    CAST(c1 + c2 AS DOUBLE) / CAST(n1 + n2 AS DOUBLE) AS p_pool
      |  FROM a, b
      |)
      |SELECT n1, c1, p1, n2, c2, p2,
      |  (p1 - p2) / sqrt(p_pool * (1.0 - p_pool)
      |    * (1.0 / CAST(n1 AS DOUBLE) + 1.0 / CAST(n2 AS DOUBLE))) AS z
      |FROM j""".stripMargin

  // ---- session bounce rate by day -------------------------------------

  /** Daily bounce rate: share of 30-min-gap sessions containing exactly
    * one event, keyed by the session's START day — the engagement-
    * quality report on top of q103's sessionizer. One user-partitioned
    * window builds session ids, one (user, session) aggregate sizes
    * them, one daily rollup; rate is the only division. */
  def bounceRate(spark: SparkSession, dir: String): DataFrame = {
    val gap = graft.streaming.Streams.GapUs
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val sessions = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("session_seq",
        sum(when(col("prev").isNull || col("ts_us") - col("prev") >= gap, 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("n_events"), min(col("ts_us")).as("start_us"))
    sessions
      .groupBy(to_date(timestamp_micros(col("start_us"))).as("d"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_events") === 1, 1L).otherwise(0L)).as("n_bounce"))
      .select(col("d"), col("n_sessions"), col("n_bounce"),
        (col("n_bounce").cast("double") / col("n_sessions").cast("double"))
          .as("bounce_rate"))
      .orderBy(col("d"))
  }

  private val bounceRateSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, epoch_us(ts) AS ts_us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events
       |), marked AS (
       |  SELECT user_id, event_id, ts_us,
       |    SUM(CASE WHEN prev IS NULL OR ts_us - prev >= ${graft.streaming.Streams.GapUs}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |            ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM e
       |), s AS (
       |  SELECT user_id, session_seq, COUNT(*) AS n_events,
       |    MIN(ts_us) AS start_us
       |  FROM marked GROUP BY 1, 2
       |)
       |SELECT CAST(make_timestamp(start_us) AS DATE) AS d,
       |  CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_bounce,
       |  CAST(SUM(CASE WHEN n_events = 1 THEN 1 ELSE 0 END) AS DOUBLE)
       |    / CAST(COUNT(*) AS DOUBLE) AS bounce_rate
       |FROM s
       |GROUP BY 1
       |ORDER BY d""".stripMargin

  // ---- exact rank-based length percentiles per language ----------------

  /** Exact p50/p90/p99 token counts per language from RANK selection
    * (value at ⌈p·n⌉ in the (count, doc_id) total order) — integer-only,
    * no interpolation, so every engine answers identically; the
    * interpolating quantile_cont/percentile variants disagree in their
    * float paths. One tokenize pass, one per-lang window, conditional
    * min-selects. */
  def lengthPercentiles(spark: SparkSession, dir: String): DataFrame = {
    val counts = Catalog.load(spark, dir, "documents")
      .select(col("lang"), col("doc_id"),
        size(split(col("text"), " ")).cast("long").as("c"))
    val w = Window.partitionBy(col("lang")).orderBy(col("c"), col("doc_id"))
    counts
      .withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("lang"))))
      .groupBy(col("lang"))
      .agg(max(col("n")).as("n"),
        min(when(col("rn") === expr("(n * 50 + 99) div 100"), col("c"))).as("p50"),
        min(when(col("rn") === expr("(n * 90 + 99) div 100"), col("c"))).as("p90"),
        min(when(col("rn") === expr("(n * 99 + 99) div 100"), col("c"))).as("p99"))
      .orderBy(col("lang"))
  }

  private val lengthPercentilesSql =
    """WITH counts AS (
      |  SELECT lang, doc_id,
      |    CAST(len(string_split(text, ' ')) AS BIGINT) AS c
      |  FROM documents
      |), ranked AS (
      |  SELECT lang, c,
      |    CAST(row_number() OVER (PARTITION BY lang ORDER BY c, doc_id)
      |      AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY lang) AS BIGINT) AS n
      |  FROM counts
      |)
      |SELECT lang, CAST(MAX(n) AS BIGINT) AS n,
      |  MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN c END) AS p50,
      |  MIN(CASE WHEN rn = (n * 90 + 99) // 100 THEN c END) AS p90,
      |  MIN(CASE WHEN rn = (n * 99 + 99) // 100 THEN c END) AS p99
      |FROM ranked
      |GROUP BY lang
      |ORDER BY lang""".stripMargin

  // ---- vocabulary tail health: hapax share per source ------------------

  /** Per-source vocabulary tail profile: distinct terms, hapax terms
    * (frequency 1 inside the source), and the token mass held by
    * frequency ≤ 2 terms — the bottom-of-Zipf health check that pairs
    * with q272's top-side Pareto coverage (a swelling hapax share is
    * the classic OCR-noise / boilerplate-explosion symptom). Two
    * stacked aggregates, integer counts, two final divisions. */
  def hapaxShare(spark: SparkSession, dir: String): DataFrame = {
    val tf = Catalog.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term"))
      .agg(count(lit(1)).as("c"))
    tf.groupBy(col("source"))
      .agg(sum(col("c")).as("n_tokens"),
        count(lit(1)).as("n_terms"),
        sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_hapax"),
        sum(when(col("c") <= 2, col("c")).otherwise(0L)).as("tail_tokens"))
      .select(col("source"), col("n_tokens"), col("n_terms"), col("n_hapax"),
        (col("n_hapax").cast("double") / col("n_terms").cast("double"))
          .as("hapax_share"),
        (col("tail_tokens").cast("double") / col("n_tokens").cast("double"))
          .as("tail_mass"))
      .orderBy(col("source"))
  }

  private val hapaxShareSql =
    """WITH tf AS (
      |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  WHERE len(term) > 0
      |  GROUP BY 1, 2
      |)
      |SELECT source, CAST(SUM(c) AS BIGINT) AS n_tokens,
      |  CAST(COUNT(*) AS BIGINT) AS n_terms,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
      |  CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
      |    / CAST(COUNT(*) AS DOUBLE) AS hapax_share,
      |  CAST(SUM(CASE WHEN c <= 2 THEN c ELSE 0 END) AS DOUBLE)
      |    / CAST(SUM(c) AS DOUBLE) AS tail_mass
      |FROM tf
      |GROUP BY source
      |ORDER BY source""".stripMargin

  // ---- k-NN classifier eval over labeled embeddings --------------------

  private val KnnNQ = 100
  private val KnnK = 10

  /** Shared ranked-neighbor frame for the k-NN evals: exact cosine
    * top-k (q70's scaled-int recipe) for the first `KnnNQ` vectors,
    * with the query's own true label and each neighbor's label. */
  private def knnRanked(spark: SparkSession, dir: String): DataFrame = {
    val emb = Catalog.load(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding"), col("label"))
    val withNorm = emb.withColumn("n2",
      ScaledIntDot.scaledDot(col("embedding"), col("embedding")))
    val queries = withNorm.filter(col("vec_id") < KnnNQ)
      .select(col("vec_id").as("query_id"), col("embedding").as("qe"),
        col("n2").as("qn2"), col("label").as("true_label"))
    val pairs = withNorm.join(broadcast(queries), col("vec_id") =!= col("query_id"))
      .select(col("query_id"), col("true_label"),
        col("vec_id").as("neighbor_id"), col("label").as("nn_label"),
        (ScaledIntDot.scaledDot(col("qe"), col("embedding")).cast("double") /
          (sqrt(col("qn2").cast("double")) * sqrt(col("n2").cast("double"))))
          .as("cos_sim"))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos_sim").desc, col("neighbor_id"))
    pairs.withColumn("rn", row_number().over(w)).filter(col("rn") <= KnnK)
  }

  /** Majority-vote k-NN classification accuracy per true label — the
    * "are these embeddings actually separable" eval every labeled
    * corpus gets before the classifier is trusted. Exact cosine top-10
    * (broadcast queries, corpus streams once), per-query majority by
    * (votes DESC, label ASC), accuracy from integer counts. */
  def knnEval(spark: SparkSession, dir: String): DataFrame = {
    val votes = knnRanked(spark, dir)
      .groupBy(col("query_id"), col("true_label"), col("nn_label"))
      .agg(count(lit(1)).as("votes"))
    val wv = Window.partitionBy(col("query_id"))
      .orderBy(col("votes").desc, col("nn_label"))
    val pred = votes.withColumn("vr", row_number().over(wv))
      .filter(col("vr") === 1)
      .select(col("query_id"), col("true_label"),
        col("nn_label").as("predicted"))
    pred.groupBy(col("true_label"))
      .agg(count(lit(1)).as("n_queries"),
        sum(when(col("predicted") === col("true_label"), 1L).otherwise(0L))
          .as("n_correct"))
      .select(col("true_label"), col("n_queries"), col("n_correct"),
        (col("n_correct").cast("double") / col("n_queries").cast("double"))
          .as("accuracy"))
      .orderBy(col("true_label"))
  }

  private def knnRankedSql =
    s"""v AS (
       |  SELECT vec_id, label,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS BIGINT) AS xi,
       |    unnest(range(len(embedding))) AS i
       |  FROM embeddings
       |), n2 AS (
       |  SELECT vec_id, CAST(SUM(xi * xi) AS BIGINT) AS n2 FROM v GROUP BY 1
       |), dots AS (
       |  SELECT q.vec_id AS query_id, MIN(q.label) AS true_label,
       |    d.vec_id AS neighbor_id, MIN(d.label) AS nn_label,
       |    CAST(SUM(q.xi * d.xi) AS BIGINT) AS dot
       |  FROM v q JOIN v d ON q.i = d.i
       |  WHERE q.vec_id < $KnnNQ AND d.vec_id <> q.vec_id
       |  GROUP BY q.vec_id, d.vec_id
       |), ranked AS (
       |  SELECT query_id, true_label, neighbor_id, nn_label,
       |    row_number() OVER (PARTITION BY query_id ORDER BY
       |      CAST(dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE))
       |        * sqrt(CAST(dn.n2 AS DOUBLE))) DESC, neighbor_id) AS rn
       |  FROM dots
       |  JOIN n2 qn ON query_id = qn.vec_id
       |  JOIN n2 dn ON neighbor_id = dn.vec_id
       |)""".stripMargin

  private val knnEvalSql =
    s"""WITH $knnRankedSql, votes AS (
       |  SELECT query_id, true_label, nn_label,
       |    CAST(COUNT(*) AS BIGINT) AS votes
       |  FROM ranked WHERE rn <= $KnnK
       |  GROUP BY 1, 2, 3
       |), pred AS (
       |  SELECT query_id, true_label, nn_label AS predicted
       |  FROM (SELECT *, row_number() OVER (PARTITION BY query_id
       |          ORDER BY votes DESC, nn_label) AS vr FROM votes)
       |  WHERE vr = 1
       |)
       |SELECT true_label, CAST(COUNT(*) AS BIGINT) AS n_queries,
       |  CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_correct,
       |  CAST(SUM(CASE WHEN predicted = true_label THEN 1 ELSE 0 END)
       |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS accuracy
       |FROM pred
       |GROUP BY true_label
       |ORDER BY true_label""".stripMargin

  /** 1-NN label confusion matrix — which labels the embedding space
    * confuses with which: (true label, nearest neighbor's label) cell
    * counts over the eval queries. Same ranked frame as q327 filtered
    * to rn=1. */
  def nnConfusion(spark: SparkSession, dir: String): DataFrame =
    knnRanked(spark, dir).filter(col("rn") === 1)
      .groupBy(col("true_label"), col("nn_label"))
      .agg(count(lit(1)).as("n"))
      .orderBy(col("true_label"), col("nn_label"))

  private val nnConfusionSql =
    s"""WITH $knnRankedSql
       |SELECT true_label, nn_label, CAST(COUNT(*) AS BIGINT) AS n
       |FROM ranked WHERE rn = 1
       |GROUP BY 1, 2
       |ORDER BY true_label, nn_label""".stripMargin

  // ---- linear (equal-credit) multi-touch attribution -------------------

  /** Linear multi-touch attribution: every purchase splits one unit of
    * credit equally across the user's non-purchase touches in the 7
    * days before it (q121 last-touch / q273 first-touch complete the
    * standard trio). Per-touch credit is the exact integer 10⁶ div n —
    * summing floats 1/n would be accumulation-order-dependent, micro-
    * units are not. The touch join is an equi-join on user with a time-
    * band residual (bounded per-user fan-out); credit rolls up once per
    * channel. */
  def linearAttribution(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
    val purchases = e.filter(col("event_type") === "purchase")
      .select(col("user_id"), col("event_id").as("pid"), col("ts_us").as("tp"))
    val touches = e.filter(col("event_type") =!= "purchase")
      .select(col("user_id"), col("event_type").as("channel"),
        col("ts_us").as("tt"))
    val joined = purchases.join(touches, Seq("user_id"))
      .filter(col("tt") < col("tp") && col("tt") >= col("tp") - lit(7L) * DayUs)
    val wp = Window.partitionBy(col("pid"))
    joined
      .withColumn("n_touch", count(lit(1)).over(wp))
      .withColumn("credit_micro", expr("1000000L div n_touch"))
      .groupBy(col("channel"))
      .agg(countDistinct(col("pid")).as("purchases_touched"),
        sum(col("credit_micro")).as("credit_micro"))
      .select(col("channel"), col("purchases_touched"), col("credit_micro"),
        (col("credit_micro").cast("double") / 1000000L).as("credit"))
      .orderBy(col("channel"))
  }

  private val linearAttributionSql =
    """WITH p AS (
      |  SELECT user_id, event_id AS pid, epoch_us(ts) AS tp
      |  FROM events WHERE event_type = 'purchase'
      |), t AS (
      |  SELECT user_id, event_type AS channel, epoch_us(ts) AS tt
      |  FROM events WHERE event_type <> 'purchase'
      |), j AS (
      |  SELECT p.pid, t.channel
      |  FROM p JOIN t ON p.user_id = t.user_id
      |    AND t.tt < p.tp AND t.tt >= p.tp - 604800000000
      |), c AS (
      |  SELECT pid, channel,
      |    1000000 // (CAST(COUNT(*) OVER (PARTITION BY pid) AS BIGINT))
      |      AS credit_micro
      |  FROM j
      |)
      |SELECT channel, CAST(COUNT(DISTINCT pid) AS BIGINT) AS purchases_touched,
      |  CAST(SUM(credit_micro) AS BIGINT) AS credit_micro,
      |  CAST(SUM(credit_micro) AS DOUBLE) / 1000000 AS credit
      |FROM c
      |GROUP BY channel
      |ORDER BY channel""".stripMargin

  // ---- calendar coverage gaps ------------------------------------------

  /** Days with NO orders per priority segment, against the generated
    * full calendar spine — the data-completeness audit that catches
    * silently dropped ingestion partitions. Spine × 5 segments is a
    * broadcast cross of two tiny generated sides; the anti-join probes
    * the (day, segment) aggregate of orders, so the fact table
    * collapses before any join. */
  def coverageGaps(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
    val bounds = o.agg(min(to_date(col("o_orderdate"))).as("d0"),
      max(to_date(col("o_orderdate"))).as("d1"))
    val spine = bounds.select(
      explode(expr("sequence(d0, d1, interval 1 day)")).as("d"))
    val segs = o.select(col("o_orderpriority").as("segment")).distinct()
    val present = o.groupBy(to_date(col("o_orderdate")).as("d"),
        col("o_orderpriority").as("segment"))
      .agg(count(lit(1)).as("c"))
    spine.crossJoin(segs)
      .join(present, Seq("d", "segment"), "left_anti")
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("missing_days"), min(col("d")).as("first_missing"))
      .orderBy(col("segment"))
  }

  private val coverageGapsSql =
    """WITH b AS (
      |  SELECT MIN(CAST(o_orderdate AS DATE)) AS d0,
      |    MAX(CAST(o_orderdate AS DATE)) AS d1
      |  FROM orders
      |), spine AS (
      |  SELECT CAST(unnest(generate_series(d0, d1, INTERVAL 1 DAY)) AS DATE) AS d
      |  FROM b
      |), segs AS (
      |  SELECT DISTINCT o_orderpriority AS segment FROM orders
      |), present AS (
      |  SELECT DISTINCT CAST(o_orderdate AS DATE) AS d,
      |    o_orderpriority AS segment
      |  FROM orders
      |)
      |SELECT s.segment, CAST(COUNT(*) AS BIGINT) AS missing_days,
      |  MIN(sp.d) AS first_missing
      |FROM spine sp CROSS JOIN segs s
      |LEFT JOIN present p ON p.d = sp.d AND p.segment = s.segment
      |WHERE p.d IS NULL
      |GROUP BY s.segment
      |ORDER BY s.segment""".stripMargin

  // ---- embedding drift: per-label centroid shift -----------------------

  /** Per-label centroid L2 shift between the first and second half of
    * the corpus (by vec_id) — the embedding-drift monitor run between
    * model or pipeline versions. The trick that keeps it engine-exact:
    * the mean difference per dimension is the RATIONAL
    * (S1·n2 − S2·n1)/(n1·n2), whose numerators are integers — so
    * Σ_dims num² is an exact DECIMAL(38,0) sum, and the shift is
    * sqrt(Σnum²)/(n1·n2·10⁶) — sqrt+division once at the end, never a
    * float accumulation over dimensions. One posexplode aggregate per
    * half, a 64-row join per label. */
  def centroidDrift(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val mid = Catalog.load(spark, dir, "embeddings")
      .agg(max(col("vec_id")).as("mx"))
      .select((col("mx") / 2).cast("long").as("mid"))
    val v = Catalog.load(spark, dir, "embeddings")
      .crossJoin(broadcast(mid))
      .select(col("label"), when(col("vec_id") <= col("mid"), 1).otherwise(2).as("half"),
        posexplode(
          expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
          .as(Seq("dim", "xi")))
    val sums = v.groupBy(col("label"), col("half"), col("dim"))
      .agg(sum(col("xi").cast(dec)).as("s"), count(lit(1)).as("n"))
    val h1 = sums.filter(col("half") === 1)
      .select(col("label"), col("dim"), col("s").as("s1"), col("n").as("n1"))
    val h2 = sums.filter(col("half") === 2)
      .select(col("label"), col("dim"), col("s").as("s2"), col("n").as("n2"))
    h1.join(h2, Seq("label", "dim"))
      .select(col("label"), col("n1"), col("n2"),
        ((col("s1") * col("n2") - col("s2") * col("n1"))
          * (col("s1") * col("n2") - col("s2") * col("n1"))).cast(dec).as("num2"))
      .groupBy(col("label"))
      .agg(max(col("n1")).as("n1"), max(col("n2")).as("n2"),
        sum(col("num2")).as("sum_num2"))
      .select(col("label"), col("n1"), col("n2"),
        (sqrt(col("sum_num2").cast("double")) /
          ((col("n1") * col("n2")).cast("double") * 1000000.0))
          .as("centroid_shift"))
      .orderBy(col("label"))
  }

  private val centroidDriftSql =
    s"""WITH mid AS (
       |  SELECT CAST(MAX(vec_id) // 2 AS BIGINT) AS mid FROM embeddings
       |), v AS (
       |  SELECT label,
       |    CASE WHEN vec_id <= mid.mid THEN 1 ELSE 2 END AS half,
       |    CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS HUGEINT) AS xi
       |  FROM embeddings, mid
       |), sums AS (
       |  SELECT label, half, dim, SUM(xi) AS s,
       |    CAST(COUNT(*) AS HUGEINT) AS n
       |  FROM v GROUP BY 1, 2, 3
       |), j AS (
       |  SELECT a.label, a.dim, a.s AS s1, a.n AS n1, b.s AS s2, b.n AS n2,
       |    (a.s * b.n - b.s * a.n) * (a.s * b.n - b.s * a.n) AS num2
       |  FROM sums a JOIN sums b
       |    ON a.label = b.label AND a.dim = b.dim AND a.half = 1 AND b.half = 2
       |), agg AS (
       |  SELECT label, MAX(n1) AS n1, MAX(n2) AS n2, SUM(num2) AS sum_num2
       |  FROM j GROUP BY label
       |)
       |SELECT label, CAST(n1 AS BIGINT) AS n1, CAST(n2 AS BIGINT) AS n2,
       |  sqrt(${hugeDbl("sum_num2")})
       |    / (${hugeDbl("n1 * n2")} * 1000000.0) AS centroid_shift
       |FROM agg
       |ORDER BY label""".stripMargin

  // ---- Simpson's paradox detector --------------------------------------

  /** Simpson's-paradox audit on activation conversion (q323's metric)
    * split by the user's dominant event count parity... no — segment by
    * the user's first event type: does the variant-0-vs-1 conversion
    * direction hold inside every segment, or does aggregation flip it?
    * The direction compare is the EXACT integer cross-product sign
    * c₁·n₂ − c₂·n₁ (no division anywhere until the report columns), so
    * the paradox flag is bit-robust. One per-user collapse, one segment
    * rollup, a broadcast overall row. */
  def simpsonParadox(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val users = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(min(when(col("rn") === 1, col("event_type"))).as("segment"),
        min(col("ts_us")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tp"))
      .select(col("segment"), (col("user_id") % 2).as("variant"),
        when(col("tp").isNotNull && col("tp") <= col("t0") + DayUs, 1L)
          .otherwise(0L).as("conv"))
    val bySeg = users.groupBy(col("segment"))
      .agg(sum(when(col("variant") === 0, 1L).otherwise(0L)).as("n1"),
        sum(when(col("variant") === 0, col("conv")).otherwise(0L)).as("c1"),
        sum(when(col("variant") === 1, 1L).otherwise(0L)).as("n2"),
        sum(when(col("variant") === 1, col("conv")).otherwise(0L)).as("c2"))
    val overall = bySeg.agg(sum(col("n1")).as("on1"), sum(col("c1")).as("oc1"),
      sum(col("n2")).as("on2"), sum(col("c2")).as("oc2"))
    bySeg.crossJoin(broadcast(overall))
      .select(col("segment"), col("n1"), col("c1"), col("n2"), col("c2"),
        signum((col("c1") * col("n2") - col("c2") * col("n1")).cast("double"))
          .cast("long").as("seg_direction"),
        signum((col("oc1") * col("on2") - col("oc2") * col("on1")).cast("double"))
          .cast("long").as("overall_direction"))
      .withColumn("flips",
        col("seg_direction") =!= lit(0L) &&
          col("seg_direction") === -col("overall_direction"))
      .orderBy(col("segment"))
  }

  private val simpsonParadoxSql =
    """WITH e AS (
      |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events
      |), u AS (
      |  SELECT user_id,
      |    MIN(CASE WHEN rn = 1 THEN event_type END) AS segment,
      |    MIN(ts_us) AS t0,
      |    MIN(CASE WHEN event_type = 'purchase' THEN ts_us END) AS tp
      |  FROM e GROUP BY 1
      |), users AS (
      |  SELECT segment, user_id % 2 AS variant,
      |    CASE WHEN tp IS NOT NULL AND tp <= t0 + 86400000000
      |      THEN 1 ELSE 0 END AS conv
      |  FROM u
      |), by_seg AS (
      |  SELECT segment,
      |    CAST(SUM(CASE WHEN variant = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
      |    CAST(SUM(CASE WHEN variant = 0 THEN conv ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN variant = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
      |    CAST(SUM(CASE WHEN variant = 1 THEN conv ELSE 0 END) AS BIGINT) AS c2
      |  FROM users GROUP BY 1
      |), o AS (
      |  SELECT SUM(n1) AS on1, SUM(c1) AS oc1, SUM(n2) AS on2, SUM(c2) AS oc2
      |  FROM by_seg
      |)
      |SELECT segment, n1, c1, n2, c2,
      |  CAST(sign(c1 * n2 - c2 * n1) AS BIGINT) AS seg_direction,
      |  CAST(sign(oc1 * on2 - oc2 * on1) AS BIGINT) AS overall_direction,
      |  CAST(sign(c1 * n2 - c2 * n1) AS BIGINT) <> 0
      |    AND CAST(sign(c1 * n2 - c2 * n1) AS BIGINT)
      |      = -CAST(sign(oc1 * on2 - oc2 * on1) AS BIGINT) AS flips
      |FROM by_seg, o
      |ORDER BY segment""".stripMargin

  // ---- difference-in-differences ---------------------------------------

  /** Diff-in-diff estimate of the "urgent-priority weekend effect" on
    * order value: (urgent_weekend − urgent_weekday) − (other_weekend −
    * other_weekday). The four cell means come from ONE aggregate row of
    * exact cent sums and counts; the estimate is a fixed scalar
    * expression over those eight values — four divisions and three
    * subtractions in a deterministic tree, no data-dependent float
    * accumulation anywhere. */
  def diffInDiff(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(
        (col("o_orderpriority").isin("1-URGENT", "2-HIGH")).as("treated"),
        (expr("weekday(o_orderdate)") >= 5).as("weekend"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    def cell(t: Boolean, we: Boolean, suffix: String) = Seq(
      sum(when(col("treated") === t && col("weekend") === we, col("cents"))
        .otherwise(0L)).as(s"s$suffix"),
      sum(when(col("treated") === t && col("weekend") === we, 1L)
        .otherwise(0L)).as(s"n$suffix"))
    val cols = cell(true, true, "11") ++ cell(true, false, "10") ++
      cell(false, true, "01") ++ cell(false, false, "00")
    val agg = o.agg(cols.head, cols.tail: _*)
    def m(s: String) =
      col(s"s$s").cast("double") / col(s"n$s").cast("double") / 100.0
    agg.select(col("n11"), col("n10"), col("n01"), col("n00"),
      m("11").as("m11"), m("10").as("m10"), m("01").as("m01"), m("00").as("m00"))
      .withColumn("did", (col("m11") - col("m10")) - (col("m01") - col("m00")))
  }

  private val diffInDiffSql =
    """WITH o AS (
      |  SELECT o_orderpriority IN ('1-URGENT', '2-HIGH') AS treated,
      |    isodow(CAST(o_orderdate AS DATE)) >= 6 AS weekend,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), a AS (
      |  SELECT
      |    CAST(SUM(CASE WHEN treated AND weekend THEN cents ELSE 0 END) AS BIGINT) AS s11,
      |    CAST(SUM(CASE WHEN treated AND weekend THEN 1 ELSE 0 END) AS BIGINT) AS n11,
      |    CAST(SUM(CASE WHEN treated AND NOT weekend THEN cents ELSE 0 END) AS BIGINT) AS s10,
      |    CAST(SUM(CASE WHEN treated AND NOT weekend THEN 1 ELSE 0 END) AS BIGINT) AS n10,
      |    CAST(SUM(CASE WHEN NOT treated AND weekend THEN cents ELSE 0 END) AS BIGINT) AS s01,
      |    CAST(SUM(CASE WHEN NOT treated AND weekend THEN 1 ELSE 0 END) AS BIGINT) AS n01,
      |    CAST(SUM(CASE WHEN NOT treated AND NOT weekend THEN cents ELSE 0 END) AS BIGINT) AS s00,
      |    CAST(SUM(CASE WHEN NOT treated AND NOT weekend THEN 1 ELSE 0 END) AS BIGINT) AS n00
      |  FROM o
      |)
      |SELECT n11, n10, n01, n00,
      |  CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / 100.0 AS m11,
      |  CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / 100.0 AS m10,
      |  CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / 100.0 AS m01,
      |  CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / 100.0 AS m00,
      |  (CAST(s11 AS DOUBLE) / CAST(n11 AS DOUBLE) / 100.0
      |    - CAST(s10 AS DOUBLE) / CAST(n10 AS DOUBLE) / 100.0)
      |  - (CAST(s01 AS DOUBLE) / CAST(n01 AS DOUBLE) / 100.0
      |    - CAST(s00 AS DOUBLE) / CAST(n00 AS DOUBLE) / 100.0) AS did
      |FROM a""".stripMargin

  // ---- directional association rules -----------------------------------

  /** Top-20 directional association rules A→B over order baskets by
    * confidence (support ≥ 3): confidence = n_ab/n_a, lift rides along
    * — q179's pair counts made directional, the actual "customers who
    * bought X also bought Y" serving table. Baskets above
    * [[MaxBasketSize]] are dropped first (mirrored in the oracle) so
    * the pair fan-out stays bounded at any scale. Counts exact;
    * confidence and lift are the only divisions; top-20 via
    * TakeOrdered. */
  def assocRules(spark: SparkSession, dir: String): DataFrame = {
    val items = cappedBaskets(spark, dir)
    val nOrders = items.select(col("ok")).distinct()
      .agg(count(lit(1)).as("n_orders"))
    val perPart = items.groupBy(col("pk")).agg(count(lit(1)).as("n_part"))
    // ordered (a ≠ b) view of the shared memoized pair aggregate — an
    // unordered pair counts the same in both directions, so the
    // union-of-swap equals the a ≠ b groupBy bit for bit
    val pairs = BasketFrames
      .symmetrized(BasketFrames.cappedPairCounts(spark, dir))
      .filter(col("n_ab") >= 3)
    pairs
      .join(perPart.select(col("pk").as("a"), col("n_part").as("n_a")), "a")
      .join(perPart.select(col("pk").as("b"), col("n_part").as("n_b")), "b")
      .crossJoin(broadcast(nOrders))
      .select(col("a"), col("b"), col("n_ab"), col("n_a"),
        (col("n_ab").cast("double") / col("n_a").cast("double")).as("confidence"),
        (col("n_ab").cast("double") * col("n_orders")
          / (col("n_a") * col("n_b"))).as("lift"))
      .orderBy(col("confidence").desc, col("n_ab").desc, col("a"), col("b"))
      .limit(20)
  }

  private val assocRulesSql =
    s"""WITH $cappedBasketsSql, n AS (
      |  SELECT COUNT(DISTINCT ok) AS n_orders FROM items
      |), pp AS (
      |  SELECT pk, COUNT(*) AS n_part FROM items GROUP BY 1
      |), pairs AS (
      |  SELECT x.pk AS a, y.pk AS b, CAST(COUNT(*) AS BIGINT) AS n_ab
      |  FROM items x JOIN items y ON x.ok = y.ok AND x.pk <> y.pk
      |  GROUP BY 1, 2
      |  HAVING COUNT(*) >= 3
      |)
      |SELECT p.a, p.b, p.n_ab, CAST(pa.n_part AS BIGINT) AS n_a,
      |  CAST(p.n_ab AS DOUBLE) / CAST(pa.n_part AS DOUBLE) AS confidence,
      |  CAST(p.n_ab AS DOUBLE) * n.n_orders / (pa.n_part * pb.n_part) AS lift
      |FROM pairs p
      |JOIN pp pa ON pa.pk = p.a
      |JOIN pp pb ON pb.pk = p.b
      |CROSS JOIN n
      |ORDER BY confidence DESC, p.n_ab DESC, p.a, p.b
      |LIMIT 20""".stripMargin

  // ---- user journey signatures -----------------------------------------

  /** Distribution of first-3-event journey signatures ("view>click>
    * signup") with their 24h-activation rate — the onboarding-archetype
    * report. One user-partitioned window pass builds the signature and
    * the activation flag; signatures roll up with exact counts and one
    * rate division. */
  def journeySignature(spark: SparkSession, dir: String): DataFrame = {
    val DayUs = 86400000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val users = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("rn", row_number().over(w))
      .groupBy(col("user_id"))
      .agg(min(when(col("rn") === 1, col("event_type"))).as("e1"),
        min(when(col("rn") === 2, col("event_type"))).as("e2"),
        min(when(col("rn") === 3, col("event_type"))).as("e3"),
        min(col("ts_us")).as("t0"),
        min(when(col("event_type") === "purchase", col("ts_us"))).as("tp"))
      .select(
        concat_ws(">", coalesce(col("e1"), lit("-")),
          coalesce(col("e2"), lit("-")), coalesce(col("e3"), lit("-")))
          .as("signature"),
        when(col("tp").isNotNull && col("tp") <= col("t0") + DayUs, 1L)
          .otherwise(0L).as("activated"))
    users.groupBy(col("signature"))
      .agg(count(lit(1)).as("n_users"), sum(col("activated")).as("n_activated"))
      .select(col("signature"), col("n_users"), col("n_activated"),
        (col("n_activated").cast("double") / col("n_users").cast("double"))
          .as("activation_rate"))
      .orderBy(col("n_users").desc, col("signature"))
      .limit(25)
  }

  private val journeySignatureSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
      |    row_number() OVER (PARTITION BY user_id
      |      ORDER BY epoch_us(ts), event_id) AS rn
      |  FROM events
      |), u AS (
      |  SELECT user_id,
      |    COALESCE(MIN(CASE WHEN rn = 1 THEN event_type END), '-')
      |      || '>' || COALESCE(MIN(CASE WHEN rn = 2 THEN event_type END), '-')
      |      || '>' || COALESCE(MIN(CASE WHEN rn = 3 THEN event_type END), '-')
      |      AS signature,
      |    CASE WHEN MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
      |        IS NOT NULL
      |      AND MIN(CASE WHEN event_type = 'purchase' THEN ts_us END)
      |        <= MIN(ts_us) + 86400000000
      |      THEN 1 ELSE 0 END AS activated
      |  FROM e GROUP BY user_id
      |)
      |SELECT signature, CAST(COUNT(*) AS BIGINT) AS n_users,
      |  CAST(SUM(activated) AS BIGINT) AS n_activated,
      |  CAST(SUM(activated) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
      |    AS activation_rate
      |FROM u
      |GROUP BY signature
      |ORDER BY n_users DESC, signature
      |LIMIT 25""".stripMargin

  // ---- reciprocal best match (mutual top-1) ----------------------------

  /** Supplier↔part mutual-best pairs: the supplier's #1 part by exact
    * revenue cents AND that part's #1 supplier — the reciprocal-best
    * filter used in entity resolution and assignment problems to keep
    * only unambiguous matches. Two WindowGroupLimit-prunable top-1
    * windows over the same (s, p) revenue aggregate, one equi self-join
    * on the pair key. */
  def mutualBest(spark: SparkSession, dir: String): DataFrame = {
    val sp = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_suppkey").as("s"), col("l_partkey").as("p"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val bySupp = sp.withColumn("rs", row_number().over(
      Window.partitionBy(col("s")).orderBy(col("cents").desc, col("p"))))
      .filter(col("rs") === 1).select(col("s"), col("p"), col("cents"))
    val byPart = sp.withColumn("rp", row_number().over(
      Window.partitionBy(col("p")).orderBy(col("cents").desc, col("s"))))
      .filter(col("rp") === 1).select(col("s"), col("p"))
    bySupp.join(byPart, Seq("s", "p"))
      .select(col("s").as("s_suppkey"), col("p").as("p_partkey"), col("cents"))
      .orderBy(col("s_suppkey"))
  }

  private val mutualBestSql =
    """WITH sp AS (
      |  SELECT l_suppkey AS s, l_partkey AS p,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem GROUP BY 1, 2
      |), bs AS (
      |  SELECT s, p, cents FROM (
      |    SELECT *, row_number() OVER (PARTITION BY s
      |      ORDER BY cents DESC, p) AS rs FROM sp) WHERE rs = 1
      |), bp AS (
      |  SELECT s, p FROM (
      |    SELECT *, row_number() OVER (PARTITION BY p
      |      ORDER BY cents DESC, s) AS rp FROM sp) WHERE rp = 1
      |)
      |SELECT bs.s AS s_suppkey, bs.p AS p_partkey, bs.cents
      |FROM bs JOIN bp ON bs.s = bp.s AND bs.p = bp.p
      |ORDER BY s_suppkey""".stripMargin

  // ---- 10% trimmed mean per segment ------------------------------------

  /** 10%-trimmed mean order value per priority — the robust central
    * tendency that DROPS the tails q131's winsorize clamps. Rank window
    * per segment, keep ranks in (⌊n/10⌋, n−⌊n/10⌋], exact cent sums,
    * one division. */
  def trimmedMean(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("cents"), col("o_orderkey"))
    o.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("segment"))))
      .filter(col("rn") > expr("n div 10") && col("rn") <= col("n") - expr("n div 10"))
      .groupBy(col("segment"))
      .agg(count(lit(1)).as("n_kept"), sum(col("cents")).as("kept_cents"))
      .select(col("segment"), col("n_kept"),
        (col("kept_cents").cast("double") / col("n_kept").cast("double") / 100.0)
          .as("trimmed_mean"))
      .orderBy(col("segment"))
  }

  private val trimmedMeanSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS segment, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), r AS (
      |  SELECT segment, cents,
      |    CAST(row_number() OVER (PARTITION BY segment
      |      ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
      |  FROM o
      |)
      |SELECT segment, CAST(COUNT(*) AS BIGINT) AS n_kept,
      |  CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
      |    AS trimmed_mean
      |FROM r
      |WHERE rn > n // 10 AND rn <= n - n // 10
      |GROUP BY segment
      |ORDER BY segment""".stripMargin

  // ---- quantile treatment effect ---------------------------------------

  /** Quantile treatment effect of the o_custkey%2 split on order value:
    * the p25/p50/p75 differences between the two arms, each quantile an
    * exact rank-selected cent value (⌈p·n⌉ in the (cents, orderkey)
    * total order — interpolation-free, so both engines agree bit-for-
    * bit). The distribution-level view a mean-diff test misses. */
  def qte(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select((col("o_custkey") % 2).as("variant"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("variant"))
      .orderBy(col("cents"), col("o_orderkey"))
    val ranked = o.withColumn("rn", row_number().over(w))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("variant"))))
    val qs = ranked.groupBy(col("variant"))
      .agg(min(when(col("rn") === expr("(n * 25 + 99) div 100"), col("cents"))).as("p25"),
        min(when(col("rn") === expr("(n * 50 + 99) div 100"), col("cents"))).as("p50"),
        min(when(col("rn") === expr("(n * 75 + 99) div 100"), col("cents"))).as("p75"))
    val v0 = qs.filter(col("variant") === 0)
      .select(col("p25").as("q25_0"), col("p50").as("q50_0"), col("p75").as("q75_0"))
    val v1 = qs.filter(col("variant") === 1)
      .select(col("p25").as("q25_1"), col("p50").as("q50_1"), col("p75").as("q75_1"))
    v0.crossJoin(v1)
      .selectExpr(
        """stack(3,
          | 25L, q25_0, q25_1, q25_1 - q25_0,
          | 50L, q50_0, q50_1, q50_1 - q50_0,
          | 75L, q75_0, q75_1, q75_1 - q75_0)
          |AS (percentile, cents_v0, cents_v1, qte_cents)""".stripMargin)
      .orderBy(col("percentile"))
  }

  private val qteSql =
    """WITH o AS (
      |  SELECT o_custkey % 2 AS variant, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), r AS (
      |  SELECT variant, cents,
      |    CAST(row_number() OVER (PARTITION BY variant
      |      ORDER BY cents, o_orderkey) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER (PARTITION BY variant) AS BIGINT) AS n
      |  FROM o
      |), q AS (
      |  SELECT variant,
      |    MIN(CASE WHEN rn = (n * 25 + 99) // 100 THEN cents END) AS p25,
      |    MIN(CASE WHEN rn = (n * 50 + 99) // 100 THEN cents END) AS p50,
      |    MIN(CASE WHEN rn = (n * 75 + 99) // 100 THEN cents END) AS p75
      |  FROM r GROUP BY variant
      |), v0 AS (SELECT p25 AS q25_0, p50 AS q50_0, p75 AS q75_0 FROM q WHERE variant = 0),
      |v1 AS (SELECT p25 AS q25_1, p50 AS q50_1, p75 AS q75_1 FROM q WHERE variant = 1),
      |cells AS (
      |  SELECT CAST(25 AS BIGINT) AS percentile, q25_0 AS cents_v0,
      |    q25_1 AS cents_v1, q25_1 - q25_0 AS qte_cents FROM v0, v1
      |  UNION ALL
      |  SELECT 50, q50_0, q50_1, q50_1 - q50_0 FROM v0, v1
      |  UNION ALL
      |  SELECT 75, q75_0, q75_1, q75_1 - q75_0 FROM v0, v1
      |)
      |SELECT * FROM cells ORDER BY percentile""".stripMargin

  // ---- dedup threshold sweep -------------------------------------------

  /** Near-dup pair counts at Jaccard thresholds 0.3…0.8 from ONE
    * pairwise-similarity computation — the dedup-tuning curve that
    * shows where the cliff is before anyone picks a production
    * threshold. Reuses the df-capped candidate machinery
    * ([[graft.ops.DedupOps.jaccardPairs]]); each threshold is a
    * conditional count over the same single-division jaccard values
    * (identical division+compare on both engines). */
  def jaccardSweep(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.DedupOps.jaccardPairs(
      Catalog.load(spark, dir, "documents"), n = 5, threshold = 0.3)
    val agg = pairs.agg(
      sum(when(col("jaccard") >= 0.3, 1L).otherwise(0L)).as("t30"),
      sum(when(col("jaccard") >= 0.4, 1L).otherwise(0L)).as("t40"),
      sum(when(col("jaccard") >= 0.5, 1L).otherwise(0L)).as("t50"),
      sum(when(col("jaccard") >= 0.6, 1L).otherwise(0L)).as("t60"),
      sum(when(col("jaccard") >= 0.7, 1L).otherwise(0L)).as("t70"),
      sum(when(col("jaccard") >= 0.8, 1L).otherwise(0L)).as("t80"))
    agg.selectExpr(
      """stack(6, 30L, t30, 40L, t40, 50L, t50, 60L, t60, 70L, t70, 80L, t80)
        |AS (threshold_pct, n_pairs)""".stripMargin)
      .select(col("threshold_pct"), coalesce(col("n_pairs"), lit(0L)).as("n_pairs"))
      .orderBy(col("threshold_pct"))
  }

  // Mirrors the Scala path faithfully, INCLUDING the candidate df-cap
  // (DedupOps.DefaultMaxDf=1000): candidate pairs must share ≥1 shingle
  // with df ≤ 1000, while |∩| is still counted over the FULL shingle
  // sets — the cap changes candidate recall only, never a jaccard value.
  // Inert on the fixtures (every posting ≤500 docs) but keeps the oracle
  // honest if fixture corpora ever grow a boilerplate hot key.
  private val jaccardSweepSql =
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
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), sims AS (
      |  SELECT CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) AS j
      |  FROM common
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN card x ON doc_a = x.doc_id
      |  JOIN card y ON doc_b = y.doc_id
      |), cells AS (
      |  SELECT CAST(t AS BIGINT) AS threshold_pct,
      |    (SELECT CAST(COALESCE(SUM(CASE WHEN j >= t / 100.0 THEN 1 ELSE 0 END), 0)
      |       AS BIGINT) FROM sims) AS n_pairs
      |  FROM (VALUES (30), (40), (50), (60), (70), (80)) AS v(t)
      |)
      |SELECT * FROM cells ORDER BY threshold_pct""".stripMargin

  // ---- ratio-metric variance via the delta method ----------------------

  /** Delta-method standard error for the ratio metric "event value per
    * event" per experiment arm — THE experimentation primitive for
    * ratio metrics (naively treating a ratio as a mean understates its
    * variance). Per-user (x=Σvalue cents, y=n events) collapse, then
    * exact DECIMAL(38,0) moments per arm; R̂ = ΣX/ΣY and
    * var(R̂) ≈ (s²x − 2R̂·sxy + R̂²·s²y)/(n·ȳ²) are a fixed mirrored
    * IEEE chain over those exact moments. */
  def ratioDelta(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val perUser = Catalog.load(spark, dir, "events")
      .groupBy(col("user_id"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("x"),
        count(lit(1)).as("y"))
    val m = perUser.groupBy((col("user_id") % 2).as("variant"))
      .agg(count(lit(1)).as("n"),
        sum(col("x").cast(dec)).as("sx"), sum(col("y").cast(dec)).as("sy"),
        sum((col("x").cast(dec) * col("x")).cast(dec)).as("sxx"),
        sum((col("y").cast(dec) * col("y")).cast(dec)).as("syy"),
        sum((col("x").cast(dec) * col("y")).cast(dec)).as("sxy"))
    val n = col("n").cast(dec)
    m.select(col("variant"), col("n"),
        (col("sx").cast("double") / col("sy").cast("double")).as("ratio"),
        ((n * col("sxx") - col("sx") * col("sx")).cast("double") /
          (n * (n - 1)).cast("double")).as("vx"),
        ((n * col("syy") - col("sy") * col("sy")).cast("double") /
          (n * (n - 1)).cast("double")).as("vy"),
        ((n * col("sxy") - col("sx") * col("sy")).cast("double") /
          (n * (n - 1)).cast("double")).as("cxy"),
        (col("sy").cast("double") / col("n").cast("double")).as("ybar"))
      .withColumn("se_ratio",
        sqrt((col("vx") - lit(2.0) * col("ratio") * col("cxy")
          + col("ratio") * col("ratio") * col("vy"))
          / (col("n").cast("double") * col("ybar") * col("ybar"))))
      .select(col("variant"), col("n"), col("ratio"), col("se_ratio"))
      .orderBy(col("variant"))
  }

  private val ratioDeltaSql =
    s"""WITH pu AS (
       |  SELECT user_id,
       |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS HUGEINT) AS x,
       |    CAST(COUNT(*) AS HUGEINT) AS y
       |  FROM events GROUP BY 1
       |), m AS (
       |  SELECT user_id % 2 AS variant, CAST(COUNT(*) AS HUGEINT) AS n,
       |    SUM(x) AS sx, SUM(y) AS sy,
       |    SUM(x * x) AS sxx, SUM(y * y) AS syy, SUM(x * y) AS sxy
       |  FROM pu GROUP BY 1
       |), s AS (
       |  SELECT variant, CAST(n AS BIGINT) AS n,
       |    ${hugeDbl("sx")} / ${hugeDbl("sy")} AS ratio,
       |    ${hugeDbl("n * sxx - sx * sx")} / ${hugeDbl("n * (n - 1)")} AS vx,
       |    ${hugeDbl("n * syy - sy * sy")} / ${hugeDbl("n * (n - 1)")} AS vy,
       |    ${hugeDbl("n * sxy - sx * sy")} / ${hugeDbl("n * (n - 1)")} AS cxy,
       |    ${hugeDbl("sy")} / ${hugeDbl("n")} AS ybar
       |  FROM m
       |)
       |SELECT variant, n, ratio,
       |  sqrt((vx - 2.0 * ratio * cxy + ratio * ratio * vy)
       |    / (CAST(n AS DOUBLE) * ybar * ybar)) AS se_ratio
       |FROM s
       |ORDER BY variant""".stripMargin

  // ---- effective dimensionality (participation ratio) ------------------

  /** Participation-ratio effective dimensionality of the embedding
    * corpus under the diagonal-covariance approximation:
    * PR = (Σ_d λ_d)²/Σ_d λ_d² with λ_d the per-dimension variance.
    * Because every λ_d shares the denominator n², PR reduces to
    * (Σ num_d)²/Σ num_d² over the INTEGER numerators
    * num_d = n·Σx² − (Σx)² — exact DECIMAL(38,0) end-to-end, one final
    * division. (Headroom note: num² ≈ 10³⁶ at fixture scale; a larger
    * corpus would drop the 10⁶ scaling to 10⁴ to stay inside
    * DECIMAL(38).) The "how many dimensions are actually used" audit
    * that catches collapsed embedding spaces. */
  def effectiveDim(spark: SparkSession, dir: String): DataFrame = {
    val dec = "decimal(38,0)"
    val perDim = Catalog.load(spark, dir, "embeddings")
      .select(posexplode(
        expr("transform(embedding, x -> CAST(floor(CAST(x AS DOUBLE) * 1000000) AS BIGINT))"))
        .as(Seq("dim", "xi")))
      .groupBy(col("dim"))
      .agg(count(lit(1)).as("n"),
        sum(col("xi").cast(dec)).as("sx"),
        sum((col("xi").cast(dec) * col("xi")).cast(dec)).as("sxx"))
      .select(col("dim"),
        (col("n").cast(dec) * col("sxx") - col("sx") * col("sx")).cast(dec)
          .as("num"))
    perDim.agg(count(lit(1)).as("n_dims"),
        sum(col("num")).as("s1"),
        sum((col("num") * col("num")).cast(dec)).as("s2"))
      .select(col("n_dims"),
        ((col("s1") * col("s1")).cast("double") / col("s2").cast("double"))
          .as("effective_dims"))
  }

  private val effectiveDimSql =
    s"""WITH v AS (
       |  SELECT CAST(unnest(range(len(embedding))) AS BIGINT) AS dim,
       |    CAST(floor(CAST(unnest(embedding) AS DOUBLE) * 1000000) AS HUGEINT) AS xi
       |  FROM embeddings
       |), per_dim AS (
       |  SELECT dim,
       |    CAST(COUNT(*) AS HUGEINT) * SUM(xi * xi) - SUM(xi) * SUM(xi) AS num
       |  FROM v GROUP BY dim
       |), s AS (
       |  SELECT CAST(COUNT(*) AS BIGINT) AS n_dims,
       |    SUM(num) AS s1, SUM(num * num) AS s2
       |  FROM per_dim
       |)
       |SELECT n_dims,
       |  ${hugeDbl("s1 * s1")} / ${hugeDbl("s2")} AS effective_dims
       |FROM s""".stripMargin

  // ---- shuffle-key advisor: bucket imbalance per candidate key ---------

  /** Partition-key advisor: for three candidate integer bucketings of
    * the event stream (user_id%32, event_id%32, day-of-month), the
    * max/avg bucket-count skew a 32-way shuffle would see — the
    * pre-job answer to "which key balances". Plain modulo bucketing
    * (not engine hash functions, which differ) keeps it engine-exact;
    * one aggregate per strategy over one scan each, integer counts, one
    * division. */
  def partitionAdvisor(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("ts"))
    def strat(name: String, bucket: Column): DataFrame =
      e.groupBy(bucket.as("b")).agg(count(lit(1)).as("c"))
        .agg(count(lit(1)).as("n_buckets"), max(col("c")).as("max_rows"),
          sum(col("c")).as("total"))
        .select(lit(name).as("strategy"), col("n_buckets"), col("max_rows"),
          (col("max_rows").cast("double") * col("n_buckets").cast("double")
            / col("total").cast("double")).as("skew_ratio"))
    strat("user_mod32", pmod(col("user_id"), lit(32)))
      .unionAll(strat("event_mod32", pmod(col("event_id"), lit(32))))
      .unionAll(strat("day_of_month", dayofmonth(col("ts")).cast("long")))
      .orderBy(col("strategy"))
  }

  private val partitionAdvisorSql = {
    def strat(name: String, bucket: String) =
      s"""SELECT '$name' AS strategy,
         |  CAST(COUNT(*) AS BIGINT) AS n_buckets,
         |  CAST(MAX(c) AS BIGINT) AS max_rows,
         |  CAST(MAX(c) AS DOUBLE) * COUNT(*) / SUM(c) AS skew_ratio
         |FROM (SELECT $bucket AS b, COUNT(*) AS c FROM events GROUP BY 1)""".stripMargin
    Seq(strat("user_mod32", "user_id % 32"),
      strat("event_mod32", "event_id % 32"),
      strat("day_of_month", "CAST(day(ts) AS BIGINT)"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY strategy")
  }

  // ---- burst detection (bot heuristic) ---------------------------------

  /** Users whose event rate ever reached 3+ events inside a rolling
    * one-hour window — the bot/scraper heuristic every training-data
    * event pipeline runs before trusting engagement counts (threshold
    * calibrated to the fixture's ~2 events/user/day baseline; a real
    * clickstream would use minutes). RANGE frame over integer
    * microseconds per user (exact row counts, no floats at all); one
    * window pass, one per-user max. */
  def burstUsers(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"))
      .rangeBetween(-HourUs, 0)
    Catalog.load(spark, dir, "events")
      .select(col("user_id"), unix_micros(col("ts")).as("ts_us"))
      .withColumn("burst", count(lit(1)).over(w))
      .groupBy(col("user_id"))
      .agg(max(col("burst")).as("max_events_1h"), count(lit(1)).as("n_events"))
      .filter(col("max_events_1h") >= 3)
      .orderBy(col("max_events_1h").desc, col("user_id"))
  }

  private val burstUsersSql =
    """WITH e AS (
      |  SELECT user_id, epoch_us(ts) AS ts_us FROM events
      |), b AS (
      |  SELECT user_id,
      |    CAST(COUNT(*) OVER (PARTITION BY user_id ORDER BY ts_us
      |      RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW) AS BIGINT)
      |      AS burst
      |  FROM e
      |)
      |SELECT user_id, CAST(MAX(burst) AS BIGINT) AS max_events_1h,
      |  CAST(COUNT(*) AS BIGINT) AS n_events
      |FROM b
      |GROUP BY user_id
      |HAVING MAX(burst) >= 3
      |ORDER BY max_events_1h DESC, user_id""".stripMargin

  // ---- near-dup graph degree distribution ------------------------------

  /** Degree histogram of the 0.5-Jaccard near-dup graph: how many docs
    * have 1, 2, … near-duplicate neighbors — the shape report that
    * distinguishes "scattered pairs" from "one giant template family"
    * before anyone runs clustering. Pairs from the df-capped exact
    * machinery; degrees by exploding each pair to both endpoints. */
  def dedupDegreeHist(spark: SparkSession, dir: String): DataFrame = {
    val pairs = graft.ops.DedupOps.jaccardPairs(
      Catalog.load(spark, dir, "documents"), n = 5, threshold = 0.5)
    pairs.select(col("doc_a").as("doc_id"))
      .unionAll(pairs.select(col("doc_b").as("doc_id")))
      .groupBy(col("doc_id")).agg(count(lit(1)).as("degree"))
      .groupBy(col("degree")).agg(count(lit(1)).as("n_docs"))
      .orderBy(col("degree"))
  }

  // Same df-cap mirror as jaccardSweepSql: candidates need ≥1 shingle
  // with df ≤ 1000 (DedupOps.DefaultMaxDf); |∩| over full sets.
  private val dedupDegreeHistSql =
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
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM common
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN card x ON doc_a = x.doc_id
      |  JOIN card y ON doc_b = y.doc_id
      |  WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= 0.5
      |), deg AS (
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS degree
      |  FROM (SELECT doc_a AS doc_id FROM pairs
      |        UNION ALL SELECT doc_b FROM pairs)
      |  GROUP BY 1
      |)
      |SELECT degree, CAST(COUNT(*) AS BIGINT) AS n_docs
      |FROM deg GROUP BY 1 ORDER BY degree""".stripMargin

  // ---- label balance: chi-square goodness of fit -----------------------

  /** Chi-square goodness-of-fit of the embedding label distribution
    * against uniform — the class-balance gate before any sampling or
    * eval split. χ² = (k·Σc² − n²)/n: entirely integer until ONE
    * division (expanding Σ(cᵢ−n/k)²/(n/k) over the shared n/k
    * denominator — no per-class float terms to accumulate). */
  def labelBalance(spark: SparkSession, dir: String): DataFrame = {
    val perLabel = Catalog.load(spark, dir, "embeddings")
      .groupBy(col("label")).agg(count(lit(1)).as("c"))
    perLabel.agg(count(lit(1)).as("k"), sum(col("c")).as("n"),
        sum(col("c") * col("c")).as("sc2"))
      .select(col("k"), col("n"),
        ((col("k") * col("sc2") - col("n") * col("n")).cast("double") /
          col("n").cast("double")).as("chi2_uniform"))
  }

  private val labelBalanceSql =
    """WITH per_label AS (
      |  SELECT label, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM embeddings GROUP BY 1
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS k,
      |  CAST(SUM(c) AS BIGINT) AS n,
      |  CAST(COUNT(*) * SUM(c * c) - SUM(c) * SUM(c) AS DOUBLE)
      |    / CAST(SUM(c) AS DOUBLE) AS chi2_uniform
      |FROM per_label""".stripMargin

  // ---- 1-NN margin distribution ----------------------------------------

  /** Histogram of 1-NN confidence margins (cos@1 − cos@2 per query,
    * floored to 0.01 buckets) — how decisively the embedding space
    * separates nearest neighbors; a mass near zero means retrieval
    * order is noise. Reuses the exact ranked frame (q327); the margin
    * is one subtraction of two single-division cosines and the bucket
    * one floor — all correctly-rounded, engine-exact. */
  def nnMargin(spark: SparkSession, dir: String): DataFrame = {
    val top2 = knnRanked(spark, dir).filter(col("rn") <= 2)
    val byQuery = top2.groupBy(col("query_id"))
      .agg(min(when(col("rn") === 1, col("cos_sim"))).as("c1"),
        min(when(col("rn") === 2, col("cos_sim"))).as("c2"))
    byQuery
      .select((floor((col("c1") - col("c2")) * 100) / 100).as("margin_bucket"))
      .groupBy(col("margin_bucket"))
      .agg(count(lit(1)).as("n_queries"))
      .orderBy(col("margin_bucket"))
  }

  private val nnMarginSql =
    s"""WITH $knnRankedSql, sims AS (
       |  SELECT d.query_id, d.neighbor_id, r.rn,
       |    CAST(d.dot AS DOUBLE) / (sqrt(CAST(qn.n2 AS DOUBLE))
       |      * sqrt(CAST(dn.n2 AS DOUBLE))) AS cos_sim
       |  FROM dots d
       |  JOIN ranked r ON d.query_id = r.query_id
       |    AND d.neighbor_id = r.neighbor_id
       |  JOIN n2 qn ON d.query_id = qn.vec_id
       |  JOIN n2 dn ON d.neighbor_id = dn.vec_id
       |  WHERE r.rn <= 2
       |), m AS (
       |  SELECT query_id,
       |    MIN(CASE WHEN rn = 1 THEN cos_sim END) AS c1,
       |    MIN(CASE WHEN rn = 2 THEN cos_sim END) AS c2
       |  FROM sims GROUP BY 1
       |)
       |SELECT floor((c1 - c2) * 100) / 100 AS margin_bucket,
       |  CAST(COUNT(*) AS BIGINT) AS n_queries
       |FROM m
       |GROUP BY 1
       |ORDER BY margin_bucket""".stripMargin

  // ---- catalog coverage -------------------------------------------------

  /** Catalog coverage snapshot: how many parts never sold (anti-join
    * against the fact table), and what share of revenue the top-decile
    * parts hold — the assortment health one-liner. The unsold probe is
    * a left-anti against the collapsed per-part aggregate; the decile
    * share is a rank window over that same aggregate. */
  def catalogCoverage(spark: SparkSession, dir: String): DataFrame = {
    val sold = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val nParts = Catalog.load(spark, dir, "part")
      .agg(count(lit(1)).as("n_parts"))
    val unsold = Catalog.load(spark, dir, "part")
      .join(sold, col("p_partkey") === col("pk"), "left_anti")
      .agg(count(lit(1)).as("n_unsold"))
    // rank over the per-part aggregate via GlobalRank (no
    // single-partition window over the catalog); the frame size comes
    // back driver-side from the same pass, so the decile threshold
    // (n + 9) div 10 is the identical integer division as a literal
    val (ranked, nSold) = graft.ops.GlobalRank.withRowNumberAndTotal(
      sold, Seq(col("cents").desc, col("pk")), "rn")
    val shares = ranked.agg(
      count(lit(1)).as("n_sold"), sum(col("cents")).as("total_cents"),
      sum(when(col("rn") <= lit((nSold + 9) / 10), col("cents"))
        .otherwise(0L)).as("top_decile_cents"))
    shares.crossJoin(broadcast(nParts)).crossJoin(broadcast(unsold))
      .select(col("n_parts"), col("n_sold"), col("n_unsold"),
        (col("n_unsold").cast("double") / col("n_parts").cast("double"))
          .as("unsold_share"),
        (col("top_decile_cents").cast("double") / col("total_cents").cast("double"))
          .as("top_decile_revenue_share"))
  }

  private val catalogCoverageSql =
    """WITH sold AS (
      |  SELECT l_partkey AS pk,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM lineitem GROUP BY 1
      |), np AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_parts FROM part),
      |nu AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_unsold
      |  FROM part LEFT JOIN sold ON p_partkey = pk WHERE pk IS NULL
      |), r AS (
      |  SELECT cents,
      |    CAST(row_number() OVER (ORDER BY cents DESC, pk) AS BIGINT) AS rn,
      |    CAST(COUNT(*) OVER () AS BIGINT) AS n
      |  FROM sold
      |), s AS (
      |  SELECT CAST(COUNT(*) AS BIGINT) AS n_sold,
      |    CAST(SUM(cents) AS BIGINT) AS total_cents,
      |    CAST(SUM(CASE WHEN rn <= (n + 9) // 10 THEN cents ELSE 0 END)
      |      AS BIGINT) AS top_decile_cents
      |  FROM r
      |)
      |SELECT n_parts, n_sold, n_unsold,
      |  CAST(n_unsold AS DOUBLE) / CAST(n_parts AS DOUBLE) AS unsold_share,
      |  CAST(top_decile_cents AS DOUBLE) / CAST(total_cents AS DOUBLE)
      |    AS top_decile_revenue_share
      |FROM s, np, nu""".stripMargin

  // ---- Markov stationary distribution ----------------------------------

  /** Stationary distribution of the event-type transition chain by 10
    * unrolled power-iteration rounds in integer micro-units — "where do
    * user journeys spend their time in the limit". The transition
    * matrix is the exact per-type LEAD count table (5×5); each round is
    * π·P with BIGINT floor products; the tiny matrix rides broadcast
    * while the counting pass is the only corpus-sized work. */
  def markovStationary(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts"), col("event_id"))
    val trans = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("ts"), col("event_id"), col("event_type"))
      .withColumn("nxt", lead(col("event_type"), 1).over(w))
      .filter(col("nxt").isNotNull)
      .groupBy(col("event_type").as("src"), col("nxt").as("dst"))
      .agg(count(lit(1)).as("c"))
    val outTot = trans.groupBy(col("src")).agg(sum(col("c")).as("tot"))
    val p = trans.join(outTot, "src")
      .select(col("src"), col("dst"), col("c"), col("tot"))
      .localCheckpoint(eager = false)
    var pi = p.select(col("src").as("t")).distinct()
      .select(col("t"), lit(1000000L).as("m"))
    for (_ <- 1 to 10) {
      pi = p.join(pi, p("src") === pi("t"))
        .select(col("dst"), expr("m * c div tot").as("contrib"))
        .groupBy(col("dst")).agg(sum(col("contrib")).as("m"))
        .select(col("dst").as("t"), col("m"))
        .localCheckpoint(eager = false)
    }
    pi.select(col("t").as("event_type"), col("m").as("stationary_micro"),
        (col("m").cast("double") / 1000000L).as("stationary"))
      .orderBy(col("event_type"))
  }

  private val markovStationarySql = {
    def round(k: Int) =
      s"""pi$k AS (
         |  SELECT p.dst AS t, CAST(SUM(pi.m * p.c // p.tot) AS BIGINT) AS m
         |  FROM p JOIN pi${k - 1} pi ON p.src = pi.t
         |  GROUP BY p.dst
         |)""".stripMargin
    s"""WITH e AS (
       |  SELECT event_type AS src,
       |    lead(event_type) OVER (PARTITION BY user_id
       |      ORDER BY ts, event_id) AS dst
       |  FROM events
       |), trans AS (
       |  SELECT src, dst, CAST(COUNT(*) AS BIGINT) AS c
       |  FROM e WHERE dst IS NOT NULL GROUP BY 1, 2
       |), p AS (
       |  SELECT t.src, t.dst, t.c, o.tot
       |  FROM trans t JOIN (
       |    SELECT src, CAST(SUM(c) AS BIGINT) AS tot FROM trans GROUP BY 1) o
       |    ON t.src = o.src
       |), pi0 AS (
       |  SELECT DISTINCT src AS t, CAST(1000000 AS BIGINT) AS m FROM p
       |), ${(1 to 10).map(round).mkString(", ")}
       |SELECT t AS event_type, m AS stationary_micro,
       |  CAST(m AS DOUBLE) / 1000000 AS stationary
       |FROM pi10
       |ORDER BY event_type""".stripMargin
  }

  // ---- contingency residual anomalies ----------------------------------

  /** Standardized Pearson residuals (o−e)/√e for every cell of the
    * ISO-dow × event-type contingency table, flagging |r| ≥ 2 — which
    * weekday×type cells are anomalously hot or cold given both
    * marginals. Each residual is a per-cell scalar chain over exact
    * integer (o, row, col, n) — no cross-cell float accumulation, so
    * the whole table is engine-exact. One count aggregate + two
    * broadcast marginals. */
  def residualCells(spark: SparkSession, dir: String): DataFrame = {
    val cells = Catalog.load(spark, dir, "events")
      .groupBy(expr("CAST(weekday(ts) + 1 AS BIGINT)").as("isodow"),
        col("event_type"))
      .agg(count(lit(1)).as("o"))
    val rowTot = cells.groupBy(col("isodow")).agg(sum(col("o")).as("rt"))
    val colTot = cells.groupBy(col("event_type")).agg(sum(col("o")).as("ct"))
    val n = cells.agg(sum(col("o")).as("n"))
    cells.join(broadcast(rowTot), "isodow")
      .join(broadcast(colTot), "event_type")
      .crossJoin(broadcast(n))
      .withColumn("e",
        (col("rt") * col("ct")).cast("double") / col("n").cast("double"))
      .withColumn("residual", (col("o").cast("double") - col("e")) / sqrt(col("e")))
      .withColumn("anomalous", abs(col("residual")) >= 2.0)
      .select(col("isodow"), col("event_type"), col("o"), col("e"),
        col("residual"), col("anomalous"))
      .orderBy(col("isodow"), col("event_type"))
  }

  private val residualCellsSql =
    """WITH cells AS (
      |  SELECT CAST(isodow(ts) AS BIGINT) AS isodow, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS o
      |  FROM events GROUP BY 1, 2
      |), rt AS (
      |  SELECT isodow, CAST(SUM(o) AS BIGINT) AS rt FROM cells GROUP BY 1
      |), ct AS (
      |  SELECT event_type, CAST(SUM(o) AS BIGINT) AS ct FROM cells GROUP BY 1
      |), n AS (
      |  SELECT CAST(SUM(o) AS BIGINT) AS n FROM cells
      |)
      |SELECT c.isodow, c.event_type, c.o,
      |  CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE) AS e,
      |  (CAST(c.o AS DOUBLE) - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
      |    / sqrt(CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE)) AS residual,
      |  abs((CAST(c.o AS DOUBLE) - CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))
      |    / sqrt(CAST(rt.rt * ct.ct AS DOUBLE) / CAST(n.n AS DOUBLE))) >= 2.0
      |    AS anomalous
      |FROM cells c
      |JOIN rt ON c.isodow = rt.isodow
      |JOIN ct ON c.event_type = ct.event_type
      |CROSS JOIN n
      |ORDER BY c.isodow, c.event_type""".stripMargin

  // ---- basket size histogram -------------------------------------------

  /** Distribution of basket sizes (distinct parts per order) — the 1:N
    * multiplicity profile of the orders→lineitem relationship that
    * sizes every downstream pair join (q179/q318's fan-out is
    * C(size,2)/C(size,3)). Two stacked count aggregates. */
  def basketSizeHist(spark: SparkSession, dir: String): DataFrame =
    BasketFrames.items(spark, dir)
      .groupBy(col("ok"))
      .agg(count(lit(1)).as("basket_size")) // items is already distinct
      .groupBy(col("basket_size")).agg(count(lit(1)).as("n_orders"))
      .orderBy(col("basket_size"))

  private val basketSizeHistSql =
    """SELECT basket_size, CAST(COUNT(*) AS BIGINT) AS n_orders
      |FROM (SELECT l_orderkey,
      |        CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS basket_size
      |      FROM lineitem GROUP BY 1)
      |GROUP BY 1
      |ORDER BY basket_size""".stripMargin

  // ---- engagement depth vs conversion ----------------------------------

  /** Purchase rate by session depth bucket (1, 2-3, 4-7, 8+ events) —
    * the engagement curve that justifies (or kills) "drive more
    * pageviews" roadmaps. Sessions from the shared 30-min gap
    * sessionizer; depth buckets by integer thresholds; rate is the one
    * division. */
  def depthConversion(spark: SparkSession, dir: String): DataFrame = {
    val gap = graft.streaming.Streams.GapUs
    val w = Window.partitionBy(col("user_id")).orderBy(col("ts_us"), col("event_id"))
    val sessions = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev", lag(col("ts_us"), 1).over(w))
      .withColumn("session_seq",
        sum(when(col("prev").isNull || col("ts_us") - col("prev") >= gap, 1L)
          .otherwise(0L))
          .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col("user_id"), col("session_seq"))
      .agg(count(lit(1)).as("depth"),
        max(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("converted"))
    sessions
      .select(
        when(col("depth") === 1, "1").when(col("depth") <= 3, "2-3")
          .when(col("depth") <= 7, "4-7").otherwise("8+").as("depth_bucket"),
        col("converted"))
      .groupBy(col("depth_bucket"))
      .agg(count(lit(1)).as("n_sessions"), sum(col("converted")).as("n_converted"))
      .select(col("depth_bucket"), col("n_sessions"), col("n_converted"),
        (col("n_converted").cast("double") / col("n_sessions").cast("double"))
          .as("conversion_rate"))
      .orderBy(col("depth_bucket"))
  }

  private val depthConversionSql =
    s"""WITH e AS (
       |  SELECT user_id, event_id, event_type, epoch_us(ts) AS ts_us,
       |    lag(epoch_us(ts)) OVER (PARTITION BY user_id
       |      ORDER BY epoch_us(ts), event_id) AS prev
       |  FROM events
       |), marked AS (
       |  SELECT user_id, event_type, ts_us,
       |    SUM(CASE WHEN prev IS NULL OR ts_us - prev >= ${graft.streaming.Streams.GapUs}
       |        THEN 1 ELSE 0 END)
       |      OVER (PARTITION BY user_id ORDER BY ts_us, event_id
       |            ROWS UNBOUNDED PRECEDING) AS session_seq
       |  FROM e
       |), s AS (
       |  SELECT user_id, session_seq, CAST(COUNT(*) AS BIGINT) AS depth,
       |    MAX(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
       |      AS converted
       |  FROM marked GROUP BY 1, 2
       |), b AS (
       |  SELECT CASE WHEN depth = 1 THEN '1' WHEN depth <= 3 THEN '2-3'
       |    WHEN depth <= 7 THEN '4-7' ELSE '8+' END AS depth_bucket,
       |    converted
       |  FROM s
       |)
       |SELECT depth_bucket, CAST(COUNT(*) AS BIGINT) AS n_sessions,
       |  CAST(SUM(converted) AS BIGINT) AS n_converted,
       |  CAST(SUM(converted) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE)
       |    AS conversion_rate
       |FROM b
       |GROUP BY 1
       |ORDER BY depth_bucket""".stripMargin

  // ---- local-maximum peak days -----------------------------------------

  /** Daily-revenue peak detection: days strictly above every one of the
    * 3 days on each side (integer cent compares over two ROWS frames —
    * no floats, no thresholds to tune). The ops primitive behind "what
    * happened on the 14th". Only full 7-day neighborhoods qualify. */
  def peakDays(spark: SparkSession, dir: String): DataFrame = {
    val daily = Catalog.load(spark, dir, "orders")
      .groupBy(to_date(col("o_orderdate")).as("d"))
      .agg(sum(expr("CAST(round(o_totalprice * 100) AS BIGINT)")).as("cents"))
    val wAll = Window.orderBy(col("d"))
    val prev3 = wAll.rowsBetween(-3, -1)
    val next3 = wAll.rowsBetween(1, 3)
    daily
      .withColumn("pmax", max(col("cents")).over(prev3))
      .withColumn("nmax", max(col("cents")).over(next3))
      .withColumn("pn", count(lit(1)).over(prev3))
      .withColumn("nn", count(lit(1)).over(next3))
      .filter(col("pn") === 3 && col("nn") === 3 &&
        col("cents") > col("pmax") && col("cents") > col("nmax"))
      .select(col("d"), col("cents"), col("pmax"), col("nmax"))
      .orderBy(col("d"))
  }

  private val peakDaysSql =
    """WITH daily AS (
      |  SELECT CAST(o_orderdate AS DATE) AS d,
      |    CAST(SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT) AS cents
      |  FROM orders GROUP BY 1
      |), w AS (
      |  SELECT d, cents,
      |    MAX(cents) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
      |      AS pmax,
      |    MAX(cents) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
      |      AS nmax,
      |    COUNT(*) OVER (ORDER BY d ROWS BETWEEN 3 PRECEDING AND 1 PRECEDING)
      |      AS pn,
      |    COUNT(*) OVER (ORDER BY d ROWS BETWEEN 1 FOLLOWING AND 3 FOLLOWING)
      |      AS nn
      |  FROM daily
      |)
      |SELECT d, cents, pmax, nmax
      |FROM w
      |WHERE pn = 3 AND nn = 3 AND cents > pmax AND cents > nmax
      |ORDER BY d""".stripMargin

  // ---- weighted Jaccard between source vocabularies --------------------

  /** Weighted Jaccard Σmin(fᵢ)/Σmax(fᵢ) between every source pair's
    * term-frequency vectors — the frequency-aware twin of q264's set
    * Jaccard (two corpora can share every term yet have wildly
    * different emphasis). A FULL OUTER join per pair aligns
    * vocabularies (absent term = weight 0); all sums integer, one
    * division; the 20-source pair list is tiny next to the tf
    * aggregate it probes. */
  def weightedJaccard(spark: SparkSession, dir: String): DataFrame = {
    val tf = Catalog.load(spark, dir, "documents")
      .select(col("source"), explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("source"), col("term")).agg(count(lit(1)).as("f"))
      .localCheckpoint(eager = false)
    val a = tf.select(col("source").as("sa"), col("term"), col("f").as("fa"))
    val b = tf.select(col("source").as("sb"), col("term"), col("f").as("fb"))
    // one pair aggregate carries all four shared sums; Σmax then adds
    // each side's unshared mass: sum_shared_max + (tot_a − sha) + (tot_b − shb)
    val pairs = a.join(b, Seq("term"), "inner")
      .filter(col("sa") < col("sb"))
      .groupBy(col("sa"), col("sb"))
      .agg(sum(least(col("fa"), col("fb"))).as("sum_min"),
        sum(greatest(col("fa"), col("fb"))).as("sum_shared_max"),
        sum(col("fa")).as("sha"), sum(col("fb")).as("shb"))
    val tot = tf.groupBy(col("source")).agg(sum(col("f")).as("tot"))
    pairs
      .join(tot.select(col("source").as("sa"), col("tot").as("ta")), "sa")
      .join(tot.select(col("source").as("sb"), col("tot").as("tb")), "sb")
      .select(col("sa"), col("sb"), col("sum_min"),
        (col("sum_shared_max") + (col("ta") - col("sha")) + (col("tb") - col("shb")))
          .as("sum_max"))
      .withColumn("weighted_jaccard",
        col("sum_min").cast("double") / col("sum_max").cast("double"))
      .orderBy(col("weighted_jaccard").desc, col("sa"), col("sb"))
      .limit(20)
  }

  private val weightedJaccardSql =
    """WITH tf AS (
      |  SELECT source, term, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM (SELECT source, unnest(string_split(text, ' ')) AS term
      |        FROM documents)
      |  WHERE len(term) > 0
      |  GROUP BY 1, 2
      |), tot AS (
      |  SELECT source, CAST(SUM(f) AS BIGINT) AS tot FROM tf GROUP BY 1
      |), sh AS (
      |  SELECT a.source AS sa, b.source AS sb,
      |    CAST(SUM(LEAST(a.f, b.f)) AS BIGINT) AS sum_min,
      |    CAST(SUM(GREATEST(a.f, b.f)) AS BIGINT) AS sum_shared_max,
      |    CAST(SUM(a.f) AS BIGINT) AS sha, CAST(SUM(b.f) AS BIGINT) AS shb
      |  FROM tf a JOIN tf b ON a.term = b.term AND a.source < b.source
      |  GROUP BY 1, 2
      |)
      |SELECT sa, sb, sum_min,
      |  sum_shared_max + (ta.tot - sha) + (tb.tot - shb) AS sum_max,
      |  CAST(sum_min AS DOUBLE)
      |    / CAST(sum_shared_max + (ta.tot - sha) + (tb.tot - shb) AS DOUBLE)
      |    AS weighted_jaccard
      |FROM sh
      |JOIN tot ta ON sh.sa = ta.source
      |JOIN tot tb ON sh.sb = tb.source
      |ORDER BY weighted_jaccard DESC, sa, sb
      |LIMIT 20""".stripMargin

  // ---- telemetry double-fire audit -------------------------------------

  /** Rapid same-type repeats: the same user firing the same event type
    * again within one hour of the previous occurrence — the SDK
    * retry-bug / double-fire detector run before any engagement metric
    * is trusted (the 1h threshold matches the fixture's ~2 events/
    * user/day baseline; a production clickstream would use seconds).
    * One lag window inside the (user, type) partition; integer
    * microsecond compares; per-type rollup with the tightest gap. */
  def doubleFire(spark: SparkSession, dir: String): DataFrame = {
    val HourUs = 3600000000L
    val w = Window.partitionBy(col("user_id"), col("event_type"))
      .orderBy(col("ts_us"), col("event_id"))
    val flagged = Catalog.load(spark, dir, "events")
      .select(col("user_id"), col("event_id"), col("event_type"),
        unix_micros(col("ts")).as("ts_us"))
      .withColumn("prev_ts", lag(col("ts_us"), 1).over(w))
      .filter(col("prev_ts").isNotNull &&
        col("ts_us") - col("prev_ts") <= HourUs)
    flagged
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n_suspect"),
        countDistinct(col("user_id")).as("n_users"),
        min(col("ts_us") - col("prev_ts")).as("min_gap_us"))
      .orderBy(col("event_type"))
  }

  private val doubleFireSql =
    """WITH e AS (
      |  SELECT user_id, event_type, epoch_us(ts) AS ts_us,
      |    lag(epoch_us(ts)) OVER w AS prev_ts
      |  FROM events
      |  WINDOW w AS (PARTITION BY user_id, event_type
      |    ORDER BY epoch_us(ts), event_id)
      |)
      |SELECT event_type, CAST(COUNT(*) AS BIGINT) AS n_suspect,
      |  CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
      |  CAST(MIN(ts_us - prev_ts) AS BIGINT) AS min_gap_us
      |FROM e
      |WHERE prev_ts IS NOT NULL AND ts_us - prev_ts <= 3600000000
      |GROUP BY event_type
      |ORDER BY event_type""".stripMargin

  // ---- prefix uniqueness depth -----------------------------------------

  /** Share of documents uniquely identified by their first k tokens for
    * k ∈ {3, 5, 10, 20} — how long a dedup/blocking key must be before
    * it separates the corpus (the flip side of q320's prefix-collision
    * audit). One tokenize pass, four conditional group keys from the
    * same array, exact counts. */
  def prefixUniqueness(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.load(spark, dir, "documents")
      .select(col("doc_id"), split(col("text"), " ").as("t"))
      .localCheckpoint(eager = false)
    val total = docs.agg(count(lit(1)).as("n_docs"))
    def level(k: Int): DataFrame =
      docs.groupBy(array_join(slice(col("t"), 1, k), " ").as("p"))
        .agg(count(lit(1)).as("c"))
        .agg(sum(when(col("c") === 1, 1L).otherwise(0L)).as("n_unique"))
        .select(lit(k.toLong).as("k"), col("n_unique"))
    Seq(3, 5, 10, 20).map(level).reduce(_.unionAll(_))
      .crossJoin(broadcast(total))
      .select(col("k"), col("n_unique"), col("n_docs"),
        (col("n_unique").cast("double") / col("n_docs").cast("double"))
          .as("unique_share"))
      .orderBy(col("k"))
  }

  private val prefixUniquenessSql = {
    def level(k: Int) =
      s"""SELECT CAST($k AS BIGINT) AS k,
         |  (SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
         |   FROM (SELECT array_to_string(string_split(text, ' ')[1:$k], ' ') AS p,
         |           COUNT(*) AS c
         |         FROM documents GROUP BY 1)) AS n_unique""".stripMargin
    s"""WITH n AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents),
       |levels AS (
       |${Seq(3, 5, 10, 20).map(level).mkString("", "\nUNION ALL\n", "")}
       |)
       |SELECT k, n_unique, n_docs,
       |  CAST(n_unique AS DOUBLE) / CAST(n_docs AS DOUBLE) AS unique_share
       |FROM levels, n
       |ORDER BY k""".stripMargin
  }

  // ---- lagged cross-correlation ----------------------------------------

  /** Pearson cross-correlation between daily NON-purchase activity
    * counts and daily PURCHASE value at lags −3…+3 days — "does
    * browsing lead spend" (both series from the event stream; the
    * orders table lives on a disjoint 1990s calendar). The lag join
    * aligns the two daily series (calendar-sized); all five moment
    * sums per lag are exact BIGINTs from one aggregate; each
    * correlation is the closed form with two sqrts and one division. */
  def laggedXcorr(spark: SparkSession, dir: String): DataFrame = {
    val e = Catalog.load(spark, dir, "events")
    val ev = e.filter(col("event_type") =!= "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(count(lit(1)).as("x"))
    val rev = e.filter(col("event_type") === "purchase")
      .groupBy(to_date(col("ts")).as("d"))
      .agg(sum(expr("CAST(round(value * 100) AS BIGINT)")).as("y"))
    val lags = spark.range(-3, 4).select(col("id").as("lag"))
    val joined = ev.crossJoin(broadcast(lags))
      .select(col("lag"), expr("date_add(d, CAST(lag AS INT))").as("d"), col("x"))
      .join(rev, Seq("d"))
    joined.groupBy(col("lag"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("y") * col("y")).as("syy"),
        sum(col("x") * col("y")).as("sxy"))
      .select(col("lag"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (sqrt((col("n") * col("sxx") - col("sx") * col("sx")).cast("double")) *
            sqrt((col("n") * col("syy") - col("sy") * col("sy")).cast("double"))))
          .as("xcorr"))
      .orderBy(col("lag"))
  }

  private val laggedXcorrSql =
    """WITH ev AS (
      |  SELECT CAST(ts AS DATE) AS d, CAST(COUNT(*) AS BIGINT) AS x
      |  FROM events WHERE event_type <> 'purchase' GROUP BY 1
      |), rev AS (
      |  SELECT CAST(ts AS DATE) AS d,
      |    CAST(SUM(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
      |  FROM events WHERE event_type = 'purchase' GROUP BY 1
      |), lags AS (
      |  SELECT CAST(l AS BIGINT) AS lag
      |  FROM (VALUES (-3), (-2), (-1), (0), (1), (2), (3)) AS v(l)
      |), j AS (
      |  SELECT lags.lag, ev.x, rev.y
      |  FROM ev CROSS JOIN lags
      |  JOIN rev ON rev.d = ev.d + CAST(lags.lag AS INT)
      |), m AS (
      |  SELECT lag, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(y * y) AS BIGINT) AS syy,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM j GROUP BY 1
      |)
      |SELECT lag, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / (sqrt(CAST(n * sxx - sx * sx AS DOUBLE))
      |       * sqrt(CAST(n * syy - sy * sy AS DOUBLE))) AS xcorr
      |FROM m
      |ORDER BY lag""".stripMargin

  // ---- language purity per source --------------------------------------

  /** Majority-language share per source — the labeling-consistency
    * audit: a source whose top language holds <90% of docs is either
    * genuinely multilingual or mislabeled upstream. One (source, lang)
    * count, per-source max via a WindowGroupLimit-prunable top-1, one
    * division. */
  def langPurity(spark: SparkSession, dir: String): DataFrame = {
    val sl = Catalog.load(spark, dir, "documents")
      .groupBy(col("source"), col("lang")).agg(count(lit(1)).as("c"))
    val w = Window.partitionBy(col("source"))
      .orderBy(col("c").desc, col("lang"))
    val tot = sl.groupBy(col("source")).agg(sum(col("c")).as("n_docs"),
      count(lit(1)).as("n_langs"))
    sl.withColumn("rn", row_number().over(w)).filter(col("rn") === 1)
      .select(col("source"), col("lang").as("majority_lang"), col("c").as("majority_docs"))
      .join(tot, "source")
      .select(col("source"), col("n_docs"), col("n_langs"),
        col("majority_lang"), col("majority_docs"),
        (col("majority_docs").cast("double") / col("n_docs").cast("double"))
          .as("purity"))
      .orderBy(col("source"))
  }

  private val langPuritySql =
    """WITH sl AS (
      |  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS c
      |  FROM documents GROUP BY 1, 2
      |), top AS (
      |  SELECT source, lang AS majority_lang, c AS majority_docs
      |  FROM (SELECT *, row_number() OVER (PARTITION BY source
      |          ORDER BY c DESC, lang) AS rn FROM sl)
      |  WHERE rn = 1
      |), tot AS (
      |  SELECT source, CAST(SUM(c) AS BIGINT) AS n_docs,
      |    CAST(COUNT(*) AS BIGINT) AS n_langs
      |  FROM sl GROUP BY 1
      |)
      |SELECT t.source, tot.n_docs, tot.n_langs, t.majority_lang,
      |  t.majority_docs,
      |  CAST(t.majority_docs AS DOUBLE) / CAST(tot.n_docs AS DOUBLE) AS purity
      |FROM top t JOIN tot ON t.source = tot.source
      |ORDER BY t.source""".stripMargin

  // ---- L-scale (second L-moment) ---------------------------------------

  /** L-scale (second L-moment) of order value per priority — the
    * order-statistics dispersion measure that is robust like MAD but
    * linear in the sorted sample: λ₂ = Σᵢ(2i−n−1)·x₍ᵢ₎ / (n(n−1)).
    * The weighted sum is EXACT integer cents × integer rank weights;
    * one division at the end. One rank window per segment. */
  def lScale(spark: SparkSession, dir: String): DataFrame = {
    val o = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
    val w = Window.partitionBy(col("segment"))
      .orderBy(col("cents"), col("o_orderkey"))
    o.withColumn("i", row_number().over(w).cast("long"))
      .withColumn("n", count(lit(1)).over(Window.partitionBy(col("segment"))))
      .groupBy(col("segment"))
      .agg(max(col("n")).as("n"),
        sum((lit(2L) * col("i") - col("n") - 1L) * col("cents")).as("wsum"))
      .select(col("segment"), col("n"),
        (col("wsum").cast("double") /
          (col("n") * (col("n") - 1L)).cast("double") / 100.0)
          .as("l_scale"))
      .orderBy(col("segment"))
  }

  private val lScaleSql =
    """WITH o AS (
      |  SELECT o_orderpriority AS segment, o_orderkey,
      |    CAST(round(o_totalprice * 100) AS BIGINT) AS cents
      |  FROM orders
      |), r AS (
      |  SELECT segment, cents,
      |    CAST(row_number() OVER (PARTITION BY segment
      |      ORDER BY cents, o_orderkey) AS BIGINT) AS i,
      |    CAST(COUNT(*) OVER (PARTITION BY segment) AS BIGINT) AS n
      |  FROM o
      |)
      |SELECT segment, CAST(MAX(n) AS BIGINT) AS n,
      |  CAST(SUM((2 * i - n - 1) * cents) AS DOUBLE)
      |    / CAST(MAX(n) * (MAX(n) - 1) AS DOUBLE) / 100.0 AS l_scale
      |FROM r
      |GROUP BY segment
      |ORDER BY segment""".stripMargin

  // ---- output file sizing advisor --------------------------------------

  /** Write-planning advisor for the documents table: estimated mean row
    * payload (text + fixed column overhead) and the rows-per-file that
    * hits a 128 MB target — the number every partitioned writer needs
    * before `repartition(n)`. Exact byte sums (length() is exact), one
    * floor division mirrored on both engines. */
  def fileSizing(spark: SparkSession, dir: String): DataFrame = {
    val FixedOverhead = 64L // ids + lang/source + offsets, per row
    val Target = 128L * 1024 * 1024
    Catalog.load(spark, dir, "documents")
      .agg(count(lit(1)).as("n_docs"),
        sum(length(col("text")).cast("long") + FixedOverhead).as("est_bytes"))
      .select(col("n_docs"), col("est_bytes"),
        expr("est_bytes div n_docs").as("bytes_per_row"),
        expr(s"CAST($Target AS BIGINT) div (est_bytes div n_docs)")
          .as("rows_per_128mb"))
  }

  private val fileSizingSql =
    """SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
      |  CAST(SUM(length(text) + 64) AS BIGINT) AS est_bytes,
      |  CAST(SUM(length(text) + 64) AS BIGINT) // COUNT(*) AS bytes_per_row,
      |  CAST(134217728 AS BIGINT)
      |    // (CAST(SUM(length(text) + 64) AS BIGINT) // COUNT(*))
      |    AS rows_per_128mb
      |FROM documents""".stripMargin

  // ---- Poisson count-change significance -------------------------------

  /** Week-over-week order-count change per priority with the Poisson
    * two-count z-score (c₂−c₁)/√(c₁+c₂) for the LAST two complete
    * ISO weeks — "is this drop real or noise" for count metrics where
    * a t-test has no per-unit variance to use. Counts exact; one
    * subtraction, one sqrt, one division per row. */
  def countChangeZ(spark: SparkSession, dir: String): DataFrame = {
    val byWeek = Catalog.load(spark, dir, "orders")
      .select(col("o_orderpriority").as("segment"),
        expr("CAST(unix_date(CAST(date_trunc('WEEK', o_orderdate) AS DATE)) AS BIGINT)")
          .as("wk"))
      .groupBy(col("segment"), col("wk")).agg(count(lit(1)).as("c"))
    val lastW = byWeek.agg(max(col("wk")).as("maxw"))
      .select((col("maxw") - 7).as("w1"), col("maxw").as("w2"))
    byWeek.crossJoin(broadcast(lastW))
      .filter(col("wk") === col("w1") || col("wk") === col("w2"))
      .groupBy(col("segment"))
      .agg(sum(when(col("wk") === col("w1"), col("c")).otherwise(0L)).as("c1"),
        sum(when(col("wk") === col("w2"), col("c")).otherwise(0L)).as("c2"))
      .select(col("segment"), col("c1"), col("c2"),
        ((col("c2") - col("c1")).cast("double") /
          sqrt((col("c1") + col("c2")).cast("double"))).as("z"))
      .orderBy(col("segment"))
  }

  private val countChangeZSql =
    """WITH bw AS (
      |  SELECT o_orderpriority AS segment,
      |    CAST(date_trunc('week', CAST(o_orderdate AS DATE))
      |      - DATE '1970-01-01' AS BIGINT) AS wk,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM orders GROUP BY 1, 2
      |), lw AS (
      |  SELECT MAX(wk) - 7 AS w1, MAX(wk) AS w2 FROM bw
      |), s AS (
      |  SELECT segment,
      |    CAST(SUM(CASE WHEN wk = w1 THEN c ELSE 0 END) AS BIGINT) AS c1,
      |    CAST(SUM(CASE WHEN wk = w2 THEN c ELSE 0 END) AS BIGINT) AS c2
      |  FROM bw, lw
      |  WHERE wk = w1 OR wk = w2
      |  GROUP BY segment
      |)
      |SELECT segment, c1, c2,
      |  CAST(c2 - c1 AS DOUBLE) / sqrt(CAST(c1 + c2 AS DOUBLE)) AS z
      |FROM s
      |ORDER BY segment""".stripMargin

  // ---- customer lifecycle: value by order sequence ---------------------

  /** Mean order value by the customer's order sequence number (1st,
    * 2nd, 3rd, 4th, 5th+) — "do repeat customers spend more". One rank
    * window per customer (date-ordered, keyed tiebreak), integer cents,
    * one division per bucket. */
  def orderSeqValue(spark: SparkSession, dir: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    Catalog.load(spark, dir, "orders")
      .select(col("o_custkey"), col("o_orderdate"), col("o_orderkey"),
        expr("CAST(round(o_totalprice * 100) AS BIGINT)").as("cents"))
      .withColumn("seq", row_number().over(w))
      .select(when(col("seq") >= 5, "5+").otherwise(col("seq").cast("string"))
        .as("order_seq"), col("cents"))
      .groupBy(col("order_seq"))
      .agg(count(lit(1)).as("n_orders"), sum(col("cents")).as("sum_cents"))
      .select(col("order_seq"), col("n_orders"),
        (col("sum_cents").cast("double") / col("n_orders").cast("double") / 100.0)
          .as("mean_value"))
      .orderBy(col("order_seq"))
  }

  private val orderSeqValueSql =
    """WITH r AS (
      |  SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
      |    row_number() OVER (PARTITION BY o_custkey
      |      ORDER BY o_orderdate, o_orderkey) AS seq
      |  FROM orders
      |), b AS (
      |  SELECT CASE WHEN seq >= 5 THEN '5+' ELSE CAST(seq AS VARCHAR) END
      |    AS order_seq, cents
      |  FROM r
      |)
      |SELECT order_seq, CAST(COUNT(*) AS BIGINT) AS n_orders,
      |  CAST(SUM(cents) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) / 100.0
      |    AS mean_value
      |FROM b
      |GROUP BY 1
      |ORDER BY order_seq""".stripMargin

  // ---- brand cross-shopping overlap ------------------------------------

  /** Top-20 brand pairs by customer-set Jaccard — which brands share
    * shoppers (q322's supplier projection, normalized so big brands
    * don't dominate). Distinct (customer, brand) edges, pair equi-join
    * on customer, exact |∩| and marginals, rational Jaccard with one
    * division. */
  def brandOverlap(spark: SparkSession, dir: String): DataFrame = {
    val cb = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .join(Catalog.load(spark, dir, "part"),
        col("l_partkey") === col("p_partkey"))
      .select(col("o_custkey").as("c"), col("p_brand").as("b"))
      .distinct()
      .localCheckpoint(eager = false)
    val marg = cb.groupBy(col("b")).agg(count(lit(1)).as("nb"))
    val pairs = cb.select(col("c"), col("b").as("b1"))
      .join(cb.select(col("c"), col("b").as("b2")), "c")
      .filter(col("b1") < col("b2"))
      .groupBy(col("b1"), col("b2")).agg(count(lit(1)).as("n_both"))
    pairs
      .join(marg.select(col("b").as("b1"), col("nb").as("n1")), "b1")
      .join(marg.select(col("b").as("b2"), col("nb").as("n2")), "b2")
      .select(col("b1"), col("b2"), col("n_both"),
        (col("n_both").cast("double") /
          (col("n1") + col("n2") - col("n_both")).cast("double")).as("jaccard"))
      .orderBy(col("jaccard").desc, col("b1"), col("b2"))
      .limit(20)
  }

  private val brandOverlapSql =
    """WITH cb AS (
      |  SELECT DISTINCT o_custkey AS c, p_brand AS b
      |  FROM orders
      |  JOIN lineitem ON o_orderkey = l_orderkey
      |  JOIN part ON l_partkey = p_partkey
      |), marg AS (
      |  SELECT b, CAST(COUNT(*) AS BIGINT) AS nb FROM cb GROUP BY 1
      |), pairs AS (
      |  SELECT x.b AS b1, y.b AS b2, CAST(COUNT(*) AS BIGINT) AS n_both
      |  FROM cb x JOIN cb y ON x.c = y.c AND x.b < y.b
      |  GROUP BY 1, 2
      |)
      |SELECT b1, b2, n_both,
      |  CAST(n_both AS DOUBLE) / CAST(m1.nb + m2.nb - n_both AS DOUBLE) AS jaccard
      |FROM pairs
      |JOIN marg m1 ON b1 = m1.b
      |JOIN marg m2 ON b2 = m2.b
      |ORDER BY jaccard DESC, b1, b2
      |LIMIT 20""".stripMargin

  // ---- weekly top-k churn ----------------------------------------------

  /** Week-over-week churn of the top-10 parts by revenue: per week, how
    * many of the current top-10 were in the previous week's top-10 —
    * the watchlist-stability report. Per-week top-10 via a
    * WindowGroupLimit-prunable rank, then a self-equi-join on
    * (previous week, part). The per-week top-k size is derived from the
    * data (a thin week can rank fewer than 10 parts), and weeks with
    * zero stable parts still appear (left join, stable=0) — not the
    * hardcoded /10 that inflates churn on short weeks. Integer counts,
    * one share division. */
  /** Pre-checkpoint per-week top-10 frame — split out so PlanSpec can
    * pin the WindowGroupLimit prune (the checkpoint in [[topkChurn]]
    * hides the producing plan behind a LogicalRDD scan). */
  private[graft] def topkChurnRanked(spark: SparkSession, dir: String): DataFrame = {
    val wk = Catalog.load(spark, dir, "orders")
      .join(Catalog.load(spark, dir, "lineitem"),
        col("o_orderkey") === col("l_orderkey"))
      .groupBy(
        expr("CAST(unix_date(CAST(date_trunc('WEEK', o_orderdate) AS DATE)) AS BIGINT)")
          .as("wk"),
        col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val w = Window.partitionBy(col("wk")).orderBy(col("cents").desc, col("pk"))
    wk.withColumn("rn", row_number().over(w)).filter(col("rn") <= 10)
      .select(col("wk"), col("pk"))
  }

  def topkChurn(spark: SparkSession, dir: String): DataFrame = {
    // three consumers (sized / prev / stable) — checkpoint or the
    // join+agg+window pass re-executes per consumer
    val top = topkChurnRanked(spark, dir).localCheckpoint(eager = false)
    val sized = top.groupBy(col("wk")).agg(count(lit(1)).as("k_size"))
    val prev = top.select((col("wk") + 7).as("wk"), col("pk"))
    val st = top.join(prev, Seq("wk", "pk"), "left_semi")
      .groupBy(col("wk")).agg(count(lit(1)).as("st"))
    sized.join(st, Seq("wk"), "left")
      .select(col("wk"), col("k_size"),
        coalesce(col("st"), lit(0L)).as("stable"),
        (col("k_size") - coalesce(col("st"), lit(0L))).as("new_entries"),
        (coalesce(col("st"), lit(0L)).cast("double") /
          col("k_size").cast("double")).as("stability"))
      .orderBy(col("wk"))
  }

  private val topkChurnSql =
    """WITH wk AS (
      |  SELECT CAST(date_trunc('week', CAST(o_orderdate AS DATE))
      |      - DATE '1970-01-01' AS BIGINT) AS wk,
      |    l_partkey AS pk,
      |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
      |      AS cents
      |  FROM orders JOIN lineitem ON o_orderkey = l_orderkey
      |  GROUP BY 1, 2
      |), top AS (
      |  SELECT wk, pk FROM (
      |    SELECT wk, pk, row_number() OVER (PARTITION BY wk
      |      ORDER BY cents DESC, pk) AS rn FROM wk)
      |  WHERE rn <= 10
      |), sized AS (
      |  SELECT wk, CAST(COUNT(*) AS BIGINT) AS k_size FROM top GROUP BY wk
      |), st AS (
      |  SELECT t.wk, CAST(COUNT(*) AS BIGINT) AS st
      |  FROM top t
      |  WHERE EXISTS (SELECT 1 FROM top p
      |                WHERE p.wk + 7 = t.wk AND p.pk = t.pk)
      |  GROUP BY t.wk
      |)
      |SELECT s.wk, s.k_size,
      |  COALESCE(st.st, CAST(0 AS BIGINT)) AS stable,
      |  s.k_size - COALESCE(st.st, CAST(0 AS BIGINT)) AS new_entries,
      |  CAST(COALESCE(st.st, CAST(0 AS BIGINT)) AS DOUBLE)
      |    / CAST(s.k_size AS DOUBLE) AS stability
      |FROM sized s LEFT JOIN st ON s.wk = st.wk
      |ORDER BY s.wk""".stripMargin

  // ---- revenue Pareto targets ------------------------------------------

  /** How many top parts cover 50 / 80 / 95 % of revenue — the SKU-count
    * Pareto planner (q272's vocabulary twin, on money). Parts ranked by
    * exact cents with a cumulative window; the target rank is the MIN
    * rank whose cumulative share clears the target, compared by exact
    * integer cross-multiplication (cum·100 ≥ target·total — no float
    * thresholds). */
  def revenuePareto(spark: SparkSession, dir: String): DataFrame = {
    val parts = Catalog.load(spark, dir, "lineitem")
      .groupBy(col("l_partkey").as("pk"))
      .agg(sum(expr("CAST(round(l_extendedprice * 100) AS BIGINT)")).as("cents"))
    val w = Window.orderBy(col("cents").desc, col("pk"))
    val ranked = parts
      .withColumn("rn", row_number().over(w).cast("long"))
      .withColumn("cum", sum(col("cents"))
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .crossJoin(broadcast(parts.agg(sum(col("cents")).as("total"),
        count(lit(1)).as("n_parts"))))
      .localCheckpoint(eager = false)
    def target(t: Int): DataFrame =
      ranked.filter(col("cum") * 100 >= lit(t.toLong) * col("total"))
        .agg(min(col("rn")).as("parts_needed"), max(col("n_parts")).as("n_parts"))
        .select(lit(t.toLong).as("target_pct"), col("parts_needed"), col("n_parts"),
          (col("parts_needed").cast("double") / col("n_parts").cast("double"))
            .as("parts_share"))
    Seq(50, 80, 95).map(target).reduce(_.unionAll(_)).orderBy(col("target_pct"))
  }

  private val revenueParetoSql = {
    def target(t: Int) =
      s"""SELECT CAST($t AS BIGINT) AS target_pct,
         |  (SELECT MIN(rn) FROM ranked WHERE cum * 100 >= $t * total)
         |    AS parts_needed,
         |  (SELECT MAX(n_parts) FROM ranked) AS n_parts,
         |  CAST((SELECT MIN(rn) FROM ranked WHERE cum * 100 >= $t * total)
         |    AS DOUBLE) / (SELECT MAX(n_parts) FROM ranked) AS parts_share""".stripMargin
    s"""WITH parts AS (
       |  SELECT l_partkey AS pk,
       |    CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
       |      AS cents
       |  FROM lineitem GROUP BY 1
       |), ranked AS (
       |  SELECT CAST(row_number() OVER (ORDER BY cents DESC, pk) AS BIGINT) AS rn,
       |    CAST(SUM(cents) OVER (ORDER BY cents DESC, pk
       |      ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
       |    CAST(SUM(cents) OVER () AS BIGINT) AS total,
       |    CAST(COUNT(*) OVER () AS BIGINT) AS n_parts
       |  FROM parts
       |)
       |${Seq(50, 80, 95).map(target).mkString("\nUNION ALL\n")}
       |ORDER BY target_pct""".stripMargin
  }

  // ---- grouped OLS: discount→quantity slope per brand ------------------

  /** Per-brand OLS slope of quantity on discount — "which brands'
    * volumes actually respond to discounting", the grouped-regression
    * primitive (one regression PER GROUP, not one global fit like
    * q228). x = discount basis points, y = integral quantity; the five
    * moment sums per brand are exact BIGINTs from one aggregate; slope
    * is the closed form with one division. Top-10 most elastic. */
  def groupedOls(spark: SparkSession, dir: String): DataFrame = {
    val li = Catalog.load(spark, dir, "lineitem")
      .join(Catalog.load(spark, dir, "part"), col("l_partkey") === col("p_partkey"))
      .select(col("p_brand").as("brand"),
        expr("CAST(round(l_discount * 10000) AS BIGINT)").as("x"),
        expr("CAST(round(l_quantity) AS BIGINT)").as("y"))
    li.groupBy(col("brand"))
      .agg(count(lit(1)).as("n"),
        sum(col("x")).as("sx"), sum(col("y")).as("sy"),
        sum(col("x") * col("x")).as("sxx"),
        sum(col("x") * col("y")).as("sxy"))
      .filter(col("n") * col("sxx") - col("sx") * col("sx") =!= 0)
      .select(col("brand"), col("n"),
        ((col("n") * col("sxy") - col("sx") * col("sy")).cast("double") /
          (col("n") * col("sxx") - col("sx") * col("sx")).cast("double"))
          .as("slope_qty_per_bp"))
      .orderBy(abs(col("slope_qty_per_bp")).desc, col("brand"))
      .limit(10)
  }

  private val groupedOlsSql =
    """WITH li AS (
      |  SELECT p_brand AS brand,
      |    CAST(round(l_discount * 10000) AS BIGINT) AS x,
      |    CAST(round(l_quantity) AS BIGINT) AS y
      |  FROM lineitem JOIN part ON l_partkey = p_partkey
      |), m AS (
      |  SELECT brand, CAST(COUNT(*) AS BIGINT) AS n,
      |    CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
      |    CAST(SUM(x * x) AS BIGINT) AS sxx,
      |    CAST(SUM(x * y) AS BIGINT) AS sxy
      |  FROM li GROUP BY 1
      |)
      |SELECT brand, n,
      |  CAST(n * sxy - sx * sy AS DOUBLE)
      |    / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_qty_per_bp
      |FROM m
      |WHERE n * sxx - sx * sx <> 0
      |ORDER BY abs(CAST(n * sxy - sx * sy AS DOUBLE)
      |  / CAST(n * sxx - sx * sx AS DOUBLE)) DESC, brand
      |LIMIT 10""".stripMargin

  // ---- near-dup contamination across sources ---------------------------

  /** Share of 0.5-Jaccard near-dup pairs that CROSS source boundaries —
    * the near-dup face of q281's exact cross-source audit (syndicated /
    * scraped content shows up here long before byte-exact mirrors do).
    * Pairs from the shared df-capped machinery, one source join per
    * endpoint, integer counts, one division. */
  def crossSourceNearDup(spark: SparkSession, dir: String): DataFrame = {
    val docs = Catalog.load(spark, dir, "documents")
    val src = docs.select(col("doc_id"), col("source"))
    val pairs = graft.ops.DedupOps.jaccardPairs(docs, n = 5, threshold = 0.5)
    pairs
      .join(src.select(col("doc_id").as("doc_a"), col("source").as("sa")), "doc_a")
      .join(src.select(col("doc_id").as("doc_b"), col("source").as("sb")), "doc_b")
      .agg(count(lit(1)).as("n_pairs"),
        sum(when(col("sa") =!= col("sb"), 1L).otherwise(0L)).as("n_cross"))
      .select(col("n_pairs"), col("n_cross"),
        (col("n_cross").cast("double") / col("n_pairs").cast("double"))
          .as("cross_source_share"))
  }

  // Same df-cap mirror as jaccardSweepSql: candidates need ≥1 shingle
  // with df ≤ 1000 (DedupOps.DefaultMaxDf); |∩| over full sets.
  private val crossSourceNearDupSql =
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
      |  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_sh FROM sh GROUP BY 1
      |), common AS (
      |  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      |  GROUP BY 1, 2
      |), pairs AS (
      |  SELECT doc_a, doc_b FROM common
      |  JOIN cand USING (doc_a, doc_b)
      |  JOIN card x ON doc_a = x.doc_id
      |  JOIN card y ON doc_b = y.doc_id
      |  WHERE CAST(c AS DOUBLE) / (x.n_sh + y.n_sh - c) >= 0.5
      |)
      |SELECT CAST(COUNT(*) AS BIGINT) AS n_pairs,
      |  CAST(SUM(CASE WHEN da.source <> db.source THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_cross,
      |  CAST(SUM(CASE WHEN da.source <> db.source THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS cross_source_share
      |FROM pairs
      |JOIN documents da ON doc_a = da.doc_id
      |JOIN documents db ON doc_b = db.doc_id""".stripMargin

  // ---- hourly conversion profile ---------------------------------------

  /** Purchase share of events by hour of day — the diurnal conversion
    * profile behind send-time optimization. One scan, 24-row aggregate,
    * one division per row. */
  def hourlyConversion(spark: SparkSession, dir: String): DataFrame =
    Catalog.load(spark, dir, "events")
      .groupBy(hour(col("ts")).cast("long").as("hr"))
      .agg(count(lit(1)).as("n_events"),
        sum(when(col("event_type") === "purchase", 1L).otherwise(0L))
          .as("n_purchases"))
      .select(col("hr"), col("n_events"), col("n_purchases"),
        (col("n_purchases").cast("double") / col("n_events").cast("double"))
          .as("purchase_share"))
      .orderBy(col("hr"))

  private val hourlyConversionSql =
    """SELECT CAST(hour(ts) AS BIGINT) AS hr,
      |  CAST(COUNT(*) AS BIGINT) AS n_events,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS BIGINT) AS n_purchases,
      |  CAST(SUM(CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END)
      |    AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS purchase_share
      |FROM events
      |GROUP BY 1
      |ORDER BY hr""".stripMargin

  // ---- language-model context fanout -----------------------------------

  /** Most ambiguous 2-token contexts: distinct continuations and
    * continuation count per bigram prefix, top-20 by fanout — the
    * branching-factor profile that predicts where an n-gram LM (or a
    * speculative decoder) will be uncertain. Window-free: one shingle
    * pass builds (w1 w2 → w3) triples, two stacked aggregates. */
  def contextFanout(spark: SparkSession, dir: String): DataFrame = {
    val tri = Catalog.load(spark, dir, "documents")
      .select(split(col("text"), " ").as("t"))
      // guard BEFORE sequence(): Spark's sequence(1, 0) counts DOWN
      .filter(size(col("t")) >= 3)
      .select(explode(expr(
        "transform(sequence(1, size(t) - 2), " +
          "i -> struct(concat_ws(' ', t[i-1], t[i]) AS ctx, t[i+1] AS nxt))"))
        .as("g"))
      .select(col("g.ctx"), col("g.nxt"))
    tri.groupBy(col("ctx"))
      .agg(countDistinct(col("nxt")).as("fanout"),
        count(lit(1)).as("occurrences"))
      .orderBy(col("fanout").desc, col("occurrences").desc, col("ctx"))
      .limit(20)
  }

  private val contextFanoutSql =
    """WITH toks AS (
      |  SELECT string_split(text, ' ') AS t FROM documents
      |), tri AS (
      |  SELECT t[i] || ' ' || t[i+1] AS ctx, t[i+2] AS nxt
      |  FROM toks, unnest(range(1, greatest(len(t) - 1, 1))) AS u(i)
      |)
      |SELECT ctx, CAST(COUNT(DISTINCT nxt) AS BIGINT) AS fanout,
      |  CAST(COUNT(*) AS BIGINT) AS occurrences
      |FROM tri
      |GROUP BY 1
      |ORDER BY fanout DESC, occurrences DESC, ctx
      |LIMIT 20""".stripMargin

  // ---- Zipf constancy check --------------------------------------------

  /** rank×frequency for the top-20 corpus terms — Zipf's law predicts a
    * near-constant product; a systematic drift flags templated or
    * synthetic text. Exact integer products over the ranked term
    * counts; the transcendental-free version of a log-log slope fit. */
  def zipfCheck(spark: SparkSession, dir: String): DataFrame = {
    val tf = Catalog.load(spark, dir, "documents")
      .select(explode(split(col("text"), " ")).as("term"))
      .filter(length(col("term")) > 0)
      .groupBy(col("term")).agg(count(lit(1)).as("f"))
    val w = Window.orderBy(col("f").desc, col("term"))
    tf.withColumn("rank", row_number().over(w).cast("long"))
      .filter(col("rank") <= 20)
      .select(col("rank"), col("term"), col("f"),
        (col("rank") * col("f")).as("rank_freq"))
      .orderBy(col("rank"))
  }

  private val zipfCheckSql =
    """WITH tf AS (
      |  SELECT term, CAST(COUNT(*) AS BIGINT) AS f
      |  FROM (SELECT unnest(string_split(text, ' ')) AS term FROM documents)
      |  WHERE len(term) > 0
      |  GROUP BY 1
      |), r AS (
      |  SELECT term, f,
      |    CAST(row_number() OVER (ORDER BY f DESC, term) AS BIGINT) AS rank
      |  FROM tf
      |)
      |SELECT rank, term, f, rank * f AS rank_freq
      |FROM r
      |WHERE rank <= 20
      |ORDER BY rank""".stripMargin

  // ---- daily behavioural diversity -------------------------------------

  /** Effective number of event types per day (inverse Simpson n²/Σc²,
    * q309's rational diversity applied to the daily mix) — a collapsing
    * value flags days where one event type (an error storm, a bot
    * flood) drowned the mix. One (day, type) aggregate, one daily
    * rollup, one division. */
  def dailyDiversity(spark: SparkSession, dir: String): DataFrame = {
    val perType = Catalog.load(spark, dir, "events")
      .groupBy(to_date(col("ts")).as("d"), col("event_type"))
      .agg(count(lit(1)).as("c"))
    perType.groupBy(col("d"))
      .agg(sum(col("c")).as("n"), count(lit(1)).as("types"),
        sum(col("c") * col("c")).as("sum_c2"))
      .select(col("d"), col("n"), col("types"),
        ((col("n") * col("n")).cast("double") / col("sum_c2").cast("double"))
          .as("effective_types"))
      .orderBy(col("d"))
  }

  private val dailyDiversitySql =
    """WITH per_type AS (
      |  SELECT CAST(ts AS DATE) AS d, event_type,
      |    CAST(COUNT(*) AS BIGINT) AS c
      |  FROM events GROUP BY 1, 2
      |)
      |SELECT d, CAST(SUM(c) AS BIGINT) AS n,
      |  CAST(COUNT(*) AS BIGINT) AS types,
      |  CAST(SUM(c) * SUM(c) AS DOUBLE) / CAST(SUM(c * c) AS DOUBLE)
      |    AS effective_types
      |FROM per_type
      |GROUP BY d
      |ORDER BY d""".stripMargin

  val all: Seq[Q] = Seq(
    Q("q456_quintile_migration", quintileMigration,
      Some(quintileMigrationSql),
      "customer spend-quintile migration matrix between the two halves " +
        "of the order history — deterministic NTILE (spend, custkey), " +
        "exact cents, per-origin share via one mirrored division"),
    Q("q452_grid_density_cores", gridDensityCores, Some(gridDensityCoresSql),
      "grid-DBSCAN density step: 2-D cell histogram + 3x3 neighborhood " +
        "mass as a relational convolution (9-row offset join), core flag " +
        "by exact integer cross-multiplication"),
    Q("q449_gini_gain", giniGain, Some(giniGainSql),
      "Gini-gain attribute ranking (CART split selection) over the " +
        "return-flag label: impurities in exact BIGINT micro-units " +
        "(ln-free), one mirrored division per output"),
    Q("q366_cross_source_neardup", crossSourceNearDup, Some(crossSourceNearDupSql),
      "share of 0.5-Jaccard near-dup pairs crossing source boundaries " +
        "— syndication contamination audit"),
    Q("q367_hourly_conversion", hourlyConversion, Some(hourlyConversionSql),
      "purchase share of events by hour of day — diurnal conversion " +
        "profile"),
    Q("q368_context_fanout", contextFanout, Some(contextFanoutSql),
      "top-20 bigram contexts by distinct-continuation fanout — n-gram " +
        "LM branching profile"),
    Q("q369_zipf_check", zipfCheck, Some(zipfCheckSql),
      "rank x frequency for top-20 terms — transcendental-free Zipf " +
        "constancy check"),
    Q("q370_daily_diversity", dailyDiversity, Some(dailyDiversitySql),
      "effective event-type count per day (inverse Simpson) — mix-" +
        "collapse monitor"),
    Q("q361_order_seq_value", orderSeqValue, Some(orderSeqValueSql),
      "mean order value by customer order sequence (1..5+) — repeat-" +
        "spend lifecycle curve"),
    Q("q362_brand_overlap", brandOverlap, Some(brandOverlapSql),
      "top-20 brand pairs by customer-set Jaccard — normalized cross-" +
        "shopping map"),
    Q("q363_topk_churn", topkChurn, Some(topkChurnSql),
      "week-over-week stability of the top-10 revenue parts — " +
        "watchlist churn"),
    Q("q364_revenue_pareto", revenuePareto, Some(revenueParetoSql),
      "SKUs needed for 50/80/95% of revenue — integer cross-multiplied " +
        "Pareto targets"),
    Q("q365_grouped_ols", groupedOls, Some(groupedOlsSql),
      "per-brand discount-to-quantity OLS slope, top-10 by elasticity " +
        "— grouped regression"),
    Q("q356_lagged_xcorr", laggedXcorr, Some(laggedXcorrSql),
      "daily activity x revenue cross-correlation at lags -3..+3 — " +
        "lead/lag detection from exact moments"),
    Q("q357_lang_purity", langPurity, Some(langPuritySql),
      "majority-language share per source — labeling consistency audit"),
    Q("q358_l_scale", lScale, Some(lScaleSql),
      "second L-moment dispersion per priority from exact rank-weighted " +
        "cent sums"),
    Q("q359_file_sizing", fileSizing, Some(fileSizingSql),
      "estimated bytes/row and rows per 128MB output file — " +
        "partitioned-writer planning"),
    Q("q360_count_change_z", countChangeZ, Some(countChangeZSql),
      "Poisson two-count z for last-two-week order counts per segment"),
    Q("q351_depth_conversion", depthConversion, Some(depthConversionSql),
      "purchase rate by session depth bucket — the engagement curve " +
        "over 30-min sessions"),
    Q("q352_peak_days", peakDays, Some(peakDaysSql),
      "strict local-maximum revenue days over +/-3-day ROWS frames — " +
        "integer-exact peak detection"),
    Q("q353_weighted_jaccard", weightedJaccard, Some(weightedJaccardSql),
      "frequency-weighted Jaccard between source vocabularies — " +
        "emphasis-aware corpus similarity"),
    Q("q354_double_fire", doubleFire, Some(doubleFireSql),
      "same user+type repeats within 1h with tightest gap — telemetry " +
        "double-fire audit"),
    Q("q355_prefix_uniqueness", prefixUniqueness, Some(prefixUniquenessSql),
      "share of docs unique by first k tokens (k=3,5,10,20) — blocking-" +
        "key depth audit"),
    Q("q346_nn_margin", nnMargin, Some(nnMarginSql),
      "1-NN vs 2-NN cosine margin histogram (0.01 buckets) — retrieval " +
        "decisiveness audit"),
    Q("q347_catalog_coverage", catalogCoverage, Some(catalogCoverageSql),
      "unsold-part share + top-decile revenue concentration — " +
        "assortment health snapshot"),
    Q("q348_markov_stationary", markovStationary, Some(markovStationarySql),
      "stationary distribution of the event-type chain, 10 integer " +
        "power-iteration rounds"),
    Q("q349_residual_cells", residualCells, Some(residualCellsSql),
      "standardized Pearson residuals per dow x type cell with |r|>=2 " +
        "anomaly flags"),
    Q("q350_basket_size_hist", basketSizeHist, Some(basketSizeHistSql),
      "distinct-parts-per-order histogram — the 1:N multiplicity " +
        "profile sizing pair joins"),
    Q("q341_effective_dim", effectiveDim, Some(effectiveDimSql),
      "participation-ratio effective dimensionality from integer " +
        "variance numerators — collapsed-space audit"),
    Q("q342_partition_advisor", partitionAdvisor, Some(partitionAdvisorSql),
      "32-way bucket skew per candidate shuffle key (max/avg ratio) — " +
        "pre-job partitioning advisor"),
    Q("q343_burst_users", burstUsers, Some(burstUsersSql),
      "users reaching 3+ events in any rolling 1h RANGE window — " +
        "bot/scraper heuristic, integer-exact"),
    Q("q344_dedup_degree_hist", dedupDegreeHist, Some(dedupDegreeHistSql),
      "degree histogram of the 0.5-Jaccard near-dup graph — template-" +
        "family shape report"),
    Q("q345_label_balance", labelBalance, Some(labelBalanceSql),
      "chi-square goodness-of-fit of labels vs uniform, integer until " +
        "one division"),
    Q("q336_mutual_best", mutualBest, Some(mutualBestSql),
      "supplier-part reciprocal best match by exact revenue — " +
        "unambiguous-assignment filter"),
    Q("q337_trimmed_mean", trimmedMean, Some(trimmedMeanSql),
      "10% trimmed mean order value per priority — rank-windowed tail " +
        "drop, exact cents"),
    Q("q338_qte", qte, Some(qteSql),
      "p25/p50/p75 quantile treatment effects of the custkey%2 split — " +
        "rank-selected, interpolation-free"),
    Q("q339_jaccard_sweep", jaccardSweep, Some(jaccardSweepSql),
      "near-dup pair counts at thresholds 0.3-0.8 from one pairwise " +
        "pass — dedup tuning curve"),
    Q("q340_ratio_delta", ratioDelta, Some(ratioDeltaSql),
      "delta-method SE for the value-per-event ratio metric per arm — " +
        "exact decimal moments, mirrored IEEE chain"),
    Q("q331_centroid_drift", centroidDrift, Some(centroidDriftSql),
      "per-label centroid L2 shift first-half vs second-half — exact " +
        "integer numerators, one sqrt+division"),
    Q("q332_simpson_paradox", simpsonParadox, Some(simpsonParadoxSql),
      "segment-vs-overall conversion direction via exact integer " +
        "cross-products — paradox flag per first-event segment"),
    Q("q333_diff_in_diff", diffInDiff, Some(diffInDiffSql),
      "urgent x weekend diff-in-diff on order value from one 8-column " +
        "exact aggregate row"),
    Q("q334_assoc_rules", assocRules, Some(assocRulesSql),
      "top-20 directional basket rules by confidence (support >= 3), " +
        "lift alongside"),
    Q("q335_journey_signature", journeySignature, Some(journeySignatureSql),
      "first-3-event journey archetypes with 24h activation rate"),
    Q("q326_hapax_share", hapaxShare, Some(hapaxShareSql),
      "per-source hapax share + freq<=2 tail mass — bottom-of-Zipf " +
        "vocabulary health"),
    Q("q327_knn_eval", knnEval, Some(knnEvalSql),
      "majority-vote 10-NN classification accuracy per label over " +
        "exact cosine neighbors"),
    Q("q328_nn_confusion", nnConfusion, Some(nnConfusionSql),
      "1-NN label confusion matrix over the eval queries — embedding " +
        "separability map"),
    Q("q329_linear_attribution", linearAttribution, Some(linearAttributionSql),
      "equal-credit multi-touch attribution in exact micro-units over " +
        "a 7-day lookback band"),
    Q("q330_coverage_gaps", coverageGaps, Some(coverageGapsSql),
      "missing (day, segment) cells vs the generated calendar spine — " +
        "ingestion completeness audit"),
    Q("q321_weighted_pagerank", weightedPagerank, Some(weightedPagerankSql),
      "revenue-weighted PageRank: rank splits by exact edge cents, " +
        "integer fixed point, 5 rounds"),
    Q("q322_bipartite_projection", bipartiteProjection, Some(bipartiteProjectionSql),
      "supplier co-purchase projection: top-20 pairs by distinct shared " +
        "customers, one-mode graph collapse"),
    Q("q323_two_prop_z", twoPropZ, Some(twoPropZSql),
      "two-proportion z-test on purchase conversion across the " +
        "user_id%2 split — exact counts, mirrored IEEE chain"),
    Q("q324_bounce_rate", bounceRate, Some(bounceRateSql),
      "daily share of single-event 30-min sessions — sessionizer + " +
        "per-session size rollup"),
    Q("q325_length_percentiles", lengthPercentiles, Some(lengthPercentilesSql),
      "exact rank-selected p50/p90/p99 token counts per language — " +
        "interpolation-free percentiles"),
    Q("q316_top_share", topShare, Some(topShareSql),
      "revenue share of top-10/100/1000 orders — WindowGroupLimit-capped " +
        "global rank, exact cents, one division per k"),
    Q("q317_modularity", modularity, Some(modularitySql),
      "exact Newman modularity of the label-prop partition from pure " +
        "integer sums, one division"),
    Q("q318_itemsets3", itemsets3, Some(itemsets3Sql),
      "frequent part triples across baskets (Apriori 3-itemset step), " +
        "basket-bounded self-joins, support >= 2"),
    Q("q319_power_analysis", powerAnalysis, Some(powerAnalysisSql),
      "per-segment A/B sample size 16*var/(0.02*mean)^2 from exact " +
        "decimal moments"),
    Q("q320_prefix_dup", prefixDup, Some(prefixDupSql),
      "shared 10-token opening groups with language spread — " +
        "boilerplate-header / labeling-bug audit"),
    Q("q311_hits_authority", hitsAuthority, Some(hitsAuthoritySql),
      "HITS supplier authority on the bipartite purchase graph, 2 " +
        "rounds, integer max-rescale fixed point — top-20"),
    Q("q312_keyword_chi2", keywordChi2, Some(keywordChi2Sql),
      "top-5 distinctive terms per source by 2x2 chi-square, " +
        "DECIMAL(38,0) products, one division"),
    Q("q313_dim_stats", dimStats, Some(dimStatsSql),
      "per-dimension embedding mean/variance audit from scaled-int " +
        "moments — dead/exploding dimension check"),
    Q("q314_fd_check", fdCheck, Some(fdCheckSql),
      "functional-dependency validation across 7 candidate A->B pairs " +
        "via exact distinct-count equality"),
    Q("q315_rolling_ols", rollingOls, Some(rollingOlsSql),
      "14-day trailing OLS revenue slope from exact windowed integer " +
        "moments, one division per day"),
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
