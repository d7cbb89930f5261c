package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.queries._

/** Plan-quality gates: the physical plans the engine would need at 100 TB,
  * asserted on the plans it actually produces. A regression that drops a
  * pushdown, broadcast, or partial aggregate fails here even though
  * results stay correct.
  */
class PlanSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  private def plan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString

  test("filter/projection reach the parquet scan (pushdown + pruning)") {
    val p = plan(CoreQueries.filterProject(spark, dir))
    assert(p.contains("PushedFilters: [IsNotNull(l_shipdate)"))
    assert(p.contains("ReadSchema: struct<l_orderkey:bigint,l_linenumber:int,l_quantity:double," +
      "l_extendedprice:double,l_discount:dou"))
    assert(!p.contains("l_returnflag")) // pruned column never read
  }

  test("dimension joins broadcast; no sort-merge in the star mart") {
    val p = plan(CoreQueries.regionNationMart(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 3)
    assert(!p.contains("SortMergeJoin"))
  }

  test("aggregates run partial->final (map-side combine before shuffle)") {
    val p = plan(CoreQueries.pricingSummary(spark, dir))
    assert(p.contains("partial_sum") || p.contains("partial_count"))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1) // one shuffle
  }

  test("top-k plans as TakeOrderedAndProject, not global sort") {
    val p = plan(CoreQueries.topSuppliers(spark, dir))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("fused attack mart reads lineitem once (vs 10 scans in q10)") {
    def scans(p: String) = "FileScan parquet".r.findAllIn(p).size
    val fused = plan(RefMartQueries.attackFused(spark, dir))
    val classic = plan(RefMartQueries.attack(spark, dir))
    // fused: lineitem scan for stats + one for the player rollup + supplier
    assert(scans(fused) <= 4, s"fused plan has ${scans(fused)} scans")
    assert(scans(classic) >= 15, s"classic plan has ${scans(classic)} scans")
    // defense/discipline fused forms: one lineitem scan + supplier each
    assert(scans(plan(RefMartQueries.defenseFused(spark, dir))) <= 2)
    assert(scans(plan(RefMartQueries.disciplineFused(spark, dir))) <= 2)
  }

  test("top-suppliers aggregates BELOW the broadcast join (fact collapsed first)") {
    val plan = graft.queries.CoreQueries.topSuppliers(spark, dir)
      .queryExecution.executedPlan.toString
    val join = plan.indexOf("BroadcastHashJoin")
    val agg = plan.indexOf("HashAggregate")
    assert(join >= 0 && agg >= 0 && join < agg,
      "the per-supplier aggregate must sit under the join, not above it")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
      "one aggregate exchange only — the join itself must not shuffle")
  }

  test("RANGE-frame window and as-of forms run on a single hash exchange") {
    for (q <- Seq("q44_range_frame", "q90_asof_forward")) {
      val plan = graft.Registry.byName(q).build(spark, dir)
        .queryExecution.executedPlan.toString
      assert("Exchange hashpartitioning".r.findAllIn(plan).size == 1,
        s"$q must shuffle exactly once (plus only the output range sort)")
    }
  }

  test("plan gates hold at sf0.1 under AQE (thresholds don't flip as data grows)") {
    // 100× the spec fixture: guards against a broadcast threshold or
    // scan-fusion property silently flipping as the data grows
    val big = "/root/testdata/sf0.1"
    def finalPlan(df: org.apache.spark.sql.DataFrame): String = {
      df.collect() // let AQE settle on the final plan before asserting
      // the adaptive plan prints final + initial trees; assert on final only
      df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)
    }
    val p13 = finalPlan(RefMartQueries.attackFused(spark, big))
    assert("FileScan parquet".r.findAllIn(p13).size <= 4,
      "fused attack mart must keep its single-scan-per-table shape")
    assert(!p13.contains("SortMergeJoin"))
    val p02 = finalPlan(CoreQueries.regionNationMart(spark, big))
    assert("BroadcastHashJoin".r.findAllIn(p02).size >= 3,
      "dimension chain must stay all-broadcast at sf0.1")
    assert(!p02.contains("SortMergeJoin"))
    // exactly the two-phase count(distinct) shape: one exchange on
    // (keys, o_orderkey), one on keys — joins add none
    assert("Exchange hashpartitioning".r.findAllIn(p02).size == 2,
      "only the distinct-aggregate exchanges at sf0.1")
  }

  test("runtime bloom filter prunes the fact side of a selective shuffle join") {
    // the modern large-large shape: when broadcast is impossible, Spark
    // can still push a bloom filter built from the selective side into
    // the fact scan — row-level runtime pruning before the shuffle
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val prev = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = graft.catalog.Catalog.load(spark, "/root/testdata/sf0.1", "lineitem")
      val o = graft.catalog.Catalog.load(spark, "/root/testdata/sf0.1", "orders")
        .filter(org.apache.spark.sql.functions.col("o_orderpriority") === "1-URGENT")
      val joined = li.join(o,
        org.apache.spark.sql.functions.col("l_orderkey") ===
          org.apache.spark.sql.functions.col("o_orderkey"))
      val p = joined.queryExecution.executedPlan.toString
      assert(p.toLowerCase.contains("bloomfilter") || p.contains("might_contain"),
        "expected a runtime bloom filter on the fact side")
    } finally prev.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("per-document text ops plan with zero hash exchanges (map-only passes)") {
    for (q <- Seq("q97_repetition_stats", "q104_rag_chunks")) {
      val p = graft.Registry.byName(q).build(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!p.contains("Exchange hashpartitioning"),
        s"$q must not shuffle — every metric is per-document")
      assert(p.contains("MapPartitions"))
    }
  }

  test("tf-idf top-k keeps the partial WindowGroupLimit before the shuffle") {
    val p = graft.Registry.byName("q98_tfidf_top").build(spark, dir)
      .queryExecution.executedPlan.toString
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Partial"))
  }

  test("observe(): execution metrics collected in the same pass as the action") {
    val obs = new org.apache.spark.sql.Observation()
    val li = graft.catalog.Catalog.load(spark, dir, "lineitem")
      .observe(obs, org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("n_rows"))
    val n = li.count()
    // metrics ride the same job — no second scan for pipeline accounting
    assert(obs.get("n_rows").asInstanceOf[Long] == n)
  }

  test("cosine top-k: custom expression in-plan + partial window top-k") {
    val p = plan(graft.queries.VectorQueries.cosineTopK(spark, dir))
    assert(p.contains("scaledintcosine")) // the codegen expression, fused in Project
    // Spark 4 plans per-partition partial top-k before the shuffle:
    assert(p.contains("WindowGroupLimit"))
    assert(p.contains("Partial"))
  }

  test("sequence packing runs on one per-group window exchange") {
    val p = plan(graft.Registry.byName("q108_seq_packing").build(spark, dir))
    // one hash exchange for the per-lang window; the trailing range sort
    // is only the deterministic output ordering
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
  }

  test("hard negatives: broadcast queries + partial window top-k, like q70") {
    val p = plan(graft.Registry.byName("q110_hard_negatives").build(spark, dir))
    assert(p.contains("scaledintcosine"))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("WindowGroupLimit") && p.contains("Partial"))
    assert(!p.contains("SortMergeJoin"))
  }

  test("funnel: three dependent stages + per-user collapse on ONE hash " +
    "exchange, no joins") {
    val p = plan(graft.Registry.byName("q111_funnel").build(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join") && !p.contains("CartesianProduct"))
  }

  test("skyline: per-size threshold broadcasts back; no dominance self-join") {
    val p = plan(graft.Registry.byName("q122_skyline").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin") && !p.contains("CartesianProduct"))
    // exactly one scan of part feeds the per-size aggregate, one the rows
    assert("Scan parquet".r.findAllIn(p).size == 2, p)
  }

  test("mixture: quota frame broadcasts; per-doc rank is the only " +
    "data-sized exchange") {
    val p = plan(graft.Registry.byName("q120_mixture").build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"))
  }

  test("attribution: all windows share one user_id exchange") {
    val p = plan(graft.Registry.byName("q121_attribution").build(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"))
  }

  test("forward-fill and EWMA run on one user_id exchange, no join") {
    for (q <- Seq("q146_forward_fill", "q147_ewma")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, s"$q:\n$p")
      assert(!p.contains("Join"), q)
    }
  }

  test("mode: top-1 window runs over the AGGREGATED contingency " +
    "(partial agg before the shuffle, window after)") {
    val p = plan(graft.Registry.byName("q148_mode").build(spark, dir))
    // partial+final aggregate pair: the window never sees raw events
    assert("HashAggregate".r.findAllIn(p).size >= 2, p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("weighted sample: corpus max broadcasts back; draw filter is " +
    "join-free integer arithmetic") {
    val p = plan(graft.Registry.byName("q150_weighted_sample").build(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("rank fusion: two single-row-frame rankings joined on the key, " +
    "top-20 as TakeOrderedAndProject not a global sort") {
    val p = plan(graft.Registry.byName("q154_rank_fusion").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("acf: data-sized work is ONE aggregate pass; lag windows run on " +
    "the aggregate-sized daily series") {
    val p = plan(graft.Registry.byName("q157_acf").build(spark, dir))
    // one scan+aggregate of orders feeds every leg via checkpoint-free
    // reuse is not required — but nothing data-sized may sort: the only
    // Sort nodes must sit above the per-day aggregate
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("paths: prefix filter runs under one user_id exchange before the " +
    "path aggregate; top-20 is aggregate-sized") {
    val p = plan(graft.Registry.byName("q158_paths").build(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("Join"), p)
  }

  test("survivorship: one aggregate pass, partial max_by before the " +
    "user_id shuffle, no join") {
    val p = plan(graft.Registry.byName("q161_survivorship").build(spark, dir))
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_max_by") || p.contains("partial_"), p)
  }

  test("benford: digit histogram aggregates partial->final; total " +
    "broadcasts back") {
    val p = plan(graft.Registry.byName("q160_benford").build(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("sweep line: interval stacking is union + aggregate + running " +
    "window — no join of any kind") {
    val p = plan(graft.Registry.byName("q177_sweep_line").build(spark, dir))
    assert(!p.contains("Join"), p)
    assert(p.contains("partial_"), p)
  }

  test("basket pairs: per-basket equi-join only — no cartesian product; " +
    "the 1-row total broadcasts") {
    val p = plan(graft.Registry.byName("q179_basket_pairs").build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p) // top-20, not global sort
  }

  test("weighted top-k sample: partial WindowGroupLimit prunes before " +
    "the lang shuffle; no join") {
    val p = plan(graft.Registry.byName("q173_weighted_topk").build(spark, dir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("Join"), p)
  }

  test("cusum: order lines reduce in ONE partial->final day aggregate; " +
    "stats broadcast back; prefix windows run on the day-sized series") {
    val p = plan(graft.Registry.byName("q164_cusum").build(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
    assert(p.contains("partial_"), p) // map-side combine on the daily sum
  }

  test("table checksum: map-side-combinable single-exchange aggregate " +
    "(no join, no window, one hash exchange)") {
    val p = plan(graft.Registry.byName("q165_table_checksum").build(spark, dir))
    assert(!p.contains("Join"), p)
    assert(!p.contains("Window"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size == 1, p)
    assert(p.contains("partial_"), p)
  }

  test("welch-t / ols2: one partial->final aggregate over the fact " +
    "table, no window, no sort-merge join") {
    for (name <- Seq("q192_welch_t", "q202_ols2")) {
      val p = plan(graft.Registry.byName(name).build(spark, dir))
      assert(!p.contains("Window"), s"$name: $p")
      assert(!p.contains("SortMergeJoin"), s"$name: $p")
      assert(p.contains("partial_"), s"$name: $p")
    }
  }

  test("interval merge / streaks: windows run over the collapsed " +
    "aggregate, with map-side combine before the key exchange") {
    for (name <- Seq("q189_interval_merge", "q185_order_streaks")) {
      val p = plan(graft.Registry.byName(name).build(spark, dir))
      assert(p.contains("Window"), s"$name: $p")
      assert(p.contains("partial_"), s"$name: $p") // per-order/month collapse
      assert(!p.contains("CartesianProduct"), s"$name: $p")
    }
  }

  test("cdc apply: change-log collapse windows over the log only; the " +
    "snapshot side joins without a window pass") {
    val p = plan(graft.Registry.byName("q190_cdc_apply").build(spark, dir))
    // exactly one window (the per-key seq collapse on the log)
    assert("Window".r.findAllIn(p).size >= 1, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("grid radius join: cell equi-join, never a cartesian/nested-loop " +
    "product (the oracle's naive form)") {
    val p = plan(graft.Registry.byName("q195_grid_join").build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin") ||
      p.contains("ShuffledHashJoin"), p)
  }

  test("dup spans: shingle match is an equi-join (never cartesian); " +
    "island windows run under the pair exchange") {
    val p = plan(graft.Registry.byName("q205_dup_spans").build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert("Window".r.findAllIn(p).size >= 1, p)
  }

  test("quantile norm: the <=k-row bucket reference broadcasts back " +
    "(no fact-x-fact sort-merge)") {
    val p = plan(graft.Registry.byName("q206_quantile_norm")
      .build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
  }

  test("fs linkage / k-anonymity: blocked pair join stays equi; the " +
    "audit is one partial->final aggregate") {
    val p1 = plan(graft.Registry.byName("q211_fs_linkage").build(spark, dir))
    assert(!p1.contains("CartesianProduct"), p1)
    assert(!p1.contains("BroadcastNestedLoopJoin"), p1)
    val p2 = plan(graft.Registry.byName("q220_k_anonymity")
      .build(spark, dir))
    assert(p2.contains("partial_count") || p2.contains("partial_sum"), p2)
    assert("Exchange hashpartitioning".r.findAllIn(p2).size <= 2, p2)
  }

  test("anova / hhi / roc auc / calibration: fact table collapses in a " +
    "partial->final aggregate before anything else moves") {
    for (q <- Seq("q212_anova_f", "q216_hhi", "q210_roc_auc",
        "q209_calibration_bins")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q\n$p")
    }
  }

  test("changepoint: one ordered window over the collapsed daily " +
    "aggregate, then TakeOrdered — the fact table never re-sorts") {
    val p = plan(graft.Registry.byName("q218_changepoint")
      .build(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("semantic dedup: in-cell pair join is an equi-join, not a " +
    "cartesian product") {
    val p = plan(graft.Registry.byName("q215_semantic_dedup")
      .build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("round-5 stats batch (assortativity/spearman/ols/cuped/cramers): " +
    "the fact table collapses in a partial->final aggregate; the closed " +
    "forms move only moment rows") {
    for (q <- Seq("q225_assortativity", "q226_spearman", "q228_ols",
        "q230_cuped", "q231_cramers_v", "q227_ks_test", "q229_tv_drift")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("partial_sum") || p.contains("partial_count"),
        s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("round-5 pair/graph batch: sorted-neighborhood, k-core and " +
    "rank-overlap candidate joins are equi-joins, never cartesian") {
    for (q <- Seq("q222_sorted_neighborhood", "q224_kcore",
        "q232_rank_overlap")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    // label model is map-only: no exchange before the output sort
    val p223 = plan(graft.Registry.byName("q223_label_model")
      .build(spark, dir))
    assert(!"Exchange hashpartitioning".r.findAllIn(p223).hasNext, p223)
  }

  test("decay score / bm25: top-k plans as TakeOrderedAndProject over " +
    "one partial->final aggregate, never a global sort") {
    for (q <- Seq("q233_decay_score", "q234_bm25_topk")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("TakeOrderedAndProject"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    val p235 = plan(graft.Registry.byName("q235_two_hop_reach")
      .build(spark, dir))
    assert(!p235.contains("CartesianProduct"), p235)
    assert(!p235.contains("BroadcastNestedLoopJoin"), p235)
  }

  test("item2item: per-item top-3 prunes via WindowGroupLimit before the " +
    "full window; pair join stays equi") {
    val p = plan(graft.Registry.byName("q236_item_similar")
      .build(spark, dir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("rank metrics (mrr / avg precision): queries broadcast — the " +
    "corpus never shuffles to meet them") {
    for (q <- Seq("q237_mrr", "q238_avg_precision")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      // pure != predicate → BNLJ is the right physical op; the pin is
      // that the QUERY side is the broadcast build, corpus streams once
      assert(p.contains("BroadcastNestedLoopJoin BuildRight"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("gram matrix: single-pass ObjectHashAggregate with map-side " +
    "partials — one buffer per task crosses the wire, nothing row-shaped") {
    val p = plan(graft.Registry.byName("q239_gram_matrix")
      .build(spark, dir))
    assert(p.contains("ObjectHashAggregate"), p)
    assert(!"Exchange hashpartitioning".r.findAllIn(p).hasNext, p)
  }

  test("pca power: cluster work ends at the gram reduce — the returned " +
    "eigenvector is a driver-local table, no distributed stage") {
    val p = plan(graft.Registry.byName("q240_pca_power")
      .build(spark, dir))
    assert(p.contains("LocalTableScan"), p)
    assert(!p.contains("FileScan"), p)
  }

  test("scd2 point-in-time join: equi on user with interval residual — " +
    "never a cartesian or nested-loop plan") {
    val p = plan(graft.Registry.byName("q241_scd2_pit_join")
      .build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("target encode: group stats broadcast back onto the fact table — " +
    "map-only encode, no window sort over skewed groups") {
    val p = plan(graft.Registry.byName("q242_target_encode")
      .build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("Window"), p)
  }

  test("feature hashing: map-side explode collapses in one (doc, bucket) " +
    "partial->final aggregate — a single hash exchange") {
    val p = plan(graft.Registry.byName("q243_feature_hash")
      .build(spark, dir))
    assert(p.contains("partial_count"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 1, p)
  }

  test("pca project: eigenvector rides as a literal — map-only dot " +
    "product, no join and no hash exchange") {
    val p = plan(graft.Registry.byName("q244_pca_project")
      .build(spark, dir))
    assert(!p.contains("Join"), p)
    assert(!"Exchange hashpartitioning".r.findAllIn(p).hasNext, p)
  }

  test("sequential models (holt / holt-winters / conformal): cluster " +
    "work ends at the daily collapse — the returned frame is driver-local") {
    for (q <- Seq("q245_holt", "q252_holt_winters", "q247_conformal_band")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("LocalTableScan"), s"$q\n$p")
      assert(!p.contains("FileScan"), s"$q\n$p")
    }
  }

  test("delete propagation: request keys broadcast into every fact " +
    "table — no sort-merge shuffle of the facts") {
    val p = plan(graft.Registry.byName("q246_delete_propagation")
      .build(spark, dir))
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("link prediction: wedge join is an equi-join on the shared " +
    "neighbor; top-k takes TakeOrderedAndProject, never a global sort") {
    val p = plan(graft.Registry.byName("q248_link_predict")
      .build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("rendezvous shard: HRW argmax is one partial->final integer max " +
    "aggregate — no window sort over the 9x explode") {
    val p = plan(graft.Registry.byName("q249_rendezvous_shard")
      .build(spark, dir))
    assert(p.contains("partial_max") || p.contains("partial_count"), p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("kendall tau: the bounded 2000-row sample broadcasts for the " +
    "pair join; counts collapse in one partial->final aggregate") {
    val p = plan(graft.Registry.byName("q250_kendall_tau")
      .build(spark, dir))
    // pure rn<rn2 predicate → BNLJ over the broadcast bounded sample
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("partial_sum"), p)
  }

  test("permutation test: per-rep sums collapse map-side (200 rows " +
    "shuffle); the observed stat broadcasts onto them") {
    val p = plan(graft.Registry.byName("q251_permutation_test")
      .build(spark, dir))
    assert(p.contains("partial_sum"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("ndcg: the weight table is a literal — same broadcast retrieval " +
    "shape as mrr, corpus streams once") {
    val p = plan(graft.Registry.byName("q253_ndcg").build(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin BuildRight"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("cvm / weighted median: one partial->final aggregate feeds the " +
    "cumulative window — no cartesian anywhere") {
    for (q <- Seq("q254_cvm_test", "q255_weighted_median")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("partial_sum"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("km hazard: 1-row horizon broadcasts; per-user + per-day " +
    "aggregates are partial->final; the risk window is post-aggregate") {
    val p = plan(EventQueries.kmHazard(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin") ||
      p.contains("BroadcastHashJoin"), p) // 1-row horizon, never shuffled
    assert(p.contains("partial_min") || p.contains("partial_sum"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("burstiness: both aggregate levels map-side combine — no raw-row " +
    "shuffle reaches the moment sums") {
    val p = plan(EventQueries.burstiness(spark, dir))
    assert(p.contains("partial_count"), p)
    assert("Exchange hashpartitioning".r.findAllIn(p).size <= 2, p)
  }

  test("heaps law: the 10-row bound table broadcasts into both range " +
    "joins — no cartesian, no sort-merge") {
    val p = plan(TextQueries.heapsLaw(spark, dir))
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("weekly churn / type affinity / source jaccard: equi-joins only " +
    "(no cartesian), marginals broadcast where hinted") {
    for (q <- Seq("q263_weekly_churn", "q265_type_affinity",
        "q264_source_vocab_jaccard")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    val affinity = plan(EventQueries.typeAffinity(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(affinity).size >= 2, affinity)
  }

  test("column profile: all per-column statistics come from ONE scan of " +
    "the table") {
    val p = plan(AnalyticsQueries.columnProfile(spark, dir))
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
  }

  test("bloom semi join: UDF prefilter sits in the lineitem scan stage, " +
    "below any exchange (pre-shuffle probe pruning)") {
    val p = plan(AnalyticsQueries.bloomSemiJoin(spark, dir))
    assert(p.contains("LeftSemi"), p)
    // the printed tree is top-down: the bloom Filter line must be
    // followed by the lineitem FileScan with no Exchange in between —
    // i.e. the prune happens map-side on the scanned partition, so only
    // might-match rows are ever shuffled/broadcast-probed
    val fi = p.indexOf("UDF(")
    assert(fi >= 0, p)
    val scan = p.indexOf("FileScan parquet", fi)
    assert(scan > fi, p)
    assert(!p.substring(fi, scan).contains("Exchange"),
      p.substring(fi, scan))
  }

  test("revenue bridge: month-1 self-joins stay on the (cust,month) " +
    "aggregate — no window over raw orders, no cartesian") {
    val p = plan(EventQueries.revenueBridge(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("Window"), p)
  }

  test("recall@k: the NQ query vectors broadcast — the corpus streams " +
    "once, never a corpus x corpus join") {
    val p = plan(MiningQueries.recallAtK(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // exactly the two embeddings scans (corpus + query side), no more
    assert("FileScan parquet".r.findAllIn(p).size == 2, p)
  }

  test("label prop / hits: every iteration round is an equi-join + " +
    "partial->final aggregate on integer keys — no cartesian, no " +
    "nested loop in the fixed-point") {
    for (q <- Seq("q307_label_prop", "q311_hits_authority")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    // hits' visible plan ends at its localCheckpoint; label prop's final
    // community rollup aggregates after the checkpoint and must show
    val p = plan(MiningQueries.labelProp(spark, dir))
    assert(p.contains("HashAggregate"), p)
  }

  test("seq trigrams: one user-partitioned window then " +
    "TakeOrderedAndProject — the top-20 never sorts globally") {
    val p = plan(MiningQueries.seqTrigrams(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("effective types / dim stats / fd check: pure partial->final " +
    "aggregates, zero windows, zero joins over fact rows") {
    for (q <- Seq("q309_effective_types", "q313_dim_stats", "q314_fd_check")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("Window"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("dow seasonal / rolling ols: orders collapse to the daily " +
    "aggregate BEFORE any window/broadcast — the window sees " +
    "calendar-sized input only") {
    val seasonal = plan(MiningQueries.dowSeasonal(spark, dir))
    assert(seasonal.contains("BroadcastNestedLoopJoin"), seasonal)
    val ols = plan(MiningQueries.rollingOls(spark, dir))
    // printed top-down: the Window node must sit ABOVE (before) the
    // aggregate that collapses orders, so it windows daily rows
    val w = ols.indexOf("Window")
    val agg = ols.indexOf("HashAggregate", w)
    assert(w >= 0 && agg > w, ols)
  }

  test("keyword chi2: per-source top-5 prunes via WindowGroupLimit; " +
    "source totals broadcast onto the (term,source) aggregate") {
    val p = plan(MiningQueries.keywordChi2(spark, dir))
    assert(p.contains("WindowGroupLimit"), p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("top share: ONE ranked pass over orders (map-side top-k prune), " +
    "one total scan — never three per-k scans, no cartesian") {
    val p = plan(MiningQueries.topShare(spark, dir))
    assert(p.contains("WindowGroupLimit") || p.contains("TakeOrderedAndProject"), p)
    assert(!p.contains("CartesianProduct"), p)
    assert("FileScan parquet".r.findAllIn(p).size == 2, p)
  }

  test("modularity / itemsets3: label join and basket self-joins stay " +
    "equi — no cartesian; itemsets top-20 is TakeOrderedAndProject") {
    val pm = plan(MiningQueries.modularity(spark, dir))
    assert(!pm.contains("CartesianProduct"), pm)
    val pi = plan(MiningQueries.itemsets3(spark, dir))
    assert(!pi.contains("CartesianProduct"), pi)
    assert(pi.contains("TakeOrderedAndProject"), pi)
  }

  test("power analysis / prefix dup: one partial->final aggregate over " +
    "a single scan — no window, no shuffle-side join") {
    for (q <- Seq("q319_power_analysis", "q320_prefix_dup")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("Window"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
      assert("FileScan parquet".r.findAllIn(p).size == 1, s"$q\n$p")
    }
  }

  test("weighted pagerank / bipartite projection: equi-joins only in " +
    "the rounds and the one-mode collapse; projection top-20 is " +
    "TakeOrderedAndProject") {
    for (q <- Seq("q321_weighted_pagerank", "q322_bipartite_projection")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(!p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
    }
    val p = plan(MiningQueries.bipartiteProjection(spark, dir))
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("two-prop z / bounce rate: the per-user collapse happens in one " +
    "aggregate before the tiny variant/day rollup — no self-join of " +
    "events") {
    val pz = plan(MiningQueries.twoPropZ(spark, dir))
    assert("FileScan parquet".r.findAllIn(pz).size == 2, pz) // a & b branches
    assert(!pz.contains("SortMergeJoin"), pz)
    val pb = plan(MiningQueries.bounceRate(spark, dir))
    assert("FileScan parquet".r.findAllIn(pb).size == 1, pb)
    assert(!pb.contains("CartesianProduct"), pb)
  }

  test("length percentiles: one tokenize scan, per-lang window, no join " +
    "at all") {
    val p = plan(MiningQueries.lengthPercentiles(spark, dir))
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Join"), p)
  }

  test("hapax share: tokenize collapses in stacked partial->final " +
    "aggregates — single scan, no join, no window") {
    val p = plan(MiningQueries.hapaxShare(spark, dir))
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
  }

  test("knn eval / confusion: eval queries broadcast (corpus streams " +
    "once per ranked frame), top-k prunes via WindowGroupLimit") {
    for (q <- Seq("q327_knn_eval", "q328_nn_confusion")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("BroadcastNestedLoopJoin"), s"$q\n$p")
      assert(p.contains("WindowGroupLimit"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
  }

  test("linear attribution: purchases x touches is an equi-join on " +
    "user with a residual time band — no cartesian, no nested loop") {
    val p = plan(MiningQueries.linearAttribution(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("coverage gaps: the fact table collapses before the anti-join; " +
    "only the generated spine x segments crosses") {
    val p = plan(MiningQueries.coverageGaps(spark, dir))
    assert(p.contains("LeftAnti"), p)
    // the only nested-loop is the tiny spine x 5-segment cross
    assert(!p.contains("CartesianProduct"), p)
  }

  test("centroid drift: halves join on (label, dim) — 64-row-per-label " +
    "equi-join over the collapsed moment sums, no cartesian") {
    val p = plan(MiningQueries.centroidDrift(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("HashAggregate"), p)
  }

  test("simpson / journey / diff-in-diff: the per-user (or one-row) " +
    "collapse happens before any tiny rollup — no raw-event self-join") {
    for (q <- Seq("q332_simpson_paradox", "q335_journey_signature",
        "q333_diff_in_diff")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
    }
    val pd = plan(MiningQueries.diffInDiff(spark, dir))
    assert("FileScan parquet".r.findAllIn(pd).size == 1, pd)
    assert(!pd.contains("Window"), pd)
  }

  test("assoc rules: basket self-join stays equi, marginals join on the " +
    "pair aggregate, top-20 via TakeOrderedAndProject") {
    val p = plan(MiningQueries.assocRules(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("mutual best: both top-1 windows prune via WindowGroupLimit over " +
    "ONE (s,p) revenue aggregate; the reciprocal filter is an equi-join") {
    val p = plan(MiningQueries.mutualBest(spark, dir))
    assert("WindowGroupLimit".r.findAllIn(p).size >= 2, p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("trimmed mean / qte: segment-partitioned rank windows, no join " +
    "of fact rows, exact-cent aggregates") {
    for (q <- Seq("q337_trimmed_mean", "q338_qte")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
    }
  }

  test("ratio delta: per-user collapse then per-arm moment aggregate — " +
    "two stacked partial->final aggregates, one scan, no window") {
    val p = plan(MiningQueries.ratioDelta(spark, dir))
    assert("FileScan parquet".r.findAllIn(p).size == 1, p)
    assert(!p.contains("Window"), p)
    assert(!p.contains("Join"), p)
  }

  test("effective dim / label balance: pure stacked aggregates over one " +
    "scan each — no join, no window") {
    for (q <- Seq("q341_effective_dim", "q345_label_balance")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert("FileScan parquet".r.findAllIn(p).size == 1, s"$q\n$p")
      assert(!p.contains("Join"), s"$q\n$p")
      assert(!p.contains("Window"), s"$q\n$p")
    }
  }

  test("partition advisor / burst users: per-strategy aggregates and " +
    "the RANGE burst window stay cartesian-free; burst windows on the " +
    "user partition, never global") {
    val pa = plan(MiningQueries.partitionAdvisor(spark, dir))
    assert(!pa.contains("CartesianProduct"), pa)
    val pb = plan(MiningQueries.burstUsers(spark, dir))
    assert(pb.contains("windowspecdefinition(user_id"), pb)
    assert(!pb.contains("Exchange SinglePartition"), pb)
  }

  test("markov stationary: the 5x5 transition table checkpoints once — " +
    "rounds join against it, never against raw events") {
    val p = plan(MiningQueries.markovStationary(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // post-checkpoint plan must not rescan the events parquet per round
    assert(!p.contains("FileScan parquet"), p)
  }

  test("residual cells / basket hist / catalog coverage: marginals " +
    "broadcast onto the collapsed cell aggregate — no sort-merge, no " +
    "cartesian") {
    for (q <- Seq("q349_residual_cells", "q350_basket_size_hist",
        "q347_catalog_coverage")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(!p.contains("SortMergeJoin"), s"$q\n$p")
    }
  }

  test("nn margin: same broadcast-query ranked frame as knn eval — " +
    "corpus never self-joins") {
    val p = plan(MiningQueries.nnMargin(spark, dir))
    assert(p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
  }

  test("depth conversion / double fire: user-partitioned windows then " +
    "tiny rollups — no event self-join, no cartesian") {
    for (q <- Seq("q351_depth_conversion", "q354_double_fire")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("windowspecdefinition(user_id"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
      assert(!p.contains("Join"), s"$q\n$p")
    }
  }

  test("peak days: windows run over the collapsed daily aggregate, " +
    "never over raw orders") {
    val p = plan(MiningQueries.peakDays(spark, dir))
    val w = p.indexOf("Window")
    val agg = p.indexOf("HashAggregate", w)
    assert(w >= 0 && agg > w, p)
  }

  test("weighted jaccard: vocab pair join is an equi-join on term over " +
    "the checkpointed tf aggregate; top-20 via TakeOrderedAndProject") {
    val p = plan(MiningQueries.weightedJaccard(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("lagged xcorr: the 7-lag table broadcasts onto the collapsed " +
    "daily series; the align join stays equi on the shifted date") {
    val p = plan(MiningQueries.laggedXcorr(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("lang purity / l-scale / file sizing / count change: collapsed " +
    "aggregates and segment windows only — no cartesian, no sort-merge " +
    "over fact rows") {
    for (q <- Seq("q357_lang_purity", "q358_l_scale", "q359_file_sizing",
        "q360_count_change_z")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    val pf = plan(MiningQueries.fileSizing(spark, dir))
    assert("FileScan parquet".r.findAllIn(pf).size == 1, pf)
    assert(!pf.contains("Join"), pf)
  }

  test("order seq / brand overlap / topk churn / pareto / grouped ols: " +
    "equi-joins and WindowGroupLimit prunes only — no cartesian in the " +
    "lifecycle batch") {
    for (q <- Seq("q361_order_seq_value", "q362_brand_overlap",
        "q363_topk_churn", "q364_revenue_pareto", "q365_grouped_ols")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    val pt = plan(MiningQueries.groupedOls(spark, dir))
    assert(pt.contains("TakeOrderedAndProject"), pt)
  }

  test("cross-source near-dup / context fanout / zipf / hourly / daily " +
    "diversity: shingle and token passes collapse before any join — no " +
    "cartesian anywhere in the corpus batch") {
    for (q <- Seq("q366_cross_source_neardup", "q368_context_fanout",
        "q369_zipf_check", "q367_hourly_conversion", "q370_daily_diversity")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    val pf = plan(MiningQueries.contextFanout(spark, dir))
    assert(pf.contains("TakeOrderedAndProject"), pf)
    val ph = plan(MiningQueries.hourlyConversion(spark, dir))
    assert("FileScan parquet".r.findAllIn(ph).size == 1, ph)
    assert(!ph.contains("Join"), ph)
  }

  test("global-window top-k pins (top share / zipf / topk churn): the " +
    "rank<=k filter keeps the partial WindowGroupLimit prune — a refactor " +
    "that drops the filter would silently fall back to a single-reducer " +
    "full sort") {
    // global (un-partitioned) rank<=k windows plan as TakeOrderedAndProject
    // (per-task top-k before ONE merge — strictly stronger than
    // WindowGroupLimit); partitioned ones plan as WindowGroupLimit.
    // Either way the full sort is pruned map-side.
    for (q <- Seq("q316_top_share", "q369_zipf_check")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("WindowGroupLimit") || p.contains("TakeOrderedAndProject"),
        s"$q\n$p")
    }
    // q363's checkpoint hides the producing plan — pin its ranked frame
    val pc = plan(MiningQueries.topkChurnRanked(spark, dir))
    assert(pc.contains("WindowGroupLimit"), pc)
  }

  test("round-8 leaderboards: trade matrix / recency score / stale parts " +
    "rank with TakeOrderedAndProject (per-task top-k, never a global " +
    "sort); trade-matrix dimensions broadcast") {
    for (q <- Seq("q413_trade_matrix", "q417_recency_score",
        "q403_stale_parts")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("TakeOrderedAndProject"), s"$q\n$p")
      assert(!p.contains("CartesianProduct"), s"$q\n$p")
    }
    val pt = plan(ScienceQueries.tradeMatrix(spark, dir))
    assert("BroadcastHashJoin".r.findAllIn(pt).size >= 2, pt)
    assert(!pt.contains("SortMergeJoin"), pt)
  }

  test("science family: silhouette broadcasts the k x dim centroid frame " +
    "(never shuffles the exploded corpus onto 64 dim keys); the Mann-" +
    "Kendall pair pass is a broadcast nested loop over the CALENDAR " +
    "aggregate; isotropy needs no join at all beyond the 1-row combine") {
    val ps = plan(ScienceQueries.silhouette(spark, dir))
    assert(ps.contains("BroadcastHashJoin"), ps)
    assert(!ps.contains("CartesianProduct"), ps)
    val pm = plan(ScienceQueries.mannKendall(spark, dir))
    assert(pm.contains("BroadcastNestedLoopJoin"), pm)
    val pi = plan(ScienceQueries.isotropy(spark, dir))
    assert(!pi.contains("SortMergeJoin"), pi)
    assert("FileScan parquet".r.findAllIn(pi).size == 2, pi) // sums + count
  }

  test("round-8 heavy hitters: q425's brand dimension stays broadcast and " +
    "its top-10 is TakeOrderedAndProject; q402's rounds reuse the " +
    "checkpointed edge/degree frames (zero source rescans in the final " +
    "plan) — losing either silently triples the two most expensive new " +
    "queries") {
    val p425 = plan(ScienceQueries.brandDowStrength(spark, dir))
    assert(p425.contains("BroadcastHashJoin"), p425) // broadcast(part) dim
    assert(!p425.contains("CartesianProduct"), p425)
    assert(p425.contains("TakeOrderedAndProject"), p425) // top-10, no global sort
    // q402: edges/degrees/per-round ranks are localCheckpointed, so every
    // round's delta reads ExistingRDD scans — a refactor that re-derives
    // the orders x lineitem join per round would reintroduce FileScans here
    val p402 = plan(ScienceQueries.rankConvergence(spark, dir))
    assert("FileScan parquet".r.findAllIn(p402).isEmpty, p402)
    assert(p402.contains("Scan ExistingRDD"), p402)
  }

  test("insight pack shapes: top-k queries are TakeOrderedAndProject; " +
    "q433's part dimension broadcasts; q430/q432 scan their fact exactly " +
    "once; every aggregate runs partial->final") {
    for (q <- Seq("q431_order_gap_regularity", "q432_supplier_hhi")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert(p.contains("TakeOrderedAndProject"), s"$q\n$p")
    }
    val p433 = plan(InsightQueries.discountResponse(spark, dir))
    assert(p433.contains("BroadcastHashJoin"), p433)
    assert(!p433.contains("SortMergeJoin"), p433)
    assert(p433.contains("partial_sum") || p433.contains("partial_count"), p433)
    // single fact scan each: marginals/moments come from the tiny
    // aggregate (windows / second-level agg), never a rescan
    for (q <- Seq("q430_contingency_chi2", "q432_supplier_hhi")) {
      val p = plan(graft.Registry.byName(q).build(spark, dir))
      assert("FileScan parquet".r.findAllIn(p).size == 1, s"$q\n$p")
    }
    // q439's group moments broadcast back over the scan (5 rows) — a
    // refactor to a fact-partitioned window would funnel each priority
    // through one reducer; q438's top-k stays TakeOrderedAndProject;
    // q440's customer dimension stays broadcast
    val p439 = plan(InsightQueries.outlierCensus(spark, dir))
    assert(p439.contains("BroadcastHashJoin"), p439)
    assert(!p439.contains("Window"), p439)
    val p438 = plan(InsightQueries.priceDispersion(spark, dir))
    assert(p438.contains("TakeOrderedAndProject"), p438)
    val p440 = plan(InsightQueries.accelerationShare(spark, dir))
    assert(p440.contains("BroadcastHashJoin"), p440)
    assert(!p440.contains("SortMergeJoin"), p440)
  }

  test("q318 triple miner (round-9/10 adjudication pin): both basket " +
    "self-joins are equi-joins on the basket key — the a<b<c ordering is " +
    "a post-join filter, never a join condition that would force a " +
    "nested-loop — and the top-20 plans as TakeOrderedAndProject") {
    val p = plan(graft.Registry.byName("q318_itemsets3").build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(p.contains("TakeOrderedAndProject"), p)
    // the capped-basket frame feeds both joins; the lineitem parquet is
    // scanned a bounded number of times (once per self-join arm)
    assert("FileScan parquet".r.findAllIn(p).size <= 3, p)
  }

  test("q172 personalized pagerank (r11 adjudication pin): the final " +
    "round's plan reads ONLY checkpointed loop-invariant frames — zero " +
    "parquet scans, no cartesian/nested-loop join, and a bounded " +
    "exchange count (one contribution agg + the rank joins), so an " +
    "accidental per-round graph rebuild or join-shape drift fails here " +
    "instead of surfacing as a bench surprise") {
    val df = graft.Registry.byName("q172_personalized_pagerank")
      .build(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    // every round is localCheckpoint'ed: the executed plan's leaves are
    // checkpoint scans, never a re-derivation of orders ⋈ lineitem
    assert(!p.contains("FileScan parquet"), p)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    // final round: contribution aggregate + left rank join + output sort;
    // a when-chain/extra-pass regression shows up as exchange growth
    assert("Exchange".r.findAllIn(p).size <= 8,
      s"exchange count grew: ${"Exchange".r.findAllIn(p).size}\n$p")
  }

  test("q163 jaccard prefix filter (r11 adjudication pin): one compiled " +
    "shingling pass feeds everything through its checkpoint (zero " +
    "parquet scans in the final plan), the candidate join is an " +
    "equi-join on the hashed shingle (id order is a post-filter), and " +
    "both prefix windows share one doc_id exchange") {
    val df = graft.Registry.byName("q163_jaccard_prefix").build(spark, dir)
    val p = plan(df)
    assert(!p.contains("CartesianProduct"), p)
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
    assert(!p.contains("FileScan parquet"), p)
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    // doc_id-partitioned exchanges: the two docset-aggregate arms, the
    // shared prefix-window exchange, and the verify join — the rnk and
    // n_sh windows must NOT each pay their own (that would read 5+)
    assert("Exchange hashpartitioning\\(doc_id".r.findAllIn(p).size <= 4, p)
    // total exchange budget of the whole pipeline (hash + broadcast +
    // the output range sort, 12 today); growth = an extra pass landed
    assert("Exchange".r.findAllIn(p).size <= 12,
      s"exchange count grew: ${"Exchange".r.findAllIn(p).size}\n$p")
  }

  test("q525 scorecard: lineitem collapses to supplier grain BELOW the " +
    "broadcast joins, dims broadcast (no sort-merge), and the three " +
    "grading windows share ONE nation exchange") {
    val p = plan(graft.Registry.byName("q525_supplier_risk_scorecard")
      .build(spark, dir))
    assert(!p.contains("SortMergeJoin"), p)
    assert("BroadcastHashJoin".r.findAllIn(p).size >= 2, p)
    // the supplier-grain rollup sits under a BroadcastExchange — fact
    // rows never cross the join
    val bcast = p.indexOf("BroadcastExchange")
    assert(bcast >= 0 && p.indexOf("HashAggregate", bcast) > 0, p)
    // 3 Window ops, but only one n_name hash exchange feeding them
    assert("Window".r.findAllIn(p).size >= 3, p)
    assert("Exchange hashpartitioning\\(n_name".r.findAllIn(p).size == 1, p)
  }

  test("q524 mixture: per-doc admission is ONE GlobalRank range pass " +
    "(no per-language window over the document frame), quotas join " +
    "back as a broadcast") {
    val p = plan(graft.Registry.byName("q524_token_budgeted_mixture")
      .build(spark, dir))
    // the document-frame leg runs off GlobalRank's checkpointed range
    // layout: the admission cumsum windows over the range-partition id
    // (_w0), never over lang
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(p.contains("windowspecdefinition(_w0"), p)
    // two legitimate stratum-grain lang exchanges (quota aggregate +
    // final rollup); a THIRD would mean a per-language window landed on
    // the document frame
    assert("Exchange hashpartitioning\\(lang".r.findAllIn(p).size <= 2, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("SortMergeJoin"), p)
  }

  test("q523 funnel: ONE explode feeds the fused profile (no Expand from " +
    "mixed countDistinct, no second token pass); the survivor join " +
    "shuffles on cluster_rep (component-grain — NOT broadcast-sized at " +
    "scale)") {
    // the explode/Expand pins must run on the FRESH doc-grain builder:
    // the registered query reads the session memo's checkpoint, which
    // truncates the whole profile subtree out of the final plan —
    // asserting there would pass no matter how many token passes the
    // profile made
    val grain = plan(graft.queries.CompositionQueries
      .curationDocGrainFresh(spark, dir))
    assert("Generate explode".r.findAllIn(grain).size == 1,
      s"token explode count != 1\n$grain")
    assert(!grain.contains("Expand"), grain)
    val p = plan(graft.Registry.byName("q523_curation_funnel")
      .build(spark, dir))
    // the final plan reads the checkpointed grain once per consumer
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    // survRep has one row per component WITH survivors — corpus-scale
    // at 100 TB, so the cluster_rep join must be a shuffled equi-join
    // (map-side-combined aggregate + co-partitioned merge), never a
    // nested loop; SortMergeJoin here is the INTENDED shape
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q528 context pack: the chunk frame is checkpointed (one compiled " +
    "chunking pass feeds stats + term counting), the 1-row corpus/dfreq " +
    "frames broadcast, and the rank+budget admission is one GlobalRank " +
    "range pass") {
    val p = plan(graft.Registry.byName("q528_rag_context_pack")
      .build(spark, dir))
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(!p.contains("CartesianProduct"), p)
    // the two 1-row stat frames attach as broadcast nested loops (the
    // intended shape for a schema-less cross of single-row frames);
    // more than two means a data-sized frame slipped into a cross join
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 2, p)
    assert(!p.contains("SortMergeJoin"), p)
    // GlobalRank's partition-id window is the only rank/cumsum pass
    assert(p.contains("windowspecdefinition(_w0"), p)
  }

  test("q529 manifest: admission+packing is ONE GlobalRank range pass " +
    "over the checkpointed survivor grain, quotas join back broadcast, " +
    "and exactly one stratum-grain lang exchange exists") {
    val p = plan(graft.Registry.byName("q529_training_mixture_manifest")
      .build(spark, dir))
    // the doc-grain frame is the checkpointed curation grain; its
    // explode/no-Expand shape is pinned on q523's pre-checkpoint test
    assert(p.contains("ExistingRDD") || p.contains("Scan ExistingRDD"), p)
    assert(p.contains("windowspecdefinition(_w0"), p)
    // ONE legitimate lang hash exchange (the quota aggregate); a second
    // would mean a per-language window landed on the document frame —
    // GlobalRank's range pass and the final output sort are both
    // rangepartitioning, and the quota join-back is a broadcast
    assert("Exchange hashpartitioning\\(lang".r.findAllIn(p).size <= 1, p)
    assert(p.contains("BroadcastHashJoin"), p)
    assert(!p.contains("CartesianProduct"), p)
    // no 1-row frames exist here — every join is an equi-join
    assert(!p.contains("BroadcastNestedLoopJoin"), p)
  }

  test("q530 freshness: each top-k leg broadcasts the QUERIES (non-equi " +
    "broadcast loop against the version scan — never corpus x corpus), " +
    "the diff stats attach as the one 1-row broadcast, windows stay " +
    "query-partitioned") {
    val out = java.nio.file.Files.createTempDirectory("plan_fresh_")
      .toString
    try {
      graft.queries.CompositionQueries
        .publishFreshnessFixture(spark, dir, out)
      val p = plan(graft.queries.CompositionQueries
        .freshnessFrame(spark, out))
      assert(!p.contains("CartesianProduct"), p)
      // 3 intended broadcast nested loops: 2 non-equi query broadcasts
      // (|queries| rows against each version scan) + the 1-row stats
      // frame; a 4th means a data-sized frame slipped into a cross
      assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3, p)
      // the top-k windows partition by query_id — never unpartitioned
      assert(p.contains("windowspecdefinition(query_id"), p)
    } finally graft.pipelines.Fs.deleteRecursive(
      new org.apache.hadoop.fs.Path(out))
  }

  test("q531 release gates: the four 1-row legs cross as broadcast " +
    "nested loops (never a CartesianProduct, never a data-sized frame), " +
    "and no Expand slips in from the distinct aggregates") {
    val p = plan(graft.Registry.byName("q531_release_gate_report")
      .build(spark, dir))
    assert(!p.contains("CartesianProduct"), p)
    // 3 intended 1-row broadcast crosses (dup/near/contam legs onto the
    // flag leg); a 4th means a data-sized frame slipped into a cross
    assert("BroadcastNestedLoopJoin".r.findAllIn(p).size <= 3, p)
    // the exact-dup distinct is the two-stage groupBy form and the
    // contamination distinct stands alone in its aggregate — neither
    // may rewrite into an Expand over a corpus-scale frame
    assert(!p.contains("Expand"), p)
  }
}
